"""WSM6 6-class microphysics tests (process sanity + conservation +
end-to-end model run)."""

import jax.numpy as jnp
import numpy as np
import pytest

from icar_tpu import constants as C
from icar_tpu.models.icar import ideal_ridge_model
from icar_tpu.physics import mp_wsm3 as W3
from icar_tpu.physics import mp_wsm6 as W


def column(nz=20, ny=4, nx=4, t_sfc=290.0, rh=0.5, qc=0.0, qi=0.0,
           qr=0.0, qs=0.0, qg=0.0):
    dz = np.full((nz, ny, nx), 500.0, np.float32)
    z = np.cumsum(dz, axis=0) - 250.0
    p = (1e5 * np.exp(-z / 8000.0)).astype(np.float32)
    t = (t_sfc - 0.0065 * z).astype(np.float32)
    exner = (p / 1e5) ** (C.RD / C.CP)
    th = t / exner
    den = p / (W3.RD * t)
    qsat, _ = W3._saturation(jnp.asarray(t), jnp.asarray(p))
    qv = rh * np.asarray(qsat)
    full = lambda v: jnp.full((nz, ny, nx), v, jnp.float32)
    return dict(th=jnp.asarray(th), qv=jnp.asarray(qv.astype(np.float32)),
                qc=full(qc), qi=full(qi), qr=full(qr), qs=full(qs),
                qg=full(qg), exner=jnp.asarray(exner), p=jnp.asarray(p),
                dz=jnp.asarray(dz), den=jnp.asarray(den.astype(np.float32)),
                t=t)


def run(c, dt=60.0, steps=1):
    rain = jnp.zeros(c["p"].shape[1:], jnp.float32)
    snow = jnp.zeros_like(rain)
    graupel = jnp.zeros_like(rain)
    th, qv, qc, qi = c["th"], c["qv"], c["qc"], c["qi"]
    qr, qs, qg = c["qr"], c["qs"], c["qg"]
    for _ in range(steps):
        th, qv, qc, qi, qr, qs, qg, rain, snow, graupel = W.wsm6(
            th, qv, qc, qi, qr, qs, qg, c["exner"], c["p"], c["dz"],
            c["den"], dt, rain, snow, graupel)
    return th, qv, qc, qi, qr, qs, qg, rain, snow, graupel


def test_supersaturation_condenses():
    c = column(rh=1.2, t_sfc=285.0)
    th, qv, qc, qi, *_ = run(c, steps=3)
    assert float(qc.max()) > 1e-5
    # vapor pulled toward water saturation
    t = th * c["exner"]
    ttp = W3.T0C + 0.01
    tr = ttp / t
    xa = -(W3.CPV - W3.CLIQ) / W3.RV
    xb = xa + W3.XLV0 / (W3.RV * ttp)
    es = W3.PSAT * tr ** xa * jnp.exp(xb * (1.0 - tr))
    qsw = W3.EP2 * es / (c["p"] - es)
    assert float((qv - qsw).max()) < 5e-3


def test_autoconversion_produces_rain():
    c = column(rh=1.0, t_sfc=295.0, qc=2e-3)
    th, qv, qc, qi, qr, qs, qg, rain, snow, graupel = run(c, steps=10)
    assert float(qr.max()) > 1e-5
    assert float(rain.max()) > 0.0
    assert float(snow.max()) == 0.0           # warm column: no frozen precip
    assert float(graupel.max()) == 0.0


def test_cold_column_makes_ice_and_snow():
    c = column(rh=1.1, t_sfc=260.0, qc=1e-3)  # entirely below freezing
    th, qv, qc, qi, qr, qs, qg, rain, snow, graupel = run(c, steps=20)
    assert float(qi.max()) > 1e-7             # ice nucleated/deposited
    assert float(qs.max()) > 1e-8             # snow formed
    assert float(snow.max()) >= 0.0


def test_rain_freezes_to_graupel():
    # supercooled rain at -15C: Biggs freezing converts rain to graupel
    c = column(rh=0.9, t_sfc=258.0, qr=2e-3)
    th, qv, qc, qi, qr, qs, qg, *_ = run(c, dt=120.0, steps=5)
    assert float(qg.max()) > 1e-6
    assert float(qr.mean()) < float(c["qr"].mean())


def test_graupel_melts_to_rain():
    # warm column seeded with graupel aloft: melting feeds rain
    c = column(rh=0.95, t_sfc=300.0, qg=1e-3)
    th, qv, qc, qi, qr, qs, qg, rain, snow, graupel = run(c, steps=10)
    assert float(qr.max()) > 1e-6
    assert float(qg.mean()) < float(c["qg"].mean())


def test_water_conservation():
    c = column(rh=1.05, t_sfc=285.0, qc=5e-4, qi=1e-4, qs=1e-4, qg=1e-4)
    total0 = np.asarray(
        (c["qv"] + c["qc"] + c["qi"] + c["qr"] + c["qs"] + c["qg"])
        * c["den"] * c["dz"]).sum(axis=0)
    th, qv, qc, qi, qr, qs, qg, rain, snow, graupel = run(c, steps=5)
    total1 = np.asarray((qv + qc + qi + qr + qs + qg)
                        * c["den"] * c["dz"]).sum(axis=0)
    np.testing.assert_allclose(total1 + np.asarray(rain), total0, rtol=2e-3)


def test_dry_column_noop():
    c = column(rh=0.3)
    th, qv, qc, qi, qr, qs, qg, rain, snow, graupel = run(c)
    np.testing.assert_allclose(np.asarray(rain), 0.0)
    np.testing.assert_allclose(np.asarray(qv), np.asarray(c["qv"]), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(th), np.asarray(c["th"]), rtol=1e-5)


def test_model_runs_with_wsm6():
    m = ideal_ridge_model(nx=48, ny=12, nz=10, dx=1000.0, hill_height=600.0,
                          u_speed=10.0, rh=1.0, mp=C.MP_WSM6)
    assert m.advect_names == ["potential_temperature", "water_vapor",
                              "cloud_water", "cloud_ice", "rain_mass",
                              "snow_mass", "graupel_mass"]
    m.advance(1200.0)
    for n in ("potential_temperature", "water_vapor", "cloud_water",
              "rain_mass", "graupel_mass", "precipitation"):
        assert np.isfinite(m.field(n)).all(), n
    assert m.field("cloud_water").max() > 1e-6
    th = m.field("potential_temperature")
    assert 250 < th.min() and th.max() < 600
