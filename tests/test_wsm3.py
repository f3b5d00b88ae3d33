"""WSM3 3-class microphysics tests (process sanity + conservation +
end-to-end model run)."""

import jax.numpy as jnp
import numpy as np
import pytest

from icar_tpu import constants as C
from icar_tpu.models.icar import ideal_ridge_model
from icar_tpu.physics import mp_wsm3 as W


def column(nz=20, ny=4, nx=4, t_sfc=290.0, rh=0.5, qc=0.0, qr=0.0):
    dz = np.full((nz, ny, nx), 500.0, np.float32)
    z = np.cumsum(dz, axis=0) - 250.0
    p = (1e5 * np.exp(-z / 8000.0)).astype(np.float32)
    t = (t_sfc - 0.0065 * z).astype(np.float32)
    exner = (p / 1e5) ** (C.RD / C.CP)
    th = t / exner
    den = p / (W.RD * t)
    qs, _ = W._saturation(jnp.asarray(t), jnp.asarray(p))
    qv = rh * np.asarray(qs)
    return dict(th=jnp.asarray(th), qv=jnp.asarray(qv.astype(np.float32)),
                qci=jnp.full((nz, ny, nx), qc, jnp.float32),
                qrs=jnp.full((nz, ny, nx), qr, jnp.float32),
                w=jnp.zeros((nz, ny, nx), jnp.float32),
                exner=jnp.asarray(exner), p=jnp.asarray(p),
                dz=jnp.asarray(dz), den=jnp.asarray(den.astype(np.float32)),
                t=t)


def run(c, dt=60.0, steps=1):
    rain = jnp.zeros(c["p"].shape[1:], jnp.float32)
    snow = jnp.zeros_like(rain)
    th, qv, qci, qrs = c["th"], c["qv"], c["qci"], c["qrs"]
    for _ in range(steps):
        th, qv, qci, qrs, rain, snow = W.wsm3(
            th, qv, qci, qrs, c["w"], c["exner"], c["p"], c["dz"], c["den"],
            dt, rain, snow)
    return th, qv, qci, qrs, rain, snow


def test_saturation_magnitudes():
    qs, qs0 = W._saturation(jnp.float32(300.0), jnp.float32(1e5))
    assert 0.02 < float(qs) < 0.026
    qs_cold, _ = W._saturation(jnp.float32(250.0), jnp.float32(1e5))
    assert float(qs_cold) < 0.001


def test_supersaturation_condenses():
    c = column(rh=1.2, t_sfc=285.0)
    th, qv, qci, qrs, rain, snow = run(c, steps=3)
    assert float(qci.max()) > 1e-5          # cloud formed
    # vapor pulled toward saturation
    qs, _ = W._saturation(th * c["exner"], c["p"])
    assert float((qv - qs).max()) < 5e-3


def test_autoconversion_produces_rain():
    c = column(rh=1.0, t_sfc=295.0, qc=2e-3)   # qc above threshold
    th, qv, qci, qrs, rain, snow = run(c, steps=10)
    assert float(qrs.max()) > 1e-5
    assert float(rain.max()) > 0.0             # rain reached the ground
    assert float(snow.max()) == 0.0            # warm surface: no snow


def test_cold_column_makes_snow():
    c = column(rh=1.1, t_sfc=265.0, qc=1e-3)   # entirely below freezing
    th, qv, qci, qrs, rain, snow = run(c, dt=60.0, steps=20)
    assert float(qrs.max()) > 1e-7             # snow class forms
    assert float(snow.max()) > 0.0             # accumulates as snow
    np.testing.assert_allclose(np.asarray(rain), np.asarray(snow), rtol=1e-5)


def test_water_conservation():
    c = column(rh=1.05, t_sfc=285.0, qc=5e-4)
    w0 = np.asarray((c["qv"] + c["qci"] + c["qrs"]) * c["den"] * c["dz"]).sum(axis=0)
    th, qv, qci, qrs, rain, snow = run(c, dt=60.0, steps=5)
    w1 = np.asarray((qv + qci + qrs) * c["den"] * c["dz"]).sum(axis=0)
    np.testing.assert_allclose(w1 + np.asarray(rain), w0, rtol=2e-3)


def test_dry_column_noop():
    c = column(rh=0.3)
    th, qv, qci, qrs, rain, snow = run(c)
    np.testing.assert_allclose(np.asarray(rain), 0.0)
    np.testing.assert_allclose(np.asarray(qv), np.asarray(c["qv"]), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(th), np.asarray(c["th"]), rtol=1e-5)


def test_model_runs_with_wsm3():
    m = ideal_ridge_model(nx=48, ny=12, nz=10, dx=1000.0, hill_height=600.0,
                          u_speed=10.0, rh=1.0, mp=C.MP_WSM3)
    assert m.advect_names == ["potential_temperature", "water_vapor",
                              "cloud_water", "rain_mass"]
    m.advance(1200.0)
    for n in ("potential_temperature", "water_vapor", "cloud_water",
              "rain_mass", "precipitation"):
        assert np.isfinite(m.field(n)).all(), n
    assert m.field("cloud_water").max() > 1e-6    # orographic cloud
    th = m.field("potential_temperature")
    assert 250 < th.min() and th.max() < 600
