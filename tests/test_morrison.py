"""Morrison 2-moment microphysics tests (process sanity + conservation +
number-concentration behavior + end-to-end model run)."""

import jax.numpy as jnp
import numpy as np

from icar_tpu import constants as C
from icar_tpu.models.icar import ideal_ridge_model
from icar_tpu.physics import mp_morrison as M


def column(nz=20, ny=4, nx=4, t_sfc=290.0, rh=0.5, qc=0.0, qi=0.0,
           qr=0.0, qs=0.0, qg=0.0, ni=0.0, ns=0.0, nr=0.0, ng=0.0):
    dz = np.full((nz, ny, nx), 500.0, np.float32)
    z = np.cumsum(dz, axis=0) - 250.0
    p = (1e5 * np.exp(-z / 8000.0)).astype(np.float32)
    t = (t_sfc - 0.0065 * z).astype(np.float32)
    exner = (p / 1e5) ** (C.RD / C.CP)
    th = t / exner
    den = p / (C.RD * t)
    es = np.asarray(M.polysvp(jnp.asarray(t), False))
    qsat = M.EP_2 * es / (p - es)
    qv = rh * qsat
    full = lambda v: jnp.full((nz, ny, nx), v, jnp.float32)
    return dict(th=jnp.asarray(th.astype(np.float32)),
                qv=jnp.asarray(qv.astype(np.float32)),
                qc=full(qc), qi=full(qi), qr=full(qr), qs=full(qs),
                qg=full(qg), ni=full(ni), ns=full(ns), nr=full(nr),
                ng=full(ng), exner=jnp.asarray(exner.astype(np.float32)),
                p=jnp.asarray(p), dz=jnp.asarray(dz),
                den=jnp.asarray(den.astype(np.float32)), t=t,
                w=full(0.0))


def run(c, dt=60.0, steps=1):
    rain = jnp.zeros(c["p"].shape[1:], jnp.float32)
    snow = jnp.zeros_like(rain)
    graupel = jnp.zeros_like(rain)
    th, qv, qc, qi = c["th"], c["qv"], c["qc"], c["qi"]
    qr, qs, qg = c["qr"], c["qs"], c["qg"]
    ni, ns, nr, ng = c["ni"], c["ns"], c["nr"], c["ng"]
    for _ in range(steps):
        (th, qv, qc, qi, qr, qs, qg, ni, ns, nr, ng, rain, snow,
         graupel) = M.mp_morrison(
            th, qv, qc, qi, qr, qs, qg, ni, ns, nr, ng, c["exner"],
            c["p"], c["dz"], c["w"], dt, rain, snow, graupel)
    return dict(th=th, qv=qv, qc=qc, qi=qi, qr=qr, qs=qs, qg=qg, ni=ni,
                ns=ns, nr=nr, ng=ng, rain=rain, snow=snow, graupel=graupel)


def test_polysvp_matches_magnus():
    # Flatau polynomial vs Magnus at a few temperatures (liquid)
    for t, ref in ((273.15, 611.0), (293.15, 2339.0), (253.15, 126.0)):
        es = float(M.polysvp(jnp.float32(t), False))
        assert abs(es - ref) / ref < 0.03, (t, es, ref)
    # ice below freezing is lower than liquid
    assert float(M.polysvp(jnp.float32(253.15), True)) < \
        float(M.polysvp(jnp.float32(253.15), False))


def test_supersaturation_condenses():
    c = column(rh=1.2, t_sfc=285.0)
    out = run(c, steps=3)
    assert float(out["qc"].max()) > 1e-5
    # vapor pulled toward water saturation
    t = out["th"] * c["exner"]
    es = M.polysvp(t, False)
    qsw = M.EP_2 * es / (c["p"] - es)
    assert float((out["qv"] - qsw).max()) < 5e-3


def test_autoconversion_produces_rain_and_number():
    c = column(rh=1.0, t_sfc=295.0, qc=2e-3)
    out = run(c, steps=10)
    assert float(out["qr"].max()) > 1e-5
    assert float(out["nr"].max()) > 1.0       # rain number created
    assert float(out["rain"].max()) > 0.0
    assert float(out["snow"].max()) == 0.0    # warm column
    assert float(out["graupel"].max()) == 0.0


def test_cold_column_nucleates_ice():
    c = column(rh=1.15, t_sfc=255.0, qc=1e-3)  # entirely below freezing
    out = run(c, steps=20)
    assert float(out["qi"].max()) > 1e-8       # Cooper nucleation/deposition
    assert float(out["ni"].max()) > 1.0
    # anvil cap: ni <= 0.3e6/rho
    rho = np.asarray(c["p"] / (C.RD * (out["th"] * c["exner"])))
    assert np.all(np.asarray(out["ni"]) <= 0.3e6 / rho * 1.0001)


def test_supercooled_rain_freezes_to_graupel():
    c = column(rh=0.9, t_sfc=258.0, qr=2e-3, nr=2e6)
    out = run(c, dt=120.0, steps=5)
    assert float(out["qg"].max()) > 1e-6
    assert float(out["qr"].mean()) < float(c["qr"].mean())
    assert float(out["ng"].max()) > 0.0


def test_graupel_melts_to_rain():
    c = column(rh=0.95, t_sfc=300.0, qg=1e-3, ng=1e4)
    out = run(c, steps=10)
    assert float(out["qr"].max()) > 1e-6
    assert float(out["qg"].mean()) < float(c["qg"].mean())


def test_homogeneous_freezing():
    # -45C column with cloud water: all droplets freeze instantly
    c = column(rh=0.95, t_sfc=230.0, qc=5e-4)
    out = run(c, steps=1)
    assert float(out["qc"].max()) == 0.0
    assert float(out["qi"].max()) > 1e-4


def test_water_conservation():
    c = column(rh=1.05, t_sfc=285.0, qc=5e-4, qi=1e-4, qs=1e-4, qg=1e-4,
               ni=1e5, ns=1e4, ng=1e3)
    total0 = np.asarray(
        (c["qv"] + c["qc"] + c["qi"] + c["qr"] + c["qs"] + c["qg"])
        * c["den"] * c["dz"]).sum(axis=0)
    out = run(c, steps=5)
    total1 = np.asarray(
        (out["qv"] + out["qc"] + out["qi"] + out["qr"] + out["qs"]
         + out["qg"]) * c["den"] * c["dz"]).sum(axis=0)
    np.testing.assert_allclose(total1 + np.asarray(out["rain"]), total0,
                               rtol=2e-3)


def test_numbers_stay_finite_and_nonnegative():
    c = column(rh=1.1, t_sfc=270.0, qc=1e-3, qr=5e-4, qs=5e-4, qg=2e-4,
               ni=1e4, ns=1e4, nr=1e5, ng=1e3)
    out = run(c, dt=90.0, steps=10)
    for k in ("ni", "ns", "nr", "ng"):
        a = np.asarray(out[k])
        assert np.isfinite(a).all(), k
        assert (a >= 0.0).all(), k
    for k in ("th", "qv", "qc", "qi", "qr", "qs", "qg"):
        assert np.isfinite(np.asarray(out[k])).all(), k


def test_dry_column_noop():
    c = column(rh=0.3)
    out = run(c)
    np.testing.assert_allclose(np.asarray(out["rain"]), 0.0)
    np.testing.assert_allclose(np.asarray(out["qv"]), np.asarray(c["qv"]),
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(out["th"]), np.asarray(c["th"]),
                               rtol=1e-5)


def test_hail_option_changes_fall():
    # hail (denser, faster) drains the graupel category faster
    c = column(rh=0.95, t_sfc=275.0, qg=1e-3, ng=1e4)
    out_g = run(c, steps=5)
    c2 = column(rh=0.95, t_sfc=275.0, qg=1e-3, ng=1e4)
    rain = jnp.zeros(c2["p"].shape[1:], jnp.float32)
    out_h = M.mp_morrison(
        c2["th"], c2["qv"], c2["qc"], c2["qi"], c2["qr"], c2["qs"],
        c2["qg"], c2["ni"], c2["ns"], c2["nr"], c2["ng"], c2["exner"],
        c2["p"], c2["dz"], c2["w"], 60.0, rain, rain, rain, hail_opt=1)
    assert np.isfinite(np.asarray(out_h[6])).all()
    # both run; hail/graupel parameters differ
    assert M._CONSTS[1].RHOG > M._CONSTS[0].RHOG


def test_model_runs_with_morrison():
    m = ideal_ridge_model(nx=48, ny=12, nz=10, dx=1000.0, hill_height=600.0,
                          u_speed=10.0, rh=1.0, mp=C.MP_MORRISON)
    assert m.advect_names == ["potential_temperature", "water_vapor",
                              "cloud_water", "cloud_ice", "rain_mass",
                              "snow_mass", "graupel_mass", "ice_number",
                              "snow_number", "rain_number", "graupel_number"]
    m.advance(1200.0)
    for n in ("potential_temperature", "water_vapor", "cloud_water",
              "rain_mass", "graupel_mass", "ice_number", "rain_number",
              "precipitation"):
        assert np.isfinite(m.field(n)).all(), n
    assert m.field("cloud_water").max() > 1e-6
    th = m.field("potential_temperature")
    assert 250 < th.min() and th.max() < 600
