"""Thompson 2-moment microphysics tests: lookup tables, column processes,
conservation, and end-to-end model run."""

import jax.numpy as jnp
import numpy as np
import pytest

from icar_tpu import constants as C
from icar_tpu.models.icar import ideal_ridge_model
from icar_tpu.physics import thompson_tables as TT
from icar_tpu.physics.mp_thompson import mp_thompson, rslf, rsif


def column(nz=20, ny=3, nx=3, t_sfc=290.0, rh=0.5, qc=0.0, qi=0.0,
           qr=0.0, qs=0.0, qg=0.0, nr=0.0, ni=0.0):
    dz = np.full((nz, ny, nx), 500.0, np.float32)
    z = np.cumsum(dz, axis=0) - 250.0
    p = (1e5 * np.exp(-z / 8000.0)).astype(np.float32)
    t = (t_sfc - 0.0065 * z).astype(np.float32)
    exner = (p / 1e5) ** (C.RD / C.CP)
    th = t / exner
    qsat = np.asarray(rslf(jnp.asarray(p), jnp.asarray(t)))
    qv = (rh * qsat).astype(np.float32)
    full = lambda v: jnp.full((nz, ny, nx), v, jnp.float32)
    return dict(th=jnp.asarray(th.astype(np.float32)), qv=jnp.asarray(qv),
                qc=full(qc), qi=full(qi), qr=full(qr), qs=full(qs),
                qg=full(qg), ni=full(ni), nr=full(nr),
                exner=jnp.asarray(exner.astype(np.float32)),
                p=jnp.asarray(p), dz=jnp.asarray(dz), t=t)


def run(c, dt=60.0, steps=1):
    acc = [jnp.zeros(c["p"].shape[1:], jnp.float32)] * 3
    st = [c["th"], c["qv"], c["qc"], c["qi"], c["qr"], c["qs"], c["qg"],
          c["ni"], c["nr"]]
    for _ in range(steps):
        out = mp_thompson(*st, c["exner"], c["p"], c["dz"], dt, *acc)
        st, acc = list(out[:9]), list(out[9:])
    return st, acc


def test_saturation_formulas():
    # Flatau polynomial vs the Clausius-Clapeyron ballpark
    qs = float(rslf(jnp.float32(1e5), jnp.float32(300.0)))
    assert 0.021 < qs < 0.024
    qsi = float(rsif(jnp.float32(1e5), jnp.float32(250.0)))
    qsw = float(rslf(jnp.float32(1e5), jnp.float32(250.0)))
    assert qsi < qsw          # ice saturation below water saturation


def test_tables_sane():
    tabs, c = TT.get_tables()
    # collision efficiencies bounded
    assert 0.0 <= tabs["t_Efrw"].min() and tabs["t_Efrw"].max() <= 0.95
    # freezing probability grows with colder temperatures
    f = tabs["tpi_qcfz"][20]          # fixed cloud content, all temps
    assert f[-1] > f[0]
    # ice->snow conversion: large-ice entries move everything to snow
    assert tabs["tpi_ide"].max() == pytest.approx(1.0)
    # rain freezing splits between ice (small drops) and graupel (large)
    assert tabs["tpg_qrfz"].max() > 0 and tabs["tpi_qrfz"].max() > 0


def test_condensation_and_autoconversion():
    c = column(rh=1.15, t_sfc=295.0, qc=1.5e-3)
    st, acc = run(c, steps=10)
    th, qv, qc, qi, qr = st[:5]
    assert float(qr.max()) > 1e-5            # warm rain formed
    assert float(st[8].max()) > 0            # rain number too
    assert float(acc[0].max()) > 0           # surface rain
    assert float(acc[1].max()) == 0          # no snow in warm column
    # vapor relaxed toward saturation
    qs_end = np.asarray(rslf(c["p"], th * c["exner"]))
    assert float((np.asarray(qv) - qs_end).max()) < 2e-3


def test_cold_column_ice_nucleation():
    c = column(rh=1.1, t_sfc=258.0)
    st, acc = run(c, steps=10)
    qi, ni = st[3], st[7]
    assert float(qi.max()) > 1e-7            # ice nucleated
    assert float(ni.max()) > 1e3             # with number concentration
    assert np.isfinite(np.asarray(st[0])).all()


def test_snow_reaches_ground():
    c = column(rh=1.05, t_sfc=264.0, qc=1e-3)
    st, acc = run(c, steps=60)
    assert float(st[5].max()) > 1e-5         # snow mass in column
    assert float(acc[1].mean()) > 0.01       # accumulated snow at surface
    np.testing.assert_array_less(np.asarray(acc[1]), np.asarray(acc[0]) + 1e-9)


def test_supercooled_rain_freezes():
    c = column(rh=0.9, t_sfc=262.0, qr=1e-3, nr=1e7)
    st, acc = run(c, dt=60.0, steps=10)
    # Bigg freezing moves rain into graupel/ice
    assert float(st[6].max()) + float(st[3].max()) > 1e-6
    assert float(st[4].mean()) < float(c["qr"].mean())


def test_water_conservation():
    c = column(rh=1.05, t_sfc=280.0, qc=1e-3, qs=2e-4, qg=1e-4)
    rho = np.asarray(c["p"]) / (287.04 * c["t"])
    total0 = ((np.asarray(c["qv"]) + 1e-3 + 2e-4 + 1e-4)
              * rho * np.asarray(c["dz"])).sum(axis=0)
    st, acc = run(c, steps=10)
    t1 = np.asarray(st[0] * c["exner"])
    rho1 = np.asarray(c["p"]) / (287.04 * t1)
    total1 = sum(np.asarray(q) for q in st[1:7]) * rho1
    total1 = (total1 * np.asarray(c["dz"])).sum(axis=0)
    np.testing.assert_allclose(total1 + np.asarray(acc[0]), total0, rtol=5e-3)


def test_dry_column_noop():
    c = column(rh=0.4)
    st, acc = run(c)
    np.testing.assert_allclose(np.asarray(acc[0]), 0.0)
    np.testing.assert_allclose(np.asarray(st[1]), np.asarray(c["qv"]),
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(st[0]), np.asarray(c["th"]),
                               rtol=1e-5)


def test_model_runs_with_thompson():
    m = ideal_ridge_model(nx=48, ny=12, nz=10, dx=1000.0, hill_height=600.0,
                          u_speed=10.0, rh=1.0, mp=C.MP_THOMPSON)
    assert "ice_number" in m.advect_names
    assert "rain_number" in m.advect_names
    m.advance(1200.0)
    for n in ("potential_temperature", "water_vapor", "cloud_water",
              "rain_mass", "ice_number", "precipitation"):
        assert np.isfinite(m.field(n)).all(), n
    assert m.field("cloud_water").max() > 1e-6    # orographic cloud
    th = m.field("potential_temperature")
    assert 250 < th.min() and th.max() < 600


def test_effective_radii():
    """mp=5 effective-radius diagnostics (calc_effectRad,
    mp_thompson_aer.f90:5026-5127) in the constant-Nc fallback ICAR
    actually uses (no aerosol fields passed, mp_driver.f90:446-476)."""
    from icar_tpu.physics.mp_thompson import calc_effect_rad

    c = column(t_sfc=285.0, rh=0.6, qc=5e-4, qi=2e-5, qs=1e-4, ni=1e6)
    t = jnp.asarray(c["t"].astype(np.float32))
    re_qc, re_qi, re_qs = calc_effect_rad(
        t, c["p"], c["qv"], c["qc"], c["qi"], c["ni"], c["qs"])
    re_qc, re_qi, re_qs = map(np.asarray, (re_qc, re_qi, re_qs))
    assert (re_qc >= 2.49e-6).all() and (re_qc <= 50e-6).all()
    assert (re_qi >= 4.99e-6).all() and (re_qi <= 125e-6).all()
    assert (re_qs >= 9.99e-6).all() and (re_qs <= 999e-6).all()
    # condensate present -> radii above the no-cloud sentinel values
    assert re_qc.max() > 2.51e-6
    assert re_qi.max() > 5.01e-6
    assert re_qs.max() > 10e-6
    # empty column -> sentinel minima
    c0 = column(rh=0.3)
    r0 = calc_effect_rad(t, c0["p"], c0["qv"], c0["qc"], c0["qi"],
                         c0["ni"], c0["qs"])
    assert float(np.asarray(r0[0]).max()) == pytest.approx(2.49e-6)


def test_model_runs_with_thompson_aer():
    m = ideal_ridge_model(nx=48, ny=12, nz=10, dx=1000.0, hill_height=600.0,
                          u_speed=10.0, rh=1.0, mp=C.MP_THOMPSON_AER)
    assert "re_cloud" in m.state
    m.advance(1200.0)
    for n in ("potential_temperature", "cloud_water", "re_cloud",
              "re_ice", "re_snow", "precipitation"):
        assert np.isfinite(m.field(n)).all(), n
    # orographic cloud drives droplet radii off the sentinel floor
    assert m.field("re_cloud").max() > 2.51e-6


def test_cooper_ice_nucleation_closed_form():
    """Cooper (1986) deposition/condensation-freezing nucleation
    (mp_thompson.f90:1818-1827): in a cold, water-saturated, completely
    ice/liquid-free column the ONLY ice source in one step is
        pni_inu = max(0, xnc - ni) * odts,
        xnc = min(250e3, TNO * exp(ATO * (T0 - T))),
        pri_inu = min((qv - qvsi) * rho * odts * 0.999, xm0i * pni_inu)
    so the produced qi must match the closed form per level (every other
    ice process requires an existing frozen species or liquid). An
    independent pin on the nucleation rate constants (TNO, ATO, xm0i)."""
    import numpy as np

    import jax.numpy as jnp

    from icar_tpu.physics import mp_thompson as mt

    nz, ny, nx = 8, 2, 3
    dt = 10.0
    t = np.linspace(238.0, 262.0, nz)[:, None, None] * np.ones((nz, ny, nx))
    p = np.full((nz, ny, nx), 50000.0)
    exner = (p / 100000.0) ** (287.04 / 1004.0)
    # just below water saturation: the water-supersaturation trigger
    # branch stays deterministically off (at EXACT saturation the f32
    # rounding of qv/qvs decides it), leaving only the >=25% ice-
    # supersaturation branch, still amply exceeded at the cold levels
    qvs_w = np.asarray(
        [[[float(mt.rslf(p[k, j, i], t[k, j, i]))
           for i in range(nx)] for j in range(ny)] for k in range(nz)])
    qv = qvs_w * 0.999
    zero = np.zeros_like(p)
    f = lambda a: jnp.asarray(a, jnp.float32)
    acc = jnp.zeros((ny, nx), jnp.float32)
    out = mt.mp_thompson(
        f(t / exner), f(qv), f(zero), f(zero), f(zero), f(zero), f(zero),
        f(zero), f(zero), f(exner), f(p),
        f(np.full_like(p, 50000.0)),   # huge dz: sedimentation moves ~0
        np.float32(dt), acc, acc, acc)
    qi = np.asarray(out[3])

    # closed form (f64): rho, qvsi from the scheme's own rslf/rsif forms
    rho = 0.622 * p / (287.04 * t * (qv + 0.622))
    qvsi = np.asarray(
        [[[float(mt.rsif(p[k, j, i], t[k, j, i]))
           for i in range(nx)] for j in range(ny)] for k in range(nz)])
    xnc = np.minimum(250e3, 5.0 * np.exp(0.304 * (273.15 - t)))
    pri = np.minimum((qv - qvsi) * rho / dt * 0.999, 1e-12 * xnc / dt)
    want_qi = pri / rho * dt
    # the trigger (mp_thompson.f90:1819-1821): 25%+ ice supersaturation,
    # or water supersaturation below 261.15 K (at exact water saturation
    # ssatw is zeroed by the eps snap, so only the first branch fires)
    sati = qv / qvsi
    # guard band around the 1.25 threshold (f32 vs f64 sati)
    active = (sati >= 1.27) & (want_qi > 1e-12)
    untriggered = sati <= 1.20
    assert active.any(), "test column never nucleates"
    assert untriggered.any(), "test column lacks untriggered levels"
    np.testing.assert_allclose(qi[active], want_qi[active], rtol=2e-2,
                               err_msg="Cooper nucleation rate mismatch")
    np.testing.assert_array_equal(
        qi[untriggered], 0.0,
        err_msg="nucleation fired without its trigger conditions")
    # nucleation must NOT fire where neither trigger holds: warm it up
    t_warm = t + 15.0
    qvs_warm = np.asarray(
        [[[float(mt.rslf(p[k, j, i], t_warm[k, j, i]))
           for i in range(nx)] for j in range(ny)] for k in range(nz)])
    out2 = mt.mp_thompson(
        f(t_warm / ((p / 100000.0) ** (287.04 / 1004.0))),
        f(qvs_warm * 0.7), f(zero), f(zero), f(zero), f(zero), f(zero),
        f(zero), f(zero), f(exner), f(p), f(np.full_like(p, 50000.0)),
        np.float32(dt), acc, acc, acc)
    assert np.asarray(out2[3]).max() == 0.0
