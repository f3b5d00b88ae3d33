"""BMJ convection tests: tables, deep/shallow adjustment, e2e run."""

import jax.numpy as jnp
import numpy as np
import pytest

from icar_tpu import constants as C
from icar_tpu.models.icar import ideal_ridge_model
from icar_tpu.physics.bmj_tables import get_tables
from icar_tpu.physics.cu_bmj import AVGEFI, EFIMN, bmj


def column(nz=30, ny=3, nx=3, t_sfc=302.0, lapse=6.5e-3, rh=0.9,
           rh_top=0.45, dz0=400.0):
    dz = np.full((nz, ny, nx), dz0, np.float32)
    zif = np.concatenate([np.zeros((1, ny, nx)), np.cumsum(dz, 0)], 0)
    zl = 0.5 * (zif[:-1] + zif[1:])
    t = (t_sfc - lapse * zl).astype(np.float32)
    ex = 9.81 / (287.0 * lapse)
    p = (1.013e5 * (t / t_sfc) ** ex).astype(np.float32)
    rho = p / (287.0 * t)
    exner = (p / 1e5) ** (287.0 / 1004.6)
    th = t / exner
    es = 610.78 * np.exp(17.27 * (t - 273.15) / (t - 35.85))
    rh_prof = np.where(zl < 3000.0, rh, rh_top)
    qv = (0.622 * es / (p - es) * rh_prof).astype(np.float32)
    return dict(t=t, th=th, qv=qv, p=p, rho=rho, exner=exner, dz=dz,
                zl=zl)


def run(c, xland=1.0, cldefi=0.6, dt=600.0):
    ny, nx = c["t"].shape[1:]
    return bmj(*[jnp.asarray(c[k]) for k in
                 ("t", "th", "qv", "p", "exner", "rho", "dz")],
               jnp.full((ny, nx), xland, jnp.float32),
               jnp.full((ny, nx), cldefi, jnp.float32), dt)


def test_tables_shapes_and_monotonicity():
    tb = get_tables()
    assert tb["ptbl"].shape == (76, 134)
    assert tb["ttbl"].shape == (134, 76)
    assert tb["ttblq"].shape == (440, 152)
    for k, v in tb.items():
        assert np.isfinite(v).all(), k
    # saturation-point pressure increases with scaled humidity
    assert (np.diff(tb["ptbl"], axis=0) > 0).mean() > 0.99
    # moist-adiabat temperature increases with scaled theta_e
    assert (np.diff(tb["ttblq"], axis=0) > 0).mean() > 0.99


def test_deep_convection_adjusts_and_rains():
    c = column()
    th, qv, rain, cldefi = [np.asarray(a) for a in run(c)]
    assert float(rain.min()) > 0.05        # deep convective rain
    dth = th - c["th"]
    assert dth.max() > 0.2                 # heating aloft
    assert (qv - c["qv"]).min() < -1e-4    # drying
    for a in (th, qv, rain, cldefi):
        assert np.isfinite(a).all()
    # cloud efficiency stays within scheme bounds
    assert (cldefi >= EFIMN - 1e-6).all() and (cldefi <= 1.0 + 1e-6).all()


def test_enthalpy_roughly_conserved():
    """BMJ precipitates the column-enthalpy surplus: integral of
    cp*dT + Lv*dq is small relative to Lv*rain (the residual comes from
    the reference's HCORR denominator excluding the top layer)."""
    c = column()
    th, qv, rain, _ = [np.asarray(a) for a in run(c)]
    dpm = c["rho"] * 9.81 * c["dz"]
    dh = ((th - c["th"]) * c["exner"] * 1004.6
          + (qv - c["qv"]) * 2.5e6) * dpm / 9.81
    residual = np.abs(dh.sum(0))
    assert (residual < 0.15 * 2.5e6 * rain / 1000.0 * 1e3 + 1e3).all()


def test_stable_column_quiet():
    c = column(t_sfc=288.0, lapse=4.0e-3, rh=0.3, rh_top=0.3)
    th, qv, rain, cldefi = [np.asarray(a) for a in run(c)]
    assert float(rain.max()) == 0.0
    np.testing.assert_array_equal(th, c["th"])
    np.testing.assert_array_equal(qv, c["qv"])
    # no-convection resets efficiency toward the land/sea background
    assert np.allclose(cldefi, 1.0)        # land


def test_sea_points_use_sea_efficiency():
    c = column(t_sfc=288.0, lapse=4.0e-3, rh=0.3, rh_top=0.3)
    _, _, _, cldefi = run(c, xland=2.0)    # water
    assert np.allclose(np.asarray(cldefi), AVGEFI)


def test_shallow_no_precip():
    # conditionally unstable but shallow moist layer: cloud depth below
    # DEPMIN -> shallow mixing, no rain
    c = column(t_sfc=296.0, lapse=7.5e-3, rh=0.85, rh_top=0.10, nz=20)
    th, qv, rain, _ = [np.asarray(a) for a in run(c)]
    assert float(rain.max()) < 1e-6
    assert np.isfinite(th).all() and np.isfinite(qv).all()
    # shallow adjustment conserves column moisture (mixing only)
    dpm = c["rho"] * 9.81 * c["dz"]
    dq_col = ((qv - c["qv"]) * dpm / 9.81).sum(0)
    assert np.abs(dq_col).max() < 5e-2


def test_model_runs_with_bmj():
    m = ideal_ridge_model(nx=40, ny=12, nz=15, dx=4000.0,
                          hill_height=300.0, u_speed=8.0, rh=0.95,
                          mp=C.MP_WSM3, conv=C.CU_BMJ)
    assert "cldefi" in m.state
    m.advance(1800.0)
    for n in ("potential_temperature", "water_vapor",
              "convective_precipitation", "precipitation", "cldefi"):
        assert np.isfinite(m.field(n)).all(), n
    th = m.field("potential_temperature")
    assert 250 < th.min() and th.max() < 600
