"""Tiedtke convection tests: triggers, conservation, and e2e model run."""

import jax.numpy as jnp
import numpy as np
import pytest

from icar_tpu import constants as C
from icar_tpu.models.icar import ideal_ridge_model
from icar_tpu.physics.cu_tiedtke import tiedtke, _qsat


def column(nz=20, ny=3, nx=3, t_sfc=302.0, lapse=0.0075, rh=0.85,
           rh_bl=None, w_up=0.3, qconv=2e-7):
    dz = np.full((nz, ny, nx), 500.0, np.float32)
    z = np.cumsum(dz, 0) - 250.0
    p = (1e5 * np.exp(-z / 8000.0)).astype(np.float32)
    p_i = np.zeros((nz + 1, ny, nx), np.float32)
    p_i[0] = 1.013e5
    p_i[1:-1] = 0.5 * (p[:-1] + p[1:])
    p_i[-1] = p[-1] - (p[-2] - p[-1]) / 2
    t = (t_sfc - lapse * z).astype(np.float32)
    exner = (p / 1e5) ** (287.05 / 1005.46)
    rho = p / (287.05 * t)
    qs = np.asarray(_qsat(jnp.asarray(t), jnp.asarray(p)))
    qs = qs / (1 - qs)            # to mixing ratio
    qv = (rh * qs).astype(np.float32)
    if rh_bl:
        qv[0:3] = (rh_bl * qs[0:3]).astype(np.float32)
    w_if = np.zeros((nz + 1, ny, nx), np.float32)
    w_if[1:8] = w_up
    zeros = jnp.zeros((nz, ny, nx), jnp.float32)
    return dict(t=jnp.asarray(t), qv=jnp.asarray(qv),
                exner=jnp.asarray(exner), rho=jnp.asarray(rho),
                p=jnp.asarray(p), p_i=jnp.asarray(p_i),
                dz=jnp.asarray(dz), w_if=jnp.asarray(w_if),
                qtend=jnp.full((nz, ny, nx), qconv, jnp.float32),
                zeros=zeros, t_np=t, qv_np=np.asarray(qv),
                exner_np=np.asarray(exner), rho_np=np.asarray(rho))


def run(c, dt=60.0, hfx=150.0, qfx=1e-4):
    ny, nx = c["t"].shape[1:]
    z = c["zeros"]
    return tiedtke(z + 5.0, z, c["w_if"], c["t"], c["qv"], z, z,
                   c["exner"], c["rho"], c["qtend"], z, c["p"],
                   c["p_i"], c["dz"],
                   jnp.full((ny, nx), qfx, jnp.float32),
                   jnp.full((ny, nx), hfx, jnp.float32),
                   jnp.ones((ny, nx), jnp.float32), dt)


def test_unstable_column_convects():
    c = column()
    th, qv, qc, qi, rain = run(c)
    assert float(rain.min()) > 0.01          # convective rain
    t_new = np.asarray(th * c["exner"])
    assert (t_new - c["t_np"]).max() > 0.05  # convective heating
    assert float(qc.max()) + float(qi.max()) > 1e-6  # detrained cloud
    for a in (th, qv, qc, qi, rain):
        assert np.isfinite(np.asarray(a)).all()


def test_stable_column_quiet():
    c = column(t_sfc=285.0, lapse=0.005, rh=0.3, w_up=0.0, qconv=0.0)
    th, qv, qc, qi, rain = run(c, hfx=5.0, qfx=1e-6)
    assert float(rain.max()) == 0.0
    np.testing.assert_allclose(np.asarray(th * c["exner"]), c["t_np"],
                               atol=1e-3)


def test_water_conservation():
    c = column()
    th, qv, qc, qi, rain = run(c)
    dp = np.asarray(c["p_i"][:-1] - c["p_i"][1:])
    g = 9.806
    col0 = (c["qv_np"] / (1 + c["qv_np"]) * dp / g).sum(0)
    qv_n = np.asarray(qv)
    col1 = ((qv_n / (1 + qv_n) + np.asarray(qc) + np.asarray(qi))
            * dp / g).sum(0)
    # precip [mm = kg/m2] balances column drying to ~5%
    np.testing.assert_allclose(col0 - col1, np.asarray(rain),
                               rtol=0.05, atol=0.02)


def test_no_trigger_without_moisture_convergence():
    c = column(qconv=0.0, w_up=0.0)
    c2 = column()
    _, _, _, _, rain_dry = run(c, qfx=1e-3)   # strong sfc flux only
    _, _, _, _, rain_conv = run(c2)
    # deep (type-1) convection requires moisture convergence exceeding
    # surface evaporation; without it rain is much weaker
    assert float(rain_conv.mean()) > float(rain_dry.mean())


def test_model_runs_with_tiedtke():
    m = ideal_ridge_model(nx=40, ny=12, nz=15, dx=4000.0,
                          hill_height=300.0, u_speed=8.0, rh=0.95,
                          mp=C.MP_WSM3, conv=C.CU_TIEDTKE)
    assert "convective_precipitation" in m.state
    m.advance(1800.0)
    for n in ("potential_temperature", "water_vapor",
              "convective_precipitation", "precipitation"):
        assert np.isfinite(m.field(n)).all(), n
    th = m.field("potential_temperature")
    assert 250 < th.min() and th.max() < 600
