"""NSAS convection tests: deep + shallow triggers, budget, e2e run."""

import jax.numpy as jnp
import numpy as np
import pytest

from icar_tpu import constants as C
from icar_tpu.models.icar import ideal_ridge_model
from icar_tpu.physics.cu_nsas import nsas, fpvs_mb


def column(nz=30, ny=3, nx=3, t_sfc=302.0, lapse=6.5e-3, rh=0.9,
           rh_top=0.35, w_up=0.5, dz0=400.0):
    dz = np.full((nz, ny, nx), dz0, np.float32)
    zif = np.concatenate([np.zeros((1, ny, nx)), np.cumsum(dz, 0)], 0)
    zl = 0.5 * (zif[:-1] + zif[1:])
    t = (t_sfc - lapse * zl).astype(np.float32)
    ex = 9.81 / (287.0 * lapse)
    p = (1e5 * (t / t_sfc) ** ex).astype(np.float32)
    p_i = (1e5 * ((t_sfc - lapse * zif[:-1]) / t_sfc) ** ex
           ).astype(np.float32)
    rho = p / (287.0 * t)
    exner = (p / 1e5) ** (287.0 / 1004.6)
    es = 100.0 * np.asarray(fpvs_mb(jnp.asarray(t)))
    rh_prof = np.where(zl < 3000.0, rh, rh_top)
    qv = (0.622 * es / (p - es) * rh_prof).astype(np.float32)
    w_if = np.full((nz + 1, ny, nx), w_up, np.float32)
    zeros = jnp.zeros((nz, ny, nx), jnp.float32)
    return dict(t=jnp.asarray(t), qv=jnp.asarray(qv),
                exner=jnp.asarray(exner), rho=jnp.asarray(rho),
                p=jnp.asarray(p), p_i=jnp.asarray(p_i),
                dz=jnp.asarray(dz), w_if=jnp.asarray(w_if),
                zeros=zeros, t_np=t, qv_np=np.asarray(qv),
                exner_np=np.asarray(exner))


def run(c, dt=600.0, hfx=150.0, qfx=6e-5, hpbl=800.0):
    ny, nx = c["t"].shape[1:]
    z = c["zeros"]
    return nsas(z + 5.0, z + 1.0, c["w_if"], c["t"], c["qv"], z, z,
                c["rho"], c["p"], c["p_i"], c["dz"], c["exner"],
                jnp.full((ny, nx), hpbl, jnp.float32),
                jnp.full((ny, nx), hfx, jnp.float32),
                jnp.full((ny, nx), qfx, jnp.float32),
                jnp.ones((ny, nx), jnp.float32), 1000.0, dt)


def test_unstable_column_convects():
    c = column()
    th, qv, qc, qi, rain = run(c)
    assert float(rain.min()) > 0.1           # deep convective rain
    t_new = np.asarray(th * c["exner"])
    assert (t_new - c["t_np"]).max() > 0.5   # latent heating aloft
    assert float(qc.max()) + float(qi.max()) > 1e-6  # detrained cloud
    for a in (th, qv, qc, qi, rain):
        assert np.isfinite(np.asarray(a)).all()


def test_stable_column_quiet():
    c = column(t_sfc=288.0, lapse=4.0e-3, rh=0.3, rh_top=0.3,
               w_up=-0.05)
    th, qv, qc, qi, rain = run(c, hfx=-10.0, qfx=0.0)
    assert float(rain.max()) == 0.0
    np.testing.assert_allclose(np.asarray(th * c["exner"]), c["t_np"],
                               atol=1e-3)
    assert float(qc.max()) == 0.0 and float(qi.max()) == 0.0


def test_water_budget_roughly_closed():
    c = column()
    th, qv, qc, qi, rain = run(c)
    p_i = np.asarray(c["p_i"])
    p = np.asarray(c["p"])
    dp = p_i - np.concatenate([p_i[1:], 2 * p[-1:] - p_i[-1:]], 0)
    dwater = ((np.asarray(qv) - c["qv_np"] + np.asarray(qc)
               + np.asarray(qi)) * dp / 9.81).sum(0)
    # rain (mm = kg/m2) balances column drying; the scheme computes
    # tendencies on shifted half-level profiles but applies them at
    # full levels (as the reference does), so allow ~15%
    np.testing.assert_allclose(-dwater, np.asarray(rain), rtol=0.15)


def test_shallow_scheme_acts_without_deep():
    # weakly unstable, dry aloft: deep trigger fails (no LFC depth) but
    # surface buoyancy flux drives shallow mixing in the lowest layers
    c = column(t_sfc=295.0, lapse=7.0e-3, rh=0.75, rh_top=0.15,
               w_up=0.0, nz=20)
    th, qv, qc, qi, rain = run(c, hfx=250.0, qfx=1.2e-4, hpbl=1200.0)
    dth = np.abs(np.asarray(th * c["exner"]) - c["t_np"])
    assert np.isfinite(dth).all()
    # shallow convection transports heat but produces little/no rain
    assert float(np.asarray(rain).max()) < 0.5


def test_subsidence_suppresses():
    c_up = column(w_up=0.5)
    c_dn = column(w_up=-0.5)
    _, _, _, _, rain_up = run(c_up)
    _, _, _, _, rain_dn = run(c_dn)
    # cloud-base omega enters the trigger + closure: subsidence weakens
    assert float(rain_dn.mean()) < float(rain_up.mean())


def test_model_runs_with_nsas():
    m = ideal_ridge_model(nx=40, ny=12, nz=15, dx=4000.0,
                          hill_height=300.0, u_speed=8.0, rh=0.95,
                          mp=C.MP_WSM3, conv=C.CU_NSAS)
    assert "convective_precipitation" in m.state
    m.advance(1800.0)
    for n in ("potential_temperature", "water_vapor",
              "convective_precipitation", "precipitation"):
        assert np.isfinite(m.field(n)).all(), n
    th = m.field("potential_temperature")
    assert 250 < th.min() and th.max() < 600
