"""YSU PBL scheme tests: surface layer, PBL height diagnosis, implicit
diffusion, conservation, and e2e model run."""

import jax.numpy as jnp
import numpy as np
import pytest

from icar_tpu import constants as C
from icar_tpu.models.icar import ideal_ridge_model
from icar_tpu.physics import ysu as Y


def column(nz=15, ny=4, nx=4, t_sfc=290.0, lapse=0.0098, qv0=0.008,
           u0=5.0, tskin_excess=0.0):
    """Idealized column; lapse=0.0098 ~ neutral, > adiabatic = unstable."""
    dz = np.full((nz, ny, nx), 200.0, np.float32)
    zi = np.concatenate([np.zeros((1, ny, nx)), np.cumsum(dz, axis=0)])
    z = 0.5 * (zi[:-1] + zi[1:])
    p = (1e5 * np.exp(-z / 8000.0)).astype(np.float32)
    t = (t_sfc - lapse * z).astype(np.float32)
    exner = (p / 1e5) ** C.ROVCP
    th = t / exner
    p_i = np.concatenate([[p[0] + (p[0] - p[1]) / 2], 0.5 * (p[:-1] + p[1:])])
    qv = (qv0 * np.exp(-z / 3000.0)).astype(np.float32)
    u = np.full((nz, ny, nx), u0, np.float32)
    zeros2 = np.zeros((ny, nx), np.float32)
    return dict(
        u=jnp.asarray(u), v=jnp.zeros_like(jnp.asarray(u)),
        th=jnp.asarray(th), t=jnp.asarray(t), qv=jnp.asarray(qv),
        qc=jnp.zeros((nz, ny, nx), jnp.float32),
        qi=jnp.zeros((nz, ny, nx), jnp.float32),
        p=jnp.asarray(p), p_i=jnp.asarray(p_i.astype(np.float32)),
        exner=jnp.asarray(exner), dz=jnp.asarray(dz),
        z=jnp.asarray(z.astype(np.float32)),
        terrain=jnp.asarray(zeros2),
        psfc=jnp.asarray((p[0] + (p[0] - p[1]) / 2).astype(np.float32)),
        tskin=jnp.full((ny, nx), t_sfc + tskin_excess, jnp.float32),
        znt=jnp.full((ny, nx), 0.1, jnp.float32),
        xland=jnp.ones((ny, nx), jnp.float32),
        ust=jnp.full((ny, nx), 0.3, jnp.float32),
        u10=jnp.full((ny, nx), u0 * 0.8, jnp.float32),
        v10=jnp.asarray(zeros2))


def run_ysu(c, hfx=100.0, qfx=3e-5, dt=60.0):
    ny, nx = c["tskin"].shape
    hfx_a = jnp.full((ny, nx), hfx, jnp.float32)
    qfx_a = jnp.full((ny, nx), qfx, jnp.float32)
    t1 = c["t"][0]
    z_atm = c["z"][0] - c["terrain"]
    wspd10 = jnp.maximum(jnp.sqrt(c["u10"] ** 2 + c["v10"] ** 2), 1e-5)
    ri = C.GRAVITY / t1 * (t1 - c["tskin"]) * z_atm / wspd10 ** 2
    sfc = Y.surface_layer(c["psfc"], c["tskin"], c["p"][0], t1, c["qc"][0],
                          c["u"][0], c["v"][0], z_atm, c["znt"], c["xland"],
                          1000.0, c["ust"], hfx_a, qfx_a)
    return Y.ysu(c["u"], c["v"], c["th"], c["t"], c["qv"], c["qc"], c["qi"],
                 c["p"], c["p_i"], c["exner"], c["dz"], c["z"], c["terrain"],
                 c["psfc"], c["tskin"], c["znt"], c["xland"], hfx_a, qfx_a,
                 c["ust"], c["u10"], c["v10"], sfc.psim, sfc.psih, ri, dt)


def test_surface_layer_regimes():
    ny, nx = 3, 3
    mk = lambda v: jnp.full((ny, nx), v, jnp.float32)
    # unstable: warm skin -> regime 4, psim > 0
    sfc = Y.surface_layer(mk(1e5), mk(295.0), mk(99000.0), mk(290.0),
                          mk(0.0), mk(5.0), mk(0.0), mk(50.0), mk(0.1),
                          mk(1.0), 1000.0, mk(0.4), mk(150.0), mk(5e-5))
    assert float(jnp.round(sfc.regime).min()) == 4
    assert float(sfc.psim.min()) > 0
    # stable: cold skin -> regime 1 or 2, psim <= 0
    sfc2 = Y.surface_layer(mk(1e5), mk(282.0), mk(99000.0), mk(290.0),
                           mk(0.0), mk(2.0), mk(0.0), mk(50.0), mk(0.1),
                           mk(1.0), 1000.0, mk(0.1), mk(-30.0), mk(0.0))
    assert float(jnp.round(sfc2.regime).max()) <= 2
    assert float(sfc2.psim.max()) <= 0


def test_unstable_column_grows_pbl():
    c = column(lapse=0.0098, tskin_excess=3.0)   # near-neutral + warm skin
    th, qv, qc, qi, hpbl, kpbl, exch = run_ysu(c, hfx=200.0)
    # a convective boundary layer several hundred meters deep
    assert float(hpbl.min()) > 100.0
    assert int(kpbl.max()) >= 2
    assert np.isfinite(np.asarray(th)).all()


def test_stable_column_shallow_pbl():
    c = column(lapse=0.004, tskin_excess=-3.0)   # stable + cold skin
    th, qv, qc, qi, hpbl_s, kpbl_s, _ = run_ysu(c, hfx=-20.0, qfx=0.0)
    c2 = column(lapse=0.0098, tskin_excess=3.0)
    _, _, _, _, hpbl_u, _, _ = run_ysu(c2, hfx=200.0)
    assert float(hpbl_s.mean()) < float(hpbl_u.mean())


def test_surface_heating_warms_lowest_layer():
    c = column(lapse=0.0098)
    th0 = np.asarray(c["th"]).copy()
    th, qv, *_ = run_ysu(c, hfx=300.0, qfx=1e-4, dt=120.0)
    dth = np.asarray(th) - th0
    assert dth[0].min() > 0            # heat flux warms lowest layer
    # moisture flux effect isolated against an identical no-flux run
    # (mixing alone dries the moist surface layer)
    c2 = column(lapse=0.0098)
    _, qv_noflux, *_ = run_ysu(c2, hfx=300.0, qfx=0.0, dt=120.0)
    assert float((qv[0] - qv_noflux[0]).min()) > 0
    # top model level untouched (kte-1 operation)
    np.testing.assert_allclose(dth[-1], 0.0, atol=1e-7)


def test_heat_conservation_without_surface_flux():
    """With zero surface flux and zero entrainment sources the implicit
    diffusion conserves column-integrated (p-weighted) theta."""
    c = column(lapse=0.012, tskin_excess=-1.0)   # stable: pblflg false
    th0 = np.asarray(c["th"])
    p_i = np.asarray(c["p_i"])
    delp = p_i[:-1] - p_i[1:]
    th, qv, *_ = run_ysu(c, hfx=0.0, qfx=0.0, dt=60.0)
    nzt = th0.shape[0] - 1
    col0 = (th0[:nzt] * delp[:nzt]).sum(axis=0)
    col1 = (np.asarray(th)[:nzt] * delp[:nzt]).sum(axis=0)
    np.testing.assert_allclose(col1, col0, rtol=2e-5)


def test_model_runs_with_ysu():
    m = ideal_ridge_model(nx=40, ny=12, nz=10, dx=1000.0, hill_height=400.0,
                          u_speed=8.0, rh=0.9, pbl=C.PBL_YSU,
                          lsm=C.LSM_BASIC, rad=C.RA_SIMPLE)
    m.advance(600.0)
    for n in ("potential_temperature", "water_vapor", "hpbl"):
        assert np.isfinite(m.field(n)).all(), n
    assert m.field("water_vapor").min() >= 0
    assert m.field("hpbl").max() >= 0
