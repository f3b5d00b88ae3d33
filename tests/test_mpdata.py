"""MPDATA advection tests (mirrors src/tests/test_mpdata.f90: 1D advection
correctness, monotonicity with FCT, and sharpness vs upwind)."""

import jax.numpy as jnp
import numpy as np
import pytest

from icar_tpu.ops.advection import advect3d_upwind, setup_courant_winds
from icar_tpu.ops.mpdata import advect3d_mpdata
from icar_tpu.ops.wind import balance_uvw
from tests.test_advection import balanced_winds, flat_geom


def gauss_blob(g, center=12, width=3.0):
    x = np.arange(g.nx)
    q = np.zeros((g.nz, g.ny, g.nx), np.float32)
    q[:, :, :] = np.exp(-((x - center) / width) ** 2)[None, None, :]
    return jnp.asarray(q)


def run_scheme(g, q, winds, nsteps, scheme, order=2, fct=True):
    rho = jnp.ones((g.nz, g.ny, g.nx), jnp.float32)
    dz = jnp.asarray(g.advection_dz)
    jaco = jnp.asarray(g.jacobian)
    for _ in range(nsteps):
        if scheme == "upwind":
            q = advect3d_upwind(q, winds, rho, dz, jaco)
        else:
            q = advect3d_mpdata(q, winds, rho, dz, jaco, order, fct)
    return np.asarray(q)


@pytest.fixture(scope="module")
def setup():
    g, o = flat_geom(nz=6, ny=12, nx=64)
    u, v, w = balanced_winds(g, 10.0, 0.0)
    dt = 50.0  # Courant 0.5
    winds = setup_courant_winds(u, v, w, dt, g.dx, g.jacobian_u,
                                g.jacobian_v, g.jacobian_w, None)
    return g, winds


def test_mpdata_sharper_than_upwind(setup):
    g, winds = setup
    q0 = gauss_blob(g)
    up = run_scheme(g, q0, winds, 30, "upwind")
    mp = run_scheme(g, q0, winds, 30, "mpdata")
    # MPDATA's antidiffusive correction must preserve the peak better
    assert mp[0, 6].max() > up[0, 6].max() * 1.1
    # both transport the blob the same distance (~15 cells)
    x = np.arange(g.nx)
    com_up = (x * up[0, 6]).sum() / up[0, 6].sum()
    com_mp = (x * mp[0, 6]).sum() / mp[0, 6].sum()
    assert abs(com_up - com_mp) < 1.5


def test_fct_keeps_monotonicity(setup):
    g, winds = setup
    # a step function: the acid test for overshoots
    q0 = np.zeros((g.nz, g.ny, g.nx), np.float32)
    q0[:, :, 5:20] = 1.0
    q = jnp.asarray(q0)
    out_fct = run_scheme(g, q, winds, 25, "mpdata", fct=True)
    assert out_fct.min() >= -1e-6
    assert out_fct.max() <= 1.0 + 1e-5
    # without FCT, 2nd-order correction may overshoot slightly
    out_nofct = run_scheme(g, q, winds, 25, "mpdata", fct=False)
    assert out_fct.max() <= out_nofct.max() + 1e-6


def test_mpdata_constancy(setup):
    g, winds = setup
    q = jnp.full((g.nz, g.ny, g.nx), 2.5, jnp.float32)
    out = run_scheme(g, q, winds, 5, "mpdata")
    np.testing.assert_allclose(out, 2.5, rtol=5e-5)


def test_mpdata_mass_conservation():
    g, o = flat_geom(nz=6, ny=16, nx=30)
    rng = np.random.default_rng(7)
    u_np = rng.normal(0, 3.0, (g.nz, g.ny, g.nx + 1)).astype(np.float32)
    v_np = rng.normal(0, 3.0, (g.nz, g.ny + 1, g.nx)).astype(np.float32)
    for a in (u_np, v_np):
        a[:, :3, :] = 0; a[:, -3:, :] = 0; a[:, :, :3] = 0; a[:, :, -3:] = 0
    u_np -= u_np.mean(axis=0, keepdims=True)
    v_np -= v_np.mean(axis=0, keepdims=True)
    u, v = jnp.asarray(u_np), jnp.asarray(v_np)
    w = balance_uvw(u, v, g.jacobian_u, g.jacobian_v, g.jacobian_w,
                    g.advection_dz, g.dx, g.jacobian)
    winds = setup_courant_winds(u, v, w, 20.0, g.dx, g.jacobian_u,
                                g.jacobian_v, g.jacobian_w, None)
    q0 = jnp.asarray(1.0 + rng.random((g.nz, g.ny, g.nx)), jnp.float32)
    q = run_scheme(g, q0, winds, 5, "mpdata")
    mass0 = float(jnp.sum(q0 * g.jacobian * g.advection_dz))
    mass = float((q * np.asarray(g.jacobian) * np.asarray(g.advection_dz)).sum())
    assert abs(mass - mass0) / mass0 < 5e-4


def test_model_runs_with_mpdata():
    from icar_tpu import constants as C
    from icar_tpu.models.icar import ideal_ridge_model
    m = ideal_ridge_model(nx=48, ny=12, nz=10, dx=1000.0, hill_height=500.0,
                          u_speed=10.0, rh=1.0)
    m.options.physics.advection = C.ADV_MPDATA
    m._step_fn = None
    m.advance(600.0)
    assert np.isfinite(m.field("potential_temperature")).all()
    assert m.field("water_vapor").min() >= 0
