"""Upwind advection tests (mirrors the 1D correctness intent of
src/tests/test_mpdata.f90 applied to the donor-cell scheme)."""

import jax
import jax.numpy as jnp
import numpy as np

from icar_tpu.grid import build_geometry
from icar_tpu.ops.advection import (
    advect3d_upwind, advect_upwind, setup_courant_winds,
)
from icar_tpu.ops.wind import balance_uvw
from tests.test_grid import default_options, latlon, ridge_terrain


def flat_geom(nz=8, ny=16, nx=40, dx=1000.0):
    o = default_options(nz=nz, ny=ny, nx=nx)
    o.domain.dx = dx
    o.domain.dz_levels = [500.0] * nz
    terrain = np.zeros((ny, nx))
    lat, lon = latlon(ny, nx, dx)
    return build_geometry(terrain, lat, lon, o), o


def balanced_winds(g, uval=5.0, vval=0.0):
    u = jnp.full((g.nz, g.ny, g.nx + 1), uval, jnp.float32)
    v = jnp.full((g.nz, g.ny + 1, g.nx), vval, jnp.float32)
    w = balance_uvw(u, v, g.jacobian_u, g.jacobian_v, g.jacobian_w,
                    g.advection_dz, g.dx, g.jacobian)
    return u, v, w


def test_constant_field_preserved():
    """A uniform scalar must be exactly preserved under balanced winds
    (constancy preservation of the flux form), incl. over terrain."""
    o = default_options(nz=10, ny=20, nx=40)
    o.domain.flat_z_height = -3
    terrain = ridge_terrain(20, 40, 800.0)
    lat, lon = latlon(20, 40)
    g = build_geometry(terrain, lat, lon, o)
    u, v, w = balanced_winds(g, 5.0, 2.0)
    q = jnp.full((g.nz, g.ny, g.nx), 3.0, jnp.float32)
    winds = setup_courant_winds(u, v, w, 30.0, g.dx, g.jacobian_u,
                                g.jacobian_v, g.jacobian_w, None)
    q2 = advect3d_upwind(q, winds, None, g.advection_dz, g.jacobian)
    np.testing.assert_allclose(np.asarray(q2), 3.0, rtol=2e-5)


def test_blob_advects_downstream():
    g, o = flat_geom()
    u, v, w = balanced_winds(g, 10.0, 0.0)
    dt = 50.0  # CFL = u*dt/dx = 0.5
    x = np.arange(g.nx)
    q0 = np.zeros((g.nz, g.ny, g.nx), np.float32)
    q0[:, :, :] = np.exp(-((x - 10) / 3.0) ** 2)[None, None, :]
    q = jnp.asarray(q0)
    winds = setup_courant_winds(u, v, w, dt, g.dx, g.jacobian_u,
                                g.jacobian_v, g.jacobian_w, None)
    nsteps = 20
    for _ in range(nsteps):
        q = advect3d_upwind(q, winds, None, g.advection_dz, g.jacobian)
    qn = np.asarray(q[0, g.ny // 2])
    # center of mass moved by ~ u*dt*nsteps/dx = 10 cells
    com0 = (x * q0[0, g.ny // 2]).sum() / q0[0, g.ny // 2].sum()
    com = (x * qn).sum() / qn.sum()
    assert abs((com - com0) - 10.0) < 1.0
    # upwind is monotone: no new extrema, no negatives
    assert qn.min() >= -1e-7
    assert qn.max() <= q0.max() + 1e-6


def test_mass_conservation_interior():
    """With winds confined to the interior (zero at boundary faces), total
    jacobian-weighted mass is conserved."""
    g, o = flat_geom(nz=6, ny=16, nx=30)
    rng = np.random.default_rng(3)
    # random divergence-containing u field, zeroed near boundaries
    u_np = rng.normal(0, 3.0, (g.nz, g.ny, g.nx + 1)).astype(np.float32)
    u_np[:, :3, :] = 0; u_np[:, -3:, :] = 0
    u_np[:, :, :3] = 0; u_np[:, :, -3:] = 0
    v_np = rng.normal(0, 3.0, (g.nz, g.ny + 1, g.nx)).astype(np.float32)
    v_np[:, :3, :] = 0; v_np[:, -3:, :] = 0
    v_np[:, :, :3] = 0; v_np[:, :, -3:] = 0
    # remove the column mean so column-integrated divergence is zero and
    # w vanishes at the model top -> no flux through the lid
    u_np -= u_np.mean(axis=0, keepdims=True)
    v_np -= v_np.mean(axis=0, keepdims=True)
    u, v = jnp.asarray(u_np), jnp.asarray(v_np)
    w = balance_uvw(u, v, g.jacobian_u, g.jacobian_v, g.jacobian_w,
                    g.advection_dz, g.dx, g.jacobian)
    # w at the model top must be ~0 for conservation; the interior-zeroed
    # u/v make column divergence integrate to 0
    q0 = jnp.asarray(1.0 + rng.random((g.nz, g.ny, g.nx)), jnp.float32)
    winds = setup_courant_winds(u, v, w, 20.0, g.dx, g.jacobian_u,
                                g.jacobian_v, g.jacobian_w, None)
    q = q0
    for _ in range(5):
        q = advect3d_upwind(q, winds, None, g.advection_dz, g.jacobian)
    mass0 = float(jnp.sum(q0 * g.jacobian * g.advection_dz))
    mass = float(jnp.sum(q * g.jacobian * g.advection_dz))
    assert abs(mass - mass0) / mass0 < 2e-4


def test_stacked_advection_matches_single():
    g, o = flat_geom(nz=6, ny=12, nx=20)
    u, v, w = balanced_winds(g, 4.0, -2.0)
    rng = np.random.default_rng(4)
    qs = jnp.asarray(rng.random((3, g.nz, g.ny, g.nx)), jnp.float32)
    out = advect_upwind(qs, u, v, w, 25.0, g.dx, g.jacobian_u, g.jacobian_v,
                        g.jacobian_w, g.jacobian, None, g.advection_dz)
    winds = setup_courant_winds(u, v, w, 25.0, g.dx, g.jacobian_u,
                                g.jacobian_v, g.jacobian_w, None)
    for i in range(3):
        single = advect3d_upwind(qs[i], winds, None, g.advection_dz, g.jacobian)
        np.testing.assert_allclose(np.asarray(out[i]), np.asarray(single),
                                   rtol=1e-6)


def test_boundary_cells_untouched():
    g, o = flat_geom(nz=4, ny=10, nx=12)
    u, v, w = balanced_winds(g, 7.0, 3.0)
    rng = np.random.default_rng(5)
    q0 = jnp.asarray(rng.random((g.nz, g.ny, g.nx)), jnp.float32)
    winds = setup_courant_winds(u, v, w, 10.0, g.dx, g.jacobian_u,
                                g.jacobian_v, g.jacobian_w, None)
    q = advect3d_upwind(q0, winds, None, g.advection_dz, g.jacobian)
    np.testing.assert_array_equal(np.asarray(q[:, 0, :]), np.asarray(q0[:, 0, :]))
    np.testing.assert_array_equal(np.asarray(q[:, -1, :]), np.asarray(q0[:, -1, :]))
    np.testing.assert_array_equal(np.asarray(q[:, :, 0]), np.asarray(q0[:, :, 0]))
    np.testing.assert_array_equal(np.asarray(q[:, :, -1]), np.asarray(q0[:, :, -1]))
