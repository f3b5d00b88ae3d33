"""Wind balancing tests (mirrors src/tests/test_wind.f90 and the
test_divergence runtime check in advect.f90:273-304)."""

import jax.numpy as jnp
import numpy as np
import pytest

from icar_tpu.config import Options
from icar_tpu.grid import build_geometry
from icar_tpu.ops.advection import divergence_check, setup_courant_winds
from icar_tpu.ops.wind import (
    balance_uvw, calc_divergence, iterative_winds, make_winds_grid_relative,
    mass_conservative_acceleration,
)
from tests.test_grid import default_options, latlon, ridge_terrain


def make_geom(nz=10, ny=20, nx=30, hill=1000.0, flat_z_height=-3):
    o = default_options(nz=nz, ny=ny, nx=nx)
    o.domain.flat_z_height = flat_z_height
    terrain = ridge_terrain(ny, nx, hill)
    lat, lon = latlon(ny, nx)
    return build_geometry(terrain, lat, lon, o), o


def test_balance_uvw_zero_divergence():
    g, o = make_geom()
    nz, ny, nx = g.nz, g.ny, g.nx
    u = jnp.full((nz, ny, nx + 1), 5.0)
    v = jnp.full((nz, ny + 1, nx), 2.0)
    w = balance_uvw(u, v, g.jacobian_u, g.jacobian_v, g.jacobian_w,
                    g.advection_dz, g.dx, g.jacobian)
    div = calc_divergence(u, v, w, g.jacobian_u, g.jacobian_v, g.jacobian_w,
                          g.advection_dz, g.dx, g.jacobian)
    assert float(jnp.abs(div).max()) < 1e-5
    # over a ridge with constant u, w must be nonzero (flow deflects)
    assert float(jnp.abs(w).max()) > 1e-3


def test_courant_winds_divergence_free():
    """After balancing, the advection Courant winds must satisfy the
    discrete divergence check the reference runs in debug mode."""
    g, o = make_geom()
    nz, ny, nx = g.nz, g.ny, g.nx
    rng = np.random.default_rng(1)
    u = jnp.asarray(5.0 + rng.normal(0, 1.0, (nz, ny, nx + 1)), jnp.float32)
    v = jnp.asarray(2.0 + rng.normal(0, 1.0, (nz, ny + 1, nx)), jnp.float32)
    w = balance_uvw(u, v, g.jacobian_u, g.jacobian_v, g.jacobian_w,
                    g.advection_dz, g.dx, g.jacobian)
    dt = 20.0
    winds = setup_courant_winds(u, v, w, dt, g.dx, g.jacobian_u,
                                g.jacobian_v, g.jacobian_w, None)
    maxdiv = float(divergence_check(winds, g.advection_dz))
    assert maxdiv < 1e-3   # reference threshold (advect.f90:295)


def test_rotation_identity_on_linear_field():
    g, o = make_geom(hill=0.0)
    nz, ny, nx = g.nz, g.ny, g.nx
    # linear-in-x u survives destagger+restagger exactly
    xs = jnp.arange(nx + 1, dtype=jnp.float32)
    u = jnp.broadcast_to(xs, (nz, ny, nx + 1))
    v = jnp.zeros((nz, ny + 1, nx))
    sin0 = jnp.zeros((ny, nx))
    cos0 = jnp.ones((ny, nx))
    u2, v2 = make_winds_grid_relative(u, v, sin0, cos0)
    np.testing.assert_allclose(np.asarray(u2), np.asarray(u), atol=1e-4)
    np.testing.assert_allclose(np.asarray(v2), 0.0, atol=1e-4)


def test_rotation_90deg():
    g, o = make_geom(hill=0.0, ny=12, nx=12)
    nz, ny, nx = g.nz, g.ny, g.nx
    u = jnp.full((nz, ny, nx + 1), 3.0)
    v = jnp.zeros((nz, ny + 1, nx))
    # 90-degree rotation: u -> v
    sin = jnp.ones((ny, nx))
    cos = jnp.zeros((ny, nx))
    u2, v2 = make_winds_grid_relative(u, v, sin, cos)
    np.testing.assert_allclose(np.asarray(u2), 0.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(v2), 3.0, atol=1e-5)


def test_mass_conservative_acceleration():
    g, o = make_geom()
    u = jnp.full((g.nz, g.ny, g.nx + 1), 10.0)
    v = jnp.full((g.nz, g.ny + 1, g.nx), 10.0)
    u2, v2 = mass_conservative_acceleration(u, v, jnp.asarray(g.zr_u), jnp.asarray(g.zr_v))
    # where levels compress (zr < 1) wind accelerates
    assert float(u2.max()) > 10.0
    np.testing.assert_allclose(np.asarray(u2), 10.0 / g.zr_u, rtol=1e-6)


def test_iterative_winds_reduces_divergence():
    g, o = make_geom(nz=8, ny=16, nx=24, hill=500.0)
    nz, ny, nx = g.nz, g.ny, g.nx
    rng = np.random.default_rng(2)
    u = jnp.asarray(5.0 + rng.normal(0, 2.0, (nz, ny, nx + 1)), jnp.float32)
    v = jnp.asarray(rng.normal(0, 2.0, (nz, ny + 1, nx)), jnp.float32)

    u2, v2 = iterative_winds(u, v, g, n_iterations=50)

    # w fixed by the solver's initial guess (with top-w removal)
    w0 = balance_uvw(u, v, g.jacobian_u, g.jacobian_v, g.jacobian_w,
                     g.advection_dz, g.dx, g.jacobian)
    corr = jnp.minimum(jnp.cumsum(jnp.asarray(g.advection_dz), axis=0)
                       / jnp.sum(jnp.asarray(g.advection_dz), axis=0), 1.0)
    w_fixed = w0 - corr * w0[-1:]

    def full_div(u, v):
        d = calc_divergence(u, v, w_fixed, g.jacobian_u, g.jacobian_v,
                            g.jacobian_w, g.advection_dz, g.dx, g.jacobian)
        return float(jnp.abs(d[:, 2:-2, 2:-2]).mean())

    assert full_div(u2, v2) < 0.25 * full_div(u, v)
