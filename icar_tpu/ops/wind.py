"""Wind field adjustment: rotation, mass balancing, iterative solver.

JAX re-implementation of /root/reference/src/physics/wind.f90. All fields are
(z, y, x); u is x-staggered (nz, ny, nx+1), v is y-staggered (nz, ny+1, nx),
w is defined at the top interface of each layer (nz, ny, nx).

These are pure global-view functions: under `jit` with sharded inputs XLA
partitions them over the device mesh and inserts the halo collectives that
the reference performed with explicit coarray exchanges (exchange_u/v,
exchangeable_obj.f90:164-232).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def calc_divergence(u, v, w, jaco_u, jaco_v, jaco_w, dz, dx, jaco,
                    horz_only=False):
    """Divergence on the terrain-following grid (calc_divergence,
    wind.f90:172-228).

    With ``horz_only`` returns just the metric-weighted horizontal flux
    divergence (used by balance_uvw); otherwise includes the vertical term
    and divides by the jacobian."""
    u_met = u * jaco_u
    v_met = v * jaco_v
    div = ((u_met[:, :, 1:] - u_met[:, :, :-1])
           + (v_met[:, 1:, :] - v_met[:, :-1, :])) / dx
    if horz_only:
        return div
    w_met = w * jaco_w
    dw = jnp.concatenate([w_met[:1], w_met[1:] - w_met[:-1]], axis=0)
    return (div + dw / dz) / jaco


def balance_uvw(u, v, jaco_u, jaco_v, jaco_w, dz, dx, jaco):
    """Solve w from column-integrated horizontal divergence so that
    du/dx + dv/dy + dw/dz = 0 (balance_uvw, wind.f90:81-169).

    The reference's per-level recurrence
        w[k]*jaco_w[k] = w[k-1]*jaco_w[k-1] - div[k]*dz[k]
    telescopes to a cumulative sum starting from w=0 at the ground."""
    div = calc_divergence(u, v, None, jaco_u, jaco_v, jaco_w, dz, dx, jaco,
                          horz_only=True)
    w_jaco = -jnp.cumsum(div * dz, axis=0)
    return w_jaco / jaco_w


def make_winds_grid_relative(u, v, sintheta, costheta):
    """Rotate staggered forcing winds into the local grid orientation
    (make_winds_grid_relative, wind.f90:236-279).

    Destagger -> rotate on the mass grid -> restagger with linear
    extrapolation for the faces lost at the domain edge."""
    nx = u.shape[2] - 1
    ny = v.shape[1] - 1
    # destagger to the mass grid. The reference overwrites the staggered
    # arrays in place (keeping stale last faces); functional equivalent:
    um = (u[:, :, :nx] + u[:, :, 1:]) / 2            # (nz, ny, nx)
    vm = (v[:, :ny, :] + v[:, 1:, :]) / 2            # (nz, ny, nx)
    u_rot = um * costheta - vm * sintheta
    v_rot = vm * costheta + um * sintheta
    # restagger: midpoint average; the edge faces replicate the reference's
    # sequential in-place extrapolation (wind.f90:271-277), which closed-form
    # is 1.5*m0 - 0.5*m1 at the first face and m[-1] + (m[-2] - m[-3])/2 at
    # the last (the "2*u(n) - u(n-1)" there reads already-averaged values)
    u_new = jnp.concatenate([
        1.5 * u_rot[:, :, :1] - 0.5 * u_rot[:, :, 1:2],
        (u_rot[:, :, :-1] + u_rot[:, :, 1:]) / 2,
        u_rot[:, :, -1:] + 0.5 * (u_rot[:, :, -2:-1] - u_rot[:, :, -3:-2])], axis=2)
    v_new = jnp.concatenate([
        1.5 * v_rot[:, :1, :] - 0.5 * v_rot[:, 1:2, :],
        (v_rot[:, :-1, :] + v_rot[:, 1:, :]) / 2,
        v_rot[:, -1:, :] + 0.5 * (v_rot[:, -2:-1, :] - v_rot[:, -3:-2, :])], axis=1)
    return u_new, v_new


def mass_conservative_acceleration(u, v, u_accel, v_accel):
    """Terrain-ratio wind acceleration (mass_conservative_acceleration,
    wind.f90:500-510): divide by the level-compression ratio so that mass
    flux through squeezed levels is conserved."""
    return u / u_accel, v / v_accel


def iterative_winds(u, v, geom, n_iterations: int):
    """Divergence-minimizing iterative wind solver (iterative_winds,
    wind.f90:371-498).

    Fixes w (after removing a linearly-weighted share of the top-level w)
    and iterates corrections distributing residual divergence onto u and v.
    The per-iteration staggered halo exchange of the reference becomes an
    implicit XLA collective when run sharded.
    """
    jaco_u, jaco_v, jaco_w = geom.jacobian_u, geom.jacobian_v, geom.jacobian_w
    dz, dx, jaco = geom.advection_dz, geom.dx, geom.jacobian

    w = balance_uvw(u, v, jaco_u, jaco_v, jaco_w, dz, dx, jaco)

    # remove the fraction of top-level w that grows linearly with height
    # (wind.f90:432-447)
    smooth_height = jnp.sum(dz, axis=0)
    corr_factor = jnp.minimum(jnp.cumsum(dz, axis=0) / smooth_height, 1.0)
    w = w - corr_factor * w[-1:]

    u_cor = 0.5  # wind.f90:457-458: divergence split evenly between u and v
    adj_coef = -2.0 / dx

    def body(_, uv):
        u, v = uv
        div = calc_divergence(u, v, w, jaco_u, jaco_v, jaco_w, dz, dx, jaco)
        adj = div / adj_coef
        # u(ims+2:ime, jms+1:jme-1) gets +adj(left cell) - adj(right cell)
        du = (adj[:, 1:-1, :-1] - adj[:, 1:-1, 1:]) * u_cor   # faces 2..nx-1
        u = u.at[:, 1:-1, 2:-1].add(du[:, :, 1:])
        dv = (adj[:, :-1, 1:-1] - adj[:, 1:, 1:-1]) * u_cor
        v = v.at[:, 2:-1, 1:-1].add(dv[:, 1:, :])
        return u, v

    # the reference loop runs wind_iterations+1 times (do it=0,n)
    u, v = jax.lax.fori_loop(0, n_iterations + 1, body, (u, v))
    return u, v


def update_winds(u, v, geom, options_physics_windtype: int,
                 wind_iterations: int, use_terrain_difference: bool = False,
                 linear_perturbation=None, blocking=None):
    """Wind solver dispatch (update_winds, wind.f90:289-369) minus the
    rotation step (applied by the caller once per forcing ingest).

    Returns (u, v, w) balanced. ``linear_perturbation`` is an optional
    callable applying the linear-theory perturbation (ops/linear_winds.py).
    """
    from .. import constants as C

    if options_physics_windtype in (C.WIND_LINEAR, C.WIND_LINEAR_ITERATIVE):
        if linear_perturbation is not None:
            u, v = linear_perturbation(u, v)
    if blocking is not None:
        # flow-blocking perturbation (add_blocked_flow; the reference's
        # commented hook sits at wind.f90:303-306)
        u, v = blocking(u, v)
    if options_physics_windtype == C.WIND_CONSERVE_MASS:
        u, v = mass_conservative_acceleration(u, v, geom.zr_u, geom.zr_v)
    if options_physics_windtype in (C.WIND_ITERATIVE, C.WIND_LINEAR_ITERATIVE):
        u, v = iterative_winds(u, v, geom, wind_iterations)

    w = balance_uvw(u, v, geom.jacobian_u, geom.jacobian_v, geom.jacobian_w,
                    geom.advection_dz, geom.dx, geom.jacobian)
    return u, v, w
