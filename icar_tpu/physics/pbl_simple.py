"""Simple local-K PBL diffusion (Louis 1979 / Hong & Pan 1996).

JAX re-implementation of /root/reference/src/physics/pbl_simple.f90:
gradient-Richardson-number stability functions on half levels, an
asymptotic mixing length, and explicit substepped vertical diffusion of
theta / moisture species. All six diffused species are stacked and share
one flux kernel; the per-y-slice CFL substep count of the reference
becomes a single global substep count driven by the domain max.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .. import constants as C

PR_UPPER = 4.0
PR_LOWER = 0.25
ASYMP_LENGTH_SCALE = 1 / 250.0
N_SUBSTEPS = 10.0
DIFFUSION_REDUCTION = 2.0


def eddy_diffusivity(th, qv, qc, qi, qr, qs, u_mass, v_mass, exner, z,
                     terrain, dz, dt, water_mask=None):
    """Scalar diffusion coefficient Kq*dt/dz on half levels k+1/2
    (simple_pbl, pbl_simple.f90:100-135), shape (nz-1, ny, nx)."""
    dz_half = (dz[:-1] + dz[1:]) * 0.5

    shear = jnp.sqrt((u_mass[1:] - u_mass[:-1]) ** 2
                     + (v_mass[1:] - v_mass[:-1]) ** 2) / dz_half
    shear = jnp.maximum(shear, 1e-5)

    vth = th * (1 + 0.61 * qv - (qc + qi + qr + qs))
    vth_grad = (vth[1:] - vth[:-1]) / dz_half

    t_half = (th[:-1] * exner[:-1] + th[1:] * exner[1:]) * 0.5
    rig = C.GRAVITY / t_half * vth_grad / (shear ** 2)
    rig = jnp.maximum(rig, -100.0)

    stability = jnp.where(
        rig > 0, jnp.exp(-8.5 * rig) + 0.15 / (rig + 3),
        1.0 / jnp.sqrt(1 - 1.6 * jnp.minimum(rig, 0.0)))
    prandtl = jnp.clip(1.5 + 3.08 * rig, PR_LOWER, PR_UPPER)

    l = 1.0 / (1.0 / (C.KARMAN * (z[:-1] - terrain[None])) + ASYMP_LENGTH_SCALE)
    K = l ** 2 * stability * shear
    Kq = K / prandtl * dt / dz_half
    Kq = jnp.clip(Kq, 1.0, 1000.0)
    if water_mask is not None:
        # reduce mixing over open water (pbl_simple.f90:128)
        Kq = jnp.where(water_mask[None], Kq / 1000.0, Kq)
    Kq = Kq / DIFFUSION_REDUCTION
    # cap to keep the explicit substepping bounded (pbl_simple.f90:193-196)
    Kq = jnp.minimum(Kq, dz[:-1] * N_SUBSTEPS)
    return Kq


def diffuse(q_stack, Kq, rho, dz):
    """Substepped explicit vertical diffusion of stacked species
    (pbl_diffusion + diffuse_variable, pbl_simple.f90:143-212).

    q_stack: (nq, nz, ny, nx); Kq on half levels (nz-1, ny, nx)."""
    rho_dz = rho * dz
    rhomean = (rho[:-1] + rho[1:]) * 0.5

    nsub = jnp.ceil(2 * jnp.max(Kq / dz[:-1])).astype(jnp.int32)
    nsub = jnp.maximum(nsub, 1)
    Kq = Kq / nsub

    def one_substep(q):
        # fluxes at half levels; no through-surface flux (LSM handles that)
        flux = Kq * rhomean * (q[:, :-1] - q[:, 1:])
        q0 = q[:, :1] - flux[:, :1] / rho_dz[None, :1]
        # NOTE reference quirk preserved: the top level gains its flux
        # divided by rho_dz of the level BELOW (pbl_simple.f90:160)
        qtop = q[:, -1:] + flux[:, -1:] / rho_dz[None, -2:-1]
        qmid = q[:, 1:-1] - (flux[:, 1:] - flux[:, :-1]) / rho_dz[None, 1:-1]
        return jnp.concatenate([q0, qmid, qtop], axis=1)

    def body(carry):
        i, q = carry
        return i + 1, one_substep(q)

    _, q_stack = jax.lax.while_loop(lambda c: c[0] < nsub, body,
                                    (jnp.int32(0), q_stack))
    return q_stack


def pbl_simple(th, qv, qc, qi, qr, qs, u_mass, v_mass, exner, rho, z,
               dz, terrain, dt, water_mask=None):
    """Full scheme (simple_pbl, pbl_simple.f90:71-141). The top model level
    is never diffused. Returns updated (th, qv, qc, qi, qr, qs)."""
    Kq = eddy_diffusivity(th, qv, qc, qi, qr, qs, u_mass, v_mass, exner, z,
                          terrain, dz, dt, water_mask)
    stack = jnp.stack([qv, th, qc, qi, qs, qr])
    stack = diffuse(stack, Kq, rho, dz)
    qv, th, qc, qi, qs, qr = (stack[i] for i in range(6))
    return th, qv, qc, qi, qr, qs
