"""Pallas TPU kernels for the hottest per-cell loops.

The SB04 saturation adjustment (physics/mp_simple.cloud_conversion) is the
dominant substep cost: up to 15 masked sweeps over 4+ full 3D fields. As
plain XLA ops every sweep round-trips HBM (~15x6 arrays of traffic); the
Pallas kernel keeps the whole iteration in VMEM registers — one read and
one write per field — and exits early per tile once its cells converge.

Used automatically on TPU backends; the jnp path remains the reference
implementation (and the CPU/test path).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    _HAS_PALLAS = True
except ImportError:  # pragma: no cover
    _HAS_PALLAS = False

# constants duplicated from physics.mp_simple (kernel-local)
LH_VAPOR = 2.26e6
DLHVDT = 2400.0
HEAT_CAPACITY = 1006.0
FREEZING = 273.15
MAXERR = 1e-4
N_SAT_ITERS = 15


def tpu_backend() -> bool:
    plat = jax.default_backend()
    return plat in ("tpu", "axon")


def _sat_mr(t, p):
    a = jnp.where(t < FREEZING, 21.8745584, 17.2693882)
    b = jnp.where(t < FREEZING, 7.66, 35.86)
    e_s = 610.78 * jnp.exp(a * (t - 273.16) / (t - b))
    e_s = jnp.where(p - e_s <= 0, p * 0.99999, e_s)
    return 0.6219907 * e_s / (p - e_s)


def _sat_adjust_kernel(p_ref, t_ref, qv_ref, qc_ref,
                       t_out, qv_out, qc_out, qvs_out):
    p = p_ref[:]
    t0 = t_ref[:]
    qv0 = qv_ref[:]
    qc0 = qc_ref[:]
    vapor2temp = (LH_VAPOR + (373.15 - t0) * DLHVDT) / HEAT_CAPACITY

    def cond(carry):
        t, qv, qc, qvsat, lastqv, niter, it = carry
        return (it < N_SAT_ITERS) & jnp.any(jnp.abs(lastqv - qv) > MAXERR)

    def body(carry):
        t, qv, qc, qvsat, lastqv, niter, it = carry
        active = jnp.abs(lastqv - qv) > MAXERR
        lastqv = jnp.where(active, qv, lastqv)
        qvs = _sat_mr(t, p)
        qvsat = jnp.where(active, qvs, qvsat)

        supersat = qv > qvs
        exc_sup = (qv - qvs) * 0.5
        exc_un = (qvs - qv) * 0.5
        full_evap = exc_un >= qc
        evap = jnp.where(full_evap, qc, exc_un)
        has_cloud = qc > 0

        dq = jnp.where(supersat, -exc_sup, jnp.where(has_cloud, evap, 0.0))
        t_new = t - dq * vapor2temp
        qv_new = qv + dq
        qc_new = qc - dq

        t = jnp.where(active, t_new, t)
        qv = jnp.where(active, qv_new, qv)
        qc = jnp.where(active, qc_new, qc)
        niter = niter + active.astype(jnp.int32)
        return t, qv, qc, qvsat, lastqv, niter, it + 1

    init = (t0, qv0, qc0, jnp.zeros_like(qv0), qv0 + 2 * MAXERR,
            jnp.zeros(qv0.shape, jnp.int32), jnp.int32(0))
    t, qv, qc, qvsat, lastqv, niter, _ = jax.lax.while_loop(cond, body, init)

    failed = niter >= N_SAT_ITERS
    t = jnp.where(failed, t0, t)
    qv = jnp.where(failed, _sat_mr(t0, p), qv)
    qc = jnp.where(failed, qc0, qc)
    t_out[:] = t
    qv_out[:] = qv
    qc_out[:] = jnp.maximum(qc, 0.0)
    qvs_out[:] = qvsat


@functools.partial(jax.jit, static_argnames=())
def saturation_adjust_tpu(pressure, temperature, qv, qc):
    """Fused saturation adjustment: (nz, ny, nx) fields -> (t, qv, qc, qvsat).

    Tiles rows of the flattened (nz*ny, nx) view; each tile runs the full
    convergence loop in VMEM with an early exit."""
    nz, ny, nx = pressure.shape
    M = nz * ny
    # row-tile size: Mosaic stack-allocates dozens of (TM, nx) temporaries
    # for the while_loop body, so keep tiles small enough that ~70 buffers
    # fit the 16 MB VMEM budget; round to the 8-row sublane granularity
    TM = max(8, min(128, (2 ** 17) // max(nx * 4, 1)) // 8 * 8)
    grid = (pl.cdiv(M, TM),)

    def reshape(a):
        return a.reshape(M, nx)

    spec = pl.BlockSpec((TM, nx), lambda i: (i, 0), memory_space=pltpu.VMEM)
    out_shape = [jax.ShapeDtypeStruct((M, nx), pressure.dtype)] * 4
    t, qv2, qc2, qvs = pl.pallas_call(
        _sat_adjust_kernel,
        grid=grid,
        in_specs=[spec] * 4,
        out_specs=[spec] * 4,
        out_shape=out_shape,
    )(reshape(pressure), reshape(temperature), reshape(qv), reshape(qc))
    shape3 = (nz, ny, nx)
    return (t.reshape(shape3), qv2.reshape(shape3), qc2.reshape(shape3),
            qvs.reshape(shape3))


def saturation_adjust_available() -> bool:
    return _HAS_PALLAS and tpu_backend()
