"""Fused Pallas TPU kernel for the Thompson microphysics core.

The Thompson scheme's cost on TPU was never the math — it was XLA
materializing the multi-field process-rate tuples between fusions
(~17 GB of fusion results per substep at 500^2x20, docs/perf_roofline.md).
This kernel runs the whole elementwise core — prep, process rates,
conservation scalings, tendencies, the TAU+1 update, cloud
condensation/evaporation (Newton iteration), rain evaporation, and the
terminal-velocity/filldown block (mp_thompson.f90:1160-2655) — on VMEM
tiles, reading each primary field and each pre-gathered table value once
and writing the 24 core outputs once.

The physics is NOT duplicated here: the kernel body calls the exact
`_prep_block` / `_core_block` functions of physics/mp_thompson.py that
the jnp reference path uses (tests/test_thompson_pallas.py asserts
equivalence through the Pallas interpreter). The big mixing-ratio table
gathers and the small-table one-hot contractions stay in XLA between the
index block and this kernel — TPU gathers cannot run per-lane inside a
Mosaic kernel — as does sedimentation (data-dependent while loops over
full columns) and the final update.

Column-local by construction: z rides the sublane axis in full, columns
ride the lanes, so the (nz, M) flat layout used by mp_simple's kernel
applies unchanged. Single-device only (like every Pallas kernel in this
repo); sharded runs use the jnp path.
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


def _core_kernel(scal_ref, th_ref, qv_ref, qc_ref, qi_ref, qr_ref, qs_ref,
                 qg_ref, ni_ref, nr_ref, exner_ref, p_ref,
                 racs_ref, racg_ref, qrfz_ref,
                 efrw_ref, efsw_ref, qcfz0_ref, qcfz1_ref, ide_ref,
                 iaus0_ref, iaus1_ref, out_ref, *, params_key):
    from ..physics import mp_thompson as mt
    from ..physics import thompson_tables as tt

    params = tt.ThompsonParams(**dict(params_key))
    _, c = tt.get_tables(params)
    DT = scal_ref[0]

    P = mt._prep_block(th_ref[:], qv_ref[:], qc_ref[:], qi_ref[:],
                       qr_ref[:], qs_ref[:], qg_ref[:], ni_ref[:],
                       nr_ref[:], exner_ref[:], p_ref[:], c, params)
    # the one table index the rate logic consumes directly (large-ice
    # autoconversion branch); recomputed per tile from prep values
    idx_i = jnp.where(P["ri"] > tt.r_i[0],
                      mt._mantissa_idx(P["ri"], c.nii2, tt.NTB_I), 0)

    G = {}
    for j, n in enumerate(mt._RACS_NAMES):
        G[n] = racs_ref[j]
    for j, n in enumerate(mt._RACG_NAMES):
        G[n] = racg_ref[j]
    for j, n in enumerate(mt._QRFZ_NAMES):
        G[n] = qrfz_ref[j]
    for ref, n in zip((efrw_ref, efsw_ref, qcfz0_ref, qcfz1_ref, ide_ref,
                       iaus0_ref, iaus1_ref), mt._SMALL_NAMES):
        G[n] = ref[:]

    O = mt._core_block(P, idx_i, G, DT, c, params)
    for j, n in enumerate(mt._O_NAMES):
        out_ref[j] = O[n]


def thompson_core_call(th, qv, qc, qi, qr, qs, qg, ni, nr, exner, p,
                       stacks, small_vals, dt, params_key,
                       interpret=False, tc: int = 256):
    """Invoke the fused core on (nz, ny, nx) fields. ``stacks`` holds the
    stacked big-gather outputs {racs: (12, ...), racg: (5, ...),
    qrfz: (4, ...)}; ``small_vals`` the 7 one-hot-looked-up small-table
    fields in mp_thompson._SMALL_NAMES order. Returns the core-output
    dict keyed by mp_thompson._O_NAMES, shaped like ``th``."""
    from ..physics import mp_thompson as mt

    nz, ny, nx = th.shape
    M = ny * nx
    flat = lambda a: a.reshape(a.shape[:-2] + (M,))
    prim = [flat(a) for a in (th, qv, qc, qi, qr, qs, qg, ni, nr,
                              exner, p)]
    racs = flat(stacks["racs"])
    racg = flat(stacks["racg"])
    qrfz = flat(stacks["qrfz"])
    small = [flat(a) for a in small_vals]
    scal = jnp.asarray(dt, jnp.float32).reshape(1)

    n_out = len(mt._O_NAMES)
    spec = pl.BlockSpec((nz, tc), lambda i: (0, i),
                        memory_space=pltpu.VMEM)

    def gspec(g):
        return pl.BlockSpec((g, nz, tc), lambda i: (0, 0, i),
                            memory_space=pltpu.VMEM)

    kernel = functools.partial(_core_kernel, params_key=params_key)
    out = pl.pallas_call(
        kernel,
        grid=(pl.cdiv(M, tc),),
        interpret=interpret,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [spec] * 11
        + [gspec(racs.shape[0]), gspec(racg.shape[0]),
           gspec(qrfz.shape[0])]
        + [spec] * 7,
        out_specs=gspec(n_out),
        out_shape=jax.ShapeDtypeStruct((n_out, nz, M), th.dtype),
    )(scal, *prim, racs, racg, qrfz, *small)
    shape3 = (nz, ny, nx)
    return {n: out[j].reshape(shape3)
            for j, n in enumerate(mt._O_NAMES)}
