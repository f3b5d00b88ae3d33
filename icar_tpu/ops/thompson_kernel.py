"""Fused Pallas TPU kernel for the Thompson microphysics core.

The Thompson scheme's cost on TPU was never the math — it was XLA
materializing the multi-field process-rate tuples between fusions and
the full-grid one-hot small-table lookups (multi-GB (n_cells, n_bins)
intermediates per substep; docs/perf_roofline.md). This kernel runs the
whole scheme except the big table gathers — prep, process rates,
conservation scalings, tendencies, the TAU+1 update, cloud
condensation/evaporation (Newton iteration), rain evaporation, terminal
velocities, the four CFL-substepped sedimentation loops, instant
melt/freeze and the final update (mp_thompson.f90:1160-2844) — on VMEM
tiles, reading each primary field and each pre-gathered big-table value
once and writing the nine finished fields + four precip fluxes once.
The SMALL 2D tables (collision efficiencies, cloud freezing, ice
autoconversion) ride along as whole-table VMEM operands and are looked
up per tile with exact one-hot MXU contractions; the sedimentation
while-loops keep their carries in VMEM (each was ~GBs/substep of XLA
loop-carry traffic at bench scale).

The physics is NOT duplicated here: the kernel body calls the exact
`_prep_block` / `_core_block` / `_post_block` / `_small_indices`
functions of physics/mp_thompson.py that the jnp reference path uses
(tests/test_thompson_pallas.py asserts equivalence through the Pallas
interpreter). Only the big mixing-ratio table gathers stay in XLA,
between the index block and this kernel — TPU gathers cannot run
per-lane inside a Mosaic kernel.

Column-local by construction: z rides the sublane axis in full, columns
ride the lanes, so the (nz, M) flat layout used by mp_simple's kernel
applies unchanged. Single-device only (like every Pallas kernel in this
repo); sharded runs use the jnp path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    _HAS_PALLAS = True
except ImportError:  # pragma: no cover
    _HAS_PALLAS = False

# the four small-table groups, in kernel-operand order:
# (prep-dict stack key, table names in stack order, (ia, ib) index keys)
_SMALL_GROUPS = (
    ("_stk_efrw", ("t_Efrw",), ("idx_efr", "idx_efc")),
    ("_stk_efsw", ("t_Efsw",), ("idx_efs", "idx_efc")),
    ("_stk_qcfz", ("tpi_qcfz", "tni_qcfz"), ("idx_c", "idx_tc")),
    ("_stk_iaus", ("tpi_ide", "tps_iaus", "tni_iaus"),
     ("idx_i", "idx_i1")),
)

_TAB_CACHE = {}


def _small_table_stacks(params_key):
    """Host-side stacked (NT, A, B) small tables in _SMALL_GROUPS order
    (built once per parameter set)."""
    if params_key not in _TAB_CACHE:
        from ..physics import mp_thompson as mt
        from ..physics.thompson_tables import ThompsonParams

        T = mt._prep_tables(ThompsonParams(**dict(params_key)))
        _TAB_CACHE[params_key] = [np.asarray(T[stk], np.float32)
                                  for stk, _, _ in _SMALL_GROUPS]
    return _TAB_CACHE[params_key]


def _lookup2_tile(tab_ref, names, ia, ib):
    """Exact one-hot 2D-table lookup on a VMEM tile.

    tab_ref holds the (NT, A, B) table stack in VMEM; ia/ib are (nz, tc)
    int32 bin indices. out[c] = T[t, ia[c], ib[c]] for each table t, via
    one (n, A) x (A, B) MXU dot per table and a masked lane-reduction —
    both exact because every one-hot row has a single 1.0 (products are
    0 or the table value; sums add exact zeros). Reshapes only
    collapse/split LEADING dims (minor dim intact) — Mosaic rejects
    minor-dim shape casts."""
    nz, tc = ia.shape
    n = nz * tc
    a_dim = tab_ref.shape[1]
    b_dim = tab_ref.shape[2]
    f32 = jnp.float32
    oa = (ia[:, :, None]
          == jax.lax.broadcasted_iota(jnp.int32, (nz, tc, a_dim), 2)
          ).astype(f32).reshape(n, a_dim)
    ob = (ib[:, :, None]
          == jax.lax.broadcasted_iota(jnp.int32, (nz, tc, b_dim), 2)
          ).astype(f32)
    out = {}
    for t, nm in enumerate(names):
        rows = jax.lax.dot_general(
            oa, tab_ref[t], (((1,), (0,)), ((), ())),
            preferred_element_type=f32,
            precision=jax.lax.Precision.HIGHEST)        # (n, B)
        rows3 = rows.reshape(nz, tc, b_dim)
        out[nm] = jnp.sum(rows3 * ob, axis=-1)
    return out


def _core_kernel(scal_ref, qstk_ref, exner_ref, p_ref, dz_ref,
                 racs_ref, racg_ref, qrfz_ref,
                 efrw_t_ref, efsw_t_ref, qcfz_t_ref, iaus_t_ref,
                 out_ref, ppt_ref, *, params_key, smap, m_total):
    from ..physics import mp_thompson as mt
    from ..physics import thompson_tables as tt

    params = tt.ThompsonParams(**dict(params_key))
    _, c = tt.get_tables(params)
    DT = scal_ref[0]

    # the advected-species stack is the kernel's primary operand: the 9
    # Thompson fields are static slices of it (``smap`` maps scheme
    # position -> stack row), so the caller never unstacks/restacks
    # around the kernel (each jnp.stack lowered to a chain of full-stack
    # dynamic-update-slices, ~1.6 GB/substep at 500^2x20)
    th, qv, qc, qi, qr, qs, qg, ni, nr = (qstk_ref[i] for i in smap)
    exner = exner_ref[:]
    pres = p_ref[:]

    # ---- tile activity predicate (the reference's own column skips,
    # mp_thompson.f90 L_qc/L_qr/... guards, lifted to tile granularity):
    # a tile with no hydrometeors above the R1 presence floor, no water
    # supersaturation anywhere (cond_on, :2065) and water-vapor ice
    # supersaturation below the 25% nucleation trigger (:1906) is inert —
    # the scheme's only unconditional actions on such cells are the
    # qv >= 1e-7 driver floor and sub-R1 zeroing, applied in the cheap
    # branch below. The full rate pipeline costs ~60 ms/substep at 500^2
    # when evaluated everywhere; clear-air tiles skip all of it.
    temp = th * exner
    qv_c = jnp.maximum(1e-10, qv)
    ssatw = qv_c / mt.rslf(pres, temp) - 1.0
    sati = qv_c / mt.rsif(pres, temp)
    hyd = jnp.maximum(jnp.maximum(jnp.maximum(qc, qi), jnp.maximum(qr, qs)),
                      qg)
    # tail-tile pad lanes hold garbage (NaNs poison an unmasked max and
    # silently flip the predicate to inert) — mask to valid columns
    tc = th.shape[-1]
    col = (pl.program_id(0) * tc
           + jax.lax.broadcasted_iota(jnp.int32, th.shape, th.ndim - 1))
    valid = col < m_total
    active = ((jnp.max(jnp.where(valid, hyd, 0.0)) > tt.R1)
              | (jnp.max(jnp.where(valid, ssatw, -1.0)) > tt.EPS)
              | (jnp.max(jnp.where(valid, sati, 0.0)) >= 1.25))

    # every ref is read OUTSIDE the cond (the operand blocks are DMA'd
    # by the pallas pipeline either way; branch-local ref reads are the
    # part Mosaic/interpret handle unreliably)
    f32 = jnp.float32
    G = {}
    for j, n in enumerate(mt._RACS_NAMES):
        G[n] = racs_ref[j].astype(f32)
    for j, n in enumerate(mt._RACG_NAMES):
        G[n] = racg_ref[j].astype(f32)
    for j, n in enumerate(mt._QRFZ_NAMES):
        G[n] = qrfz_ref[j].astype(f32)
    tab_vals = [(ref[:], names, ka, kb)
                for ref, (_, names, (ka, kb)) in zip(
                    (efrw_t_ref, efsw_t_ref, qcfz_t_ref, iaus_t_ref),
                    _SMALL_GROUPS)]
    dz = dz_ref[:]

    def _full(_):
        P = mt._prep_block(th, qv, qc, qi, qr, qs, qg, ni, nr,
                           exner, pres, c, params)
        # the one table index the rate logic consumes directly (large-ice
        # autoconversion branch); recomputed per tile from prep values
        idx_i = jnp.where(P["ri"] > tt.r_i[0],
                          mt._mantissa_idx(P["ri"], c.nii2, tt.NTB_I), 0)

        def small_lookup(P, c):
            S = mt._small_indices(P, c)
            out = {}
            for tab, names, ka, kb in tab_vals:
                out.update(_lookup2_tile(tab, names, S[ka], S[kb]))
            return out

        O = mt._core_block(P, idx_i, G, DT, c, params,
                           small_lookup=small_lookup)
        # sedimentation + instant melt/freeze + final update run here
        # too: the four data-dependent fall loops stay entirely in VMEM
        # instead of streaming their loop carries through HBM
        outs = mt._post_block(P, O, dz, DT, c, params)
        return tuple(outs[:9]), tuple(outs[9:13])

    def _inert(_):
        # exactly what the full pipeline produces on an inert tile:
        # sub-R1 hydrometeors zeroed (every cell is, by the predicate),
        # qv floored at 1e-7 (mp_gt_driver, :1005-1020), th untouched
        # (the full path's th*exner/exner round-trip is a 1-ulp identity)
        z = jnp.zeros_like(th)
        zp = jnp.zeros_like(th[:1])
        return ((th, jnp.maximum(qv, 1e-7), z, z, z, z, z, z, z),
                (zp, zp, zp, zp))

    outs9, ppt4 = jax.lax.cond(active, _full, _inert, None)
    for j, si in enumerate(smap):
        out_ref[si] = outs9[j]
    for j in range(4):
        ppt_ref[j:j + 1] = ppt4[j]


# scheme-order field names; smap[i] = stack row of _FIELD_ORDER[i]
_FIELD_ORDER = ("th", "qv", "qc", "qi", "qr", "qs", "qg", "ni", "nr")


def thompson_core_call(qstack, smap, exner, p, dz,
                       stacks, dt, params_key, interpret=False,
                       tc: int = 128):
    """Invoke the fused core+post kernel on the advected-species stack
    ``qstack`` (9, nz, ny, nx); ``smap`` is the static tuple mapping the
    scheme's (th, qv, qc, qi, qr, qs, qg, ni, nr) order to stack rows.
    ``stacks`` holds the stacked big-gather outputs {racs: (12, ...),
    racg: (5, ...), qrfz: (4, ...)}. Returns (out_stack (9, nz, ny, nx)
    in STACK order, ppt_rain, ppt_ice, ppt_snow, ppt_graupel)."""
    S, nz, ny, nx = qstack.shape
    assert S == 9 and sorted(smap) == list(range(9))
    M = ny * nx
    flat = lambda a: a.reshape(a.shape[:-2] + (M,))
    qflat = flat(qstack)
    prim = [flat(a) for a in (exner, p, dz)]
    racs = flat(stacks["racs"])
    racg = flat(stacks["racg"])
    qrfz = flat(stacks["qrfz"])
    tabs = [jnp.asarray(t) for t in _small_table_stacks(params_key)]
    scal = jnp.asarray(dt, jnp.float32).reshape(1)

    spec = pl.BlockSpec((nz, tc), lambda i: (0, i),
                        memory_space=pltpu.VMEM)

    def gspec(g):
        return pl.BlockSpec((g, nz, tc), lambda i: (0, 0, i),
                            memory_space=pltpu.VMEM)

    def tspec(t):
        return pl.BlockSpec(t.shape, lambda i: (0, 0, 0),
                            memory_space=pltpu.VMEM)

    kernel = functools.partial(_core_kernel, params_key=params_key,
                               smap=tuple(smap), m_total=M)
    # tc=128 measured ~24 ms/substep FASTER than tc=256 at 500^2 on real
    # post-spinup state (38 vs 62 ms incl. gathers): (nz, 128) tiles are
    # single-vreg-wide, and finer tiles both schedule better and skip
    # more often (the inert-tile predicate is a max over the tile).
    # the body holds a few hundred live (nz, tc) temporaries; the default
    # 16 MB scoped-VMEM budget is too small (the core alone measured
    # 35.4 MB at tc=256) — raise it (v5e has 128 MB of VMEM; leaving
    # headroom for the double-buffered operand blocks)
    params = {}
    if not interpret:
        params["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024)
    out, ppt = pl.pallas_call(
        kernel,
        grid=(pl.cdiv(M, tc),),
        interpret=interpret,
        **params,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [gspec(9)] + [spec] * 3
        + [gspec(racs.shape[0]), gspec(racg.shape[0]),
           gspec(qrfz.shape[0])]
        + [tspec(t) for t in tabs],
        out_specs=[gspec(9),
                   pl.BlockSpec((4, tc), lambda i: (0, i),
                                memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct((9, nz, M), qstack.dtype),
                   jax.ShapeDtypeStruct((4, M), qstack.dtype)],
    )(scal, qflat, *prim, racs, racg, qrfz, *tabs)
    return (out.reshape(S, nz, ny, nx),) \
        + tuple(ppt[j].reshape(ny, nx) for j in range(4))
