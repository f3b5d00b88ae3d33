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
RD = 287.058
LH_VAPOR = 2.26e6
DLHVDT = 2400.0
HEAT_CAPACITY = 1006.0
FREEZING = 273.15
MAXERR = 1e-4
N_SAT_ITERS = 15


def tpu_backend() -> bool:
    plat = jax.default_backend()
    return plat in ("tpu", "axon")


# When True, kernels run through the Pallas interpreter (pure XLA ops) so
# the CPU test suite exercises the exact kernel bodies and asserts their
# equivalence with the jnp reference paths (tests/test_pallas.py).
_INTERPRET = False


def force_interpret(enable: bool) -> bool:
    """Enable/disable interpret-mode dispatch (tests only). Returns the
    previous value so callers can restore it."""
    global _INTERPRET
    prev = _INTERPRET
    _INTERPRET = bool(enable)
    return prev


def _run_kernels() -> bool:
    return _HAS_PALLAS and (tpu_backend() or _INTERPRET)


def _sat_mr(t, p):
    a = jnp.where(t < FREEZING, 21.8745584, 17.2693882)
    b = jnp.where(t < FREEZING, 7.66, 35.86)
    e_s = 610.78 * jnp.exp(a * (t - 273.16) / (t - b))
    e_s = jnp.where(p - e_s <= 0, p * 0.99999, e_s)
    return 0.6219907 * e_s / (p - e_s)


def _sat_adjust_inline(p, t0, qv0, qc0):
    """The saturation-adjustment convergence loop (cloud_conversion,
    mp_simple.f90:198-280) on in-VMEM values; shared by the fused
    microphysics kernel. Returns (t, qv, qc, qvsat)."""
    vapor2temp = (LH_VAPOR + (373.15 - t0) * DLHVDT) / HEAT_CAPACITY

    def cond(carry):
        t, qv, qc, qvsat, lastqv, pact, it = carry
        return (it < N_SAT_ITERS) & jnp.any(jnp.abs(lastqv - qv) > MAXERR)

    def body(carry):
        t, qv, qc, qvsat, lastqv, pact, it = carry
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
        # carried as f32: Mosaic cannot yield a bool-vector loop carry
        return t, qv, qc, qvsat, lastqv, active.astype(t.dtype), it + 1

    init = (t0, qv0, qc0, jnp.zeros_like(qv0), qv0 + 2 * MAXERR,
            jnp.ones_like(qv0), jnp.int32(0))
    t, qv, qc, qvsat, lastqv, pact, it = jax.lax.while_loop(cond, body,
                                                            init)

    # the diverging-iteration revert (mp_simple.f90:264-276): a cell
    # fails iff it was still active DURING the final (15th) iteration —
    # inactivity is permanent, so the last body's active mask (a cheap
    # mask carry, replacing the int32 per-cell counter) plus the shared
    # iteration count decide it exactly
    failed = (pact > 0) & (it >= N_SAT_ITERS)
    t = jnp.where(failed, t0, t)
    qv = jnp.where(failed, _sat_mr(t0, p), qv)
    qc = jnp.where(failed, qc0, qc)
    return t, qv, jnp.maximum(qc, 0.0), qvsat


def kernels_available() -> bool:
    return _run_kernels()


# back-compat name used by earlier call sites
saturation_adjust_available = kernels_available


# ---------------------------------------------------------------------------
# fused upwind advection
# ---------------------------------------------------------------------------
#
# The jnp advection materializes per-species flux intermediates in HBM; the
# kernel streams y-tiles of all species through VMEM: one read of each
# field, one write of each output. q and the y-face winds need a 1-row halo,
# which regular (non-overlapping) BlockSpecs cannot express, so those arrive
# as HBM refs and the kernel DMAs halo windows into scratch.
#
# The species stack lives in the kernels' PADDED layout (S, nz, R, P) with
# R = ty + ny_pad + ty (a ty-row ghost band in front keeps every DMA window
# and output block 8-row aligned) and P = 128-aligned nx. The fast interval
# path (core/step.py) carries this layout across the whole while loop —
# ghost/pad cells hold arbitrary finite garbage that every kernel masks —
# so no per-substep pad/slice/restack traffic exists. padded_geometry() is
# the single source of truth for the layout.


def padded_geometry(ny: int, nx: int, ty: int = 16, gx: int = 0):
    """(ny_pad, P, R, FRONT) for the padded stack layout. Data rows live at
    padded rows [FRONT, FRONT+ny); data cols at [gx, gx+nx). ``gx`` > 0
    reserves ghost LANES on both sides of the data columns (per-shard
    x-halo for x-decomposed meshes; the single-device layout uses 0)."""
    ny_pad = pl.cdiv(ny, ty) * ty
    P = pl.cdiv(nx + 2 * gx, 128) * 128
    return ny_pad, P, ny_pad + 2 * ty, ty


def pad_to_stack_layout(a, ny: int, nx: int, ty: int = 16, mode="edge",
                        gx: int = 0):
    """Pad the trailing (ny, nx) dims of ``a`` into the (R, P) frame."""
    ny_pad, P, R, front = padded_geometry(ny, nx, ty, gx)
    return jnp.pad(a, ((0, 0),) * (a.ndim - 2)
                   + ((front, R - front - ny), (gx, P - nx - gx)),
                   mode=mode)


def _advect_kernel(dims_ref, scal_ref, floor_ref, qpad_ref, vpad_ref,
                   u_ref, w_ref, dz_ref, jaco_ref, out_ref,
                   qwin, vwin, sems):
    i = pl.program_id(0)          # y tile; species index is grid dim 1
    s = pl.program_id(1)
    TY = out_ref.shape[2]

    # the y stencil needs a 1-row halo, which non-overlapping BlockSpecs
    # cannot express: DMA a (TY+16)-row window of this species (and, once
    # per tile, of the y-face winds) from HBM into scratch. Mosaic requires
    # DMA slice offsets AND sizes 8-aligned in the sublane dim: with the
    # TY-row front ghost band, the window for data rows [i*TY, (i+1)*TY)
    # starts at padded row (i+1)*TY - 8 (8-aligned for TY % 8 == 0), and
    # data row i*TY + l sits at window row l + 8 regardless of i.
    # the start row (i+1)*TY - 8 is a multiple of 8 for TY % 8 == 0, but
    # Mosaic's divisibility prover cannot show it — assert it
    row0 = pl.multiple_of((i + 1) * TY - 8, 8)
    qdma = pltpu.make_async_copy(
        qpad_ref.at[s, :, pl.ds(row0, TY + 16), :], qwin,
        sems.at[0])
    qdma.start()

    @pl.when(s == 0)
    def _():
        # V window depends only on the tile, and species is the inner grid
        # dim: fetch once per tile, reuse from scratch for the rest
        vdma = pltpu.make_async_copy(
            vpad_ref.at[:, pl.ds(row0, TY + 16), :], vwin,
            sems.at[1])
        vdma.start()
        vdma.wait()
    qdma.wait()

    # winds are stored UNSCALED (u*jaco/dx form, loop-invariant); the
    # per-substep dt scaling happens here, in VMEM, instead of
    # materializing three scaled wind fields in HBM every substep
    dt = scal_ref[0]
    near_end = scal_ref[1]
    U = u_ref[:] * dt             # (nz, TY, P-1) internal x faces
    W = w_ref[:] * dt             # (nz, TY, P)
    dz = dz_ref[:]
    jaco = jaco_ref[:]

    ny_real = dims_ref[0]
    nx_real = dims_ref[1]
    # dims_ref[2] = this shard's global row offset (0 unsharded): the
    # interior masks are GLOBAL-domain masks, so rows at a shard
    # boundary update like interior rows (their halo row arrives by
    # ppermute each substep, core/step.py fast_step_sharded)
    gidx = (dims_ref[2] + i * TY
            + jax.lax.broadcasted_iota(jnp.int32, (1, TY, 1), 1))
    interior_y = (gidx >= 1) & (gidx <= ny_real - 2)
    # x runs over the 128-aligned padded width; mask the boundary columns
    # AND the pad lanes. dims_ref[3]/[4] = this shard's global column
    # offset and the ghost-lane origin gx (both 0 unsharded): global col
    # of lane l is col_off + l - gx, so columns at an x-shard boundary
    # update like interior columns (their halo lane arrives by ppermute
    # each substep, core/step.py fast_step_sharded)
    P = out_ref.shape[3]
    xidx = (dims_ref[3] - dims_ref[4]
            + jax.lax.broadcasted_iota(jnp.int32, (1, 1, P), 2))
    interior_x = (xidx >= 1) & (xidx <= nx_real - 2)

    def flux(l, r, c):
        return ((c + jnp.abs(c)) * l + (c - jnp.abs(c)) * r) * 0.5

    # window row l+8 = data row i*TY + l (see DMA comment above)
    qd = qwin[:, 7:TY + 7]        # row below (y-1)
    qc = qwin[:, 8:TY + 8]        # this tile's rows
    qu = qwin[:, 9:TY + 9]        # row above (y+1)
    # vpad row r = face r-FRONT; data row g needs faces g-1 and g
    Vb = vwin[:, 7:TY + 7] * dt   # face below each row
    Va = vwin[:, 8:TY + 8] * dt   # face above each row
    fx = flux(qc[:, :, :-1], qc[:, :, 1:], U)
    xdiv = fx[:, :, 1:] - fx[:, :, :-1]              # cells 1..P-2
    ydiv = flux(qc, qu, Va) - flux(qd, qc, Vb)
    fz = flux(qc[:-1], qc[1:], W[:-1])               # (nz-1, TY, P)
    vert = jnp.concatenate(
        [fz[:1], fz[1:] - fz[:-1],
         (qc[-1:] * W[-1:]) - fz[-1:]], axis=0)
    interior = ((xdiv + ydiv[:, :, 1:-1]) / jaco[:, :, 1:-1]
                + vert[:, :, 1:-1] / (dz[:, :, 1:-1] * jaco[:, :, 1:-1]))
    zcol = jnp.zeros_like(qc[:, :, :1])
    dq = jnp.concatenate([zcol, interior, zcol], axis=2)
    dq = jnp.where(interior_y & interior_x, dq, 0.0)
    # enforce_limits folded in: near the interval end, clamp this species
    # to its floor (time_step.f90:537-539 + domain_obj.f90:2228). With
    # near_end=0 the clamp is max(x, -inf) == x.
    floor = jnp.where(near_end > 0, floor_ref[s], -jnp.inf)
    out_ref[0] = jnp.maximum(qc - dq, floor)


def _advect_call(qpad, vpad, up, wp, dzp, jacop, dt, floors, near_end,
                 ny, nx, ty, row_off=0, col_off=0, gx=0):
    """Invoke the advect kernel on padded-layout operands; returns the
    padded-layout result (ghost blocks unwritten/garbage by design).
    ``row_off``/``col_off``: global row/col of this operand's first data
    row/lane (nonzero for per-shard execution under shard_map); ``gx`` =
    ghost-lane origin of the data columns (padded_geometry)."""
    S, nz, R, P = qpad.shape
    ny_pad = R - 2 * ty
    if floors is None:
        floors = jnp.full((S,), -jnp.inf, jnp.float32)
    if near_end is None:
        near_end = jnp.float32(0.0)
    scal = jnp.stack([jnp.asarray(dt, jnp.float32),
                      jnp.asarray(near_end, jnp.float32)])

    # species is the INNER grid dim: the shared wind/metric blocks keep the
    # same index across species so the pipeline does not re-fetch them
    grid = (ny_pad // ty, S)
    spec3 = lambda w: pl.BlockSpec((nz, ty, w), lambda i, s: (0, i, 0),
                                   memory_space=pltpu.VMEM)
    spec4 = pl.BlockSpec((1, nz, ty, P), lambda i, s: (s, 0, i + 1, 0),
                         memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _advect_kernel,
        grid=grid,
        interpret=_INTERPRET,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] * 3
        + [pl.BlockSpec(memory_space=pltpu.ANY),
           pl.BlockSpec(memory_space=pltpu.ANY),
           spec3(P - 1), spec3(P), spec3(P), spec3(P)],
        out_specs=spec4,
        out_shape=jax.ShapeDtypeStruct((S, nz, R, P), qpad.dtype),
        scratch_shapes=[pltpu.VMEM((nz, ty + 16, P), qpad.dtype),
                        pltpu.VMEM((nz, ty + 16, P), qpad.dtype),
                        pltpu.SemaphoreType.DMA((2,))],
    )(jnp.stack([jnp.asarray(ny, jnp.int32), jnp.asarray(nx, jnp.int32),
                 jnp.asarray(row_off, jnp.int32),
                 jnp.asarray(col_off, jnp.int32),
                 jnp.asarray(gx, jnp.int32)]),
      scal, jnp.asarray(floors), qpad, vpad, up, wp, dzp, jacop)


def prepare_advect_winds(u, v, w, dx, jaco_u, jaco_v, jaco_w, dz, jaco,
                         ny: int, nx: int, ty: int = 16):
    """Loop-invariant padded-layout operands for the advect kernel:
    unscaled metric winds (the kernel multiplies by dt in VMEM) plus the
    dz/jacobian metrics (setup_module_winds, advect.f90:306-351, minus the
    dt factor)."""
    ny_pad, P, R, front = padded_geometry(ny, nx, ty)

    def rowpad(a, mode="edge", w=None):
        px = (w if w is not None else P) - a.shape[-1]
        return jnp.pad(a, ((0, 0),) * (a.ndim - 2)
                       + ((0, ny_pad - a.shape[-2]), (0, px)), mode=mode)

    # V faces in the ghost frame: padded row r = face r-front (zero ghosts;
    # the fluxes they produce touch only masked boundary rows)
    VJ = v[:, 1:-1, :] * jaco_v[:, 1:-1, :] * (1.0 / dx)
    vpad = jnp.pad(VJ, ((0, 0), (front, R - front - (ny - 1)), (0, P - nx)),
                   mode="constant")
    up = rowpad(u[:, :, 1:-1] * jaco_u[:, :, 1:-1] * (1.0 / dx),
                mode="constant", w=P - 1)
    wp = rowpad(w * jaco_w, mode="constant")
    # dz/jaco pad with edge values so the masked pad lanes never divide
    # by zero
    dzp = rowpad(dz)
    jacop = rowpad(jaco)
    return vpad, up, wp, dzp, jacop


def prepare_advect_winds_shard(u_b, u_next, v_b, v_next, w_b, dx,
                               jaco_u_b, ju_next, jaco_v_b, jv_next,
                               jaco_w_b, dz_b, jaco_b, row_off, col_off,
                               ny: int, nx: int, ty: int = 16,
                               gx: int = 1):
    """Per-shard advect-kernel wind/metric operands for the shard_map
    fast path (core/step.py fast_step_sharded), generalized to 2D
    (y AND x decomposed) meshes. Blocks are this shard's (rows, cols)
    of the padded global frame; ``v_next``/``jv_next`` are the NEXT
    y-shard's first v/jacobian_v rows and ``u_next``/``ju_next`` the
    NEXT x-shard's first u/jacobian_u columns (one ppermute each per
    interval — the staggered faces between shards, exchange_u/v
    semantics of exchangeable_obj.f90:164-232). ``row_off``/``col_off``
    are the shard's global first row/col (traced); data lanes sit at
    [gx, gx+nx_l) of the P-lane frame (the ghost lanes carry the
    per-substep x halos). Semantics are identical to
    prepare_advect_winds evaluated on the global arrays and sliced to
    this shard: ghost/out-of-domain faces, rows and lanes are zeroed by
    GLOBAL-index masks."""
    nz, ny_l, nx_l = w_b.shape
    ny_pad, P, R, front = padded_geometry(ny_l, nx_l, ty, gx)
    grow = row_off + jnp.arange(ny_l)
    rmask = (grow < ny)[None, :, None]
    gcol = col_off + jnp.arange(nx_l)
    cmask = (gcol < nx)[None, None, :]

    def place(a, lane0, w, mode="constant"):
        """Rows padded to ny_pad; lanes placed at [lane0, lane0+width)."""
        return jnp.pad(a, ((0, 0), (0, ny_pad - a.shape[1]),
                           (lane0, w - a.shape[2] - lane0)), mode=mode)

    # internal x faces: kernel face lane j sits between data lanes j and
    # j+1 = global face col_off + j + 1 - gx; with gx=1 that is
    # u_cat[:, :, j] (u_cat col c = global u face col_off + c)
    u_cat = jnp.concatenate([u_b, u_next], axis=2)[:, :, :nx_l + 1]
    ju_cat = jnp.concatenate([jaco_u_b, ju_next], axis=2)[:, :, :nx_l + 1]
    gface_x = col_off + jnp.arange(nx_l + 1) + 1 - gx
    fxmask = ((gface_x >= 1) & (gface_x <= nx - 1))[None, None, :]
    U = jnp.where(fxmask & rmask, u_cat * ju_cat * (1.0 / dx), 0.0)
    up = place(U, 0, P - 1)
    wp = place(jnp.where(rmask & cmask, w_b * jaco_w_b, 0.0), gx, P)
    # dz/jaco edge-pad so masked ghost/pad lanes never divide by zero
    dzp = place(dz_b, gx, P, mode="edge")
    jacop = place(jaco_b, gx, P, mode="edge")

    # internal y faces: face j of this shard = global face row_off + j =
    # v[row_off + j] (between global rows row_off+j-1 and row_off+j);
    # the kernel reads vpad[front + g] as the face ABOVE data row g,
    # i.e. global face row_off+g+1 -> place faces at rows front-1..
    faces = jnp.concatenate([v_b, v_next], axis=1)
    jfaces = jnp.concatenate([jaco_v_b, jv_next], axis=1)
    gface = row_off + jnp.arange(ny_l + 1)
    fmask = ((gface >= 1) & (gface <= ny - 1))[None, :, None]
    VJ = jnp.where(fmask & cmask, faces * jfaces * (1.0 / dx), 0.0)
    vpad = jnp.zeros((nz, R, P), v_b.dtype)
    vpad = jax.lax.dynamic_update_slice(
        vpad, jnp.pad(VJ, ((0, 0), (0, 0), (gx, P - nx_l - gx))),
        (0, front - 1, 0))
    return vpad, up, wp, dzp, jacop


def advect_upwind_padded(qpad, winds_padded, dt, floors, near_end,
                         ny: int, nx: int, ty: int = 16, row_off=0,
                         col_off=0, gx=0):
    """Fast-path advection: stack already in padded layout; output stays in
    padded layout (carried across the interval loop by core/step.py)."""
    vpad, up, wp, dzp, jacop = winds_padded
    return _advect_call(qpad, vpad, up, wp, dzp, jacop, dt, floors,
                        near_end, ny, nx, ty, row_off=row_off,
                        col_off=col_off, gx=gx)


def advect_upwind_tpu(stacked_q, u, v, w, dx, jaco_u, jaco_v, jaco_w,
                      dz, jaco, dt, floors=None, near_end=None,
                      ty: int = 16):
    """Fused multi-species donor-cell update (same math as
    ops.advection.advect3d_upwind, advect.f90:107-178) as one Pallas pass,
    for a natural-shape (S, nz, ny, nx) stack. The pad into the kernel
    layout fuses with the stack build (one copy); winds arrive raw and are
    metric-scaled here (loop-invariant, hoisted by XLA) with the dt factor
    applied inside the kernel. Density advection not supported (rho=1)."""
    S, nz, ny, nx = stacked_q.shape
    # constant pad: the kernel masks ghost/pad cells (interior masks +
    # zero ghost winds); edge mode lowers to a pad+concat+DUS chain
    qpad = pad_to_stack_layout(stacked_q, ny, nx, ty, mode="constant")
    winds = prepare_advect_winds(u, v, w, dx, jaco_u, jaco_v, jaco_w,
                                 dz, jaco, ny, nx, ty)
    out = _advect_call(qpad, *winds, dt, floors, near_end, ny, nx, ty)
    front = ty
    return out[:, :, front:front + ny, :nx]


# ---------------------------------------------------------------------------
# fully-fused SB04 simple microphysics
# ---------------------------------------------------------------------------
#
# The whole scheme — saturation adjustment (a 15-sweep convergence loop),
# the cloud->rain/snow conversions, and the two CFL-substepped explicit
# sedimentation loops (10-14 inner iterations each at dt~50 s) — is
# column-local, so ONE kernel runs it end to end with each column batch
# resident in VMEM: 11 field reads and 7 writes per model substep, where
# the unfused formulation paid ~30 full-field HBM passes. Tiles with no
# precipitate exit the fall loops immediately (exact identity), which
# subsumes the jnp path's global "any rain?" lax.cond gates.

LH_LIQUID = 3.34e5
SMALL = 1e-30
RAIN_FALL_RATE = 10.0
SNOW_FALL_RATE = 1.5
SNOW_CLOUD_INIT = 1e-4
RAIN_CLOUD_INIT = 1e-4


def _phase_change(temperature, q1, qmax, q2, lheat, change_rate):
    # physics/mp_simple.phase_change (mp_simple.f90:333-362), same op order
    delta = (qmax - q2) * change_rate
    delta = jnp.minimum(delta, q1)
    delta = jnp.minimum(delta, (qmax - q2) * 0.99)
    delta = jnp.maximum(delta, 0.0)
    q1n = jnp.maximum(q1 - delta, 0.0)
    q2n = q2 + delta
    tn = temperature + delta * (lheat / HEAT_CAPACITY)
    return tn, q1n, q2n


def _cloud2hydrometeor(qc, q, conversion, qcmin):
    # physics/mp_simple.cloud2hydrometeor (mp_simple.f90:295-315)
    delta = jnp.where(qc > qcmin, qc - qc * conversion, 0.0)
    transfer = jnp.minimum(delta, qc)
    return jnp.maximum(qc - transfer, 0.0), q + transfer


def _sediment_inline(q, qv, t, p, rho, dz, dt, fall_rate, evap_base,
                     snow: bool):
    """CFL-substepped upstream fall + inter-substep evaporation on in-VMEM
    values (physics/mp_simple._sediment_species, mp_simple.f90:507-564).
    Returns (q, qv, t, surface_precip)."""
    # per-column CFL count & per-substep fall distance (mp_simple.f90:511)
    cfl = jnp.ceil(jnp.max(dt / dz * fall_rate, axis=0, keepdims=True))
    fall_dist = dt * fall_rate / cfl              # (1, TX) [m]
    evap_rate = evap_base / (2.0 * cfl)
    n_tile = jnp.max(cfl).astype(jnp.int32)
    # identity when the tile holds no precipitate: every flux is *0 and
    # every phase-change mask requires q > SMALL
    n_tile = jnp.where(jnp.max(q) > 0.0, n_tile, jnp.int32(0))

    def l_heat(t):
        le = -(LH_VAPOR + (373.15 - t) * DLHVDT)
        return (le - LH_LIQUID) if snow else le

    def substep(carry):
        s, q, qv, t, precip = carry
        active = s < cfl                          # (1, TX)
        # one upstream fall step (_sediment_substep, mp_simple.f90:437-459)
        sed = fall_dist * q[:1] * rho[:1]         # surface outflow (1, TX)
        flux = fall_dist * q[1:] * rho[1:]        # into layer k from k+1
        zeros = jnp.zeros_like(q[:1])
        gain = jnp.concatenate([flux, zeros], axis=0)
        loss = jnp.concatenate([zeros, flux], axis=0)
        base = q + (gain - loss) / (rho * dz)
        row0 = base[:1] + (-sed / (dz[:1] * rho[:1]))
        q_new = jnp.concatenate([row0, base[1:]], axis=0)
        q = jnp.where(active, q_new, q)
        precip = precip + jnp.where(active, sed, 0.0)
        # evaporate/sublimate fallen precip in subsaturated layers
        qvsat = _sat_mr(t, p)
        l_evap = l_heat(t)
        m = active & (qv < qvsat) & (q > SMALL)
        t_e, q_e, qv_e = _phase_change(t, q, qvsat, qv, l_evap, evap_rate)
        t = jnp.where(m, t_e, t)
        q = jnp.where(m, q_e, q)
        qv = jnp.where(m, qv_e, qv)
        return s + 1, q, qv, t, precip

    precip0 = jnp.zeros_like(q[:1])
    _, q, qv, t, precip = jax.lax.while_loop(
        lambda c: c[0] < n_tile, substep,
        (jnp.int32(0), q, qv, t, precip0))
    return q, qv, t, precip


def _mp_tile(dt, cloud2rain, cloud2snow, valid, p, exner, th, rho, dz,
             qv, qc, qr, qs):
    """The full SB04 column update on one in-VMEM tile. ``valid`` masks
    lanes holding garbage (flattened tail / ghost+pad cells of the padded
    stack layout): loads are replaced by neutral values there so the
    cross-lane reductions in the fall loops (max CFL count, any-
    precipitate gate) and NaN propagation cannot be polluted. Returns
    (t, qv, qc, qr, qs, sed_rain, sed_snow) with t the REAL temperature."""

    def ld(v, neutral):
        return jnp.where(valid, v, neutral)

    p = ld(p, 1e5)
    exner = ld(exner, 1.0)
    t = ld(th, 300.0) * exner
    if rho is None:
        # the fast path's only per-substep diagnostic, computed here in
        # VMEM with the exact op sequence of core/diagnostics
        # (density = p / (Rd * (theta*exner))) instead of a separate
        # whole-field HBM pass
        rho = p / (RD * t)
    else:
        rho = ld(rho, 1.0)
    dz = ld(dz, 1e9)
    qv = ld(qv, 0.0)
    qc = ld(qc, 0.0)
    qr = ld(qr, 0.0)
    qs = ld(qs, 0.0)

    # latent heats from the PRE-adjustment temperature
    # (mp_conversions, mp_simple.f90:381-390)
    l_melt = -LH_LIQUID
    l_evap = -(LH_VAPOR + (373.15 - t) * DLHVDT)
    l_subl = l_melt + l_evap

    # --- saturation adjustment (cloud_conversion, mp_simple.f90:198-280)
    t, qv, qc, qvsat = _sat_adjust_inline(p, t, qv, qc)

    # --- conversions (mp_conversions, mp_simple.f90:381-420); identical
    # op order and masking to physics/mp_simple.mp_conversions
    any_species = (qc + qr + qs) > SMALL
    qc_big = qc > SMALL
    warm = t > FREEZING

    m = any_species & qc_big & warm
    qc_r, qr_r = _cloud2hydrometeor(qc, qr, cloud2rain, RAIN_CLOUD_INIT)
    qc = jnp.where(m, qc_r, qc)
    qr = jnp.where(m, qr_r, qr)
    mm = m & (qs > SMALL)
    t_m, qs_m, qr_m = _phase_change(t, qs, 100.0, qr, l_melt, cloud2rain)
    t = jnp.where(mm, t_m, t)
    qs = jnp.where(mm, qs_m, qs)
    qr = jnp.where(mm, qr_m, qr)

    mc = any_species & qc_big & ~warm
    qc_s, qs_s = _cloud2hydrometeor(qc, qs, cloud2snow, SNOW_CLOUD_INIT)
    qc = jnp.where(mc, qc_s, qc)
    qs = jnp.where(mc, qs_s, qs)

    unsat = any_species & (qv < qvsat)
    mr = unsat & (qr > SMALL)
    t_e, qr_e, qv_e = _phase_change(t, qr, qvsat, qv, l_evap, cloud2rain / 2)
    t = jnp.where(mr, t_e, t)
    qr = jnp.where(mr, qr_e, qr)
    qv = jnp.where(mr, qv_e, qv)
    ms = unsat & (qs > SMALL)
    t_s, qs_e, qv_s = _phase_change(t, qs, qvsat, qv, l_subl, cloud2snow / 2)
    t = jnp.where(ms, t_s, t)
    qs = jnp.where(ms, qs_e, qs)
    qv = jnp.where(ms, qv_s, qv)

    # --- sedimentation; snowfall adds to both snow and total rain
    # (mp_simple.f90:507-549)
    qr, qv, t, sed_r = _sediment_inline(qr, qv, t, p, rho, dz, dt,
                                        RAIN_FALL_RATE, cloud2rain, False)
    qs, qv, t, sed_s = _sediment_inline(qs, qv, t, p, rho, dz, dt,
                                        SNOW_FALL_RATE, cloud2snow, True)
    return t, qv, qc, qr, qs, sed_r, sed_s


def _mp_simple_kernel(scal_ref, m_ref, p_ref, exner_ref, th_ref, rho_ref,
                      dz_ref, qv_ref, qc_ref, qr_ref, qs_ref, rain_ref,
                      snow_ref, th_out, qv_out, qc_out, qr_out, qs_out,
                      rain_out, snow_out):
    dt = scal_ref[0]
    # the grid's tail block runs past the flattened column count: mask
    # those lanes — this replaces padding the inputs outside the kernel,
    # which materialized a copy of all 11 fields (and a slice-back of all
    # 7 outputs) every call.
    TX = th_out.shape[1]
    lane = pl.program_id(0) * TX + jax.lax.broadcasted_iota(
        jnp.int32, (1, TX), 1)
    valid = lane < m_ref[0]
    exner = jnp.where(valid, exner_ref[:], 1.0)
    t, qv, qc, qr, qs, sed_r, sed_s = _mp_tile(
        dt, scal_ref[1], scal_ref[2], valid, p_ref[:], exner, th_ref[:],
        rho_ref[:], dz_ref[:], qv_ref[:], qc_ref[:], qr_ref[:], qs_ref[:])

    th_out[:] = t / exner
    qv_out[:] = qv
    qc_out[:] = qc
    qr_out[:] = qr
    qs_out[:] = qs
    rain_out[:] = jnp.where(valid, rain_ref[:], 0.0) + sed_r + sed_s
    snow_out[:] = jnp.where(valid, snow_ref[:], 0.0) + sed_s


def mp_simple_tpu(pressure, theta, exner, rho, qv, qc, qr, qs, rain, snow,
                  dt, dz, cloud2rain, cloud2snow, tx: int = 256):
    """The full SB04 scheme as one fused kernel (mp_simple_driver,
    mp_simple.f90:595-646): (nz, ny, nx) fields + (ny, nx) accumulators ->
    (theta, qv, qc, qr, qs, rain, snow). Equivalent to the jnp driver
    physics/mp_simple.mp_simple within f32 fusion tolerance
    (tests/test_pallas.py).

    Inputs are NOT padded to the tile width: the (zero-cost) reshape to
    (nz, ny*nx) feeds the kernel directly, the grid's tail block runs
    partially out of bounds, and the kernel masks those lanes itself —
    an XLA pad before a custom call materializes a full copy of every
    operand (and the slice after, of every result), which cost ~720 MB
    of pure copy traffic per substep on the 500x500x20 bench domain."""
    nz, ny, nx = pressure.shape
    M = ny * nx

    def flat(a):
        a = a.reshape(a.shape[:-2] + (M,))
        return a[None] if a.ndim == 1 else a

    scal = jnp.stack([jnp.float32(dt), jnp.float32(cloud2rain),
                      jnp.float32(cloud2snow)])
    m_arr = jnp.asarray([M], jnp.int32)
    spec = pl.BlockSpec((nz, tx), lambda i: (0, i), memory_space=pltpu.VMEM)
    spec1 = pl.BlockSpec((1, tx), lambda i: (0, i), memory_space=pltpu.VMEM)
    acc_dtype = rain.dtype
    th2, qv2, qc2, qr2, qs2, rain2, snow2 = pl.pallas_call(
        _mp_simple_kernel,
        grid=(pl.cdiv(M, tx),),
        interpret=_INTERPRET,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] * 2
        + [spec] * 9 + [spec1] * 2,
        out_specs=[spec] * 5 + [spec1] * 2,
        out_shape=[jax.ShapeDtypeStruct((nz, M), qv.dtype)] * 5
        + [jax.ShapeDtypeStruct((1, M), acc_dtype)] * 2,
    )(scal, m_arr, flat(pressure), flat(exner), flat(theta),
      flat(rho), flat(dz), flat(qv), flat(qc),
      flat(qr), flat(qs), flat(rain.astype(jnp.float32)),
      flat(snow.astype(jnp.float32)))
    shape3 = (nz, ny, nx)
    return (th2.reshape(shape3), qv2.reshape(shape3),
            qc2.reshape(shape3), qr2.reshape(shape3),
            qs2.reshape(shape3),
            rain2.reshape(ny, nx).astype(acc_dtype),
            snow2.reshape(ny, nx).astype(acc_dtype))


# ---------------------------------------------------------------------------
# SB04 on the padded species stack (the fast interval path)
# ---------------------------------------------------------------------------
#
# Identical physics to _mp_simple_kernel, but reading/writing the advected
# species directly from the padded (S, nz, R, P) stack that rides the
# interval while_loop carry: one ANY-memory operand + per-tile DMA windows,
# instead of five sliced operands — XLA materializes every slice feeding a
# custom call as an async device copy (~190 MB/substep on the 500^2 bench).
# The stack operand is aliased to the stack output, so species update
# in place.


def _mp_padded_kernel(ith, iqv, iqc, iqr, iqs,
                      scal_ref, stack_ref, p_ref, exner_ref,
                      dz_ref, rain_ref, snow_ref, mask_ref,
                      stack_out, rain_out, snow_out):
    # the stack arrives as a BLOCKED (S, nz, tr, tc) operand — Pallas
    # double-buffers the block DMA against compute (the earlier manual
    # per-species make_async_copy serialized ~10 DMA waits per tile);
    # species are static indexes into the in-VMEM block
    valid = mask_ref[:] > 0
    exner = jnp.where(valid, exner_ref[:], 1.0)
    t, qv, qc, qr, qs, sed_r, sed_s = _mp_tile(
        scal_ref[0], scal_ref[1], scal_ref[2], valid, p_ref[:], exner,
        stack_ref[ith], None, dz_ref[:], stack_ref[iqv], stack_ref[iqc],
        stack_ref[iqr], stack_ref[iqs])

    stack_out[ith] = t / exner
    stack_out[iqv] = qv
    stack_out[iqc] = qc
    stack_out[iqr] = qr
    stack_out[iqs] = qs
    rain_out[:] = jnp.where(valid, rain_ref[:], 0.0) + sed_r[0] + sed_s[0]
    snow_out[:] = jnp.where(valid, snow_ref[:], 0.0) + sed_s[0]


def stack_valid_mask(ny: int, nx: int, ty: int = 16):
    """Numpy (R, P) mask of the data cells of the padded stack layout
    (1 = real cell, 0 = ghost/pad). Trace-time constant — keep numpy."""
    import numpy as np
    ny_pad, P, R, front = padded_geometry(ny, nx, ty)
    m = np.zeros((R, P), np.float32)
    m[front:front + ny, :nx] = 1.0
    return m


def mp_simple_padded(qpad, p_pad, exner_pad, dz_pad, rain_pad,
                     snow_pad, valid_mask, dt, cloud2rain, cloud2snow,
                     species_idx, tr: int = 16, tc: int = 512):
    """SB04 on the padded stack. qpad (S, nz, R, P); p/exner/dz_pad
    (nz, R, P); rain/snow_pad (R, P) f32 interval accumulators;
    valid_mask from stack_valid_mask; species_idx = (ith, iqv, iqc, iqr,
    iqs) positions in the stack (must cover every species — SB04 updates
    all five). Density is computed in-kernel from p and theta*exner
    (the diagnostics formula). The stack input is aliased to the stack
    output (species update in place, tile-local).
    Returns (qpad, rain_pad, snow_pad)."""
    S, nz, R, P = qpad.shape
    assert sorted(species_idx) == list(range(S)), \
        "padded SB04 requires the stack to be exactly its five species"
    # widest lane tile that divides P and keeps the kernel's ~60 live
    # (nz, tr, tc) temporaries PLUS the double-buffered stack blocks
    # inside the 16 MB scoped-VMEM stack ((20, 8, 512) measured 16.13 MB
    # — 132 KB over; (20, 8, 256) comfortably fits). The tr=16/tc=128
    # default measured 0.9 ms/substep FASTER than tr=8/tc=384 at 500^2
    # on real post-spinup state (bit-identical output): 16x128 blocks
    # map exactly onto (8,128) vregs and the smaller tiles exit the
    # saturation sweep loop earlier (per-tile convergence is a max over
    # the tile's cells).
    budget = 20 * 8 * 384
    cands = [c for c in (512, 384, 256, 128)
             if c <= P and P % c == 0 and nz * tr * c <= budget]
    tc = max(cands) if cands else 128
    scal = jnp.stack([jnp.asarray(dt, jnp.float32),
                      jnp.asarray(cloud2rain, jnp.float32),
                      jnp.asarray(cloud2snow, jnp.float32)])
    spec4 = pl.BlockSpec((S, nz, tr, tc), lambda ir, ic: (0, 0, ir, ic),
                         memory_space=pltpu.VMEM)
    spec = pl.BlockSpec((nz, tr, tc), lambda ir, ic: (0, ir, ic),
                        memory_space=pltpu.VMEM)
    spec2 = pl.BlockSpec((tr, tc), lambda ir, ic: (ir, ic),
                         memory_space=pltpu.VMEM)
    kernel = functools.partial(_mp_padded_kernel, *species_idx)
    stack2, rain2, snow2 = pl.pallas_call(
        kernel,
        grid=(R // tr, P // tc),
        interpret=_INTERPRET,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  spec4, spec, spec, spec, spec2, spec2, spec2],
        out_specs=[spec4, spec2, spec2],
        out_shape=[jax.ShapeDtypeStruct((S, nz, R, P), qpad.dtype),
                   jax.ShapeDtypeStruct((R, P), jnp.float32),
                   jax.ShapeDtypeStruct((R, P), jnp.float32)],
    )(scal, qpad, p_pad, exner_pad, dz_pad, rain_pad, snow_pad,
      jnp.asarray(valid_mask))
    return stack2, rain2, snow2


# ---------------------------------------------------------------------------
# fused MPDATA advection (order-n + FCT) on the padded species stack
# ---------------------------------------------------------------------------
#
# The jnp MPDATA materializes ~30 full-stack intermediates per substep
# (upwind pass, six pseudo-velocity cross terms, three FCT limiter
# chains, corrective pass — measured ~13 GB of fusion results per
# substep at 500^2x20x9 species). This kernel runs the WHOLE scheme per
# (species, y-tile) on a VMEM window with an 8-row halo: the species
# stack is read once and written once; everything between lives in VMEM.
# The window math calls the exact batch-generic jnp functions
# (ops.advection.advect3d_upwind, ops.mpdata._pseudo_velocities /
# _fct_limit_axis) — the same single-source reuse as the Thompson kernel
# — with domain-boundary holds applied by global-index masks (edge
# replication in the ghost frame makes the window min/max truncations
# exactly equivalent to the jnp array-edge truncations).


def _mpdata_kernel(dims_ref, scal_ref, floors_ref, qpad_ref, upad_ref,
                   vpad_ref, wpad_ref, dzpad_ref, jacopad_ref, out_ref,
                   qwin, uwin, vwin, wwin, dzwin, jacowin, sems,
                   *, order: int, use_fct: bool):
    from . import advection as adv
    from . import mpdata as md

    i = pl.program_id(0)
    s = pl.program_id(1)
    TY = out_ref.shape[2]
    rows = TY + 16
    P = out_ref.shape[3]
    row0 = pl.multiple_of((i + 1) * TY - 8, 8)
    qdma = pltpu.make_async_copy(
        qpad_ref.at[s, :, pl.ds(row0, rows), :], qwin, sems.at[0])
    qdma.start()

    @pl.when(s == 0)
    def _():
        # winds/metrics depend only on the tile; species is the inner
        # grid dim, so fetch once and reuse from scratch
        for k, (ref, scr) in enumerate((
                (upad_ref, uwin), (vpad_ref, vwin), (wpad_ref, wwin),
                (dzpad_ref, dzwin), (jacopad_ref, jacowin))):
            d = pltpu.make_async_copy(
                ref.at[:, pl.ds(row0, rows), :], scr, sems.at[k + 1])
            d.start()
            d.wait()
    qdma.wait()

    dt = scal_ref[0]
    ny_real = dims_ref[0]
    nx_real = dims_ref[1]

    # dims_ref[2] = this shard's global row offset (0 unsharded): masks
    # and the edge replication below are GLOBAL-domain, so rows at a
    # shard boundary behave like interior rows (their 8-row halo window
    # holds real neighbor data, exchanged by the caller)
    gidx_w = (dims_ref[2] + i * TY - 8
              + jax.lax.broadcasted_iota(jnp.int32, (1, rows, 1), 1))
    xidx_w = jax.lax.broadcasted_iota(jnp.int32, (1, 1, P), 2)
    # the species stack arrives CONSTANT-padded (an edge-mode jnp.pad of
    # the (S, nz, ny, nx) stack lowers to a ~2.5 GB/substep pad+concat+
    # DUS chain); replicate the domain-edge values into the ghost/pad
    # cells here in VMEM instead — bit-identical window contents, which
    # the FCT min/max truncation equivalence relies on. The masked-sum
    # broadcast is exact: exactly one window row/lane matches each edge.
    q0 = qwin[:]
    e0 = jnp.sum(jnp.where(gidx_w == 0, q0, 0.0), axis=1, keepdims=True)
    e1 = jnp.sum(jnp.where(gidx_w == ny_real - 1, q0, 0.0), axis=1,
                 keepdims=True)
    q0 = jnp.where(gidx_w < 0, e0,
                   jnp.where(gidx_w > ny_real - 1, e1, q0))
    xe = jnp.sum(jnp.where(xidx_w == nx_real - 1, q0, 0.0), axis=2,
                 keepdims=True)
    q0 = jnp.where(xidx_w > nx_real - 1, xe, q0)

    U = uwin[:][..., :-1] * dt       # (nz, rows, P-1) internal x faces
    # vpad row front+g = face above data row g; window row j = padded row
    # row0+j = front + (i*TY + j - 8), so the face between window rows
    # (j, j+1) is exactly vwin[j]
    Vf = vwin[:][:, :-1, :] * dt     # (nz, rows-1, P) internal y faces
    W = wwin[:] * dt                 # (nz, rows, P) layer-top faces
    dz = dzwin[:]
    G = jacowin[:]

    gidx = gidx_w
    xidx = xidx_w
    interior = ((gidx >= 1) & (gidx <= ny_real - 2)
                & (xidx >= 1) & (xidx <= nx_real - 2))
    y_edge = ((gidx == 0) | (gidx == ny_real - 1)).astype(q0.dtype)
    x_edge = ((xidx == 0) | (xidx == nx_real - 1)).astype(q0.dtype)

    def canon(a):
        # Mosaic layout normalization: values built from lane-shifted
        # operands carry a lane-offset layout that tpu.concatenate
        # refuses on non-concat dims. A round-trip through a pair of
        # opposing sublane rolls is a bit-exact identity whose output
        # layout is canonical (offset 0); rolls accept any lane width,
        # unlike an aligned scratch store.
        n = a.shape[1]
        return pltpu.roll(pltpu.roll(a, 1, 1), n - 1, 1)

    def _advect(_):
        winds = adv.CourantWinds(U, Vf, W)
        q_prev = q0
        q_new = adv.advect3d_upwind(q0, winds, None, dz, G, False,
                                    canon=canon)
        # hold the domain boundary (the jnp path's interior-only
        # update); ghost/pad cells also revert to their (finite,
        # edge-replicated) window values
        q_new = jnp.where(interior, q_new, q0)
        Wn = W / dz
        for _i in range(order - 1):
            u2, v2, w2 = md._pseudo_velocities(q_new, U, Vf, Wn, G,
                                               canon=canon)
            u2 = u2 * 0.5
            v2 = v2 * 0.5
            w2 = w2 * 0.5 * dz
            if use_fct:
                u2 = md._fct_limit_axis(q_prev, q_new, u2, axis=-1,
                                        is_w=False, no_limit_mask=x_edge,
                                        canon=canon)
                v2 = md._fct_limit_axis(q_prev, q_new, v2, axis=-2,
                                        is_w=False, no_limit_mask=y_edge,
                                        canon=canon)
                wf = md._fct_limit_axis(q_prev, q_new, w2[:-1] / dz[:-1],
                                        axis=-3, is_w=True, canon=canon)
                w2 = jnp.concatenate([wf * dz[:-1],
                                      jnp.zeros_like(w2[:1])], axis=-3)
            corr = adv.CourantWinds(u2, v2, w2)
            q_prev = q_new
            upd = adv.advect3d_upwind(q_new, corr, None, dz, G, False,
                                      canon=canon)
            q_new = jnp.where(interior, upd, q_new)
        return q_new[:, 8:TY + 8, :]

    def _zero(_):
        return jnp.zeros_like(q0[:, 8:TY + 8, :])

    # per-(species, tile) skip: if this species is zero over the WHOLE
    # window (halo included, which covers the 3-cell stencil reach),
    # advection of it is exactly zero — hydrometeor species are zero
    # over most of a domain outside the orographic cloud plume.
    # ~(max == 0) keeps NaN windows on the full path.
    any_q = ~(jnp.max(jnp.abs(q0)) == 0.0)
    q_out = jax.lax.cond(any_q, _advect, _zero, None)

    # fused near-end enforce_limits clamp (floors[s] = -inf when the
    # species is unlimited or near_end is 0 -> exact identity)
    fl = jnp.where(scal_ref[1] > 0, floors_ref[s], -jnp.inf)
    out_ref[0] = jnp.maximum(q_out, fl)


def prepare_mpdata_operands(u, v, w, dx, jaco_u, jaco_v, jaco_w, dz,
                            jaco, ny: int, nx: int, ty: int = 16):
    """Ghost-frame (nz, R, P) metric winds + metrics for the MPDATA
    kernel (unscaled by dt; the kernel scales in VMEM). Zero winds in
    the ghost/pad frame make every boundary flux vanish exactly as the
    jnp path's array-edge truncation; dz/jacobian edge-replicate so
    divisions stay finite."""
    ny_pad, P, R, front = padded_geometry(ny, nx, ty)

    def gpad(a, mode, w_=None):
        px = (w_ if w_ is not None else P) - a.shape[-1]
        return jnp.pad(a, ((0, 0),) * (a.ndim - 2)
                       + ((front, R - front - a.shape[-2]), (0, px)),
                       mode=mode)

    # full P lanes (a 127-wide ref slice is lane-misaligned for Mosaic
    # DMA); the kernel value-slices the last face column off
    up = gpad(u[:, :, 1:-1] * jaco_u[:, :, 1:-1] * (1.0 / dx),
              "constant")
    VJ = v[:, 1:-1, :] * jaco_v[:, 1:-1, :] * (1.0 / dx)
    vp = jnp.pad(VJ, ((0, 0), (front, R - front - (ny - 1)), (0, P - nx)),
                 mode="constant")
    wp = gpad(w * jaco_w, "constant")
    dzp = gpad(dz, "edge")
    jacop = gpad(jaco, "edge")
    return up, vp, wp, dzp, jacop


def advect_mpdata_tpu(stacked_q, u, v, w, dx, jaco_u, jaco_v, jaco_w,
                      dz, jaco, dt, order: int, use_fct: bool,
                      ty: int = 16, floors=None, near_end=None):
    """Fused MPDATA of the whole species stack (same math as
    ops.mpdata.advect_mpdata with advect_density=False). The 8-row halo
    window supports order <= 3 (each corrective pass consumes 3 halo
    rows); callers fall back to the jnp path beyond that.
    ``floors``/``near_end``: fused near-end enforce_limits clamp (see
    ops.mpdata.advect_mpdata)."""
    assert order <= 3, "MPDATA kernel halo supports order <= 3"
    S, nz, ny, nx = stacked_q.shape
    ny_pad, P, R, front = padded_geometry(ny, nx, ty)
    # constant pad: one XLA pad op; the kernel replicates domain edges
    # into the ghost frame in VMEM (see _mpdata_kernel)
    qpad = pad_to_stack_layout(stacked_q, ny, nx, ty, mode="constant")
    up, vp, wp, dzp, jacop = prepare_mpdata_operands(
        u, v, w, dx, jaco_u, jaco_v, jaco_w, dz, jaco, ny, nx, ty)
    if floors is None or near_end is None:
        floors_v = jnp.full((S,), -jnp.inf, jnp.float32)
        ne = jnp.float32(0.0)
    else:
        floors_v = jnp.asarray(floors, jnp.float32)
        ne = jnp.asarray(near_end, jnp.float32)
    scal = jnp.stack([jnp.asarray(dt, jnp.float32), ne])

    grid = (ny_pad // ty, S)
    spec4 = pl.BlockSpec((1, nz, ty, P), lambda i, s: (s, 0, i + 1, 0),
                         memory_space=pltpu.VMEM)
    kernel = functools.partial(_mpdata_kernel, order=order,
                               use_fct=use_fct)
    params = {}
    if not _INTERPRET:
        params["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        interpret=_INTERPRET,
        **params,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [pl.BlockSpec(memory_space=pltpu.ANY)] * 6,
        out_specs=spec4,
        out_shape=jax.ShapeDtypeStruct((S, nz, R, P), stacked_q.dtype),
        scratch_shapes=[pltpu.VMEM((nz, ty + 16, P), stacked_q.dtype),
                        pltpu.VMEM((nz, ty + 16, P), stacked_q.dtype),
                        pltpu.VMEM((nz, ty + 16, P), stacked_q.dtype),
                        pltpu.VMEM((nz, ty + 16, P), stacked_q.dtype),
                        pltpu.VMEM((nz, ty + 16, P), stacked_q.dtype),
                        pltpu.VMEM((nz, ty + 16, P), stacked_q.dtype),
                        pltpu.SemaphoreType.DMA((6,))],
    )(jnp.asarray([ny, nx, 0], jnp.int32), scal, floors_v, qpad, up, vp,
      wp, dzp, jacop)
    return out[:, :, front:front + ny, :nx]


def prepare_mpdata_operands_shard(u_e, v_e, w_e, dz_e, jaco_e, ju_e,
                                  jv_e, jw_e, dx, row_off, ny: int,
                                  nx: int, ty: int = 16, h: int = 8):
    """Ghost-frame MPDATA operands from h-row halo-EXTENDED shard blocks
    (rows [row_off-h, row_off+ny_l+h) of the global frame; the caller
    exchanges the halos by ppermute — parallel/shard_kernels). Winds at
    out-of-domain rows are zeroed by GLOBAL-row masks (matching the
    unsharded constant ghost pads); dz/jacobian frame cells outside the
    placed band hold benign nonzero constants so no window division can
    NaN."""
    nz, nye, nxl = w_e.shape
    ny_l = nye - 2 * h
    ny_pad, P, R, front = padded_geometry(ny_l, nxl, ty)
    growE = row_off - h + jnp.arange(nye)
    rmask = ((growE >= 0) & (growE < ny))[None, :, None]
    # out-of-domain extension rows arrive as ppermute ZEROS on the edge
    # shards (no neighbor to receive from): dz/jacobian divide inside
    # the kernel's pseudo-velocity math (0/0 -> NaN within the window),
    # so hold benign nonzero values there — winds are zeroed at those
    # rows, so no result can depend on them
    dz_e = jnp.where(rmask, dz_e, 500.0)
    jaco_e = jnp.where(rmask, jaco_e, 1.0)

    def frame(vals, fill=0.0):
        """Place (nz, nye, width<=P) rows at frame rows [front-h, ...)."""
        w_ = vals.shape[2]
        buf = jnp.full((nz, R, P), jnp.asarray(fill, vals.dtype))
        vals = jnp.pad(vals, ((0, 0), (0, 0), (0, P - w_)),
                       mode="constant",
                       constant_values=(0.0 if fill == 0.0 else fill))
        return jax.lax.dynamic_update_slice(buf, vals, (0, front - h, 0))

    up = frame(jnp.where(rmask, u_e[:, :, 1:nx] * ju_e[:, :, 1:nx]
                         * (1.0 / dx), 0.0))
    wp = frame(jnp.where(rmask, w_e * jw_e, 0.0))
    dzp = frame(dz_e, fill=500.0)
    jacop = frame(jaco_e, fill=1.0)
    # y faces: vpad[front+g] = global face row_off+g+1 (internal iff
    # 1 <= face <= ny-1) = extended-v row g+1+h; the one face beyond the
    # extension (g = ny_l+h-1) lies >= h-1 rows outside the data rows —
    # beyond the kernel's stencil reach — and stays zero
    gfaceE = row_off - h + 1 + jnp.arange(nye - 1)
    fmask = ((gfaceE >= 1) & (gfaceE <= ny - 1))[None, :, None]
    VJ = jnp.where(fmask, v_e[:, 1:] * jv_e[:, 1:] * (1.0 / dx), 0.0)
    vp = frame(VJ)
    return up, vp, wp, dzp, jacop


def advect_mpdata_padded(q_e, ops, dt, order: int, use_fct: bool,
                         floors, near_end, ny: int, nx: int,
                         row_off=0, h: int = 8, ty: int = 16):
    """Invoke the MPDATA kernel on an h-row halo-extended shard block
    ``q_e`` (S, nz, ny_l+2h, nx_l) with the ghost-frame operands from
    prepare_mpdata_operands_shard. Returns the (S, nz, ny_l, nx_l)
    natural shard block."""
    assert order <= 3, "MPDATA kernel halo supports order <= 3"
    S, nz, nye, nxl = q_e.shape
    ny_l = nye - 2 * h
    ny_pad, P, R, front = padded_geometry(ny_l, nxl, ty)
    qpad = jnp.zeros((S, nz, R, P), q_e.dtype)
    qpad = jax.lax.dynamic_update_slice(
        qpad, jnp.pad(q_e, ((0, 0),) * 2 + ((0, 0), (0, P - nxl))),
        (0, 0, front - h, 0))
    up, vp, wp, dzp, jacop = ops
    scal = jnp.stack([jnp.asarray(dt, jnp.float32),
                      jnp.asarray(near_end, jnp.float32)])

    grid = (ny_pad // ty, S)
    spec4 = pl.BlockSpec((1, nz, ty, P), lambda i, s: (s, 0, i + 1, 0),
                         memory_space=pltpu.VMEM)
    kernel = functools.partial(_mpdata_kernel, order=order,
                               use_fct=use_fct)
    params = {}
    if not _INTERPRET:
        params["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        interpret=_INTERPRET,
        **params,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [pl.BlockSpec(memory_space=pltpu.ANY)] * 6,
        out_specs=spec4,
        out_shape=jax.ShapeDtypeStruct((S, nz, R, P), q_e.dtype),
        scratch_shapes=[pltpu.VMEM((nz, ty + 16, P), q_e.dtype)] * 6
        + [pltpu.SemaphoreType.DMA((6,))],
    )(jnp.stack([jnp.asarray(ny, jnp.int32), jnp.asarray(nx, jnp.int32),
                 jnp.asarray(row_off, jnp.int32)]),
      scal, jnp.asarray(floors, jnp.float32), qpad, up, vp, wp,
      dzp, jacop)
    return out[:, :, front:front + ny_l, :nxl]
