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
        interpret=_INTERPRET,
    )(reshape(pressure), reshape(temperature), reshape(qv), reshape(qc))
    shape3 = (nz, ny, nx)
    return (t.reshape(shape3), qv2.reshape(shape3), qc2.reshape(shape3),
            qvs.reshape(shape3))


def saturation_adjust_available() -> bool:
    return _run_kernels()


# ---------------------------------------------------------------------------
# fused upwind advection
# ---------------------------------------------------------------------------
#
# The jnp advection materializes per-species flux intermediates in HBM; the
# kernel streams y-tiles of all species through VMEM: one read of each
# field, one write of each output. q and the y-face winds need a 1-row halo,
# which regular (non-overlapping) BlockSpecs cannot express, so those arrive
# as HBM refs and the kernel DMAs halo windows into scratch.


def _advect_kernel(ny_ref, qc_ref, qd_ref, qu_ref, vb_ref, va_ref,
                   u_ref, w_ref, dz_ref, jaco_ref, out_ref):
    i = pl.program_id(0)          # y tile; species index is grid dim 1
    TY = out_ref.shape[2]
    U = u_ref[:]                  # (nz, TY, nx-1) internal x faces
    W = w_ref[:]                  # (nz, TY, nx)
    dz = dz_ref[:]
    jaco = jaco_ref[:]
    Vb = vb_ref[:]                # face below each row
    Va = va_ref[:]                # face above each row

    ny_real = ny_ref[0]
    gidx = i * TY + jax.lax.broadcasted_iota(jnp.int32, (1, TY, 1), 1)
    interior_y = (gidx >= 1) & (gidx <= ny_real - 2)

    def flux(l, r, c):
        return ((c + jnp.abs(c)) * l + (c - jnp.abs(c)) * r) * 0.5

    qc = qc_ref[0]                # (nz, TY, nx) this species' rows
    qd = qd_ref[0]                # row below (y-1)
    qu = qu_ref[0]                # row above (y+1)
    fx = flux(qc[:, :, :-1], qc[:, :, 1:], U)
    xdiv = fx[:, :, 1:] - fx[:, :, :-1]              # cells 1..nx-2
    ydiv = flux(qc, qu, Va) - flux(qd, qc, Vb)
    fz = flux(qc[:-1], qc[1:], W[:-1])               # (nz-1, TY, nx)
    vert = jnp.concatenate(
        [fz[:1], fz[1:] - fz[:-1],
         (qc[-1:] * W[-1:]) - fz[-1:]], axis=0)
    interior = ((xdiv + ydiv[:, :, 1:-1]) / jaco[:, :, 1:-1]
                + vert[:, :, 1:-1] / (dz[:, :, 1:-1] * jaco[:, :, 1:-1]))
    zcol = jnp.zeros_like(qc[:, :, :1])
    dq = jnp.concatenate([zcol, interior, zcol], axis=2)
    dq = jnp.where(interior_y, dq, 0.0)
    out_ref[0] = qc - dq


def advect_upwind_tpu(stacked_q, U_m, V_m, W_m, dz, jaco, ty: int = 8):
    """Fused multi-species donor-cell update (same math as
    ops.advection.advect3d_upwind, advect.f90:107-178) as one Pallas pass.

    The y-stencil neighbors arrive as pre-shifted copies of q (and of the
    y-face winds) so every kernel input uses plain non-overlapping
    BlockSpecs — XLA pays one cheap shift copy instead of the kernel doing
    halo DMA, which Mosaic's alignment rules make fragile.

    stacked_q: (S, nz, ny, nx); U_m (nz, ny, nx-1); V_m (nz, ny-1, nx);
    W_m/dz/jaco (nz, ny, nx). Density advection not supported (rho=1)."""
    S, nz, ny, nx = stacked_q.shape
    ny_pad = pl.cdiv(ny, ty) * ty
    pad_y = ny_pad - ny

    def rowpad(a, mode="edge"):
        return jnp.pad(a, ((0, 0),) * (a.ndim - 2)
                       + ((0, pad_y), (0, 0)), mode=mode)

    qc = rowpad(stacked_q)
    qd = rowpad(jnp.concatenate([stacked_q[:, :, :1], stacked_q[:, :, :-1]],
                                axis=2))
    qu = rowpad(jnp.concatenate([stacked_q[:, :, 1:], stacked_q[:, :, -1:]],
                                axis=2))
    zrow = jnp.zeros_like(V_m[:, :1, :])
    vb = rowpad(jnp.concatenate([zrow, V_m], axis=1), mode="constant")
    va = rowpad(jnp.concatenate([V_m, zrow], axis=1), mode="constant")
    up = rowpad(U_m, mode="constant")
    wp = rowpad(W_m, mode="constant")
    dzp = rowpad(dz)
    jacop = rowpad(jaco)

    # species is the INNER grid dim: the shared wind/metric blocks keep the
    # same index across species so the pipeline does not re-fetch them
    grid = (ny_pad // ty, S)
    spec3 = lambda w: pl.BlockSpec((nz, ty, w), lambda i, s: (0, i, 0),
                                   memory_space=pltpu.VMEM)
    spec4 = pl.BlockSpec((1, nz, ty, nx), lambda i, s: (s, 0, i, 0),
                         memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _advect_kernel,
        grid=grid,
        interpret=_INTERPRET,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  spec4, spec4, spec4,
                  spec3(nx), spec3(nx), spec3(nx - 1), spec3(nx),
                  spec3(nx), spec3(nx)],
        out_specs=spec4,
        out_shape=jax.ShapeDtypeStruct((S, nz, ny_pad, nx), stacked_q.dtype),
    )(jnp.asarray([ny], jnp.int32), qc, qd, qu, vb, va, up, wp, dzp, jacop)
    return out[:, :, :ny, :]


# ---------------------------------------------------------------------------
# fused CFL-substepped sedimentation (SB04)
# ---------------------------------------------------------------------------
#
# mp_simple's explicit sedimentation (physics/mp_simple._sediment_species,
# mp_simple.f90:507-564) runs ceil(dt*v_fall/dz) upstream fall steps per
# model substep — at dt~50s and dz_0=50m that is 10-14 inner iterations,
# each a full HBM sweep over 6 fields in the jnp path (the profiled top
# cost of the whole model step). Sedimentation is purely columnar, so the
# kernel tiles the flattened horizontal dim, keeps each column batch in
# VMEM for the entire inner loop, and exits immediately for tiles with no
# precipitate (the loop is an exact identity when q == 0 everywhere).

LH_LIQUID = 3.34e5
SMALL = 1e-30
RAIN_FALL_RATE = 10.0
SNOW_FALL_RATE = 1.5


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


def _sediment_kernel(scal_ref, q_ref, qv_ref, t_ref, p_ref, rho_ref, dz_ref,
                     q_out, qv_out, t_out, precip_out, *, snow: bool):
    dt = scal_ref[0]
    evap_base = scal_ref[1]
    fall_rate = SNOW_FALL_RATE if snow else RAIN_FALL_RATE
    q0 = q_ref[:]
    qv0 = qv_ref[:]
    t0 = t_ref[:]
    p = p_ref[:]
    rho = rho_ref[:]
    dz = dz_ref[:]

    # per-column CFL count & per-substep fall distance (mp_simple.f90:511)
    cfl = jnp.ceil(jnp.max(dt / dz * fall_rate, axis=0, keepdims=True))
    fall_dist = dt * fall_rate / cfl              # (1, TX) [m]
    evap_rate = evap_base / (2.0 * cfl)
    n_tile = jnp.max(cfl).astype(jnp.int32)
    # identity when the tile holds no precipitate: every flux is *0 and
    # every phase-change mask requires q > SMALL
    n_tile = jnp.where(jnp.max(q0) > 0.0, n_tile, jnp.int32(0))

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

    precip0 = jnp.zeros_like(q0[:1])
    _, q, qv, t, precip = jax.lax.while_loop(
        lambda c: c[0] < n_tile, substep,
        (jnp.int32(0), q0, qv0, t0, precip0))
    q_out[:] = q
    qv_out[:] = qv
    t_out[:] = t
    precip_out[:] = precip


def sediment_species_tpu(q, qv, temperature, pressure, rho, dz, dt,
                         evap_rate_base, snow: bool):
    """Fused sedimentation for one species: (nz, ny, nx) fields ->
    (q, qv, t, surface_precip). Bit-exact vs the jnp path in
    physics/mp_simple._sediment_species (columns are independent and the
    kernel preserves the per-column op order and masking)."""
    nz, ny, nx = q.shape
    M = ny * nx
    TX = 512
    Mp = pl.cdiv(M, TX) * TX

    def flat(a, pad_val):
        a = a.reshape(nz, M)
        return jnp.pad(a, ((0, 0), (0, Mp - M)), constant_values=pad_val)

    scal = jnp.stack([jnp.float32(dt), jnp.float32(evap_rate_base)])
    spec = pl.BlockSpec((nz, TX), lambda i: (0, i), memory_space=pltpu.VMEM)
    spec1 = pl.BlockSpec((1, TX), lambda i: (0, i), memory_space=pltpu.VMEM)
    kern = functools.partial(_sediment_kernel, snow=snow)
    qf, qvf, tf, pr = pl.pallas_call(
        kern,
        grid=(Mp // TX,),
        interpret=_INTERPRET,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] + [spec] * 6,
        out_specs=[spec, spec, spec, spec1],
        out_shape=[jax.ShapeDtypeStruct((nz, Mp), q.dtype)] * 3
        + [jax.ShapeDtypeStruct((1, Mp), q.dtype)],
    )(scal, flat(q, 0.0), flat(qv, 0.0), flat(temperature, 300.0),
      flat(pressure, 1e5), flat(rho, 1.0), flat(dz, 1e9))
    shape3 = (nz, ny, nx)
    return (qf[:, :M].reshape(shape3), qvf[:, :M].reshape(shape3),
            tf[:, :M].reshape(shape3), pr[0, :M].reshape(ny, nx))
