"""Per-shard Pallas kernel execution for the general sharded step.

The repo's Pallas kernels (Thompson core, fused MPDATA, fused SB04,
fused upwind advection) are single-device programs; until round 5 the
general sharded interval path fell back to the jnp reference
implementations for everything (BENCH_MATRIX_r04: conus at 64% of
unsharded fullphys on the same chip). This module runs the kernels PER
SHARD under ``shard_map``:

  * column-local physics (Thompson, SB04) needs no communication at all
    — every column is owned by exactly one shard, so the kernel runs on
    the shard's columns with benign values in the frame-pad columns
    (clear-air constants; their outputs are sliced away);
  * advection exchanges explicit ``lax.ppermute`` halos first — 1
    row/lane for the upwind plus-stencil, 8 rows for the MPDATA window
    — the exchangeable_t semantics of the reference
    (/root/reference/src/objects/exchangeable_obj.f90:138-356, halo
    width per stencil order instead of the hardcoded 1).

Inputs arrive in their natural (nz, ny, nx) shapes (the general path
slices the padded frame before physics); each wrapper pads them to the
mesh-divisible frame with benign constants, shard_maps, and slices the
result back. Equivalence with the single-device kernels is per-cell
exact (the kernels' per-cell arithmetic does not depend on tile
placement; tests/test_shard_kernels.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as PS

from .mesh import padded_sizes


def _shard_map(mesh):
    try:
        from jax import shard_map as _sm
        return functools.partial(_sm, mesh=mesh, check_vma=False)
    except ImportError:  # pragma: no cover - older jax
        from jax.experimental.shard_map import shard_map as _sme
        return functools.partial(_sme, mesh=mesh, check_rep=False)


# benign clear-air pad values: frame-pad columns run the schemes on
# plausible data (never NaN/Inf — a 0-pressure pad column would divide
# by zero inside the schemes and poison tile-level reductions)
_PAD = {"p": 1.0e5, "exner": 1.0, "th": 300.0, "dz": 500.0}


def _pad2(a, nyp, nxp, val=0.0):
    py, px = nyp - a.shape[-2], nxp - a.shape[-1]
    if py == 0 and px == 0:
        return a
    return jnp.pad(a, [(0, 0)] * (a.ndim - 2) + [(0, py), (0, px)],
                   constant_values=val)


def _crop(a, ny, nx):
    return a[..., :ny, :nx]


def thompson_stack_sharded(mesh, qstack, names, exner, p, dz, dt, rain,
                           snow, graupel, params, framed_out=False):
    """Stack-native Thompson step with the fused core kernel per shard
    (physics/mp_thompson.mp_thompson_stack semantics; column-local, so
    no halo traffic — matching the reference's column independence,
    mp_thompson.f90 per-(i,j) loops)."""
    from ..physics.mp_thompson import mp_thompson_stack

    if mesh.devices.size == 1:
        # identity decomposition: run the single-device kernel path
        # directly — no frame pad/crop tax (the conus-vs-fullphys gap
        # was mostly this ring of 180 MB-class pads per substep)
        return mp_thompson_stack(qstack, names, exner, p, dz, dt, rain,
                                 snow, graupel, params=params,
                                 use_pallas=True)

    S, nz = qstack.shape[:2]
    ny, nx = exner.shape[-2:]
    nyp, nxp = padded_sizes(nx, ny, mesh)
    # ``framed_out``: the caller carries the stack in the frame shape
    # (core/step.py frame_stack) — accept it framed and return it
    # framed, so the hot loop never pads/crops the stack
    assert qstack.shape[-2:] in ((ny, nx), (nyp, nxp))

    def body(q_b, ex_b, p_b, dz_b, r_b, s_b, g_b, dt_):
        return mp_thompson_stack(q_b, names, ex_b, p_b, dz_b, dt_, r_b,
                                 s_b, g_b, params=params, use_pallas=True)

    s4 = PS(None, None, "y", "x")
    s3 = PS(None, "y", "x")
    s2 = PS("y", "x")
    out, r2, s2_, g2 = _shard_map(mesh)(
        body,
        in_specs=(s4, s3, s3, s3, s2, s2, s2, PS()),
        out_specs=(s4, s2, s2, s2))(
        _pad2(qstack, nyp, nxp),
        _pad2(exner, nyp, nxp, _PAD["exner"]),
        _pad2(p, nyp, nxp, _PAD["p"]),
        _pad2(dz, nyp, nxp, _PAD["dz"]),
        _pad2(rain, nyp, nxp), _pad2(snow, nyp, nxp),
        _pad2(graupel, nyp, nxp), jnp.asarray(dt, jnp.float32))
    return (out if framed_out else _crop(out, ny, nx),
            _crop(r2, ny, nx), _crop(s2_, ny, nx), _crop(g2, ny, nx))


def mp_simple_sharded(mesh, pressure, theta, exner, rho, qv, qc, qr, qs,
                      rain, snow, dt, dz):
    """Fused SB04 kernel per shard (physics/mp_simple.mp_simple;
    column-local like Thompson)."""
    from ..physics.mp_simple import mp_simple

    if mesh.devices.size == 1:
        return mp_simple(pressure, theta, exner, rho, qv, qc, qr, qs,
                         rain, snow, dt, dz, use_pallas=True)

    nz, ny, nx = pressure.shape
    nyp, nxp = padded_sizes(nx, ny, mesh)

    def body2(p_b, th_b, ex_b, rho_b, qv_b, qc_b, qr_b, qs_b, r_b, s_b,
              dz_b, dt_):
        return mp_simple(p_b, th_b, ex_b, rho_b, qv_b, qc_b, qr_b, qs_b,
                         r_b, s_b, dt_, dz_b, use_pallas=True)

    s3 = PS(None, "y", "x")
    s2 = PS("y", "x")
    outs = _shard_map(mesh)(
        body2,
        in_specs=(s3,) * 8 + (s2, s2, s3, PS()),
        out_specs=(s3,) * 5 + (s2, s2))(
        _pad2(pressure, nyp, nxp, _PAD["p"]),
        _pad2(theta, nyp, nxp, _PAD["th"]),
        _pad2(exner, nyp, nxp, _PAD["exner"]),
        _pad2(rho, nyp, nxp, 1.0),
        _pad2(qv, nyp, nxp), _pad2(qc, nyp, nxp),
        _pad2(qr, nyp, nxp), _pad2(qs, nyp, nxp),
        _pad2(rain, nyp, nxp), _pad2(snow, nyp, nxp),
        _pad2(dz, nyp, nxp, _PAD["dz"]), jnp.asarray(dt, jnp.float32))
    return tuple(_crop(o, ny, nx) for o in outs)


def advect_upwind_sharded(mesh, stacked_q, u, v, w, dt, dx, jaco_u,
                          jaco_v, jaco_w, jaco, dz, floors=None,
                          near_end=None, framed=False):
    """Fused upwind advection kernel per shard with explicit 1-row/
    1-lane ppermute halos (ops/pallas_kernels._advect_kernel via the
    same per-shard operand builders as the fast path)."""
    from ..ops import pallas_kernels as pk

    if mesh.devices.size == 1:
        return pk.advect_upwind_tpu(stacked_q, u, v, w, dx, jaco_u,
                                    jaco_v, jaco_w, dz, jaco, dt,
                                    floors=floors, near_end=near_end)

    S, nz = stacked_q.shape[:2]
    ny, nx = u.shape[-2], w.shape[-1]
    nyp, nxp = padded_sizes(nx, ny, mesh)
    msh = dict(mesh.shape)
    my, mx = msh["y"], msh["x"]
    ny_l, nx_l = nyp // my, nxp // mx
    ty, gx = 16, 1
    ny_pad_l, P, R_l, front = pk.padded_geometry(ny_l, nx_l, ty, gx)
    perm_yup = [(i + 1, i) for i in range(my - 1)]
    perm_ydn = [(i, i + 1) for i in range(my - 1)]
    perm_xup = [(i + 1, i) for i in range(mx - 1)]
    perm_xdn = [(i, i + 1) for i in range(mx - 1)]
    if floors is None:
        import numpy as np
        floors = np.full((S,), -np.inf, np.float32)
    if near_end is None:
        near_end = jnp.float32(0.0)

    def body(q_b, u_b, v_b, w_b, ju_b, jv_b, jw_b, dz_b, jc_b, dt_, ne_):
        row_off = jax.lax.axis_index("y") * ny_l
        col_off = jax.lax.axis_index("x") * nx_l
        u_next = jax.lax.ppermute(u_b[:, :, :1], "x", perm_xup)
        ju_next = jax.lax.ppermute(ju_b[:, :, :1], "x", perm_xup)
        v_next = jax.lax.ppermute(v_b[:, :1], "y", perm_yup)
        jv_next = jax.lax.ppermute(jv_b[:, :1], "y", perm_yup)
        winds = pk.prepare_advect_winds_shard(
            u_b, u_next, v_b, v_next, w_b, dx, ju_b, ju_next, jv_b,
            jv_next, jw_b, dz_b, jc_b, row_off, col_off, ny, nx, ty, gx)
        qpad = pk.pad_to_stack_layout(q_b, ny_l, nx_l, ty,
                                      mode="constant", gx=gx)
        # 1-row/1-lane halos (plus-stencil: corners never read)
        gh_n = jax.lax.ppermute(q_b[:, :, -1, :], "y", perm_ydn)
        gh_s = jax.lax.ppermute(q_b[:, :, 0, :], "y", perm_yup)
        qpad = qpad.at[:, :, front - 1, gx:gx + nx_l].set(gh_n)
        qpad = qpad.at[:, :, front + ny_l, gx:gx + nx_l].set(gh_s)
        if mx > 1:
            gh_w = jax.lax.ppermute(q_b[:, :, :, -1], "x", perm_xdn)
            gh_e = jax.lax.ppermute(q_b[:, :, :, 0], "x", perm_xup)
            qpad = qpad.at[:, :, front:front + ny_l, gx - 1].set(gh_w)
            qpad = qpad.at[:, :, front:front + ny_l, gx + nx_l].set(gh_e)
        out = pk.advect_upwind_padded(
            qpad, winds, dt_, jnp.asarray(floors), ne_, ny, nx, ty,
            row_off=row_off, col_off=col_off, gx=gx)
        return out[:, :, front:front + ny_l, gx:gx + nx_l]

    s4 = PS(None, None, "y", "x")
    s3 = PS(None, "y", "x")
    out = _shard_map(mesh)(
        body, in_specs=(s4,) + (s3,) * 8 + (PS(), PS()),
        out_specs=s4)(
        _pad2(stacked_q, nyp, nxp),
        _pad2(u, nyp, nxp), _pad2(v, nyp, nxp), _pad2(w, nyp, nxp),
        _pad2(jaco_u, nyp, nxp, 1.0), _pad2(jaco_v, nyp, nxp, 1.0),
        _pad2(jaco_w, nyp, nxp, 1.0), _pad2(dz, nyp, nxp, _PAD["dz"]),
        _pad2(jaco, nyp, nxp, 1.0),
        jnp.asarray(dt, jnp.float32), jnp.asarray(near_end, jnp.float32))
    return out if framed else _crop(out, ny, nx)


def advect_mpdata_sharded(mesh, stacked_q, u, v, w, dt, dx, jaco_u,
                          jaco_v, jaco_w, jaco, dz, order, use_fct,
                          floors=None, near_end=None, framed=False):
    """Fused MPDATA window kernel per shard (y-decomposed meshes): every
    operand is halo-extended by 8 rows via ppermute — the kernel's
    window reach — so per-cell results match the single-device kernel
    exactly (MPDATA order <= 3 consumes <= 3 halo rows; the full window
    is exchanged so ghost-row q_new values inside the stencil reach are
    computed from real neighbor data)."""
    from ..ops import pallas_kernels as pk

    if mesh.devices.size == 1:
        return pk.advect_mpdata_tpu(stacked_q, u, v, w, dx, jaco_u,
                                    jaco_v, jaco_w, dz, jaco, dt,
                                    order, use_fct, floors=floors,
                                    near_end=near_end)

    S, nz = stacked_q.shape[:2]
    ny, nx = u.shape[-2], w.shape[-1]
    assert dict(mesh.shape).get("x", 1) == 1, \
        "MPDATA kernel shards along y only"
    nyp, nxp = padded_sizes(nx, ny, mesh)
    my = dict(mesh.shape)["y"]
    ny_l = nyp // my
    h = 8
    assert ny_l >= h, "MPDATA shard height must cover the 8-row window"
    perm_yup = [(i + 1, i) for i in range(my - 1)]
    perm_ydn = [(i, i + 1) for i in range(my - 1)]
    if floors is None:
        import numpy as np
        floors = np.full((S,), -np.inf, np.float32)
    if near_end is None:
        near_end = jnp.float32(0.0)

    def ext(a):
        """Halo-extend rows: [row_off-h, row_off+ny_l+h) of the frame."""
        lo = jax.lax.ppermute(a[..., -h:, :], "y", perm_ydn)
        hi = jax.lax.ppermute(a[..., :h, :], "y", perm_yup)
        return jnp.concatenate([lo, a, hi], axis=-2)

    def body(q_b, u_b, v_b, w_b, ju_b, jv_b, jw_b, dz_b, jc_b, dt_, ne_):
        row_off = jax.lax.axis_index("y") * ny_l
        q_e = ext(q_b)
        ops = pk.prepare_mpdata_operands_shard(
            ext(u_b), ext(v_b), ext(w_b), ext(dz_b), ext(jc_b),
            ext(ju_b), ext(jv_b), ext(jw_b), dx, row_off, ny, nx, h=h)
        out = pk.advect_mpdata_padded(
            q_e, ops, dt_, order, use_fct, jnp.asarray(floors), ne_,
            ny, nx, row_off=row_off, h=h)
        return out

    s4 = PS(None, None, "y", "x")
    s3 = PS(None, "y", "x")
    out = _shard_map(mesh)(
        body, in_specs=(s4,) + (s3,) * 8 + (PS(), PS()),
        out_specs=s4)(
        _pad2(stacked_q, nyp, nxp),
        _pad2(u, nyp, nxp), _pad2(v, nyp, nxp), _pad2(w, nyp, nxp),
        _pad2(jaco_u, nyp, nxp, 1.0), _pad2(jaco_v, nyp, nxp, 1.0),
        _pad2(jaco_w, nyp, nxp, 1.0), _pad2(dz, nyp, nxp, _PAD["dz"]),
        _pad2(jaco, nyp, nxp, 1.0),
        jnp.asarray(dt, jnp.float32), jnp.asarray(near_end, jnp.float32))
    return out if framed else _crop(out, ny, nx)
