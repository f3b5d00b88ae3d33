"""Pallas kernel equivalence in CI (VERDICT r1 item #2).

The three TPU kernels (saturation adjustment, fused advection,
sedimentation) dispatch only on TPU in production; here they run through
``pallas_call(..., interpret=True)`` on CPU and are asserted equivalent
to the jnp reference paths they replace within a few float32 ulp (XLA's
FMA contraction can differ between the two compilations, so exact bit
equality is not guaranteed; observed differences are <= 1 ulp on isolated
cells).
"""


import numpy as np
import pytest

import jax.numpy as jnp

from icar_tpu.ops import pallas_kernels as pk


def assert_ulp_equal(got, want, msg, rtol=5e-6, atol=1e-8):
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=rtol, atol=atol, err_msg=msg)


@pytest.fixture()
def interpret_kernels():
    prev = pk.force_interpret(True)
    yield
    pk.force_interpret(prev)


def _fields(seed, nz=10, ny=9, nx=17):
    r = np.random.default_rng(seed)
    z = np.cumsum(np.full(nz, 300.0)) - 150.0
    p = (101325.0 * np.exp(-z / 8000.0))[:, None, None] * np.ones((nz, ny, nx))
    t = (288.0 - 0.0065 * z)[:, None, None] + r.uniform(-10, 10, (nz, ny, nx))
    es = 610.78 * np.exp(17.27 * (t - 273.16) / (t - 35.86))
    qvs = 0.622 * es / (p - es)
    qv = qvs * r.uniform(0.2, 1.5, (nz, ny, nx))
    qc = np.where(r.uniform(size=t.shape) < 0.5,
                  r.uniform(0, 1e-3, t.shape), 0.0)
    f = lambda a: jnp.asarray(a, jnp.float32)
    return f(p), f(t), f(qv), f(qc)


def test_saturation_inline_bit_exact(interpret_kernels):
    """The fused kernel's saturation-adjustment stage equals the jnp
    cloud_conversion (checked in isolation via a throwaway pallas_call)."""
    import jax
    from jax.experimental import pallas as pl
    from icar_tpu.physics import mp_simple

    p, t, qv, qc = _fields(3)

    def kern(p_ref, t_ref, qv_ref, qc_ref, t_o, qv_o, qc_o, qvs_o):
        out = pk._sat_adjust_inline(p_ref[:], t_ref[:], qv_ref[:], qc_ref[:])
        t_o[:], qv_o[:], qc_o[:], qvs_o[:] = out

    nz, ny, nx = p.shape
    flat = lambda a: a.reshape(nz * ny, nx)
    got = pl.pallas_call(
        kern, interpret=True,
        out_shape=[jax.ShapeDtypeStruct((nz * ny, nx), jnp.float32)] * 4,
    )(flat(p), flat(t), flat(qv), flat(qc))
    want = mp_simple.cloud_conversion(p, t, qv, qc, 40.0)
    for name, g, w in zip(("t", "qv", "qc", "qvsat"), got, want):
        assert_ulp_equal(g.reshape(p.shape), w,
                         f"saturation stage {name} != jnp path")


def test_advect_kernel_bit_exact(interpret_kernels):
    from icar_tpu.ops import advection

    r = np.random.default_rng(5)
    S, nz, ny, nx = 3, 8, 11, 13
    q = jnp.asarray(r.uniform(0.1, 1.0, (S, nz, ny, nx)), jnp.float32)
    u = jnp.asarray(r.uniform(-6, 6, (nz, ny, nx + 1)), jnp.float32)
    v = jnp.asarray(r.uniform(-6, 6, (nz, ny + 1, nx)), jnp.float32)
    w = jnp.asarray(r.uniform(-1, 1, (nz, ny, nx)), jnp.float32)
    dz = jnp.asarray(np.full((nz, ny, nx), 200.0), jnp.float32)
    jaco = jnp.asarray(r.uniform(0.8, 1.2, (nz, ny, nx)), jnp.float32)
    jaco_u = jnp.asarray(r.uniform(0.8, 1.2, (nz, ny, nx + 1)), jnp.float32)
    jaco_v = jnp.asarray(r.uniform(0.8, 1.2, (nz, ny + 1, nx)), jnp.float32)
    jaco_w = jnp.asarray(r.uniform(0.8, 1.2, (nz, ny, nx)), jnp.float32)
    dt, dx = np.float32(20.0), np.float32(1000.0)

    got = pk.advect_upwind_tpu(q, u, v, w, dx, jaco_u, jaco_v, jaco_w,
                               dz, jaco, dt)
    want = advection.advect_upwind(q, u, v, w, dt, dx, jaco_u, jaco_v,
                                   jaco_w, jaco, None, dz, False,
                                   use_pallas=False)
    assert_ulp_equal(got, want, "advect kernel != jnp path", atol=1e-7)

    # with the enforce_limits clamp folded in (near_end=1), both paths
    # clamp identically
    floors = np.asarray([0.0, -np.inf, 1e-1], np.float32)
    got_c = pk.advect_upwind_tpu(q, u, v, w, dx, jaco_u, jaco_v, jaco_w,
                                 dz, jaco, dt, floors=floors,
                                 near_end=jnp.float32(1.0))
    want_c = advection.advect_upwind(q, u, v, w, dt, dx, jaco_u, jaco_v,
                                     jaco_w, jaco, None, dz, False,
                                     use_pallas=False, floors=floors,
                                     near_end=jnp.float32(1.0))
    assert_ulp_equal(got_c, want_c, "advect kernel clamp != jnp clamp",
                     atol=1e-7)


def test_mp_padded_stack_matches_flat(interpret_kernels):
    """The padded-stack SB04 kernel (fast interval path) equals the
    flat-operand kernel on the data cells, with garbage in the ghost/pad
    cells unable to pollute them."""
    p, t, qv, qc = _fields(21)
    r = np.random.default_rng(22)
    shape = p.shape
    nz, ny, nx = shape
    qr = jnp.asarray(np.where(r.uniform(size=shape) < 0.4,
                              r.uniform(0, 5e-4, shape), 0.0), jnp.float32)
    qs = jnp.asarray(np.where(r.uniform(size=shape) < 0.4,
                              r.uniform(0, 5e-4, shape), 0.0), jnp.float32)
    exner = (p / 100000.0) ** np.float32(0.2857)
    theta = t / exner
    # the padded kernel computes rho in-kernel as p/(RD*(theta*exner));
    # feed the flat kernel the identical value
    rho = p / (np.float32(287.058) * (theta * exner))
    rain = jnp.asarray(r.uniform(0, 3, (ny, nx)), jnp.float32)
    snow = jnp.asarray(r.uniform(0, 1, (ny, nx)), jnp.float32)
    dz = jnp.asarray(np.full(shape, 250.0), jnp.float32)
    dt = np.float32(50.0)
    c2r, c2s = np.float32(0.905), np.float32(0.975)

    want = pk.mp_simple_tpu(p, theta, exner, rho, qv, qc, qr, qs,
                            rain, snow, dt, dz, c2r, c2s)

    pad = lambda a: pk.pad_to_stack_layout(a, ny, nx)
    qpad = pad(jnp.stack([theta, qv, qc, qr, qs]))
    # poison the ghost/pad cells: results on data cells must not change
    ny_pad, P, R, front = pk.padded_geometry(ny, nx)
    mask = pk.stack_valid_mask(ny, nx).reshape(R, P) > 0
    qpad = jnp.where(mask[None, None], qpad, jnp.inf)
    rain_p = jnp.zeros((R, P), jnp.float32)
    rain_p = rain_p.at[front:front + ny, :nx].set(rain)
    snow_p = jnp.zeros((R, P), jnp.float32)
    snow_p = snow_p.at[front:front + ny, :nx].set(snow)
    out_q, out_r, out_s = pk.mp_simple_padded(
        qpad, pad(p), pad(exner), pad(dz), rain_p, snow_p,
        jnp.asarray(pk.stack_valid_mask(ny, nx)), dt, c2r, c2s,
        (0, 1, 2, 3, 4))
    got = [out_q[i, :, front:front + ny, :nx] for i in range(5)] \
        + [out_r[front:front + ny, :nx], out_s[front:front + ny, :nx]]
    for name, g, w in zip(("theta", "qv", "qc", "qr", "qs", "rain", "snow"),
                          got, want):
        assert_ulp_equal(g, w, f"padded mp kernel vs flat: {name}",
                         rtol=1e-5, atol=1e-8)


@pytest.mark.parametrize("snow", [False, True])
def test_sediment_inline_bit_exact(interpret_kernels, snow):
    """The fused kernel's sedimentation stage equals the jnp
    _sediment_species (checked in isolation via a throwaway pallas_call)."""
    import jax
    from jax.experimental import pallas as pl
    from icar_tpu.physics import mp_simple

    r = np.random.default_rng(9)
    nz, ny, nx = 10, 7, 12
    p, t, qv, _ = _fields(9, nz, ny, nx)
    q = jnp.asarray(np.where(r.uniform(size=(nz, ny, nx)) < 0.6,
                             r.uniform(0, 8e-4, (nz, ny, nx)), 0.0),
                    jnp.float32)
    rho = jnp.asarray(r.uniform(0.7, 1.2, (nz, ny, nx)), jnp.float32)
    dz = jnp.asarray(np.full((nz, ny, nx), 150.0)
                     * r.uniform(0.6, 1.4, (nz, 1, 1)), jnp.float32)
    dt = np.float32(60.0)
    fall = mp_simple.SNOW_FALL_RATE if snow else mp_simple.RAIN_FALL_RATE
    evap_base = np.float32(0.93)
    l_heat = (lambda T: -mp_simple.LH_LIQUID
              - (mp_simple.LH_VAPOR + (373.15 - T) * mp_simple.DLHVDT)) \
        if snow else \
        (lambda T: -(mp_simple.LH_VAPOR + (373.15 - T) * mp_simple.DLHVDT))

    M = ny * nx
    flat = lambda a: a.reshape(nz, M)

    def kern(q_ref, qv_ref, t_ref, p_ref, rho_ref, dz_ref,
             q_o, qv_o, t_o, pr_o):
        out = pk._sediment_inline(q_ref[:], qv_ref[:], t_ref[:], p_ref[:],
                                  rho_ref[:], dz_ref[:], dt, fall,
                                  evap_base, snow)
        q_o[:], qv_o[:], t_o[:], pr_o[:] = out

    got = pl.pallas_call(
        kern, interpret=True,
        out_shape=[jax.ShapeDtypeStruct((nz, M), jnp.float32)] * 3
        + [jax.ShapeDtypeStruct((1, M), jnp.float32)],
    )(flat(q), flat(qv), flat(t), flat(p), flat(rho), flat(dz))
    want = mp_simple._sediment_species(q, qv, t, p, rho, dz, dt, fall,
                                       evap_base, l_heat)
    shapes = ((nz, ny, nx),) * 3 + ((ny, nx),)
    for name, g, w, s in zip(("q", "qv", "t", "precip"), got, want, shapes):
        assert_ulp_equal(g.reshape(s), w,
                         f"sediment stage {name} != jnp path (snow={snow})")


def test_mp_simple_pallas_path_matches_jnp(interpret_kernels):
    """End-to-end: the full mp_simple scheme with kernels enabled equals
    the pure-jnp path."""
    from icar_tpu.physics import mp_simple

    p, t, qv, qc = _fields(13)
    r = np.random.default_rng(14)
    shape = p.shape
    qr = jnp.asarray(np.where(r.uniform(size=shape) < 0.4,
                              r.uniform(0, 5e-4, shape), 0.0), jnp.float32)
    qs = jnp.asarray(np.where(r.uniform(size=shape) < 0.4,
                              r.uniform(0, 5e-4, shape), 0.0), jnp.float32)
    exner = (p / 100000.0) ** np.float32(0.2857)
    theta = t / exner
    rho = p / (np.float32(287.0) * t)
    rain = jnp.zeros(shape[1:], jnp.float32)
    snow = jnp.zeros(shape[1:], jnp.float32)
    dz = jnp.asarray(np.full(shape, 250.0), jnp.float32)

    got = mp_simple.mp_simple(p, theta, exner, rho, qv, qc, qr, qs,
                              rain, snow, np.float32(50.0), dz,
                              use_pallas=True)
    want = mp_simple.mp_simple(p, theta, exner, rho, qv, qc, qr, qs,
                               rain, snow, np.float32(50.0), dz,
                               use_pallas=False)
    for name, g, w in zip(("theta", "qv", "qc", "qr", "qs", "rain", "snow"),
                          got, want):
        assert_ulp_equal(g, w, f"mp_simple pallas vs jnp: {name}",
                         rtol=1e-5, atol=1e-8)


def test_mpdata_kernel_equivalence(interpret_kernels):
    """The fused MPDATA window kernel (order-2 + FCT) equals the jnp
    reference path — same single-source math, so this guards the window
    plumbing: halo DMA alignment, the V-face mapping, the global-index
    boundary masks and the FCT no-limit masks."""
    from icar_tpu.ops import mpdata as md
    from icar_tpu.ops import pallas_kernels as pk

    r = np.random.default_rng(17)
    S, nz, ny, nx = 4, 8, 37, 41      # odd sizes exercise pad lanes/rows
    q = jnp.asarray(r.uniform(0.1, 1.0, (S, nz, ny, nx)), jnp.float32)
    u = jnp.asarray(r.uniform(-6, 6, (nz, ny, nx + 1)), jnp.float32)
    v = jnp.asarray(r.uniform(-6, 6, (nz, ny + 1, nx)), jnp.float32)
    w = jnp.asarray(r.uniform(-1, 1, (nz, ny, nx)), jnp.float32)
    dz = jnp.asarray(r.uniform(200, 400, (nz, ny, nx)), jnp.float32)
    jaco = jnp.asarray(r.uniform(0.8, 1.2, (nz, ny, nx)), jnp.float32)
    ju = jnp.asarray(r.uniform(0.8, 1.2, (nz, ny, nx + 1)), jnp.float32)
    jv = jnp.asarray(r.uniform(0.8, 1.2, (nz, ny + 1, nx)), jnp.float32)
    jw = jnp.asarray(r.uniform(0.8, 1.2, (nz, ny, nx)), jnp.float32)
    dt, dx = 20.0, 1000.0

    for order, fct in ((2, True), (2, False), (3, True)):
        want = md.advect_mpdata(q, u, v, w, dt, dx, ju, jv, jw, jaco,
                                None, dz, order=order, use_fct=fct,
                                use_pallas=False)
        got = pk.advect_mpdata_tpu(q, u, v, w, dx, ju, jv, jw, dz, jaco,
                                   dt, order, fct)
        assert_ulp_equal(got, want, f"MPDATA kernel (order={order}, "
                                    f"fct={fct}) != jnp path",
                         rtol=2e-5, atol=1e-6)
