"""Stack-native Thompson + fused-MPDATA interval path vs the jnp path.

The TPU interval loop for the MPDATA+Thompson configuration feeds the
advected-species stack straight through microphysics and advection
(mp_thompson.mp_thompson_stack + the fused kernels, with the near-end
limits clamp folded into the MPDATA epilogue) with zero per-substep
restacking. With the kernels in interpret mode this runs the exact
kernel bodies on CPU; the jnp path (kernels off) is the reference
implementation. Both must agree over a full multi-substep interval to
kernel-equivalence tolerance (the kernel recomputes prep per tile in
f32, so a few-ulp relative difference is expected, not bit equality).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from icar_tpu import constants as C
from icar_tpu.core.step import make_step_fn
from icar_tpu.models.icar import ideal_ridge_model
from icar_tpu.ops import pallas_kernels as pk


@pytest.fixture()
def interpret_kernels():
    prev = pk.force_interpret(True)
    yield
    pk.force_interpret(prev)


def _model():
    return ideal_ridge_model(nx=48, ny=20, nz=12, dx=1000.0,
                             hill_height=800.0, u_speed=11.0, rh=1.0,
                             mp=C.MP_THOMPSON, adv=C.ADV_MPDATA)


def _fresh(state):
    return {k: jnp.array(v) for k, v in state.items()}


def _run(m, use_kernels):
    prev = pk.force_interpret(use_kernels)
    try:
        fn = make_step_fn(m.options, m.geom, m.advect_names, False)
        return fn(_fresh(m.state), {}, jnp.float32(0.0),
                  jnp.float32(900.0), m._time_aux(), m.geom_args())
    finally:
        pk.force_interpret(prev)


def test_thompson_stack_interval_matches_jnp(interpret_kernels):
    m = _model()
    s1, t1, n1 = _run(m, True)    # interpret-mode kernels (stack path)
    s2, t2, n2 = _run(m, False)   # jnp reference path
    assert int(n1) == int(n2) and int(n1) >= 3
    for k in m.advect_names:
        a, b = np.asarray(s1[k]), np.asarray(s2[k])
        # per-tile f32 prep recompute + op-order differences cascade over
        # ~17 substeps: observed maxima are rel ~2e-4 (rain number),
        # abs ~6e-8 (trace moisture at cloud edges)
        np.testing.assert_allclose(a, b, rtol=1e-3, atol=1e-6,
                                   err_msg=f"stack path diverges on {k}")
    for k in ("precipitation", "snowfall", "graupel"):
        np.testing.assert_allclose(np.asarray(s1[k]), np.asarray(s2[k]),
                                   rtol=1e-4, atol=1e-7, err_msg=k)
