"""Padded-stack fast interval path vs the general path.

The fast path (core/step.py fast_step) carries the advected-species stack
in the Pallas kernels' padded layout across the whole interval while_loop.
With the kernels in interpret mode, both paths execute the same kernel
bodies, so the comparison isolates the layout/carry restructuring:
prognostics must agree bit-exactly (same op order), precipitation to f32
accumulation tolerance (the fast path accumulates an interval delta).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from icar_tpu.core.step import make_step_fn
from icar_tpu.models.icar import ideal_ridge_model
from icar_tpu.ops import pallas_kernels as pk


@pytest.fixture()
def interpret_kernels():
    prev = pk.force_interpret(True)
    yield
    pk.force_interpret(prev)


def _model():
    return ideal_ridge_model(nx=64, ny=20, nz=12, dx=1000.0,
                             hill_height=800.0, u_speed=11.0, rh=1.0)


PROGNOSTICS = ("potential_temperature", "water_vapor", "cloud_water",
               "rain_mass", "snow_mass")


def _fresh(state):
    """Deep-copy the state buffers: the step donates its state argument
    (core/step.py), so each direct call needs its own copy."""
    return {k: jnp.array(v) for k, v in state.items()}


def test_fast_step_matches_general(interpret_kernels):
    m = _model()
    aux = m._time_aux()
    fn_fast = make_step_fn(m.options, m.geom, m.advect_names, False,
                           fast_path=True)
    fn_gen = make_step_fn(m.options, m.geom, m.advect_names, False,
                          fast_path=False)
    ga = m.geom_args()
    s1, t1, n1 = fn_fast(_fresh(m.state), {}, jnp.float32(0.0),
                         jnp.float32(1800.0), aux, ga)
    s2, t2, n2 = fn_gen(_fresh(m.state), {}, jnp.float32(0.0),
                        jnp.float32(1800.0), aux, ga)
    assert int(n1) == int(n2)
    for k in PROGNOSTICS:
        np.testing.assert_array_equal(
            np.asarray(s1[k]), np.asarray(s2[k]),
            err_msg=f"fast path diverges on {k}")
    for k in ("precipitation", "snowfall"):
        np.testing.assert_allclose(
            np.asarray(s1[k]), np.asarray(s2[k]), rtol=1e-5, atol=1e-7,
            err_msg=f"fast path diverges on {k}")


def test_fast_step_matches_general_with_forcing(interpret_kernels):
    """Boundary-ring forcing relaxation of the advected species follows
    the same operator order (forcing, then near-end clamp) on both
    paths."""
    m = _model()
    aux = m._time_aux()
    r = np.random.default_rng(3)
    shp = m.state["water_vapor"].shape
    dqdt = {
        "potential_temperature":
            jnp.asarray(r.uniform(-1e-4, 1e-4, shp), jnp.float32),
        "water_vapor":
            jnp.asarray(r.uniform(-1e-6, 2e-8, shp), jnp.float32),
    }
    fn_fast = make_step_fn(m.options, m.geom, m.advect_names, True,
                           fast_path=True)
    fn_gen = make_step_fn(m.options, m.geom, m.advect_names, True,
                          fast_path=False)
    ga = m.geom_args()
    s1, _, n1 = fn_fast(_fresh(m.state), dqdt, jnp.float32(0.0),
                        jnp.float32(1800.0), aux, ga)
    s2, _, n2 = fn_gen(_fresh(m.state), dqdt, jnp.float32(0.0),
                       jnp.float32(1800.0), aux, ga)
    assert int(n1) == int(n2)
    for k in PROGNOSTICS:
        np.testing.assert_array_equal(
            np.asarray(s1[k]), np.asarray(s2[k]),
            err_msg=f"fast path (forcing) diverges on {k}")


def test_fast_path_selected_automatically(interpret_kernels):
    """ICARModel uses the fast path for the flagship configuration, and
    dqdt entries outside the advected set (e.g. wind relaxation) fall
    back to the general path at trace time without error."""
    m = _model()
    m.advance(600.0)
    ref = np.asarray(m.field("potential_temperature"))
    assert np.isfinite(ref).all()

    m2 = _model()
    m2.set_forcing_tendencies({
        "u": np.full_like(np.asarray(m2.field("u")), 1e-5)})
    m2.advance(600.0)   # winds vary -> general path; must still run
    assert np.isfinite(m2.field("potential_temperature")).all()
