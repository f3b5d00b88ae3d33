"""Sharded (shard_map) fast interval path vs the single-device fast path.

VERDICT r3 item #3: the 900M-class padded-stack ridge path must run
under a mesh. fast_step_sharded (core/step.py) runs the same Pallas
kernels per shard over a y-decomposed mesh with explicit 1-row halo
ppermutes; the CFL dt is reduced globally outside the shard_map, so the
sharded result must be BIT-EXACT against the single-device fast path on
every natural cell (same kernels, same per-cell op order, halo rows
carry the identical neighbor values the single-device window reads).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from icar_tpu.core.step import make_step_fn
from icar_tpu.models.icar import ideal_ridge_model
from icar_tpu.ops import pallas_kernels as pk

PROGNOSTICS = ("potential_temperature", "water_vapor", "cloud_water",
               "rain_mass", "snow_mass")


@pytest.fixture()
def interpret_kernels():
    prev = pk.force_interpret(True)
    yield
    pk.force_interpret(prev)


def _ymesh(n):
    return Mesh(np.array(jax.devices()[:n]).reshape(n, 1), ("y", "x"))


def _mesh2d(my, mx):
    return Mesh(np.array(jax.devices()[:my * mx]).reshape(my, mx),
                ("y", "x"))


def _models(ny=40, n_shards=4, mesh=None, nx=64, v_speed=None):
    kw = dict(nx=nx, ny=ny, nz=12, dx=1000.0, hill_height=800.0,
              u_speed=11.0, rh=1.0)
    m1 = ideal_ridge_model(**kw)
    m2 = ideal_ridge_model(**kw)
    if v_speed is not None:
        # nonzero cross-shard y-flow: the ridge case is constant in y, so
        # with v == 0 every halo value is multiplied by zero winds — a
        # wrong halo row would pass. v_profile drives real y-fluxes
        # through the per-substep ppermute halos.
        from icar_tpu.forcing.ideal import make_ideal_case
        for m in (m1, m2):
            case = make_ideal_case(m.geom, u_profile=11.0,
                                   v_profile=v_speed, rh=1.0)
            m.set_initial_conditions(case)
    m2.attach_mesh(mesh if mesh is not None else _ymesh(n_shards))
    return m1, m2


@pytest.mark.parametrize("n_shards", [4, 3])
def test_sharded_fast_path_bit_exact(interpret_kernels, n_shards):
    m1, m2 = _models(n_shards=n_shards)
    fn1 = make_step_fn(m1.options, m1.geom, m1.advect_names, False,
                       fast_path=True)
    fn2 = make_step_fn(m2.options, m2.geom, m2.advect_names, False,
                       fast_path=True, mesh=m2.mesh,
                       natural_shapes=m2._natural_shapes)
    s1, t1, n1 = fn1({k: jnp.array(v) for k, v in m1.state.items()}, {},
                     jnp.float32(0.0), jnp.float32(1800.0),
                     m1._time_aux(), m1.geom_args())
    s2, t2, n2 = fn2({k: jnp.array(v) for k, v in m2.state.items()}, {},
                     jnp.float32(0.0), jnp.float32(1800.0),
                     m2._time_aux(), m2.geom_args())
    assert int(n1) == int(n2) and int(n1) >= 5
    for k in PROGNOSTICS:
        a = np.asarray(s1[k])
        b = np.asarray(s2[k])[..., :a.shape[-2], :a.shape[-1]]
        np.testing.assert_array_equal(
            a, b, err_msg=f"sharded fast path diverges on {k}")
    for k in ("precipitation", "snowfall"):
        a = np.asarray(s1[k])
        b = np.asarray(s2[k])[..., :a.shape[-2], :a.shape[-1]]
        np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-9,
                                   err_msg=k)


@pytest.mark.parametrize("my,mx,ny,nx,v", [
    (2, 2, 40, 64, 6.0),      # 2D mesh, cross-shard flow on BOTH axes
    (1, 4, 32, 64, 0.0),      # x-only decomposition
    (2, 2, 32, 128, 6.0),     # nx % 128 == 0 (the r4 advisory slice bug)
])
def test_sharded_fast_path_2d_mesh_bit_exact(interpret_kernels, my, mx,
                                             ny, nx, v):
    """2D (y AND x decomposed) meshes: per-shard kernels with ghost-lane
    x halos must stay bit-exact vs the single-device fast path — the
    mesh shape make_mesh produces for square domains (VERDICT r4 #1)."""
    m1, m2 = _models(ny=ny, nx=nx, mesh=_mesh2d(my, mx),
                     v_speed=(v or None))
    fn1 = make_step_fn(m1.options, m1.geom, m1.advect_names, False,
                       fast_path=True)
    fn2 = make_step_fn(m2.options, m2.geom, m2.advect_names, False,
                       fast_path=True, mesh=m2.mesh,
                       natural_shapes=m2._natural_shapes)
    s1, t1, n1 = fn1({k: jnp.array(v_) for k, v_ in m1.state.items()}, {},
                     jnp.float32(0.0), jnp.float32(1200.0),
                     m1._time_aux(), m1.geom_args())
    s2, t2, n2 = fn2({k: jnp.array(v_) for k, v_ in m2.state.items()}, {},
                     jnp.float32(0.0), jnp.float32(1200.0),
                     m2._time_aux(), m2.geom_args())
    assert int(n1) == int(n2) and int(n1) >= 4
    if v:
        # the flow must actually cross shard boundaries for this test to
        # exercise the halos
        assert float(jnp.max(jnp.abs(s1["v"]))) > 1.0
    for k in PROGNOSTICS:
        a = np.asarray(s1[k])
        b = np.asarray(s2[k])[..., :a.shape[-2], :a.shape[-1]]
        np.testing.assert_array_equal(
            a, b, err_msg=f"2D-mesh sharded fast path diverges on {k}")
    for k in ("precipitation", "snowfall"):
        a = np.asarray(s1[k])
        b = np.asarray(s2[k])[..., :a.shape[-2], :a.shape[-1]]
        np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-9,
                                   err_msg=k)


def test_sharded_fast_path_cross_flow_y_mesh(interpret_kernels):
    """y-mesh with nonzero v (r4 advisory #2): real cross-shard y-fluxes
    ride the per-substep halo rows; bit-exactness must survive them."""
    m1, m2 = _models(ny=40, n_shards=4, v_speed=5.0)
    fn1 = make_step_fn(m1.options, m1.geom, m1.advect_names, False,
                       fast_path=True)
    fn2 = make_step_fn(m2.options, m2.geom, m2.advect_names, False,
                       fast_path=True, mesh=m2.mesh,
                       natural_shapes=m2._natural_shapes)
    s1, _, n1 = fn1({k: jnp.array(v) for k, v in m1.state.items()}, {},
                    jnp.float32(0.0), jnp.float32(1200.0),
                    m1._time_aux(), m1.geom_args())
    s2, _, n2 = fn2({k: jnp.array(v) for k, v in m2.state.items()}, {},
                    jnp.float32(0.0), jnp.float32(1200.0),
                    m2._time_aux(), m2.geom_args())
    assert int(n1) == int(n2) and int(n1) >= 4
    assert float(jnp.max(jnp.abs(s1["v"]))) > 1.0
    for k in PROGNOSTICS:
        a = np.asarray(s1[k])
        b = np.asarray(s2[k])[..., :a.shape[-2], :a.shape[-1]]
        np.testing.assert_array_equal(
            a, b, err_msg=f"cross-flow sharded fast path diverges on {k}")


def test_sharded_fast_path_with_forcing(interpret_kernels):
    """Boundary-ring forcing relaxation (tend_pad) through the sharded
    fast path: the ring mask must be built from GLOBAL rows."""
    m1, m2 = _models(ny=32, n_shards=4)
    for m in (m1, m2):
        m._with_forcing = True
    zero = np.zeros((12, 32, 64), np.float32)
    tq = zero + 1e-7
    dq1 = {"water_vapor": jnp.asarray(tq)}
    fn1 = make_step_fn(m1.options, m1.geom, m1.advect_names, True,
                       fast_path=True)
    s1, _, n1 = fn1({k: jnp.array(v) for k, v in m1.state.items()}, dq1,
                    jnp.float32(0.0), jnp.float32(900.0),
                    m1._time_aux(), m1.geom_args())
    from icar_tpu.parallel.mesh import pad_field
    nyp, nxp = m2._padded_sizes
    dq2 = {"water_vapor": jnp.asarray(pad_field(tq, nyp, nxp))}
    fn2 = make_step_fn(m2.options, m2.geom, m2.advect_names, True,
                       fast_path=True, mesh=m2.mesh,
                       natural_shapes=m2._natural_shapes)
    s2, _, n2 = fn2({k: jnp.array(v) for k, v in m2.state.items()}, dq2,
                    jnp.float32(0.0), jnp.float32(900.0),
                    m2._time_aux(), m2.geom_args())
    assert int(n1) == int(n2)
    for k in PROGNOSTICS:
        a = np.asarray(s1[k])
        b = np.asarray(s2[k])[..., :a.shape[-2], :a.shape[-1]]
        np.testing.assert_array_equal(
            a, b, err_msg=f"forced sharded fast path diverges on {k}")


def test_model_advance_uses_sharded_fast_path(interpret_kernels):
    """End-to-end: a y-mesh ridge model advances through the sharded
    fast path and matches the unsharded model."""
    m1, m2 = _models(ny=32, n_shards=2)
    m1.advance(1200.0)
    m2.advance(1200.0)
    assert int(m1.last_n_substeps) == int(m2.last_n_substeps)
    for k in ("cloud_water", "precipitation"):
        np.testing.assert_allclose(
            np.asarray(m1.field(k)), np.asarray(m2.field(k)),
            rtol=1e-5, atol=1e-9, err_msg=k)
