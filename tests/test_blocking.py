"""Flow-blocking parameterization tests (winds_blocking.f90 port).

Mirrors the spirit of the reference's test_blocking.f90 (LUT generation +
perturbation behavior) plus an end-to-end model run with block_flow on.
"""

import numpy as np
import jax.numpy as jnp

from icar_tpu.ops import blocking as blk
from icar_tpu import constants as C


def ridge_terrain(ny=20, nx=40, height=800.0):
    x = np.arange(nx)
    ridge = height * np.exp(-((x - nx / 2.0) / 4.0) ** 2)
    return np.broadcast_to(ridge, (ny, nx)).astype(np.float64).copy()


class TestPieces:
    def test_terrain_blocking_heights(self):
        terr = ridge_terrain()
        tb = blk.terrain_blocking_heights(terr, 3)
        assert tb.shape == terr.shape
        # relief-based: largest near the ridge flanks, ~0 far away
        assert tb.max() > 200.0
        assert tb[:, 0].max() < tb.max() * 0.2

    def test_find_max_downward_level(self):
        w = np.array([-1.0, -5.0, -2.0, -8.0])
        # early-return quirk: stops after first local minimum
        assert blk._find_max_downward_level(w) == 1
        assert blk._find_max_downward_level(np.array([-1., -2., -3.])) == 2

    def test_froude_smoothing(self):
        th = jnp.broadcast_to(
            290.0 + 4.0 * jnp.arange(10.0)[:, None, None], (10, 8, 16))
        u = jnp.full((10, 8, 17), 8.0)
        v = jnp.zeros((10, 9, 16))
        z = jnp.broadcast_to(
            (100.0 + 500.0 * jnp.arange(10.0))[:, None, None], (10, 8, 16))
        tb = jnp.full((8, 16), 500.0)
        fr = blk.update_froude(th, u, v, z, tb, 2, 3, 0.75)
        assert fr.shape == (8, 16)
        assert np.all(np.isfinite(np.asarray(fr)))
        assert np.all(np.asarray(fr) > 0.0)
        # flat blocking height -> uniform froude
        np.testing.assert_allclose(np.asarray(fr), float(fr[0, 0]),
                                   rtol=1e-5)


class TestModel:
    def test_blocked_flow_model_run(self):
        """block_flow=True produces a stable run whose low-level winds
        differ from the unblocked run over the ridge."""
        from icar_tpu.models.icar import ideal_ridge_model

        def make(block):
            m = ideal_ridge_model(nx=40, ny=12, nz=12, dx=2000.0,
                                  hill_height=800.0, u_speed=4.0, rh=0.4)
            m.options.block.block_flow = block
            m.options.lt.n_dir_values = 8
            m.options.lt.n_spd_values = 4
            m.options.lt.buffer = 16
            m.options.block.block_fr_max = 2.0   # weak flow -> blocked
            case = None
            return m

        m0 = make(False)
        m1 = make(True)
        # drive the wind solve directly (blocking applies at wind updates)
        u0 = jnp.asarray(m0.state["u"])
        v0 = jnp.asarray(m0.state["v"])
        uu0, vv0, ww0 = m0.compute_winds(u0, v0)
        uu1, vv1, ww1 = m1.compute_winds(u0, v0)
        assert np.all(np.isfinite(np.asarray(uu1)))
        assert np.all(np.isfinite(np.asarray(vv1)))
        d = float(jnp.abs(uu1 - uu0).max())
        assert d > 1e-4, "blocking should perturb the winds"
        # perturbation bounded by the contribution fraction * wind scale
        assert float(jnp.abs(uu1).max()) < 50.0
        m1.state = dict(m1.state)
        m1.state["u"], m1.state["v"], m1.state["w"] = uu1, vv1, ww1
        m1.advance(600.0)
        assert np.all(np.isfinite(np.asarray(m1.field("u"))))
