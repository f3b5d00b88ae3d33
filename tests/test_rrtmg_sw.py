"""RRTMG-SW machinery tests.

Like the LW tests, the k-distribution data files are not shipped with the
reference, so the tests pin everything independent of them: the g-point
reduction structure, two-stream physical limits (pure-Rayleigh albedo,
energy conservation, surface absorption = (1-albedo)*swdown), cloud SW
forcing sign, night-column masking, and the full-model integration on
synthetic tables.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from icar_tpu.physics import rrtmg_sw as sw
from icar_tpu.physics.rrtmg_sw_tables import (synthetic_sw_tables, NGC,
                                              NGPTSW, NGN, NGB, RWGT, WT,
                                              reduce_k, reduce_f)


class TestTables:
    def test_gpoint_structure(self):
        assert NGC.sum() == NGPTSW
        assert sum(NGN) == 14 * 16
        assert len(NGB) == NGPTSW

    def test_rwgt_normalizes_within_groups(self):
        """Each combined group's rwgt-weighted mean preserves a constant:
        sum over group of wt_i/wtsm = 1."""
        k = np.ones(16)
        for band in range(1, 15):
            red = reduce_k(k, band)
            assert np.allclose(red, 1.0, atol=1e-6), band

    def test_reduce_f_sums(self):
        f = np.ones(16)
        for band in range(1, 15):
            segs_total = reduce_f(f, band).sum()
            assert np.isclose(segs_total, 16.0)

    def test_synthetic_solar_source_total(self):
        tables = synthetic_sw_tables()
        total = 0.0
        for t in tables:
            sf = t["sfluxref"]
            total += (sf[:, 0] if sf.ndim == 2 else sf).sum()
        assert abs(total - 1368.22) < 1.0


def _columns(nlay=13, N=4, qv=6e-3):
    play = jnp.broadcast_to(jnp.linspace(950.0, 10.0, nlay)[:, None],
                            (nlay, N))
    plev = jnp.broadcast_to(
        jnp.concatenate([jnp.linspace(1000.0, 5.0, nlay),
                         jnp.array([1e-4])])[:, None], (nlay + 1, N))
    tlay = jnp.broadcast_to(jnp.linspace(288.0, 220.0, nlay)[:, None],
                            (nlay, N))
    h2ovmr = jnp.full((nlay, N), qv * 1.607)
    o3vmr = sw._o3_profile(play) * (sw.AMD / 47.9982)
    return play, plev, tlay, h2ovmr, o3vmr


class TestRad:
    def _run(self, cldfrac=0.0, albedo=0.2, cosz=0.6, tables=None):
        tables = tables or synthetic_sw_tables()
        nlay, N = 13, 4
        play, plev, tlay, h2ovmr, o3vmr = _columns(nlay, N)
        z = jnp.zeros((nlay, N))
        cf = jnp.full((nlay, N), 0.0).at[4].set(cldfrac)
        clwp = jnp.where(cf > 0, 30.0, 0.0)
        out = sw.rrtmg_sw_rad(
            tables, play, plev, tlay, jnp.full((N,), cosz),
            jnp.full((N,), albedo), h2ovmr, o3vmr, cf, z, clwp, z,
            jnp.full((nlay, N), 30.0), jnp.full((nlay, N), 10.5),
            jnp.full((nlay, N), 100.0), jax.random.PRNGKey(3),
            scon=1366.0)
        return out

    def test_clear_sky_energy_accounting(self):
        out = self._run()
        dn = np.asarray(out.swdflx)
        up = np.asarray(out.swuflx)
        toa_in = dn[-1]
        assert np.all(toa_in > 700.0)          # ~1366*0.6 incident
        assert np.all(up <= dn + 1e-3)         # net flux downward
        # net flux decreases monotonically upward only via absorption:
        net = dn - up
        assert np.all(net >= -1e-3)
        # surface absorption: up(srf) = albedo * dn(srf)
        assert np.allclose(up[0], 0.2 * dn[0], rtol=1e-4)

    def test_heating_rates_positive_and_sane(self):
        out = self._run()
        hr = np.asarray(out.swhr)
        assert np.all(np.isfinite(hr))
        assert np.all(hr >= -1e-6)             # SW only heats
        assert hr.max() < 30.0                 # K/day

    def test_cloud_reduces_surface_flux(self):
        clear = self._run(cldfrac=0.0)
        cloudy = self._run(cldfrac=1.0)
        assert (float(np.asarray(cloudy.swdflx)[0].mean())
                < float(np.asarray(clear.swdflx)[0].mean()))
        # cloud increases TOA upwelling (reflection)
        assert (float(np.asarray(cloudy.swuflx)[-1].mean())
                > float(np.asarray(clear.swuflx)[-1].mean()))

    def test_higher_albedo_more_reflection(self):
        low = self._run(albedo=0.1)
        high = self._run(albedo=0.8)
        assert (float(np.asarray(high.swuflx)[-1].mean())
                > float(np.asarray(low.swuflx)[-1].mean()))


class TestDriver:
    def _fields(self, nz=12, ny=3, nx=4):
        p3d = jnp.broadcast_to(
            jnp.linspace(95000.0, 20000.0, nz)[:, None, None],
            (nz, ny, nx))
        p8w = jnp.broadcast_to(
            jnp.linspace(100000.0, 22000.0, nz)[:, None, None],
            (nz, ny, nx))
        t3d = jnp.broadcast_to(
            jnp.linspace(288.0, 220.0, nz)[:, None, None], (nz, ny, nx))
        return p3d, p8w, t3d

    def test_night_columns_zeroed(self):
        tables = synthetic_sw_tables()
        nz, ny, nx = 12, 3, 4
        p3d, p8w, t3d = self._fields(nz, ny, nx)
        z = jnp.zeros((nz, ny, nx))
        re = jnp.full((nz, ny, nx), 8e-6)
        cosz = jnp.full((ny, nx), 0.5).at[0].set(-0.2)
        th, swdown, gsw, swcf, swdir = sw.rrtmg_sw_driver(
            tables, jax.random.PRNGKey(0), p3d, p8w, t3d, t3d + 1.0,
            cosz, jnp.full((ny, nx), 0.2), jnp.full((nz, ny, nx), 4e-3),
            z, z, z, z, re, re, re, jnp.ones((nz, ny, nx)),
            jnp.full((nz, ny, nx), 400.0), (p3d / 1e5) ** 0.2854)
        assert np.all(np.asarray(swdown)[0] == 0.0)
        assert np.all(np.asarray(th)[:, 0] == 0.0)
        assert np.all(np.asarray(swdown)[1:] > 100.0)
        assert np.all(np.isfinite(np.asarray(th)))
        assert np.all(np.asarray(gsw)[1:] > 0.0)
        assert np.all(np.isfinite(np.asarray(swcf)))
        # direct/diffuse split (SWDDIR/SWDDIF): zero at night, bounded
        # by the total, dominant in this clear-sky column
        swdir = np.asarray(swdir)
        assert np.all(swdir[0] == 0.0)
        assert np.all(swdir <= np.asarray(swdown) + 1e-6)
        assert np.all(swdir[1:] > 0.5 * np.asarray(swdown)[1:])


class TestModelIntegration:
    def test_ideal_model_with_full_rrtmg(self):
        """rad=3 with use_simple_sw=false (LW + SW) through the jitted
        substep loop on synthetic k-tables."""
        from icar_tpu import constants as C
        from icar_tpu.models.icar import ideal_ridge_model
        from icar_tpu.physics import rrtmg_lw as lw
        from icar_tpu.physics.rrtmg_lw_tables import synthetic_lw_tables

        lw.set_lw_tables(synthetic_lw_tables())
        sw.set_sw_tables(synthetic_sw_tables())
        try:
            def noon(o):
                o.run.start_date = "2020-06-15 12:00:00"
                o.run.end_date = "2020-06-16 12:00:00"
            m = ideal_ridge_model(nx=24, ny=8, nz=10, hill_height=300.0,
                                  rh=0.8, rad=C.RA_RRTMG,
                                  options_cb=noon)
            st = dict(m.state)
            st["skin_temperature"] = jnp.asarray(
                m.state["temperature"][0], jnp.float32)
            m.state = st
            m.advance(1800.0)
            for name in ("tend_th_swrad", "shortwave",
                         "shortwave_cloud_forcing", "tend_th_lwrad",
                         "longwave", "potential_temperature"):
                v = np.asarray(m.field(name))
                assert np.all(np.isfinite(v)), name
            th = np.asarray(m.field("potential_temperature"))
            assert np.all((th > 230.0) & (th < 400.0))
            # noon start: the daytime path is exercised and shortwave
            # reaches the ground
            assert np.asarray(m.field("shortwave")).max() > 1.0
            assert np.asarray(m.field("shortwave_cloud_forcing")).min() \
                <= 0.0
        finally:
            lw.set_lw_tables(None)
            sw.set_sw_tables(None)
