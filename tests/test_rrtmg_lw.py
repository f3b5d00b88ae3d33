"""RRTMG-LW machinery tests.

The k-distribution data files (rrtmg_support/*.nc) are not shipped with
the reference or this repository, so absolute radiances cannot be
validated here; instead the tests pin down everything that is independent
of the k-tables: the Planck-function/flux normalization (zero-opacity
limit -> sigma*T^4), physical flux structure (positivity, TOA downward
zero, greenhouse response, cloud LW forcing), the g-point reduction
weights, and the end-to-end driver shape contract.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from icar_tpu.physics import rrtmg_lw as lw
from icar_tpu.physics.rrtmg_lw_tables import (synthetic_lw_tables, NGC,
                                              NGPTLW, RWGT, WT, NGN,
                                              reduce_k)

SIGMA = 5.670374e-8


def profile(nlay=20, N=3, tsfc=288.0):
    """A rough midlatitude profile."""
    ps = 1000.0
    plev = np.linspace(ps, 100.0, nlay + 1)          # hPa
    play = 0.5 * (plev[:-1] + plev[1:])
    tlay = tsfc - 6.5 * (8.0 * np.log(ps / play))    # ~6.5 K/km lapse
    tlay = np.maximum(tlay, 210.0)
    tlev = tsfc - 6.5 * (8.0 * np.log(ps / plev))
    tlev = np.maximum(tlev, 210.0)
    rep = lambda a: jnp.asarray(np.repeat(a[:, None], N, 1), jnp.float32)
    h2o = 0.01 * (play / ps) ** 3
    o3 = np.full(nlay, 3e-7)
    return (rep(play), rep(plev), rep(tlay), rep(tlev),
            jnp.full((N,), tsfc, jnp.float32), rep(h2o), rep(o3))


def run(tables, k_zero=False, tsfc=288.0, cldf=0.0, co2=lw.CO2VMR,
        nlay=20, N=3):
    play, plev, tlay, tlev, tsfc_a, h2o, o3 = profile(nlay, N, tsfc)
    z = jnp.zeros_like(play)
    cf = jnp.full_like(play, cldf)
    clwp = jnp.where(cf > 0, 20.0, 0.0)   # g/m2 in cloudy layers
    rel = jnp.full_like(play, 10.0)
    rei = jnp.full_like(play, 30.0)
    res = jnp.full_like(play, 50.0)
    key = jax.random.PRNGKey(0)
    return lw.rrtmg_lw_rad(tables, play, plev, tlay, tlev, tsfc_a,
                           h2o if not k_zero else z, o3, cf, z, clwp, z,
                           rei, rel, res, jnp.full((N,), 1.0), key,
                           co2vmr=co2)


class TestReduction:
    def test_rwgt_normalization(self):
        """Within each reduced g-point the weights sum to 1."""
        ipr = 0
        igc = 0
        for b in range(16):
            for k in range(NGC[b]):
                n = NGN[igc]
                s = RWGT[b * 16 + ipr:b * 16 + ipr + n].sum() \
                    if NGC[b] < 16 else 1.0 * n
                assert abs(s - n * 1.0) < 1e-6 or NGC[b] < 16
                if NGC[b] < 16:
                    w = (WT[ipr:ipr + n] / WT[ipr:ipr + n].sum())
                    np.testing.assert_allclose(
                        RWGT[b * 16 + ipr:b * 16 + ipr + n], w, rtol=1e-10)
                ipr += n
                igc += 1
            ipr = 0

    def test_reduce_k_constant(self):
        """A constant k-table reduces to the same constant."""
        arr = np.full((5, 13, 16), 2.5)
        for band in (1, 3, 13):
            red = reduce_k(arr, band)
            assert red.shape == (5, 13, NGC[band - 1])
            np.testing.assert_allclose(red, 2.5, rtol=1e-6)


class TestPhysics:
    def setup_method(self):
        self.tables = [
            {k: jnp.asarray(v) for k, v in t.items()}
            for t in synthetic_lw_tables(seed=1)]
        # zero-opacity tables: same shapes, all absorption zero
        self.tables0 = [
            {k: (jnp.zeros_like(jnp.asarray(v))
                 if k not in ("fracrefa", "fracrefb") else jnp.asarray(v))
             for k, v in t.items()}
            for t in synthetic_lw_tables(seed=1)]

    def test_zero_opacity_gives_sigma_t4(self):
        """With zero gas opacity and emissivity 1, OLR == surface Planck
        flux == sigma*T^4 (validates the Planck tables + normalization)."""
        out = run(self.tables0, k_zero=True, tsfc=288.0)
        olr = float(np.asarray(out.olr)[0])
        expect = SIGMA * 288.0 ** 4
        assert abs(olr - expect) / expect < 0.01, (olr, expect)
        # no emission in a transparent atmosphere
        assert float(np.asarray(out.dflx).max()) < 1.0

    def test_flux_structure(self):
        out = run(self.tables, tsfc=288.0)
        uf = np.asarray(out.uflx)
        df = np.asarray(out.dflx)
        assert np.all(np.isfinite(uf)) and np.all(np.isfinite(df))
        assert np.all(uf >= 0.0) and np.all(df >= -1e-6)
        # downward flux vanishes at TOA and grows toward the surface
        assert np.all(df[-1] < 1e-3)
        assert np.all(df[0] > df[-1])
        # atmosphere absorbs: OLR below surface emission
        assert np.all(uf[-1] <= uf[0] + 1e-3)
        htr = np.asarray(out.htr)
        assert np.all(np.isfinite(htr))
        assert np.all(np.abs(htr) < 100.0)   # K/day, sane for random k

    def test_greenhouse_response(self):
        """More CO2 -> more absorption -> lower OLR, higher GLW."""
        out1 = run(self.tables, co2=200e-6)
        out2 = run(self.tables, co2=1600e-6)
        assert float(np.asarray(out2.olr).mean()) \
            < float(np.asarray(out1.olr).mean())
        assert float(np.asarray(out2.glw).mean()) \
            > float(np.asarray(out1.glw).mean())

    def test_cloud_lw_forcing(self):
        """A cloud layer raises downward LW at the surface."""
        clear = run(self.tables, cldf=0.0)
        cloudy = run(self.tables, cldf=1.0)
        assert float(np.asarray(cloudy.glw).mean()) \
            > float(np.asarray(clear.glw).mean())
        # clear-sky diagnostic of the cloudy run matches the clear run
        np.testing.assert_allclose(np.asarray(cloudy.dflxc[0]),
                                   np.asarray(clear.dflx[0]), rtol=2e-2)

    def test_warmer_surface_more_olr(self):
        cold = run(self.tables, tsfc=270.0)
        warm = run(self.tables, tsfc=300.0)
        assert float(np.asarray(warm.olr).mean()) \
            > float(np.asarray(cold.olr).mean())


class TestDriver:
    def test_driver_shapes_and_sanity(self):
        tables = [{k: jnp.asarray(v) for k, v in t.items()}
                  for t in synthetic_lw_tables(seed=2)]
        nz, ny, nx = 12, 3, 4
        p3d = jnp.broadcast_to(
            jnp.linspace(95000.0, 20000.0, nz)[:, None, None],
            (nz, ny, nx))
        p8w = jnp.broadcast_to(
            jnp.linspace(100000.0, 22000.0, nz)[:, None, None],
            (nz, ny, nx))
        t3d = jnp.broadcast_to(
            jnp.linspace(288.0, 220.0, nz)[:, None, None], (nz, ny, nx))
        t8w = t3d + 1.0
        tsk = jnp.full((ny, nx), 290.0)
        qv = jnp.full((nz, ny, nx), 4e-3)
        qc = jnp.zeros((nz, ny, nx)).at[3].set(2e-4)
        zeros = jnp.zeros((nz, ny, nx))
        cf = jnp.zeros((nz, ny, nx)).at[3].set(0.7)
        re_c = jnp.full((nz, ny, nx), 8e-6)
        re_i = jnp.full((nz, ny, nx), 3e-5)
        re_s = jnp.full((nz, ny, nx), 5e-5)
        rho = jnp.full((nz, ny, nx), 1.0)
        dz = jnp.full((nz, ny, nx), 400.0)
        emiss = jnp.full((ny, nx), 0.98)
        exner = (p3d / 1e5) ** 0.2854
        th_tend, glw, olr, lwcf = lw.rrtmg_lw_driver(
            tables, jax.random.PRNGKey(1), p3d, p8w, t3d, t8w, tsk, qv,
            qc, zeros, zeros, cf, re_c, re_i, re_s, rho, dz, emiss,
            exner)
        assert th_tend.shape == (nz, ny, nx)
        assert np.all(np.isfinite(np.asarray(th_tend)))
        assert np.all(np.asarray(glw) > 0.0)
        assert np.all(np.asarray(olr) > 0.0)


class TestCloudFraction:
    """cal_cldfra3 (icloud=3; atm_utilities.f90:727-843)."""

    def _col(self, nz=20, rh=0.3, qc_lvl=None, ny=2, nx=3):
        p = np.linspace(95000.0, 15000.0, nz).astype(np.float32)
        t = np.maximum(288.0 - 6.5e-3 * np.linspace(0, 12000, nz),
                       210.0).astype(np.float32)
        from icar_tpu.physics.mp_thompson import rslf
        qvs = np.asarray(rslf(jnp.asarray(p), jnp.asarray(t)))
        qv = (rh * qvs).astype(np.float32)
        tile = lambda a: jnp.broadcast_to(
            jnp.asarray(a)[:, None, None], (nz, ny, nx))
        qc = np.zeros(nz, np.float32)
        if qc_lvl is not None:
            qc[qc_lvl] = 5e-4
        z = jnp.zeros((nz, ny, nx))
        dz = jnp.full((nz, ny, nx), 600.0)
        xland = jnp.ones((ny, nx))
        return (tile(qv), tile(qc), z, z, dz, tile(p), tile(t), xland)

    def test_explicit_cloud_gives_full_fraction(self):
        from icar_tpu.physics.cloud_fraction import cal_cldfra3
        args = self._col(qc_lvl=4)
        cldfra, qc_rad, qi_rad = cal_cldfra3(*args, gridkm=4.0)
        assert np.allclose(np.asarray(cldfra[4]), 1.0)
        assert np.all(np.isfinite(np.asarray(qc_rad)))
        assert np.all(np.isfinite(np.asarray(qi_rad)))

    def test_dry_column_is_clear(self):
        from icar_tpu.physics.cloud_fraction import cal_cldfra3
        args = self._col(rh=0.2)
        cldfra, qc_rad, qi_rad = cal_cldfra3(*args, gridkm=4.0)
        assert np.all(np.asarray(cldfra) == 0.0)
        # no subgrid condensate invented in a clear column
        assert np.all(np.asarray(qc_rad) == 0.0)
        assert np.all(np.asarray(qi_rad) == 0.0)

    def test_humid_layer_fractional_cloud(self):
        from icar_tpu.physics.cloud_fraction import cal_cldfra3
        qv, qc, qi, qs, dz, p, t, xland = self._col(rh=0.3)
        # near-saturated band well above the boundary layer
        qv = np.array(qv)
        qv[8:11] *= 0.97 / 0.3
        cldfra, qc_rad, qi_rad = cal_cldfra3(
            jnp.asarray(qv), qc, qi, qs, dz, p, t, xland, gridkm=4.0)
        cf = np.asarray(cldfra)[:, 0, 0]
        assert cf.max() > 0.01, cf
        assert cf.max() <= 0.9 + 1e-6
        # fractional decks get subgrid condensate for radiation
        assert float(np.asarray(qc_rad).max() + np.asarray(qi_rad).max()) \
            > 0.0

    def test_warm_levels_stay_clear(self):
        from icar_tpu.physics.cloud_fraction import cal_cldfra3
        qv, qc, qi, qs, dz, p, t, xland = self._col(rh=0.95)
        t = jnp.asarray(np.full(t.shape, 295.0, np.float32))  # tc >= 20
        cldfra, _, _ = cal_cldfra3(qv, qc, qi, qs, dz, p, t, xland,
                                   gridkm=4.0)
        assert np.all(np.asarray(cldfra) == 0.0)


class TestModelIntegration:
    def test_ideal_model_with_rrtmg(self):
        """rad=3 (RRTMG-LW + simple SW, icloud=3) through the jitted
        substep loop on synthetic k-tables."""
        from icar_tpu import constants as C
        from icar_tpu.models.icar import ideal_ridge_model

        lw.set_lw_tables(synthetic_lw_tables())
        try:
            def use_simple_sw(o):
                o.rad.use_simple_sw = True
            m = ideal_ridge_model(nx=24, ny=8, nz=10, hill_height=300.0,
                                  rh=0.8, rad=C.RA_RRTMG,
                                  options_cb=use_simple_sw)
            st = dict(m.state)
            st["skin_temperature"] = jnp.asarray(
                m.state["temperature"][0], jnp.float32)
            m.state = st
            m.advance(1800.0)
            for name in ("tend_th_lwrad", "longwave", "out_longwave_rad",
                         "longwave_cloud_forcing", "shortwave",
                         "potential_temperature", "cosine_zenith_angle"):
                v = np.asarray(m.field(name))
                assert np.all(np.isfinite(v)), name
            assert np.any(np.asarray(m.field("tend_th_lwrad")) != 0.0)
            assert np.all(np.asarray(m.field("longwave")) > 0.0)
            th = np.asarray(m.field("potential_temperature"))
            assert np.all((th > 230.0) & (th < 400.0))
        finally:
            lw.set_lw_tables(None)


def test_lw_driver_column_chunking_cloud_free_exact():
    """Column chunking (RRTMG_COL_CHUNK; the reference's per-column
    loop analog bounding g-point temp memory) must be exact for
    cloud-free columns: with cldfra = 0 the McICA sample is irrelevant,
    so the chunked result equals the single-call result bit-for-bit up
    to f32 reassociation."""
    import numpy as np

    import jax
    import jax.numpy as jnp

    from icar_tpu.physics import rrtmg_lw as lw

    lw.set_lw_tables(synthetic_lw_tables())
    try:
        nz, ny, nx = 8, 3, 7
        r = np.random.default_rng(5)
        dz = np.full((nz, ny, nx), 400.0, np.float32)
        z = np.cumsum(dz, axis=0) - 200.0
        p = (1e5 * np.exp(-z / 8000.0)).astype(np.float32)
        p8w = (1e5 * np.exp(-(z - 200.0) / 8000.0)).astype(np.float32)
        t = (288.0 - 0.0065 * z).astype(np.float32)
        t8w = (288.0 - 0.0065 * (z - 200.0)).astype(np.float32)
        exner = ((p / 1e5) ** 0.2857).astype(np.float32)
        rho = p / (287.0 * t)
        qv = np.full_like(p, 2e-3)
        zero = np.zeros_like(p)
        tsk = t[0] + 1.0
        emiss = np.full((ny, nx), 0.95, np.float32)
        f = jnp.asarray
        args = (lw.get_lw_tables(), jax.random.PRNGKey(0), f(p), f(p8w),
                f(t), f(t8w), f(tsk), f(qv), f(zero), f(zero), f(zero),
                f(zero), f(zero + 1e-5), f(zero + 2e-5), f(zero + 3e-5),
                f(rho), f(dz), f(emiss), f(exner))
        full = lw.rrtmg_lw_driver(*args)
        prev = lw.RRTMG_COL_CHUNK
        lw.RRTMG_COL_CHUNK = 5          # forces 5 chunks for N=21
        try:
            chunked = lw.rrtmg_lw_driver(*args)
        finally:
            lw.RRTMG_COL_CHUNK = prev
        for a, b, nm in zip(full, chunked,
                            ("th_tend", "glw", "olr", "lwcf")):
            np.testing.assert_allclose(
                np.asarray(b), np.asarray(a), rtol=2e-6, atol=2e-5,
                err_msg=f"chunked LW diverges on {nm}")
    finally:
        lw.set_lw_tables(None)
