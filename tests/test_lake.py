"""CLM lake model (water=3) tests.

Mirrors the reference's validation approach for physics packages: exercise
the column scheme through physically interpretable scenarios (warm
equilibrium, freeze-up, snow accumulation/melt) and check conservation and
structural invariants, since the reference ships no golden lake output.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from icar_tpu.physics import water_lake as wl


def make_lake_state(ny=2, nx=3, tsk=285.0, depth=20.0, swe=0.0):
    """Host-initialized lake state on a tiny grid; every cell is a lake."""
    fields = {
        "veg_type": np.full((ny, nx), 21.0, np.float32),
        "soil_type": np.full((ny, nx), 6.0, np.float32),
        "skin_temperature": np.full((ny, nx), tsk, np.float32),
        "swe": np.full((ny, nx), swe, np.float32),
        "snow_height": np.zeros((ny, nx), np.float32),
        "lake_depth": np.full((ny, nx), depth, np.float32),
        "emissivity": np.full((ny, nx), 0.99, np.float32),
        "albedo": np.full((ny, nx), 0.08, np.float32),
    }
    terrain = np.full((ny, nx), 100.0, np.float32)
    lat = np.full((ny, nx), 45.0, np.float32)
    wl.lake_init(fields, terrain, lat)
    for k, v in fields.items():
        fields[k] = jnp.asarray(v)
    return fields


def drive(s, t_air=285.0, qv=0.008, wind=3.0, sw=200.0, lw=320.0,
          prec_mm=0.0, dt=600.0, nsteps=1, lat=45.0):
    """Run the grid driver nsteps times, returning (outputs, state)."""
    ny, nx = s["skin_temperature"].shape
    full = lambda v: jnp.full((ny, nx), v, jnp.float32)
    out = None
    for _ in range(nsteps):
        out, fields = wl.lake_driver(
            s, full(t_air), full(101325.0), full(100800.0), full(50.0),
            full(qv), full(wind), full(0.0), full(lw), full(sw),
            full(prec_mm), full(lat), dt)
        s = dict(s)
        for k, v in fields.items():
            s[k] = v
    return out, s


class TestPieces:
    def test_qsat_values(self):
        es, esdT, qs, qsdT = wl.qsat(jnp.array([293.16, 273.16]),
                                     jnp.array([1e5, 1e5]))
        # Flatau fits: ~2339 Pa at 20 C, ~611 Pa at 0 C
        assert abs(float(es[0]) - 2339.0) < 10.0
        assert abs(float(es[1]) - 611.2) < 2.0
        assert float(esdT[0]) > 0 and float(qsdT[1]) > 0

    def test_friction_velocity_neutral(self):
        z = jnp.full((1, 1), 10.0)
        z0 = jnp.full((1, 1), 0.001)
        obu = jnp.full((1, 1), 1e6)     # near-neutral
        um = jnp.full((1, 1), 5.0)
        ustar, t1, t2, t12, t22 = wl.friction_velocity(
            z, z, z, z0, z0, z0, obu, um)
        expected = 0.4 * 5.0 / np.log(10.0 / 0.001)
        assert abs(float(ustar[0, 0]) - expected) < 1e-3 * expected

    def test_tridiagonal_vs_dense(self):
        rng = np.random.RandomState(0)
        n = 19
        a = np.zeros((n, 1, 1), np.float32)
        b = np.ones((n, 1, 1), np.float32) * 2.5
        c = np.zeros((n, 1, 1), np.float32)
        r = rng.rand(n, 1, 1).astype(np.float32)
        a[1:] = -0.5
        c[:-1] = -0.7
        a[0] = 0.0
        active = np.ones((n, 1, 1), bool)
        is_top = np.zeros((n, 1, 1), bool)
        is_top[0] = True
        u = wl._tridiag_column(jnp.asarray(a), jnp.asarray(b),
                               jnp.asarray(c), jnp.asarray(r),
                               jnp.asarray(active), jnp.asarray(is_top))
        m = np.zeros((n, n))
        for i in range(n):
            m[i, i] = b[i, 0, 0]
            if i > 0:
                m[i, i - 1] = a[i, 0, 0]
            if i < n - 1:
                m[i, i + 1] = c[i, 0, 0]
        expect = np.linalg.solve(m, r[:, 0, 0])
        np.testing.assert_allclose(np.asarray(u)[:, 0, 0], expect,
                                   rtol=2e-4)

    def test_tridiagonal_variable_top(self):
        """Identity rows above jtop must not affect the active solve."""
        rng = np.random.RandomState(1)
        n, jt = 19, 4
        a = np.zeros((n, 1, 1), np.float32)
        b = np.full((n, 1, 1), 3.0, np.float32)
        c = np.zeros((n, 1, 1), np.float32)
        r = rng.rand(n, 1, 1).astype(np.float32)
        a[jt + 1:] = -1.0
        c[jt:-1] = -1.0
        active = np.arange(n)[:, None, None] >= jt
        is_top = np.arange(n)[:, None, None] == jt
        u = wl._tridiag_column(jnp.asarray(a), jnp.asarray(b),
                               jnp.asarray(c), jnp.asarray(r),
                               jnp.asarray(active), jnp.asarray(is_top))
        m = np.zeros((n - jt, n - jt))
        for i in range(n - jt):
            m[i, i] = 3.0
            if i > 0:
                m[i, i - 1] = -1.0
            if i < n - jt - 1:
                m[i, i + 1] = -1.0
        expect = np.linalg.solve(m, r[jt:, 0, 0])
        np.testing.assert_allclose(np.asarray(u)[jt:, 0, 0], expect,
                                   rtol=2e-4)


class TestInit:
    def test_structure(self):
        s = make_lake_state(tsk=285.0, depth=20.0)
        z = np.asarray(s["z_lake3d"])
        dz = np.asarray(s["dz_lake3d"])
        assert np.all(np.diff(z, axis=0) > 0)          # monotone depths
        # layers span the lake depth (first layer unscaled, CLM convention)
        total = dz.sum(axis=0)
        assert np.all(np.abs(total - (0.1 + 0.9 * 20.0)) < 1e-3)
        assert np.all(np.asarray(s["lakemask"]) == 1.0)
        assert np.all(np.asarray(s["snl2d"]) == 0.0)
        # top of lake at skin T, deep water near 277 K
        t = np.asarray(s["t_lake3d"])
        assert np.allclose(t[0], 285.0)
        assert np.all(t[-1] <= 285.0)
        # saturated soil
        vol = np.asarray(s["h2osoi_vol3d"][wl.NLEVSNOW:])
        wsat = np.asarray(s["watsat3d"])
        np.testing.assert_allclose(vol, np.minimum(1.0, wsat), atol=1e-6)

    def test_snow_bands(self):
        s = {"veg_type": np.full((1, 4), 21.0),
             "soil_type": np.full((1, 4), 6.0),
             "skin_temperature": np.full((1, 4), 270.0, np.float32),
             "swe": np.array([[0.0, 4.0, 30.0, 200.0]], np.float32),
             "snow_height": np.zeros((1, 4), np.float32),
             "emissivity": np.full((1, 4), 0.99, np.float32),
             "albedo": np.full((1, 4), 0.3, np.float32)}
        wl.lake_init(s, np.full((1, 4), 100.0), np.full((1, 4), 45.0))
        # snowdp = swe * 0.005 -> 0, 0.02, 0.15, 1.0 m
        assert list(s["snl2d"][0]) == [0.0, -1.0, -3.0, -5.0]
        # active snow dz sums to snowdp
        for i, sd in enumerate([0.0, 0.02, 0.15, 1.0]):
            snl = int(s["snl2d"][0, i])
            dzsum = s["dz3d"][wl.NLEVSNOW - 1 + snl + 1 - 1 + 1:
                              wl.NLEVSNOW, 0, i].sum() if snl < 0 else 0.0
            assert abs(dzsum - sd) < 1e-5


class TestLakeStep:
    def test_warm_equilibrium(self):
        s = make_lake_state(tsk=285.0)
        out, s2 = drive(s, t_air=285.0, sw=200.0, lw=340.0, nsteps=12)
        tsk = np.asarray(out["tsk"])
        assert np.all(np.isfinite(tsk))
        assert np.all((tsk > 275.0) & (tsk < 295.0))
        # fluxes bounded and finite
        for k in ("hfx", "lh", "grdflx", "t2", "q2"):
            v = np.asarray(out[k])
            assert np.all(np.isfinite(v)), k
        assert np.all(np.abs(np.asarray(out["hfx"])) < 600.0)
        # unfrozen: albedo stays at open-water value
        np.testing.assert_allclose(np.asarray(out["albedo"]), 0.08,
                                   atol=1e-5)

    def test_freezing_cold_air(self):
        s = make_lake_state(tsk=274.0, depth=5.0)
        # 50 h of -30 C air, no sun
        out, s2 = drive(s, t_air=243.0, qv=2e-4, sw=0.0, lw=150.0,
                        dt=1800.0, nsteps=100)
        icef = np.asarray(s2["lake_icefrac3d"])
        assert np.all(np.isfinite(icef))
        assert icef[0].min() > 0.0, "top layer should be freezing"
        assert float(np.asarray(out["tsk"]).max()) < 273.16
        # ice floats: icefrac non-increasing with depth
        assert np.all(np.diff(icef, axis=0) <= 1e-5)

    def test_snow_accumulation_and_layers(self):
        s = make_lake_state(tsk=270.0, depth=5.0)
        # freeze the top first so snow can persist
        _, s = drive(s, t_air=248.0, qv=2e-4, sw=0.0, lw=140.0,
                     dt=1800.0, nsteps=60)
        assert float(np.asarray(s["lake_icefrac3d"][0]).min()) > 0.5
        # now snow at 2 mm per 30-min step
        _, s = drive(s, t_air=260.0, qv=1e-3, sw=0.0, lw=200.0,
                     prec_mm=2.0, dt=1800.0, nsteps=30)
        swe = np.asarray(s["swe"], np.float64)
        snl = np.asarray(s["snl2d"])
        assert np.all(swe > 20.0)
        assert np.all(snl < 0.0)
        # layer water sums to the bulk SWE
        smask = np.asarray(wl._snow_mask(jnp.asarray(snl, jnp.int32)))
        layer_mass = np.where(
            smask, np.asarray(s["h2osoi_ice3d"] + s["h2osoi_liq3d"]),
            0.0).sum(axis=0)
        np.testing.assert_allclose(layer_mass, swe, rtol=1e-3)

    def test_snow_melts_in_warmth(self):
        s = make_lake_state(tsk=270.0, depth=5.0)
        _, s = drive(s, t_air=248.0, qv=2e-4, sw=0.0, lw=140.0,
                     dt=1800.0, nsteps=60)
        _, s = drive(s, t_air=260.0, qv=1e-3, sw=0.0, lw=200.0,
                     prec_mm=2.0, dt=1800.0, nsteps=20)
        swe0 = float(np.asarray(s["swe"]).mean())
        assert swe0 > 10.0
        # strong warm sunny forcing melts the pack
        _, s = drive(s, t_air=295.0, qv=8e-3, sw=600.0, lw=380.0,
                     dt=1800.0, nsteps=200)
        assert float(np.asarray(s["swe"]).mean()) < swe0 * 0.2
        assert np.all(np.isfinite(np.asarray(s["t_lake3d"])))

    def test_rain_passthrough_no_crash(self):
        s = make_lake_state(tsk=285.0)
        out, s2 = drive(s, t_air=285.0, prec_mm=5.0, nsteps=5)
        assert np.all(np.isfinite(np.asarray(out["tsk"])))


class TestConservation:
    def test_energy_residual_small(self):
        """The tridiagonal + phase-change + mixing sequence must conserve
        column energy; the scheme folds small residuals into sensible
        heat (water_lake.f90:2089-2123), so check the raw residual."""
        s = make_lake_state(tsk=283.0, depth=20.0)
        ny, nx = 2, 3
        full = lambda v: jnp.full((ny, nx), v, jnp.float32)
        # one hand-rolled step to reach shal_lake_temperature directly
        snl = jnp.zeros((ny, nx), jnp.int32)
        fx = wl.shal_lake_fluxes(
            full(285.0), full(100800.0), full(101325.0), full(25.0),
            full(0.008), full(3.0), full(0.0), full(320.0), full(150.0),
            full(45.0 * np.pi / 180), s["dz3d"], s["dz_lake3d"],
            s["t_soisno3d"], s["t_lake3d"], snl, s["h2osoi_liq3d"],
            s["h2osoi_ice3d"], s["savedtke12d"], s["t_grnd2d"],
            full(0.0))
        out = wl.shal_lake_temperature(
            fx.t_grnd, full(0.0), full(150.0), s["dz3d"], s["dz_lake3d"],
            s["z3d"], s["zi3d"], s["z_lake3d"], fx.ws, fx.ks, snl,
            fx.eflx_gnet, s["lakedepth2d"], s["lake_icefrac3d"],
            s["snow_height"], s["t_lake3d"], s["t_soisno3d"],
            s["h2osoi_liq3d"], s["h2osoi_ice3d"], s["watsat3d"],
            s["tkmg3d"], s["tkdry3d"], s["tksatu3d"], s["csol3d"],
            fx.eflx_sh_grnd, fx.eflx_sh_tot, fx.eflx_soil_grnd, 600.0)
        errsoi = np.asarray(out["errsoi"])
        assert np.all(np.abs(errsoi) < 2.0), errsoi


class TestModelIntegration:
    def test_ideal_model_with_lake(self):
        """water=3 through the full jitted substep loop: a lake strip in an
        ideal ridge domain, checked for finiteness and lake-only effect."""
        import jax
        from icar_tpu import constants as C
        from icar_tpu.models.icar import ideal_ridge_model
        from icar_tpu.physics.water_lake import lake_init

        m = ideal_ridge_model(nx=24, ny=8, nz=10, hill_height=300.0,
                              rh=0.5, water=C.WATER_LAKE)
        s = {k: np.array(v) for k, v in m.state.items()}
        # a lake strip in flat terrain
        s["veg_type"][:, 4:8] = 21.0
        s["skin_temperature"] = np.asarray(
            m.state["temperature"][0], np.float32).copy()
        s["sst"] = s["skin_temperature"].copy()
        lake_init(s, np.asarray(m.geom.terrain), np.asarray(m.geom.lat))
        st = dict(m.state)
        for k, v in s.items():
            if k in st:
                st[k] = jnp.asarray(v, st[k].dtype)
        st["land_mask"] = jnp.where(jnp.asarray(s["lakemask"]) > 0.5, 2.0,
                                    st["land_mask"])
        m.state = st
        m.advance(1800.0)
        out_t = np.asarray(m.field("t_lake3d"))
        lakemask = np.asarray(m.field("lakemask")) > 0.5
        assert np.all(np.isfinite(out_t[:, lakemask]))
        sh = np.asarray(m.field("sensible_heat"))
        assert np.all(np.isfinite(sh))
        # lake state untouched outside the mask
        assert np.all(np.asarray(m.field("snl2d"))[~lakemask] == 0.0)
