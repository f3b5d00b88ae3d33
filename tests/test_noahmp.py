"""NoahMP (lsm=4) tests: scenario-driven column checks + conservation.

The reference ships no golden NoahMP output; as with the other WRF-derived
schemes, validation is physical: flux magnitudes and signs under canonical
forcings (warm day, cold snowy night), snow-layer bookkeeping, soil water
bounds, and multi-step stability.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from icar_tpu.physics import noahmp as nmp
from icar_tpu.physics.noahmp_params import load_mp_tables, resolve_params
from icar_tpu.physics.noah_params import load_tables


def setup_grid(ny=2, nx=3, veg=10, soil=6, tsk=285.0, swe=0.0,
               soil_t=285.0, soil_m=0.3):
    tables = load_mp_tables()
    nt = load_tables()
    vegtype = jnp.full((ny, nx), veg, jnp.int32)
    soiltype = jnp.full((ny, nx), soil, jnp.int32)
    p = resolve_params(tables, nt, vegtype, soiltype)
    st = nmp.noahmp_init_state(
        np.full((ny, nx), tsk, np.float32),
        np.full((ny, nx), swe, np.float32),
        np.zeros((ny, nx), np.float32),
        np.full((nmp.NSOIL, ny, nx), soil_t, np.float32),
        np.full((nmp.NSOIL, ny, nx), soil_m, np.float32),
        np.asarray(soiltype), np.asarray(vegtype), tables, nt)
    st = {k: jnp.asarray(v) for k, v in st.items()}
    return p, st, vegtype


def drive(p, st, vegtype, t_air=285.0, qv=0.008, wind=3.0, sw=400.0,
          lw=320.0, prcp_mm=0.0, cosz=0.7, dt=600.0, nsteps=1,
          shdfac=0.7, tbot=284.0):
    ny, nx = st["tg"].shape
    full = lambda v: jnp.full((ny, nx), v, jnp.float32)
    out = None
    for _ in range(nsteps):
        out, st = nmp.noahmp_driver(
            p, full(45.0), 365.0, full(180.0), full(cosz), dt,
            full(shdfac), vegtype, full(t_air), full(95000.0),
            full(95300.0), full(wind), full(0.0), full(qv), full(sw),
            full(lw), full(prcp_mm), full(tbot), full(30.0), st)
    return out, st


class TestPieces:
    def test_esat(self):
        esw, esi, dsw, dsi = nmp.esat(jnp.array([20.0, 0.0, -20.0]))
        assert abs(float(esw[0]) - 2339.0) < 10.0
        assert abs(float(esw[1]) - 611.0) < 2.0
        assert float(esi[2]) < float(esw[2])   # ice es below water es

    def test_phenology_tables(self):
        p, st, veg = setup_grid(veg=10)   # grassland
        lai, sai, elai, esai, igs = nmp.phenology(
            p, veg, jnp.zeros((2, 3)), jnp.full((2, 3), 290.0),
            jnp.full((2, 3), 45.0), 365.0, jnp.full((2, 3), 200.0))
        assert float(lai[0, 0]) > 0.5   # midsummer grassland LAI
        assert float(igs[0, 0]) == 1.0

    def test_stomata_daylight(self):
        p, st, veg = setup_grid()
        g = lambda v: jnp.full((2, 3), v, jnp.float32)
        rs, psn = nmp.stomata(p, g(100.0), g(1.0), g(295.0), g(2000.0),
                              g(1500.0), g(293.0), g(95000.0),
                              g(0.209 * 95000.0), g(3.95e-4 * 95000.0),
                              g(1.0), g(0.8), g(30.0))
        assert 10.0 < float(rs[0, 0]) < 5000.0
        assert float(psn[0, 0]) > 0.0
        rs_dark, psn_dark = nmp.stomata(
            p, g(0.0), g(1.0), g(295.0), g(2000.0), g(1500.0), g(293.0),
            g(95000.0), g(0.209 * 95000.0), g(3.95e-4 * 95000.0), g(1.0),
            g(0.8), g(30.0))
        assert float(psn_dark[0, 0]) == 0.0
        assert float(rs_dark[0, 0]) > float(rs[0, 0])

    def test_thomas_solver(self):
        rng = np.random.RandomState(2)
        n = nmp.NSS
        a = np.zeros((n, 1, 1), np.float32)
        b = np.full((n, 1, 1), 2.0, np.float32)
        c = np.zeros((n, 1, 1), np.float32)
        r = rng.rand(n, 1, 1).astype(np.float32)
        a[1:] = -0.4
        c[:-1] = -0.4
        active = np.ones((n, 1, 1), bool)
        u = nmp._thomas_stack(jnp.asarray(a), jnp.asarray(b),
                              jnp.asarray(c), jnp.asarray(r),
                              jnp.asarray(active))
        m = np.diag(b[:, 0, 0]) + np.diag(a[1:, 0, 0], -1) \
            + np.diag(c[:-1, 0, 0], 1)
        np.testing.assert_allclose(np.asarray(u)[:, 0, 0],
                                   np.linalg.solve(m, r[:, 0, 0]),
                                   rtol=2e-4)


class TestEnergyBalance:
    def test_sunny_day_fluxes(self):
        p, st, veg = setup_grid(tsk=290.0, soil_t=288.0)
        out, st2 = drive(p, st, veg, t_air=293.0, sw=600.0, lw=350.0,
                         cosz=0.8, nsteps=6)
        for k in ("fsa", "fsh", "fgev", "fctr", "ssoil", "trad", "t2m"):
            assert np.all(np.isfinite(np.asarray(out[k]))), k
        fsa = float(np.asarray(out["fsa"])[0, 0])
        fsr = float(np.asarray(out["fsr"])[0, 0])
        assert 0.0 < fsr < 600.0 * 0.5
        assert abs(fsa + fsr - 600.0) < 1.0      # SW budget closes
        assert float(np.asarray(out["fctr"])[0, 0]) >= 0.0  # transpiring
        trad = np.asarray(out["trad"])
        assert np.all((trad > 270.0) & (trad < 320.0))

    def test_night_cooling(self):
        p, st, veg = setup_grid(tsk=285.0, soil_t=285.0)
        out, st2 = drive(p, st, veg, t_air=280.0, sw=0.0, lw=280.0,
                         cosz=-0.3, nsteps=12)
        assert float(np.asarray(out["fsa"]).max()) == 0.0
        # surface cools towards/below air temperature at night
        assert float(np.asarray(st2["tg"]).mean()) < 285.0

    def test_energy_closure(self):
        """FSA + LWDN ~ FIRA+LWDN + FSH + FCEV + FGEV + FCTR + SSOIL + PAH
        residual small (the reference checks this in ERROR, :1538-1693)."""
        p, st, veg = setup_grid(tsk=288.0)
        out, st2 = drive(p, st, veg, t_air=290.0, sw=500.0, lw=340.0,
                         cosz=0.7, nsteps=4)
        fsa = np.asarray(out["fsa"], np.float64)
        fira = np.asarray(out["fira"], np.float64)
        fsh = np.asarray(out["fsh"], np.float64)
        fcev = np.asarray(out["fcev"], np.float64)
        fgev = np.asarray(out["fgev"], np.float64)
        fctr = np.asarray(out["fctr"], np.float64)
        ssoil = np.asarray(out["ssoil"], np.float64)
        err = fsa - (fira + fsh + fcev + fgev + fctr + ssoil)
        # PAH (precip advect heat) is zero w/o precip; allow solver slack
        assert np.all(np.abs(err) < 12.0), err


class TestSnow:
    def test_snow_accumulation(self):
        p, st, veg = setup_grid(tsk=265.0, soil_t=268.0)
        # 3 mm snow per 30-min step at -10 C
        out, st2 = drive(p, st, veg, t_air=263.0, qv=1e-3, sw=50.0,
                         lw=200.0, prcp_mm=3.0, cosz=0.3, dt=1800.0,
                         nsteps=20)
        sneqv = np.asarray(st2["sneqv"])
        assert np.all(sneqv > 30.0)
        assert np.all(np.asarray(st2["isnow"]) < 0)
        # layer masses consistent with the bulk
        smask = np.asarray(nmp._snow_mask(st2["isnow"]))[:nmp.NSNOW]
        layer = np.where(smask,
                         np.asarray(st2["snice"] + st2["snliq"]),
                         0.0).sum(axis=0)
        np.testing.assert_allclose(layer, sneqv, rtol=1e-3)
        assert float(np.asarray(out["fsno"]).min()) > 0.5

    def test_snowmelt_warm(self):
        p, st, veg = setup_grid(tsk=270.0, swe=60.0, soil_t=272.0)
        sneqv0 = float(np.asarray(st["sneqv"]).mean())
        out, st2 = drive(p, st, veg, t_air=290.0, qv=6e-3, sw=700.0,
                         lw=380.0, cosz=0.9, dt=1800.0, nsteps=60)
        assert float(np.asarray(st2["sneqv"]).mean()) < sneqv0
        assert np.all(np.isfinite(np.asarray(st2["stc"])))

    def test_init_snow_bands(self):
        p, st, veg = setup_grid(swe=200.0)   # 1 m depth via 0.005 factor
        assert np.all(np.asarray(st["isnow"]) == -3)
        smask = np.asarray(nmp._snow_mask(st["isnow"]))[:nmp.NSNOW]
        layer = np.where(smask, np.asarray(st["snice"]), 0.0).sum(axis=0)
        np.testing.assert_allclose(layer, 200.0, rtol=1e-3)


class TestSoilWater:
    def test_rain_infiltration(self):
        p, st, veg = setup_grid(tsk=288.0, soil_m=0.2)
        sm0 = float(np.asarray(st["smc"]).mean())
        out, st2 = drive(p, st, veg, t_air=288.0, sw=100.0, lw=330.0,
                         prcp_mm=5.0, dt=1800.0, nsteps=10)
        smc = np.asarray(st2["smc"])
        assert np.all(np.isfinite(smc))
        assert float(smc[0].mean()) > 0.2          # top layer moistens
        assert np.all(smc <= np.asarray(p.smcmax)[None] + 1e-5)
        assert np.all(np.asarray(out["runsrf"]) >= 0.0)

    def test_dry_down(self):
        p, st, veg = setup_grid(tsk=295.0, soil_m=0.35)
        sm0 = float(np.asarray(st["smc"][0]).mean())
        out, st2 = drive(p, st, veg, t_air=300.0, qv=4e-3, sw=700.0,
                         lw=380.0, cosz=0.9, dt=1800.0, nsteps=48)
        assert float(np.asarray(st2["smc"][0]).mean()) < sm0
        assert np.all(np.asarray(st2["sh2o"]) >= -1e-6)


class TestStability:
    def test_multiday_finite(self):
        """Two simulated days with a diurnal cycle stay finite/sane."""
        p, st, veg = setup_grid(tsk=283.0)
        ny, nx = 2, 3
        full = lambda v: jnp.full((ny, nx), v, jnp.float32)
        dt = 1800.0
        for step in range(96):
            hour = (step * dt / 3600.0) % 24.0
            cosz = max(np.cos((hour - 12.0) / 12.0 * np.pi), -0.3)
            sw = max(0.0, 800.0 * cosz)
            t_air = 283.0 + 7.0 * np.cos((hour - 14.0) / 12.0 * np.pi)
            out, st = nmp.noahmp_driver(
                p, full(45.0), 365.0, full(180.0 + step * dt / 86400.0),
                full(cosz), dt, full(0.7), veg, full(t_air),
                full(95000.0), full(95300.0), full(3.0), full(0.5),
                full(0.007), full(sw), full(330.0), full(0.0),
                full(284.0), full(30.0), st)
        tg = np.asarray(st["tg"])
        assert np.all(np.isfinite(tg)) and np.all((tg > 250) & (tg < 320))
        assert np.all(np.isfinite(np.asarray(st["smc"])))
        assert np.all(np.isfinite(np.asarray(st["stc"])))


class TestModelIntegration:
    def test_ideal_model_with_noahmp(self):
        """lsm=4 through the full jitted substep loop."""
        import jax
        from icar_tpu import constants as C
        from icar_tpu.models.icar import ideal_ridge_model
        from icar_tpu.physics import noahmp as nmp_mod
        from icar_tpu.physics.noahmp_params import load_mp_tables
        from icar_tpu.physics.noah_params import load_tables

        m = ideal_ridge_model(nx=24, ny=8, nz=10, hill_height=300.0,
                              rh=0.6, lsm=C.LSM_NOAHMP)
        s = {k: np.array(v) for k, v in m.state.items()}
        s["skin_temperature"] = np.asarray(
            m.state["temperature"][0], np.float32).copy()
        s["soil_temperature"][:] = s["skin_temperature"][None]
        s["soil_deep_temperature"] = s["skin_temperature"].copy()
        init = nmp_mod.noahmp_init_state(
            s["skin_temperature"], s["swe"].astype(np.float32),
            s["snow_height"], s["soil_temperature"],
            s["soil_water_content"], s["soil_type"], s["veg_type"],
            load_mp_tables(), load_tables())
        st = dict(m.state)
        for k, v in s.items():
            st[k] = jnp.asarray(v, st[k].dtype)
        field_map = {
            "snow_albedo_prev": "albold", "snow_water_eq_prev": "sneqvo",
            "soil_liquid_water": "sh2o", "canopy_temperature": "tah",
            "canopy_vapor_pressure": "eah",
            "veg_leaf_temperature": "tv",
            "ground_surf_temperature": "tg",
            "snow_layer_depth": "zsnso", "water_table_depth": "zwt",
            "water_aquifer": "wa", "storage_gw": "wt", "lai": "lai",
            "sai": "sai"}
        for f, k in field_map.items():
            st[f] = jnp.asarray(init[k], st[f].dtype)
        st["snow_nlayers"] = jnp.asarray(init["isnow"], jnp.float32)
        st["snow_temperature"] = jnp.asarray(init["stc"][:3])
        st["soil_temperature"] = jnp.asarray(init["stc"][3:])
        m.state = st
        m.advance(1800.0)
        for name in ("sensible_heat", "latent_heat", "skin_temperature",
                     "soil_water_content", "veg_leaf_temperature",
                     "water_table_depth"):
            v = np.asarray(m.field(name))
            assert np.all(np.isfinite(v)), name
        tsk = np.asarray(m.field("skin_temperature"))
        assert np.all((tsk > 240.0) & (tsk < 330.0))


class TestGlacier:
    def _setup(self, tsk=265.0, swe=500.0):
        tables = load_mp_tables()
        nt = load_tables()
        ny, nx = 2, 3
        vegtype = jnp.full((ny, nx), tables.isice, jnp.int32)
        soiltype = jnp.full((ny, nx), 6, jnp.int32)
        p = resolve_params(tables, nt, vegtype, soiltype)
        st = nmp.noahmp_init_state(
            np.full((ny, nx), tsk, np.float32),
            np.full((ny, nx), swe, np.float32),
            np.zeros((ny, nx), np.float32),
            np.full((nmp.NSOIL, ny, nx), 262.0, np.float32),
            np.full((nmp.NSOIL, ny, nx), 0.3, np.float32),
            np.asarray(soiltype), np.asarray(vegtype), tables, nt)
        st = {k: jnp.asarray(v) for k, v in st.items()}
        return p, st

    def _drive(self, p, st, t_air, sw, lw, prcp_mm=0.0, cosz=0.3,
               dt=1800.0, nsteps=1):
        from icar_tpu.physics import noahmp_glacier as gla
        ny, nx = st["tg"].shape
        full = lambda v: jnp.full((ny, nx), v, jnp.float32)
        out = None
        for _ in range(nsteps):
            out, st = gla.glacier_sflx(
                p, full(cosz), dt, jnp.asarray(nmp.ZSOIL), full(t_air),
                full(85000.0), full(5.0), full(0.0), full(0.002),
                full(sw), full(lw), full(prcp_mm / dt), full(260.0),
                jnp.ones((nmp.NSNOW, ny, nx)), full(30.0), st)
        return out, st

    def test_init_frozen(self):
        p, st = self._setup()
        assert np.all(np.asarray(st["smc"]) == 1.0)
        assert np.all(np.asarray(st["sh2o"]) == 0.0)
        assert np.all(np.asarray(st["stc"][nmp.NSNOW:]) <= 263.15)
        assert np.all(np.asarray(st["sneqv"]) >= 10.0)

    def test_cold_stable(self):
        p, st = self._setup(tsk=255.0)
        out, st2 = self._drive(p, st, t_air=250.0, sw=100.0, lw=180.0,
                               nsteps=12)
        tg = np.asarray(st2["tg"])
        assert np.all(np.isfinite(tg)) and np.all((tg > 230) & (tg < 274))
        # high albedo over glacier snow
        assert float(np.asarray(out["albedo"]).min()) > 0.4
        assert np.all(np.asarray(st2["smc"]) <= 1.0 + 1e-6)

    def test_summer_melt_runoff(self):
        # thin pack so percolation breaks through within the test window
        p, st = self._setup(tsk=271.0, swe=30.0)
        out, st2 = self._drive(p, st, t_air=283.0, sw=600.0, lw=340.0,
                               cosz=0.8, nsteps=24)
        # melting glacier: surface pinned near freezing, snow shrinking,
        # melt percolating through to runoff
        assert float(np.asarray(st2["tg"]).max()) <= 273.2
        assert float(np.asarray(st2["sneqv"]).max()) < 30.0
        assert float(np.asarray(out["qmelt"]).max()) > 0.0
        assert float(np.asarray(out["runsrf"]).max()) > 0.0
        assert np.all(np.isfinite(np.asarray(st2["stc"])))

    def test_snowfall_on_glacier(self):
        p, st = self._setup(tsk=260.0, swe=20.0)
        out, st2 = self._drive(p, st, t_air=263.0, sw=50.0, lw=200.0,
                               prcp_mm=3.0, nsteps=20)
        assert float(np.asarray(st2["sneqv"]).min()) > 20.0
        assert np.all(np.asarray(st2["isnow"]) < 0)
