"""Noah LSM tests: parameter tables, soil solvers, energy/water behavior,
snow, and end-to-end model run."""

import jax.numpy as jnp
import numpy as np
import pytest

from icar_tpu import constants as C
from icar_tpu.models.icar import ideal_ridge_model
from icar_tpu.physics import lsm_noah as LN
from icar_tpu.physics.noah_params import NSOIL, load_tables


@pytest.fixture(scope="module")
def tables():
    return load_tables()


def fields(ny=4, nx=4):
    f = lambda v: jnp.full((ny, nx), v, jnp.float32)
    fi = lambda v: jnp.full((ny, nx), v, jnp.int32)
    f3 = lambda v: jnp.full((NSOIL, ny, nx), v, jnp.float32)
    return f, fi, f3


def run_noah(tables, t_air=290.0, tsk=292.0, sw=600.0, lw=350.0,
             prcp_rate=0.0, swe=0.0, smc=0.3, stc=285.0, steps=12,
             dt=300.0, ch=0.05, qv=0.008):
    f, fi, f3 = fields()
    st = dict(cmc=f(0.0), stc=f3(stc), smc=f3(smc), sh2o=f3(smc),
              swe=f(swe), snowh=f(swe * 0.005),
              sncovr=f(1.0 if swe > 0 else 0.0), snotime=f(0.0))
    tsk_a, alb, emiss, z0 = f(tsk), f(0.2), f(0.96), f(0.1)
    land = jnp.ones((4, 4), bool)
    out = None
    for _ in range(steps):
        out = LN.noah_driver(
            tables, f(100.0), f(qv), f(1e5), f(9.88e4), f(t_air), f(1.0),
            f(1e5), tsk_a, f(ch), f(lw), f(sw), alb, emiss,
            f(prcp_rate * dt), dt, fi(10), fi(6), f(0.8), f(0.7),
            f(283.0), land, st["cmc"], st["stc"], st["smc"], st["sh2o"],
            st["swe"], st["snowh"], st["sncovr"], st["snotime"], z0)
        st = dict(cmc=out["canopy_water"], stc=out["soil_temperature"],
                  smc=out["soil_water_content"],
                  sh2o=out["soil_liquid_water"], swe=out["swe"],
                  snowh=out["snow_height"], sncovr=out["snow_cover"],
                  snotime=out["snotime"])
        tsk_a = out["skin_temperature"]
        alb = out["albedo"]
        emiss = out["emissivity"]
    return out, st


def test_tables(tables):
    # MODIS categories: grassland rooting/resistance, water/ice flags
    assert tables.n_veg == 21 and tables.n_soil == 19
    assert tables.nroot[10] == 3                  # grassland
    assert tables.maxsmc[6] == pytest.approx(0.439)   # loam porosity
    assert tables.bb[12] == pytest.approx(11.55)      # clay b exponent


def test_frh2o_supercooled_water():
    t = jnp.full((2, 2), 268.0, jnp.float32)
    smc = jnp.full((2, 2), 0.3, jnp.float32)
    free = LN.frh2o(t, smc, smc * 0.5, jnp.full((2, 2), 0.439),
                    jnp.full((2, 2), 5.25), jnp.full((2, 2), 0.355))
    # some but not all water stays liquid at -5C
    assert 0.0 < float(free[0, 0]) < 0.3
    warm = LN.frh2o(jnp.full((2, 2), 280.0), smc, smc,
                    jnp.full((2, 2), 0.439), jnp.full((2, 2), 5.25),
                    jnp.full((2, 2), 0.355))
    np.testing.assert_allclose(np.asarray(warm), 0.3, rtol=1e-6)


def test_rosr12_tridiagonal():
    rng = np.random.default_rng(0)
    a = np.zeros((4, 3, 3), np.float32)
    a[1:] = rng.uniform(-0.2, 0, (3, 3, 3))
    b = np.ones((4, 3, 3), np.float32) + rng.uniform(0, .5, (4, 3, 3))
    c = np.zeros((4, 3, 3), np.float32)
    c[:-1] = rng.uniform(-0.2, 0, (3, 3, 3))
    d = rng.uniform(-1, 1, (4, 3, 3)).astype(np.float32)
    x = np.asarray(LN.rosr12(jnp.asarray(a), jnp.asarray(b),
                             jnp.asarray(c), jnp.asarray(d)))
    for j in range(3):
        for i in range(3):
            M = np.diag(b[:, j, i]) + np.diag(a[1:, j, i], -1) \
                + np.diag(c[:-1, j, i], 1)
            np.testing.assert_allclose(M @ x[:, j, i], d[:, j, i],
                                       atol=1e-5)


def test_daytime_energy_balance(tables):
    out, st = run_noah(tables)
    sh = float(out["hfx"][0, 0])
    lh = float(out["lh"][0, 0])
    g = float(out["ground_heat_flux"][0, 0])
    tsk = float(out["skin_temperature"][0, 0])
    emiss = 0.96
    rnet = 600.0 * (1 - 0.2) + 350.0 * emiss - emiss * 5.67e-8 * tsk ** 4
    # surface energy balance closes to ~10 W/m2
    assert abs(rnet - (sh + lh - g)) < 15.0
    assert lh > 0          # moist soil evaporates under strong sun


def test_rain_infiltrates_and_runs_off(tables):
    out, st = run_noah(tables, prcp_rate=5e-3, sw=0.0, t_air=288.,
                       tsk=287., steps=20)
    assert float(st["smc"][0].mean()) > 0.3       # top layer wetted
    assert float(out["runoff_surface"].mean()) > 0.0
    assert float(st["cmc"].max()) > 0.0           # canopy interception
    assert float(st["cmc"].max()) <= 0.5e-3 + 1e-9


def test_snow_accumulates_when_cold(tables):
    out, st = run_noah(tables, t_air=265., tsk=263., sw=50., lw=250.,
                       stc=268.0, prcp_rate=2e-3, steps=20)
    assert float(st["swe"].min()) > 5.0           # snow accumulated [mm]
    assert float(st["snowh"].min()) > 0.01        # with real depth
    assert float(out["albedo"].min()) > 0.3       # brightened surface
    assert float(out["snow_cover"].min()) > 0.3


def test_snowpack_melts_in_warm_sun(tables):
    out, st = run_noah(tables, t_air=280., tsk=275., sw=700., swe=30.0,
                       stc=276.0, steps=30)
    assert float(st["swe"].max()) < 30.0          # melted some
    assert float(out["snowmelt"].max()) >= 0.0
    assert float(out["skin_temperature"].max()) <= 285.0


def test_soil_temperature_relaxes_to_forcing(tables):
    # hot surface forces heat into the soil over time
    out, st = run_noah(tables, t_air=300., tsk=300., sw=800., stc=285.,
                       steps=40)
    assert float(st["stc"][0].mean()) > 286.0     # top layer warmed
    # deep layer barely moves on this timescale
    assert abs(float(st["stc"][3].mean()) - 285.0) < 1.0


def test_model_runs_with_noah():
    m = ideal_ridge_model(nx=40, ny=12, nz=10, dx=1000.0,
                          hill_height=400.0, u_speed=8.0, rh=0.9,
                          lsm=C.LSM_NOAH, water=C.WATER_SIMPLE,
                          rad=C.RA_SIMPLE)
    m.advance(1800.0)
    for n in ("potential_temperature", "water_vapor", "skin_temperature",
              "soil_temperature", "sensible_heat", "temperature_2m"):
        assert np.isfinite(m.field(n)).all(), n
    st = m.field("soil_temperature")
    assert st.shape[0] == NSOIL
    assert 240 < st.min() and st.max() < 340
