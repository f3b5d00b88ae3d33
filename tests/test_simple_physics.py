"""Simple radiation / PBL / surface physics tests."""

import jax.numpy as jnp
import numpy as np
import pytest

from icar_tpu import constants as C
from icar_tpu.models.icar import ideal_ridge_model
from icar_tpu.physics import pbl_simple as pbl
from icar_tpu.physics import ra_simple as ra
from icar_tpu.physics import surface as sfc


# --- radiation -------------------------------------------------------------

def test_solar_elevation_noon_equator():
    # day_of_year x.0 is midnight UTC; at lon=180 offset +0.5 -> local noon
    elev, day_frac = ra.solar_elevation(
        jnp.float32(79.0),      # ~equinox (late March)
        jnp.float32(365.0),
        jnp.asarray([[0.0, 180.0]]),      # lon: midnight vs noon
        jnp.zeros((1, 2)), jnp.ones((1, 2)))
    elev = np.asarray(elev)
    assert elev[0, 0] == 0.0              # night: clamped to 0
    assert np.degrees(elev[0, 1]) > 80.0  # near-overhead sun at noon equinox


def test_shortwave_magnitudes():
    sw_clear = float(ra.shortwave_down(jnp.float32(0.5), jnp.float32(0.0),
                                       jnp.float32(np.pi / 2)))
    assert 900 < sw_clear < 1100          # clear-sky noon overhead
    sw_cloudy = float(ra.shortwave_down(jnp.float32(0.5), jnp.float32(1.0),
                                        jnp.float32(np.pi / 2)))
    assert sw_cloudy == pytest.approx(sw_clear * 0.25, rel=1e-5)


def test_longwave_range():
    lw = float(ra.longwave_down(jnp.float32(280.0), jnp.float32(0.0)))
    assert 200 < lw < 400
    lw_cloud = float(ra.longwave_down(jnp.float32(280.0), jnp.float32(1.0)))
    assert lw_cloud > lw
    assert float(ra.longwave_down(jnp.float32(350.0), jnp.float32(1.0))) <= 600.0


def test_cloudfrac_monotone():
    rh = jnp.float32(0.9)
    # reference clamp interplay: with qc=0, temporary->1e-4 and qc_eff->5e-8
    # give frac = rh^0.25 * (1 - e^-1) ~ 0.62 (ra_simple.f90:125-148)
    c_dry = float(ra.cloudfrac(rh, jnp.float32(0.0)))
    assert c_dry == pytest.approx(0.9 ** 0.25 * (1 - np.exp(-1.0)), rel=1e-3)
    c_wet = float(ra.cloudfrac(rh, jnp.float32(1e-3)))
    assert c_wet > c_dry
    # dry air has less cloud than saturated air at equal qc
    assert float(ra.cloudfrac(jnp.float32(0.2), jnp.float32(0.0))) < c_dry


def test_model_with_radiation():
    # dry case so radiative cooling is not masked by latent heating
    m = ideal_ridge_model(nx=40, ny=12, nz=10, dx=1000.0, hill_height=400.0,
                          u_speed=8.0, rh=0.2, rad=C.RA_SIMPLE)
    th0 = m.field("potential_temperature").mean()
    m.advance(3600.0)
    assert np.isfinite(m.field("shortwave")).all()
    assert m.field("shortwave").min() >= 0
    lw = m.field("longwave")
    assert 100 < lw.mean() < 600
    cc = m.field("cloud_fraction")
    assert 0 <= cc.min() and cc.max() <= 1
    # radiative cooling should lower mean theta slightly
    assert m.field("potential_temperature").mean() < th0


# --- PBL -------------------------------------------------------------------

def column_profile(nz=12, ny=6, nx=6, dtheta=0.0, shear=5.0):
    dz = np.full((nz, ny, nx), 200.0, np.float32)
    z = np.cumsum(dz, axis=0) - 100.0
    th = (300.0 + dtheta * np.arange(nz)[:, None, None]).astype(np.float32) \
        * np.ones((nz, ny, nx), np.float32)
    p = (1e5 * np.exp(-z / 8000)).astype(np.float32)
    exner = (p / 1e5) ** C.ROVCP
    rho = p / (C.RD * th * exner)
    u = (shear * np.arange(nz)[:, None, None] / nz).astype(np.float32) \
        * np.ones((nz, ny, nx), np.float32)
    qv = np.full((nz, ny, nx), 0.005, np.float32)
    qv[0] = 0.01  # moist near surface
    zeros = np.zeros_like(qv)
    return dict(th=jnp.asarray(th), qv=jnp.asarray(qv),
                zeros=jnp.asarray(zeros), u=jnp.asarray(u),
                v=jnp.asarray(zeros), exner=jnp.asarray(exner),
                rho=jnp.asarray(rho), z=jnp.asarray(z), dz=jnp.asarray(dz),
                terrain=jnp.zeros((ny, nx)))


def test_pbl_mixes_moisture_upward():
    c = column_profile(dtheta=0.0)   # neutral, sheared -> mixing
    th, qv, qc, qi, qr, qs = pbl.pbl_simple(
        c["th"], c["qv"], c["zeros"], c["zeros"], c["zeros"], c["zeros"],
        c["u"], c["v"], c["exner"], c["rho"], c["z"], c["dz"], c["terrain"],
        dt=60.0)
    qv = np.asarray(qv)
    assert qv[0, 0, 0] < 0.01           # surface moisture mixed up
    assert qv[1, 0, 0] > 0.005          # layer above moistened
    # total water approximately conserved (flux form)
    m0 = float((np.asarray(c["qv"]) * np.asarray(c["rho"]) * 200).sum())
    m1 = float((qv * np.asarray(c["rho"]) * 200).sum())
    assert abs(m1 - m0) / m0 < 1e-5


def test_pbl_stable_mixes_less():
    neutral = column_profile(dtheta=0.0)
    stable = column_profile(dtheta=3.0)   # strong inversion
    out_n = pbl.pbl_simple(neutral["th"], neutral["qv"], neutral["zeros"],
                           neutral["zeros"], neutral["zeros"], neutral["zeros"],
                           neutral["u"], neutral["v"], neutral["exner"],
                           neutral["rho"], neutral["z"], neutral["dz"],
                           neutral["terrain"], dt=60.0)
    out_s = pbl.pbl_simple(stable["th"], stable["qv"], stable["zeros"],
                           stable["zeros"], stable["zeros"], stable["zeros"],
                           stable["u"], stable["v"], stable["exner"],
                           stable["rho"], stable["z"], stable["dz"],
                           stable["terrain"], dt=60.0)
    dq_n = 0.01 - float(out_n[1][0, 0, 0])
    dq_s = 0.01 - float(out_s[1][0, 0, 0])
    assert dq_s < dq_n                   # stability suppresses mixing


def test_model_with_pbl():
    m = ideal_ridge_model(nx=40, ny=12, nz=10, dx=1000.0, hill_height=400.0,
                          u_speed=10.0, rh=1.0, pbl=C.PBL_SIMPLE)
    m.advance(600.0)
    assert np.isfinite(m.field("potential_temperature")).all()
    assert m.field("water_vapor").min() >= 0


# --- surface ---------------------------------------------------------------

def test_water_fluxes_warm_sst():
    ny, nx = 4, 4
    sst = jnp.full((ny, nx), 290.0)
    psfc = jnp.full((ny, nx), 1e5)
    wind = jnp.full((ny, nx), 8.0)
    ustar = jnp.full((ny, nx), 0.3)
    qv1 = jnp.full((ny, nx), 0.005)
    t1 = jnp.full((ny, nx), 285.0)     # air colder than water -> upward SH
    z_atm = jnp.full((ny, nx), 25.0)
    mask = jnp.ones((ny, nx), bool)
    zeros = jnp.zeros((ny, nx))
    sh, lh, z0, tskin, qvs = sfc.water_simple(
        sst, psfc, wind, ustar, qv1, t1, z_atm, mask, zeros, zeros,
        jnp.full((ny, nx), 0.01), zeros)
    assert float(sh.min()) > 0          # heating the air
    assert float(lh.min()) > 0          # evaporating
    np.testing.assert_allclose(np.asarray(tskin), 290.0)
    assert float(z0.max()) < 1e-3       # smooth ocean


def test_apply_fluxes_heats_lowest_layers():
    nz, ny, nx = 8, 4, 4
    th = jnp.full((nz, ny, nx), 300.0)
    qv = jnp.full((nz, ny, nx), 0.005)
    rho = jnp.ones((nz, ny, nx))
    dz = jnp.full((nz, ny, nx), 200.0)
    exner = jnp.ones((nz, ny, nx))
    sh = jnp.full((ny, nx), 200.0)      # W/m^2 upward
    lh = jnp.full((ny, nx), 100.0)
    th2, qv2 = sfc.apply_fluxes(th, qv, rho, dz, exner, sh, lh, 600.0)
    dth = np.asarray(th2 - th)
    assert dth[0].min() > 0             # lowest layer warmed
    assert dth[0, 0, 0] == pytest.approx(dth[1, 0, 0], rel=1e-5)  # within sfc layer
    np.testing.assert_allclose(dth[3:], 0.0, atol=1e-7)  # above 400m untouched
    # energy check: sum(rho*dz*cp*dT) == sh*dt
    total = (np.asarray(rho) * np.asarray(dz) * C.CP * dth).sum(axis=0)
    np.testing.assert_allclose(total, 200.0 * 600.0, rtol=1e-4)


def test_model_full_simple_physics():
    """All simple schemes enabled at once: the reference's 'full simple
    physics column' configuration."""
    m = ideal_ridge_model(nx=40, ny=12, nz=10, dx=1000.0, hill_height=400.0,
                          u_speed=8.0, rh=1.0, rad=C.RA_SIMPLE,
                          pbl=C.PBL_SIMPLE, lsm=C.LSM_BASIC,
                          water=C.WATER_SIMPLE)
    m.advance(1200.0)
    for name in ("potential_temperature", "water_vapor", "shortwave",
                 "temperature_2m", "humidity_2m"):
        assert np.isfinite(m.field(name)).all(), name
    t2 = m.field("temperature_2m")
    assert 240 < t2[1:-1, 1:-1].mean() < 310
