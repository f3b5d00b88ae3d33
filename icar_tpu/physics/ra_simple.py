"""Simple empirical radiation (Reiff 1984 SW / Idso & Jackson 1969 LW).

JAX re-implementation of /root/reference/src/physics/ra_simple.f90:
clear-sky shortwave from solar geometry, cloud fraction from Xu & Randall
(1996), longwave from air temperature, and a fixed ~1.5 K/day radiative
cooling of the atmosphere.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .. import constants as C

SOLAR_CONSTANT = 1367.0     # ra_simple.f90:58
QC_MIN = 1e-6
N_RAD_LAYERS = 5


def relative_humidity(t, qv, p):
    """(relative_humidity, atm_utilities.f90:306-326)."""
    mr = qv / (1 - qv)
    e = mr * p / (0.62197 + mr)
    es = 611.2 * jnp.exp(17.67 * (t - 273.15) / (t - 29.65))
    return e / es


def cloudfrac(rh, qc):
    """Xu & Randall (1996) cloud fraction (cloudfrac, ra_simple.f90:125-148)."""
    temporary = jnp.clip(((1 - rh) * qc) ** 0.25, 0.0001, 1.0)
    qc_eff = jnp.maximum(qc - QC_MIN, 5e-8)
    frac = (rh ** 0.25) * (1 - jnp.exp((-2000 * qc_eff) / temporary))
    return jnp.clip(frac, 0.0, 1.0)


def solar_elevation(day_of_year_utc, year_length, lon, sin_lat, cos_lat):
    """Solar elevation + fractional year per cell, with local solar time from
    longitude (calc_solar_elevation, ra_simple.f90:150-190).
    ``day_of_year_utc`` is the fractional day of year (kept small so float32
    keeps second-level precision for the hour angle)."""
    lon_offset = jnp.where(lon > 180, (lon - 360) / 360.0, lon / 360.0)
    day_of_year = day_of_year_utc + lon_offset
    hour_angle = 2 * np.pi * jnp.mod(day_of_year + 0.5, 1.0)
    day_frac = day_of_year / year_length
    declination = -0.4091 * jnp.cos(2.0 * np.pi / 365.0 * (day_of_year + 10))
    elev = (sin_lat * jnp.sin(declination)
            + cos_lat * jnp.cos(declination) * jnp.cos(hour_angle))
    elev = jnp.arcsin(jnp.clip(elev, -1.0, 1.0))
    return jnp.maximum(elev, 0.0), day_frac


def shortwave_down(day_frac, cloud_cover, elev):
    """(shortwave, ra_simple.f90:85-103)."""
    s = jnp.sin(elev)
    sw = SOLAR_CONSTANT * (1 + 0.035 * jnp.cos(day_frac * 2 * np.pi)) \
        * s * (0.48 + 0.29 * s)
    return sw * (1 - 0.75 * cloud_cover ** 3.4)


def longwave_down(t_air, cloud_cover):
    """(longwave, ra_simple.f90:105-120)."""
    emissivity = 1 - 0.261 * jnp.exp(-7.77e-4 * (273.16 - t_air) ** 2)
    lw = emissivity * C.STEFAN_BOLTZMANN * t_air ** 4
    return jnp.minimum(lw * (1 + 0.2 * cloud_cover), 600.0)


def ra_simple(theta, exner, qv, qc, qs, qr, p, lon, sin_lat, cos_lat,
              day_of_year, year_length, dt, runlw=True):
    """Full scheme (ra_simple, ra_simple.f90:192-271).

    ``runlw=False`` reproduces F_runlw=.False. (ra_simple.f90:260-266):
    only swdown and cloud cover are produced — no lwdown, no radiative
    cooling — which is how the RRTMG driver borrows the simple shortwave
    (ra_driver.f90:429-449, use_simple_sw).

    Returns (theta, swdown, lwdown, cloud_cover)."""
    t = theta * exner
    t_air = jnp.mean(t[:N_RAD_LAYERS], axis=0)
    rh = jnp.mean(relative_humidity(t[:N_RAD_LAYERS], qv[:N_RAD_LAYERS],
                                    p[:N_RAD_LAYERS]), axis=0)
    rh = jnp.minimum(rh, 1.0)
    hydrometeors = jnp.maximum(jnp.sum(qc + qs + qr, axis=0), 0.0)

    elev, day_frac = solar_elevation(day_of_year, year_length, lon,
                                     sin_lat, cos_lat)
    cc = cloudfrac(rh, hydrometeors)
    sw = shortwave_down(day_frac, cc, elev)
    if not runlw:
        return theta, sw, None, cc
    lw = longwave_down(t_air, cc)

    # ~1.5 K/day radiative cooling (ra_simple.f90:233)
    coolingrate = 1.5 * (dt / 86400.0) * C.STEFAN_BOLTZMANN / 300.0
    theta = theta - (t ** 4) * coolingrate
    return theta, sw, lw, cc
