"""Surface layer: open-water fluxes, flux application, 2 m diagnostics.

JAX re-implementation of the surface pieces of
/root/reference/src/physics/water_simple.f90 and the shared machinery of
lsm_driver.f90 (exchange coefficients :244-265, apply_fluxes :361-423,
surface_diagnostics :299-359). The Noah/NoahMP land models land in a later
round; with lsm=1 ("basic") sensible/latent fluxes come prescribed from the
forcing, and over water the simple bulk formulae compute them.
"""

from __future__ import annotations

import jax.numpy as jnp

from .. import constants as C
from .mp_simple import sat_mr

MAX_EXCHANGE_C = 0.5    # lsm_driver.f90:88
MIN_EXCHANGE_C = 0.004
SMALL_QV = 1e-10
SFC_LAYER_THICKNESS = 400.0   # options default (options_obj.f90:1824)


def exchange_coefficient(wind, tskin, airt, z_atm, lnz_atm_term,
                         base_exchange_term):
    """Richardson-number based bulk exchange coefficient
    (calc_exchange_coefficient, lsm_driver.f90:244-265 /
    water_simple.f90:59-75)."""
    wind = jnp.where(wind == 0, 1e-5, wind)
    ri = C.GRAVITY / airt * (airt - tskin) * z_atm / (wind ** 2)
    unstable = lnz_atm_term * (1.0 - (15.0 * ri)
                               / (1.0 + base_exchange_term * jnp.sqrt(jnp.abs(ri))))
    stable = lnz_atm_term / ((1.0 + 15.0 * ri) * jnp.sqrt(1.0 + 5.0 * ri))
    ex = jnp.where(ri < 0, unstable, stable)
    return jnp.clip(ex, MIN_EXCHANGE_C, MAX_EXCHANGE_C)


def ocean_roughness(ustar):
    """(ocean_roughness, water_simple.f90:77-84)."""
    return 8e-6 / jnp.maximum(ustar, 1e-7)


def water_simple(sst, psfc, wind, ustar, qv_1, t_1, z_atm, water_mask,
                 sensible_heat, latent_heat, z0, tskin):
    """Open-water bulk fluxes over ``water_mask`` cells (water_simple,
    water_simple.f90:86-141). Returns (sh, lh, z0, tskin, qv_surf)."""
    qv_surf = 0.98 * sat_mr(sst, psfc)   # 0.98: salinity effect
    z0_w = ocean_roughness(ustar)
    lnz = jnp.log((z_atm + z0_w) / z0_w)
    base_term = (75 * C.KARMAN ** 2 * jnp.sqrt((z_atm + z0_w) / z0_w)) / lnz ** 2
    lnz_term = (C.KARMAN / lnz) ** 2
    ex = exchange_coefficient(wind, sst, t_1, z_atm, lnz_term, base_term)

    sh_w = ex * wind * (sst - t_1)
    evap = ex * wind * (qv_surf - qv_1)
    lh_w = evap * C.LH_VAPORIZATION

    m = water_mask
    return (jnp.where(m, sh_w, sensible_heat),
            jnp.where(m, lh_w, latent_heat),
            jnp.where(m, z0_w, z0),
            jnp.where(m, sst, tskin),
            qv_surf)


def apply_fluxes(th, qv, density, dz, exner, sensible_heat, latent_heat, dt,
                 sfc_layer_thickness=SFC_LAYER_THICKNESS,
                 sh_feedback_fraction=1.0, lh_feedback_fraction=1.0):
    """Distribute surface fluxes over the lowest ~sfc_layer_thickness of
    atmosphere (apply_fluxes, lsm_driver.f90:361-423)."""
    nz = th.shape[0]
    # fraction of each layer inside the surface layer
    below = jnp.concatenate([jnp.zeros_like(dz[:1]),
                             jnp.cumsum(dz, axis=0)[:-1]], axis=0)
    layer_fraction = jnp.clip((sfc_layer_thickness - below) / dz, 0.0, 1.0)

    dtemp = (sh_feedback_fraction * sensible_heat * dt / C.CP) \
        / (density * sfc_layer_thickness)
    th = th + (dtemp / exner) * layer_fraction
    dqv = (lh_feedback_fraction * latent_heat / C.LH_VAPORIZATION * dt) \
        / (density * sfc_layer_thickness)
    qv = qv + dqv * layer_fraction
    qv = jnp.maximum(qv, SMALL_QV)
    return th, qv


def surface_diagnostics(hfx, qfx, tskin, qsfc, chs2, cqs2, psfc):
    """2 m temperature / humidity from flux-gradient relations
    (surface_diagnostics, lsm_driver.f90:299-359, WRF sfcdiags)."""
    rho = psfc / (C.RD * tskin)
    q2 = jnp.where(cqs2 < 1e-3, qsfc, qsfc - qfx / (rho * cqs2))
    t2 = jnp.where(chs2 < 1e-3, tskin, tskin - hfx / (rho * C.CP * chs2))
    q2 = jnp.maximum(q2, SMALL_QV)
    return t2, q2
