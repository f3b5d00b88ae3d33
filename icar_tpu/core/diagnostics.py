"""Per-substep diagnostic fields and the CFL timestep.

JAX port of diagnostic_update and compute_dt
(/root/reference/src/main/time_step.f90:49-198, :217-330).
"""

from __future__ import annotations

import jax.numpy as jnp

from .. import constants as C


def exner_function(pressure):
    """(p/p0)^(Rd/cp) (atm_utilities.f90 exner_function)."""
    return (pressure / C.P0) ** C.ROVCP


def interface_from_mass(f):
    """Interface value below each layer: midpoint between layers, linearly
    extrapolated below the lowest (time_step.f90:88-89)."""
    bottom = f[:1] + (f[:1] - f[1:2]) / 2
    return jnp.concatenate([bottom, (f[:-1] + f[1:]) / 2], axis=0)


def compute_iq(q, p_i):
    """Column-integrated mass of q [kg/m^2] (compute_iq,
    atm_utilities.f90:66-99): sum q * dp / g with the top layer bounded by
    a 500 hPa cap."""
    p_above = jnp.concatenate(
        [p_i[1:], jnp.full_like(p_i[:1], 50000.0)], axis=0)
    dp = jnp.maximum(p_i - p_above, 0.0)
    return jnp.sum(q * dp, axis=0) / C.GRAVITY


def compute_ivt(qv, u_mass, v_mass, p_i):
    """Column-integrated vapor transport (compute_ivt,
    atm_utilities.f90:35-63)."""
    speed = jnp.sqrt(u_mass ** 2 + v_mass ** 2)
    return compute_iq(qv * speed, p_i)


# every field the partial (per-substep) diagnostic refresh can produce
PARTIAL_FIELDS = frozenset((
    "exner", "pressure_interface", "temperature", "temperature_interface",
    "density", "uv_mass", "surface_pressure"))


def diagnostic_update(state, geom, full: bool = True,
                      with_w_real: bool = False, needs=None):
    """Refresh derived fields (diagnostic_update, time_step.f90:49-198).

    ``full=False`` computes only the fields physics consumes (exner,
    interfaces, density, mass winds) — the integrated-moisture / 10m-wind /
    w_real diagnostics are pure outputs that nothing in the substep loop
    reads, so the step computes them once per interval instead of per
    substep (a deliberate cost improvement over the reference, which
    recomputes everything every dt).

    ``needs``: optional set restricting the partial refresh to the listed
    PARTIAL_FIELDS — the substep loop passes only the fields that (a) the
    configured physics actually consumes and (b) can change during the
    interval (e.g. pressure-derived fields are loop-invariant unless the
    forcing relaxes pressure), so the memory-bound refresh touches the
    minimum set of full 3D arrays. ``needs=None`` computes everything."""
    s = dict(state)
    p = s["pressure"]
    theta = s["potential_temperature"]
    u, v, w = s["u"], s["v"], s["w"]

    if needs is None:
        needs = PARTIAL_FIELDS

    if "exner" in needs:
        exner = exner_function(p)
        s["exner"] = exner
    else:
        exner = s["exner"]
    if "pressure_interface" in needs or (full and "surface_pressure" in s):
        p_i = interface_from_mass(p)
        s["pressure_interface"] = p_i
    else:
        p_i = s["pressure_interface"]
    temperature = theta * exner
    if "temperature" in needs:
        s["temperature"] = temperature
    if "temperature_interface" in needs:
        s["temperature_interface"] = interface_from_mass(temperature)
    if "density" in needs:
        s["density"] = p / (C.RD * temperature)
    if "uv_mass" in needs or full:
        u_mass = (u[:, :, :-1] + u[:, :, 1:]) * 0.5
        v_mass = (v[:, :-1, :] + v[:, 1:, :]) * 0.5
        s["u_mass"] = u_mass
        s["v_mass"] = v_mass
    if "surface_pressure" in needs and "surface_pressure" in s:
        s["surface_pressure"] = p_i[0]

    if not full and not with_w_real:
        return s

    # real vertical motion: needed per substep only when a physics package
    # consumes it (WSM3's melting-level logic)
    if "w_real" in s:
        uw = u[:, 1:-1, 1:-1] * geom.dzdx[:, 1:-1, 1:-1]
        vw = v[:, 1:-1, 1:-1] * geom.dzdy[:, 1:-1, 1:-1]
        w_below = jnp.concatenate([jnp.zeros_like(w[:1]), w[:-1]], axis=0)
        wr = ((uw[:, :, :-1] + uw[:, :, 1:]) * 0.5
              + (vw[:, :-1, :] + vw[:, 1:, :]) * 0.5
              + geom.jacobian[:, 1:-1, 1:-1]
              * (w_below[:, 1:-1, 1:-1] + w[:, 1:-1, 1:-1]) * 0.5)
        s["w_real"] = s["w_real"].at[:, 1:-1, 1:-1].set(wr)

    if not full:
        return s

    # integrated moisture diagnostics
    if "ivt" in s:
        s["ivt"] = compute_ivt(s["water_vapor"], u_mass, v_mass, p_i)
    if "iwv" in s:
        s["iwv"] = compute_iq(s["water_vapor"], p_i)
    if "iwl" in s:
        liquid = jnp.zeros_like(p)
        for k in ("cloud_water", "rain_mass"):
            if k in s:
                liquid = liquid + s[k]
        s["iwl"] = compute_iq(liquid, p_i)
    if "iwi" in s:
        ice = jnp.zeros_like(p)
        for k in ("cloud_ice", "snow_mass", "graupel_mass"):
            if k in s:
                ice = ice + s[k]
        s["iwi"] = compute_iq(ice, p_i)

    # 10 m winds / ustar via log-law (time_step.f90:144-161), interior cells
    if "u_10m" in s and "roughness_z0" in s:
        z0 = s["roughness_z0"]
        zlev1 = geom.z[0] - geom.terrain
        currw = C.KARMAN / jnp.log(zlev1 / z0)
        lastw = jnp.log(10.0 / z0) / C.KARMAN
        u10 = u_mass[0] * currw * lastw
        v10 = v_mass[0] * currw * lastw
        ust = jnp.sqrt(u_mass[0] ** 2 + v_mass[0] ** 2) * currw
        # reference only fills interior cells; keep edges at previous value
        s["u_10m"] = s["u_10m"].at[1:-1, 1:-1].set(u10[1:-1, 1:-1])
        s["v_10m"] = s["v_10m"].at[1:-1, 1:-1].set(v10[1:-1, 1:-1])
        s["ustar"] = s["ustar"].at[1:-1, 1:-1].set(ust[1:-1, 1:-1])

    if with_w_real and "w_real" in s:
        # already computed above (time_step.f90:163-194)
        pass
    return s


def compute_dt(u, v, w, dz_levels, dx, cfl_reduction, cfl_strictness: int = 3):
    """Maximum stable dt from the CFL criterion with the reference's five
    strictness modes (compute_dt, time_step.f90:217-330). Returns seconds
    (a traced scalar; the jnp.max reductions become global collectives when
    run sharded, replacing the reference's co_min)."""
    sqrt3 = 3.0 ** 0.5 * 1.001
    three_d_cfl = 0.577350269

    au, av, aw = jnp.abs(u), jnp.abs(v), jnp.abs(w)
    if cfl_strictness == 1:
        max1d = jnp.maximum(jnp.max(au), jnp.maximum(jnp.max(av), jnp.max(aw)))
        maxwind = max1d * sqrt3
    elif cfl_strictness == 5:
        maxwind = jnp.max(au) + jnp.max(av) + jnp.max(aw)
    else:
        ufac = jnp.maximum(au[:, :, :-1], au[:, :, 1:]) / dx
        vfac = jnp.maximum(av[:, :-1, :], av[:, 1:, :]) / dx
        aw_below = jnp.concatenate([aw[:1], aw[:-1]], axis=0)
        wfac = jnp.maximum(aw, aw_below) / dz_levels[:, None, None]
        maxwind = jnp.max(ufac + vfac + wfac)
        if cfl_strictness == 2:
            max1d = jnp.maximum(jnp.max(au), jnp.maximum(jnp.max(av), jnp.max(aw)))
            maxwind = jnp.maximum(maxwind * three_d_cfl, max1d)
        elif cfl_strictness == 4:
            maxwind = maxwind * sqrt3

    return cfl_reduction / maxwind

