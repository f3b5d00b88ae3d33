"""Composed-substep oracle (VERDICT r2 missing #4b / next-round #6).

A scalar numpy driver runs ONE substep in the reference's exact operator
order — diagnostics -> pbl -> microphysics -> advection -> forcing
relaxation -> enforce_limits (step, time_step.f90:440-551) — built
entirely from the independent transcription oracles (tests/oracles/*),
and is compared against one iteration of the jitted while-loop body.
Unlike the pinned golden trajectory (which is self-generated), a
sequencing/operator-order bug in core/step.py fails THIS test even if it
was present when the golden file was created.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from icar_tpu import constants as C
from icar_tpu.core.step import make_step_fn
from icar_tpu.models.icar import ideal_ridge_model
from tests.oracles import advect_ref, mp_simple_ref, pbl_simple_ref


def _np_state(m):
    return {k: np.asarray(v) for k, v in m.state.items()}


def _one_substep_oracle(m, dqdt, dt):
    """The reference's substep on numpy oracles, in time_step.f90 order."""
    s = _np_state(m)
    g = m.geom
    f32 = np.float32

    # diagnostic_update (time_step.f90:49-198): the fields this
    # configuration consumes
    p = s["pressure"]
    exner = (p / C.P0) ** np.float32(C.ROVCP)
    temperature = s["potential_temperature"] * exner
    rho = p / (f32(C.RD) * temperature)
    um = (s["u"][:, :, :-1] + s["u"][:, :, 1:]) * f32(0.5)
    vm = (s["v"][:, :-1, :] + s["v"][:, 1:, :]) * f32(0.5)

    th, qv, qc, qr, qs = (s["potential_temperature"], s["water_vapor"],
                          s["cloud_water"], s["rain_mass"], s["snow_mass"])
    zeros = np.zeros_like(th)

    # pbl (time_step.f90:494; pbl_simple.f90)
    land = (np.asarray(s["land_mask"]) if "land_mask" in s
            else np.ones(th.shape[1:], np.float32))
    th, qv, qc, _, qr, qs = pbl_simple_ref.simple_pbl(
        th, qv, qc, zeros, qr, qs, um, vm, exner, rho,
        np.asarray(g.z), np.asarray(g.dz_interface),
        np.asarray(g.terrain), land, dt)

    # microphysics (time_step.f90:512-527; mp_simple.f90)
    th, qv, qc, qr, qs, rain, snow = mp_simple_ref.mp_simple_driver(
        p, th, exner, rho, qv, qc, qr, qs,
        s["precipitation"].astype(np.float32),
        s["snowfall"].astype(np.float32), dt,
        np.asarray(g.dz_interface))

    # advection (advect.f90) of every advected species, upwind
    U_m, V_m, W_m = advect_ref.setup_module_winds(
        s["u"], s["v"], s["w"], g.dx, dt, np.asarray(g.jacobian_u),
        np.asarray(g.jacobian_v), np.asarray(g.jacobian_w), rho,
        advect_density=False)
    fields = {"potential_temperature": th, "water_vapor": qv,
              "cloud_water": qc, "rain_mass": qr, "snow_mass": qs}
    for k in m.advect_names:
        fields[k] = advect_ref.advect3d(
            fields[k], U_m, V_m, W_m, rho, np.asarray(g.advection_dz),
            np.asarray(g.jacobian), advect_density=False)

    # forcing relaxation: advected scalars on the lateral boundary ring
    # only (apply_forcing, domain_obj.f90:2400-2428)
    bmask = np.zeros(th.shape[1:], np.float32)
    bmask[0, :] = bmask[-1, :] = 1.0
    bmask[:, 0] = bmask[:, -1] = 1.0
    for k, tend in dqdt.items():
        if k in fields:
            fields[k] = fields[k] + np.asarray(tend) * np.float32(dt) \
                * bmask[None]

    # enforce_limits near the interval end (time_step.f90:537-539)
    for k in ("water_vapor", "cloud_water", "rain_mass", "snow_mass"):
        fields[k] = np.maximum(fields[k], 0.0)
    return fields, rain, snow


def _model(pbl):
    return ideal_ridge_model(nx=30, ny=12, nz=10, dx=1000.0,
                             hill_height=600.0, u_speed=9.0, rh=1.0,
                             pbl=pbl)


@pytest.mark.parametrize("pbl", [C.PBL_NONE, C.PBL_SIMPLE])
def test_one_substep_matches_composed_oracle(pbl):
    m = _model(pbl)
    r = np.random.default_rng(7)
    shp = m.state["water_vapor"].shape
    dqdt = {
        "potential_temperature":
            jnp.asarray(r.uniform(-2e-4, 2e-4, shp), jnp.float32),
        "water_vapor":
            jnp.asarray(r.uniform(-1e-7, 1e-7, shp), jnp.float32),
    }
    dt = 4.0   # below the CFL dt, so end_time==dt gives ONE substep
    fn = make_step_fn(m.options, m.geom, m.advect_names, True,
                      fast_path=False)
    state_in = {k: jnp.array(v) for k, v in m.state.items()}  # donated
    out, t, n = fn(state_in, dqdt, jnp.float32(0.0), jnp.float32(dt),
                   m._time_aux(), m.geom_args())
    assert int(n) == 1, "expected exactly one substep"

    want, rain, snow = _one_substep_oracle(m, dqdt, np.float32(dt))
    # tolerances follow test_oracles' mp_simple bounds: the saturation
    # loop's own stopping criterion (MAXERR=1e-4) admits that much
    # implementation-order difference; sequencing bugs produce full
    # process-magnitude errors, orders above this
    for k, w in want.items():
        gotk = np.asarray(out[k])
        atol = 1e-4 if k == "potential_temperature" else 1e-5
        np.testing.assert_allclose(
            gotk, w, rtol=1e-3, atol=atol,
            err_msg=f"substep sequencing mismatch in {k} (pbl={pbl})")
    np.testing.assert_allclose(np.asarray(out["precipitation"]), rain,
                               rtol=1e-4, atol=1e-6,
                               err_msg="precipitation after one substep")


def test_one_substep_fast_path_matches_composed_oracle():
    """The padded-stack fast path preserves the same operator order."""
    from icar_tpu.ops import pallas_kernels as pk

    m = _model(C.PBL_NONE)
    dt = 4.0
    prev = pk.force_interpret(True)
    try:
        fn = make_step_fn(m.options, m.geom, m.advect_names, False,
                          fast_path=True)
        state_in = {k: jnp.array(v) for k, v in m.state.items()}
        out, t, n = fn(state_in, {}, jnp.float32(0.0), jnp.float32(dt),
                       m._time_aux(), m.geom_args())
    finally:
        pk.force_interpret(prev)
    assert int(n) == 1
    want, rain, snow = _one_substep_oracle(m, {}, np.float32(dt))
    for k, w in want.items():
        atol = 1e-4 if k == "potential_temperature" else 1e-5
        np.testing.assert_allclose(
            np.asarray(out[k]), w, rtol=1e-3, atol=atol,
            err_msg=f"fast-path substep mismatch in {k}")
