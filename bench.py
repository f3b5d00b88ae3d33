#!/usr/bin/env python
"""Benchmark: ideal-ridge throughput in grid-points*steps/s per chip.

The north-star metric from BASELINE.json: a 500x500x20 ideal ridge with
upwind advection + SB04 simple microphysics (the reference's "fast"
configuration, run/short_icar_options.nml mp=2 adv=1), timed over whole
forcing intervals of the jitted while_loop step.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def build_model(config: str, nx, ny, nz):
    """The BASELINE.md config matrix. 'ridge' is the headline metric the
    driver records; the others cover MPDATA+Thompson, the linear-theory
    wind solver, and a full physics column."""
    from icar_tpu import constants as C
    from icar_tpu.models.icar import ideal_ridge_model

    common = dict(nx=nx, ny=ny, nz=nz, dx=1000.0, hill_height=1000.0,
                  u_speed=10.0, rh=0.95, flat_z_height=-5)
    if config == "ridge":
        return ideal_ridge_model(mp=C.MP_SIMPLE, windtype=C.WIND_NONE,
                                 **common)
    if config == "mpdata_thompson":
        return ideal_ridge_model(mp=C.MP_THOMPSON, adv=C.ADV_MPDATA,
                                 windtype=C.WIND_NONE, **common)
    if config == "linear":
        return ideal_ridge_model(mp=C.MP_SIMPLE, windtype=C.WIND_LINEAR,
                                 **common)
    if config == "fullphys":
        return ideal_ridge_model(
            mp=C.MP_THOMPSON, windtype=C.WIND_CONSERVE_MASS,
            rad=C.RA_SIMPLE, pbl=C.PBL_SIMPLE, lsm=C.LSM_NOAH,
            water=C.WATER_SIMPLE, conv=C.CU_TIEDTKE, **common)
    if config == "conus":
        # CONUS-scale domain-decomposed run (BASELINE.md): full physics
        # on a large domain, sharded over every available device
        import jax
        from icar_tpu.parallel.mesh import make_mesh
        m = ideal_ridge_model(
            mp=C.MP_THOMPSON, windtype=C.WIND_CONSERVE_MASS,
            rad=C.RA_SIMPLE, pbl=C.PBL_SIMPLE, lsm=C.LSM_NOAH,
            water=C.WATER_SIMPLE, conv=C.CU_TIEDTKE, **common)
        if len(jax.devices()) > 1:
            m.attach_mesh(make_mesh(nx, ny))
        return m
    raise SystemExit(f"unknown config {config!r}")


def main():
    import jax

    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="ridge",
                    choices=["ridge", "mpdata_thompson", "linear",
                             "fullphys", "conus"])
    ap.add_argument("--size", default="500x500x20",
                    help="domain as NXxNYxNZ")
    args = ap.parse_args()
    nx, ny, nz = (int(s) for s in args.size.split("x"))
    interval = 1200.0      # seconds of model time per advance() call
    n_timed = 3

    from icar_tpu import constants as C

    t0 = time.time()
    model = build_model(args.config, nx, ny, nz)
    setup_s = time.time() - t0

    # warmup: compile + one interval
    t0 = time.time()
    model.advance(interval)
    jax.block_until_ready(model.state["potential_temperature"])
    warmup_s = time.time() - t0

    t0 = time.time()
    steps = 0
    for _ in range(n_timed):
        model.advance(interval)
        steps += model.last_n_substeps
    jax.block_until_ready(model.state["potential_temperature"])
    elapsed = time.time() - t0

    # sanity: state must stay finite
    import numpy as np
    th = np.asarray(model.state["potential_temperature"])
    assert np.isfinite(th).all(), "non-finite state after benchmark run"

    gp_steps_per_s = nx * ny * nz * steps / elapsed
    labels = {
        "ridge": "upwind+mp_simple",
        "mpdata_thompson": "MPDATA+Thompson",
        "linear": "linear winds+mp_simple",
        "fullphys": "Thompson+Noah+PBL+rad+Tiedtke",
        "conus": "full physics, domain-decomposed",
    }
    result = {
        "metric": (f"grid-points*steps/s per chip (ideal ridge "
                   f"{nx}x{ny}x{nz}, {labels[args.config]})"),
        "value": round(gp_steps_per_s, 1),
        "unit": "gp*steps/s",
        "vs_baseline": None,
        "detail": {
            "substeps": steps,
            "elapsed_s": round(elapsed, 3),
            "warmup_s": round(warmup_s, 3),
            "setup_s": round(setup_s, 3),
            "steps_per_s": round(steps / elapsed, 3),
            "device": str(jax.devices()[0]),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
