#!/usr/bin/env python
"""Benchmark: ideal-ridge throughput in grid-points*steps/s per chip.

The north-star metric from BASELINE.json: a 500x500x20 ideal ridge with
upwind advection + SB04 simple microphysics (the reference's "fast"
configuration, run/short_icar_options.nml mp=2 adv=1), timed over whole
forcing intervals of the jitted while_loop step.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    import jax

    nx, ny, nz = 500, 500, 20
    interval = 1200.0      # seconds of model time per advance() call
    n_timed = 3

    from icar_tpu import constants as C
    from icar_tpu.models.icar import ideal_ridge_model

    t0 = time.time()
    model = ideal_ridge_model(
        nx=nx, ny=ny, nz=nz, dx=1000.0, hill_height=1000.0,
        u_speed=10.0, rh=0.95, mp=C.MP_SIMPLE, windtype=C.WIND_NONE,
        flat_z_height=-5)
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
    result = {
        "metric": "grid-points*steps/s per chip (ideal ridge 500x500x20, upwind+mp_simple)",
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
