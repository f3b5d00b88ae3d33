#!/usr/bin/env python
"""Regenerate the pinned golden ideal-ridge trajectory (tests/golden/).

The BASELINE correctness north star is allclose on all prognostic fields
after 100 steps of the ideal ridge case. The reference binary cannot be
compiled here, so correctness is anchored two ways: (a) the per-scheme
oracle tests (tests/test_oracles.py) validate the numerics against
literal transcriptions of the reference, and (b) this golden file pins
the 100-substep trajectory so any unintended change to the composed model
breaks tests/test_golden.py.

Run `python tools/make_golden.py` ONLY when a deliberate, reviewed
numerics change invalidates the pinned data; commit the regenerated file
together with the change that explains it.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

GOLDEN = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tests", "golden", "ideal_ridge_100.npz")

CASE = dict(nx=80, ny=16, nz=15, dx=1000.0, hill_height=900.0,
            u_speed=12.0, rh=1.0)
INTERVAL = 1800.0
MIN_STEPS = 100

FIELDS = ("u", "v", "w", "potential_temperature", "water_vapor",
          "cloud_water", "rain_mass", "snow_mass", "precipitation",
          "snowfall")


def run_case():
    from icar_tpu.models.icar import ideal_ridge_model

    m = ideal_ridge_model(**CASE)
    steps = 0
    intervals = 0
    while steps < MIN_STEPS:
        m.advance(INTERVAL)
        steps += m.last_n_substeps
        intervals += 1
    return m, steps, intervals


def main():
    m, steps, intervals = run_case()
    data = {f: m.field(f) for f in FIELDS}
    for f, a in data.items():
        assert np.isfinite(a).all(), f"non-finite golden field {f}"
    os.makedirs(os.path.dirname(GOLDEN), exist_ok=True)
    np.savez_compressed(GOLDEN, steps=steps, intervals=intervals,
                        **{k: np.asarray(v, np.float32)
                           for k, v in data.items()})
    print(f"wrote {GOLDEN}: {steps} substeps over {intervals} intervals")


if __name__ == "__main__":
    main()
