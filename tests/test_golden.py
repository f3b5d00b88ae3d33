"""Pinned golden trajectory for the ideal ridge (VERDICT r1 item #1c).

Re-runs the BASELINE 100-substep ideal-ridge case and compares every
prognostic field against the committed golden data
(tests/golden/ideal_ridge_100.npz, produced by tools/make_golden.py).
An unintended change anywhere in the composed model — geometry, winds,
advection, microphysics, the step loop — breaks this test.
"""

import os

import numpy as np

GOLDEN = os.path.join(os.path.dirname(__file__), "golden",
                      "ideal_ridge_100.npz")

# absolute floors sized to each field's dynamic range (f32 accumulation
# noise over ~100 substeps); relative tolerance catches everything else
ATOL = {"u": 1e-4, "v": 1e-4, "w": 1e-5, "potential_temperature": 5e-4,
        "water_vapor": 1e-7, "cloud_water": 1e-7, "rain_mass": 1e-7,
        "snow_mass": 1e-7, "precipitation": 1e-4, "snowfall": 1e-4}


def test_ideal_ridge_matches_golden():
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir,
                                    "tools"))
    from make_golden import FIELDS, run_case

    ref = np.load(GOLDEN)
    m, steps, intervals = run_case()
    assert steps == int(ref["steps"]), (
        f"substep count changed: {steps} vs golden {int(ref['steps'])} "
        "(the CFL dt sequence is part of the pinned behavior)")
    for f in FIELDS:
        np.testing.assert_allclose(
            m.field(f), ref[f], rtol=1e-4, atol=ATOL[f],
            err_msg=(f"golden mismatch in {f} after {steps} substeps — if "
                     "this is a deliberate numerics change, regenerate via "
                     "tools/make_golden.py and explain it in the commit"))
