#!/usr/bin/env python
"""Weak-scaling measurement on a virtual CPU device mesh.

Grows the domain proportionally with the device count (fixed work per
device) and reports grid-points*steps/s and parallel efficiency vs the
1-device run — the BASELINE.md >=80% weak-scaling criterion, measured the
only way available without a multi-chip TPU slice: the same GSPMD
programs XLA would partition over ICI, partitioned over N virtual CPU
devices. Writes one JSON line per point plus a summary.

Usage: XLA_FLAGS=--xla_force_host_platform_device_count=8 \
       python tools/weak_scaling.py [--base 96x48x10] [--out FILE]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
if jax.config.jax_num_cpu_devices < 8:
    jax.config.update("jax_num_cpu_devices", 8)

import numpy as np


def run_point(n_dev, base_nx, ny, nz, interval, reps):
    from icar_tpu.models.icar import ideal_ridge_model
    from icar_tpu.parallel.mesh import make_mesh

    nx = base_nx * n_dev          # grow along x: fixed gp per device
    model = ideal_ridge_model(nx=nx, ny=ny, nz=nz, dx=1000.0,
                              hill_height=600.0, u_speed=10.0, rh=1.0)
    if n_dev > 1:
        model.attach_mesh(make_mesh(nx, ny, jax.devices()[:n_dev]))
    model.advance(interval)      # compile + warm
    jax.block_until_ready(model.state["potential_temperature"])
    t0 = time.perf_counter()
    steps = 0
    for _ in range(reps):
        model.advance(interval)
        steps += model.last_n_substeps
    jax.block_until_ready(model.state["potential_temperature"])
    dt = time.perf_counter() - t0
    return nx * ny * nz * steps / dt, steps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--base", default="96x48x10",
                    help="per-device domain NXxNYxNZ")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--interval", type=float, default=600.0)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    bx, ny, nz = (int(s) for s in args.base.split("x"))

    points = []
    thr1 = None
    for n in (1, 2, 4, 8):
        if n > len(jax.devices()):
            break
        thr, steps = run_point(n, bx, ny, nz, args.interval, args.reps)
        if thr1 is None:
            thr1 = thr
        eff = thr / (n * thr1)
        points.append({"devices": n, "nx": bx * n, "ny": ny, "nz": nz,
                       "gp_steps_per_s": round(thr, 1), "substeps": steps,
                       "efficiency": round(eff, 4)})
        print(json.dumps(points[-1]), flush=True)

    summary = {"metric": "weak scaling efficiency (8 virtual CPU devices, "
                         f"{bx}x{ny}x{nz} per device)",
               "points": points,
               "efficiency_8dev": points[-1]["efficiency"] if points else None}
    print(json.dumps(summary))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(summary, f, indent=1)


if __name__ == "__main__":
    main()
