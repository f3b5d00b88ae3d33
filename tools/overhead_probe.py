#!/usr/bin/env python
"""Decompose the ridge interval cost: t(n_substeps) over many n.

Runs the SAME compiled interval program with end_time values producing
n = 1, 2, 3, 6, 12, 23 substeps (end_time is a runtime argument, so one
server build covers all points), plus a chained-execution dispatch probe
(x = f(x) repeatedly — distinct executions, immune to any server-side
result caching). The least-squares fit t = a + b*n splits true
per-substep cost from per-interval overhead far more robustly than
bench.py's two-point fit.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from bench import build_model

    nx, ny, nz = 500, 500, 20
    model = build_model("ridge", nx, ny, nz)

    # chained dispatch probe: n distinct executions of a tiny program
    x = jnp.zeros((8, 128), jnp.float32)
    f = jax.jit(lambda x: x + 1.0)
    x = jax.block_until_ready(f(x))
    t0 = time.time()
    for _ in range(50):
        x = f(x)
    jax.block_until_ready(x)
    chain_ms = (time.time() - t0) / 50 * 1e3

    # D2H scalar fetch cost (the suspected per-advance overhead: int(n))
    t0 = time.time()
    for _ in range(10):
        float(x[0, 0])
    fetch_ms = (time.time() - t0) / 10 * 1e3

    # warm the interval program once (block on the fresh scalar output:
    # donated state outputs alias inputs and are "ready" immediately)
    model.advance(1200.0)
    dt0 = 1200.0 / model.last_n_substeps      # int() fetch = real sync

    points = []
    for n_target in (1, 2, 3, 6, 12, 23, 23, 12, 6, 3, 2, 1):
        interval = dt0 * (n_target - 0.5)
        t0 = time.time()
        model.advance(interval)
        n_now = model.last_n_substeps      # int() fetch = real sync
        el = time.time() - t0
        points.append((n_now, el))
    ns = np.array([p[0] for p in points], float)
    ts = np.array([p[1] for p in points], float)
    b, a = np.polyfit(ns, ts, 1)
    resid = float(np.sqrt(np.mean((a + b * ns - ts) ** 2)))
    print(json.dumps({
        "chain_dispatch_ms": round(chain_ms, 3),
        "scalar_fetch_ms": round(fetch_ms, 3),
        "per_substep_ms": round(b * 1e3, 3),
        "interval_overhead_ms": round(a * 1e3, 3),
        "fit_rms_ms": round(resid * 1e3, 3),
        "points": [[int(n), round(t * 1e3, 1)] for n, t in points],
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
