#!/usr/bin/env python
"""Per-kernel wall timings at bench shapes on the real TPU.

Times the fast-path pieces (padded-stack SB04 kernel, padded advect
kernel, density refresh) in isolation to attribute the per-substep cost:
the roofline question is whether the remaining time is HBM traffic or
VPU compute (the sat-adjust + CFL-substepped fall loops are serial
per-tile iteration). Also times the mp kernel at dt=1 s (1 sediment
substep, fast saturation convergence) vs the bench dt to split the
loop-iteration share.

Usage: python tools/kernel_prof.py [--size 500x500x20] [--iters 30]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(f, args, iters):
    out = f(*args)
    import jax
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(iters):
        out = f(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", default="500x500x20")
    ap.add_argument("--iters", type=int, default=30)
    args = ap.parse_args()
    nx, ny, nz = (int(s) for s in args.size.split("x"))

    import jax
    import jax.numpy as jnp
    import numpy as np

    from icar_tpu.ops import pallas_kernels as pk

    ny_pad, P, R, front = pk.padded_geometry(ny, nx)
    r = np.random.default_rng(0)
    f = lambda *s: jnp.asarray(r.uniform(0.2, 1.0, s), jnp.float32)
    qpad = jnp.stack([
        f(nz, R, P) * 300.0,            # theta-ish
        f(nz, R, P) * 1e-2,             # qv
        f(nz, R, P) * 1e-3,             # qc
        f(nz, R, P) * 1e-4,             # qr
        f(nz, R, P) * 1e-4,             # qs
    ])
    p_pad = f(nz, R, P) * 5e4 + 5e4
    exner_pad = f(nz, R, P) * 0.2 + 0.8
    dz_pad = f(nz, R, P) * 100 + 300
    rain = jnp.zeros((R, P), jnp.float32)
    mask = jnp.asarray(pk.stack_valid_mask(ny, nx))
    res = {}

    mp = jax.jit(lambda q, dt: pk.mp_simple_padded(
        q, p_pad, exner_pad, dz_pad, rain, rain, mask,
        dt, jnp.float32(0.9), jnp.float32(0.97), (0, 1, 2, 3, 4)))
    res["mp_dt52_ms"] = timeit(mp, (qpad, jnp.float32(52.0)),
                               args.iters) * 1e3
    res["mp_dt1_ms"] = timeit(mp, (qpad, jnp.float32(1.0)),
                              args.iters) * 1e3
    # no-precipitate stack: fall loops exit immediately
    qdry = qpad.at[3:].set(0.0)
    res["mp_dt52_dry_ms"] = timeit(mp, (qdry, jnp.float32(52.0)),
                                   args.iters) * 1e3

    u = f(nz, ny, nx + 1) * 10
    v = f(nz, ny + 1, nx)
    w = f(nz, ny, nx)
    dzn = f(nz, ny, nx) * 100 + 300
    jac = f(nz, ny, nx) * 0.4 + 0.8
    winds = pk.prepare_advect_winds(
        u, v, w, 1000.0, f(nz, ny, nx + 1), f(nz, ny + 1, nx),
        f(nz, ny, nx), dzn, jac, ny, nx)
    winds = jax.block_until_ready(jax.jit(lambda: winds, static_argnums=())())
    floors = np.zeros(5, np.float32)
    adv = jax.jit(lambda q, dt: pk.advect_upwind_padded(
        q, winds, dt, floors, jnp.float32(0.0), ny, nx))
    res["advect_ms"] = timeit(adv, (qpad, jnp.float32(52.0)),
                              args.iters) * 1e3

    res["device"] = str(jax.devices()[0])
    print(json.dumps({k: (round(v, 3) if isinstance(v, float) else v)
                      for k, v in res.items()}))


if __name__ == "__main__":
    main()
