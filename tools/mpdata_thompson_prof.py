#!/usr/bin/env python
"""Attribution of the mpdata_thompson per-substep cost (VERDICT r4 #5).

Builds the bench-scale MPDATA+Thompson model, spins it up one interval
on the real TPU so the state carries a realistic orographic cloud, then
times the substep's pieces IN ISOLATION on that post-spinup state:

  * the stack-native Thompson step (fused core kernel + the bf16 table
    gathers + prep/index stages)
  * the Thompson table gathers alone (prep+index+gather, no core)
  * the fused MPDATA window kernel over the 9-species stack
  * the MPDATA wind/metric operand prep
  * the CFL + density prologue
  * the full substep as measured by bench.py (for the residual)

Sync is by D2H value fetch of a reduced scalar (the tunneled backend's
block_until_ready can return early; CLAUDE.md).

Usage: python tools/mpdata_thompson_prof.py [--size 500x500x20]
       [--iters 20] [--spinup 1200]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, iters):
    """Median-of-iters wall time with value-fetch sync."""
    fn()                               # warm (compile + server build)
    times = []
    for _ in range(iters):
        t0 = time.time()
        fn()
        times.append(time.time() - t0)
    times.sort()
    return times[len(times) // 2]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", default="500x500x20")
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--spinup", type=float, default=1200.0)
    args = ap.parse_args()
    nx, ny, nz = (int(s) for s in args.size.split("x"))

    import jax
    import jax.numpy as jnp
    import numpy as np

    from bench import build_model
    from icar_tpu.ops import mpdata as md
    from icar_tpu.ops import pallas_kernels as pk
    from icar_tpu.physics import mp_thompson as mt
    from icar_tpu.physics.thompson_tables import ThompsonParams

    t0 = time.time()
    model = build_model("mpdata_thompson", nx, ny, nz)
    model.advance(args.spinup)
    n = int(model._last_n)              # sync
    print(f"# spinup {args.spinup}s ({n} substeps) in "
          f"{time.time() - t0:.0f}s", file=sys.stderr)

    s = model.state
    g = model.geom
    adv_names = model.advect_names
    qstack = jnp.stack([s[k] for k in adv_names])
    exner, pres = s["exner"], s["pressure"]
    dzm = jnp.asarray(g.dz_mass)
    dzi = jnp.asarray(g.advection_dz)
    acc = jnp.zeros((ny, nx), jnp.float32)
    params = ThompsonParams()
    tables = mt._prep_tables(params)
    # tables must be DEVICE-RESIDENT for the isolated timing: the model's
    # step embeds them in its executable, but a per-call numpy pytree arg
    # re-ships ~100 MB over the tunnel every invocation (measured 370 ms
    # per call — pure transfer artifact)
    tables = jax.device_put({k: jnp.asarray(v) for k, v in tables.items()})
    from icar_tpu.physics.thompson_tables import get_tables
    _, c = get_tables(params)
    dt = jnp.float32(18.0)
    smap = mt.stack_smap(tuple(adv_names))

    def fetch(x):
        leaf = jax.tree_util.tree_leaves(x)[0]
        return float(jnp.sum(leaf.ravel()[:4]))

    results = {}

    # --- dispatch + fetch floor (tunnel round trip)
    xs = jnp.zeros((8, 128), jnp.float32)
    ftriv = jax.jit(lambda x: x * 1.0001)

    def floor_fn():
        return fetch(ftriv(xs))
    results["dispatch_floor_ms"] = timeit(floor_fn, args.iters) * 1e3

    # --- full stack-native Thompson step (kernel path)
    key = tuple(sorted(vars(params).items()))

    def th_full():
        out = mt._mp_thompson_stack_impl(
            qstack, exner, pres, dzm, dt, tables, key, smap,
            mt._kernel_mode(True))
        return fetch(out[0])
    results["thompson_stack_full_ms"] = timeit(th_full, args.iters) * 1e3

    # --- prep + index + gathers only (the XLA stage feeding the kernel)
    @jax.jit
    def gathers(qstack, exner, pres):
        th, qv, qc, qi, qr, qs_, qg, ni, nr = (qstack[i] for i in smap)
        P = mt._prep_block(th, qv, qc, qi, qr, qs_, qg, ni, nr, exner,
                           pres, c, params)
        I = mt._index_block(P, c)
        G, stacks = mt._gather_all(tables, I, jnp.float32, smalls=False,
                                   P=P)
        return stacks

    def th_gather():
        return fetch(gathers(qstack, exner, pres))
    results["thompson_prep_gathers_ms"] = timeit(th_gather,
                                                 args.iters) * 1e3

    # --- fused MPDATA kernel over the stack
    u, v, w = s["u"], s["v"], s["w"]
    ju = jnp.asarray(g.jacobian_u)
    jv = jnp.asarray(g.jacobian_v)
    jw = jnp.asarray(g.jacobian_w)
    jc = jnp.asarray(g.jacobian)

    @jax.jit
    def mpdata_k(qstack, u, v, w):
        return pk.advect_mpdata_tpu(qstack, u, v, w, g.dx, ju, jv, jw,
                                    dzi, jc, dt, 2, True)

    def mp_k():
        return fetch(mpdata_k(qstack, u, v, w))
    results["mpdata_kernel_ms"] = timeit(mp_k, args.iters) * 1e3

    # --- MPDATA operand prep alone (ghost-frame winds/metrics)
    @jax.jit
    def mp_prep(u, v, w):
        return pk.prepare_mpdata_operands(u, v, w, g.dx, ju, jv, jw,
                                          dzi, jc, ny, nx)

    def mp_p():
        return fetch(mp_prep(u, v, w))
    results["mpdata_operand_prep_ms"] = timeit(mp_p, args.iters) * 1e3

    # --- CFL + density prologue (what the general body refreshes)
    from icar_tpu.core.diagnostics import compute_dt

    @jax.jit
    def prologue(u, v, w, pres, th, ex):
        dtv = compute_dt(u, v, w,
                         np.asarray(g.dz_levels, np.float32), g.dx,
                         model.options.run.cfl_reduction_factor,
                         model.options.run.cfl_strictness)
        rho = pres / (287.058 * th * ex)
        return dtv, rho

    th_f = s["potential_temperature"]

    def prol():
        return fetch(prologue(u, v, w, pres, th_f, exner))
    results["prologue_cfl_density_ms"] = timeit(prol, args.iters) * 1e3

    # --- whole substep (bench protocol): one short interval / n
    def interval():
        model.advance(180.0)
        return int(model._last_n)
    model.advance(180.0)
    nsub = int(model._last_n)
    t0 = time.time()
    model.advance(720.0)
    n_l = int(model._last_n)
    t_l = time.time() - t0
    t0 = time.time()
    model.advance(180.0)
    n_s = int(model._last_n)
    t_s = time.time() - t0
    if n_l > n_s:
        per = (t_l - t_s) / (n_l - n_s)
        results["substep_total_ms"] = per * 1e3
        results["interval_overhead_ms"] = max(t_s - per * n_s, 0.0) * 1e3
    known = (results["thompson_stack_full_ms"]
             + results["mpdata_kernel_ms"])
    results["residual_ms"] = results.get("substep_total_ms", 0.0) - known
    print(json.dumps({k: round(v, 2) for k, v in results.items()}))


if __name__ == "__main__":
    main()
