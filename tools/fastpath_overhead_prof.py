#!/usr/bin/env python
"""Attribution of the ridge fast-path per-interval overhead (VERDICT
r4 #6: ~33 ms at 2.5 ms/substep = 13-16% of interval wall time).

The fast interval program (core/step.fast_step) has a fixed prologue/
epilogue around its while loop:
    prologue: diagnostic_update(full=False) + quantized CFL dt
              + constant pads of the stack/p/exner/dz into the kernel
              layout + prepare_advect_winds (metric-scaled winds)
    epilogue: stack slice-back + precip accumulate
              + diagnostic_update(full=True)
Plus the non-program costs: program dispatch over the tunnel and the
donated-carry re-placement.

This probe times each piece as its own jitted program on the real
post-spinup bench state (value-fetch sync), plus a ZERO-SUBSTEP
interval (end_time = 1 ms: the while cond is false immediately), which
measures the whole fixed cost including dispatch in one number.

Usage: python tools/fastpath_overhead_prof.py [--size 500x500x20]
       [--iters 30]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, iters):
    fn()
    times = []
    for _ in range(iters):
        t0 = time.time()
        fn()
        times.append(time.time() - t0)
    times.sort()
    return times[len(times) // 2] * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", default="500x500x20")
    ap.add_argument("--iters", type=int, default=30)
    args = ap.parse_args()
    nx, ny, nz = (int(s) for s in args.size.split("x"))

    import jax
    import jax.numpy as jnp
    import numpy as np

    from bench import build_model
    from icar_tpu.core.diagnostics import compute_dt, diagnostic_update
    from icar_tpu.ops import pallas_kernels as pk

    t0 = time.time()
    model = build_model("ridge", nx, ny, nz)
    model.advance(1200.0)
    int(model._last_n)
    print(f"# spinup in {time.time() - t0:.0f}s", file=sys.stderr)

    g = model.geom
    adv = model.advect_names
    results = {}

    def fetch(x):
        leaf = jax.tree_util.tree_leaves(x)[0]
        return float(jnp.sum(leaf.ravel()[:4]))

    # zero-substep interval: the complete fixed cost (prologue + pads +
    # winds prep + epilogue + dispatch), nothing else
    def zero_interval():
        model.advance(1e-3)
        return int(model._last_n)
    results["interval_n0_total_ms"] = timeit(zero_interval, args.iters)

    # capture the state AFTER the donating advances above (the interval
    # step donates its state argument; earlier references are deleted)
    s = {k: jnp.copy(v) for k, v in model.state.items()}

    # prologue diagnostics + CFL
    @jax.jit
    def prologue(s):
        s2 = diagnostic_update(dict(s), g, full=False)
        dt = compute_dt(s2["u"], s2["v"], s2["w"],
                        np.asarray(g.dz_levels, np.float32), g.dx,
                        model.options.run.cfl_reduction_factor,
                        model.options.run.cfl_strictness)
        return s2["exner"], dt

    def p1():
        return fetch(prologue(s))
    results["prologue_diag_cfl_ms"] = timeit(p1, args.iters)

    # constant pads of the four padded operands
    @jax.jit
    def pads(s):
        q = jnp.stack([s[k] for k in adv])
        pad3 = lambda a: pk.pad_to_stack_layout(a, g.ny, g.nx, 16,
                                                mode="constant")
        return (pad3(q), pad3(s["pressure"]), pad3(s["exner"]),
                pad3(jnp.asarray(g.dz_interface)))

    def p2():
        return fetch(pads(s))
    results["stack_pads_ms"] = timeit(p2, args.iters)

    # wind/metric operand prep
    @jax.jit
    def winds(s):
        return pk.prepare_advect_winds(
            s["u"], s["v"], s["w"], g.dx, jnp.asarray(g.jacobian_u),
            jnp.asarray(g.jacobian_v), jnp.asarray(g.jacobian_w),
            jnp.asarray(g.advection_dz), jnp.asarray(g.jacobian),
            g.ny, g.nx)

    def p3():
        return fetch(winds(s))
    results["winds_prep_ms"] = timeit(p3, args.iters)

    # epilogue diagnostics (full)
    @jax.jit
    def epilogue(s):
        return diagnostic_update(dict(s), g, full=True)[
            "water_vapor_integrated"] if "water_vapor_integrated" in s \
            else diagnostic_update(dict(s), g, full=True)["u_mass"]

    def p4():
        return fetch(epilogue(s))
    results["epilogue_diag_ms"] = timeit(p4, args.iters)

    # bare dispatch of a trivial program (tunnel round trip floor)
    x = jnp.zeros((8, 128), jnp.float32)
    f = jax.jit(lambda x: x * 1.0001)

    def p5():
        return float(jnp.sum(f(x)[:1, :1]))
    results["dispatch_floor_ms"] = timeit(p5, args.iters)

    # each piece measurement carries one dispatch+fetch round trip of
    # its own — subtract the floor per piece for the device-time share
    fl = results["dispatch_floor_ms"]
    known = sum(max(results[k] - fl, 0.0)
                for k in ("prologue_diag_cfl_ms", "stack_pads_ms",
                          "winds_prep_ms", "epilogue_diag_ms")) + fl
    results["unattributed_ms"] = results["interval_n0_total_ms"] - known
    print(json.dumps({k: round(v, 2) for k, v in results.items()}))


if __name__ == "__main__":
    main()
