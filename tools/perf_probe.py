#!/usr/bin/env python
"""Cost-analysis probe for the ridge interval step (no execution).

Lowers + client-compiles the 500^2 ridge step against the real TPU
pipeline (fast: the server-side program build only happens at first
execution) and prints XLA's bytes-accessed plus the largest
buffer-traffic contributors from the optimized HLO. The iteration loop
for roofline work: edit core/step.py / ops/pallas_kernels.py, re-run
this, watch bytes drop — no TPU execution needed.

Usage: python tools/perf_probe.py [--size 500x500x20] [--config ridge]
       [--hlo out.txt]
"""

import argparse
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", default="500x500x20")
    ap.add_argument("--config", default="ridge")
    ap.add_argument("--hlo", default=None, help="dump optimized HLO here")
    ap.add_argument("--top", type=int, default=25)
    args = ap.parse_args()
    nx, ny, nz = (int(s) for s in args.size.split("x"))

    import jax.numpy as jnp

    from bench import build_model

    t0 = time.time()
    model = build_model(args.config, nx, ny, nz)
    if model._step_fn is None:
        model._build_step()
    print(f"# setup {time.time()-t0:.1f}s", file=sys.stderr)

    t0 = time.time()
    lowered = model._step_fn.lower(model.state, model._dqdt,
                                   jnp.float32(0.0), jnp.float32(1200.0),
                                   model._time_aux(), model.geom_args())
    compiled = lowered.compile()
    print(f"# lower+compile {time.time()-t0:.1f}s", file=sys.stderr)

    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0]
    print(f"bytes_accessed_total: {ca.get('bytes accessed', 0)/1e9:.3f} GB")

    hlo = compiled.as_text()
    if args.hlo:
        with open(args.hlo, "w") as f:
            f.write(hlo)

    # crude per-op traffic attribution: sum operand+result sizes of the
    # big ops (fusions, copies, custom-calls) in the entry + while-body
    def shape_bytes(sig: str) -> int:
        total = 0
        for m in re.finditer(r"(f32|s32|f64|pred|bf16|u32)\[([0-9,]*)\]",
                             sig):
            dt, dims = m.groups()
            n = 1
            for d in dims.split(","):
                if d:
                    n *= int(d)
            total += n * (1 if dt == "pred" else 8 if dt == "f64" else
                          2 if dt == "bf16" else 4)
        return total

    ops = []
    for line in hlo.splitlines():
        line = line.strip()
        m = re.match(r"(%?[\w.\-]+) = (.+?) (copy|fusion|custom-call|"
                     r"while|conditional|all-reduce|collective-permute|"
                     r"dynamic-slice|dynamic-update-slice|slice|pad|"
                     r"concatenate|broadcast|transpose|reshape)\(", line)
        if not m:
            continue
        name, outsig, kind = m.groups()
        b = shape_bytes(outsig)
        if kind == "while":
            continue
        ops.append((b, kind, name, line[:160]))
    ops.sort(reverse=True)
    print(f"# top {args.top} ops by RESULT bytes (optimized HLO):")
    for b, kind, name, line in ops[:args.top]:
        print(f"{b/1e6:9.1f} MB  {kind:18s} {name}")


if __name__ == "__main__":
    main()
