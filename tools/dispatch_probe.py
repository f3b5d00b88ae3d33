#!/usr/bin/env python
"""Measure the per-dispatch latency of the tunneled TPU backend.

bench.py's interval_overhead_ms (the a of the t = a + b*n fit) bundles
the true program pre/post segments WITH the per-execution dispatch
round-trip of this environment's axon tunnel. This probe times a
trivial jitted program end-to-end to bound the tunnel share: whatever a
no-op costs per call is overhead no program restructuring can remove.
"""

import json
import sys
import time

import jax
import jax.numpy as jnp


def timed(f, x, n=30):
    jax.block_until_ready(f(x))
    t0 = time.time()
    for _ in range(n):
        y = f(x)
    jax.block_until_ready(y)
    return (time.time() - t0) / n * 1e3


def timed_seq(f, x, n=30):
    """Fully synchronous: block after EVERY call (no pipelining)."""
    jax.block_until_ready(f(x))
    t0 = time.time()
    for _ in range(n):
        jax.block_until_ready(f(x))
    return (time.time() - t0) / n * 1e3


def main():
    x = jnp.zeros((8, 128), jnp.float32)
    f = jax.jit(lambda x: x + 1.0)
    big = jnp.zeros((25, 20, 500, 500), jnp.float32)   # ~state-sized
    g = jax.jit(lambda x: x + 1.0)
    res = {
        "noop_pipelined_ms": round(timed(f, x), 3),
        "noop_sync_ms": round(timed_seq(f, x), 3),
        "statesize_pipelined_ms": round(timed(g, big), 3),
        "statesize_sync_ms": round(timed_seq(g, big), 3),
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(res))


if __name__ == "__main__":
    main()
