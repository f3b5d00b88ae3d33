"""Thompson fused-core Pallas kernel equivalence (VERDICT r3 item #1).

The TPU production path runs the Thompson core (prep + rates +
conservation + TAU+1 update + condensation + rain evaporation + terminal
velocities) as one fused Pallas kernel (ops/thompson_kernel.py). Here the
kernel runs through the Pallas interpreter on CPU and is asserted
equivalent to the jnp reference path. Both paths execute the SAME
single-source block functions (mp_thompson._prep_block/_core_block) —
this test guards the kernel plumbing: operand order, tiling/tail
masking, the pre-gathered-table interface, and the recomputation seams
(prep per tile, post-core temperature)."""

import numpy as np
import pytest

import jax.numpy as jnp

from icar_tpu.ops import pallas_kernels as pk
from icar_tpu.physics import mp_thompson as mt
from icar_tpu.physics.mp_thompson import mp_thompson, rslf


@pytest.fixture()
def interpret_kernels():
    prev = pk.force_interpret(True)
    yield
    pk.force_interpret(prev)


def _mixed_state(seed, nz=20, ny=7, nx=13):
    """Randomized columns spanning warm rain, mixed-phase and glaciated
    regimes with every species present somewhere."""
    r = np.random.default_rng(seed)
    dz = np.full((nz, ny, nx), 400.0, np.float32)
    z = np.cumsum(dz, axis=0) - 200.0
    p = (1e5 * np.exp(-z / 8000.0)).astype(np.float64)
    t_sfc = r.uniform(250.0, 300.0, (ny, nx))
    t = t_sfc[None] - 0.0065 * z + r.uniform(-3, 3, (nz, ny, nx))
    exner = (p / 1e5) ** (287.04 / 1004.0)
    qvs = np.asarray(rslf(jnp.asarray(p, jnp.float32),
                          jnp.asarray(t, jnp.float32)))
    qv = qvs * r.uniform(0.3, 1.3, (nz, ny, nx))

    def hydro(scale):
        q = r.uniform(0, scale, (nz, ny, nx))
        return np.where(r.uniform(size=q.shape) < 0.6, q, 0.0)

    f = lambda a: jnp.asarray(a, jnp.float32)
    return dict(
        th=f(t / exner), qv=f(qv), qc=f(hydro(1.5e-3)),
        qi=f(hydro(3e-4)), qr=f(hydro(1e-3)), qs=f(hydro(8e-4)),
        qg=f(hydro(5e-4)), ni=f(hydro(1e6)), nr=f(hydro(5e6)),
        exner=f(exner), p=f(p), dz=f(dz))


def _run(c, dt, use_pallas):
    acc = jnp.zeros(c["p"].shape[1:], jnp.float32)
    return mp_thompson(c["th"], c["qv"], c["qc"], c["qi"], c["qr"],
                       c["qs"], c["qg"], c["ni"], c["nr"], c["exner"],
                       c["p"], c["dz"], np.float32(dt), acc, acc, acc,
                       use_pallas=use_pallas)


_OUT_NAMES = ("th", "qv", "qc", "qi", "qr", "qs", "qg", "ni", "nr",
              "rain", "snow", "graupel")


def _assert_close(name, g, w):
    """Both paths run the SAME block functions, so differences come only
    from XLA-vs-interpreter fusion (FMA) noise — tiny almost everywhere,
    but a cell sitting exactly on a where-branch threshold can flip the
    branch outright (e.g. `gone_i` zeroing ice number on one path only).
    Bound the FRACTIONS: bulk of cells at 1e-4 relative, <=0.2% may
    diverge by more than 1% (branch flips). A plumbing bug (wrong
    operand order, bad tile indexing) mismatches essentially every
    wet cell and fails both bounds."""
    g, w = np.asarray(g), np.asarray(w)
    atol = 1e-12 + 1e-6 * float(np.abs(w).max())
    rel = np.abs(g - w) / (np.abs(w) + atol)
    frac_tight = float(np.mean(rel > 1e-4))
    assert frac_tight < 0.02, \
        f"{name}: {frac_tight:.2%} of cells outside the tight tolerance"
    frac_flip = float(np.mean(rel > 1e-2))
    assert frac_flip <= 0.002, \
        f"{name}: {frac_flip:.2%} of cells flipped branches"


@pytest.mark.parametrize("seed,dt", [(1, 30.0), (2, 90.0), (3, 150.0)])
def test_thompson_core_kernel_equivalence(interpret_kernels, seed, dt):
    """Kernel (interpreted) vs jnp reference on mixed-regime columns;
    dt=150 also exercises the >120 s warm-collection rerouting branch.
    The domain (7x13 -> M=91 < tile width) exercises tail-lane
    masking/clipping."""
    c = _mixed_state(seed)
    assert mt._kernel_mode(True) == "interpret"
    got = _run(c, dt, use_pallas=True)
    want = _run(c, dt, use_pallas=False)
    for n, g, w in zip(_OUT_NAMES, got, want):
        _assert_close(n, g, w)


def test_thompson_core_kernel_multi_tile(interpret_kernels):
    """M spanning several lane tiles (forces the grid loop + block
    indexing through the stacked gather operands)."""
    c = _mixed_state(7, nz=16, ny=9, nx=37)
    got = _run(c, 60.0, use_pallas=True)
    want = _run(c, 60.0, use_pallas=False)
    for n, g, w in zip(_OUT_NAMES, got, want):
        _assert_close(n, g, w)


def test_kernel_path_actually_dispatches(interpret_kernels, monkeypatch):
    """Guard against the dispatch silently falling back to jnp: the
    kernel call site must be reached when interpret mode is forced."""
    from icar_tpu.ops import thompson_kernel

    calls = []
    real = thompson_kernel.thompson_core_call

    def spy(*a, **k):
        calls.append(1)
        return real(*a, **k)

    monkeypatch.setattr(thompson_kernel, "thompson_core_call", spy)
    mt._mp_thompson_impl.clear_cache()
    c = _mixed_state(11, nz=8, ny=3, nx=5)
    _run(c, 30.0, use_pallas=True)
    assert calls, "thompson_core_call was never invoked"
    mt._mp_thompson_impl.clear_cache()


def test_kernel_disabled_off_tpu():
    """Without forced interpret mode on CPU the dispatch must pick the
    jnp reference path (the kernel is TPU-only in production)."""
    assert mt._kernel_mode(True) is None
    assert mt._kernel_mode(False) is None
