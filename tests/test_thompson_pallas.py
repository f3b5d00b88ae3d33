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


def test_inert_tile_skip_matches_full(interpret_kernels):
    """A fully dry, water-subsaturated, ice-subnucleation tile takes the
    kernel's inert fast branch (ops/thompson_kernel.py tile activity
    predicate); the jnp path computes the whole pipeline. They must
    agree: the scheme's only actions on such cells are the qv >= 1e-7
    driver floor, sub-R1 zeroing, and the th round-trip (1 ulp)."""
    nz, ny, nx = 10, 5, 11
    r = np.random.default_rng(11)
    dz = np.full((nz, ny, nx), 400.0, np.float32)
    z = np.cumsum(dz, axis=0) - 200.0
    p = (1e5 * np.exp(-z / 8000.0)).astype(np.float32)
    t = (285.0 - 0.0065 * z + r.uniform(-2, 2, (nz, ny, nx))).astype(
        np.float32)
    exner = ((p / 1e5) ** (287.04 / 1004.0)).astype(np.float32)
    qvs = np.asarray(rslf(jnp.asarray(p), jnp.asarray(t)))
    qv = (qvs * 0.3).astype(np.float32)
    # a few cells below the 1e-7 driver floor exercise the floor branch
    qv[0, 0, :3] = 3e-8
    # sub-R1 hydrometeor traces must be zeroed by both paths
    qtrace = np.where(r.uniform(size=(nz, ny, nx)) < 0.3, 5e-13,
                      0.0).astype(np.float32)
    f = jnp.asarray
    c = dict(th=f(t / exner), qv=f(qv), qc=f(qtrace), qi=f(qtrace),
             qr=f(qtrace), qs=f(qtrace), qg=f(qtrace),
             ni=f(qtrace * 1e6), nr=f(qtrace * 1e6), exner=f(exner),
             p=f(p), dz=f(dz))
    got = _run(c, 45.0, use_pallas=True)
    want = _run(c, 45.0, use_pallas=False)
    for n, g, w in zip(_OUT_NAMES, got, want):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(w), rtol=3e-7, atol=1e-30,
            err_msg=f"inert-tile skip diverges on {n}")
    # teeth: hydrometeors really were zeroed, qv really floored
    assert float(jnp.max(jnp.abs(got[2]))) == 0.0
    assert float(jnp.min(got[1])) >= 1e-7


def test_ice_supersaturated_tile_goes_active(interpret_kernels):
    """No hydrometeors and water-subsaturated, but cold with ice
    supersaturation >= 25%: the nucleation trigger
    (mp_thompson.f90:1906) must mark the tile active — both paths grow
    cloud ice from vapor."""
    nz, ny, nx = 6, 3, 7
    dz = np.full((nz, ny, nx), 400.0, np.float32)
    p = np.full((nz, ny, nx), 4e4, np.float32)
    t = np.full((nz, ny, nx), 228.0, np.float32)
    exner = ((p / 1e5) ** (287.04 / 1004.0)).astype(np.float32)
    qvsi = np.asarray(mt.rsif(jnp.asarray(p), jnp.asarray(t)))
    qv = (qvsi * 1.4).astype(np.float32)   # sati = 1.4, satw < 1
    qvs = np.asarray(rslf(jnp.asarray(p), jnp.asarray(t)))
    assert float((qv / qvs).max()) < 1.0
    z = np.zeros((nz, ny, nx), np.float32)
    f = jnp.asarray
    c = dict(th=f(t / exner), qv=f(qv), qc=f(z), qi=f(z), qr=f(z),
             qs=f(z), qg=f(z), ni=f(z), nr=f(z), exner=f(exner),
             p=f(p), dz=f(dz))
    got = _run(c, 45.0, use_pallas=True)
    want = _run(c, 45.0, use_pallas=False)
    assert float(jnp.max(got[3])) > 0.0, "kernel skipped ice nucleation"
    for n, g, w in zip(_OUT_NAMES, got, want):
        _assert_close(n, g, w)
