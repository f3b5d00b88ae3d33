"""RRTMG external-data contract (VERDICT r1 item #7).

tools/make_rrtmg_fixtures.py derives the exact per-band file/variable/
shape inventory by parsing the reference source (lw_kgb01..16,
ra_rrtmg_lw.f90:13086+; sw_kgb16..29, ra_rrtmg_sw.f90) and writes
reference-layout fixtures: the numpy layout of each variable is the
REVERSE of its Fortran declaration, because io_read{N}d allocates its
target with the file dims in Fortran order (io_routines.f90:407).

These tests prove get_lw_tables/get_sw_tables against those files — not
only against synthetic injections — closing the loader shape/naming
contract gap."""

import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def fixture_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("rrtmg_support")
    sys.path.insert(0, os.path.join(REPO, "tools"))
    from make_rrtmg_fixtures import collect_inventory, write_fixtures
    ref = "/root/reference"
    if not os.path.isdir(ref):
        pytest.skip("reference tree not available")
    lw = collect_inventory(
        os.path.join(ref, "src/physics/ra_rrtmg_lw.f90"), "l")
    sw = collect_inventory(
        os.path.join(ref, "src/physics/ra_rrtmg_sw.f90"), "s")
    n = write_fixtures(str(d), lw + sw, seed=3)
    assert n > 200, "fixture inventory suspiciously small"
    return str(d)


def test_inventory_covers_every_reference_read(fixture_dir):
    """One fixture file exists for every io_read in the kgb loaders."""
    import re
    names = set(os.listdir(fixture_dir))
    for f90 in ("ra_rrtmg_lw.f90", "ra_rrtmg_sw.f90"):
        src = open(os.path.join("/root/reference/src/physics", f90)).read()
        for m in re.finditer(r'io_read[0-4]d\("rrtmg_support/'
                             r'([a-zA-Z0-9_]+\.nc)"', src):
            assert m.group(1) in names, f"missing fixture {m.group(1)}"


def test_lw_loader_reads_reference_layout(fixture_dir):
    from icar_tpu.physics import rrtmg_lw_tables as lwt

    bands = lwt.load_lw_tables(fixture_dir)
    ref_shapes = lwt.synthetic_lw_tables()
    assert len(bands) == lwt.NBANDS
    for b, (got, want) in enumerate(zip(bands, ref_shapes), start=1):
        for key, w in want.items():
            assert key in got, f"band {b}: loader missing {key}"
            assert np.shape(got[key]) == np.shape(w), (
                f"band {b} {key}: loaded shape {np.shape(got[key])} != "
                f"expected {np.shape(w)}")
            assert np.isfinite(got[key]).all()
            assert np.asarray(got[key]).min() >= 0.0


def test_sw_loader_reads_reference_layout(fixture_dir):
    from icar_tpu.physics import rrtmg_sw_tables as swt

    bands = swt.load_sw_tables(fixture_dir)
    ref_shapes = swt.synthetic_sw_tables()
    assert len(bands) == swt.NBANDS
    for b, (got, want) in enumerate(zip(bands, ref_shapes), start=1):
        for key, w in want.items():
            assert key in got, f"band {b}: loader missing {key}"
            if np.isscalar(w) or np.ndim(w) == 0:
                assert np.isscalar(got[key]) or np.ndim(got[key]) == 0
            else:
                assert np.shape(got[key]) == np.shape(w), (
                    f"band {b} {key}: loaded shape "
                    f"{np.shape(got[key])} != expected {np.shape(w)}")


def test_lw_driver_runs_on_fixture_tables(fixture_dir):
    """The radiation driver consumes fixture-loaded tables end to end."""
    import jax.numpy as jnp

    from icar_tpu.physics import rrtmg_lw as lw
    from icar_tpu.physics import rrtmg_lw_tables as lwt

    tables = lw.pack_tables(lwt.load_lw_tables(fixture_dir)) \
        if hasattr(lw, "pack_tables") else lwt.load_lw_tables(fixture_dir)
    nz, ny, nx = 10, 2, 3
    import numpy as _np
    z = _np.cumsum(_np.full(nz, 500.0)) - 250.0
    p = (101325.0 * _np.exp(-z / 8000.0))[:, None, None] \
        * _np.ones((nz, ny, nx))
    t = (288.0 - 0.0065 * z)[:, None, None] * _np.ones((nz, ny, nx))
    f = lambda a: jnp.asarray(a, jnp.float32)
    p_i = _np.concatenate([p[:1] * 1.02, 0.5 * (p[:-1] + p[1:])], axis=0)
    t_i = _np.concatenate([t[:1] + 1, 0.5 * (t[:-1] + t[1:])], axis=0)
    zero = f(_np.zeros((nz, ny, nx)))
    import jax
    key = jax.random.PRNGKey(0)
    out = lw.rrtmg_lw_driver(
        tables, key, f(p), f(p_i), f(t), f(t_i), f(t[0] + 1.0),
        f(_np.full((nz, ny, nx), 5e-3)), zero, zero, zero, zero,
        f(_np.full((nz, ny, nx), 10e-6)), f(_np.full((nz, ny, nx), 30e-6)),
        f(_np.full((nz, ny, nx), 50e-6)),
        f(p / (287.0 * t)), f(_np.full((nz, ny, nx), 500.0)),
        f(_np.full((ny, nx), 0.95)), f((p / 100000.0) ** 0.286))
    th_tend, glw, olr, lwcf = out
    assert np.isfinite(np.asarray(glw)).all()
    assert np.asarray(glw).min() > 0.0, "downwelling LW must be positive"
    assert np.isfinite(np.asarray(th_tend)).all()
