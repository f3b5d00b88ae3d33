"""User tooling: quick-look plotting and restart chaining
(reference: helpers/bin/plot_icar.py, helpers/setup_next_run.py)."""

import os
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(script, *args):
    return subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", script), *args],
        capture_output=True, text=True,
        env={**os.environ, "JAX_PLATFORMS": "cpu"})


def test_plot_icar_quicklook(tmp_path):
    from icar_tpu.io.netcdf import NCFile

    ny, nx = 12, 16
    path = str(tmp_path / "out.nc")
    lat = np.linspace(40, 41, ny)[:, None] + np.zeros((ny, nx))
    lon = np.linspace(-105, -104, nx)[None, :] + np.zeros((ny, nx))
    with NCFile(path, "w") as f:
        f.create_dim("time", 2, unlimited=True)
        f.create_dim("y", ny)
        f.create_dim("x", nx)
        f.create_dim("z", 3)
        f.create_var("lat", ("y", "x"), lat.astype(np.float32))
        f.create_var("lon", ("y", "x"), lon.astype(np.float32))
        f.create_var("precipitation", ("time", "y", "x"),
                     np.random.rand(2, ny, nx).astype(np.float32))
        f.create_var("cloud_water", ("time", "z", "y", "x"),
                     np.random.rand(2, 3, ny, nx).astype(np.float32) * 1e-4)

    png = str(tmp_path / "map.png")
    r = _run("plot_icar.py", path, "-v", "precipitation", "-v", "cloud_water",
             "-v", "not_a_var", "-o", png)
    assert r.returncode == 0, r.stderr
    assert "not_a_var" in r.stderr          # unknown var warned, not fatal
    assert os.path.getsize(png) > 1000


def test_setup_next_run_chains_restart(tmp_path):
    nml = tmp_path / "options.nml"
    nml.write_text(f"""&model_version
    version = "2.1",
/
&physics
    mp = 2,
/
&parameters
    start_date = "2020-12-01 00:00:00",
    end_date = "2020-12-01 03:00:00",
    nz = 5,
    dz_levels = 200.0, 200.0, 200.0, 200.0, 200.0,
/
&output_list
    restart_file = "{tmp_path}/rst_",
    names = "precipitation",
/
""")
    # no checkpoints yet -> refuses
    r = _run("setup_next_run.py", str(nml))
    assert r.returncode == 1

    for t in (3600, 7200, 10800):
        np.savez(tmp_path / f"rst_{t:08d}.npz", t=np.float64(t))
    # -s 1 deletes the newest checkpoint and resumes from the previous one
    r = _run("setup_next_run.py", str(nml), "-s", "1")
    assert r.returncode == 0, r.stderr
    assert "rst_00007200.npz" in r.stdout
    assert not (tmp_path / "rst_00010800.npz").exists()

    text = nml.read_text()
    assert "restart = .True.," in text
    from icar_tpu.config import Options
    o = Options.from_namelist(str(nml))
    assert o.run.restart is True


def test_aggregate_output_merges_steps(tmp_path):
    """classic-async per-step files -> one time-series file
    (analog of helpers/aggregate_parallel_files.py)."""
    from icar_tpu.io.async_writer import AsyncNCWriter
    from icar_tpu.io.netcdf import NCFile

    w = AsyncNCWriter()
    for t in (0.0, 600.0, 1200.0):
        w.write(str(tmp_path / f"out_{int(t):08d}.nc"),
                {"precipitation": (("y", "x"),
                                   np.full((4, 5), t, np.float32))},
                {"model_time": str(t), "dx": "1000.0"})
    assert w.wait() == 0
    w.close()

    out = str(tmp_path / "combined.nc")
    r = _run("aggregate_output.py", str(tmp_path / "out_*.nc"), "-o", out)
    assert r.returncode == 0, r.stderr
    with NCFile(out) as f:
        pr = f.read("precipitation")
        assert pr.shape == (3, 4, 5)
        np.testing.assert_allclose(pr[:, 0, 0], [0.0, 600.0, 1200.0])
        np.testing.assert_allclose(f.read("model_time"), [0, 600, 1200])
