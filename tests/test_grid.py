"""Grid decomposition + vertical coordinate tests.

Mirrors test_caf_one_d_decomposition.f90 / test_caf_other_image_grids.f90
(decomposition index math) and validates the terrain-following coordinate
invariants from setup_simple_z / setup_sleve."""

import numpy as np
import pytest

from icar_tpu.config import Options
from icar_tpu.grid import (
    Geometry, build_geometry, decompose_images, find_flat_model_level, my_n,
    my_start, offset_x, offset_y, smooth_array, tile_info,
)


def ridge_terrain(ny=40, nx=60, height=1000.0):
    x = np.linspace(0, np.pi, nx)
    return (height * np.sin(x) ** 2)[None, :] * np.ones((ny, 1))


def latlon(ny, nx, dx=1000.0):
    lat0, lon0 = 39.5, -105.0
    mper_deg = 111320.0
    lat = lat0 + np.arange(ny)[:, None] * dx / mper_deg * np.ones((1, nx))
    lon = lon0 + np.arange(nx)[None, :] * dx / (mper_deg * np.cos(np.radians(lat0))) * np.ones((ny, 1))
    return lat, lon


def default_options(nz=10, ny=40, nx=60):
    o = Options()
    o.domain.nx, o.domain.ny, o.domain.nz = nx, ny, nz
    o.domain.dx = 1000.0
    o.domain.dz_levels = [50.0, 75.0, 125.0, 200.0, 300.0] + [400.0] * (nz - 5)
    return o


# --- decomposition ---------------------------------------------------------

def test_decompose_images_products():
    for n in [1, 2, 3, 4, 6, 8, 12, 16, 64, 128]:
        xi, yi = decompose_images(n, 300, 20)
        assert xi * yi == n
        # wide domain should put more images along x
        assert xi >= yi


def test_decompose_square():
    xi, yi = decompose_images(16, 500, 500)
    assert (xi, yi) == (4, 4)


def test_my_n_my_start_cover_domain():
    for n_global in [7, 100, 500, 33]:
        for nimg in [1, 2, 3, 8]:
            total = sum(my_n(n_global, i, nimg) for i in range(nimg))
            assert total == n_global
            pos = 0
            for i in range(nimg):
                assert my_start(n_global, i, nimg) == pos
                pos += my_n(n_global, i, nimg)


def test_tile_info_staggered_extra():
    # last image along x gets the extra staggered column (grid_obj.f90:160-193)
    t = tile_info(4, 3, nx=100, ny=10, nz=5, nx_extra=1)
    assert t.xte == 101
    t0 = tile_info(4, 0, nx=100, ny=10, nz=5, nx_extra=1)
    assert t0.xte - t0.xts == 25


# --- staggering helpers ----------------------------------------------------

def test_offset_linear_exact():
    a = np.arange(12, dtype=np.float64).reshape(3, 4)
    ox = offset_x(a)
    assert ox.shape == (3, 5)
    # midpoints exact, ends linearly extrapolated
    np.testing.assert_allclose(ox[:, 1:-1], (a[:, :-1] + a[:, 1:]) / 2)
    np.testing.assert_allclose(ox[:, 0], a[:, 0] - 0.5)
    np.testing.assert_allclose(ox[:, -1], a[:, -1] + 0.5)
    oy = offset_y(a)
    assert oy.shape == (4, 4)


def test_smooth_array_matches_uniform_filter():
    from scipy.ndimage import uniform_filter
    rng = np.random.default_rng(0)
    a = rng.normal(size=(30, 40))
    for w in [1, 2, 4]:
        got = smooth_array(a, w)
        want = uniform_filter(a, size=2 * w + 1, mode="nearest")
        np.testing.assert_allclose(got, want, atol=1e-10)
    # constant field is unchanged
    c = np.full((20, 20), 3.5)
    np.testing.assert_allclose(smooth_array(c, 3, cycles=5), c)


# --- flat level ------------------------------------------------------------

def test_find_flat_model_level():
    dz = np.array([50.0, 75, 125, 200, 300, 400] + [500] * 14)
    nz = 20
    # meters above mean terrain: climbs until height exceeds target
    # 50+75+125+200+300 = 750 <= 1000 so level 6 is still added (h -> 1150)
    assert find_flat_model_level(1000.0, nz, dz) == 6
    # <= 0: counts down from model top
    assert find_flat_model_level(0, nz, dz) == 20
    assert find_flat_model_level(-5, nz, dz) == 15
    # in (0, nz]: literal level count
    assert find_flat_model_level(12, nz, dz) == 12


# --- simple z --------------------------------------------------------------

def test_simple_z_flat_terrain():
    o = default_options()
    terrain = np.zeros((o.domain.ny, o.domain.nx))
    lat, lon = latlon(o.domain.ny, o.domain.nx)
    g = build_geometry(terrain, lat, lon, o)
    np.testing.assert_allclose(g.jacobian, 1.0, atol=1e-6)
    dz = np.asarray(o.domain.dz_levels)
    np.testing.assert_allclose(g.z_interface[-1], dz.sum(), rtol=1e-6)
    np.testing.assert_allclose(g.dz_interface[3], 200.0, rtol=1e-6)


def test_simple_z_space_varying():
    o = default_options(nz=10)
    o.domain.flat_z_height = -3  # top 3 levels flat
    terrain = ridge_terrain()
    lat, lon = latlon(*terrain.shape)
    g = build_geometry(terrain, lat, lon, o)
    max_level = 7
    H = sum(o.domain.dz_levels[:max_level])
    # z_interface at the flat level must be constant == smooth height
    np.testing.assert_allclose(g.z_interface[max_level], H, rtol=1e-5)
    assert g.smooth_height == pytest.approx(H)
    # jacobian compresses over the ridge, = 1 above the flat level
    assert g.jacobian[0].min() < 0.7
    np.testing.assert_allclose(g.jacobian[8], 1.0, atol=1e-6)
    # dz_mass/dz_interface consistency: z increases monotonically
    assert (np.diff(g.z, axis=0) > 0).all()
    assert (g.dz_interface > 0).all()
    # first mass level is half a (compressed) dz above the terrain
    np.testing.assert_allclose(g.z[0], terrain + g.dz_interface[0] / 2, rtol=1e-5)


def test_jacobian_staggering_shapes():
    o = default_options(nz=10)
    o.domain.flat_z_height = -3
    terrain = ridge_terrain()
    lat, lon = latlon(*terrain.shape)
    g = build_geometry(terrain, lat, lon, o)
    nz, ny, nx = 10, 40, 60
    assert g.jacobian_u.shape == (nz, ny, nx + 1)
    assert g.jacobian_v.shape == (nz, ny + 1, nx)
    assert g.jacobian_w.shape == (nz, ny, nx)
    assert g.dzdx.shape == (nz, ny, nx + 1)
    assert g.dzdy.shape == (nz, ny + 1, nx)
    # interior jacobian_u midpoint identity
    np.testing.assert_allclose(
        g.jacobian_u[:, :, 1:-1], (g.jacobian[:, :, 1:] + g.jacobian[:, :, :-1]) / 2,
        rtol=1e-6)
    # dzdx is zero at the domain edges, nonzero over the ridge flank
    np.testing.assert_allclose(g.dzdx[:, :, 0], 0.0)
    assert np.abs(g.dzdx[0, :, nx // 4]).max() > 0.01


# --- SLEVE -----------------------------------------------------------------

def test_sleve_invariants():
    o = default_options(nz=15)
    o.domain.dz_levels = [500.0] * 15
    o.domain.sleve = True
    o.domain.flat_z_height = 0  # flat at model top
    o.domain.decay_rate_l_topo = 2.0
    o.domain.decay_rate_s_topo = 5.0
    o.domain.sleve_n = 1.35
    terrain = ridge_terrain(height=1500.0)
    lat, lon = latlon(*terrain.shape)
    g = build_geometry(terrain, lat, lon, o)
    # bottom interface is the terrain; top is flat
    np.testing.assert_allclose(g.z_interface[0], terrain, rtol=1e-6)
    np.testing.assert_allclose(g.z_interface[-1], g.smooth_height, rtol=1e-4)
    assert (g.dz_interface > 0).all()
    # terrain influence decays with height: level compression at the surface
    # exceeds compression aloft over the ridge crest
    crest = np.unravel_index(np.argmax(terrain), terrain.shape)
    col = g.dz_interface[:, crest[0], crest[1]]
    assert col[0] < col[-1]
    # h1 + h2 reconstruct the terrain
    np.testing.assert_allclose(g.h1 + g.h2, terrain, rtol=1e-6, atol=1e-6)


def test_rotation_regular_grid():
    lat, lon = latlon(40, 60)
    o = default_options()
    terrain = np.zeros((40, 60))
    g = build_geometry(terrain, lat, lon, o)
    np.testing.assert_allclose(g.costheta, 1.0, atol=1e-4)
    np.testing.assert_allclose(g.sintheta, 0.0, atol=1e-4)
