"""Horizontal + vertical interpolation look-up tables.

Host-side (numpy/scipy) LUT construction with device-side gather
application, replacing:
  * geo_reader.f90 (4-point horizontal weights, bilinear or
    triangulation/IDW variants, geo_reader.f90:51-217, 903-980)
  * vinterp.f90 (per-column 2-point vertical weights with clamped or
    extrapolating out-of-range handling, vinterp.f90:101-221)

The expensive irregular search runs once on the host; the per-forcing-step
application is a weighted gather that XLA fuses on device (SURVEY.md
section 7 'hard parts').
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple

import jax.numpy as jnp

from ..ops.indexing import take_level
import numpy as np


# ---------------------------------------------------------------------------
# horizontal geo interpolation
# ---------------------------------------------------------------------------


@dataclass
class GeoLUT:
    """4-point horizontal interpolation table: for each hi-res cell, flat
    indices into the (ny_lo*nx_lo) forcing grid and weights
    (geo_look_up_table, data_structures.f90:103-109)."""
    idx: np.ndarray      # (4, ny, nx) int32 flat indices
    w: np.ndarray        # (4, ny, nx) float32
    lo_shape: Tuple[int, int]


def _is_regular(lat2d, lon2d, tol=1e-4):
    """True when lat varies only along y and lon only along x."""
    return (np.abs(lat2d - lat2d[:, :1]).max() < tol
            and np.abs(lon2d - lon2d[:1, :]).max() < tol)


def build_geo_lut(lo_lat, lo_lon, hi_lat, hi_lon) -> GeoLUT:
    """Build the 4-point weight table from forcing (lo) to model (hi) grid.

    Regular forcing grids get exact bilinear weights (geo_reader's
    bilin_weights path); curvilinear grids use the 4-nearest
    inverse-distance variant (geo_reader.f90:193-217)."""
    ny_lo, nx_lo = lo_lat.shape
    ny, nx = hi_lat.shape

    if _is_regular(lo_lat, lo_lon):
        lat1d = lo_lat[:, 0]
        lon1d = lo_lon[0, :]
        ysign = 1 if lat1d[-1] >= lat1d[0] else -1
        xs = np.searchsorted(lon1d, hi_lon.ravel()) - 1
        xs = np.clip(xs, 0, nx_lo - 2)
        ys = np.searchsorted(lat1d[::ysign], hi_lat.ravel()) - 1
        ys = np.clip(ys, 0, ny_lo - 2)
        if ysign < 0:
            ys = ny_lo - 2 - ys
        x0 = lon1d[xs]
        y0 = lat1d[ys]
        fx = np.clip((hi_lon.ravel() - x0) / (lon1d[xs + 1] - x0), 0.0, 1.0)
        fy = np.clip((hi_lat.ravel() - y0) / (lat1d[ys + 1] - y0), 0.0, 1.0)
        i00 = ys * nx_lo + xs
        idx = np.stack([i00, i00 + 1, i00 + nx_lo, i00 + nx_lo + 1])
        w = np.stack([(1 - fy) * (1 - fx), (1 - fy) * fx,
                      fy * (1 - fx), fy * fx])
    else:
        from scipy.spatial import cKDTree
        pts = np.column_stack([lo_lat.ravel(), lo_lon.ravel()])
        tree = cKDTree(pts)
        q = np.column_stack([hi_lat.ravel(), hi_lon.ravel()])
        dist, idx = tree.query(q, k=4)
        dist = np.maximum(dist, 1e-12)
        w = (1.0 / dist)
        w = w / w.sum(axis=1, keepdims=True)
        idx = idx.T
        w = w.T

    return GeoLUT(idx=idx.reshape(4, ny, nx).astype(np.int32),
                  w=w.reshape(4, ny, nx).astype(np.float32),
                  lo_shape=(ny_lo, nx_lo))


def geo_interp(data_lo, lut: GeoLUT):
    """Apply the geo LUT (geo_interp/geo_interp2d, geo_reader.f90:1069-1204).

    data_lo: (..., ny_lo, nx_lo) -> (..., ny_hi, nx_hi). Any leading dims."""
    flat = jnp.reshape(data_lo, data_lo.shape[:-2] + (-1,))
    idx = jnp.asarray(lut.idx)
    w = jnp.asarray(lut.w)
    out = 0.0
    for p in range(4):
        out = out + flat[..., idx[p]] * w[p]
    return out


# ---------------------------------------------------------------------------
# vertical interpolation
# ---------------------------------------------------------------------------


@dataclass
class VertLUT:
    """Per-cell 2-point vertical interpolation (vert_look_up_table,
    data_structures.f90:114-120)."""
    k1: np.ndarray     # (nz_hi, ny, nx) int32
    k2: np.ndarray
    w1: np.ndarray     # (nz_hi, ny, nx) float32 (w2 = 1 - w1)


def build_vlut(hi_z: np.ndarray, lo_z: np.ndarray,
               extrapolate: bool = True) -> VertLUT:
    """Bracketing levels + weights to interpolate a field on ``lo_z`` levels
    to ``hi_z`` levels, per column (vLUT/vLUT_forcing, vinterp.f90:101-221).

    ``extrapolate``: linear extrapolation outside the source column
    (vLUT_forcing behavior); otherwise clamp with 0.5/0.5 weights (vLUT)."""
    nz_hi = hi_z.shape[0]
    nz_lo = lo_z.shape[0]
    # pos = number of lo levels strictly below the target
    pos = (lo_z[None, :, :, :] < hi_z[:, None, :, :]).sum(axis=1)

    inside = (pos >= 1) & (pos <= nz_lo - 1)
    below = pos < 1
    above = pos > nz_lo - 1

    k1 = np.clip(pos - 1, 0, nz_lo - 2)
    k2 = k1 + 1
    z1 = np.take_along_axis(np.broadcast_to(lo_z[None], (nz_hi,) + lo_z.shape),
                            k1[:, None], axis=1)[:, 0]
    z2 = np.take_along_axis(np.broadcast_to(lo_z[None], (nz_hi,) + lo_z.shape),
                            k2[:, None], axis=1)[:, 0]
    with np.errstate(divide="ignore", invalid="ignore"):
        w1 = (z2 - hi_z) / np.where(z2 == z1, 1.0, z2 - z1)

    if extrapolate:
        # out-of-range weights fall out of the same formula with the edge
        # bracketing pair (can exceed [0,1] -> linear extrapolation)
        pass
    else:
        w1 = np.where(below | above, 0.5, w1)
        k1 = np.where(below, 0, k1)
        k2 = np.where(below, 0, k2)
        k1 = np.where(above, nz_lo - 1, k1)
        k2 = np.where(above, nz_lo - 1, k2)

    return VertLUT(k1=k1.astype(np.int32), k2=k2.astype(np.int32),
                   w1=w1.astype(np.float32))


def vinterp(data_lo, lut: VertLUT):
    """Apply the vertical LUT (vinterp, vinterp.f90:223-318):
    data_lo (nz_lo, ny, nx) -> (nz_hi, ny, nx)."""
    k1 = jnp.asarray(lut.k1)
    k2 = jnp.asarray(lut.k2)
    w1 = jnp.asarray(lut.w1)
    d1 = take_level(data_lo, k1)
    d2 = take_level(data_lo, k2)
    return w1 * d1 + (1 - w1) * d2


# ---------------------------------------------------------------------------
# wind smoothing during interpolation (domain_obj.f90:2709+)
# ---------------------------------------------------------------------------


def smooth_horizontal(a, n: int):
    """(2n+1)-point box smoothing over the last two dims with replicate
    padding — applied to u/v during forcing interpolation
    (smooth_wind_distance, domain_obj.f90:2152-2154, 2709)."""
    if n <= 0:
        return a
    from ..ops.linear_winds import _box_smooth_2d
    return _box_smooth_2d(a, n)


# longitude coordinate systems (icar_constants.f90:328-331)
LON_MAINTAIN = 0
LON_PRIME_CENTERED = 1        # 0..360
LON_DATELINE_CENTERED = 2     # -180..180
LON_GUESS = 3


def standardize_longitudes(lon, system: int):
    """Convert a longitude array to the requested coordinate system
    (standardize_coordinates, geo_reader.f90:1242-1263). NOTE the
    reference's constant names are swapped relative to their behavior:
    kDATELINE_CENTERED maps into 0..360 and kPRIME_CENTERED into
    -180..180; the behavior (not the naming) is reproduced."""
    lon = np.asarray(lon, np.float64).copy()
    if system == LON_MAINTAIN:
        return lon
    if system == LON_DATELINE_CENTERED:
        lon[lon < 0] += 360.0
    elif system == LON_PRIME_CENTERED:
        lon[lon > 180] -= 360.0
    elif system == LON_GUESS:
        lon[lon > 180] -= 360.0
        if lon.min() < -150 or lon.max() > 150:
            lon[lon < 0] += 360.0
    else:
        raise ValueError(
            f"unknown longitude_system {system}; use 0 (maintain), "
            "1 (0..360), 2 (-180..180) or 3 (guess)")
    return lon
