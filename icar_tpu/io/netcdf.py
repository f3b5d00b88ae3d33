"""Minimal NetCDF-4 file IO built on h5py.

Replaces the reference's NetCDF-Fortran wrapper (/root/reference/src/io/
io_routines.f90). NetCDF-4 files ARE HDF5 files following a convention
(dimension scales + a few bookkeeping attributes), so h5py can both read
files produced by other NetCDF tools and write files that netCDF4-python /
xarray open cleanly. Supports the subset ICAR IO needs: nD variables with
named dimensions, attributes, and an unlimited-style time dimension
(emulated by extensible datasets).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import numpy as np

try:
    import h5py
except ImportError:  # pragma: no cover
    h5py = None


class NCFile:
    """A NetCDF-4 (HDF5) file handle."""

    def __init__(self, path: str, mode: str = "r"):
        if h5py is None:
            raise RuntimeError("h5py is required for NetCDF IO")
        self.path = path
        self.f = h5py.File(path, mode)
        self._dims: Dict[str, int] = {}
        if mode == "r":
            for name, ds in self.f.items():
                if isinstance(ds, h5py.Dataset) and ds.attrs.get("CLASS") == b"DIMENSION_SCALE":
                    self._dims[name] = ds.shape[0]

    # -- writing -----------------------------------------------------------
    def create_dim(self, name: str, size: int, unlimited: bool = False):
        if name in self.f:
            ds = self.f[name]
            if ds.attrs.get("CLASS") == b"DIMENSION_SCALE":
                self._dims[name] = ds.shape[0]
                return
            raise ValueError(
                f"dimension name {name!r} collides with an existing "
                "variable in the file")
        maxshape = (None,) if unlimited else (size,)
        ds = self.f.create_dataset(name, shape=(size,), maxshape=maxshape,
                                   dtype="f8")
        ds[...] = np.arange(size, dtype=np.float64)
        ds.make_scale(name)
        ds.attrs["axis_placeholder"] = 1
        self._dims[name] = size

    def create_var(self, name: str, dims: Sequence[str], data: np.ndarray,
                   attrs: Optional[Dict] = None, dtype=None):
        data = np.asarray(data)
        for d, n in zip(dims, data.shape):
            if d not in self._dims:
                self.create_dim(d, n, unlimited=(d == "time"))
        if len(dims) == 1 and name == dims[0]:
            # coordinate variable: store values in the dimension-scale
            # dataset itself (netCDF convention) instead of a new dataset
            ds = self.f[name]
            if ds.shape[0] != data.shape[0]:
                ds.resize((data.shape[0],))
            ds[...] = data
            ds.attrs.pop("axis_placeholder", None)
            if attrs:
                for k, v in attrs.items():
                    ds.attrs[k] = v
            return ds
        maxshape = tuple(None if d == "time" else self._dims[d] for d in dims)
        ds = self.f.create_dataset(name, data=data, maxshape=maxshape,
                                   dtype=dtype or data.dtype,
                                   compression=None)
        for i, d in enumerate(dims):
            ds.dims[i].attach_scale(self.f[d])
        if attrs:
            for k, v in attrs.items():
                ds.attrs[k] = v
        return ds

    def append_time_slice(self, name: str, data: np.ndarray):
        """Grow a variable (and the time scale) along its first dim."""
        ds = self.f[name]
        n = ds.shape[0]
        ds.resize(n + 1, axis=0)
        ds[n] = data
        tdim = self.f["time"]
        if tdim.shape[0] < n + 1:
            tdim.resize(n + 1, axis=0)
            tdim[n] = n
        self._dims["time"] = max(self._dims.get("time", 0), n + 1)

    def set_attrs(self, attrs: Dict):
        for k, v in attrs.items():
            self.f.attrs[k] = v

    # -- reading -----------------------------------------------------------
    def variables(self) -> List[str]:
        out = []
        for name, ds in self.f.items():
            if isinstance(ds, h5py.Dataset) and (
                    ds.attrs.get("CLASS") != b"DIMENSION_SCALE"
                    or "axis_placeholder" not in ds.attrs):
                out.append(name)   # plain var, or coordinate variable
        return out

    def has_var(self, name: str) -> bool:
        return name in self.f and isinstance(self.f[name], h5py.Dataset)

    def read(self, name: str, step: Optional[int] = None) -> np.ndarray:
        ds = self.f[name]
        if step is None:
            return np.asarray(ds)
        return np.asarray(ds[step])

    def attr_names(self, var: Optional[str] = None) -> List[str]:
        src = self.f.attrs if var is None else self.f[var].attrs
        return list(src.keys())

    def read_attr(self, var: Optional[str], name: str):
        src = self.f.attrs if var is None else self.f[var].attrs
        v = src[name]
        if isinstance(v, bytes):
            return v.decode()
        return v

    def var_shape(self, name: str):
        return tuple(self.f[name].shape)

    def n_times(self, name: str = None) -> int:
        if name is not None and name in self.f:
            return self.f[name].shape[0]
        if "time" in self._dims:
            return self._dims["time"]
        return 1

    def close(self):
        self.f.close()

    def __enter__(self):
        return self

    def __exit__(self, *a):
        self.close()


def read_var(path: str, name: str, step: Optional[int] = None) -> np.ndarray:
    """One-shot read (io_read, io_routines.f90:30-66)."""
    with NCFile(path) as f:
        return f.read(name, step)


def write_vars(path: str, variables: Dict[str, tuple], attrs: Dict = None):
    """One-shot write: variables = {name: (dims, data[, var_attrs])}."""
    with NCFile(path, "w") as f:
        for name, spec in variables.items():
            dims, data = spec[0], spec[1]
            vattrs = spec[2] if len(spec) > 2 else None
            f.create_var(name, dims, data, vattrs)
        if attrs:
            f.set_attrs(attrs)
