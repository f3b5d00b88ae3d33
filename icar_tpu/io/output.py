"""Model output and restart/checkpoint IO.

Replaces output_t (/root/reference/src/io/output_h.f90, output_obj.f90) and
the restart machinery (restart.f90). Output is CF-flavored NetCDF-4 with
per-variable metadata drawn from the registry (which replaces
default_output_metadata.f90). Restarts are registry-driven and
decomposition-independent (global arrays), lifting the reference's
same-decomposition restriction (restart.f90:119-129).
"""

from __future__ import annotations

import os
from typing import List, Optional

import numpy as np

from .. import constants as C
from ..registry import REGISTRY
from .netcdf import NCFile

_DIM_NAMES = {
    (False, False, False): ("lev", "lat", "lon"),
    (True, False, False): ("lev", "lat", "lon_u"),
    (False, True, False): ("lev", "lat_v", "lon"),
    (False, False, True): ("lev_i", "lat", "lon"),
}


def _var_dims(spec, arr):
    if arr.ndim == 2:
        sx = spec.stagger == "x"
        sy = spec.stagger == "y"
        return ("lat_v" if sy else "lat", "lon_u" if sx else "lon")
    key = (spec.stagger == "x", spec.stagger == "y", spec.stagger == "zi")
    return _DIM_NAMES.get(key, ("lev", "lat", "lon"))


class OutputWriter:
    """Appends model state slices to a NetCDF file (output_t::save_file,
    output_obj.f90:41-78)."""

    def __init__(self, path: str, names: List[str], options=None):
        self.base = path
        self.path = path
        self.names = names
        self.options = options
        self._initialized = False
        self._frames = 0
        self._file_idx = 0
        # one file per frames_per_outfile output steps (driver.f90:94-102
        # starts a new per-image file per output period; default 24)
        fpo = getattr(getattr(options, "output", None),
                      "frames_per_outfile", 0) if options else 0
        self.frames_per_file = int(fpo) if fpo else 0

    def _rotate(self):
        import os
        self._file_idx += 1
        root, ext = os.path.splitext(self.base)
        self.path = f"{root}_{self._file_idx:03d}{ext}"
        self._initialized = False
        self._frames = 0

    def write_step(self, model, time_seconds: float):
        state = model.state
        names = [n for n in self.names if n in state]
        if (self.frames_per_file > 0 and self._initialized
                and self._frames >= self.frames_per_file):
            self._rotate()
        self._frames += 1
        if not self._initialized:
            mode = "w"
            with NCFile(self.path, mode) as f:
                f.create_dim("time", 0, unlimited=True)
                for n in names:
                    arr = model.field(n)
                    spec = REGISTRY[n]
                    dims = ("time",) + _var_dims(spec, arr)
                    attrs = {"units": spec.units}
                    if spec.standard_name:
                        attrs["standard_name"] = spec.standard_name
                    f.create_var(n, dims, arr[None].astype(np.float32), attrs)
                f.create_var("model_time", ("time",),
                             np.asarray([time_seconds], np.float64),
                             {"units": "seconds since run start"})
                attrs = {"source": f"icar_tpu {C.VERSION_STRING}"}
                if self.options is not None:
                    attrs["comment"] = self.options.comment
                g = model.geom
                attrs.update({"nx": g.nx, "ny": g.ny, "nz": g.nz, "dx": g.dx})
                f.set_attrs(attrs)
            self._initialized = True
        else:
            with NCFile(self.path, "a") as f:
                for n in names:
                    f.append_time_slice(n, model.field(n))
                f.append_time_slice("model_time",
                                    np.float64(time_seconds))


class AsyncStepWriter:
    """Per-step output through the native async NetCDF-classic writer
    (csrc/ncwriter.cpp): each output step becomes one CDF-2 file written by
    a C++ worker thread, so the model never blocks on disk. File naming
    mirrors the reference's date-stamped per-step files (driver.f90:94-102)."""

    def __init__(self, prefix: str, names: List[str], options=None):
        from .async_writer import AsyncNCWriter
        self.prefix = prefix
        self.names = names
        self.options = options
        self.paths: List[str] = []
        self._w = AsyncNCWriter()

    @property
    def path(self):
        return self.paths[-1] if self.paths else self.prefix

    def write_step(self, model, time_seconds: float):
        variables = {}
        for n in self.names:
            if n not in model.state:
                continue
            arr = model.field(n)
            variables[n] = (_var_dims(REGISTRY[n], arr), arr)
        g = model.geom
        attrs = {"source": f"icar_tpu {C.VERSION_STRING}",
                 "model_time": f"{time_seconds}",
                 "nx": str(g.nx), "ny": str(g.ny), "nz": str(g.nz),
                 "dx": str(g.dx)}
        path = f"{self.prefix}{int(time_seconds):08d}.nc"
        self._w.write(path, variables, attrs)
        self.paths.append(path)

    def wait(self) -> int:
        return self._w.wait()

    def close(self):
        self._w.close()


class ShardedOutputWriter:
    """File-per-shard output — the TPU equivalent of the reference's
    file-per-image NetCDF output (driver.f90:94-102): every addressable
    shard of the device mesh writes its own file with the decomposition
    recorded in global attrs (the ids/ide/jds/jde pattern of
    output_obj.f90 add_global_attributes), and NO global array is ever
    materialized on one host. On a multi-host slice each host writes only
    its own shards. ``tools/aggregate_output.py`` stitches the domain
    back together offline, exactly like the reference's
    aggregate_parallel_files.py."""

    def __init__(self, prefix: str, names: List[str], options=None):
        self.prefix = prefix
        self.names = names
        self.options = options
        self.paths: List[str] = []

    @property
    def path(self):
        return self.paths[-1] if self.paths else self.prefix

    def write_step(self, model, time_seconds: float):
        names = [n for n in self.names if n in model.state]
        natural = model._natural_shapes or {
            n: tuple(model.state[n].shape) for n in names}
        # one file per addressable shard; shard geometry from the first
        # 3D field's sharding (all fields share the (y, x) mesh layout)
        ref_arr = model.state[names[0]]
        for shard in ref_arr.addressable_shards:
            sid = shard.device.id
            path = f"{self.prefix}img{sid:03d}_{int(time_seconds):08d}.nc"
            idx = shard.index
            ys, xs = idx[-2], idx[-1]
            y0 = ys.start or 0
            x0 = xs.start or 0
            with NCFile(path, "w") as f:
                wrote_any = False
                for n in names:
                    arr = model.state[n]
                    sh = None
                    for s_ in arr.addressable_shards:
                        if s_.device.id == sid:
                            sh = s_
                            break
                    if sh is None:
                        continue
                    nat = natural[n]
                    data = np.asarray(sh.data)
                    # trim the padded frame to this shard's slice of the
                    # natural (unpadded) domain
                    ny_keep = max(0, min(y0 + data.shape[-2], nat[-2]) - y0)
                    nx_keep = max(0, min(x0 + data.shape[-1], nat[-1]) - x0)
                    if ny_keep == 0 or nx_keep == 0:
                        continue
                    data = data[..., :ny_keep, :nx_keep]
                    spec = REGISTRY[n]
                    dims = _var_dims(spec, data)
                    for d, size in zip(dims, data.shape):
                        if d not in f._dims:
                            f.create_dim(d, size)
                    attrs = {"units": spec.units}
                    if spec.standard_name:
                        attrs["standard_name"] = spec.standard_name
                    f.create_var(n, dims, data.astype(np.float32), attrs)
                    wrote_any = True
                g = model.geom
                f.set_attrs({
                    "source": f"icar_tpu {C.VERSION_STRING}",
                    "model_time": float(time_seconds),
                    "nx": g.nx, "ny": g.ny, "nz": g.nz, "dx": g.dx,
                    # decomposition indices for the offline aggregator
                    # (ids/ide analog, output_obj.f90 global attrs)
                    "y_start": int(y0), "x_start": int(x0),
                    "shard_id": int(sid),
                })
            if wrote_any:
                self.paths.append(path)
            else:
                os.remove(path)

    def wait(self) -> int:
        return 0


def write_restart(path: str, model, time_seconds: float):
    """Checkpoint all restart fields + wind-perturbation state
    (driver.f90:181-191 restart writes; improved: stores global fields so
    any future decomposition can resume)."""
    from ..core.state import restart_names

    data = {"__time__": np.float64(time_seconds)}
    for n in restart_names(model.options):
        if n in model.state:
            data[n] = model.field(n)
    if model.u_perturbation is not None:
        data["__u_perturbation__"] = np.asarray(model.u_perturbation)
        data["__v_perturbation__"] = np.asarray(model.v_perturbation)
    np.savez_compressed(path, **data)


def read_restart(path: str, model):
    """Resume model state from a checkpoint (restart_model, restart.f90:12-89).
    Returns the restart time in seconds since run start."""
    import jax.numpy as jnp

    d = np.load(path)
    s = dict(model.state)
    for n in d.files:
        if n.startswith("__"):
            continue
        if n not in s:
            continue
        if tuple(d[n].shape) != tuple(s[n].shape):
            raise ValueError(
                f"restart field {n} has shape {d[n].shape}, expected "
                f"{tuple(s[n].shape)}: domain configuration changed")
        s[n] = jnp.asarray(d[n])
    model.state = s
    if "__u_perturbation__" in d.files:
        model.u_perturbation = jnp.asarray(d["__u_perturbation__"])
        model.v_perturbation = jnp.asarray(d["__v_perturbation__"])
    model.model_time = float(d["__time__"])
    return model.model_time
