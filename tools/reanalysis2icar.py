#!/usr/bin/env python
"""Convert reanalysis / GCM NetCDF (ERA5-style pressure levels, or hybrid
sigma levels) into icar_tpu forcing files.

The TPU-native counterpart of the reference's per-dataset converters
(/root/reference/helpers/erai/*.py, ccsm/ cesm/ cmip/ directories, and
helpers/gen_bc.py): one generic tool instead of one script per dataset.

Handles:
  * pressure-level files: a 1D ``level`` coordinate [hPa or Pa] broadcast
    to the 3D pressure field
  * hybrid-sigma files: ``p = a·p0 + b·ps`` from the hyam/hybm (or a/b)
    coefficients and surface pressure (erai/convert.py:20-25)
  * real temperature -> potential temperature via the Exner function
    (erai/convert.py:32-33)
  * geopotential -> geometric height [m]
  * specific humidity -> mixing ratio
  * descending latitude / level axes flipped to ascending (::-1 reorders
    in erai/convert.py:15-17)

Usage:
    python tools/reanalysis2icar.py era5.nc -o forcing.nc \
        --uvar u --vvar v --tvar t --qvar q --zvar z --t-is-real \
        --q-is-specific-humidity --z-is-geopotential

Variables default to ERA5 names; anything missing is skipped.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

GRAVITY = 9.81
P0 = 100000.0
ROVCP = 287.058 / 1012.0


class _Reader:
    def __init__(self, path: str):
        try:
            from icar_tpu.io.netcdf import NCFile
            self._f = NCFile(path)
            self._sc = None
        except Exception:
            from scipy.io import netcdf_file
            self._f = None
            self._sc = netcdf_file(path, "r", mmap=False)

    def has(self, name):
        if self._f is not None:
            return bool(name) and self._f.has_var(name)
        return bool(name) and name in self._sc.variables

    def read(self, name):
        if self._f is not None:
            return np.asarray(self._f.read(name), np.float64)
        v = self._sc.variables[name]
        data = np.asarray(v[:], np.float64)
        scale = getattr(v, "scale_factor", None)
        off = getattr(v, "add_offset", None)
        if scale is not None:
            data = data * float(scale)
        if off is not None:
            data = data + float(off)
        return data

    def close(self):
        (self._f or self._sc).close()


def convert(paths, out_path, names, t_is_real=True, q_is_sh=True,
            z_is_geopotential=True, verbose=True):
    acc: dict = {}

    def add(k, a):
        acc.setdefault(k, []).append(np.asarray(a, np.float32))

    lat = lon = None
    flip_lat = False
    for path in paths:
        f = _Reader(path)
        if verbose:
            print(f"reading {path}")
        if lat is None:
            lat = f.read(names["lat"]).squeeze()
            lon = f.read(names["lon"]).squeeze()
            flip_lat = lat.ndim == 1 and lat.size > 1 and lat[1] < lat[0]
            if flip_lat:
                lat = lat[::-1]

        def get(key):
            nm = names.get(key)
            if not nm or not f.has(nm):
                return None
            a = f.read(nm)
            if a.ndim == 4 and flip_lat:
                a = a[:, :, ::-1, :]
            elif a.ndim == 3 and flip_lat:
                a = a[:, ::-1, :]
            return a

        t = get("t")

        # 3D pressure
        if names.get("lev") and f.has(names["lev"]):
            lev = f.read(names["lev"]).squeeze()     # (nz,)
            if lev.max() < 2000:                     # hPa -> Pa
                lev = lev * 100.0
            p = np.broadcast_to(lev[None, :, None, None],
                                t.shape).copy()
        elif names.get("hyam") and f.has(names["hyam"]):
            a = f.read(names["hyam"]).squeeze()
            b = f.read(names["hybm"]).squeeze()
            ps = get("ps")
            p0 = f.read(names["p00"]).squeeze() if (
                names.get("p00") and f.has(names["p00"])) else 1.0
            # p(t,k,y,x) = a_k*p0 + b_k*ps  (erai/convert.py:20-25)
            p = (a[None, :, None, None] * p0
                 + b[None, :, None, None] * ps[:, None, :, :])
        else:
            raise ValueError("need either a level coordinate (--levvar) or "
                             "hybrid coefficients (--hyam/--hybm/--psvar)")

        # icar_tpu wants ascending z = pressure decreasing with k
        flip_lev = p[0, 0].mean() < p[0, -1].mean()

        def reorder(a):
            return a[:, ::-1] if (flip_lev and a.ndim == 4) else a

        p = reorder(p)
        t = reorder(t)
        exner = (p / P0) ** ROVCP
        add("pressure", p)
        add("theta", t / exner if t_is_real else t)

        z = get("z")
        if z is not None:
            z = reorder(z)
            add("z", z / GRAVITY if z_is_geopotential else z)
        q = get("q")
        if q is not None:
            q = reorder(q)
            add("qv", q / (1.0 - q) if q_is_sh else q)
        for key in ("u", "v"):
            a = get(key)
            if a is not None:
                add(key, reorder(a))
        for key, out_name in (("sst", "sst"), ("swdown", "swdown"),
                              ("lwdown", "lwdown")):
            a = get(key)
            if a is not None:
                add(out_name, a)
        if "hgt" not in acc:
            hg = get("hgt")
            if hg is not None:
                if hg.ndim == 3:
                    hg = hg[0]
                acc["hgt"] = [np.asarray(
                    hg / GRAVITY if z_is_geopotential else hg, np.float32)]
        f.close()

    if lat.ndim == 1:
        lon2, lat2 = np.meshgrid(lon, lat)
    else:
        lat2, lon2 = lat, lon

    from icar_tpu.io.netcdf import write_vars
    variables = {"lat": (("y", "x"), lat2.astype(np.float32)),
                 "lon": (("y", "x"), lon2.astype(np.float32))}
    for name, chunks in acc.items():
        data = (chunks[0] if name == "hgt"
                else np.concatenate(chunks, axis=0))
        dims = {4: ("time", "level", "y", "x"),
                3: ("time", "y", "x"), 2: ("y", "x")}[data.ndim]
        variables[name] = (dims, np.asarray(data, np.float32))
    write_vars(out_path, variables,
               attrs={"title": "icar_tpu forcing converted from reanalysis",
                      "source_files": " ".join(os.path.basename(p)
                                               for p in paths)})
    if verbose:
        print(f"wrote {out_path}: vars {', '.join(sorted(variables))}")
        print("\nsuggested &var_list:\n"
              "  pvar = \"pressure\", tvar = \"theta\", qvvar = \"qv\",\n"
              "  uvar = \"u\", vvar = \"v\", zvar = \"z\",\n"
              "  latvar = \"lat\", lonvar = \"lon\""
              + (", hgtvar = \"hgt\"" if "hgt" in variables else ""))
    return out_path


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("inputs", nargs="+")
    ap.add_argument("-o", "--output", default="icar_forcing.nc")
    ap.add_argument("--uvar", default="u")
    ap.add_argument("--vvar", default="v")
    ap.add_argument("--tvar", default="t")
    ap.add_argument("--qvar", default="q")
    ap.add_argument("--zvar", default="z")
    ap.add_argument("--levvar", default="level")
    ap.add_argument("--latvar", default="latitude")
    ap.add_argument("--lonvar", default="longitude")
    ap.add_argument("--psvar", default="")
    ap.add_argument("--hyam", default="")
    ap.add_argument("--hybm", default="")
    ap.add_argument("--p00", default="")
    ap.add_argument("--hgtvar", default="")
    ap.add_argument("--sstvar", default="")
    ap.add_argument("--t-is-potential", action="store_true",
                    help="input temperature is already potential T")
    ap.add_argument("--q-is-mixing-ratio", action="store_true")
    ap.add_argument("--z-is-height", action="store_true",
                    help="z is geometric height, not geopotential")
    ap.add_argument("-q", "--quiet", action="store_true")
    args = ap.parse_args(argv)
    names = {"u": args.uvar, "v": args.vvar, "t": args.tvar,
             "q": args.qvar, "z": args.zvar, "lev": args.levvar,
             "lat": args.latvar, "lon": args.lonvar, "ps": args.psvar,
             "hyam": args.hyam, "hybm": args.hybm, "p00": args.p00,
             "hgt": args.hgtvar, "sst": args.sstvar}
    convert(args.inputs, args.output, names,
            t_is_real=not args.t_is_potential,
            q_is_sh=not args.q_is_mixing_ratio,
            z_is_geopotential=not args.z_is_height,
            verbose=not args.quiet)
    return 0


if __name__ == "__main__":
    sys.exit(main())
