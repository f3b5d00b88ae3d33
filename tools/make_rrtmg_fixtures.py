#!/usr/bin/env python
"""Generate reference-layout rrtmg_support/*.nc fixture files.

The reference reads its RRTMG k-distribution data from per-band NetCDF
files (lw_kgb01..16, ra_rrtmg_lw.f90:13086-13120 and sw_kgb16..29,
ra_rrtmg_sw.f90 equivalents) via io_read{0,1,2,3,4}d, which allocates the
target with the file's dims in Fortran order — i.e. the file's C/numpy
layout is the REVERSE of the Fortran declaration.

This tool derives the exact (file name, variable name, Fortran shape)
inventory by parsing the reference source itself: the io_read calls give
the file/variable names and ranks; the rrlw_kg / rrsw_kg module
declarations give the reduced-array shapes, whose raw ('o'-suffixed)
counterparts replace the reduced g-dimension with the original 16
g-points. Fixtures are filled with seeded positive random data.

Usage: python tools/make_rrtmg_fixtures.py OUTDIR [--ref /root/reference]
"""

import argparse
import os
import re
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

MG = 16   # original g-points per band

READ_RE = re.compile(
    r'io_read([0-4])d(i?)\("rrtmg_support/([a-zA-Z0-9_]+\.nc)",'
    r'\s*"([a-zA-Z0-9_]+)"')
MODULE_RE = re.compile(r'^\s*module\s+(rr[ls]w_kg\d+)\s*$')
PARAM_RE = re.compile(
    r'parameter\s*::\s*([a-z0-9_]+)\s*=\s*(\d+)', re.IGNORECASE)
DECL_RE = re.compile(
    r'^\s*real(?:\*8|\(kind=rb\))?\s*'
    r'((?:,\s*(?:save|dimension\([^)]*\)))*)\s*::\s*(.+)$',
    re.IGNORECASE)
DIMATTR_RE = re.compile(r'dimension\(([^)]*)\)', re.IGNORECASE)
VAR_RE = re.compile(r'([a-z0-9_]+)\s*\(([^)]*)\)', re.IGNORECASE)
BARE_RE = re.compile(r'(?:^|,)\s*([a-z0-9_]+)\s*(?=,|$)', re.IGNORECASE)


def _dim_size(tok, params):
    tok = tok.strip().lower()
    if ":" in tok:
        lo, hi = tok.split(":")
        return int(hi) - int(lo) + 1
    if tok.isdigit():
        return int(tok)
    if tok in params:
        return params[tok]
    raise ValueError(f"unresolvable dimension {tok!r}")


def parse_shapes(src_path):
    """Fortran-order shapes of every reduced array in every kg module."""
    shapes = {}           # (module, varname) -> tuple of Fortran dims
    # global integer parameters (ngNN live in parrrsw/parrrtm, not in the
    # kg modules themselves on the SW side)
    gparams = {}
    with open(src_path) as f:
        for line in f:
            for name, val in PARAM_RE.findall(line):
                gparams.setdefault(name.lower(), int(val))
    module = None
    params = {}
    with open(src_path) as f:
        for line in f:
            m = MODULE_RE.match(line)
            if m:
                module = m.group(1)
                params = dict(gparams)
                continue
            if module is None:
                continue
            if re.match(r'^\s*end module', line):
                module = None
                continue
            for name, val in PARAM_RE.findall(line):
                params[name.lower()] = int(val)
            dm = DECL_RE.match(line)
            if dm and "allocatable" not in line:
                attrs, body = dm.group(1), dm.group(2)
                for name, dims in VAR_RE.findall(body):
                    try:
                        shape = tuple(_dim_size(d, params)
                                      for d in dims.split(","))
                    except ValueError:
                        continue
                    shapes[(module, name.lower())] = shape
                da = DIMATTR_RE.search(attrs or "")
                if da:
                    # dimension(...) attribute applies to bare names
                    try:
                        shape = tuple(_dim_size(d, params)
                                      for d in da.group(1).split(","))
                    except ValueError:
                        shape = None
                    if shape:
                        no_paren = VAR_RE.sub("", body)
                        for bm in BARE_RE.findall(no_paren):
                            shapes[(module, bm.lower())] = shape
    return shapes


def raw_shape(reduced_shape, ng, var=""):
    """Raw 'o' array shape: the reduced g dimension becomes 16.

    The g dimension is the LAST one in the reference declarations except
    for the Planck-fraction / solar-source arrays (fracrefa(ngN,9),
    sfluxref(ngN,9)), where it is first; positional selection matters
    when a physical dimension numerically equals ngN (e.g.
    selfref(10, ng1) with ng1 = 10)."""
    idxs = [i for i, d in enumerate(reduced_shape) if d == ng]
    if not idxs:
        return reduced_shape
    pos = idxs[0] if var.startswith(("fracref", "sfluxref")) else idxs[-1]
    return tuple(MG if i == pos else d
                 for i, d in enumerate(reduced_shape))


def collect_inventory(src_path, kind):
    """(filename, varname, numpy shape) for every io_read call in the
    lw_kgb/sw_kgb loaders."""
    shapes = parse_shapes(src_path)
    ng_of = {}            # module -> reduced g count
    for (module, name), shp in shapes.items():
        m = re.match(r'rr[ls]w_kg(\d+)', module)
        if m and name == f"ng{int(m.group(1))}":
            pass
    # ng parameters: per-module first, any global parameter as fallback
    gparams = {}
    with open(src_path) as f:
        for line in f:
            for name, val in PARAM_RE.findall(line):
                gparams.setdefault(name.lower(), int(val))
    params_by_module = {}
    module = None
    with open(src_path) as f:
        for line in f:
            m = MODULE_RE.match(line)
            if m:
                module = m.group(1)
                params_by_module[module] = dict(gparams)
                continue
            if module and re.match(r'^\s*end module', line):
                module = None
                continue
            if module:
                for name, val in PARAM_RE.findall(line):
                    params_by_module[module][name.lower()] = int(val)

    inventory = []
    with open(src_path) as f:
        text = f.read()
    for rank, int_flag, fname, var in READ_RE.findall(text):
        rank = int(rank)
        is_int = bool(int_flag)
        m = re.match(r'([a-z0-9_]+?)_(\d+)(_sw)?\.nc', fname)
        if not m:
            raise ValueError(f"unparsed fixture filename {fname}")
        band = int(m.group(2))
        module = f"rr{kind}w_kg{band:02d}"
        params = params_by_module.get(module, {})
        ng = params.get(f"ng{band}", 16)
        if rank == 0:
            shape = ()
        else:
            # raw-name -> reduced-name candidates: kao->ka, selfrefo->
            # selfref, kao_mn2->ka_mn2, kbo_mco2->kb_mco2, ccl4o->ccl4
            v = var.lower()
            candidates = [v]
            if v.endswith("o"):
                candidates.append(v[:-1])
            candidates.append(v.replace("ao_", "a_", 1))
            candidates.append(v.replace("bo_", "b_", 1))
            fshape = None
            for cand in candidates:
                if (module, cand) in shapes:
                    fshape = raw_shape(shapes[(module, cand)], ng, cand)
                    break
            if fshape is None:
                raise ValueError(
                    f"no declaration found for {var} in {module}")
            if len(fshape) != rank:
                raise ValueError(
                    f"{fname}:{var} declared rank {len(fshape)} but read "
                    f"with io_read{rank}d")
            # numpy layout = reversed Fortran dims (io_read allocates
            # data_in(diminfo(2),...) = dims in Fortran order,
            # io_routines.f90:407)
            shape = tuple(reversed(fshape))
        inventory.append((fname, var, shape, is_int))
    return inventory


def write_fixtures(outdir, inventory, seed=0):
    from icar_tpu.io.netcdf import NCFile
    rng = np.random.RandomState(seed)
    os.makedirs(outdir, exist_ok=True)
    for fname, var, shape, is_int in inventory:
        path = os.path.join(outdir, fname)
        if is_int:
            # integer scalars (layreffr etc., io_read0di): a valid
            # in-column layer index
            data = rng.randint(1, 13, shape if shape else (1,)) \
                .astype(np.int32)
        else:
            data = rng.gamma(1.0, 1e-2, shape if shape else (1,)) \
                .astype(np.float32)
        with NCFile(path, "w") as f:
            dims = []
            for i, n in enumerate(data.shape):
                dname = f"dim{i}_{n}"
                f.create_dim(dname, n)
                dims.append(dname)
            f.create_var(var, dims, data)
    return len(inventory)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("outdir")
    ap.add_argument("--ref", default="/root/reference")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()
    lw = collect_inventory(
        os.path.join(args.ref, "src/physics/ra_rrtmg_lw.f90"), "l")
    sw = collect_inventory(
        os.path.join(args.ref, "src/physics/ra_rrtmg_sw.f90"), "s")
    n = write_fixtures(args.outdir, lw + sw, args.seed)
    print(f"wrote {n} fixture files to {args.outdir}")


if __name__ == "__main__":
    main()
