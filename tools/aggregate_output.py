#!/usr/bin/env python
"""Aggregate per-step output files into one time-series NetCDF file.

TPU-repo analog of the reference's offline output recombination
(/root/reference/helpers/aggregate_parallel_files.py). The reference
writes one file per *image* and stitches the domain back together from
the decomposition attributes; icar_tpu already writes global-domain
files, but the native async engine ("classic-async",
icar_tpu/io/output.py AsyncStepWriter) writes one CDF-2 file per output
*step* — this tool concatenates those along a time axis into a single
NetCDF-4 file equivalent to what the default engine produces.

Usage:
    python tools/aggregate_output.py 'output/icar_out_*.nc' -o combined.nc
"""

import argparse
import glob
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def read_classic(path):
    """Read all variables + global attrs of a classic (CDF-1/2) file."""
    from scipy.io import netcdf_file
    with netcdf_file(path, "r", mmap=False) as f:
        variables = {n: (v.dimensions, np.asarray(v[:]))
                     for n, v in f.variables.items()}
        attrs = {k: (v.decode() if isinstance(v, bytes) else v)
                 for k, v in f._attributes.items()}
    return variables, attrs


def main():
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("pattern", help="glob of per-step files (quote it)")
    p.add_argument("-o", "--output", default="icar_aggregated.nc")
    args = p.parse_args()

    paths = sorted(glob.glob(args.pattern))
    if not paths:
        print(f"no files match {args.pattern}", file=sys.stderr)
        return 1

    from icar_tpu.io.netcdf import NCFile

    steps = []
    times = []
    attrs = {}
    for i, path in enumerate(paths):
        variables, attrs = read_classic(path)
        steps.append(variables)
        times.append(float(attrs.get("model_time", i)))
    times = np.asarray(times, np.float64)

    first = steps[0]
    with NCFile(args.output, "w") as out:
        out.create_dim("time", len(steps), unlimited=True)
        dims_seen = {}
        for name, (dims, arr) in first.items():
            for d, n in zip(dims, arr.shape):
                if d not in dims_seen:
                    dims_seen[d] = n
                    out.create_dim(d, n)
        out.create_var("model_time", ("time",), times)
        for name, (dims, arr) in first.items():
            stacked = np.stack([s[name][1] for s in steps], axis=0)
            out.create_var(name, ("time",) + tuple(dims), stacked)
        out.set_attrs(attrs)
    print(f"wrote {args.output}: {len(steps)} steps, "
          f"{len(first)} variables")
    return 0


if __name__ == "__main__":
    sys.exit(main())
