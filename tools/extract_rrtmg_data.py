#!/usr/bin/env python
"""Extract the in-source RRTMG physical-constant tables into .npz files.

The AER RRTMG scheme carries two kinds of data: the k-distribution
absorption tables (which ICAR reads from external rrtmg_support/*.nc files
that are NOT shipped with the repository) and in-source DATA tables
(integrated Planck functions, MLS reference profiles, and the
Hu & Stamnes / Ebert & Curry / Fu cloud optical-property fits).  This tool
parses the latter out of the reference Fortran (array-constructor
assignments like ``totplnk(1:50, 1) = (/ ... /)``) and writes them to
``icar_tpu/physics/data/rrtmg_{lw,sw}_data.npz`` for the JAX scheme.

Usage: python tools/extract_rrtmg_data.py /path/to/reference/src/physics
"""

import os
import re
import sys

import numpy as np

# array shapes (Fortran declarations; first index varies fastest there,
# we store them in the same (i, j) index order as numpy [i-1, j-1])
LW_ARRAYS = {
    "totplnk": (181, 16),
    "totplk16": (181,),
    "preflog": (59,),
    "tref": (59,),
    "chi_mls": (7, 59),
    "absliq1": (58, 16),
    "absice0": (2,),
    "absice1": (2, 5),
    "absice2": (43, 16),
    "absice3": (46, 16),
}
# SW band arrays are declared (58, 16:29) etc.; offset handled below
SW_ARRAYS = {
    "extliq1": (58, 14),
    "ssaliq1": (58, 14),
    "asyliq1": (58, 14),
    "extice2": (43, 14),
    "ssaice2": (43, 14),
    "asyice2": (43, 14),
    "extice3": (46, 14),
    "ssaice3": (46, 14),
    "asyice3": (46, 14),
    "fdlice3": (46, 14),
    "abari": (5,), "bbari": (5,), "cbari": (5,),
    "dbari": (5,), "ebari": (5,), "fbari": (5,),
}
SW_BAND_OFFSET = 16   # second index declared 16:29

NUM_RE = re.compile(r"[-+]?\d*\.?\d+(?:[eEdD][-+]?\d+)?(?=_rb|_rb|\b)")
ASSIGN_RE = re.compile(r"^\s*(\w+)\s*\(([^)]*)\)\s*=\s*\(/")


def parse_arrays(path, wanted, band_offset_names=()):
    text = open(path, errors="ignore").read().splitlines()
    out = {name: np.zeros(shape, np.float64)
           for name, shape in wanted.items()}
    seen = {name: False for name in wanted}
    i = 0
    while i < len(text):
        m = ASSIGN_RE.match(text[i])
        if not m or m.group(1).lower() not in wanted:
            i += 1
            continue
        name = m.group(1).lower()
        slicespec = m.group(2)
        # collect numbers until the closing '/)'
        nums = []
        j = i
        while j < len(text):
            seg = text[j].split("!")[0]
            if j == i:
                seg = seg.split("(/", 1)[1]
            done = "/)" in seg
            if done:
                seg = seg.split("/)", 1)[0]
            seg = seg.replace("&", " ").replace("_rb", " ")
            nums.extend(float(t.replace("d", "e").replace("D", "E"))
                        for t in NUM_RE.findall(seg))
            j += 1
            if done:
                break
        i = j
        vals = np.array(nums, np.float64)
        arr = out[name]
        parts = [p.strip() for p in slicespec.split(",")]
        offset = SW_BAND_OFFSET if name in band_offset_names else 1
        if len(parts) == 1:
            sl = _parse_slice(parts[0], arr.shape[0], 1)
            arr[sl] = vals
        else:
            sl0 = _parse_slice(parts[0], arr.shape[0], 1)
            sl1 = _parse_slice(parts[1], arr.shape[1], offset)
            arr[sl0, sl1] = vals.reshape(arr[sl0, sl1].shape, order="F") \
                if vals.size > 1 else vals
        seen[name] = True
    missing = [n for n, s in seen.items() if not s]
    if missing:
        raise SystemExit(f"missing arrays in {path}: {missing}")
    return out


def _parse_slice(tok, n, offset):
    tok = tok.strip()
    if tok == ":":
        return slice(None)
    if ":" in tok:
        a, b = tok.split(":")
        return slice(int(a) - offset, int(b) - offset + 1)
    return int(tok) - offset


def main():
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/reference/src/physics"
    outdir = os.path.join(os.path.dirname(__file__), "..", "icar_tpu",
                          "physics", "data")
    os.makedirs(outdir, exist_ok=True)

    lw = parse_arrays(os.path.join(src, "ra_rrtmg_lw.f90"), LW_ARRAYS)
    np.savez_compressed(os.path.join(outdir, "rrtmg_lw_data.npz"),
                        **{k: v.astype(np.float32) for k, v in lw.items()})
    print("LW:", {k: v.shape for k, v in lw.items()})

    sw = parse_arrays(os.path.join(src, "ra_rrtmg_sw.f90"), SW_ARRAYS,
                      band_offset_names=set(SW_ARRAYS) - {
                          "abari", "bbari", "cbari", "dbari", "ebari",
                          "fbari"})
    np.savez_compressed(os.path.join(outdir, "rrtmg_sw_data.npz"),
                        **{k: v.astype(np.float32) for k, v in sw.items()})
    print("SW:", {k: v.shape for k, v in sw.items()})


if __name__ == "__main__":
    main()
