"""fcheck-style golden checking of run output.

The reference CI generates a work dir with ``mkrun pi test_pi`` and then
``fcheck .`` compares the mean value of each output field against goldens
stored in ``setups/test_pi/setup.yml`` (fcheck block, e.g.
temp: 1.701768707848739).  This module reproduces that contract for the
TPU build's own output files and golden sets.

Usage:
    python -m fesom2_tpu.post.fcheck RESULT_DIR GOLDEN_YAML [--rtol 1e-4]
"""
from __future__ import annotations

import glob
import os
import sys

import numpy as np


def field_means(result_path: str) -> dict:
    """Mean over all finite values of every variable in every
    fesom.*.nc stream file under result_path."""
    from ..io.netcdf import read_vars, list_vars
    means = {}
    for path in sorted(glob.glob(os.path.join(result_path, "*.nc"))):
        base = os.path.basename(path)
        if base.startswith("fesom.mesh.diag"):
            continue
        try:
            names = list_vars(path)
        except Exception:
            continue
        for name in names:
            if name in ("time",) or name.endswith("_bnds"):
                continue
            try:
                arr = np.asarray(read_vars(path, [name])[name], dtype=float)
            except Exception:
                continue
            ok = np.isfinite(arr)
            if ok.any():
                means[name] = float(arr[ok].mean())
    return means


def load_goldens(path: str) -> dict:
    """Parse the flat `fcheck:`-style mapping from a (simple) yaml file:
    lines of `  name: value` under an `fcheck:` key, or a whole-file flat
    mapping."""
    gold = {}
    in_block = None
    with open(path) as f:
        for line in f:
            stripped = line.split("#")[0].rstrip()
            if not stripped:
                continue
            indent = len(stripped) - len(stripped.lstrip())
            body = stripped.strip()
            if body.endswith(":") and ":" not in body[:-1]:
                in_block = body[:-1]
                continue
            if ":" in body:
                k, v = body.split(":", 1)
                try:
                    val = float(v.strip())
                except ValueError:
                    in_block = None
                    continue
                if in_block in (None, "fcheck"):
                    gold[k.strip()] = val
    return gold


def fcheck(result_path: str, golden_path: str, rtol: float = 1e-4,
           atol: float = 1e-12, verbose: bool = True) -> bool:
    """Compare run output means to goldens; True if all pass."""
    means = field_means(result_path)
    gold = load_goldens(golden_path)
    ok_all = True
    for name, val in sorted(gold.items()):
        if name not in means:
            ok_all = False
            if verbose:
                print(f"MISSING  {name}: golden {val} but no output field")
            continue
        got = means[name]
        ok = abs(got - val) <= rtol * abs(val) + atol
        ok_all &= ok
        if verbose:
            mark = "OK  " if ok else "FAIL"
            print(f"{mark}  {name}: got {got!r}, golden {val!r}")
    return ok_all


def write_goldens(result_path: str, out_path: str):
    """Record the current output means as a golden yaml (fcheck block)."""
    means = field_means(result_path)
    with open(out_path, "w") as f:
        f.write("fcheck:\n")
        for k, v in sorted(means.items()):
            f.write(f"  {k}: {v!r}\n")


def main():
    import argparse
    p = argparse.ArgumentParser(description="golden-mean output check")
    p.add_argument("result")
    p.add_argument("golden")
    p.add_argument("--rtol", type=float, default=1e-4)
    p.add_argument("--record", action="store_true",
                   help="write goldens from the result instead of checking")
    args = p.parse_args()
    if args.record:
        write_goldens(args.result, args.golden)
        return
    ok = fcheck(args.result, args.golden, rtol=args.rtol)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
