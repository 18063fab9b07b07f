"""Run the per-phase TPU profile (CI parity, f32) and write profile JSON.

Usage: python scripts/profile_tpu.py [n_refine] [out.json]
One JAX process at a time (see CLAUDE.md).  All numbers are SECONDS per
step, from the same _time_fn harness, so the table is unit-consistent.
"""
import json
import sys

import jax.numpy as jnp

from fesom2_tpu.utils.profiling import profile_pi_phases


def main():
    n_refine = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    out = sys.argv[2] if len(sys.argv) > 2 else f"profile_r03_ci.json"
    table = profile_pi_phases(n_refine=n_refine, dtype=jnp.float32,
                              parity="ci", verbose=True)
    table = {k: round(float(v), 6) for k, v in table.items()}
    table["_meta"] = {"n_refine": n_refine, "dtype": "float32",
                      "parity": "ci", "units": "seconds_per_step"}
    with open(out, "w") as f:
        json.dump(table, f, indent=1)
    print("wrote", out)


if __name__ == "__main__":
    main()
