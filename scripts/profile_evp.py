"""Micro-profile the mEVP phase at scale: whole-phase time vs subcycle
unroll factor, plus the polar-cap subdomain size (ice_evp = 27% of the
188k step, profile_scale_r04.json).

Usage (one JAX process, real chip):
    PYTHONPATH=/root/repo python scripts/profile_evp.py [n_refine]
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def time_fn(fn, args, n=5):
    from fesom2_tpu.utils.profiling import _barrier
    out = fn(*args)
    _barrier(out)               # hard host barrier (axon block races)
    out = fn(*args)
    _barrier(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    _barrier(out)
    return (time.perf_counter() - t0) / n


def main():
    n_refine = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    dtype = jnp.float32
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        from fesom2_tpu.model import (setup_pi_model, pi_initial_state,
                                      pi_coupled_step_fn)
        from fesom2_tpu.ice import evp as evp_mod
        from fesom2_tpu.ice.state import zero_ice_forcing, OceanSurface
        model, atm = setup_pi_model(dtype=dtype, n_refine=n_refine,
                                    parity="ci")
        state, ice = pi_initial_state(model, dtype=dtype)
        sub = getattr(model, "ice_submesh", None)
        mesh = model.mesh
        print(f"mesh: N={mesh.n_nodes} E={mesh.n_elems}; "
              f"subdomain: N={sub.n_nodes if sub else '-'} "
              f"E={sub.n_elems if sub else '-'}", flush=True)
        iforc = zero_ice_forcing(mesh, dtype)
        osurf = OceanSurface(T_oc=state.tr[0, 0], S_oc=state.tr[1, 0],
                             u_w=state.unode[0], v_w=state.vnode[0],
                             elevation=state.eta)

    res = {}

    def run_full(u):
        evp_mod.UNROLL = u

        @jax.jit
        def phase(ice_in, iforc_in, osurf_in):
            return evp_mod.ice_dynamics(ice_in, mesh, iforc_in, osurf_in,
                                        model.cfg, sub=sub)
        return time_fn(lambda a, b, c: phase(a, b, c).u_ice,
                       (ice, iforc, osurf))

    for u in (1, 2, 4, 8):
        try:
            res[f"unroll_{u}"] = run_full(u)
            print(f"unroll={u}: {res[f'unroll_{u}']*1e3:.1f} ms", flush=True)
        except Exception as e:
            print(f"unroll={u}: failed {e}", flush=True)
    print(json.dumps({k: round(v, 5) for k, v in res.items()}))


if __name__ == "__main__":
    main()
