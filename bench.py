"""Benchmark: ocean-core throughput on one chip (soufflet channel, f32).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Metric: node-levels advanced per second per chip (surface nodes x active
layers x steps / wall-clock).  Baseline anchor: the reference FESOM2 CORE2
production throughput of ~2.5 SYPD at 288 cores (Koldunov et al. 2019,
cited via reference README.md:25; 127k surface nodes x 46 layers, 32
steps/day) ==> ~2.0e6 node-levels/s for a 288-core allocation.
vs_baseline = (our node-levels/s on ONE chip) / 2.0e6.
"""
import json
import sys
import time


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np
    from fesom2_tpu.model import setup_soufflet_model
    from fesom2_tpu.core.state import zero_forcing

    dtype = jnp.float32
    model = setup_soufflet_model(dtype=dtype)
    state = model.initial_state(dtype=dtype)
    forcing = zero_forcing(model.mesh, dtype)
    step = model.step_fn()

    # warmup / compile
    state = step(state, forcing)
    jax.block_until_ready(state)
    state = step(state, forcing)
    jax.block_until_ready(state)

    n_steps = 20
    t0 = time.perf_counter()
    for _ in range(n_steps):
        state = step(state, forcing)
    jax.block_until_ready(state)
    dt_wall = time.perf_counter() - t0

    # active node-levels (count only wet cells)
    active = int(np.asarray(model.mesh.node_layer_mask).sum())
    nls = active * n_steps / dt_wall
    steps_per_s = n_steps / dt_wall

    baseline = 2.0e6  # node-levels/s of a 288-core reference allocation
    print(json.dumps({
        "metric": "soufflet_ocean_node_levels_per_s_per_chip",
        "value": round(nls, 1),
        "unit": "node-levels/s",
        "vs_baseline": round(nls / baseline, 4),
        "detail": {
            "steps_per_s": round(steps_per_s, 3),
            "active_node_levels": active,
            "device": str(jax.devices()[0]),
            "n_steps": n_steps,
        },
    }))


if __name__ == "__main__":
    main()
