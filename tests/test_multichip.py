"""Multi-device dry run on the virtual 8-device CPU mesh."""
import sys

import jax
import numpy as np
import pytest

sys.path.insert(0, "/root/repo")


def test_dryrun_multichip_8():
    assert jax.device_count() >= 8, "conftest must provide 8 CPU devices"
    import __graft_entry__
    __graft_entry__.dryrun_multichip(8)


def test_sharded_step_matches_single_device():
    """One sharded step must agree with the unsharded step bitwise-ish."""
    import jax.numpy as jnp
    from fesom2_tpu.model import setup_soufflet_model
    from fesom2_tpu.core.state import zero_forcing
    from fesom2_tpu.parallel.sharding import (make_device_mesh, shard_state,
                                              shard_forcing)

    model = setup_soufflet_model(dtype=jnp.float64, pad_to=8)
    state = model.initial_state(dtype=jnp.float64)
    forcing = zero_forcing(model.mesh, jnp.float64)
    step = model.step_fn()
    ref = step(state, forcing)

    mesh = make_device_mesh(8)
    s_sh = shard_state(mesh, state)
    f_sh = shard_forcing(mesh, forcing)
    out = step(s_sh, f_sh)
    for name in ("eta", "u", "tr", "w"):
        a = np.asarray(getattr(ref, name))
        b = np.asarray(getattr(out, name))
        assert np.allclose(a, b, rtol=1e-12, atol=1e-12), name
