"""f32 smoke test of the benchmark's own configuration.

Round-2 post-mortem: the CI-parity coupled config (zstar + KPP + GM/Redi)
went NaN in ONE step at f32 because KPP's division guard ``epsln = 1e-40``
(faithful to ``oce_ale_mixing_kpp.F90:48``, which assumes REAL*8) is
subnormal in f32 and flushed to zero on TPU.  The whole test suite ran f64,
so the benchmark dtype was never exercised.  This test runs the exact
bench.py configuration (dtype and parity) for several steps on CPU and
asserts the state stays finite — it must stay NON-slow so it always runs.
"""
import numpy as np
import jax.numpy as jnp

from fesom2_tpu.model import setup_pi_model, pi_initial_state, pi_coupled_step_fn


def test_ci_parity_coupled_f32_stays_finite():
    model, atm = setup_pi_model(dtype=jnp.float32, n_refine=0, parity="ci")
    state, ice = pi_initial_state(model, dtype=jnp.float32)
    assert state.eta.dtype == jnp.float32
    step = pi_coupled_step_fn(model, atm)
    for k in range(5):
        state, ice, _ = step(state, ice, jnp.asarray(k))
    # dtype stability: under x64 any weak-typing leak (strong f64 scalar or
    # default-dtype constructor) promotes a field and poisons later steps
    import jax
    for leaf in jax.tree.leaves((state, ice)):
        if hasattr(leaf, "dtype") and jnp.issubdtype(leaf.dtype, jnp.floating):
            assert leaf.dtype == jnp.float32, f"f64 leak: {leaf.shape}"
    for name in ("eta", "u", "v", "w", "tr", "Kv", "Av"):
        arr = np.asarray(getattr(state, name))
        assert np.isfinite(arr).all(), f"{name} non-finite at f32"
    mask = np.asarray(model.mesh.node_layer_mask)
    T = np.asarray(state.tr[0])[mask]
    assert T.min() > -4.0 and T.max() < 40.0
    assert np.abs(np.asarray(state.eta)).max() < 3.0
    assert np.isfinite(np.asarray(ice.m_ice)).all()
