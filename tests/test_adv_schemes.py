"""Advection scheme menu: each vertical/horizontal scheme integrates stably
and conserves tracer content on the soufflet channel."""
import numpy as np
import jax.numpy as jnp
import pytest

from fesom2_tpu.model import setup_soufflet_model
from fesom2_tpu.core.state import zero_forcing


@pytest.mark.parametrize("ver", ["QR4C", "PPM", "CDIFF", "UPW1"])
def test_vertical_scheme(ver):
    model = setup_soufflet_model()
    model.cfg.tra.tra_adv_ver = ver
    state = model.initial_state()
    step = model.step_fn()
    forcing = zero_forcing(model.mesh)
    area = np.asarray(model.mesh.areasvol)[:-1]
    mask = np.asarray(model.mesh.node_layer_mask)

    def salt(s):
        return float((np.where(mask, np.asarray(s.tr[1] * s.hnode), 0.0)
                      * area).sum())

    s0 = salt(state)
    for _ in range(4):
        state = step(state, forcing)
    assert np.isfinite(np.asarray(state.tr)).all(), ver
    # salinity initialized uniform 35: schemes must keep it within bounds
    S = np.asarray(state.tr[1])[mask]
    assert S.min() > 34.0 and S.max() < 36.0, ver
    assert abs(salt(state) - s0) / s0 < 1e-7, ver


def test_upw1_horizontal():
    model = setup_soufflet_model()
    model.cfg.tra.tra_adv_hor = "UPW1"
    model.cfg.tra.tra_adv_lim = "NONE"
    state = model.initial_state()
    step = model.step_fn()
    forcing = zero_forcing(model.mesh)
    for _ in range(3):
        state = step(state, forcing)
    assert np.isfinite(np.asarray(state.tr)).all()
