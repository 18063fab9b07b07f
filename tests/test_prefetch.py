"""Async forcing prefetch (ref forcing_provider_async_module.F90,
forcing_lookahead_reader_module.F90)."""
import os

import numpy as np

from fesom2_tpu.io.netcdf import write_dataset
from fesom2_tpu.forcing import prefetch


def _make_file(path, nt=6, n=17, scale=1.0):
    data = (np.arange(nt)[:, None] * 100.0 + np.arange(n)[None, :]) * scale
    write_dataset(path, {"time": None, "n": n},
                  {"q": (("time", "n"), data.astype(np.float32))})
    return data


def test_lookahead_sequential(tmp_path):
    p = str(tmp_path / "f.nc")
    data = _make_file(p)
    r = prefetch.LookaheadReader(p, "q")
    for i in range(6):
        got = r.yield_data(i)
        assert np.allclose(got, data[i])
    r.close()


def test_lookahead_random_access_and_sync_mode(tmp_path):
    p = str(tmp_path / "f.nc")
    data = _make_file(p)
    r = prefetch.LookaheadReader(p, "q", async_allowed=False)
    for i in (3, 0, 5, 2, 2):
        assert np.allclose(r.yield_data(i), data[i])
    r.close()


def test_provider_year_switch(tmp_path):
    p1 = str(tmp_path / "y1948.nc")
    p2 = str(tmp_path / "y1949.nc")
    d1 = _make_file(p1, scale=1.0)
    d2 = _make_file(p2, scale=-2.0)
    prov = prefetch.AsyncForcingProvider()
    assert np.allclose(prov.get(p1, "q", 0), d1[0])
    assert np.allclose(prov.get(p1, "q", 1), d1[1])
    # year switch re-opens the reader (ref :66-80)
    assert np.allclose(prov.get(p2, "q", 0), d2[0])
    assert np.allclose(prov.get(p2, "q", 5), d2[5])
    prov.close()


def test_atm_window_matches_full_series():
    """atm_window slices the preloaded series to a time window without
    changing the interpolated state inside it (HBM relief for CORE2+
    meshes; see bench.py)."""
    import jax.numpy as jnp
    from fesom2_tpu.forcing.atmos import AtmData, atm_window, atm_state_at

    rng = np.random.RandomState(5)
    T, Tr, Tp, N = 40, 10, 4, 7
    tw = np.arange(T) * 21600.0 + 10800.0
    trad = np.arange(Tr) * 86400.0 + 43200.0
    tp = np.arange(Tp) * 30 * 86400.0
    mk = lambda t: jnp.asarray(rng.randn(len(t), N))
    atm = AtmData(u_wind=mk(tw), v_wind=mk(tw), tair=mk(tw), shum=mk(tw),
                  t_wind=jnp.asarray(tw),
                  swdn=mk(trad), lwdn=mk(trad), t_rad=jnp.asarray(trad),
                  prec=mk(tp), snow=mk(tp), t_prec=jnp.asarray(tp),
                  runoff=jnp.asarray(rng.randn(N)))
    w = atm_window(atm, 2 * 86400.0, 4 * 86400.0)
    assert w.u_wind.shape[0] < T
    for t in (2 * 86400.0, 2.5 * 86400.0, 3.9 * 86400.0):
        a = atm_state_at(atm, jnp.asarray(t))
        b = atm_state_at(w, jnp.asarray(t))
        for k in a:
            assert np.allclose(np.asarray(a[k]), np.asarray(b[k]),
                               atol=1e-12), (k, t)
