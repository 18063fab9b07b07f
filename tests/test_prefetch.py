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
