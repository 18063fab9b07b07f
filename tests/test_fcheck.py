"""Golden-mean output checking (the mkrun/fcheck run-tooling analog,
.github/workflows + setups/*/setup.yml fcheck blocks in the reference)."""
import os

import numpy as np

from fesom2_tpu.io.netcdf import write_dataset
from fesom2_tpu.post.fcheck import field_means, fcheck, write_goldens, load_goldens


def _fake_result(tmp_path):
    d = str(tmp_path)
    write_dataset(os.path.join(d, "fesom.1948.temp.nc"),
                  {"time": None, "nod2": 5},
                  {"time": (("time",), np.asarray([86400.0])),
                   "temp": (("time", "nod2"),
                            np.asarray([[1.0, 2.0, 3.0, 4.0, 5.0]]))})
    write_dataset(os.path.join(d, "fesom.1948.sst.nc"),
                  {"time": None, "nod2": 5},
                  {"time": (("time",), np.asarray([86400.0])),
                   "sst": (("time", "nod2"),
                           np.asarray([[8.0, 8.0, 9.0, 9.0, 8.5]]))})
    return d


def test_field_means_and_roundtrip(tmp_path):
    d = _fake_result(tmp_path)
    m = field_means(d)
    assert abs(m["temp"] - 3.0) < 1e-12
    assert abs(m["sst"] - 8.5) < 1e-12
    gold = os.path.join(d, "golden.yml")
    write_goldens(d, gold)
    parsed = load_goldens(gold)
    assert abs(parsed["temp"] - 3.0) < 1e-12
    assert fcheck(d, gold, verbose=False)


def test_fcheck_detects_drift(tmp_path):
    d = _fake_result(tmp_path)
    gold = os.path.join(d, "golden.yml")
    write_goldens(d, gold)
    # perturb output beyond rtol
    write_dataset(os.path.join(d, "fesom.1948.sst.nc"),
                  {"time": None, "nod2": 5},
                  {"time": (("time",), np.asarray([86400.0])),
                   "sst": (("time", "nod2"),
                           np.asarray([[9.0, 9.0, 9.0, 9.0, 9.0]]))})
    assert not fcheck(d, gold, rtol=1e-4, verbose=False)


def test_reference_golden_yaml_parses():
    """The reference CI golden block itself must parse (same format)."""
    path = "/root/reference/setups/test_pi/setup.yml"
    if not os.path.exists(path):
        return
    gold = load_goldens(path)
    assert "temp" in gold and abs(gold["temp"] - 1.701768707848739) < 1e-12


def test_icepack_setup_yaml_maps_to_opts():
    """mkrun detects the icepack CI variant from its namelist.icepack
    section and maps the env_nml/tracer_nml keys to IcepackConfig
    (setups/test_pi_icepack/setup.yml + config/namelist.icepack)."""
    path = "/root/reference/setups/test_pi_icepack/setup.yml"
    if not os.path.exists(path):
        return
    from fesom2_tpu.mkrun import load_setup
    from fesom2_tpu.ice.icepack import IcepackConfig
    cfg, mesh_path, forcing_path, goldens, ipk_opts, io_list = \
        load_setup(path)
    assert ipk_opts is not None
    ipc = IcepackConfig(**ipk_opts)
    # defaults of the reference namelist.icepack env_nml/thermo_nml
    assert ipc.ncat == 5 and ipc.nilyr == 4 and ipc.nslyr == 4
    assert ipc.kitd == 1 and ipc.conduct == "bubbly"
    assert not ipc.tr_pond_cesm            # trpnd = 0 in the base file
    # the plain test_pi setup has no icepack section
    from fesom2_tpu.mkrun import load_setup as ls
    none_opts = ls("/root/reference/setups/test_pi/setup.yml")[4]
    assert none_opts is None
