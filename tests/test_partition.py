"""Partitioner tests: balance, edge cut vs the shipped METIS partition."""
import numpy as np
import pytest

from fesom2_tpu.parallel.partition import (partition_nodes, edge_cut,
                                           node_weights, _load_native)


def test_native_builds():
    assert _load_native() is not None, "C++ partitioner library failed to build"


def test_partition_balance_and_cut(pi_mesh):
    nparts = 8
    part = partition_nodes(pi_mesh, nparts)
    assert part.min() == 0 and part.max() == nparts - 1
    w = node_weights(pi_mesh)
    loads = np.array([w[part == p].sum() for p in range(nparts)])
    imb = loads.max() / loads.mean()
    assert imb < 1.10, f"imbalance {imb}"
    cut = edge_cut(pi_mesh, part)
    # shipped METIS dist_8 partition cut as a quality yardstick
    ref_part = _load_reference_partition(pi_mesh)
    if ref_part is not None:
        ref_cut = edge_cut(pi_mesh, ref_part)
        assert cut < 3.0 * ref_cut, (cut, ref_cut)


def _load_reference_partition(mesh):
    """Reconstruct the shipped dist_8 partition (rpart.out + my_list files)."""
    import os
    base = "/root/reference/test/meshes/pi/dist_8"
    if not os.path.exists(base):
        return None
    part = np.full(mesh.n_nodes, -1, np.int32)
    for p in range(8):
        with open(os.path.join(base, f"my_list{p:05d}.out")) as fh:
            tokens = fh.read().split()
        i = 1                       # skip leading npes entry
        mydim = int(tokens[i]); i += 1
        edim = int(tokens[i]); i += 1
        owned = [int(t) - 1 for t in tokens[i:i + mydim]]
        part[owned] = p
    if (part < 0).any():
        return None
    return part


def test_hierarchical_partition(pi_mesh):
    """2-level partition (the &machine n_levels analog,
    gen_modules_config.F90:96-98): chip parts nest inside host groups and
    both levels are balanced."""
    from fesom2_tpu.parallel.partition import partition_nodes_hierarchical
    part, host = partition_nodes_hierarchical(pi_mesh, (2, 4))
    assert part.min() >= 0 and part.max() == 7
    assert host.min() >= 0 and host.max() == 1
    # nesting: global part id // chips == host id
    assert (part // 4 == host).all()
    sizes = np.bincount(part, minlength=8)
    assert sizes.min() > 0.5 * sizes.mean()
    hsizes = np.bincount(host, minlength=2)
    assert abs(hsizes[0] - hsizes[1]) < 0.3 * hsizes.mean()
