"""Mesh ingest + geometry tests against reference mesh data and invariants."""
import numpy as np
import pytest

from fesom2_tpu.mesh import build_mesh, read_raw_mesh
from fesom2_tpu.mesh.tables import build_edges
from fesom2_tpu.constants import r_earth, pi


def test_pi_mesh_sizes(pi_mesh):
    # reference: test/meshes/pi/{nod2d,elem2d,aux3d,edgenum}.out
    assert pi_mesh.n_nodes == 3140
    assert pi_mesh.n_elems == 5839
    assert pi_mesh.nl == 48
    assert pi_mesh.n_edges == 8986
    assert pi_mesh.n_edges_in == 8531


def test_soufflet_mesh_sizes(souf_mesh):
    assert souf_mesh.n_nodes == 2875
    assert souf_mesh.nl == 41  # soufflet aux3d


def test_edge_derivation_matches_shipped(pi_mesh_path):
    """Our edge builder must agree with the shipped edges.out topology."""
    raw = read_raw_mesh(pi_mesh_path, force_rotation=True)
    edges, edge_tri, n_in = build_edges(raw.elem_nodes, raw.coords, 2 * pi)
    assert n_in == raw.edge2D_in
    assert edges.shape == raw.edges.shape
    # same set of undirected edges
    ours = set(map(tuple, np.sort(edges, axis=1)))
    ref = set(map(tuple, np.sort(raw.edges, axis=1)))
    assert ours == ref
    # orientation convention: left triangle listed first.  Build a lookup of the
    # reference pairs and check each of our edges matches either identically or
    # fully flipped (both node order and triangle order).
    ref_map = {}
    for (a, b), (t1, t2) in zip(raw.edges, raw.edge_tri):
        ref_map[(a, b)] = (t1, t2)
    for (a, b), (t1, t2) in zip(edges, edge_tri):
        if (a, b) in ref_map:
            assert ref_map[(a, b)] == (t1, t2), ((a, b), (t1, t2), ref_map[(a, b)])
        else:
            assert ref_map[(b, a)] == (t2, t1), ((a, b), (t1, t2), ref_map[(b, a)])


def test_total_area_is_earth_like(pi_mesh):
    # pi mesh is a global ocean mesh: total ocean area ~ 3.6e14 m^2
    total = float(np.asarray(pi_mesh.elem_area).sum())
    assert 2.5e14 < total < 4.5e14
    # scalar areas at surface must tile the same total
    assert np.isclose(float(np.asarray(pi_mesh.area)[0].sum()), total, rtol=1e-12)


def test_gradient_coefficients_exact_on_linear_field(souf_mesh):
    """gradient_sca must reconstruct the gradient of a linear field exactly."""
    m = souf_mesh
    coords = np.asarray(m.coords)
    en = np.asarray(m.elem_nodes)
    ecos = np.asarray(m.elem_cos)
    # f = a*x + b*y in local meters (use y in meters; x needs cos factor)
    b = 3.0
    f = b * coords[:, 1] * r_earth
    g = np.asarray(m.gradient_sca)
    fe = f[en]  # [E,3]
    gy = (g[:, 3:6] * fe).sum(axis=1)
    gx = (g[:, 0:3] * fe).sum(axis=1)
    assert np.allclose(gy, b, rtol=1e-6)
    assert np.allclose(gx, 0.0, atol=1e-6 * abs(b))


def test_area_levels_monotone(pi_mesh):
    area = np.asarray(pi_mesh.area)
    # deeper levels can only lose area
    assert np.all(np.diff(area[:-1], axis=0) <= 1e-6)


def test_levels_consistency(pi_mesh):
    nle = np.asarray(pi_mesh.nlevels_elem)
    nln = np.asarray(pi_mesh.nlevels_node)
    en = np.asarray(pi_mesh.elem_nodes)
    # node level count = max over containing elements
    derived = np.zeros_like(nln)
    for j in range(3):
        np.maximum.at(derived, en[:, j], nle)
    assert np.array_equal(derived, nln)


def test_elem_edges_convention(pi_mesh):
    """edge j of an element must not contain node j (reference load_edges)."""
    en = np.asarray(pi_mesh.elem_nodes)
    ee = np.asarray(pi_mesh.elem_edges)
    ed = np.asarray(pi_mesh.edges)
    for j in range(3):
        nodes_of_edge = ed[ee[:, j]]  # [E,2]
        assert not np.any(nodes_of_edge == en[:, j:j + 1])


def test_coriolis_range(pi_mesh):
    cor = np.asarray(pi_mesh.coriolis)
    assert np.all(np.abs(cor) <= 2 * 2 * pi / 86400.0 + 1e-12)
    assert np.abs(cor).max() > 1e-4  # polar values present
