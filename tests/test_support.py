"""gen_support utilities: smoothing, integrals, extrapolation
(ref gen_support.F90:46-418)."""
import numpy as np
import jax
import jax.numpy as jnp

from fesom2_tpu.utils import support


def test_smooth_nod_preserves_constant(souf_mesh):
    c = jnp.full(souf_mesh.n_nodes, 3.5)
    out = jax.jit(lambda a: support.smooth_nod(a, 3, souf_mesh))(c)
    assert np.allclose(np.asarray(out), 3.5)


def test_smooth_nod_damps_noise(souf_mesh):
    rng = np.random.default_rng(0)
    noise = jnp.asarray(rng.standard_normal(souf_mesh.n_nodes))
    out = support.smooth_nod(noise, 2, souf_mesh)
    assert float(jnp.std(out)) < 0.6 * float(jnp.std(noise))
    # area-weighted mean approximately preserved on the periodic channel
    a = souf_mesh.area[0]
    assert abs(float((out * a).sum() - (noise * a).sum())
               / float(jnp.abs(noise * a).sum())) < 0.2


def test_smooth_elem_constant_and_shape(souf_mesh):
    c = jnp.full(souf_mesh.n_elems, -1.25)
    out = support.smooth_elem(c, 2, souf_mesh)
    assert np.allclose(np.asarray(out), -1.25)
    # 3D variant over layers
    arr = jnp.ones((souf_mesh.nl - 1, souf_mesh.n_elems))
    out3 = support.smooth_elem(arr, 1, souf_mesh)
    assert out3.shape == arr.shape
    assert np.allclose(np.asarray(out3), 1.0)


def test_integrate_nod(souf_mesh):
    one = jnp.ones(souf_mesh.n_nodes)
    area_tot = float(np.asarray(souf_mesh.area[0]).sum())
    assert float(support.integrate_nod_2d(one, souf_mesh)) == \
        np.float64(area_tot)
    from fesom2_tpu.core.state import allocate_state, init_thickness_linfs
    st = init_thickness_linfs(allocate_state(souf_mesh), souf_mesh)
    f3 = jnp.ones((souf_mesh.nl - 1, souf_mesh.n_nodes))
    vol = float(support.integrate_nod_3d(f3, st.hnode, souf_mesh))
    # full-depth channel: volume = sum(area*h) over wet cells
    ref = float(np.where(np.asarray(souf_mesh.node_layer_mask),
                         np.asarray(st.hnode * souf_mesh.areasvol[:-1]),
                         0.0).sum())
    assert abs(vol - ref) / ref < 1e-12


def test_extrap_nod_fills_dummy(souf_mesh):
    nl1 = souf_mesh.nl - 1
    N = souf_mesh.n_nodes
    dummy = 1e20
    arr = np.full((nl1, N), dummy)
    # seed a single valid node in layer 0
    nln = np.asarray(souf_mesh.nlevels_node)
    seed = int(np.argmax(nln))               # deepest node
    arr[0, seed] = 7.0
    out = support.extrap_nod(arr, souf_mesh, dummy)
    lmask = np.asarray(souf_mesh.node_layer_mask)
    assert (out[lmask] == 7.0).all()
