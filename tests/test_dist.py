"""Partition-aware distributed runtime (parallel/dist.py): local meshes,
packed halo exchange under shard_map, owned-masked reductions.

The acceptance contract (VERDICT r1 #1): the COUPLED pi model (ocean + mEVP
ice + FCT + forcing) runs sharded over 8 devices and matches the
single-device trajectory to f64 tolerance, with no full-field collectives
in the compiled stencils."""
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, "/root/repo")

from fesom2_tpu.model import setup_pi_model, pi_initial_state, \
    pi_coupled_step_fn
from fesom2_tpu.core.state import zero_forcing
from fesom2_tpu.parallel import dist

S = 8


@pytest.fixture(scope="module")
def pi_model():
    model, atm = setup_pi_model()
    # the distributed formulation uses matrix-free CG + Jacobi and no EVP
    # subdomain; prepare the model BEFORE building any step fn so the
    # single-device reference solves the same equations the same way
    dist.prepare_dist_model(model)
    return model, atm


@pytest.fixture(scope="module")
def layout(pi_model):
    model, _ = pi_model
    return dist.dist_layout_for_model(model, S)


def test_layout_invariants(pi_model, layout):
    model, _ = pi_model
    mesh = model.mesh
    lay = layout
    N, E, Ed = lay.sizes
    # every node owned exactly once; owners' slots cover all nodes
    assert lay.part.shape == (N,)
    counts = np.zeros(N, np.int64)
    for s in range(S):
        own = lay.node_l2g[s, :lay.n_own]
        counts[own[own >= 0]] += 1
    assert (counts == 1).all()
    # localize -> gather is the identity on node, elem fields
    rng = np.random.default_rng(0)
    xn = jnp.asarray(rng.normal(size=(mesh.nl - 1, N)))
    xe = jnp.asarray(rng.normal(size=(E,)))
    tree = {"n": xn, "e": xe, "scalar": jnp.asarray(3.25)}
    d = dist.localize_tree(tree, lay)
    assert d["n"].shape == (S, mesh.nl - 1, lay.n_loc)
    back = dist.gather_tree(d, lay)
    np.testing.assert_array_equal(np.asarray(back["n"]), np.asarray(xn))
    np.testing.assert_array_equal(np.asarray(back["e"]), np.asarray(xe))
    assert float(back["scalar"]) == 3.25
    # owned incidence completeness: every edge/element incident to an owned
    # node is present in that shard's local tables (no -1 beyond global pad)
    nie_g = np.asarray(mesh.nod_in_elem)
    ml = layout.mesh_local
    for s in range(min(S, 3)):
        own_g = lay.node_l2g[s, :lay.n_own]
        valid = own_g >= 0
        rows_local = np.asarray(ml.nod_in_elem)[s, :lay.n_own][valid]
        rows_global = nie_g[own_g[valid]]
        assert ((rows_local >= 0) == (rows_global >= 0)).all()


def test_halo_exchange_roundtrip(pi_model, layout):
    """Exchanging a globally-consistent field is the identity."""
    model, _ = pi_model
    mesh = model.mesh
    rng = np.random.default_rng(1)
    xg = jnp.asarray(rng.normal(size=(3, mesh.n_nodes)))
    xd = dist.localize_tree(xg, layout)

    dev = dist.device_mesh(S)
    # a sharded identity+exchange through the hook machinery
    from fesom2_tpu.core import ops

    def body(x):
        return ops.halo_fix_nodes(x)

    smapped = dist.dist_shard_map(body, dev)
    out = smapped(layout.sched, xd)
    np.testing.assert_allclose(np.asarray(out), np.asarray(xd),
                               rtol=0, atol=0)


def test_dist_assembly_matches_global(pi_model, layout):
    """edge_divergence / elem_contrib under shard_map == single device."""
    model, _ = pi_model
    mesh = model.mesh
    from fesom2_tpu.core import ops
    rng = np.random.default_rng(2)
    flux = jnp.asarray(rng.normal(size=(mesh.nl - 1, mesh.n_edges)))
    contrib = jnp.asarray(rng.normal(size=(mesh.n_elems, 3)))

    ref_div = ops.edge_divergence(flux, mesh)
    ref_ctn = ops.elem_contrib_to_nodes(contrib, mesh)

    dev = dist.device_mesh(S)

    def body(fl, ct, m):
        return ops.edge_divergence(fl, m), \
            ops.elem_contrib_to_nodes(ct.T, m)

    smapped = dist.dist_shard_map(body, dev)
    fl_d = dist.localize_tree(flux, layout)
    # localize_tree dispatches on the LAST axis: pass [3, E]
    ct_d = dist.localize_tree(contrib.T, layout)
    div_d, ctn_d = smapped(layout.sched, fl_d, ct_d, layout.mesh_local)
    div_g = dist.gather_tree(div_d, layout)
    ctn_g = dist.gather_tree(ctn_d, layout)
    np.testing.assert_allclose(np.asarray(div_g), np.asarray(ref_div),
                               rtol=0, atol=0)
    np.testing.assert_allclose(np.asarray(ctn_g), np.asarray(ref_ctn),
                               rtol=0, atol=0)


def test_dist_ocean_step_matches(pi_model, layout):
    model, _ = pi_model
    state, _ = pi_initial_state(model)
    forcing = zero_forcing(model.mesh, jnp.float64)
    ref = model.step_fn()(state, forcing)

    dstep = dist.dist_step_fn(model, layout)
    sd = dist.localize_tree(state, layout)
    fd = dist.localize_tree(forcing, layout)
    out_d = dstep(sd, fd)
    out = dist.gather_tree(out_d, layout)
    # tolerances: the single-device reference solves SSH with Jacobi CG,
    # the dist step with the block-Schwarz PC; both converge to relative
    # residual 1e-10, so the SOLUTIONS agree only to ~residual/lambda_min
    # (measured 5.6e-9 on eta).  Everything else is psum ordering.
    for name, tol in (("eta", 5e-8), ("tr", 5e-8), ("u", 5e-8),
                      ("w", 5e-8), ("hbar", 5e-8)):
        a = np.asarray(getattr(ref, name))
        b = np.asarray(getattr(out, name))
        scale = max(np.abs(a).max(), 1e-12)
        assert np.abs(a - b).max() / scale < tol, \
            f"{name}: {np.abs(a - b).max() / scale:.2e}"


def test_dist_coupled_matches(pi_model, layout):
    """THE acceptance test: 2 coupled steps (EVP + ice FCT + thermo +
    forcing + full ocean) sharded == single-device."""
    model, atm = pi_model
    state, ice = pi_initial_state(model)
    step1 = pi_coupled_step_fn(model, atm)
    s_ref, i_ref = state, ice
    for k in range(2):
        s_ref, i_ref, _ = step1(s_ref, i_ref, jnp.asarray(k))

    dstep = dist.dist_pi_coupled_step_fn(model, atm, layout)
    sd = dist.localize_tree(state, layout)
    idd = dist.localize_tree(ice, layout)
    for k in range(2):
        sd, idd, _ = dstep(sd, idd, k)
    s_out = dist.gather_tree(sd, layout)
    i_out = dist.gather_tree(idd, layout)

    # tolerances: the only nondeterminism is psum summation order in the
    # CG scalars + flux balancing; KPP's boundary-layer index can flip on
    # a 1-ulp Rib difference, turning that into O(1e-8) field deltas over
    # 2 coupled steps (naive sharding errors would be O(1))
    for name, tol in (("eta", 1e-7), ("tr", 1e-7), ("u", 1e-6),
                      ("w", 1e-7), ("hnode", 1e-9)):
        a = np.asarray(getattr(s_ref, name))
        b = np.asarray(getattr(s_out, name))
        scale = max(np.abs(a).max(), 1e-12)
        assert np.abs(a - b).max() / scale < tol, \
            f"ocean {name}: {np.abs(a - b).max() / scale:.2e}"
    for name in ("a_ice", "m_ice", "u_ice", "v_ice"):
        a = np.asarray(getattr(i_ref, name))
        b = np.asarray(getattr(i_out, name))
        scale = max(np.abs(a).max(), 1e-12)
        assert np.abs(a - b).max() / scale < 1e-7, \
            f"ice {name}: {np.abs(a - b).max() / scale:.2e}"


def test_hierarchical_layout(pi_model, layout):
    """Topology-aware (hosts, chips) partition (&machine n_levels/n_part
    analog, gen_modules_config.F90:96-98): the inter-GROUP edge cut — the
    traffic that would cross DCN — must be smaller than grouping the flat
    partition's shards arbitrarily, and the layout must run the dist ocean
    step to single-device agreement."""
    from fesom2_tpu.parallel.partition import edge_cut
    model, _ = pi_model
    mesh = model.mesh
    hosts, chips = 2, 4
    lay_h = dist.dist_layout_for_model(model, S, n_part=(hosts, chips))
    edges = np.asarray(mesh.edges)

    def group_cut(part, host_of_shard):
        ga = host_of_shard[part[edges[:, 0]]]
        gb = host_of_shard[part[edges[:, 1]]]
        return int((ga != gb).sum())

    nested = np.arange(S) // chips
    interleaved = np.arange(S) % hosts
    cut_h = group_cut(lay_h.part, nested)
    # vs an arbitrary (interleaved) shard->host placement of the flat
    # partition: the topology-aware layout must keep far more halo pairs
    # intra-host.  (The flat RCB ids are already recursion-nested, so the
    # nested grouping of the flat partition is the fair lower baseline.)
    cut_bad = group_cut(layout.part, interleaved)
    cut_flat_nested = group_cut(layout.part, nested)
    total_cut = int((lay_h.part[edges[:, 0]] != lay_h.part[edges[:, 1]]).sum())
    assert cut_h < cut_bad, f"hierarchical {cut_h} vs arbitrary {cut_bad}"
    assert cut_h <= cut_flat_nested
    assert cut_h < total_cut / 2, "most halo traffic must stay intra-host"
    # each shard nonempty
    assert len(np.unique(lay_h.part)) == S

    state, _ = pi_initial_state(model)
    forcing = zero_forcing(model.mesh, jnp.float64)
    ref = model.step_fn()(state, forcing)
    dstep = dist.dist_step_fn(model, lay_h)
    out = dist.gather_tree(
        dstep(dist.localize_tree(state, lay_h),
              dist.localize_tree(forcing, lay_h)), lay_h)
    for name in ("eta", "tr", "u"):
        a = np.asarray(getattr(ref, name))
        b = np.asarray(getattr(out, name))
        scale = max(np.abs(a).max(), 1e-12)
        assert np.abs(a - b).max() / scale < 5e-8, name


def test_dist_block_schwarz_pc(pi_model, layout):
    """The distributed SSH preconditioner (pARMS-RAS role, psolve.c:16-115):
    per-shard block-Schwarz on the [owned|halo] numbering must (a) converge
    in substantially fewer iterations than point-Jacobi and (b) produce the
    same solution; the halo->owner reverse accumulation must be exact."""
    from fesom2_tpu.core import ssh, ops
    model, _ = pi_model
    mesh, cfg = model.mesh, model.cfg
    state, _ = pi_initial_state(model)
    rng = np.random.default_rng(4)
    rhs_g = jnp.asarray(rng.normal(size=mesh.n_nodes) * 1e-3)
    x_ref, it_ref, _ = ssh.solve_ssh(state, mesh, cfg, model.ssh_diag_inv,
                                     rhs_g)

    sd = dist.localize_tree(state, layout)
    rd = dist.localize_tree(rhs_g, layout)
    dev = dist.device_mesh(S)

    # reverse accumulation is exact: random local contributions sum to the
    # per-node total over every shard-local slot referencing the node
    x_loc = rng.normal(size=(S, layout.n_loc))
    x_loc[layout.node_l2g < 0] = 0.0
    expect = np.zeros(mesh.n_nodes)
    for s in range(S):
        v = layout.node_l2g[s] >= 0
        np.add.at(expect, layout.node_l2g[s][v], x_loc[s][v])
    acc = dist.dist_shard_map(ops.halo_accumulate_nodes, dev)
    got = dist.gather_tree(acc(layout.sched, jnp.asarray(x_loc)), layout)
    np.testing.assert_allclose(np.asarray(got), expect, rtol=1e-13)

    def solve(st, rhs, pc, m):
        return ssh.solve_ssh(st, m, cfg, pc, rhs)

    sm = dist.dist_shard_map(solve, dev)
    xj, itj, _ = sm(layout.sched, sd, rd, layout.diag_inv_local,
                    layout.mesh_local)
    xb, itb, _ = sm(layout.sched, sd, rd, layout.block_pc_local,
                    layout.mesh_local)
    itj, itb = int(np.asarray(itj)[0]), int(np.asarray(itb)[0])
    assert itb * 2 < itj, f"block PC {itb} vs Jacobi {itj} iterations"
    xbg = np.asarray(dist.gather_tree(xb, layout))
    xr = np.asarray(x_ref)
    assert np.abs(xbg - xr).max() / np.abs(xr).max() < 1e-8


def test_halo_consistency_check(pi_model, layout):
    """The in-run halo cross-check (gen_halo_exchange.F90:146 analog):
    passes on the post-step state (the runtime keeps halos owner-
    consistent) and catches a deliberately corrupted halo slot."""
    model, atm = pi_model
    state, ice = pi_initial_state(model)
    dstep = dist.dist_pi_coupled_step_fn(model, atm, layout)
    sd = dist.localize_tree(state, layout)
    idd = dist.localize_tree(ice, layout)
    sd, idd, _ = dstep(sd, idd, 0)
    bad = dist.check_halo_consistency({"tr": sd.tr, "eta": sd.eta,
                                       "u": sd.u, "a_ice": idd.a_ice},
                                      layout, atol=1e-12)
    assert not bad, bad
    # corrupt one real halo slot -> must be detected
    s = 0
    h = int(np.nonzero(layout.node_l2g[s, layout.n_own:] >= 0)[0][0])
    eta_bad = sd.eta.at[s, layout.n_own + h].add(1.0)
    bad = dist.check_halo_consistency({"eta": eta_bad}, layout, atol=1e-12)
    assert bad and bad[0][1] == "node"


def test_no_full_field_collectives(pi_model, layout):
    """Compiled HLO of the distributed coupled step must not move
    full-field payloads: every collective operand stays halo-sized
    (VERDICT r1: round 1's GSPMD all-gathered whole fields per stencil)."""
    import re
    model, atm = pi_model
    state, ice = pi_initial_state(model)
    sd = dist.localize_tree(state, layout)
    idd = dist.localize_tree(ice, layout)

    from fesom2_tpu.model import pi_coupled_parts
    dist.prepare_dist_model(model)
    step_impl, SP_raw = pi_coupled_parts(model, atm)
    SP_loc = dist._dist_statics(model, SP_raw, layout)
    dev = dist.device_mesh(S)
    smapped = dist.dist_shard_map(step_impl, dev)
    ks = jnp.zeros((S,), jnp.int32)
    txt = jax.jit(smapped).lower(layout.sched, sd, idd, ks, SP_loc) \
        .compile().as_text()

    N = model.mesh.n_nodes
    bad = []
    n_coll = 0
    n_perm = 0
    for line in txt.splitlines():
        is_perm = " collective-permute(" in line \
            or " collective-permute-start(" in line
        if (" all-to-all(" not in line and " all-gather(" not in line
                and not is_perm):
            continue
        n_coll += 1
        n_perm += int(is_perm)
        for m in re.finditer(r"\[([0-9,]+)\]", line):
            dims = [int(d) for d in m.group(1).split(",") if d]
            if any(d >= N for d in dims):
                bad.append(line.strip()[:140])
                break
    assert n_coll > 0, "no collectives compiled — test would be vacuous"
    # the forward halo path must compile to neighbor-wise collective
    # permutes (per-pair-sized buffers), not dense all_to_all
    assert n_perm > 0, "no collective-permute compiled; neighbor-wise " \
        "exchange not in effect"
    assert not bad, f"full-field collectives found: {bad[:5]}"
