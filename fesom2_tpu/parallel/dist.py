"""Partition-aware distributed runtime: per-shard local meshes + explicit
halo exchange under shard_map.

This is the TPU-native replacement for the reference's entire L3 layer:

- METIS domain decomposition + contiguous per-rank renumbering
  (``gen_modules_partitioning.F90:14-75``, ``fvom_init.F90:1421-1540``)
  -> :func:`build_layout`: the node graph is partitioned by the offline
  partitioner (``parallel/partition.py``, the METIS-role component), and
  every shard gets a LOCAL mesh whose entities are renumbered into
  [owned | pad | halo | pad] blocks of uniform (static) sizes.
- precomputed per-neighbor indexed halo datatypes + exchange_nod/exchange_elem
  (``gen_modules_partitioning.F90:190-477``, ``gen_halo_exchange.F90:129-164``)
  -> :class:`HaloSchedule` + :class:`DistContext`: packed send tables and
  receive maps, executed as ONE ``lax.all_to_all`` over the ``"cell"`` mesh
  axis per exchange (ICI collective, no host round trips).  The exchange is
  invoked from hooks inside the assembly operators (``core/ops.py``), i.e.
  after each kernel family — exactly where the reference exchanges.
- the communication-structure construction of ``gen_comm.F90:12-657``
  -> the closure computation in :func:`build_layout` (which entities each
  shard needs: owned + 1 ring of elements/edges + the MUSCL up/downwind
  triangles, mirroring eDim/eXDim).

Correctness invariants (why the physics code runs UNCHANGED per shard):

1. Local index tables are complete for OWNED entities: every edge/element
   incident to an owned node is local, every edge of an owned element is
   local, and every element adjacent to those edges is local.  Assemblies
   therefore produce exact values at owned slots.
2. Assemblies leave garbage at halo slots; the ops-layer hook immediately
   replaces halos with the owners' values (``halo_fix_nodes/elems``).  Thus
   every node/element field is owner-consistent at ALL local slots at all
   times, so pure gathers (node->elem, node->edge, elem->edge) need no
   communication at all.
3. Global reductions (CG dot products, flux balancing) run as owned-masked
   ``lax.psum`` (``ops.node_sum``).

Edges carry no prognostic state and are never exchanged: every local edge
value is recomputed from owner-consistent node/element inputs.
"""
from __future__ import annotations

import dataclasses
from dataclasses import dataclass

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..mesh import MeshTables
from ..core.tracer_setup import TracerStatics
from .partition import partition_nodes

AXIS = "cell"


# --------------------------------------------------------------------------
# schedule + runtime context
# --------------------------------------------------------------------------
@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class HaloSchedule:
    """Per-shard exchange tables, stacked on a leading shard axis [S, ...]."""
    node_send: jnp.ndarray    # [S, S, Mn] i32: local idx of owned node that
    #                           shard s sends to shard d at slot m; -1 pad
    node_src: jnp.ndarray     # [S, Hn] i32: per halo slot, index into the
    #                           flattened all_to_all receive [S*Mn]; -1 pad
    elem_send: jnp.ndarray    # [S, S, Me] i32
    elem_src: jnp.ndarray     # [S, He] i32
    own_node_f: jnp.ndarray   # [S, n_loc] 1.0 at real owned node slots
    # reverse (halo -> owner accumulation) tables, the exchange_nod
    # "sum-into-owner" direction used by the distributed block-Schwarz
    # preconditioner combine (pARMS-RAS role):
    node_rev_pack: jnp.ndarray    # [S, S*Mn] i32: halo-slot index (into the
    #                               halo sub-array) to place at each flat
    #                               send position, or -1
    node_rev_gather: jnp.ndarray  # [S, n_own, R] i32: flat recv positions
    #                               (d*Mn+m) contributing to each owned slot
    # OPTIONAL ice-subdomain node exchange (EVP polar-cap restriction under
    # dist): same structure on the subdomain numbering.  exchange_nodes
    # dispatches on the trailing-axis size (sub_total != n_loc by padding).
    sub_send: jnp.ndarray = None  # [S, S, Ms] i32
    sub_src: jnp.ndarray = None   # [S, Hs] i32
    # neighbor-wise exchange (replaces the dense S x S all_to_all on the
    # forward path): edge-colored ppermute rounds with PER-PAIR-sized
    # buffers.  round r: [S, M_r] send-index table; received buffers are
    # concatenated and one gather (halo_src) scatters them to halo slots.
    # The payload per shard is its actual boundary size (O(sqrt(S)) pairs)
    # instead of S*M (gen_halo_exchange.F90's per-neighbor datatypes are
    # the reference precedent).
    node_round_send: tuple = ()   # tuple of [S, M_r] i32
    node_halo_src: jnp.ndarray = None   # [S, Hn] i32 into concat'd recv
    elem_round_send: tuple = ()
    elem_halo_src: jnp.ndarray = None
    sub_round_send: tuple = ()
    sub_halo_src: jnp.ndarray = None
    n_own_node: int = dataclasses.field(default=0,
                                        metadata=dict(static=True))
    n_own_elem: int = dataclasses.field(default=0,
                                        metadata=dict(static=True))
    n_own_sub: int = dataclasses.field(default=0,
                                       metadata=dict(static=True))
    # static per-round ppermute permutations: tuple (per entity kind) of
    # tuples of ((src, dst), ...) pairs
    node_perms: tuple = dataclasses.field(default=(),
                                          metadata=dict(static=True))
    elem_perms: tuple = dataclasses.field(default=(),
                                          metadata=dict(static=True))
    sub_perms: tuple = dataclasses.field(default=(),
                                         metadata=dict(static=True))


class DistContext:
    """Runtime halo-exchange + reduction hooks, built INSIDE shard_map from
    the squeezed per-shard schedule."""

    def __init__(self, sched: HaloSchedule, axis: str = AXIS):
        self.axis = axis
        self.node_send = sched.node_send      # [S, Mn]
        self.node_src = sched.node_src        # [Hn]
        self.elem_send = sched.elem_send
        self.elem_src = sched.elem_src
        self.own_node_f = sched.own_node_f    # [n_loc]
        self.node_rev_pack = sched.node_rev_pack      # [S*Mn]
        self.node_rev_gather = sched.node_rev_gather  # [n_own, R]
        self.n_own_node = sched.n_own_node
        self.n_own_elem = sched.n_own_elem
        self.n_loc = sched.own_node_f.shape[-1]
        self.sub_send = sched.sub_send
        self.sub_src = sched.sub_src
        self.n_own_sub = sched.n_own_sub
        self.sub_total = (sched.n_own_sub + sched.sub_src.shape[-1]
                          if sched.sub_src is not None else -1)
        self.node_rounds = (sched.node_perms, sched.node_round_send,
                            sched.node_halo_src)
        self.elem_rounds = (sched.elem_perms, sched.elem_round_send,
                            sched.elem_halo_src)
        self.sub_rounds = (sched.sub_perms, sched.sub_round_send,
                           sched.sub_halo_src)

    def _exchange(self, x, send, src, n_own):
        """x [..., n_own + H]: one packed all_to_all halo refresh."""
        valid = send >= 0                                   # [S, M]
        buf = jnp.take(x, jnp.where(valid, send, 0), axis=-1)
        zero = jnp.zeros((), x.dtype)
        buf = jnp.where(valid, buf, zero)                   # [..., S, M]
        recv = jax.lax.all_to_all(buf, self.axis,
                                  split_axis=buf.ndim - 2,
                                  concat_axis=buf.ndim - 2)
        rf = recv.reshape(recv.shape[:-2] + (-1,))          # [..., S*M]
        hvalid = src >= 0
        halo = jnp.take(rf, jnp.where(hvalid, src, 0), axis=-1)
        halo = jnp.where(hvalid, halo, zero)
        return jnp.concatenate([x[..., :n_own], halo], axis=-1)

    def _exchange_rounds(self, x, rounds, n_own, H):
        """Neighbor-wise halo refresh: one ppermute per edge-colored round
        with a per-pair-sized buffer, then ONE gather from the concatenated
        receive buffers into the halo block.  Payload = the shard's actual
        boundary, not S*M; independent rounds let the XLA latency-hiding
        scheduler overlap them with surrounding compute (collective-
        permute-start/done)."""
        perms, sends, halo_src = rounds
        zero = jnp.zeros((), x.dtype)
        recs = []
        for perm, sidx in zip(perms, sends):
            v = sidx >= 0
            buf = jnp.where(v, jnp.take(x, jnp.where(v, sidx, 0), axis=-1),
                            zero)
            recs.append(jax.lax.ppermute(buf, self.axis, list(perm)))
        if not recs:
            halo = jnp.zeros(x.shape[:-1] + (H,), x.dtype)
            return jnp.concatenate([x[..., :n_own], halo], axis=-1)
        cat = jnp.concatenate(recs, axis=-1)
        hv = halo_src >= 0
        halo = jnp.where(hv, jnp.take(cat, jnp.where(hv, halo_src, 0),
                                      axis=-1), zero)
        return jnp.concatenate([x[..., :n_own], halo], axis=-1)

    def exchange_nodes(self, x):
        # EVP on the per-shard ice subdomain assembles on sub-sized arrays;
        # route those through the subdomain schedule (sizes are kept
        # distinct by construction, see _build_ice_sub_local)
        if x.shape[-1] == self.sub_total:
            return self._exchange_rounds(x, self.sub_rounds, self.n_own_sub,
                                         self.sub_total - self.n_own_sub)
        return self._exchange_rounds(x, self.node_rounds, self.n_own_node,
                                     self.n_loc - self.n_own_node)

    def exchange_elems(self, x):
        return self._exchange_rounds(x, self.elem_rounds, self.n_own_elem,
                                     self.elem_src.shape[-1])

    def accumulate_nodes(self, x):
        """Reverse exchange: ADD halo-slot contributions of x [..., n_loc]
        into their owners' slots, then refresh halos owner-consistent.

        This is the 'sum into owner' direction of exchange_nod (the
        reference accumulates remote assembly contributions through the
        same channel); used by the distributed block-Schwarz combine whose
        boundary blocks write contributions at halo slots."""
        n_own = self.n_own_node
        halo = x[..., n_own:]
        pv = self.node_rev_pack >= 0                       # [S*M]
        buf = jnp.take(halo, jnp.where(pv, self.node_rev_pack, 0), axis=-1)
        zero = jnp.zeros((), x.dtype)
        buf = jnp.where(pv, buf, zero)
        S = self.node_send.shape[0]
        buf = buf.reshape(buf.shape[:-1] + (S, -1))        # [..., S, M]
        recv = jax.lax.all_to_all(buf, self.axis,
                                  split_axis=buf.ndim - 2,
                                  concat_axis=buf.ndim - 2)
        rf = recv.reshape(recv.shape[:-2] + (-1,))         # [..., S*M]
        gv = self.node_rev_gather >= 0                     # [n_own, R]
        add = jnp.take(rf, jnp.where(gv, self.node_rev_gather, 0), axis=-1)
        add = jnp.where(gv, add, zero).sum(-1)             # [..., n_own]
        owned = x[..., :n_own] + add
        full = jnp.concatenate([owned, halo], axis=-1)
        return self.exchange_nodes(full)

    def gsum_nodes(self, v):
        """Owned-masked global sum of a [..., n_loc] node field.

        jnp.where (not multiply): pad/halo slots may legitimately hold
        NaN scratch, and 0*NaN would poison the reduction."""
        zero = jnp.zeros((), v.dtype)
        return jax.lax.psum(jnp.sum(jnp.where(self.own_node_f > 0, v, zero)),
                            self.axis)


# --------------------------------------------------------------------------
# layout construction (host-side numpy, runs once at setup)
# --------------------------------------------------------------------------
@dataclass
class DistLayout:
    S: int
    part: np.ndarray              # [N] node -> shard
    n_own: int                    # padded owned-node block size
    n_loc: int                    # owned + halo block
    e_own: int
    e_loc: int
    ed_loc: int
    sizes: tuple                  # (N, E, Ed) of the global mesh
    node_l2g: np.ndarray          # [S, n_loc] global id or -1
    elem_l2g: np.ndarray          # [S, e_loc]
    edge_l2g: np.ndarray          # [S, ed_loc]
    node_from: np.ndarray         # [N] gather idx into flattened [S*n_loc]
    elem_from: np.ndarray         # [E]
    sched: HaloSchedule
    mesh_local: MeshTables        # stacked [S, ...] local meshes
    st_local: TracerStatics       # stacked localized tracer statics (or None)
    diag_inv_local: jnp.ndarray   # stacked Jacobi preconditioner [S, n_loc]
    block_pc_local: object = None  # stacked per-shard BlockSchwarz (or None)
    ice_sub_local: object = None   # stacked per-shard IceSubdomain (or None)


def _pad_rows(rows, width, fill=-1, dtype=np.int64):
    out = np.full((len(rows), width), fill, dtype)
    for i, r in enumerate(rows):
        out[i, :len(r)] = r
    return out


def _build_ice_sub_local(mesh, lat_deg, S, part, node_l2g, elem_l2g,
                         n_own, n_loc, e_loc, ed_loc, locals_, build_sched):
    """Per-shard EVP polar-cap subdomain (ice/subdomain.py restricted to
    each shard's local numbering) + its halo-exchange schedule.

    Membership is decided on the GLOBAL subdomain (|lat| > lat_deg cap
    elements + their node closure) so every shard agrees on which nodes
    are in the cap; the per-shard tables are the local [owned|halo] slots
    of those entities, padded to uniform static sizes.  Sub-sized arrays
    are kept size-distinct from n_loc/e_loc/ed_loc so the DistContext can
    dispatch halo exchanges on the trailing-axis size."""
    from ..constants import rad
    from ..ice.subdomain import IceSubdomain

    N = mesh.n_nodes
    glat = np.abs(np.asarray(mesh.geo_coords)[:, 1]) / rad
    seed = glat > lat_deg
    en_g = np.asarray(mesh.elem_nodes)
    emask_g = seed[en_g].any(1)
    node_in_sub = np.zeros(N, bool)
    node_in_sub[np.unique(en_g[emask_g])] = True

    own_subs, halo_subs, esubs = [], [], []
    for s in range(S):
        nl2g = node_l2g[s]
        ins = (nl2g >= 0) & node_in_sub[np.clip(nl2g, 0, None)]
        own_subs.append(np.nonzero(ins[:n_own])[0])
        halo_subs.append(np.nonzero(ins[n_own:])[0] + n_own)
        el2g = elem_l2g[s]
        ine = (el2g >= 0) & emask_g[np.clip(el2g, 0, None)]
        esubs.append(np.nonzero(ine)[0])

    n_own_sub = max(len(x) for x in own_subs)
    n_halo_sub = max(len(x) for x in halo_subs) + 1   # >=1 pad slot
    Ns = n_own_sub + n_halo_sub
    while Ns in (n_loc, e_loc, ed_loc):
        Ns += 1
        n_halo_sub += 1
    Es = max(len(x) for x in esubs) + 1
    while Es in (n_loc, e_loc, ed_loc, Ns):
        Es += 1

    dummy_node, dummy_elem = n_loc - 1, e_loc - 1
    sub_nodes = np.full((S, Ns), dummy_node, np.int64)   # local slot ids
    sub_l2g = np.full((S, Ns), -1, np.int64)             # global node ids
    sub_g2l = np.full((S, N), -1, np.int64)
    sub_elems = np.full((S, Es), dummy_elem, np.int64)
    node_mask = np.zeros((S, n_loc), bool)
    en_sub = np.full((S, Es, 3), Ns - 1, np.int64)       # pad -> pad slot
    nie_rows, slot_rows = [], []
    stat = {k: np.zeros((S, Es), locals_[0][k].dtype)
            for k in ("metric_factor", "elem_area")}
    stat["gradient_sca"] = np.zeros((S, Es, 6),
                                    locals_[0]["gradient_sca"].dtype)
    nstat = {k: np.zeros((S, Ns), locals_[0][k].dtype)
             for k in ("coriolis_node", "bc_index_node")}
    area = np.zeros((S, 1, Ns), locals_[0]["area"].dtype)

    for s in range(S):
        o, h, e = own_subs[s], halo_subs[s], esubs[s]
        sub_nodes[s, :len(o)] = o
        sub_nodes[s, n_own_sub:n_own_sub + len(h)] = h
        sub_l2g[s, :len(o)] = node_l2g[s][o]
        sub_l2g[s, n_own_sub:n_own_sub + len(h)] = node_l2g[s][h]
        v = sub_l2g[s] >= 0
        sub_g2l[s, sub_l2g[s, v]] = np.nonzero(v)[0]
        sub_elems[s, :len(e)] = e
        node_mask[s, o] = True
        node_mask[s, h] = True
        # local slot -> sub slot
        m = np.full(n_loc, -1, np.int64)
        m[o] = np.arange(len(o))
        m[h] = n_own_sub + np.arange(len(h))
        ens = m[locals_[s]["elem_nodes"][e]]
        if (ens < 0).any():
            raise AssertionError("sub element vertex outside sub node set")
        en_sub[s, :len(e)] = ens
        for k in ("metric_factor", "elem_area"):
            stat[k][s, :len(e)] = locals_[s][k][e]
        stat["gradient_sca"][s, :len(e)] = locals_[s]["gradient_sca"][e]
        for k in ("coriolis_node", "bc_index_node"):
            nstat[k][s] = np.where(sub_l2g[s] >= 0,
                                   locals_[s][k][sub_nodes[s]], 0.0)
        area[s, 0] = np.where(sub_l2g[s] >= 0,
                              locals_[s]["area"][0][sub_nodes[s]], 0.0)
        # node->element incidence on the sub numbering (tables.py pattern)
        num = np.zeros(Ns, np.int64)
        for j in range(3):
            np.add.at(num, ens[:, j], 1)
        Ks = max(1, int(num.max()))
        nie = np.full((Ns, Ks), -1, np.int64)
        inodes = ens.T.ravel()
        ielems = np.tile(np.arange(len(e)), 3)
        order = np.argsort(inodes, kind="stable")
        offs = np.zeros(Ns + 1, np.int64)
        np.cumsum(num, out=offs[1:])
        pos = np.arange(3 * len(e)) - offs[inodes[order]]
        nie[inodes[order], pos] = ielems[order]
        safe = np.where(nie >= 0, nie, 0)
        slot = np.argmax(ens[safe] == np.arange(Ns)[:, None, None], axis=-1)
        nie_rows.append(nie)
        slot_rows.append(slot)

    K = max(r.shape[1] for r in nie_rows)
    nie_all = np.full((S, Ns, K), -1, np.int64)
    slot_all = np.zeros((S, Ns, K), np.int64)
    for s in range(S):
        nie_all[s, :, :nie_rows[s].shape[1]] = nie_rows[s]
        slot_all[s, :, :slot_rows[s].shape[1]] = slot_rows[s]

    sub_send, sub_src, sub_perms, sub_round_send, sub_halo_src = \
        build_sched(part, sub_l2g, sub_g2l, n_own_sub, Ns)

    f32 = mesh.gradient_sca.dtype
    ice_sub = IceSubdomain(
        sub_nodes=jnp.asarray(sub_nodes, jnp.int32),
        sub_elems=jnp.asarray(sub_elems, jnp.int32),
        node_mask=jnp.asarray(node_mask),
        elem_nodes=jnp.asarray(en_sub, jnp.int32),
        nod_in_elem=jnp.asarray(nie_all, jnp.int32),
        nod_in_elem_slot=jnp.asarray(slot_all, jnp.int32),
        gradient_sca=jnp.asarray(stat["gradient_sca"], f32),
        metric_factor=jnp.asarray(stat["metric_factor"], f32),
        elem_area=jnp.asarray(stat["elem_area"], f32),
        area=jnp.asarray(area, f32),
        coriolis_node=jnp.asarray(nstat["coriolis_node"], f32),
        bc_index_node=jnp.asarray(nstat["bc_index_node"], f32),
        n_elems=int(Es), n_nodes=int(Ns))
    return (ice_sub, sub_send, sub_src, n_own_sub, sub_perms,
            sub_round_send, sub_halo_src)


def build_layout(mesh: MeshTables, S: int, st: TracerStatics = None,
                 part: np.ndarray = None, cfg=None,
                 n_part=None) -> DistLayout:
    """Partition + renumber + build local meshes and exchange schedules.

    ``n_part=(hosts, chips)`` selects the TOPOLOGY-AWARE two-level
    partition (ICI/DCN analog of the reference's &machine n_levels/n_part,
    ``gen_modules_config.F90:96-98``, ``fort_part.c:137-300``): nodes are
    first split into ``hosts`` coarse groups, each group into ``chips``
    shards; shard id = host*chips + chip, so consecutive shard ranges map
    onto consecutive devices (ICI domains) and only coarse-group halo
    traffic crosses DCN.  Requires hosts*chips == S."""
    en = np.asarray(mesh.elem_nodes).astype(np.int64)
    edges = np.asarray(mesh.edges).astype(np.int64)
    etri = np.asarray(mesh.edge_tri).astype(np.int64)
    eedges = np.asarray(mesh.elem_edges).astype(np.int64)
    enb = np.asarray(mesh.elem_neighbors).astype(np.int64)
    nie_g = np.asarray(mesh.nod_in_elem).astype(np.int64)
    nies_g = np.asarray(mesh.nod_in_elem_slot).astype(np.int64)
    nedg_g = np.asarray(mesh.node_edges).astype(np.int64)
    nsgn_g = np.asarray(mesh.node_edge_sign)
    nnb_g = np.asarray(mesh.node_neighbors).astype(np.int64)
    updn = np.asarray(st.edge_up_dn_tri).astype(np.int64) \
        if st is not None else None
    N, E, Ed = mesh.n_nodes, mesh.n_elems, mesh.n_edges
    n_in = mesh.n_edges_in

    host_of_node = None
    if part is None:
        if n_part is not None:
            hosts, chips = (1, n_part) if isinstance(n_part, int) \
                else (int(n_part[0]), int(n_part[1]))
            if hosts * chips != S:
                raise ValueError(f"n_part {n_part} != S={S}")
            from .partition import partition_nodes_hierarchical
            part, host_of_node = partition_nodes_hierarchical(mesh, n_part)
        else:
            part = partition_nodes(mesh, S)
    part = np.asarray(part, np.int64)
    elem_owner = part[en[:, 0]]

    # ---- per-shard entity closure ----------------------------------------
    own_nodes, halo_nodes, loc_elems, loc_edges_in, loc_edges_bnd = \
        [], [], [], [], []
    e_own_sets = []
    for s in range(S):
        ownN = np.nonzero(part == s)[0]
        node_is = np.zeros(N, bool)
        node_is[ownN] = True
        # edges incident to owned nodes
        ed1 = node_is[edges[:, 0]] | node_is[edges[:, 1]]
        # elements incident to owned nodes, adjacent to those edges, and
        # MUSCL up/downwind triangles of those edges (eDim + eXDim analog)
        el = node_is[en].any(1)
        el_is = np.zeros(E, bool)
        el_is[np.nonzero(el)[0]] = True
        adj = etri[ed1]
        el_is[adj[adj >= 0]] = True
        if updn is not None:
            ud = updn[ed1]
            el_is[ud[ud >= 0]] = True
        # one more ring: elements across every edge of the current element
        # set (needed so du = u[et1]-u[et2] is computable at all edges of
        # owned/1-ring elements — the viscosity-filter stencil)
        ed2 = np.zeros(Ed, bool)
        ed2[eedges[el_is].ravel()] = True
        ed2 |= ed1
        adj2 = etri[ed2]
        el_is[adj2[adj2 >= 0]] = True
        # final edge set: incident-to-owned + all edges of local elements
        ed_is = ed2.copy()
        ed_is[eedges[el_is].ravel()] = True
        # local nodes: owned + every node of local elements/edges
        node_all = node_is.copy()
        node_all[en[el_is].ravel()] = True
        node_all[edges[ed_is].ravel()] = True
        halo = np.nonzero(node_all & ~node_is)[0]

        eids = np.nonzero(el_is)[0]
        e_own = eids[elem_owner[eids] == s]
        e_halo = eids[elem_owner[eids] != s]
        edids = np.nonzero(ed_is)[0]

        own_nodes.append(ownN)                    # sorted (nonzero is sorted)
        halo_nodes.append(halo)
        e_own_sets.append((e_own, e_halo))
        loc_edges_in.append(edids[edids < n_in])
        loc_edges_bnd.append(edids[edids >= n_in])

    # ---- uniform padded block sizes ---------------------------------------
    n_own = max(len(x) for x in own_nodes)
    n_halo = max(len(x) for x in halo_nodes) + 1      # >=1 dummy halo slot
    n_loc = n_own + n_halo
    e_own = max(len(a) for a, _ in e_own_sets)
    e_halo = max(len(b) for _, b in e_own_sets) + 1   # >=1 dummy elem slot
    e_loc = e_own + e_halo
    ed_in = max(len(x) for x in loc_edges_in)
    ed_bnd = max(len(x) for x in loc_edges_bnd) + 1   # >=1 dummy edge slot
    ed_loc = ed_in + ed_bnd
    # the generic tree localizer dispatches on the LAST-axis size; local
    # block sizes must be mutually distinct and distinct from global sizes
    while len({n_loc, e_loc, ed_loc}) < 3:
        ed_loc += 1

    # ---- local<->global maps ----------------------------------------------
    node_l2g = np.full((S, n_loc), -1, np.int64)
    elem_l2g = np.full((S, e_loc), -1, np.int64)
    edge_l2g = np.full((S, ed_loc), -1, np.int64)
    node_g2l = np.full((S, N), -1, np.int64)
    elem_g2l = np.full((S, E), -1, np.int64)
    edge_g2l = np.full((S, Ed), -1, np.int64)
    for s in range(S):
        o, h = own_nodes[s], halo_nodes[s]
        node_l2g[s, :len(o)] = o
        node_l2g[s, n_own:n_own + len(h)] = h
        eo, eh = e_own_sets[s]
        elem_l2g[s, :len(eo)] = eo
        elem_l2g[s, e_own:e_own + len(eh)] = eh
        ein, ebn = loc_edges_in[s], loc_edges_bnd[s]
        edge_l2g[s, :len(ein)] = ein
        edge_l2g[s, ed_in:ed_in + len(ebn)] = ebn
        for g2l, l2g in ((node_g2l, node_l2g), (elem_g2l, elem_l2g),
                         (edge_g2l, edge_l2g)):
            v = l2g[s] >= 0
            g2l[s, l2g[s, v]] = np.nonzero(v)[0]

    # global gather maps (from_dist): entity -> owner shard slot
    node_slot_in_owner = np.zeros(N, np.int64)
    for s in range(S):
        node_slot_in_owner[own_nodes[s]] = np.arange(len(own_nodes[s]))
    node_from = part * n_loc + node_slot_in_owner
    elem_slot = np.zeros(E, np.int64)
    for s in range(S):
        eo = e_own_sets[s][0]
        elem_slot[eo] = np.arange(len(eo))
    elem_from = elem_owner * e_loc + elem_slot

    # ---- exchange schedules ------------------------------------------------
    def build_sched(owner_of, l2g, g2l, n_own_blk, n_loc_blk):
        # send[s][d] = sorted global ids owned by s that d holds as halo
        send_lists = [[[] for _ in range(S)] for _ in range(S)]
        for d in range(S):
            halo_g = l2g[d, n_own_blk:]
            halo_g = halo_g[halo_g >= 0]
            for g in halo_g:                      # ascending global id
                send_lists[owner_of[g]][d].append(g)
        M = max(1, max(len(send_lists[s][d])
                       for s in range(S) for d in range(S)))
        send = np.full((S, S, M), -1, np.int64)
        for s in range(S):
            for d in range(S):
                gl = send_lists[s][d]
                send[s, d, :len(gl)] = g2l[s, gl]
        # src[d, h] = owner*M + position of halo-global-id in owner's list
        H = n_loc_blk - n_own_blk
        src = np.full((S, H), -1, np.int64)
        for d in range(S):
            pos_of = {}
            for s in range(S):
                for m, g in enumerate(send_lists[s][d]):
                    pos_of[g] = s * M + m
            halo_g = l2g[d, n_own_blk:]
            for h, g in enumerate(halo_g):
                if g >= 0:
                    src[d, h] = pos_of[g]

        # neighbor-wise ppermute rounds: greedily edge-color the directed
        # neighbor graph (largest pair first); each round is a partial
        # permutation with a buffer sized to ITS largest pair
        pairs = [(s, d) for s in range(S) for d in range(S)
                 if send_lists[s][d] and s != d]
        pairs.sort(key=lambda p: -len(send_lists[p[0]][p[1]]))
        rounds = []
        for s, d in pairs:
            for r in rounds:
                if s not in r["src"] and d not in r["dst"]:
                    r["pairs"].append((s, d))
                    r["src"].add(s)
                    r["dst"].add(d)
                    break
            else:
                rounds.append({"pairs": [(s, d)], "src": {s}, "dst": {d}})
        perms, round_send = [], []
        pair_off = {}
        off = 0
        for r in rounds:
            Mr = max(len(send_lists[s][d]) for s, d in r["pairs"])
            tbl = np.full((S, Mr), -1, np.int64)
            for s, d in r["pairs"]:
                gl = send_lists[s][d]
                tbl[s, :len(gl)] = g2l[s, gl]
                pair_off[(s, d)] = off
            perms.append(tuple(sorted(r["pairs"])))
            round_send.append(jnp.asarray(tbl, jnp.int32))
            off += Mr
        halo_src = np.full((S, H), -1, np.int64)
        for d in range(S):
            posmap = {}
            for s in range(S):
                if (s, d) in pair_off:
                    for m, g in enumerate(send_lists[s][d]):
                        posmap[g] = pair_off[(s, d)] + m
            halo_g = l2g[d, n_own_blk:]
            for h, g in enumerate(halo_g):
                if g >= 0:
                    halo_src[d, h] = posmap[g]
        return send, src, tuple(perms), tuple(round_send), \
            jnp.asarray(halo_src, jnp.int32)

    node_send, node_src, node_perms, node_round_send, node_halo_src = \
        build_sched(part, node_l2g, node_g2l, n_own, n_loc)
    elem_send, elem_src, elem_perms, elem_round_send, elem_halo_src = \
        build_sched(elem_owner, elem_l2g, elem_g2l, e_own, e_loc)
    own_node_f = np.zeros((S, n_loc))
    for s in range(S):
        own_node_f[s, :len(own_nodes[s])] = 1.0

    # reverse-exchange tables (halo -> owner accumulation; see
    # DistContext.accumulate_nodes): invert src for packing and transpose
    # send for the per-owned-slot receive gather
    Mn = node_send.shape[2]
    rev_pack = np.full((S, S * Mn), -1, np.int64)
    for d in range(S):
        for h in range(node_src.shape[1]):
            if node_src[d, h] >= 0:
                rev_pack[d, node_src[d, h]] = h
    ref_lists = [[[] for _ in range(n_own)] for _ in range(S)]
    for s in range(S):
        for d in range(S):
            for m in range(Mn):
                i = node_send[s, d, m]
                if i >= 0:
                    ref_lists[s][i].append(d * Mn + m)
    R = max(1, max(len(r) for rl in ref_lists for r in rl))
    rev_gather = np.full((S, n_own, R), -1, np.int64)
    for s in range(S):
        for i, r in enumerate(ref_lists[s]):
            rev_gather[s, i, :len(r)] = r

    sched = HaloSchedule(
        node_send=jnp.asarray(node_send, jnp.int32),
        node_src=jnp.asarray(node_src, jnp.int32),
        elem_send=jnp.asarray(elem_send, jnp.int32),
        elem_src=jnp.asarray(elem_src, jnp.int32),
        own_node_f=jnp.asarray(own_node_f, mesh.zbar.dtype),
        node_rev_pack=jnp.asarray(rev_pack, jnp.int32),
        node_rev_gather=jnp.asarray(rev_gather, jnp.int32),
        node_round_send=node_round_send, node_halo_src=node_halo_src,
        elem_round_send=elem_round_send, elem_halo_src=elem_halo_src,
        node_perms=node_perms, elem_perms=elem_perms,
        n_own_node=n_own, n_own_elem=e_own)

    # ---- local meshes ------------------------------------------------------
    dummy_node = n_loc - 1
    dummy_elem = e_loc - 1
    dummy_edge = ed_loc - 1

    def remap(table_g, rows_l2g, g2l_s, missing):
        """Slice rows by rows_l2g (pad rows -> all `missing`) and remap
        entries through g2l_s (missing entries -> `missing`)."""
        safe_rows = np.where(rows_l2g >= 0, rows_l2g, 0)
        t = table_g[safe_rows]
        keep = t >= 0
        mapped = np.where(keep, g2l_s[np.where(keep, t, 0)], -1)
        mapped = np.where(mapped >= 0, mapped, missing)
        mapped[rows_l2g < 0] = missing
        return mapped

    def slice_rows(arr_g, rows_l2g, fill, axis=-1):
        a = np.asarray(arr_g)
        safe = np.where(rows_l2g >= 0, rows_l2g, 0)
        out = np.take(a, safe, axis=axis)
        pad = rows_l2g < 0
        sl = [slice(None)] * a.ndim
        sl[axis] = pad
        out[tuple(sl)] = fill
        return out

    locals_ = []
    for s in range(S):
        nl2g, el2g, dl2g = node_l2g[s], elem_l2g[s], edge_l2g[s]
        ng2l, eg2l, dg2l = node_g2l[s], elem_g2l[s], edge_g2l[s]
        r = {}
        r["elem_nodes"] = remap(en, el2g, ng2l, dummy_node)
        r["edges"] = remap(edges, dl2g, ng2l, dummy_node)
        # missing left triangle -> dummy (masked) element, missing right
        # triangle -> -1 (the boundary convention), as in parallel/padding.py
        et_l = remap(etri, dl2g, eg2l, -1)
        et_l[:, 0] = np.where(et_l[:, 0] >= 0, et_l[:, 0], dummy_elem)
        r["edge_tri"] = et_l
        r["elem_neighbors"] = remap(enb, el2g, eg2l, -1)
        r["elem_edges"] = remap(eedges, el2g, dg2l, dummy_edge)
        r["nod_in_elem"] = remap(nie_g, nl2g, eg2l, -1)
        r["nod_in_elem_slot"] = np.where(r["nod_in_elem"] >= 0,
                                         slice_rows(nies_g, nl2g, 0, axis=0),
                                         0)
        r["nod_in_elem_num"] = (r["nod_in_elem"] >= 0).sum(-1)
        ne_l = remap(nedg_g, nl2g, dg2l, -1)
        r["node_edges"] = ne_l
        r["node_edge_sign"] = np.where(ne_l >= 0,
                                       slice_rows(nsgn_g, nl2g, 0.0, axis=0),
                                       0.0)
        r["node_neighbors"] = remap(nnb_g, nl2g, ng2l, -1)
        for name, fill, axis in (
                ("coords", 0.0, 0), ("geo_coords", 0.0, 0),
                ("area", 0.0, -1), ("areasvol", 0.0, -1),
                ("area_inv", 0.0, -1), ("areasvol_inv", 0.0, -1),
                ("resolution", 1.0, -1), ("coriolis_node", 0.0, -1),
                ("nlevels_node", 1, -1), ("ulevels_node", 1, -1),
                ("zbar_n_bot", 0.0, -1), ("bottom_node_thickness", 0.0, -1),
                ("node_layer_mask", False, -1), ("bc_index_node", 0.0, -1)):
            r[name] = slice_rows(getattr(mesh, name), nl2g, fill,
                                 axis=axis)
        nlm = slice_rows(mesh.node_level_mask, nl2g, False, axis=-1)
        nlm[0, nl2g < 0] = True      # one surface level so take() stays legal
        r["node_level_mask"] = nlm
        for name, fill, axis in (
                ("elem_area", 0.0, -1), ("gradient_sca", 0.0, 0),
                ("gradient_vec", 0.0, 0), ("elem_cos", 1.0, -1),
                ("metric_factor", 0.0, -1), ("coriolis", 0.0, -1),
                ("nlevels_elem", 1, -1), ("ulevels_elem", 1, -1),
                ("zbar_e_bot", 0.0, -1), ("bottom_elem_thickness", 0.0, -1),
                ("elem_layer_mask", False, -1)):
            r[name] = slice_rows(getattr(mesh, name), el2g, fill, axis=axis)
        for name in ("edge_dxdy", "edge_cross_dxdy"):
            r[name] = slice_rows(getattr(mesh, name), dl2g, 0.0, axis=0)
        r["zbar"] = np.asarray(mesh.zbar)
        r["Z"] = np.asarray(mesh.Z)
        locals_.append(r)

    stacked = {k: np.stack([loc[k] for loc in locals_]) for k in locals_[0]}
    kw = {}
    for k, v in stacked.items():
        ref = getattr(mesh, k)
        kw[k] = jnp.asarray(v, ref.dtype)
    mesh_local = MeshTables(
        n_nodes=n_loc, n_elems=e_loc, n_edges=ed_loc, n_edges_in=ed_in,
        nl=mesh.nl, cyclic_length=mesh.cyclic_length,
        cartesian=mesh.cartesian, ocean_area=mesh.ocean_area, **kw)

    # ---- tracer statics ----------------------------------------------------
    st_local = None
    if st is not None:
        ud_rows = []
        nb_rows = []
        ki_rows = []
        for s in range(S):
            ud_rows.append(remap(updn, edge_l2g[s], elem_g2l[s], -1))
            nb_rows.append(slice_rows(np.asarray(st.nboundary_lay),
                                      node_l2g[s], 0, axis=-1))
            ki_rows.append(slice_rows(np.asarray(st.Ki), node_l2g[s], 0.0,
                                      axis=-1))
        nm_rows = [slice_rows(np.asarray(st.nln_min), node_l2g[s], 1,
                              axis=-1) for s in range(S)] \
            if st.nln_min is not None else None
        st_local = TracerStatics(
            edge_up_dn_tri=jnp.asarray(np.stack(ud_rows), jnp.int32),
            nboundary_lay=jnp.asarray(np.stack(nb_rows), jnp.int32),
            Ki=jnp.asarray(np.stack(ki_rows), st.Ki.dtype),
            nln_min=(jnp.asarray(np.stack(nm_rows), jnp.int32)
                     if nm_rows is not None else None))

    # ---- SSH preconditioners on the local numbering ------------------------
    diag_local = None
    block_pc_local = None
    if cfg is not None:
        from ..core.ssh import ssh_matrix_diagonal, build_block_schwarz_local
        diag = np.asarray(ssh_matrix_diagonal(mesh, cfg))
        dinv = np.where(diag > 0, 1.0 / np.where(diag > 0, diag, 1.0), 0.0)
        diag_local = jnp.asarray(
            np.stack([slice_rows(dinv, node_l2g[s], 0.0) for s in range(S)]),
            mesh.zbar.dtype)
        block_pc_local = build_block_schwarz_local(
            mesh, cfg, S, node_l2g, node_g2l, n_own, n_loc,
            dtype=mesh.zbar.dtype)

    # ---- per-shard ice subdomain (EVP polar-cap restriction) ---------------
    ice_sub_local = None
    sub_lat = getattr(cfg.ice, "evp_subdomain_lat", None) \
        if cfg is not None else None
    if sub_lat is not None:
        (ice_sub_local, sub_send, sub_src, n_own_sub, sub_perms,
         sub_round_send, sub_halo_src) = _build_ice_sub_local(
            mesh, sub_lat, S, part, node_l2g, elem_l2g, n_own, n_loc,
            e_loc, ed_loc, locals_, build_sched)
        sched = dataclasses.replace(
            sched, sub_send=jnp.asarray(sub_send, jnp.int32),
            sub_src=jnp.asarray(sub_src, jnp.int32), n_own_sub=n_own_sub,
            sub_perms=sub_perms, sub_round_send=sub_round_send,
            sub_halo_src=sub_halo_src)

    return DistLayout(
        S=S, part=part, n_own=n_own, n_loc=n_loc, e_own=e_own, e_loc=e_loc,
        ed_loc=ed_loc, sizes=(N, E, Ed),
        node_l2g=node_l2g, elem_l2g=elem_l2g, edge_l2g=edge_l2g,
        node_from=node_from, elem_from=elem_from, sched=sched,
        mesh_local=mesh_local, st_local=st_local,
        diag_inv_local=diag_local, block_pc_local=block_pc_local,
        ice_sub_local=ice_sub_local)


# --------------------------------------------------------------------------
# pytree conversion: global <-> per-shard stacked
# --------------------------------------------------------------------------
def _is_arr(x):
    return isinstance(x, (jnp.ndarray, np.ndarray)) or hasattr(x, "ndim")


def localize_tree(tree, layout: DistLayout):
    """Global pytree -> stacked per-shard pytree [S, ...]: entity-last-axis
    arrays (recognized by size) are sliced through the local->global maps
    (halo slots get the owners' values: a consistent start); everything else
    is broadcast-replicated."""
    N, E, Ed = layout.sizes
    maps = {N: layout.node_l2g, E: layout.elem_l2g, Ed: layout.edge_l2g}
    S = layout.S

    def fix(x):
        if not _is_arr(x):
            return x
        x = jnp.asarray(x)
        if x.ndim >= 1 and x.shape[-1] in maps:
            m = maps[x.shape[-1]]
            safe = jnp.asarray(np.where(m >= 0, m, 0), jnp.int32)  # [S, L]
            out = jnp.take(x, safe, axis=-1)               # [..., S, L]
            out = jnp.moveaxis(out, -2, 0)                 # [S, ..., L]
            valid = jnp.asarray(m >= 0)
            vshape = (S,) + (1,) * (out.ndim - 2) + (m.shape[1],)
            if out.dtype == jnp.bool_:
                return out & valid.reshape(vshape)
            return out * valid.reshape(vshape).astype(out.dtype)
        return jnp.broadcast_to(x[None], (S,) + x.shape)

    return jax.tree.map(fix, tree)


def gather_tree(tree, layout: DistLayout):
    """Stacked per-shard pytree [S, ...] -> global pytree (owned entries)."""
    N, E, Ed = layout.sizes
    frm = {layout.n_loc: (layout.node_from,),
           layout.e_loc: (layout.elem_from,)}

    def fix(x):
        if not _is_arr(x):
            return x
        x = jnp.asarray(x)
        if x.ndim >= 2 and x.shape[-1] in frm and x.shape[0] == layout.S:
            (g_idx,) = frm[x.shape[-1]]
            if x.size == 0:     # zero-size feature axes (e.g. n_dvd = 0)
                return jnp.zeros(x.shape[1:-1] + (len(g_idx),), x.dtype)
            flat = jnp.moveaxis(x, 0, -2)
            flat = flat.reshape(flat.shape[:-2] + (-1,))
            return jnp.take(flat, jnp.asarray(g_idx, jnp.int32), axis=-1)
        if x.ndim >= 2 and x.shape[-1] == layout.ed_loc \
                and x.shape[0] == layout.S:
            raise ValueError("edge fields carry no ownership; cannot gather")
        return x[0]

    return jax.tree.map(fix, tree)


def squeeze_tree(tree):
    """Drop the leading per-shard axis inside shard_map ([1, ...] -> [...])."""
    return jax.tree.map(lambda a: a[0] if _is_arr(a) else a, tree)


def unsqueeze_tree(tree):
    return jax.tree.map(lambda a: a[None] if _is_arr(a) else a, tree)


def check_halo_consistency(tree_d, layout: DistLayout, atol: float = 0.0):
    """In-run halo cross-check debug aid (the reference's halo consistency
    verification precedent, ``gen_halo_exchange.F90:146``): for every
    node-/element-shaped leaf of a stacked per-shard pytree, verify that
    each real halo slot holds exactly the owner's value.

    Returns a list of (leaf_path, kind, max_abs_diff) tuples for leaves
    whose halo disagrees with the owner beyond atol (empty == consistent).
    Host-side numpy; use from tests or a debug step hook, not inside jit.
    """
    out = []
    specs = [("node", layout.node_l2g, layout.n_own, layout.n_loc,
              layout.node_from),
             ("elem", layout.elem_l2g, layout.e_own, layout.e_loc,
              layout.elem_from)]
    leaves = jax.tree_util.tree_flatten_with_path(tree_d)[0]
    for path, leaf in leaves:
        if not hasattr(leaf, "ndim") or leaf.ndim < 2 \
                or leaf.shape[0] != layout.S:
            continue
        for kind, l2g, n_own_blk, n_loc_blk, frm in specs:
            if leaf.shape[-1] != n_loc_blk:
                continue
            a = np.asarray(leaf)
            flat = np.moveaxis(a, 0, -2)
            flat = flat.reshape(flat.shape[:-2] + (-1,))     # [..., S*L]
            worst = 0.0
            for s in range(layout.S):
                hg = l2g[s, n_own_blk:]
                ok = hg >= 0
                if not ok.any():
                    continue
                got = a[s][..., n_own_blk:][..., ok]
                want = flat[..., frm[hg[ok]]]
                d = np.abs(got.astype(np.float64)
                           - want.astype(np.float64)).max()
                worst = max(worst, float(d))
            if worst > atol:
                out.append((jax.tree_util.keystr(path), kind, worst))
    return out


def device_mesh(S: int) -> Mesh:
    return Mesh(np.array(jax.devices()[:S]), (AXIS,))


def dist_shard_map(fn, dev_mesh: Mesh):
    """Wrap impl(*args) -> out into a shard_map over stacked [S, ...] args.

    The returned function has signature (sched, *args): inside, every leaf
    is squeezed, a DistContext is activated (hooking the ops-layer
    assemblies), and outputs are re-stacked.  The schedule is an ARGUMENT
    (not a closure constant) so the jitted program receives the index
    tables at runtime — embedding gather tables as compile-time constants
    flips the TPU into a degraded gather mode (see Model.statics)."""
    from ..core import ops

    def sharded(sched_arg, *args):
        sq = squeeze_tree((sched_arg,) + tuple(args))
        ctx = DistContext(sq[0])
        with ops.dist_context(ctx):
            out = fn(*sq[1:])
        return unsqueeze_tree(out)

    return jax.shard_map(sharded, mesh=dev_mesh,
                         in_specs=P(AXIS), out_specs=P(AXIS),
                         check_vma=False)


def _dist_statics(model, SP_raw, layout: DistLayout):
    """Localize a statics pytree, replacing the global mesh / tracer
    statics / SSH preconditioning with their per-shard forms.  The dense
    inverse and ring operators are single-device formulations; distributed
    SSH runs matrix-free CG preconditioned by the per-shard block-Schwarz
    (pARMS-RAS role, built on the [owned|halo] numbering) with the Jacobi
    diagonal as fallback."""
    S_dict = dict(SP_raw["S"])
    S_dict["mesh"] = None
    S_dict["st"] = None
    S_dict["diag_inv"] = None
    S_dict["dense_inv"] = None
    S_dict["block_pc"] = None
    S_dict["ssh_ring"] = None
    S_dict["ice_sub"] = None
    SP2 = dict(SP_raw)
    SP2["S"] = S_dict
    SP_loc = localize_tree(SP2, layout)
    SP_loc["S"]["mesh"] = layout.mesh_local
    SP_loc["S"]["st"] = layout.st_local
    SP_loc["S"]["diag_inv"] = layout.diag_inv_local
    SP_loc["S"]["block_pc"] = layout.block_pc_local
    SP_loc["S"]["ice_sub"] = layout.ice_sub_local
    return SP_loc


def prepare_dist_model(model, layout: DistLayout = None):
    """Switch a Model's solver choices to the distributed formulation.
    Must run BEFORE building step functions — the impl closes over these
    flags.  The SSH preconditioner becomes the layout's per-shard
    block-Schwarz (plain Jacobi CG if the layout carries none)."""
    model.ssh_dense_inv = None
    model.ssh_block_pc = layout.block_pc_local if layout is not None else None
    model.ssh_ring = None
    model.ice_submesh = None
    return model


def dist_layout_for_model(model, S: int, part=None,
                          n_part=None) -> DistLayout:
    """n_part=(hosts, chips): topology-aware hierarchical partition so
    heavy halo pairs stay inside each host's ICI domain (see build_layout)."""
    return build_layout(model.mesh, S, st=model.tracer_statics, part=part,
                        cfg=model.cfg, n_part=n_part)


def dist_step_fn(model, layout: DistLayout, jit_compile: bool = True):
    """Distributed ocean-only step: (state_d, forcing_d) -> state_d, all
    arguments stacked per-shard [S, ...] (see localize_tree)."""
    prepare_dist_model(model, layout)
    impl = model.step_impl()        # closes over use_block=True
    SP_loc = _dist_statics(model, {"S": model.statics()}, layout)["S"]
    # restore single-device usability: the stacked PC must not leak into a
    # later model.statics() / step_fn() built from the same Model
    model.ssh_block_pc = None
    dev = device_mesh(layout.S)

    def wrapped(state, forcing, S):
        return impl(state, forcing, None, S)

    smapped = dist_shard_map(wrapped, dev)
    core = jax.jit(smapped) if jit_compile else smapped

    def step(state_d, forcing_d):
        return core(layout.sched, state_d, forcing_d, SP_loc)

    return step


def dist_pi_coupled_step_fn(model, atm, layout: DistLayout,
                            jit_compile: bool = True,
                            donate: bool = False):
    """Distributed coupled ocean+ice step on the pi configuration:
    (state_d, ice_d, step_idx) -> (state_d, ice_d, forcing_d).

    This is the real multi-device execution path: the coupled model —
    EVP subcycling (120 exchanges) on the per-shard polar-cap subdomain,
    ice FCT, tracer FCT, block-Schwarz CG SSH solve — runs per-shard
    under shard_map with explicit packed halo exchanges, replacing
    round 1's naive GSPMD full-field collectives.

    donate=True aliases the per-shard state/ice buffers to the outputs
    (same contract as pi_coupled_step_fn donate)."""
    from ..model import pi_coupled_parts
    prepare_dist_model(model, layout)
    step_impl, SP_raw = pi_coupled_parts(model, atm)
    SP_loc = _dist_statics(model, SP_raw, layout)
    model.ssh_block_pc = None       # see dist_step_fn
    dev = device_mesh(layout.S)
    smapped = dist_shard_map(step_impl, dev)
    jkw = dict(donate_argnums=(1, 2)) if donate else {}
    core = jax.jit(smapped, **jkw) if jit_compile else smapped

    def dedup(tree):
        if not donate:
            return tree
        seen = set()

        def f(x):
            if hasattr(x, "dtype"):
                if id(x) in seen:
                    return x.copy()
                seen.add(id(x))
            return x
        return jax.tree.map(f, tree)

    def step(state_d, ice_d, step_idx):
        ks = jnp.broadcast_to(jnp.asarray(step_idx, jnp.int32),
                              (layout.S,))
        state_d, ice_d = dedup((state_d, ice_d))
        return core(layout.sched, state_d, ice_d, ks, SP_loc)

    return step
