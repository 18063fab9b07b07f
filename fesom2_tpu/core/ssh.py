"""Semi-implicit free-surface: operator, rhs, solve, hbar update.

The reference assembles a CSR stiffness matrix (init_stiff_mat_ale,
``src/oce_ale.F90:1088-1354``; ALE value updates :1371-1470) and solves with
pARMS BiCGstab+RAS (``psolve.c``).  The operator is symmetric positive
definite (noted at ``oce_ale.F90:2321``), so the TPU-native design is a
matrix-free Jacobi-preconditioned CG built from the same edge stencil —
no sparse matrix, no native solver library.

Operator:  A(eta) = eta * areasvol(surface)/dt
                    + g*dt*alpha*theta * D(H_eff * G(eta))
where G is the elemental scalar gradient, H_eff = (zbar_e_bot - zbar_e_srf)
- hbar_e (ALE accumulated depth perturbation; reference accumulates -dhe into
the matrix each step which telescopes to -hbar_e), and D is the edge-stencil
divergence of (grad x edge_cross) fluxes.
"""
from __future__ import annotations

from dataclasses import replace

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import g
from ..mesh import MeshTables
from . import ops
from .ops import (scalar_gradient, edge_divergence, pcg,
                  elem_mean_node, edge_transport)
from .state import OceanState, Forcing


def elem_depth(mesh: MeshTables):
    """(zbar_e_bot - zbar_e_srf): negative total unperturbed element depth.

    ref init_stiff_mat_ale (oce_ale.F90:1223): the stiffness uses the
    partial-cell bottom depth zbar_e_bot."""
    zsrf = jnp.take(mesh.zbar, mesh.ulevels_elem - 1)
    return mesh.zbar_e_bot - zsrf


def _edge_stencil_flux(field_gx, field_gy, H_el, mesh: MeshTables):
    """Per-edge flux s1+s2 of the SSH stencil (ref :1202-1258 pattern)."""
    et1, et2 = mesh.edge_tri[:, 0], mesh.edge_tri[:, 1]
    has2 = et2 >= 0
    et2s = jnp.where(has2, et2, 0)
    dX1, dY1 = mesh.edge_cross_dxdy[:, 0], mesh.edge_cross_dxdy[:, 1]
    dX2, dY2 = mesh.edge_cross_dxdy[:, 2], mesh.edge_cross_dxdy[:, 3]
    s1 = H_el[et1] * (field_gx[et1] * dY1 - field_gy[et1] * dX1)
    s2 = jnp.where(has2,
                   -H_el[et2s] * (field_gx[et2s] * dY2 - field_gy[et2s] * dX2),
                   0.0)
    return s1 + s2


def ssh_operator(mesh: MeshTables, cfg, hbar_e=None):
    """Return the matrix-free SPD operator eta -> A(eta)."""
    dt = cfg.dt
    factor = g * dt * cfg.dyn.alpha * cfg.dyn.theta
    H = elem_depth(mesh)
    if hbar_e is not None:
        H = H - hbar_e
    # surface scalar area at the per-column surface row (ulevels-1;
    # ref init_stiff_mat_ale oce_ale.F90:1269 uses areasvol(ulevels))
    av_srf = jnp.take_along_axis(
        mesh.areasvol, (mesh.ulevels_node - 1)[None, :].astype(jnp.int32),
        0)[0]
    diag_mass = av_srf / dt

    def op(eta):
        gx, gy = scalar_gradient(eta, mesh)
        flux = _edge_stencil_flux(gx, gy, H, mesh)
        return eta * diag_mass + factor * edge_divergence(flux, mesh)

    return op


def ssh_dense_matrix(mesh: MeshTables, cfg) -> np.ndarray:
    """Assemble the full SSH operator as a dense [N, N] numpy matrix.

    Host-side, used to precompute a dense inverse for small/medium meshes:
    on TPU one [N,N]x[N] matmul on the MXU replaces O(100) latency-bound CG
    iterations (the reference needs pARMS BiCGstab+RAS for the same solve).
    """
    N = mesh.n_nodes
    edges = np.asarray(mesh.edges)
    etri = np.asarray(mesh.edge_tri)
    en = np.asarray(mesh.elem_nodes)
    gsca = np.asarray(mesh.gradient_sca)
    ecd = np.asarray(mesh.edge_cross_dxdy)
    zbar = np.asarray(mesh.zbar)
    H = np.asarray(mesh.zbar_e_bot) - zbar[np.asarray(mesh.ulevels_elem) - 1]
    dt = cfg.dt
    factor = g * dt * cfg.dyn.alpha * cfg.dyn.theta

    A = np.zeros((N, N))
    avn = np.asarray(mesh.areasvol)
    uln0 = np.asarray(mesh.ulevels_node) - 1
    np.fill_diagonal(A, avn[uln0, np.arange(N)] / dt)
    for i in range(2):
        el = etri[:, i]
        ok = el >= 0
        els = np.where(ok, el, 0)
        dX = ecd[:, 2 * i]
        dY = ecd[:, 2 * i + 1]
        sgn = 1.0 if i == 0 else -1.0
        for k in range(3):
            fy = H[els] * (gsca[els, k] * dY - gsca[els, k + 3] * dX) * sgn
            fy = np.where(ok, fy * factor, 0.0)
            col = en[els, k]
            for j, rsgn in ((0, 1.0), (1, -1.0)):
                row = edges[:, j]
                np.add.at(A, (row, col), rsgn * fy)
    return A


def ssh_dense_inverse(mesh: MeshTables, cfg, dtype=jnp.float64) -> jnp.ndarray:
    """Dense inverse of the (unperturbed-depth) SSH operator."""
    A = ssh_dense_matrix(mesh, cfg)
    # padded dummy rows are all-zero: make them identity so inv() exists
    dead = np.abs(A).sum(1) == 0
    A[dead, dead] = 1.0
    Ainv = np.linalg.inv(A)
    Ainv[dead, :] = 0.0
    Ainv[:, dead] = 0.0
    return jnp.asarray(Ainv, dtype)


def solve_ssh_dense(state: OceanState, mesh: MeshTables, cfg, dense_inv, rhs,
                    n_refine: int = 1):
    """d_eta = A^-1 rhs via MXU matmul + iterative refinement.

    For linfs the stored inverse is exact (matrix static); refinement drives
    the f32 result to tolerance.  For zstar/zlevel the inverse is of the
    unperturbed operator and refinement against the true (hbar-corrected)
    operator converges in 1-2 sweeps since |dhe|/H ~ 1e-4.
    """
    if cfg.ale.which_ALE == "linfs":
        op = ssh_operator(mesh, cfg)
    else:
        hbar_e = elem_mean_node(state.hbar, mesh)
        hbar_e = jnp.where(mesh.ulevels_elem == 1, hbar_e, 0.0)
        op = ssh_operator(mesh, cfg, hbar_e=hbar_e)
    x = dense_inv @ rhs
    for _ in range(n_refine):
        r = rhs - op(x)
        x = x + dense_inv @ r
    res = jnp.linalg.norm(rhs - op(x)) / (jnp.linalg.norm(rhs) + 1e-300)
    return x, jnp.asarray(1 + n_refine, jnp.int32), res


def ssh_sparse_coo(mesh: MeshTables, cfg):
    """Assemble the SSH operator as COO triplets (host-side numpy).

    Same stencil as ssh_dense_matrix but memory-safe for CORE2-scale
    meshes (the dense [N,N] form is impossible beyond ~30k nodes)."""
    N = mesh.n_nodes
    edges = np.asarray(mesh.edges)
    etri = np.asarray(mesh.edge_tri)
    en = np.asarray(mesh.elem_nodes)
    gsca = np.asarray(mesh.gradient_sca)
    ecd = np.asarray(mesh.edge_cross_dxdy)
    zbar = np.asarray(mesh.zbar)
    H = np.asarray(mesh.zbar_e_bot) \
        - zbar[np.asarray(mesh.ulevels_elem) - 1]
    dt = cfg.dt
    factor = g * dt * cfg.dyn.alpha * cfg.dyn.theta

    avn = np.asarray(mesh.areasvol)
    uln0 = np.asarray(mesh.ulevels_node) - 1
    rows = [np.arange(N)]
    cols = [np.arange(N)]
    vals = [avn[uln0, np.arange(N)] / dt]
    for i in range(2):
        el = etri[:, i]
        ok = el >= 0
        els = np.where(ok, el, 0)
        dX = ecd[:, 2 * i]
        dY = ecd[:, 2 * i + 1]
        sgn = 1.0 if i == 0 else -1.0
        for k in range(3):
            fy = H[els] * (gsca[els, k] * dY - gsca[els, k + 3] * dX) * sgn
            fy = np.where(ok, fy * factor, 0.0)
            col = en[els, k]
            for j, rsgn in ((0, 1.0), (1, -1.0)):
                rows.append(edges[:, j])
                cols.append(col)
                vals.append(rsgn * fy)
    return (np.concatenate(rows), np.concatenate(cols),
            np.concatenate(vals), N)


@jax.tree_util.register_pytree_node_class
class RingOperator:
    """The SSH operator in node-ring form: one packed gather per apply.

    A(eta)[n] = sum_k vals[k, n] * eta[cols[k, n]] — the CSR stencil of
    ``init_stiff_mat_ale`` (oce_ale.F90:1088-1354) padded to the max node
    degree + 1 (self).  On TPU one [Kr, N]-indexed gather (~300M idx/s,
    free leading-dim slices) replaces the 6 edge/element gathers + node
    assembly of the matrix-free edge-stencil form — measured ~5x fewer
    gathered indices per CG iteration.
    """

    def __init__(self, cols, vals):
        self.cols = cols        # [Kr, N] i32 (self-padded: pad -> n itself)
        self.vals = vals        # [Kr, N] (pad -> 0)

    def __call__(self, eta):
        # gather from a 2-row stack: TPU gathers from a 1-row table hit a
        # degenerate ~2.3x-slower path, while extra leading rows are free
        from .ops import halo_fix_nodes
        e2 = jnp.stack([eta, eta])
        return halo_fix_nodes(
            (self.vals * jnp.take(e2, self.cols, axis=-1)[0]).sum(0))

    def tree_flatten(self):
        return ((self.cols, self.vals), None)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


def build_ssh_ring(mesh: MeshTables, cfg, dtype=jnp.float64) -> RingOperator:
    """Assemble the SSH stencil into padded ring form (host-side numpy).

    Valid for linfs where the operator is static; zlevel/zstar falls back
    to the matrix-free edge-stencil operator (values change with hbar)."""
    rows, cols, vals, N = ssh_sparse_coo(mesh, cfg)
    import scipy.sparse as sp
    A = sp.coo_matrix((vals, (rows, cols)), shape=(N, N)).tocsr()
    A.sum_duplicates()
    A.eliminate_zeros()
    dead = np.asarray(np.abs(A).sum(1)).ravel() == 0
    if dead.any():
        A = A + sp.diags(dead.astype(float))
        A = A.tocsr()
    indptr, indices, data = A.indptr, A.indices, A.data
    deg = np.diff(indptr)
    Kr = int(deg.max())
    ring_cols = np.tile(np.arange(N), (Kr, 1))     # pad points at self
    ring_vals = np.zeros((Kr, N))
    for n in range(N):
        s, e = indptr[n], indptr[n + 1]
        ring_cols[: e - s, n] = indices[s:e]
        ring_vals[: e - s, n] = data[s:e]
    return RingOperator(jnp.asarray(ring_cols, jnp.int32),
                        jnp.asarray(ring_vals, dtype))


def ssh_sparse_coo_elems(mesh: MeshTables, cfg):
    """COO triplets of the SSH stencil with the per-element depth factored
    out: entry value = coef * H[elem] (host-side numpy).

    Returns (rows, cols, elems, coefs, mass_diag, N): the full operator is
    A = diag(mass_diag) + sum_i coef_i * H[elem_i] scattered at
    (row_i, col_i).  This is the ALE decomposition A(hbar) = A0 - B(hbar_e)
    used by build_ssh_ring_ale — the reference re-assembles the CSR values
    each step for the same reason (update_stiff_mat_ale,
    ``oce_ale.F90:1371-1470``)."""
    N = mesh.n_nodes
    edges = np.asarray(mesh.edges)
    etri = np.asarray(mesh.edge_tri)
    en = np.asarray(mesh.elem_nodes)
    gsca = np.asarray(mesh.gradient_sca)
    ecd = np.asarray(mesh.edge_cross_dxdy)
    dt = cfg.dt
    factor = g * dt * cfg.dyn.alpha * cfg.dyn.theta

    avn = np.asarray(mesh.areasvol)
    uln0 = np.asarray(mesh.ulevels_node) - 1
    mass_diag = avn[uln0, np.arange(N)] / dt

    rows, cols, elems, coefs = [], [], [], []
    for i in range(2):
        el = etri[:, i]
        ok = el >= 0
        els = np.where(ok, el, 0)
        dX = ecd[:, 2 * i]
        dY = ecd[:, 2 * i + 1]
        sgn = 1.0 if i == 0 else -1.0
        for k in range(3):
            cf = (gsca[els, k] * dY - gsca[els, k + 3] * dX) * sgn * factor
            cf = np.where(ok, cf, 0.0)
            col = en[els, k]
            for j, rsgn in ((0, 1.0), (1, -1.0)):
                rows.append(edges[:, j])
                cols.append(col)
                elems.append(els)
                coefs.append(rsgn * cf)
    return (np.concatenate(rows), np.concatenate(cols),
            np.concatenate(elems), np.concatenate(coefs), mass_diag, N)


@jax.tree_util.register_pytree_node_class
class RingALE:
    """ALE (zstar/zlevel) SSH operator in ring form.

    The stencil values are affine in the per-element accumulated depth
    perturbation hbar_e:  vals(hbar_e) = vals0 - sum_c coef_c *
    hbar_e[elem_c] per ring slot.  ``materialize(hbar_e)`` rebuilds the
    packed [Kr, N] value table once per step (one [C, Kr, N] gather) and
    returns a RingOperator, so each CG iteration costs one packed gather
    instead of the 6-gather edge-stencil chain — the reference's
    update-values-then-solve split (``oce_ale.F90:1371-1470`` +
    ``psolve.c``) in TPU form.
    """

    def __init__(self, cols, vals0, e_ids, e_coef):
        self.cols = cols        # [Kr, N] i32 (pad -> self)
        self.vals0 = vals0      # [Kr, N] operator at hbar_e = 0
        self.e_ids = e_ids      # [C, Kr, N] i32 element ids (pad -> 0)
        self.e_coef = e_coef    # [C, Kr, N] (pad -> 0)

    def materialize(self, hbar_e) -> "RingOperator":
        h2 = jnp.stack([hbar_e, hbar_e])
        corr = (jnp.take(h2, self.e_ids, axis=-1)[0] * self.e_coef).sum(0)
        return RingOperator(self.cols, self.vals0 - corr)

    def tree_flatten(self):
        return ((self.cols, self.vals0, self.e_ids, self.e_coef), None)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


def build_ssh_ring_ale(mesh: MeshTables, cfg, dtype=jnp.float64) -> RingALE:
    """Assemble the ALE ring operator (host-side, vectorized numpy)."""
    rows, cols, elems, coefs, mass_diag, N = ssh_sparse_coo_elems(mesh, cfg)
    zbar = np.asarray(mesh.zbar)
    H0 = np.asarray(mesh.zbar_e_bot) \
        - zbar[np.asarray(mesh.ulevels_elem) - 1]

    # append the (element-independent) mass diagonal as coef-0 entries
    diag_rows = np.arange(N)
    rows = np.concatenate([diag_rows, rows])
    cols = np.concatenate([diag_rows, cols])
    elems = np.concatenate([np.zeros(N, np.int64), elems])
    coefs = np.concatenate([np.zeros(N), coefs])
    base = np.concatenate([mass_diag, np.zeros(len(coefs) - N)])

    # group by (row, col): sort once, then rank within groups
    key = rows.astype(np.int64) * N + cols.astype(np.int64)
    order = np.argsort(key, kind="stable")
    key_s = key[order]
    uk, inv_first = np.unique(key_s, return_index=True)
    # unique-slot ids for each sorted entry
    slot_of_entry = np.searchsorted(uk, key_s)
    # rank of each entry within its (row,col) group
    rank = np.arange(len(key_s)) - inv_first[slot_of_entry]
    C = int(rank.max()) + 1

    urow = (uk // N).astype(np.int64)
    ucol = (uk % N).astype(np.int64)
    # slot index of each unique (row,col) within its row
    row_first = np.searchsorted(urow, urow)       # first unique idx per row
    uslot = np.arange(len(uk)) - row_first
    Kr = int(uslot.max()) + 1

    ring_cols = np.tile(np.arange(N), (Kr, 1))
    vals0 = np.zeros((Kr, N))
    e_ids = np.zeros((C, Kr, N), np.int64)
    e_coef = np.zeros((C, Kr, N))

    ring_cols[uslot, urow] = ucol
    # static part: mass diag + H0 terms, accumulated per unique slot
    v0 = np.bincount(slot_of_entry,
                     weights=(base + coefs * H0[elems])[order],
                     minlength=len(uk))
    vals0[uslot, urow] = v0
    # hbar-correction contributions (skip the zero-coef mass entries)
    er, es, ec = urow[slot_of_entry], uslot[slot_of_entry], rank
    cf = coefs[order]
    nz = cf != 0.0
    e_ids[ec[nz], es[nz], er[nz]] = elems[order][nz]
    e_coef[ec[nz], es[nz], er[nz]] = cf[nz]

    # dead padded rows: identity
    dead = np.abs(vals0).sum(0) + np.abs(e_coef).sum((0, 1)) == 0
    if dead.any():
        vals0[0, dead] = 1.0
    return RingALE(jnp.asarray(ring_cols, jnp.int32),
                   jnp.asarray(vals0, dtype),
                   jnp.asarray(e_ids, jnp.int32),
                   jnp.asarray(e_coef, dtype))


@jax.tree_util.register_pytree_node_class
class BlockSchwarz:
    """Overlapping additive-Schwarz preconditioner with per-block dense
    inverses applied as one batched MXU matmul.

    This is the TPU-native counterpart of the reference's pARMS
    Restrictive Additive Schwarz preconditioner (``psolve.c:77-100``,
    ``lib/parms/src/parms_pc_ras.c``): blocks come from the same
    locality partitioner that plays the METIS role, each block is
    extended by its 1-ring overlap, and the subdomain solves are exact
    (precomputed dense inverses, [nb,K,K] x [nb,K] einsum on the MXU)
    instead of ILU.  The symmetric (non-restricted) AS combination keeps
    the preconditioner SPD so CG remains valid.
    """

    def __init__(self, block_ids, inv_blocks, node_slots, node_slot_valid,
                 coarse_ids=None, coarse_inv=None, coarse_part=None):
        self.block_ids = block_ids            # [nb, K] node index or -1
        self.inv_blocks = inv_blocks          # [nb, K, K]
        self.node_slots = node_slots          # [N, S] flat (b*K+p) or 0
        self.node_slot_valid = node_slot_valid  # [N, S] bool
        # optional 2nd level (2-level additive Schwarz): piecewise-constant
        # aggregation coarse space over the NON-overlapping block partition,
        # M = M_AS + R0^T A0^-1 R0 (still SPD).  This kills the low-frequency
        # modes 1-level Schwarz cannot damp, halving CG iterations at
        # CORE2-class mesh sizes.
        self.coarse_ids = coarse_ids          # [nb, Kc] node index or -1
        self.coarse_inv = coarse_inv          # [nb, nb] dense A0^-1
        self.coarse_part = coarse_part        # [N] block id per node

    def tree_flatten(self):
        return ((self.block_ids, self.inv_blocks, self.node_slots,
                 self.node_slot_valid, self.coarse_ids, self.coarse_inv,
                 self.coarse_part), None)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    def __call__(self, r):
        ids = self.block_ids
        valid = ids >= 0
        # 2-row stacks dodge the degenerate 1-row-table gather path
        r2 = jnp.stack([r, r])
        rb = jnp.where(valid, jnp.take(r2, jnp.where(valid, ids, 0),
                                       axis=-1)[0], 0.0)          # [nb, K]
        yb = jnp.einsum("bkl,bl->bk", self.inv_blocks, rb,
                        preferred_element_type=rb.dtype)
        flat = yb.reshape(-1)
        flat2 = jnp.stack([flat, flat])
        contrib = jnp.where(self.node_slot_valid,
                            jnp.take(flat2, self.node_slots, axis=-1)[0],
                            0.0)                                   # [N, S]
        y = contrib.sum(-1)
        if self.coarse_inv is not None:
            cv = self.coarse_ids >= 0
            rc = jnp.where(cv, jnp.take(r2, jnp.where(cv, self.coarse_ids,
                                                      0), axis=-1)[0], 0.0)
            r0 = rc.sum(-1)                                        # [nb]
            y0 = self.coarse_inv @ r0
            y02 = jnp.stack([y0, y0])
            y = y + jnp.take(y02, self.coarse_part, axis=-1)[0]
        # distributed: boundary blocks write partial sums at halo slots;
        # accumulate them into the owners (identity single-device)
        return ops.halo_accumulate_nodes(y)


def build_block_schwarz(mesh: MeshTables, cfg, block_size: int = 256,
                        dtype=jnp.float64) -> BlockSchwarz:
    """Build the block preconditioner: locality blocks from the offline
    partitioner, 1-ring overlap, dense per-block inverses."""
    import scipy.sparse as sp
    from ..parallel.partition import _partition_numpy, _sphere_xyz

    rows, cols, vals, N = ssh_sparse_coo(mesh, cfg)
    A = sp.coo_matrix((vals, (rows, cols)), shape=(N, N)).tocsr()
    A.sum_duplicates()
    A.eliminate_zeros()      # padded dummy edges leave structural zeros
    # dummy padded rows: identity
    dead = np.asarray(np.abs(A).sum(1)).ravel() == 0
    if dead.any():
        A = A + sp.diags(dead.astype(float))

    # compact geometric blocks (recursive coordinate bisection): unlike the
    # cut-minimizing run-time partition, preconditioner blocks want a small
    # perimeter so the 1-ring overlap (and hence K^2 memory) stays small
    nparts = max(1, int(round(N / block_size)))
    part = np.asarray(_partition_numpy(np.asarray(_sphere_xyz(mesh)),
                                       np.ones(N), nparts))
    nb = int(part.max()) + 1

    # block node lists + 1-ring overlap from the matrix graph
    indptr, indices = A.indptr, A.indices
    blocks = []
    for b in range(nb):
        own = np.nonzero(part == b)[0]
        if own.size == 0:
            blocks.append(own)
            continue
        ring = np.unique(indices[np.concatenate(
            [np.arange(indptr[i], indptr[i + 1]) for i in own])])
        ext = np.unique(np.concatenate([own, ring]))
        blocks.append(ext)
    K = max(1, max(len(b) for b in blocks))

    block_ids = np.full((nb, K), -1, np.int64)
    inv_blocks = np.zeros((nb, K, K))
    for b, ids in enumerate(blocks):
        n = len(ids)
        if n == 0:
            inv_blocks[b] = np.eye(K)
            continue
        block_ids[b, :n] = ids
        Ab = A[np.ix_(ids, ids)].toarray()
        inv_blocks[b, :n, :n] = np.linalg.inv(Ab)
        if n < K:
            inv_blocks[b, n:, n:] = np.eye(K - n)

    # node -> (block, pos) membership lists for the gather-based combine
    memb = [[] for _ in range(N)]
    for b, ids in enumerate(blocks):
        for p, nid in enumerate(ids):
            memb[nid].append(b * K + p)
    S = max(1, max(len(m) for m in memb))
    node_slots = np.zeros((N, S), np.int64)
    node_valid = np.zeros((N, S), bool)
    for nid, m in enumerate(memb):
        node_slots[nid, :len(m)] = m
        node_valid[nid, :len(m)] = True

    # partition-of-unity scaling keeps the symmetric AS well-conditioned:
    # scale each block inverse by 1/overlap-count symmetrically
    counts = node_valid.sum(-1).astype(float)             # [N]
    wsqrt = 1.0 / np.sqrt(np.maximum(counts, 1.0))
    for b, ids in enumerate(blocks):
        n = len(ids)
        if n == 0:
            continue
        w = wsqrt[ids]
        inv_blocks[b, :n, :n] = w[:, None] * inv_blocks[b, :n, :n] * w[None, :]

    # 2nd level: piecewise-constant aggregation over the NON-overlapping
    # block partition.  A0 = R0 A R0^T (nb x nb, dense inverse); applied
    # additively, it removes the global low-frequency error components the
    # local block solves cannot see.
    Kc = max(1, int(np.bincount(part, minlength=nb).max()))
    coarse_ids = np.full((nb, Kc), -1, np.int64)
    for b in range(nb):
        own = np.nonzero(part == b)[0]
        coarse_ids[b, :len(own)] = own
    R0 = sp.coo_matrix((np.ones(N), (part, np.arange(N))),
                       shape=(nb, N)).tocsr()
    A0 = (R0 @ A @ R0.T).toarray()
    empty = np.bincount(part, minlength=nb) == 0
    if empty.any():
        A0[empty] = 0.0
        A0[:, empty] = 0.0
        A0[empty, empty] = 1.0
    coarse_inv = np.linalg.inv(A0)

    return BlockSchwarz(jnp.asarray(block_ids, jnp.int32),
                        jnp.asarray(inv_blocks, dtype),
                        jnp.asarray(node_slots, jnp.int32),
                        jnp.asarray(node_valid),
                        coarse_ids=jnp.asarray(coarse_ids, jnp.int32),
                        coarse_inv=jnp.asarray(coarse_inv, dtype),
                        coarse_part=jnp.asarray(part, jnp.int32))


def build_block_schwarz_local(mesh: MeshTables, cfg, S: int,
                              node_l2g: np.ndarray, node_g2l: np.ndarray,
                              n_own: int, n_loc: int,
                              block_size: int = 256,
                              dtype=None) -> BlockSchwarz:
    """Stacked [S, ...] per-shard BlockSchwarz on the [owned | halo] local
    numbering — the distributed counterpart of :func:`build_block_schwarz`
    and the pARMS-RAS role for the PARALLEL solve (the reference solves the
    SSH system with a restricted-additive-Schwarz-preconditioned Krylov
    method across ranks, ``psolve.c:16-115``, ``lib/parms/src/parms_pc_ras.c``).

    Each shard's owned nodes are geometrically sub-partitioned into blocks
    of ~block_size; each block is extended by its matrix 1-ring (contained
    in owned+halo by the layout closure) and inverted densely.  Blocks are
    combined with GLOBAL partition-of-unity weights (overlap counts over
    ALL shards' blocks), so the summed operator is a symmetric additive
    Schwarz preconditioner and CG remains valid.  Boundary blocks write
    contributions at halo slots; BlockSchwarz.__call__ routes them to the
    owners through ops.halo_accumulate_nodes.
    """
    import scipy.sparse as sp
    from ..parallel.partition import _partition_numpy, _sphere_xyz

    if dtype is None:
        dtype = mesh.zbar.dtype
    rows, cols, vals, N = ssh_sparse_coo(mesh, cfg)
    A = sp.coo_matrix((vals, (rows, cols)), shape=(N, N)).tocsr()
    A.sum_duplicates()
    A.eliminate_zeros()
    dead = np.asarray(np.abs(A).sum(1)).ravel() == 0
    if dead.any():
        A = (A + sp.diags(dead.astype(float))).tocsr()
    indptr, indices = A.indptr, A.indices
    xyz = np.asarray(_sphere_xyz(mesh))

    shard_blocks = []
    for s in range(S):
        own = node_l2g[s, :n_own]
        own = own[own >= 0]
        nparts = max(1, int(round(len(own) / block_size)))
        p = np.asarray(_partition_numpy(xyz[own], np.ones(len(own)), nparts))
        blocks = []
        for b in range(int(p.max()) + 1):
            ids = own[p == b]
            if ids.size == 0:
                continue
            ring = np.unique(indices[np.concatenate(
                [np.arange(indptr[i], indptr[i + 1]) for i in ids])])
            blocks.append(np.unique(np.concatenate([ids, ring])))
        shard_blocks.append(blocks)

    counts = np.zeros(N)
    for blocks in shard_blocks:
        for ids in blocks:
            counts[ids] += 1
    wsqrt = 1.0 / np.sqrt(np.maximum(counts, 1.0))

    nb = max(len(b) for b in shard_blocks)
    K = max(1, max((len(ids) for blocks in shard_blocks for ids in blocks),
                   default=1))
    bi = np.full((S, nb, K), -1, np.int64)
    inv = np.zeros((S, nb, K, K))
    memb = [[[] for _ in range(n_loc)] for _ in range(S)]
    for s in range(S):
        g2l = node_g2l[s]
        for b, ids in enumerate(shard_blocks[s]):
            loc = g2l[ids]
            if (loc < 0).any():
                raise AssertionError(
                    "block 1-ring escaped the shard halo closure")
            n = len(ids)
            bi[s, b, :n] = loc
            w = wsqrt[ids]
            Abinv = np.linalg.inv(A[np.ix_(ids, ids)].toarray())
            inv[s, b, :n, :n] = w[:, None] * Abinv * w[None, :]
            if n < K:
                inv[s, b, n:, n:] = np.eye(K - n)
            for pth, l in enumerate(loc):
                memb[s][l].append(b * K + pth)
        for b in range(len(shard_blocks[s]), nb):
            inv[s, b] = np.eye(K)
    R = max(1, max(len(m) for sm in memb for m in sm))
    node_slots = np.zeros((S, n_loc, R), np.int64)
    node_valid = np.zeros((S, n_loc, R), bool)
    for s in range(S):
        for nid, m in enumerate(memb[s]):
            node_slots[s, nid, :len(m)] = m
            node_valid[s, nid, :len(m)] = True
    return BlockSchwarz(jnp.asarray(bi, jnp.int32),
                        jnp.asarray(inv, dtype),
                        jnp.asarray(node_slots, jnp.int32),
                        jnp.asarray(node_valid))


def ssh_matrix_diagonal(mesh: MeshTables, cfg) -> jnp.ndarray:
    """Exact diagonal of the assembled operator, for Jacobi preconditioning.

    Host-side numpy assembly mirroring init_stiff_mat_ale's edge loop
    (``oce_ale.F90:1202-1270``) but keeping only entries col==row.
    """
    edges = np.asarray(mesh.edges)
    etri = np.asarray(mesh.edge_tri)
    en = np.asarray(mesh.elem_nodes)
    gsca = np.asarray(mesh.gradient_sca)
    ecd = np.asarray(mesh.edge_cross_dxdy)
    zbar = np.asarray(mesh.zbar)
    H = np.asarray(mesh.zbar_e_bot) - zbar[np.asarray(mesh.ulevels_elem) - 1]
    dt = cfg.dt
    factor = g * dt * cfg.dyn.alpha * cfg.dyn.theta

    avn = np.asarray(mesh.areasvol)
    uln0 = np.asarray(mesh.ulevels_node) - 1
    diag = avn[uln0, np.arange(avn.shape[1])] / dt
    diag = diag.copy()
    for i in range(2):
        el = etri[:, i]
        ok = el >= 0
        els = np.where(ok, el, 0)
        dX = ecd[:, 2 * i]
        dY = ecd[:, 2 * i + 1]
        sgn = 1.0 if i == 0 else -1.0
        # fy_k = H * (gx_k*dY - gy_k*dX), added to row=edges[:,0] (+) and
        # row=edges[:,1] (-) when elnodes_k equals the row node.
        for k in range(3):
            fy = H[els] * (gsca[els, k] * dY - gsca[els, k + 3] * dX) * sgn
            fy = np.where(ok, fy, 0.0)
            node_k = en[els, k]
            for j, rsgn in ((0, 1.0), (1, -1.0)):
                row = edges[:, j]
                hit = node_k == row
                np.add.at(diag, row, np.where(hit, rsgn * fy * factor, 0.0))
    return jnp.asarray(diag, mesh.zbar.dtype)


def compute_ssh_rhs(state: OceanState, mesh: MeshTables, cfg, forcing: Forcing,
                    u_rhs, v_rhs):
    """ssh_rhs = -alpha*div(int (u+du) dz) + ... (ref compute_ssh_rhs_ale :1478)."""
    alpha = cfg.dyn.alpha
    lmask = mesh.elem_layer_mask
    he = jnp.where(lmask, state.helem, 0.0)

    c = alpha * edge_transport((state.u + u_rhs) * he,
                               (state.v + v_rhs) * he, mesh).sum(0)
    rhs = edge_divergence(c, mesh)
    if cfg.ale.which_ALE == "linfs":
        rhs = rhs + (1.0 - alpha) * state.ssh_rhs_old
    else:
        av_srf = jnp.take_along_axis(
            mesh.areasvol,
            (mesh.ulevels_node - 1)[None, :].astype(jnp.int32), 0)[0]
        rhs = rhs - alpha * forcing.water_flux * av_srf \
            + (1.0 - alpha) * state.ssh_rhs_old
    return rhs


def solve_ssh(state: OceanState, mesh: MeshTables, cfg, diag_inv, rhs,
              psum=None, ring=None, x0=None):
    """CG solve for d_eta (replaces psolve; tolerances oce_ale.F90:2296-2301).

    The reference's soltol=1e-10 assumes f64 arithmetic; in reduced precision
    that level is unreachable, so the tolerance adapts to the state dtype
    (~100x unit roundoff) unless cfg.dyn carries an explicit `ssh_tol`.

    ``ring``: precomputed RingOperator (linfs only) — one packed gather
    per operator application instead of the edge-stencil chain.
    """
    if ring is not None and cfg.ale.which_ALE == "linfs":
        op = ring
    elif cfg.ale.which_ALE == "linfs":
        op = ssh_operator(mesh, cfg)
    else:
        hbar_e = elem_mean_node(state.hbar, mesh)
        hbar_e = jnp.where(mesh.ulevels_elem == 1, hbar_e, 0.0)
        if ring is not None and isinstance(ring, RingALE):
            # one packed value rebuild per step, one packed gather per
            # CG iteration (vs the 6-gather edge-stencil chain)
            op = ring.materialize(hbar_e)
        else:
            op = ssh_operator(mesh, cfg, hbar_e=hbar_e)
    tol = getattr(cfg.dyn, "ssh_tol", None)
    if tol is None:
        tol = 1e-10 if jnp.finfo(rhs.dtype).bits >= 64 else 2e-5
    d_eta, iters, res = pcg(op, rhs, diag_inv, x0=x0, tol=tol, maxiter=2000,
                            psum=psum)
    return d_eta, iters, res


def compute_hbar(state: OceanState, mesh: MeshTables, cfg,
                 forcing: Forcing) -> OceanState:
    """hbar(n+1/2) update (ref compute_hbar_ale :1585-1676)."""
    lmask = mesh.elem_layer_mask
    he = jnp.where(lmask, state.helem, 0.0)

    c = edge_transport(state.u * he, state.v * he, mesh).sum(0)
    rhs_old = edge_divergence(c, mesh)
    av_srf = jnp.take_along_axis(
        mesh.areasvol, (mesh.ulevels_node - 1)[None, :].astype(jnp.int32),
        0)[0]
    if cfg.ale.which_ALE != "linfs":
        rhs_old = rhs_old - forcing.water_flux * av_srf
    hbar_old = state.hbar
    hbar = hbar_old + rhs_old * cfg.dt / jnp.where(av_srf > 0, av_srf, 1.0)
    return replace(state, hbar=hbar, hbar_old=hbar_old, ssh_rhs_old=rhs_old)
