"""Core mesh operators: gathers, scatter-adds, gradients, vertical solvers.

These are the TPU-native building blocks replacing the reference's hand-written
edge/element/node loops.  Conventions:

- Layout is levels-major ``[nl(-1), X]`` where X is nodes/elements/edges.
- Gathers use plain advanced indexing on the minor axis (XLA gather); scatters
  use ``.at[].add`` which lowers to deterministic XLA scatter.
- Every operator respects the bottom topography through the masks carried by
  MeshTables; padded entries (-1 indices) must be masked by the caller where
  noted.

Reference precedents are cited per function.
"""
from __future__ import annotations

import contextlib

import jax
import jax.numpy as jnp

from ..mesh import MeshTables


# --------------------------------------------------------------------------
# distributed-execution context (partition-aware halo runtime)
# --------------------------------------------------------------------------
# When the step runs per-shard inside shard_map (parallel/dist.py), every
# node/element ASSEMBLY below produces exact values only at OWNED entities
# (halo incidence rows are incomplete on purpose).  The active DistContext
# repairs the halo slots right after each assembly with a packed neighbor
# exchange (all_to_all over the 'cell' mesh axis) — the TPU-native
# equivalent of the reference's exchange_nod/exchange_elem calls after each
# kernel family (gen_halo_exchange.F90:129-164).  Single-device execution
# (no context) is completely unaffected: the hooks are identity.
_DIST_CTX = None


@contextlib.contextmanager
def dist_context(ctx):
    """Activate a DistContext for the duration of a trace."""
    global _DIST_CTX
    prev = _DIST_CTX
    _DIST_CTX = ctx
    try:
        yield ctx
    finally:
        _DIST_CTX = prev


def halo_fix_nodes(x: jnp.ndarray) -> jnp.ndarray:
    """Replace halo-node entries of x [..., n_loc] with their owners' values
    (identity outside a dist context)."""
    if _DIST_CTX is None:
        return x
    return _DIST_CTX.exchange_nodes(x)


def halo_fix_elems(x: jnp.ndarray) -> jnp.ndarray:
    """Replace halo-element entries of x [..., e_loc] with owners' values."""
    if _DIST_CTX is None:
        return x
    return _DIST_CTX.exchange_elems(x)


def halo_accumulate_nodes(x: jnp.ndarray) -> jnp.ndarray:
    """ADD halo-slot contributions of x [..., n_loc] into their owners and
    refresh halos (identity outside a dist context).  The reverse direction
    of halo_fix_nodes — for operators (block-Schwarz combine) whose local
    application writes partial sums at halo slots."""
    if _DIST_CTX is None:
        return x
    return _DIST_CTX.accumulate_nodes(x)


def node_sum(v: jnp.ndarray):
    """Global sum of a node field: plain sum single-device; owned-masked
    psum over the device mesh under a dist context (halo copies and padding
    must not be double counted)."""
    if _DIST_CTX is None:
        return jnp.sum(v)
    return _DIST_CTX.gsum_nodes(v)


def take_last(x: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """jnp.take along the last axis, always presenting a RANK-2 operand.

    Two measured TPU gather cliffs this dodges (scripts/gather_micro.py,
    scripts/gather_cost_model.py): a 1-row-table gather is ~2.3x slower
    than the same gather from a >=2-row stack, and a rank-3+ operand falls
    into a ~7x-slower batched gather mode.  Leading axes are flattened into
    the row axis (cheap: gather cost is ~fixed-per-index plus a small
    per-row term) and restored on the output."""
    if x.ndim == 1:
        return jnp.take(jnp.stack([x, x]), idx, axis=-1)[0]
    if x.ndim == 2:
        return jnp.take(x, idx, axis=-1)
    out = jnp.take(x.reshape(-1, x.shape[-1]), idx, axis=-1)
    return out.reshape(x.shape[:-1] + idx.shape)


# --------------------------------------------------------------------------
# gathers
# --------------------------------------------------------------------------
def gather_nodes(x: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """x[..., N] gathered at idx[...]: returns x[..., idx] along the last axis."""
    return jnp.take(x, idx, axis=-1)


def take_row(a: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Per-column row gather: a[..., L, N] at row idx[N] -> [..., N].  Used
    for "the surface row" when the surface index varies per column (ice-shelf
    cavities: row = ulevels-1)."""
    ib = jnp.broadcast_to(idx.astype(jnp.int32),
                          a.shape[:-2] + (1,) + idx.shape[-1:])
    return jnp.take_along_axis(a, ib, axis=-2)[..., 0, :]


def elem_mean_node(x: jnp.ndarray, mesh: MeshTables) -> jnp.ndarray:
    """Average a node field to elements: [.., N] -> [.., E] (ref: sum(x(elnodes))/3)."""
    xe = jnp.take(x, mesh.elem_nodes, axis=-1)     # [.., E, 3]
    return xe.mean(axis=-1)


def scatter_add_nodes(vals: jnp.ndarray, idx: jnp.ndarray, n_nodes: int) -> jnp.ndarray:
    """Scatter-add vals[.., K] into a zero array [.., n_nodes] at idx[K]."""
    shape = vals.shape[:-1] + (n_nodes,)
    return halo_fix_nodes(jnp.zeros(shape, vals.dtype).at[..., idx].add(vals))


def edge_transport(uh: jnp.ndarray, vh: jnp.ndarray,
                   mesh: MeshTables) -> jnp.ndarray:
    """Per-edge transport through the two centroid-to-midpoint segments:

    ``c = (vh|et1*dX1 - uh|et1*dY1) - (vh|et2*dX2 - uh|et2*dY2)``

    (ref oce_ale.F90:1724-1780 and compute_hbar/ssh_rhs edge loops).  The
    (uh, vh) pair rides one merged gather per edge-triangle side.  Callers
    pass already level-masked uh = u*he etc.; masked rows contribute exact
    zeros."""
    et1, et2 = mesh.edge_tri[:, 0], mesh.edge_tri[:, 1]
    has2 = et2 >= 0
    et2s = jnp.where(has2, et2, 0)
    dX1, dY1 = mesh.edge_cross_dxdy[:, 0], mesh.edge_cross_dxdy[:, 1]
    dX2, dY2 = mesh.edge_cross_dxdy[:, 2], mesh.edge_cross_dxdy[:, 3]
    uv = jnp.stack([uh, vh])
    q1 = take_last(uv, et1)
    q2 = take_last(uv, et2s)
    c1 = q1[1] * dX1 - q1[0] * dY1
    c2 = jnp.where(has2, -(q2[1] * dX2 - q2[0] * dY2), 0.0)
    return c1 + c2


def edge_divergence(flux: jnp.ndarray, mesh: MeshTables) -> jnp.ndarray:
    """Assemble per-node divergence from signed edge fluxes.

    flux[.., Ed] is the flux through each edge counted positive INTO node
    edges[:,0]; returns [.., N] with +flux at node0 and -flux at node1.
    (ref pattern: ssh_rhs(enodes(1))+=c; ssh_rhs(enodes(2))-=c, oce_ale.F90:1542)

    Implemented as a GATHER over the precomputed per-node incident-edge table
    (mesh.node_edges/node_edge_sign) — TPU scatters serialize on colliding
    indices, gathers don't.  The reduce runs CHUNKED over the incidence
    rows (running sum) so the [.., KE, N] gathered block — GBs at CORE2+
    scale with merged operands — is never materialized in HBM.
    """
    # transposed [KE, N] tables keep the wide node axis minor (TPU tiling)
    ne = mesh.node_edges.T                 # [KE, N]
    valid = ne >= 0
    safe = jnp.where(valid, ne, 0)
    sign = jnp.where(valid, mesh.node_edge_sign.T, 0.0)
    if _rows(flux) * ne.shape[0] * ne.shape[1] <= _CHUNK_ELEMS:
        vals = take_last(flux, safe)       # [.., KE, N]
        return halo_fix_nodes((vals * sign).sum(-2))
    out = None
    for kk in range(ne.shape[0]):
        v = take_last(flux, safe[kk]) * sign[kk]
        out = v if out is None else out + v
    return halo_fix_nodes(out)


def edge_signed_reduce(flux: jnp.ndarray, mesh: MeshTables, fn) -> jnp.ndarray:
    """Reduce fn(sign * flux) over each node's incident edges (gather-based,
    chunked running reduce — see edge_divergence).

    Used by the FCT limiter's plus/minus antidiffusive sums (fn = relu / -relu
    of the node-oriented flux)."""
    ne = mesh.node_edges.T
    valid = ne >= 0
    safe = jnp.where(valid, ne, 0)
    sign = jnp.where(valid, mesh.node_edge_sign.T, 0.0)
    out = None
    for kk in range(ne.shape[0]):
        v = fn(take_last(flux, safe[kk]) * sign[kk])
        v = jnp.where(valid[kk], v, 0.0)
        out = v if out is None else out + v
    return halo_fix_nodes(out)


def take_multi(fields, *idxs):
    """Gather a list of arrays (any leading shapes, same trailing axis) at one
    or more index tables, with ONE merged rank-2 gather per index table.

    All fields are flattened to rows and concatenated once; each idx in
    ``idxs`` triggers a single jnp.take of the merged operand.  Returns a
    tuple (one entry per idx) of lists (one entry per field) with shapes
    ``field.shape[:-1] + idx.shape``.  Merging amortises the per-index
    gather cost that dominates TPU gathers (scripts/gather_cost_model.py)."""
    X = fields[0].shape[-1]
    flats = [f[None] if f.ndim == 1 else f.reshape(-1, X) for f in fields]
    rows = jnp.concatenate(flats, 0)
    if rows.shape[0] == 1:
        rows = jnp.concatenate([rows, rows], 0)
    outs = []
    for idx in idxs:
        got = jnp.take(rows, idx, axis=-1)
        res = []
        o = 0
        for f, fl in zip(fields, flats):
            r = fl.shape[0]
            res.append(got[o:o + r].reshape(f.shape[:-1] + idx.shape))
            o += r
        outs.append(res)
    return tuple(outs) if len(idxs) > 1 else outs[0]


def edge_signed_reduce2(flux: jnp.ndarray, mesh: MeshTables):
    """(plus, minus) antidiffusive sums over each node's incident edges from
    ONE gather pass of the node-oriented signed flux — the FCT b1 pair
    (ref oce_adv_tra_fct.F90:215-263).  Identical results to calling
    edge_signed_reduce with max(0,.) and min(0,.) separately, at half the
    gather-index cost (the gather dominates; both reductions consume the
    same gathered values).  Chunked running reduce over the incidence rows
    (peak-memory, see edge_divergence)."""
    ne = mesh.node_edges.T
    valid = ne >= 0
    safe = jnp.where(valid, ne, 0)
    sign = jnp.where(valid, mesh.node_edge_sign.T, 0.0)
    if _rows(flux) * ne.shape[0] * ne.shape[1] <= _CHUNK_ELEMS:
        vals = take_last(flux, safe) * sign
        plus = jnp.maximum(vals, 0.0).sum(-2)
        minus = jnp.minimum(vals, 0.0).sum(-2)
    else:
        plus = minus = None
        for kk in range(ne.shape[0]):
            v = take_last(flux, safe[kk]) * sign[kk]
            p = jnp.maximum(v, 0.0)
            m = jnp.minimum(v, 0.0)
            plus = p if plus is None else plus + p
            minus = m if minus is None else minus + m
    both = halo_fix_nodes(jnp.stack([plus, minus]))
    return both[0], both[1]


# gathered blocks above this element count run as chunked running reduces
# (one gather per incidence row) instead of one [..., K, N] gather — same
# total index count, but the K-wide block never hits HBM (it OOM'd the
# 188k-node coupled step once the tracer pipeline was batched)
_CHUNK_ELEMS = 1 << 26


def _masked_gather_sum(flat, idx, valid, rows: int):
    """sum_k where(valid[k], flat[..., idx[k]], 0) with the K axis chunked
    when the gathered block would be large."""
    K, N = idx.shape
    if rows * K * N <= _CHUNK_ELEMS:
        vals = take_last(flat, idx)                          # [..., K, N]
        return jnp.where(valid, vals, 0.0).sum(-2)
    out = None
    for kk in range(K):
        v = jnp.where(valid[kk], take_last(flat, idx[kk]), 0.0)
        out = v if out is None else out + v
    return out


def _rows(x: jnp.ndarray) -> int:
    n = 1
    for s in x.shape[:-1]:
        n *= s
    return n


def elem_contrib_to_nodes(contrib: jnp.ndarray, mesh: MeshTables) -> jnp.ndarray:
    """Accumulate per-(element, local-vertex) contributions onto nodes.

    contrib [..., E, 3]: the value element e adds to its k-th vertex.
    Gather-based (scatter-free): each node pulls from its adjacent elements
    using nod_in_elem plus the node's local slot within each element.
    The gather runs on transposed [K, N] index tables so the wide node axis
    stays minor (TPU lane dimension).
    """
    nie = mesh.nod_in_elem.T                    # [K, N]
    valid = nie >= 0
    safe = jnp.where(valid, nie, 0)
    slot = mesh.nod_in_elem_slot.T
    flat = contrib.reshape(contrib.shape[:-2] + (-1,))       # [..., E*3]
    idx = safe * 3 + slot                                    # [K, N]
    return halo_fix_nodes(
        _masked_gather_sum(flat, idx, valid, _rows(flat)))


def elem_contrib_to_nodes_3e(contrib: jnp.ndarray, mesh: MeshTables) -> jnp.ndarray:
    """Same as elem_contrib_to_nodes but contrib is [..., 3, E] (vertex-major
    layout, keeping the wide element axis minor for TPU tiling)."""
    nie = mesh.nod_in_elem.T                    # [K, N]
    valid = nie >= 0
    safe = jnp.where(valid, nie, 0)
    slot = mesh.nod_in_elem_slot.T
    E = mesh.n_elems
    flat = contrib.reshape(contrib.shape[:-2] + (-1,))       # [..., 3*E]
    idx = slot * E + safe                                    # [K, N]
    return halo_fix_nodes(
        _masked_gather_sum(flat, idx, valid, _rows(flat)))


def scalar_gradient(f_nodes: jnp.ndarray, mesh: MeshTables):
    """Gradient of a node scalar on elements via gradient_sca coefficients.

    f_nodes [.., N] -> (gx, gy) each [.., E].
    ref: tracer_gradient_elements (oce_tracer_mod.F90:19-45).
    """
    fe = jnp.take(f_nodes, mesh.elem_nodes, axis=-1)         # [.., E, 3]
    gx = (fe * mesh.gradient_sca[:, 0:3]).sum(-1)
    gy = (fe * mesh.gradient_sca[:, 3:6]).sum(-1)
    return gx, gy


def elem_to_node_mean(x_elem: jnp.ndarray, mesh: MeshTables,
                      weight_area: bool = True,
                      respect_levels: bool = True) -> jnp.ndarray:
    """Area-weighted average of an element field to nodes.

    x_elem [.., nl-1, E] (or [.., E]) -> [.., nl-1, N] (or [.., N]).
    Matches compute_vel_nodes (oce_dyn.F90:133-169): at each (node, layer) only
    elements active on that layer contribute.
    """
    nie = mesh.nod_in_elem              # [N, K]
    valid = nie >= 0
    safe = jnp.where(valid, nie, 0)
    w = jnp.where(valid, jnp.take(mesh.elem_area, safe), 0.0)  # [N, K]
    if x_elem.ndim == 1:
        xv = take_last(x_elem, safe)                           # [N, K]
        num = (xv * w).sum(-1)
        den = w.sum(-1)
        return halo_fix_nodes(num / den)
    # leveled: x_elem [..., nl-1, E] (leading axes flattened for the gather)
    K = safe.shape[-1]
    if _rows(x_elem) * K * safe.shape[0] <= _CHUNK_ELEMS:
        xv = take_last(x_elem, safe)                           # [..., L, N, K]
        if respect_levels:
            lmask = jnp.take(mesh.elem_layer_mask, safe, axis=-1)
            wl = jnp.where(lmask, w[None], 0.0)
        else:
            wl = jnp.broadcast_to(w[None], xv.shape)
        num = (xv * wl).sum(-1)
        den = wl.sum(-1)
        return halo_fix_nodes(num / jnp.maximum(den, 1e-30))
    # chunked running reduce over the incidence slots (peak memory)
    num = den = None
    for kk in range(K):
        if respect_levels:
            lm = jnp.take(mesh.elem_layer_mask, safe[:, kk], axis=-1)
            wk = jnp.where(lm, w[:, kk], 0.0)                  # [L, N]
        else:
            wk = w[:, kk]
        v = take_last(x_elem, safe[:, kk]) * wk
        num = v if num is None else num + v
        den = wk if den is None else den + wk
    return halo_fix_nodes(num / jnp.maximum(den, 1e-30))


def elem_to_node_mean_flat(xs: jnp.ndarray, mesh: MeshTables) -> jnp.ndarray:
    """Stacked SURFACE element fields [F, E] -> [F, N]: the area-weighted
    1-D branch of elem_to_node_mean with the nod_in_elem gather merged over
    the F fields (level masks do not apply to surface fields)."""
    nie = mesh.nod_in_elem              # [N, K]
    valid = nie >= 0
    safe = jnp.where(valid, nie, 0)
    w = jnp.where(valid, jnp.take(mesh.elem_area, safe), 0.0)
    xv = take_last(xs, safe)            # [F, N, K]
    num = (xv * w).sum(-1)
    den = w.sum(-1)
    return halo_fix_nodes(num / den)


# --------------------------------------------------------------------------
# vertical (column) solvers
# --------------------------------------------------------------------------
def tridiag_solve(a: jnp.ndarray, b: jnp.ndarray, c: jnp.ndarray,
                  d: jnp.ndarray) -> jnp.ndarray:
    """Thomas algorithm, batched: solves tridiag(a,b,c) x = d.

    All inputs [nl, X]: a sub-, b main-, c super-diagonal along axis 0.
    Rows outside the active column range must be preconditioned by the caller
    to identity (a=c=0, b=1, d=0) so the sweep passes through them harmlessly.
    Implemented as two lax.scans over the level axis (VPU-friendly: each step
    operates on a full [X] lane vector).
    """
    def fwd(carry, abcd):
        cp_prev, dp_prev = carry
        a_, b_, c_, d_ = abcd
        m = b_ - cp_prev * a_
        cp = c_ / m
        dp = (d_ - dp_prev * a_) / m
        return (cp, dp), (cp, dp)

    zeros = jnp.zeros_like(d[0])
    (_, _), (cp, dp) = jax.lax.scan(fwd, (zeros, zeros), (a, b, c, d))

    def bwd(x_next, cpdp):
        cp_, dp_ = cpdp
        x = dp_ - cp_ * x_next
        return x, x

    _, xs = jax.lax.scan(bwd, zeros, (cp, dp), reverse=True)
    return xs


def cumsum_bottom_up(x: jnp.ndarray) -> jnp.ndarray:
    """Cumulative sum from the bottom level upwards along axis 0.

    out[k] = sum_{j>=k} x[j]  (ref: W_k = W_{k+1} + div_k, oce_ale.F90:1789-1799).
    """
    return jnp.flip(jnp.cumsum(jnp.flip(x, 0), 0), 0)


# --------------------------------------------------------------------------
# preconditioned conjugate gradient (replaces psolve.c + pARMS)
# --------------------------------------------------------------------------
def pcg(operator, rhs: jnp.ndarray, diag_inv: jnp.ndarray,
        x0: jnp.ndarray = None, tol: float = 1e-10, maxiter: int = 2000,
        psum=None, chunk: int = 4):
    """Preconditioned CG for the SPD SSH operator.

    Matrix-free replacement for the reference pARMS BiCGstab+RAS solve
    (``psolve.c:152-221``; tolerances from ``oce_ale.F90:2295-2301``; the
    operator is SPD so CG applies, as noted at ``oce_ale.F90:2321``).

    `psum` is an optional reduction for sharded execution; under a dist
    context it defaults to the owned-masked cross-shard sum.  The residual
    norm is carried through the while_loop so the loop condition contains
    no collective (XLA requires a replicated scalar cond).

    `chunk` CG iterations run per while_loop trip (statically unrolled):
    convergence is only checked every `chunk` iterations, which amortizes
    the loop-carried dependency/dispatch overhead of tiny per-iteration
    kernels on TPU; once converged, the remaining iterations of the final
    chunk are masked no-ops (guarded against 0/0), so the answer is the
    same as checking every iteration, up to <chunk extra (harmless)
    iterations of refinement.
    Returns (x, iterations, relative_residual).
    """
    if psum is None:
        psum = node_sum
    if x0 is None:
        x0 = jnp.zeros_like(rhs)
    if callable(diag_inv):
        apply_M = diag_inv          # general preconditioner (block-Schwarz)
    else:
        def apply_M(r):
            return diag_inv * r

    r = rhs - operator(x0)
    z = apply_M(r)
    p = z
    rz = psum(r * z)
    rr = psum(r * r)
    rhs_norm = jnp.sqrt(psum(rhs * rhs)) + 1e-300
    tol2 = (tol * rhs_norm) ** 2

    def one_iter(carry):
        x, r, p, rz, rr, it = carry
        live = rr > tol2                     # mask once converged
        Ap = operator(p)
        pAp = psum(p * Ap)
        alpha = jnp.where(live, rz / jnp.where(pAp != 0, pAp, 1.0), 0.0)
        x = x + alpha * p
        r = r - alpha * Ap
        z = apply_M(r)
        rz_new = psum(r * z)
        rr = psum(r * r)
        beta = jnp.where(live, rz_new / jnp.where(rz != 0, rz, 1.0), 0.0)
        p = jnp.where(live, z + beta * p, p)
        rz = jnp.where(live, rz_new, rz)
        return (x, r, p, rz, rr, it + jnp.where(live, 1, 0))

    def cond(carry):
        x, r, p, rz, rr, it = carry
        return jnp.logical_and(rr > tol2, it < maxiter)

    def body(carry):
        for _ in range(chunk):
            carry = one_iter(carry)
        return carry

    x, r, p, rz, rr, it = jax.lax.while_loop(cond, body,
                                             (x0, r, p, rz, rr, 0))
    res = jnp.sqrt(rr) / rhs_norm
    return x, it, res
