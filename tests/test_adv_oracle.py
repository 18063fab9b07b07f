"""Coefficient-level oracles for the advection schemes.

Each oracle below is a deliberate line-faithful numpy transcription of the
reference loop nest (file:line cited per function), evaluated on the real pi
mesh with synthetic masked fields, and compared against the shipped
vectorized kernels to roundoff.  This replaces bounds-only checks with
stencil-coefficient parity (the test_cvmix_oracle.py technique).

Transcribed loops (oracles ONLY — the shipped kernels are independent
vectorized implementations):
- fill_up_dn_grad            src/oce_muscl_adv.F90:286-447
- adv_tra_hor_upw1           src/oce_adv_tra_hor.F90:57-213
- adv_tra_hor_muscl          src/oce_adv_tra_hor.F90:215-483
- adv_tra_ver_qr4c           src/oce_adv_tra_ver.F90:286-360
- adv_tra_vert_ppm           src/oce_adv_tra_ver.F90:361-538
- oce_tra_adv_fct            src/oce_adv_tra_fct.F90:58-349 (vlimit=1)

pi has no ice-shelf cavity (ulevels==1 everywhere), so the cavity-only A/B
loops of the horizontal schemes are empty; the C/D/E loops and all level
bookkeeping are exercised with the mesh's real variable bottom topography.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from fesom2_tpu.constants import r_earth
from fesom2_tpu.core import tracers
from fesom2_tpu.core.state import initial_z3d
from fesom2_tpu.core.tracer_setup import build_tracer_statics


DT = 900.0
NUM_ORD = 0.85


@pytest.fixture(scope="module")
def fields(pi_mesh):
    mesh = pi_mesh
    st = build_tracer_statics(mesh)
    rng = np.random.RandomState(42)
    nl, N, E = mesh.nl, mesh.n_nodes, mesh.n_elems
    nmask = np.asarray(mesh.node_layer_mask)
    emask = np.asarray(mesh.elem_layer_mask)
    nln = np.asarray(mesh.nlevels_node)

    t = np.where(nmask, 20.0 + rng.randn(nl - 1, N), 0.0)
    u = np.where(emask, 0.1 * rng.randn(nl - 1, E), 0.0)
    v = np.where(emask, 0.1 * rng.randn(nl - 1, E), 0.0)
    helem = np.where(emask, 10.0 + rng.rand(nl - 1, E), 0.0)
    lev = np.arange(nl)[:, None]
    w = np.where(lev < (nln - 1)[None, :], 0.01 * rng.randn(nl, N), 0.0)
    zbar_3d, Z_3d = initial_z3d(mesh, jnp.float64)
    hnode = np.where(nmask, np.asarray(zbar_3d[:-1] - zbar_3d[1:]), 0.0)
    hnode = np.where(nmask, np.maximum(hnode, 1.0), 0.0)
    hnode_new = np.where(nmask, hnode * (1.0 + 0.05 * rng.rand(nl - 1, N)),
                         0.0)
    return dict(mesh=mesh, st=st, t=t, u=u, v=v, w=w, helem=helem,
                hnode=hnode, hnode_new=hnode_new,
                zbar_3d=np.asarray(zbar_3d), Z_3d=np.asarray(Z_3d))


def _edge_levels(mesh, edge):
    """(nl1, nu1, nl2, nu2) 1-based level bookkeeping of one edge
    (the prologue shared by every horizontal scheme, oce_adv_tra_hor.F90:96-121)."""
    etri = np.asarray(mesh.edge_tri)
    nle = np.asarray(mesh.nlevels_elem)
    ule = np.asarray(mesh.ulevels_elem) if hasattr(mesh, "ulevels_elem") \
        else np.ones_like(nle)
    el1, el2 = etri[edge]
    nl1 = nle[el1] - 1
    nu1 = ule[el1]
    nl2 = nu2 = 0
    if el2 >= 0:
        nl2 = nle[el2] - 1
        nu2 = ule[el2]
    return el1, el2, nl1, nu1, nl2, nu2


# ---------------------------------------------------------------------------
# fill_up_dn_grad oracle (oce_muscl_adv.F90:286-447)
# ---------------------------------------------------------------------------
def _node_avg_grad(mesh, gx, gy, n, nz0):
    """Area-weighted mean element gradient around node n at 0-based layer
    nz0, skipping elements inactive on that layer (ref :318-327)."""
    nie = np.asarray(mesh.nod_in_elem)[n]
    nle = np.asarray(mesh.nlevels_elem)
    ea = np.asarray(mesh.elem_area)
    tvol = tx = ty = 0.0
    for elem in nie:
        if elem < 0:
            continue
        if nle[elem] - 1 < nz0 + 1:      # nlevels(elem)-1 < nz (1-based)
            continue
        tvol += ea[elem]
        tx += gx[nz0, elem] * ea[elem]
        ty += gy[nz0, elem] * ea[elem]
    return tx / tvol, ty / tvol


def test_fill_up_dn_grad_oracle(fields):
    mesh, st = fields["mesh"], fields["st"]
    gx, gy = tracers.tracer_gradient_elements(jnp.asarray(fields["t"]), mesh)
    eg_vec = np.stack([np.asarray(e) for e in
                       tracers.fill_up_dn_grad(gx, gy, mesh, st)])
    gx, gy = np.asarray(gx), np.asarray(gy)

    edges = np.asarray(mesh.edges)
    updn = np.asarray(st.edge_up_dn_tri)
    nln = np.asarray(mesh.nlevels_node)
    # nlevels_nod2D_min analog (min level count over adjacent elements)
    nie = np.asarray(mesh.nod_in_elem)
    nle = np.asarray(mesh.nlevels_elem)
    nln_min = np.where(nie >= 0, nle[np.where(nie >= 0, nie, 0)],
                       10 ** 6).min(-1)

    rng = np.random.RandomState(7)
    sel = rng.choice(edges.shape[0], 60, replace=False)
    # make sure boundary-fallback edges are covered
    sel = np.unique(np.concatenate([sel, np.nonzero(updn.min(-1) < 0)[0][:20]]))

    for edge in sel:
        n1, n2 = edges[edge]
        up, dn = updn[edge]
        if up >= 0 and dn >= 0:
            nzmax = min(nln_min[n1], nln_min[n2])      # 1-based
            # shared rows 1..nzmax-1: the up/dn triangle gradients (ref :355-360)
            for nz in range(1, nzmax):
                assert eg_vec[0, nz - 1, edge] == pytest.approx(gx[nz - 1, up], rel=1e-13)
                assert eg_vec[1, nz - 1, edge] == pytest.approx(gx[nz - 1, dn], rel=1e-13)
                assert eg_vec[2, nz - 1, edge] == pytest.approx(gy[nz - 1, up], rel=1e-13)
                assert eg_vec[3, nz - 1, edge] == pytest.approx(gy[nz - 1, dn], rel=1e-13)
            # deeper one-sided rows: node-averaged gradients (ref :363-400)
            for nz in range(nzmax, nln[n1]):
                tx, ty = _node_avg_grad(mesh, gx, gy, n1, nz - 1)
                assert eg_vec[0, nz - 1, edge] == pytest.approx(tx, rel=1e-12)
                assert eg_vec[2, nz - 1, edge] == pytest.approx(ty, rel=1e-12)
            for nz in range(nzmax, nln[n2]):
                tx, ty = _node_avg_grad(mesh, gx, gy, n2, nz - 1)
                assert eg_vec[1, nz - 1, edge] == pytest.approx(tx, rel=1e-12)
                assert eg_vec[3, nz - 1, edge] == pytest.approx(ty, rel=1e-12)
        else:
            # linear Miura fallback: node-averaged on every row (ref :405-446)
            for nz in range(1, nln[n1]):
                tx, ty = _node_avg_grad(mesh, gx, gy, n1, nz - 1)
                assert eg_vec[0, nz - 1, edge] == pytest.approx(tx, rel=1e-12)
                assert eg_vec[2, nz - 1, edge] == pytest.approx(ty, rel=1e-12)
            for nz in range(1, nln[n2]):
                tx, ty = _node_avg_grad(mesh, gx, gy, n2, nz - 1)
                assert eg_vec[1, nz - 1, edge] == pytest.approx(tx, rel=1e-12)
                assert eg_vec[3, nz - 1, edge] == pytest.approx(ty, rel=1e-12)


# ---------------------------------------------------------------------------
# horizontal schemes oracle (oce_adv_tra_hor.F90:57-483)
# ---------------------------------------------------------------------------
def _oracle_hor(mesh, st, t, u, v, helem, eg, num_ord, sel, muscl):
    """Transcription of adv_tra_hor_{upw1,muscl} for the selected edges.

    Returns flux rows [nl-1] per edge (init_zero=.true. -> flux = -expr).
    muscl=False reproduces upw1 (:57-213); True the MUSCL loops (:215-483).
    """
    edges = np.asarray(mesh.edges)
    ecd = np.asarray(mesh.edge_cross_dxdy)
    edxy = np.asarray(mesh.edge_dxdy)
    ecos = np.asarray(mesh.elem_cos)
    nbl = np.asarray(st.nboundary_lay)
    nl = mesh.nl
    out = {}
    for edge in sel:
        flux = np.zeros(nl - 1)
        en1, en2 = edges[edge]
        el1, el2, nl1, nu1, nl2, nu2 = _edge_levels(mesh, edge)
        dX1, dY1 = ecd[edge, 0], ecd[edge, 1]
        a = r_earth * ecos[el1]
        if el2 >= 0:
            dX2, dY2 = ecd[edge, 2], ecd[edge, 3]
            a = 0.5 * (a + r_earth * ecos[el2])
        nl12 = min(nl1, nl2)
        nu12 = max(nu1, nu2)

        def vf1(nz):
            return (-v[nz - 1, el1] * dX1 + u[nz - 1, el1] * dY1) \
                * helem[nz - 1, el1]

        def vf2(nz):
            return (v[nz - 1, el2] * dX2 - u[nz - 1, el2] * dY2) \
                * helem[nz - 1, el2]

        def upw(nz, vflux):
            return -0.5 * (t[nz - 1, en1] * (vflux + abs(vflux))
                           + t[nz - 1, en2] * (vflux - abs(vflux)))

        def ho(nz, vflux):
            c1 = 1.0 if nbl[en1] >= nz else 0.0
            c2 = 1.0 if nbl[en2] >= nz else 0.0
            common = 2.0 * (t[nz - 1, en2] - t[nz - 1, en1])
            tm2 = t[nz - 1, en2] - (common
                                    + edxy[edge, 0] * a * eg[1, nz - 1, edge]
                                    + edxy[edge, 1] * r_earth * eg[3, nz - 1, edge]) / 6.0 * c2
            tm1 = t[nz - 1, en1] + (common
                                    + edxy[edge, 0] * a * eg[0, nz - 1, edge]
                                    + edxy[edge, 1] * r_earth * eg[2, nz - 1, edge]) / 6.0 * c1
            cho = (vflux + abs(vflux)) * tm1 + (vflux - abs(vflux)) * tm2
            return -0.5 * (1.0 - num_ord) * cho \
                - vflux * num_ord * 0.5 * (tm1 + tm2)

        body = ho if muscl else upw
        # (A)/(B) cavity-only one-sided surface rows
        for nz in range(nu1, nu12):
            flux[nz - 1] = body(nz, vf1(nz)) - flux[nz - 1]
        if nu2 > 0:
            for nz in range(nu2, nu12):
                flux[nz - 1] = body(nz, vf2(nz)) - flux[nz - 1]
        # (C) both elements
        for nz in range(nu12, nl12 + 1):
            flux[nz - 1] = body(nz, vf1(nz) + vf2(nz)) - flux[nz - 1]
        # (D)/(E) one-sided bottom tails
        for nz in range(nl12 + 1, nl1 + 1):
            flux[nz - 1] = body(nz, vf1(nz)) - flux[nz - 1]
        for nz in range(nl12 + 1, nl2 + 1):
            flux[nz - 1] = body(nz, vf2(nz)) - flux[nz - 1]
        out[edge] = flux
    return out


def _hor_sel(mesh):
    etri = np.asarray(mesh.edge_tri)
    nle = np.asarray(mesh.nlevels_elem)
    rng = np.random.RandomState(3)
    sel = list(rng.choice(etri.shape[0], 80, replace=False))
    # boundary edges (el2 missing) and edges with unequal element depths
    sel += list(np.nonzero(etri[:, 1] < 0)[0][:20])
    both = etri[:, 1] >= 0
    uneq = np.nonzero(both & (nle[etri[:, 0]]
                              != nle[np.where(both, etri[:, 1], 0)]))[0]
    sel += list(uneq[:30])
    return sorted(set(int(e) for e in sel))


def test_hor_upw1_oracle(fields):
    mesh, st = fields["mesh"], fields["st"]
    t, u, v, helem = (fields[k] for k in ("t", "u", "v", "helem"))
    vec = np.asarray(tracers.adv_hor_upw1(
        jnp.asarray(t), jnp.asarray(u), jnp.asarray(v), jnp.asarray(helem),
        mesh))
    sel = _hor_sel(mesh)
    orc = _oracle_hor(mesh, st, t, u, v, helem, None, 0.0, sel, muscl=False)
    for e in sel:
        np.testing.assert_allclose(vec[:, e], orc[e], rtol=1e-13, atol=1e-18)


def test_hor_muscl_oracle(fields):
    mesh, st = fields["mesh"], fields["st"]
    t, u, v, helem = (fields[k] for k in ("t", "u", "v", "helem"))
    gx, gy = tracers.tracer_gradient_elements(jnp.asarray(t), mesh)
    eg = tracers.fill_up_dn_grad(gx, gy, mesh, st)
    vec = np.asarray(tracers.adv_hor_muscl(
        jnp.asarray(t), jnp.asarray(u), jnp.asarray(v), jnp.asarray(helem),
        mesh, st, eg, NUM_ORD))
    sel = _hor_sel(mesh)
    orc = _oracle_hor(mesh, st, t, u, v, helem, np.asarray(eg), NUM_ORD,
                      sel, muscl=True)
    for e in sel:
        np.testing.assert_allclose(vec[:, e], orc[e], rtol=1e-12, atol=1e-16)


def test_hor_muscl_antidiffusive_composition(fields):
    """flux_prev composition: MUSCL called on top of the stored LO flux
    yields -(HO expr) - LO on every row (the reference in-place pattern)."""
    mesh, st = fields["mesh"], fields["st"]
    t, u, v, helem = (fields[k] for k in ("t", "u", "v", "helem"))
    tj, uj, vj, hj = map(jnp.asarray, (t, u, v, helem))
    gx, gy = tracers.tracer_gradient_elements(tj, mesh)
    eg = tracers.fill_up_dn_grad(gx, gy, mesh, st)
    lo = tracers.adv_hor_upw1(tj, uj, vj, hj, mesh)
    adf = tracers.adv_hor_muscl(tj, uj, vj, hj, mesh, st, eg, NUM_ORD,
                                flux_prev=lo)
    ho = tracers.adv_hor_muscl(tj, uj, vj, hj, mesh, st, eg, NUM_ORD)
    np.testing.assert_allclose(np.asarray(adf), np.asarray(ho - lo),
                               rtol=1e-12, atol=1e-16)


# ---------------------------------------------------------------------------
# vertical schemes oracle (oce_adv_tra_ver.F90:286-538)
# ---------------------------------------------------------------------------
def _ver_sel(mesh, n=60):
    nln = np.asarray(mesh.nlevels_node)
    rng = np.random.RandomState(5)
    sel = list(rng.choice(nln.size, n, replace=False))
    sel += list(np.argsort(nln)[:5])          # shallowest columns
    sel += list(np.argsort(-nln)[:5])         # deepest columns
    return sorted(set(int(i) for i in sel))


def test_ver_qr4c_oracle(fields):
    mesh = fields["mesh"]
    t, w = fields["t"], fields["w"]
    Z, zb = fields["Z_3d"], fields["zbar_3d"]
    nln = np.asarray(mesh.nlevels_node)
    area = np.asarray(mesh.area)
    vec = np.asarray(tracers.adv_ver_qr4c(
        jnp.asarray(t), jnp.asarray(w), jnp.asarray(Z), jnp.asarray(zb),
        mesh, NUM_ORD))
    for n in _ver_sel(mesh):
        nzmax = nln[n]                         # 1-based level count
        nzmin = 1
        flux = np.zeros(mesh.nl)
        # surface / centered / bottom special rows (ref :322-337), kept
        # strictly sequential: the in-place `expr - flux` pattern makes
        # overlapping special rows cancel on 2-layer columns
        nz = nzmin
        flux[nz - 1] = -t[nz - 1, n] * w[nz - 1, n] * area[nz - 1, n] \
            - flux[nz - 1]
        nz = nzmin + 1
        flux[nz - 1] = -0.5 * (t[nz - 2, n] + t[nz - 1, n]) * w[nz - 1, n] \
            * area[nz - 1, n] - flux[nz - 1]
        nz = nzmax - 1
        flux[nz - 1] = -0.5 * (t[nz - 2, n] + t[nz - 1, n]) * w[nz - 1, n] \
            * area[nz - 1, n] - flux[nz - 1]
        nz = nzmax
        flux[nz - 1] = 0.0 - flux[nz - 1]
        for nz in range(nzmin + 2, nzmax - 1):       # ref :345-355
            qc = (t[nz - 2, n] - t[nz - 1, n]) / (Z[nz - 2, n] - Z[nz - 1, n])
            qu = (t[nz - 1, n] - t[nz, n]) / (Z[nz - 1, n] - Z[nz, n])
            qd = (t[nz - 3, n] - t[nz - 2, n]) / (Z[nz - 3, n] - Z[nz - 2, n])
            Tm1 = t[nz - 1, n] + (2 * qc + qu) * (zb[nz - 1, n] - Z[nz - 1, n]) / 3.0
            Tm2 = t[nz - 2, n] + (2 * qc + qd) * (zb[nz - 1, n] - Z[nz - 2, n]) / 3.0
            Wn = w[nz - 1, n]
            Tm = (Wn + abs(Wn)) * Tm1 + (Wn - abs(Wn)) * Tm2
            flux[nz - 1] = (-0.5 * (1.0 - NUM_ORD) * Tm
                            - NUM_ORD * 0.5 * (Tm1 + Tm2) * Wn) * area[nz - 1, n]
        np.testing.assert_allclose(vec[:nzmax, n], flux[:nzmax],
                                   rtol=1e-12, atol=1e-16)


def test_ver_ppm_oracle(fields):
    mesh = fields["mesh"]
    t, w = fields["t"], fields["w"]
    hO, hN = fields["hnode"], fields["hnode_new"]
    nln = np.asarray(mesh.nlevels_node)
    area = np.asarray(mesh.area)
    vec = np.asarray(tracers.adv_ver_ppm(
        jnp.asarray(t), jnp.asarray(w), jnp.asarray(hO), jnp.asarray(hN),
        mesh, DT))
    for n in _ver_sel(mesh):
        nzmax, nzmin = nln[n], 1
        tv = np.zeros(mesh.nl)
        tv[nzmin - 1] = t[nzmin - 1, n]
        tv[nzmin] = 0.5 * (t[nzmin - 1, n] + t[nzmin, n])
        Wb = w[nzmax - 2, n]
        tv[nzmax - 2] = (-t[nzmax - 3, n] * min(np.sign(Wb) if Wb != 0 else 1.0, 0.0)
                         + t[nzmax - 2, n] * max(np.sign(Wb) if Wb != 0 else 1.0, 0.0))
        tv[nzmax - 1] = t[nzmax - 2, n]
        for nz in range(nzmin + 1, nzmax - 2):        # ref :434-489, writes tv(nz+1)
            dzm1, dz = hN[nz - 2, n], hN[nz - 1, n]
            dzp1, dzp2 = hN[nz, n], hN[nz + 1, n]
            dj = dz / (dzm1 + dz + dzp1) * (
                (2 * dzm1 + dz) / (dzp1 + dz) * (t[nz, n] - t[nz - 1, n])
                + (dz + 2 * dzp1) / (dzm1 + dz) * (t[nz - 1, n] - t[nz - 2, n]))
            djp1 = dzp1 / (dz + dzp1 + dzp2) * (
                (2 * dz + dzp1) / (dzp2 + dzp1) * (t[nz + 1, n] - t[nz, n])
                + (dzp1 + 2 * dzp2) / (dz + dzp1) * (t[nz, n] - t[nz - 1, n]))
            if (t[nz, n] - t[nz - 1, n]) * (t[nz - 1, n] - t[nz - 2, n]) > 0:
                dj = min(abs(dj), 2 * abs(t[nz, n] - t[nz - 1, n]),
                         2 * abs(t[nz - 1, n] - t[nz - 2, n])) * np.sign(dj)
            else:
                dj = 0.0
            if (t[nz + 1, n] - t[nz, n]) * (t[nz, n] - t[nz - 1, n]) > 0:
                djp1 = min(abs(djp1), 2 * abs(t[nz + 1, n] - t[nz, n]),
                           2 * abs(t[nz, n] - t[nz - 1, n])) * np.sign(djp1)
            else:
                djp1 = 0.0
            tv[nz] = (t[nz - 1, n] + dz / (dz + dzp1) * (t[nz, n] - t[nz - 1, n])
                      + 1.0 / (dzm1 + dz + dzp1 + dzp2) * (
                          (2 * dzp1 * dz) / (dz + dzp1)
                          * ((dzm1 + dz) / (2 * dz + dzp1)
                             - (dzp2 + dzp1) / (2 * dzp1 + dz))
                          * (t[nz, n] - t[nz - 1, n])
                          - dz * (dzm1 + dz) / (2 * dz + dzp1) * djp1
                          + dzp1 * (dzp1 + dzp2) / (dz + 2 * dzp1) * dj))
        tvert = np.zeros(mesh.nl)
        for nz in range(nzmin, nzmax):                # ref :493-536
            if w[nz - 1, n] <= 0.0 and w[nz, n] >= 0.0:
                continue
            aL, aR = tv[nz - 1], tv[nz]
            tc = t[nz - 1, n]
            if (aR - tc) * (tc - aL) <= 0.0:
                aL = aR = tc
            if (aR - aL) * (tc - 0.5 * (aL + aR)) > (aR - aL) ** 2 / 6.0:
                aL = 3.0 * tc - 2.0 * aR
            if (aR - aL) * (tc - 0.5 * (aR + aL)) < -(aR - aL) ** 2 / 6.0:
                aR = 3.0 * tc - 2.0 * aL
            dzj = hO[nz - 1, n]
            aj = 6.0 * (tc - 0.5 * (aL + aR))
            if w[nz - 1, n] > 0.0:
                x = min(w[nz - 1, n] * DT / dzj, 1.0)
                tvert[nz - 1] = (-aL - 0.5 * x * (aR - aL + (1 - 2.0 / 3.0 * x) * aj)) \
                    * area[nz - 1, n] * w[nz - 1, n]
            if w[nz, n] < 0.0:
                x = min(-w[nz, n] * DT / dzj, 1.0)
                tvert[nz] = (-aR + 0.5 * x * (aR - aL - (1 - 2.0 / 3.0 * x) * aj)) \
                    * area[nz, n] * w[nz, n]
        tvert[nzmin - 1] = -tv[nzmin - 1] * w[nzmin - 1, n] * area[nzmin - 1, n]
        tvert[nzmax - 1] = 0.0
        np.testing.assert_allclose(vec[:nzmax, n], tvert[:nzmax],
                                   rtol=1e-12, atol=1e-16)


# ---------------------------------------------------------------------------
# FCT limiter oracle (oce_adv_tra_fct.F90:58-349, vlimit=1) — full mesh
# ---------------------------------------------------------------------------
def test_fct_limiter_oracle(fields):
    mesh, st = fields["mesh"], fields["st"]
    nl, N = mesh.nl, mesh.n_nodes
    nln = np.asarray(mesh.nlevels_node)
    nle = np.asarray(mesh.nlevels_elem)
    edges = np.asarray(mesh.edges)
    etri = np.asarray(mesh.edge_tri)
    en = np.asarray(mesh.elem_nodes)
    nie = np.asarray(mesh.nod_in_elem)
    areasvol = np.asarray(mesh.areasvol)
    nmask = np.asarray(mesh.node_layer_mask)

    rng = np.random.RandomState(11)
    ttf = np.where(nmask, 20.0 + rng.randn(nl - 1, N), 0.0)
    lo = np.where(nmask, ttf + 0.3 * rng.randn(nl - 1, N), 0.0)
    # synthetic antidiffusive fluxes respecting the flux-array invariants:
    # adf_h zero outside the union of the two elements' active rows,
    # adf_v zero at/below the bottom interface
    adf_h = 50.0 * rng.randn(nl - 1, edges.shape[0])
    for e in range(edges.shape[0]):
        _, _, nl1, _, nl2, _ = _edge_levels(mesh, e)
        adf_h[max(nl1, nl2):, e] = 0.0
    lev = np.arange(nl)[:, None]
    adf_v = np.where(lev < (nln - 1)[None, :], 30.0 * rng.randn(nl, N), 0.0)

    got_h, got_v = tracers.fct_limiter(
        jnp.asarray(ttf), jnp.asarray(lo), jnp.asarray(adf_h),
        jnp.asarray(adf_v), mesh, DT)
    got_h, got_v = np.asarray(got_h), np.asarray(got_v)

    flux_eps, bignumber = 1e-16, 1e3
    # a1 (ref :95-104)
    tmax = np.where(nmask, np.maximum(lo, ttf), 0.0)
    tmin = np.where(nmask, np.minimum(lo, ttf), 0.0)
    # a2 element bounds (ref :109-125)
    e_max = np.full((nl - 1, mesh.n_elems), -bignumber)
    e_min = np.full((nl - 1, mesh.n_elems), bignumber)
    for el in range(mesh.n_elems):
        k = nle[el] - 1
        e_max[:k, el] = tmax[:k, en[el]].max(-1)
        e_min[:k, el] = tmin[:k, en[el]].min(-1)
    # a3 vlimit=1 cluster bounds +-1 layer (ref :133-163)
    inc_max = np.zeros((nl - 1, N))
    inc_min = np.zeros((nl - 1, N))
    for n in range(N):
        k = nln[n] - 1
        els = nie[n][nie[n] >= 0]
        tvmax = e_max[:, els].max(-1)
        tvmin = e_min[:, els].min(-1)
        inc_max[0, n] = tvmax[0] - lo[0, n]
        inc_min[0, n] = tvmin[0] - lo[0, n]
        for nz in range(1, k - 1):
            inc_max[nz, n] = tvmax[nz - 1:nz + 2].max() - lo[nz, n]
            inc_min[nz, n] = tvmin[nz - 1:nz + 2].min() - lo[nz, n]
        if k >= 2:
            inc_max[k - 1, n] = tvmax[k - 1] - lo[k - 1, n]
            inc_min[k - 1, n] = tvmin[k - 1] - lo[k - 1, n]
    # b1 plus/minus sums (ref :225-259)
    fplus = np.zeros((nl - 1, N))
    fminus = np.zeros((nl - 1, N))
    for n in range(N):
        k = nln[n] - 1
        fplus[:k, n] = np.maximum(0.0, adf_v[:k, n]) \
            + np.maximum(0.0, -adf_v[1:k + 1, n])
        fminus[:k, n] = np.minimum(0.0, adf_v[:k, n]) \
            + np.minimum(0.0, -adf_v[1:k + 1, n])
    for e in range(edges.shape[0]):
        en1, en2 = edges[e]
        _, _, nl1, _, nl2, _ = _edge_levels(mesh, e)
        s = slice(0, max(nl1, nl2))
        fplus[s, en1] += np.maximum(0.0, adf_h[s, e])
        fminus[s, en1] += np.minimum(0.0, adf_h[s, e])
        fplus[s, en2] += np.maximum(0.0, -adf_h[s, e])
        fminus[s, en2] += np.minimum(0.0, -adf_h[s, e])
    # b2 limiting factors (ref :263-272)
    for n in range(N):
        k = nln[n] - 1
        fl = fplus[:k, n] * DT / areasvol[:k, n] + flux_eps
        fplus[:k, n] = np.minimum(1.0, inc_max[:k, n] / fl)
        fl = fminus[:k, n] * DT / areasvol[:k, n] - flux_eps
        fminus[:k, n] = np.minimum(1.0, inc_min[:k, n] / fl)
    # b3 vertical (ref :279-313)
    exp_v = adf_v.copy()
    for n in range(N):
        k = nln[n] - 1
        ae = 1.0
        fl = adf_v[0, n]
        ae = min(ae, fplus[0, n] if fl >= 0 else fminus[0, n])
        exp_v[0, n] = ae * adf_v[0, n]
        for nz in range(1, k):
            ae = 1.0
            fl = adf_v[nz, n]
            if fl >= 0:
                ae = min(ae, fminus[nz - 1, n], fplus[nz, n])
            else:
                ae = min(ae, fplus[nz - 1, n], fminus[nz, n])
            exp_v[nz, n] = ae * adf_v[nz, n]
    # b3 horizontal (ref :318-348)
    exp_h = adf_h.copy()
    for e in range(edges.shape[0]):
        en1, en2 = edges[e]
        _, _, nl1, _, nl2, _ = _edge_levels(mesh, e)
        for nz in range(max(nl1, nl2)):
            ae = 1.0
            fl = adf_h[nz, e]
            if fl >= 0:
                ae = min(ae, fplus[nz, en1], fminus[nz, en2])
            else:
                ae = min(ae, fminus[nz, en1], fplus[nz, en2])
            exp_h[nz, e] = ae * adf_h[nz, e]

    np.testing.assert_allclose(got_h, exp_h, rtol=1e-12, atol=1e-14)
    # vertical: compare the rows the reference limits (above each bottom)
    for n in range(N):
        k = nln[n] - 1
        np.testing.assert_allclose(got_v[:k, n], exp_v[:k, n],
                                   rtol=1e-12, atol=1e-14)
