"""Sub-profile the tracer stage at scale: which kernel falls off the
cliff at CORE2+ mesh sizes (tracers = 56% of the 188k-node step,
profile_scale_r03.json, vs 17% at 47k).

Usage (one JAX process, real chip):
    python scripts/profile_tracers.py [n_refine]
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def barrier(out):
    for leaf in jax.tree.leaves(out):
        if hasattr(leaf, "dtype"):
            float(jnp.asarray(leaf).astype(jnp.float32).sum())
            return


def time_fn(fn, args, n=3):
    out = fn(*args)
    barrier(out)
    out = fn(*args)
    barrier(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    barrier(out)
    return (time.perf_counter() - t0) / n


def main():
    n_refine = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    dtype = jnp.float32
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        from fesom2_tpu.model import (setup_pi_model, pi_initial_state,
                                      pi_coupled_step_fn, solve_tracers)
        from fesom2_tpu import model as model_mod
        from fesom2_tpu.core import tracers, ops, gm_redi
        from fesom2_tpu.core.state import zero_forcing
        model, atm = setup_pi_model(dtype=dtype, n_refine=n_refine,
                                    parity="ci")
        state, ice = pi_initial_state(model, dtype=dtype)
        forcing = zero_forcing(model.mesh, dtype)
    cfg = model.cfg
    mesh = model.mesh
    st = model.tracer_statics
    step = pi_coupled_step_fn(model, atm)
    for k in range(2):
        state, ice, forcing2 = step(state, ice, jnp.asarray(k))
    jax.block_until_ready(state.eta)

    res = {}
    ntr = cfg.tra.num_tracers
    dt = cfg.dt

    def jt(name, f, *args):
        jf = jax.jit(f)
        res[name] = time_fn(jf, args)
        print(f"  {name:22s}: {res[name]*1e3:9.2f} ms", flush=True)

    # redi/fer context matching the step
    def redi_ctx(stt):
        sig = gm_redi.compute_sigma_xy(stt, mesh)
        ns, taper = gm_redi.compute_neutral_slope(sig, stt.bvfreq, mesh)
        fer_c, fer_K, Ki_l = gm_redi.init_redi_gm(stt, mesh, cfg, ns)
        return taper, Ki_l

    taper, Ki_l = jax.jit(redi_ctx)(state)
    jax.block_until_ready(taper)

    tr = state.tr[:ntr]
    trp = state.tr_old[:ntr]
    eps = cfg.dyn.epsilon
    tAB = -(0.5 + eps) * trp + (1.5 + eps) * tr

    def grads(tA):
        return jax.vmap(lambda t: tracers.tracer_gradient_elements(t, mesh))(tA)
    jt("grad_elements", grads, tAB)
    gx, gy = jax.jit(grads)(tAB)
    jax.block_until_ready(gx)

    def eg_fill(gxa, gya):
        return jax.vmap(lambda a, b: tracers.fill_up_dn_grad(a, b, mesh, st)
                        )(gxa, gya)
    jt("fill_up_dn_grad", eg_fill, gx, gy)
    eg = jax.jit(eg_fill)(gx, gy)
    jax.block_until_ready(eg)

    jt("adv_hor_upw1_LO", lambda tA: jax.vmap(
        lambda t: tracers.adv_hor_upw1(t, state.u, state.v, state.helem,
                                       mesh))(tA), tr)
    jt("adv_hor_muscl_HO", lambda tA, ega: jax.vmap(
        lambda t, e: tracers.adv_hor_muscl(
            t, state.u, state.v, state.helem, mesh, st, e,
            cfg.tra.tra_adv_ph, boundary_fallback=False))(tA, ega), tAB, eg)
    jt("adv_ver_qr4c", lambda tA: jax.vmap(
        lambda t: tracers.adv_ver_qr4c(t, state.w, state.Z_3d,
                                       state.zbar_3d, mesh,
                                       cfg.tra.tra_adv_pv))(tA), tAB)

    flux_h = jax.jit(lambda tA, ega: jax.vmap(
        lambda t, e: tracers.adv_hor_muscl(
            t, state.u, state.v, state.helem, mesh, st, e,
            cfg.tra.tra_adv_ph, boundary_fallback=False))(tA, ega))(tAB, eg)
    flux_v = jax.jit(lambda tA: jax.vmap(
        lambda t: tracers.adv_ver_qr4c(t, state.w, state.Z_3d,
                                       state.zbar_3d, mesh,
                                       cfg.tra.tra_adv_pv))(tA))(tAB)
    jax.block_until_ready((flux_h, flux_v))

    nmask = mesh.node_layer_mask
    av = jnp.where(mesh.areasvol[:-1] > 0, mesh.areasvol[:-1], 1.0)

    def make_lo(tA, stt):
        def one(t):
            fh = tracers.adv_hor_upw1(t, stt.u, stt.v, stt.helem, mesh)
            fv = tracers.adv_ver_upw1(t, stt.w_e, mesh)
            lo_h = ops.edge_divergence(fh, mesh)
            lo = (t * stt.hnode + (lo_h + (fv[:-1] - fv[1:])) * dt / av) \
                / jnp.where(nmask, stt.hnode_new, 1.0)
            return jnp.where(nmask, lo, 0.0)
        return jax.vmap(one)(tA)
    # state as a jit ARGUMENT: closing over the big arrays embeds them as
    # constants and the remote-compile payload exceeds the relay limit
    lo = jax.jit(make_lo)(tr, state)
    jax.block_until_ready(lo)

    jt("fct_limiter", lambda tA, loa, fha, fva: jax.vmap(
        lambda t, l, fh, fv: tracers.fct_limiter(t, l, fh, fv, mesh, dt)
    )(tA, loa, fha, fva), tr, lo, flux_h, flux_v)

    def diff_hor_one(t):
        gxx, gyy = tracers.tracer_gradient_elements(t, mesh)
        tz = tracers.tracer_gradient_z(t, state.Z_3d, mesh)
        return tracers.diff_hor(gxx, gyy, state.helem, Ki_l, mesh, dt,
                                tr_z=tz, slope_tapered=taper)
    jt("diff_hor_redi", lambda tA: jax.vmap(diff_hor_one)(tA), tr)

    def diff_vre_one(t):
        gxx, gyy = tracers.tracer_gradient_elements(t, mesh)
        return tracers.diff_ver_redi_expl(gxx, gyy, taper, Ki_l,
                                          state.hnode_new, mesh, dt)
    jt("diff_ver_redi_expl", lambda tA: jax.vmap(diff_vre_one)(tA), tr)

    zbar_n_bot = jnp.take(mesh.zbar, mesh.nlevels_node - 1)
    sbz = jnp.zeros((mesh.n_nodes,), tr.dtype)
    jt("diff_ver_impl", lambda tA: jax.vmap(
        lambda t: tracers.diff_ver_impl(t, state.Kv, state.hnode_new,
                                        zbar_n_bot, mesh, dt, sbz))(tA), tr)

    def full(stt):
        return solve_tracers(stt, mesh, cfg, st, forcing, 1.0,
                             redi=(taper, Ki_l)).tr
    jt("solve_tracers_full", full, state)

    res["_meta"] = {"n_refine": n_refine, "dtype": "float32"}
    with open(f"profile_tracers_x{n_refine}.json", "w") as f:
        json.dump({k: (round(v, 6) if isinstance(v, float) else v)
                   for k, v in res.items()}, f, indent=1)
    print("TRACER PROFILE DONE")


if __name__ == "__main__":
    main()
