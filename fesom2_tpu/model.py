"""Top-level model: setup + the jittable ocean timestep.

The step mirrors the reference orchestrator ``oce_timestep_ale``
(``src/oce_ale.F90:2521-2799``) and the per-step pre-phase of
``fvom_main.F90:199-268`` (compute_vel_nodes, before_oce_step), re-expressed
as a pure state transition compiled with jax.jit.
"""
from __future__ import annotations

import functools
import os
from dataclasses import dataclass, replace
from typing import Optional

import jax
import jax.numpy as jnp

from .config import ModelConfig
from .constants import rad, vcpw
from .mesh import MeshTables, build_mesh
from .core import ops
from .core.state import OceanState, Forcing, allocate_state, zero_forcing, \
    init_thickness_linfs
from .core import eos, dynamics, ssh, ale, tracers
from .core.tracer_setup import TracerStatics, build_tracer_statics
from .core.mixing import pp as pp_mixing
from .toy import soufflet

# Meshes up to this size solve SSH by a precomputed dense inverse (one MXU
# matmul per solve) instead of iterative CG; above it, CG with Jacobi.
DENSE_SSH_MAX_NODES = 16384


@dataclass
class Model:
    """Holds static data (mesh, config, precomputes) and the step function."""
    mesh: MeshTables
    cfg: ModelConfig
    tracer_statics: TracerStatics
    ssh_diag_inv: jnp.ndarray
    density_ref: jnp.ndarray
    soufflet_statics: Optional[soufflet.SouffletStatics] = None
    Ssurf: Optional[jnp.ndarray] = None   # initial SSS for relaxation
    ssh_dense_inv: Optional[jnp.ndarray] = None  # [N,N] MXU direct solve
    # block additive-Schwarz preconditioner for CORE2-scale meshes where
    # the dense inverse no longer fits (ssh.build_block_schwarz)
    ssh_block_pc: Optional[object] = None
    # ring-form SSH operator (linfs; ssh.build_ssh_ring): one packed
    # gather per CG operator application
    ssh_ring: Optional[object] = None
    # T/S climatology + nodal relaxation-rate sponge for relax_to_clim
    # (ref Tclim/Sclim/relax2clim, oce_modules.F90:249,255); set from the
    # initial state at setup
    Tclim: Optional[jnp.ndarray] = None   # [nl-1, N]
    Sclim: Optional[jnp.ndarray] = None   # [nl-1, N]
    relax2clim: Optional[jnp.ndarray] = None  # [N] 1/s
    # region-restored passive tracers: list of (tracer_index, node_mask)
    # (ref ptracers_restore, oce_setup_step.F90:486-592)
    ptracer_masks: Optional[list] = None

    # ------------------------------------------------------------------
    def initial_state(self, dtype=jnp.float64) -> OceanState:
        state = allocate_state(self.mesh, self.cfg.tra.num_tracers, dtype,
                               n_dvd=2 if self.cfg.diag.ldiag_DVD else 0,
                               with_gm=self.cfg.dyn.Fer_GM)
        state = init_thickness_linfs(state, self.mesh)
        if self.cfg.run.toy_ocean and self.cfg.run.which_toy == "soufflet":
            T, U, _ = soufflet.setup_soufflet(self.mesh, dtype)
            tr = state.tr.at[0].set(T).at[1].set(
                jnp.where(self.mesh.node_layer_mask, 35.0, 0.0))
            state = replace(state, tr=tr, tr_old=tr, u=U)
        if self.cfg.tra.num_tracers > 2:
            state = setup_passive_tracers(self, state)
        return state

    # ------------------------------------------------------------------
    def statics(self):
        """All device arrays the step reads, as ONE pytree that is passed
        through jit as an ARGUMENT.

        Critical TPU performance rule discovered empirically: gather index
        tables embedded as compile-time constants (closures) switch the
        whole process into a ~100x slower gather mode — every static array
        must flow through the jit boundary as a runtime argument.
        """
        return dict(
            mesh=self.mesh,
            st=self.tracer_statics,
            diag_inv=self.ssh_diag_inv,
            dense_inv=self.ssh_dense_inv,
            block_pc=self.ssh_block_pc,
            ssh_ring=self.ssh_ring,
            density_ref=self.density_ref,
            sst=self.soufflet_statics,
            Ssurf=self.Ssurf,
            Tclim=self.Tclim,
            Sclim=self.Sclim,
            relax2clim=self.relax2clim,
            ptr_masks=tuple(m for _, m in (self.ptracer_masks or ())),
            ice_sub=getattr(self, "ice_submesh", None),
            iw_surf=getattr(self, "iw_surf", None),
            iw_bot=getattr(self, "iw_bot", None),
            tidal_forc=getattr(self, "tidal_forc", None),
        )

    # ------------------------------------------------------------------
    def step_impl(self):
        """The pure step with statics passed explicitly:
        impl(state, forcing, sw_3d, S) -> state, where S = self.statics()."""
        cfg = self.cfg
        is_souf = cfg.run.toy_ocean and cfg.run.which_toy == "soufflet"
        is_nonlinfs = 0.0 if cfg.ale.which_ALE == "linfs" else 1.0
        use_dense = self.ssh_dense_inv is not None
        use_block = self.ssh_block_pc is not None
        has_clim = self.Tclim is not None and cfg.tra.clim_relax > 1e-8 \
            and self.relax2clim is not None
        ptr_idx = tuple(i for i, _ in (self.ptracer_masks or ()))

        def step(state: OceanState, forcing: Forcing,
                 sw_3d, S) -> OceanState:
            mesh = S["mesh"]
            st = S["st"]
            diag_inv = S["diag_inv"]
            dense_inv = S["dense_inv"]
            block_pc = S["block_pc"]
            density_ref = S["density_ref"]
            sst = S["sst"]
            if is_souf:
                mesh = replace_coriolis(mesh, sst.coriolis)
            # --- pre-phase (fvom_main loop top) ---------------------------
            state = dynamics.compute_vel_nodes(state, mesh)

            # --- mix & pressure (ref :2558-2655) --------------------------
            state = eos.pressure_bv(state, mesh, cfg, density_ref)
            state = dynamics.pressure_force(state, mesh, cfg)
            # mixing dispatch (ref oce_ale.F90:2596-2660): components of
            # mix_scheme joined by '+'; IDEMIX runs before TKE, tidal after
            # the main scheme; mo_convect follows every main scheme
            schemes = [s.strip().upper()
                       for s in cfg.dyn.mix_scheme.split("+")]
            from .core.mixing import cvmix as cvmix_mixing
            main = [s for s in schemes
                    if s not in ("CVMIX_IDEMIX", "CVMIX_TIDAL",
                                 "CVMIX_DDIFF", "CVMIX_CONV")]
            main = main[0] if main else None
            if "CVMIX_IDEMIX" in schemes:
                state = cvmix_mixing.calc_cvmix_idemix(
                    state, mesh, cfg, forcing,
                    iw_surf=S["iw_surf"], iw_bot=S["iw_bot"],
                    standalone=main is None)
            if main == "KPP":
                from .core.mixing import kpp as kpp_mixing
                state = kpp_mixing.oce_mixing_kpp(state, mesh, cfg, forcing)
            elif main == "PP":
                state = pp_mixing.oce_mixing_pp(state, mesh, cfg)
            elif main == "CVMIX_PP":
                state = cvmix_mixing.calc_cvmix_pp(state, mesh, cfg)
            elif main == "CVMIX_KPP":
                state = cvmix_mixing.calc_cvmix_kpp(state, mesh, cfg,
                                                    forcing, sw_3d=sw_3d)
            elif main == "CVMIX_TKE":
                if "CVMIX_IDEMIX" in schemes:
                    state = cvmix_mixing.calc_cvmix_tke(
                        state, mesh, cfg, forcing,
                        iw_diss=state.iwe_diss, iwe=state.iwe,
                        iwe_alpha_c=state.iwe_alpha_c)
                else:
                    state = cvmix_mixing.calc_cvmix_tke(state, mesh, cfg,
                                                        forcing)
            elif main is not None:
                raise ValueError(f"unknown mix_scheme {cfg.dyn.mix_scheme}")
            if main is not None:
                state = pp_mixing.mo_convect(state, mesh, cfg, forcing)
            if "CVMIX_TIDAL" in schemes:
                state = cvmix_mixing.calc_cvmix_tidal(
                    state, mesh, cfg, tidal_forc=S["tidal_forc"])
            # standalone double diffusion / convection addons (the
            # reference reaches ddiff only inside native KPP; these close
            # the cvmix_{ddiff,convection}.F90 menu gap)
            if "CVMIX_DDIFF" in schemes:
                state = cvmix_mixing.calc_cvmix_ddiff(state, mesh, cfg)
            if "CVMIX_CONV" in schemes:
                state = cvmix_mixing.calc_cvmix_convection(state, mesh, cfg)

            # --- momentum (ref :2663-2682; mom_adv=3 -> vector-invariant) -
            if cfg.dyn.mom_adv == 3:
                state, u_rhs, v_rhs = dynamics.compute_vel_rhs_vinv(
                    state, mesh, forcing, cfg)
            else:
                state, u_rhs, v_rhs = dynamics.compute_vel_rhs(state, mesh,
                                                               forcing, cfg)
            state, u_rhs, v_rhs = dynamics.viscosity_filter(state, mesh, cfg,
                                                            u_rhs, v_rhs)
            if cfg.dyn.i_vert_visc:
                u_rhs, v_rhs = dynamics.impl_vert_visc(state, mesh, cfg, forcing,
                                                       u_rhs, v_rhs)

            # --- SSH (ref :2687-2722) -------------------------------------
            rhs = ssh.compute_ssh_rhs(state, mesh, cfg, forcing, u_rhs, v_rhs)
            if use_dense:
                d_eta, _, _ = ssh.solve_ssh_dense(state, mesh, cfg,
                                                  dense_inv, rhs)
            else:
                d_eta, _, _ = ssh.solve_ssh(
                    state, mesh, cfg,
                    block_pc if use_block else diag_inv, rhs,
                    ring=S["ssh_ring"],
                    x0=2.0 * state.d_eta - state.d_eta_prev)
                state = replace(state, d_eta=d_eta,
                                d_eta_prev=state.d_eta)

            if is_souf:
                zvel, ztem = soufflet.zonal_means(state, mesh, sst)
                u_rhs = soufflet.relax_zonal_vel(state, mesh, sst, cfg.dt,
                                                 u_rhs, zvel)

            state = dynamics.update_vel(state, mesh, cfg, u_rhs, v_rhs, d_eta)
            state = ssh.compute_hbar(state, mesh, cfg, forcing)
            eta = cfg.dyn.alpha * state.hbar + (1.0 - cfg.dyn.alpha) * state.hbar_old
            state = replace(state, eta=eta)

            # --- GM bolus velocity + Redi fields (ref :2727-2739) ---------
            fer = None
            redi = None
            if cfg.dyn.Fer_GM or cfg.dyn.Redi:
                from .core import gm_redi
                sig = gm_redi.compute_sigma_xy(state, mesh)
                ns, taper = gm_redi.compute_neutral_slope(sig, state.bvfreq, mesh)
                fer_c, fer_K, Ki_l = gm_redi.init_redi_gm(state, mesh, cfg, ns)
                if cfg.dyn.Fer_GM:
                    gamma = gm_redi.fer_solve_gamma(state, mesh, sig, fer_c, fer_K)
                    fer_u, fer_v = gm_redi.fer_gamma2vel(gamma, state, mesh)
                    fer_w = ale.bolus_wvel(fer_u, fer_v, state, mesh)
                    fer = (fer_u, fer_v, fer_w)
                    if state.fer_u.shape[-1]:   # bolus output fields wanted
                        state = replace(state, fer_u=fer_u, fer_v=fer_v,
                                        fer_w=fer_w, fer_K3=fer_K,
                                        fer_c=fer_c)
                if cfg.dyn.Redi:
                    redi = (taper, Ki_l)

            # --- ALE vertical velocity (ref :2744) ------------------------
            state = ale.vert_vel_ale(state, mesh, cfg, forcing)

            # --- tracers (ref :2749) --------------------------------------
            clim = None
            if has_clim:
                clim = (S["Tclim"], S["Sclim"], S["relax2clim"])
            ptr_masks = list(zip(ptr_idx, S["ptr_masks"])) or None
            state = solve_tracers(state, mesh, cfg, st, forcing,
                                  is_nonlinfs, sst if is_souf else None,
                                  fer=fer, redi=redi, sw_3d=sw_3d,
                                  clim=clim, ptr_masks=ptr_masks)

            # --- thickness update (ref :2754) -----------------------------
            state = ale.update_thickness(state, mesh, cfg)
            return replace(state, step=state.step + 1)

        return step

    # ------------------------------------------------------------------
    def step_fn(self, jit: bool = True):
        """Return the pure step with the public signature
        step(state, forcing[, sw_3d]) -> state.

        All static arrays (mesh tables, preconditioners, climatologies)
        are bound OUTSIDE the jit trace and passed as arguments — see
        Model.statics() for why this is load-bearing on TPU.
        """
        impl = self.step_impl()
        bind = _statics_binder(self.statics())
        core = jax.jit(impl) if jit else impl

        def step(state: OceanState, forcing: Forcing, sw_3d=None):
            return core(state, forcing, sw_3d,
                        bind(jax.tree.leaves(state)[0]))

        return step



def _statics_binder(S_raw):
    """Return get(example_array) -> statics placed compatibly with the
    caller's arrays.

    Single-device callers get statics committed to the default device
    (required: uncommitted host arrays would be re-transferred on every
    dispatch over a remote-accelerator link).  Callers with sharded inputs
    (multi-device CPU mesh tests, GSPMD runs) get statics replicated over
    the same device set.
    """
    import numpy as _np
    from jax.sharding import Mesh as _Mesh, NamedSharding, PartitionSpec
    cache = {}

    def get(example):
        sh = getattr(example, "sharding", None)
        devs = tuple(sorted(sh.device_set, key=lambda d: d.id)) \
            if sh is not None else ()
        key = tuple(d.id for d in devs)
        if key not in cache:
            if len(devs) > 1:
                repl = NamedSharding(_Mesh(_np.array(devs), ("_repl",)),
                                     PartitionSpec())
                cache[key] = jax.device_put(S_raw, repl)
            else:
                cache[key] = jax.device_put(S_raw, jax.devices()[0])
        return cache[key]

    return get


def replace_coriolis(mesh: MeshTables, coriolis_elem) -> MeshTables:
    import dataclasses
    return dataclasses.replace(mesh, coriolis=coriolis_elem)


def coupled_step_impl(model: "Model", ice_update: bool = True):
    """Ocean+ice step following the reference hot loop (fvom_main.F90:199-268):
    ocean2ice -> ice_timestep -> oce_fluxes_mom/oce_fluxes -> ocean step.

    ice_update=False builds the sequential-ice variant (ice_ave_steps > 1,
    ``fvom_main.F90:231-239``): the ice state is NOT stepped, but the
    ocean still receives the fluxes computed from the (held) ice state —
    the ice catches up with ice_dt = ice_ave_steps * dt on update steps.

    Returns impl(state, ice, ocean_forcing, ice_forcing, S[, ipk]) where
    S = model.statics(); see Model.statics() for why statics are arguments.
    """
    from .ice import step as ice_step_mod
    from .ice import coupling as ice_cpl
    from .core import cavity
    cfg = model.cfg
    use_virt_salt = cfg.ale.which_ALE == "linfs"
    ocean_impl = model.step_impl()
    use_icepack = cfg.run.use_icepack

    def step_impl(state, ice, ocean_forcing, ice_forcing, S, ipk=None,
                  yday=None):
        mesh = S["mesh"]
        surf = ice_cpl.ocean2ice(state, mesh)
        if not ice_update:
            pass            # hold the ice state this step (sequential ice)
        elif use_icepack:
            from .ice.icepack import icepack_timestep
            ipk, ice = icepack_timestep(
                ipk, ice, mesh, ice_forcing, surf, cfg, cfg.icepack,
                use_virt_salt, ref_sss=cfg.tra.ref_sss,
                ref_sss_local=cfg.tra.ref_sss_local, yday=yday)
        else:
            ice = ice_step_mod.ice_timestep(
                ice, mesh, ice_forcing, surf, cfg, use_virt_salt,
                ref_sss=cfg.tra.ref_sss,
                ref_sss_local=cfg.tra.ref_sss_local,
                sub=S["ice_sub"])
        if cfg.run.use_cavity:
            ice = cavity.cavity_ice_clean(ice, mesh)
        sx, sy = ice_cpl.oce_fluxes_mom(ice, surf, ice_forcing, mesh, cfg)
        if cfg.run.use_cavity:
            # under the shelf the surface stress is the drag of the shelf
            # base against the top-layer flow (ref ice_oce_coupling.F90:75)
            csx, csy = cavity.cavity_momentum_fluxes(state, mesh, cfg)
            cav_e = mesh.ulevels_elem > 1
            sx = jnp.where(cav_e, csx, sx)
            sy = jnp.where(cav_e, csy, sy)
        ocean_forcing = replace(ocean_forcing, stress_x=sx, stress_y=sy)
        ocean_forcing = ice_cpl.oce_fluxes(ice, surf, ice_forcing,
                                           ocean_forcing, mesh, cfg,
                                           use_virt_salt,
                                           Ssurf=S["Ssurf"],
                                           ref_sss=cfg.tra.ref_sss,
                                           ref_sss_local=cfg.tra.ref_sss_local)
        if cfg.run.use_cavity:
            # 3-equation melt fluxes replace the (absent) atmosphere fluxes
            # at cavity nodes (ref ice_oce_coupling.F90:222)
            chf, cwf = cavity.cavity_heat_water_fluxes_3eq(
                state, mesh, S["density_ref"])
            cav_n = mesh.ulevels_node > 1
            ocean_forcing = replace(
                ocean_forcing,
                heat_flux=jnp.where(cav_n, chf, ocean_forcing.heat_flux),
                water_flux=jnp.where(cav_n, cwf, ocean_forcing.water_flux),
                virtual_salt=jnp.where(cav_n, 0.0,
                                       ocean_forcing.virtual_salt),
                relax_salt=jnp.where(cav_n, 0.0, ocean_forcing.relax_salt),
                real_salt_flux=jnp.where(cav_n, 0.0,
                                         ocean_forcing.real_salt_flux))
        # ice fields + atm stress for Monin-Obukhov mixing (oce_mo_conv.F90)
        ocean_forcing = replace(ocean_forcing,
                                stress_atm_x=ice_forcing.stress_atmoce_x,
                                stress_atm_y=ice_forcing.stress_atmoce_y,
                                u_ice=ice.u_ice, v_ice=ice.v_ice,
                                a_ice=ice.a_ice, thdgr=ice.thdgr,
                                m_ice=ice.m_ice, m_snow=ice.m_snow)
        # shortwave penetration below open water (ref ice_oce_coupling.F90:338)
        sw_3d = None
        if cfg.run.use_sw_pene:
            sw_3d, dheat = tracers.shortwave_penetration(
                ice_forcing.shortwave, ice.a_ice, state.zbar_3d, mesh,
                cfg.ice.albw)
            if cfg.run.use_cavity:
                # no shortwave reaches the ocean through an ice shelf
                cav_n = mesh.ulevels_node > 1
                sw_3d = jnp.where(cav_n[None, :], 0.0, sw_3d)
                dheat = jnp.where(cav_n, 0.0, dheat)
            ocean_forcing = replace(ocean_forcing,
                                    heat_flux=ocean_forcing.heat_flux + dheat)
        state = ocean_impl(state, ocean_forcing, sw_3d, S)
        if use_icepack:
            return state, ice, ipk, ocean_forcing
        return state, ice, ocean_forcing

    return step_impl


def coupled_step_fn(model: "Model", jit: bool = True):
    """Public coupled step: step(state, ice, ocean_forcing, ice_forcing
    [, ipk]) -> (state, ice[, ipk], ocean_forcing).

    With cfg.run.use_icepack the ice step is the multi-category icepack
    path (ref icedrv hook at ice_setup_step.F90:188-189) and the signature
    gains the IcepackState."""
    impl = coupled_step_impl(model)
    bind = _statics_binder(model.statics())
    use_icepack = model.cfg.run.use_icepack
    if not use_icepack:
        def step3_impl(state, ice, ocean_forcing, ice_forcing, S):
            return impl(state, ice, ocean_forcing, ice_forcing, S)
        core3 = jax.jit(step3_impl) if jit else step3_impl

        def step3(state, ice, ocean_forcing, ice_forcing):
            return core3(state, ice, ocean_forcing, ice_forcing,
                         bind(jax.tree.leaves(state)[0]))
        return step3

    core = jax.jit(impl) if jit else impl

    def step(state, ice, ocean_forcing, ice_forcing, ipk=None):
        return core(state, ice, ocean_forcing, ice_forcing,
                    bind(jax.tree.leaves(state)[0]), ipk)
    return step


# --------------------------------------------------------------------------
# passive tracers (ref oce_setup_step.F90:486-592)
# --------------------------------------------------------------------------
# source regions for 3D-restored passive tracers: (lat0, lat1, lon0, lon1) deg
PTRACER_REGIONS = {301: (77.5, 78.0, 0.0, 10.0),       # Fram Strait
                   302: (65.6, 66.0, -172.0, -166.0),  # Bering Strait
                   303: (69.5, 74.5, 19.0, 20.0)}      # Barents Sea Opening


def setup_passive_tracers(model: "Model", state: OceanState) -> OceanState:
    """Initialise tracers beyond T/S by ID and register region-restore
    masks on the model (ref tracer init oce_setup_step.F90:486-592):
    id 101 = rain-water tracer (starts 0, sourced by precipitation),
    ids 301/302/303 = strait-release tracers held at 1 in their region."""
    cfg, mesh = model.cfg, model.mesh
    glon = mesh.geo_coords[:, 0] / rad
    glat = mesh.geo_coords[:, 1] / rad
    masks = []
    tr = state.tr
    for i, tid in enumerate(cfg.tra.tracer_ID[:cfg.tra.num_tracers]):
        if i < 2:
            continue
        if tid in PTRACER_REGIONS:
            la0, la1, lo0, lo1 = PTRACER_REGIONS[tid]
            pmask = (glat > la0) & (glat < la1) & (glon > lo0) & (glon < lo1)
            masks.append((i, pmask))
            tr = tr.at[i].set(jnp.where(pmask[None, :] & mesh.node_layer_mask,
                                        1.0, 0.0))
        else:                       # id 101 and any other ids start at zero
            tr = tr.at[i].set(0.0)
    model.ptracer_masks = masks or None
    return replace(state, tr=tr, tr_old=tr)


# --------------------------------------------------------------------------
# tracer driver (ref solve_tracers_ale, oce_ale_tracer.F90:101-199)
# --------------------------------------------------------------------------
def solve_tracers(state: OceanState, mesh: MeshTables, cfg,
                  st: TracerStatics, forcing: Forcing, is_nonlinfs: float,
                  sst=None, fer=None, redi=None, sw_3d=None,
                  clim=None, ptr_masks=None) -> OceanState:
    """All tracers advance in ONE vmapped pass: TPU gathers fetch extra
    leading-dimension rows for free, so batching T/S (+ passives) through
    the advection/FCT/diffusion pipeline costs the same gather time as a
    single tracer (the reference loops per tracer, oce_ale_tracer.F90:101)."""
    dt = cfg.dt
    # salt-plume brine redistribution (ref oce_ale_tracer.F90:120-121)
    if cfg.dyn.SPP:
        tr = state.tr.at[1].set(
            tracers.salt_plume(state.tr[1], state, mesh, forcing, cfg))
        state = replace(state, tr=tr)
    # GM bolus velocities advect tracers only (ref solve_tracers_ale :126-136)
    if fer is not None:
        fer_u, fer_v, fer_w = fer
        adv_u = state.u + fer_u
        adv_v = state.v + fer_v
        adv_we = state.w_e + fer_w
        adv_w = state.w + fer_w
    else:
        adv_u, adv_v = state.u, state.v
        adv_we, adv_w = state.w_e, state.w
    eps = cfg.dyn.epsilon
    use_fct = cfg.tra.tra_adv_lim == "FCT"
    nmask = mesh.node_layer_mask
    av = jnp.where(mesh.areasvol[:-1] > 0, mesh.areasvol[:-1], 1.0)
    nln = mesh.nlevels_node
    zbar_n_bot = mesh.zbar_n_bot
    ntr = cfg.tra.num_tracers
    tids = [cfg.tra.tracer_ID[i] if i < len(cfg.tra.tracer_ID) else i
            for i in range(ntr)]

    # ---- advection operator (do_oce_adv_tra); moment=2 reruns it on
    # squared face reconstructions for the DVD diagnostic.
    # ALL tracers run stacked [T, nl-1, N]: every horizontal gather flattens
    # the (tracer, level) axes into one rank-2 operand row axis
    # (ops.take_last), so the dominant per-index gather cost is paid ONCE
    # for the whole tracer batch instead of per tracer (the round-4 unroll
    # existed because a [T,nl-1,X] gather OPERAND hits the slow batched
    # mode; flattening avoids it, scripts/gather_cost_model.py).
    vflux = tracers._edge_vflux(adv_u, adv_v, state.helem, mesh)

    def run_adv(t, tAB, rec, moment=1):
        flux_v_lo = tracers.adv_ver_upw1(t, adv_we, mesh, moment=moment)
        hor = cfg.tra.tra_adv_hor if cfg.tra.tra_adv_hor in ("MUSCL", "MFCT") \
            else "UPW1"
        if use_fct:
            flux_h_lo, flux_h = tracers.adv_hor_lo_ho(
                t, tAB, vflux, mesh, st, rec, cfg.tra.tra_adv_ph,
                moment=moment, scheme=hor)
            lo_h = ops.edge_divergence(flux_h_lo, mesh)
            fct_lo = (tracers._mpow(t, moment) * state.hnode
                      + (lo_h + (flux_v_lo[..., :-1, :]
                                 - flux_v_lo[..., 1:, :])) * dt / av) \
                / jnp.where(nmask, state.hnode_new, 1.0)
            fct_lo = jnp.where(nmask, fct_lo, 0.0)
            if cfg.dyn.w_split:
                impl = lambda tt: tracers.adv_vert_impl(
                    tt, state.w_i, state.hnode_new, mesh, dt)
                fct_lo = jax.vmap(impl)(fct_lo) if fct_lo.ndim == 3 \
                    else impl(fct_lo)
                flux_v_lo = tracers.adv_ver_upw1(t, adv_w, mesh,
                                                 moment=moment)
            w_for_ho = adv_w
            fp = flux_v_lo
        else:
            fct_lo = None
            w_for_ho = adv_we if not cfg.dyn.w_split else adv_we
            fp = None
            if hor in ("MUSCL", "MFCT"):
                flux_h = tracers.adv_hor_muscl_r(
                    tAB, vflux, mesh, st, rec, cfg.tra.tra_adv_ph,
                    moment=moment, boundary_fallback=(hor == "MUSCL"))
            else:
                flux_h = tracers.adv_hor_upw1(tAB, adv_u, adv_v,
                                              state.helem, mesh,
                                              moment=moment, vflux=vflux)
        if cfg.tra.tra_adv_ver == "QR4C":
            flux_v = tracers.adv_ver_qr4c(tAB, w_for_ho, state.Z_3d,
                                          state.zbar_3d, mesh,
                                          cfg.tra.tra_adv_pv,
                                          flux_prev=fp, moment=moment)
        elif cfg.tra.tra_adv_ver == "PPM":
            ppm = lambda tt, fpp: tracers.adv_ver_ppm(
                tt, w_for_ho, state.hnode, state.hnode_new, mesh, dt,
                flux_prev=fpp, moment=moment)
            if tAB.ndim == 3:
                flux_v = jax.vmap(ppm)(tAB, fp) if fp is not None \
                    else jax.vmap(lambda tt: ppm(tt, None))(tAB)
            else:
                flux_v = ppm(tAB, fp)
        elif cfg.tra.tra_adv_ver == "CDIFF":
            flux_v = tracers.adv_ver_cdiff(tAB, w_for_ho, mesh,
                                           flux_prev=fp, moment=moment)
        else:
            flux_v = tracers.adv_ver_upw1(tAB, w_for_ho, mesh,
                                          flux_prev=fp, moment=moment)

        if use_fct:
            flux_h, flux_v = tracers.fct_limiter(
                tracers._mpow(t, moment), fct_lo, flux_h, flux_v, mesh, dt)
            return tracers.flux2dtracer(flux_h, flux_v, mesh, dt,
                                        ttf=tracers._mpow(t, moment),
                                        lo=fct_lo,
                                        hnode=state.hnode,
                                        hnode_new=state.hnode_new)
        return tracers.flux2dtracer(flux_h, flux_v, mesh, dt)

    # ---- stage 1 (tracer-stacked): advection + explicit diffusion --------
    def stage1(t, t_prev, moment=1):
        # AB interpolation (init_tracers_AB, oce_tracer_mod.F90:48-62)
        tAB = -(0.5 + eps) * t_prev + (1.5 + eps) * t
        if moment == 2:
            gxAB, gyAB = tracers.tracer_gradient_elements(tAB, mesh)
            rec = tracers.fill_up_dn_grad_r(gxAB, gyAB, mesh, st)
            dttf_h, dttf_v = run_adv(t, tAB, rec, moment=moment)
            return tAB, dttf_h, dttf_v
        # merged gradients: tAB rows (for the MUSCL up/down fill) and t rows
        # (for the diffusion operator) through one elem_nodes gather
        T = t.shape[0]
        gxc, gyc = tracers.tracer_gradient_elements(
            jnp.concatenate([tAB, t], 0), mesh)
        gxAB, gyAB = gxc[:T], gyc[:T]
        gx, gy = gxc[T:], gyc[T:]
        rec = tracers.fill_up_dn_grad_r(gxAB, gyAB, mesh, st)
        dttf_h, dttf_v = run_adv(t, tAB, rec, moment=moment)
        del_ttf = dttf_h + dttf_v
        # ---- explicit diffusion (diff_tracers_ale) ----------------------
        if redi is not None:
            taper, Ki_l = redi
            tr_z = tracers.tracer_gradient_z(t, state.Z_3d, mesh)
            del_ttf = del_ttf + tracers.diff_hor(
                gx, gy, state.helem, Ki_l, mesh, dt, tr_z=tr_z,
                slope_tapered=taper)
            del_ttf = del_ttf + tracers.diff_ver_redi_expl(
                gx, gy, taper, Ki_l, state.hnode_new, mesh, dt)
        else:
            del_ttf = del_ttf + tracers.diff_hor(gx, gy, state.helem, st.Ki,
                                                 mesh, dt)
        del_ttf = del_ttf + t * (state.hnode - state.hnode_new)
        t_new = t + del_ttf / jnp.where(nmask, state.hnode_new, 1.0)
        t_new = jnp.where(nmask, t_new, 0.0)
        return t_new, tAB, dttf_h, dttf_v

    # Batch ALL tracers through one stage-1 pass when the transient edge
    # arrays fit comfortably (cross-tracer gather merging ~halves the
    # per-index cost); above the threshold, feed [1, nl-1, N] slices
    # through the same code — every within-call pair merge is kept, but
    # the [T,...] flux/reconstruction transients (several GB at 188k
    # nodes, which OOM'd a 16 GB chip) shrink by the tracer count.
    batch = getattr(cfg.tra, "batch_tracers", None)
    if batch is None:
        itemsize = jnp.dtype(state.tr.dtype).itemsize
        batch = (ntr * (mesh.nl - 1) * mesh.n_edges * itemsize) \
            <= (96 << 20)
    if batch:
        t_expl, tAB_all, dttf_h_all, dttf_v_all = stage1(
            state.tr[:ntr], state.tr_old[:ntr])
    else:
        outs = [stage1(state.tr[i:i + 1], state.tr_old[i:i + 1])
                for i in range(ntr)]
        t_expl, tAB_all, dttf_h_all, dttf_v_all = (
            jnp.concatenate(z, 0) for z in zip(*outs))
    tr_old = state.tr[:ntr]                 # reset AB memory to T^n

    # discrete variance decay (Klingbeil et al. 2014 eq. 23; ref
    # gen_modules_diag.F90:744-838): advect the squared reconstructions,
    # subtract the square of the advected field
    if cfg.diag.ldiag_DVD and state.dvd_h.shape[0] > 0:
        nd = state.dvd_h.shape[0]
        _, d2h, d2v = stage1(state.tr[:nd], state.tr_old[:nd], moment=2)
        hN = jnp.where(nmask, state.hnode_new, 1.0)
        tABd = tAB_all[:nd]
        td = state.tr[:nd]
        adv1_h = (tABd * state.hnode + dttf_h_all[:nd]) / hN
        adv1_v = (td * state.hnode + dttf_v_all[:nd]) / hN
        tgt2_h = (tABd ** 2 * state.hnode + d2h) / hN
        tgt2_v = (td ** 2 * state.hnode + d2v) / hN
        dvd_h = jnp.where(nmask, (tgt2_h - adv1_h ** 2) / dt, 0.0)
        dvd_v = jnp.where(nmask, (tgt2_v - adv1_v ** 2) / dt, 0.0)
        state = replace(state, dvd_h=dvd_h, dvd_v=dvd_v)

    # ---- per-tracer surface BC + sources (cheap 2D work) -----------------
    use_kpp_nl = cfg.dyn.use_kpp_nonlclflx \
        and cfg.dyn.mix_scheme.upper() == "KPP"
    sw_src_T = tracers.sw_3d_source(sw_3d, mesh, dt) \
        if sw_3d is not None else None
    surf_bcs = []
    srcs = []
    any_src = (sw_src_T is not None) or use_kpp_nl
    for i in range(ntr):
        t_i = t_expl[i]
        tid = tids[i]
        t_top = ops.take_row(t_i, mesh.ulevels_node - 1)
        surf_bcs.append(tracers.bc_surface(tid, t_top, forcing, dt,
                                           is_nonlinfs))
        if not any_src:
            continue
        src = jnp.zeros_like(t_i)
        if sw_src_T is not None and tid == 0:
            src = src + sw_src_T
        if use_kpp_nl and tid in (0, 1):
            # nonlocal KPP transport redistributes the surface flux through
            # the boundary layer (ref oce_ale_tracer.F90:688-781)
            G = state.kpp_nonloc
            rat_up = mesh.area[:-1] / av
            rat_dn = mesh.area[1:] / av
            gdiv = G[:-1] * rat_up - G[1:] * rat_dn
            if tid == 0:
                nl_src = gdiv * (forcing.heat_flux / vcpw * dt)[None, :]
            else:
                rsss = t_i[0] if cfg.tra.ref_sss_local else cfg.tra.ref_sss
                nl_src = -gdiv * (rsss * forcing.water_flux * dt)
            src = src + jnp.where(nmask, nl_src, 0.0)
        srcs.append(src)
    surf_bc_all = jnp.stack(surf_bcs)
    src_all = jnp.stack(srcs) if any_src else None

    # ---- stage 2 (vmapped): implicit vertical diffusion ------------------
    w_i = state.w_i if ((not use_fct) and cfg.dyn.w_split) else None
    if cfg.tra.i_vert_diff:
        # per-tracer vertical diffusivity: salinity gets the ddmix-split
        # Kv_s under KPP double diffusion (oce_ale_mixing_kpp.F90 ddmix)
        use_dd = (getattr(cfg.tra, "double_diffusion", False)
                  and cfg.dyn.mix_scheme.upper() == "KPP") \
            or "CVMIX_DDIFF" in cfg.dyn.mix_scheme.upper()
        if use_dd:
            Kv_all = jnp.stack([state.Kv_s if tids[i] == 1 else state.Kv
                                for i in range(ntr)])
        else:
            Kv_all = jnp.broadcast_to(state.Kv[None], (ntr,) + state.Kv.shape)

        def stage2(t, surf_bc, src, Kv_i):
            kw = dict(w_i=w_i, sw_source=src)
            if redi is not None:
                kw.update(Ki_layered=redi[1], slope3=redi[0][2])
            return tracers.diff_ver_impl(t, Kv_i, state.hnode_new,
                                         zbar_n_bot, mesh, dt, surf_bc, **kw)
        # vmapped (gather-free column work: tridiagonals only)
        if src_all is None:
            tr = jax.vmap(lambda a, b, c: stage2(a, b, None, c))(
                t_expl, surf_bc_all, Kv_all)
        else:
            tr = jax.vmap(stage2)(t_expl, surf_bc_all, src_all, Kv_all)
    else:
        tr = t_expl

    # relax to T/S climatology in sponge regions (ref relax_to_clim,
    # oce_tracer_mod.F90:87-119)
    if clim is not None:
        for i in range(min(2, ntr)):
            if tids[i] in (0, 1):
                target = clim[tids[i]]
                t_i = tr[i] + clim[2][None, :] * dt * (target - tr[i])
                tr = tr.at[i].set(jnp.where(nmask, t_i, 0.0))

    # 3D-restored passive tracers: hold the source region at 1.0
    # (ref oce_ale_tracer.F90:159-161)
    if ptr_masks:
        for idx, pmask in ptr_masks:
            tr = tr.at[idx].set(jnp.where(pmask[None, :] & nmask,
                                          1.0, tr[idx]))
    state = replace(state, tr=tr, tr_old=tr_old)

    # relax to climatology / zonal profile (ref :149-155)
    if sst is not None:
        _, ztem = soufflet.zonal_means(state, mesh, sst)
        tr = soufflet.relax_zonal_temp(state, mesh, sst, dt, ztem)
        state = replace(state, tr=tr)

    # salinity clamp [3,45] psu (ref :176-198)
    if cfg.tra.num_tracers >= 2:
        s = jnp.clip(state.tr[1], 3.0, 45.0)
        s = jnp.where(nmask, s, 0.0)
        state = replace(state, tr=state.tr.at[1].set(s))
    return state


# --------------------------------------------------------------------------
# setup
# --------------------------------------------------------------------------
def setup_pi_model(mesh_path: str = "/root/reference/test/meshes/pi",
                   forcing_path: str = "/root/reference/test/input/global",
                   dtype=jnp.float64, step_per_day: int = 96,
                   pad_to: int = 1, cavity_depth=None, n_refine: int = 0,
                   parity: str = "ci", cfg: ModelConfig = None):
    """Global pi-mesh ocean+ice configuration (CI test_pi analog,
    ``setups/test_pi/setup.yml``).  Returns (Model, AtmData).

    n_refine > 0 uniformly refines the mesh 4-way n times (CORE2-class
    scaling runs: n=2 -> ~49k surface nodes, n=3 -> ~195k; CORE2 itself
    is ~127k).

    parity:
      "ci"   — the reference CI configuration (``config/namelist.config:32``
               zstar ALE; ``namelist.oce:42`` KPP; Fer_GM + Redi on;
               gamma/diffusivity/relaxation values of ``config/namelist.oce``
               with the ``setups/test_pi/setup.yml`` overrides).  Remaining
               tracked deviation: use_partial_cell=False (full bottom cells).
      "fast" — the round-1 light configuration (linfs + PP, no GM/Redi):
               materially cheaper per step; kept for benchmarking the
               config-cost delta.
    """
    from .forcing.atmos import load_core_forcing

    if cfg is not None:
        # externally-built config (mkrun path: reference namelists + yaml
        # overrides port verbatim); skip the in-code CI parity block
        return _finish_pi_setup(cfg, mesh_path, forcing_path, dtype, pad_to,
                                cavity_depth, n_refine)
    cfg = ModelConfig()
    cfg.timestep.step_per_day = step_per_day
    cfg.run.use_ice = True
    cfg.run.use_sw_pene = True
    cfg.geometry.force_rotation = True
    cfg.dyn.state_equation = 1
    cfg.dyn.visc_option = 5
    cfg.dyn.w_split = True
    cfg.dyn.w_max_cfl = 1.0
    cfg.ice.whichEVP = 1
    cfg.ice.evp_rheol_steps = 120
    cfg.ice.evp_subdomain_lat = 40.0
    cfg.tra.tra_adv_hor = "MFCT"
    cfg.tra.tra_adv_ver = "QR4C"
    cfg.tra.tra_adv_lim = "FCT"
    if parity == "ci":
        # reference namelist.oce + namelist.config values (CI defaults)
        cfg.ale.which_ALE = "zstar"          # namelist.config:32
        cfg.ale.use_partial_cell = True      # namelist.config:33
        cfg.ale.partial_cell_thresh = 0.0
        cfg.dyn.mix_scheme = "KPP"           # namelist.oce:42
        cfg.dyn.gamma0 = 0.003               # namelist.oce:5-7
        cfg.dyn.gamma1 = 0.1
        cfg.dyn.gamma2 = 0.285
        cfg.dyn.easy_bs_return = 1.5         # namelist.oce:18
        cfg.dyn.Div_c = 0.5                  # setup.yml overrides
        cfg.dyn.Leith_c = 0.05
        cfg.dyn.Fer_GM = True                # namelist.oce:27-40
        cfg.dyn.Redi = True
        cfg.dyn.K_GM_max = 2000.0
        cfg.dyn.K_GM_min = 2.0
        cfg.dyn.K_GM_bvref = 2
        cfg.dyn.K_GM_rampmax = -1.0
        cfg.dyn.K_GM_rampmin = -1.0
        cfg.dyn.scaling_Ferreira = False
        cfg.dyn.scaling_Rossby = False
        cfg.dyn.scaling_resolution = True
        cfg.tra.K_ver = 1.0e-5               # namelist.oce:65-72
        cfg.tra.K_hor = 3000.0
        cfg.tra.surf_relax_T = 0.0
        cfg.tra.surf_relax_S = 1.929e-06
        cfg.tra.clim_relax = 0.0
        cfg.tra.ref_sss_local = True
        cfg.tra.ref_sss = 34.0
    else:
        cfg.ale.which_ALE = "linfs"
        cfg.dyn.mix_scheme = "PP"

    return _finish_pi_setup(cfg, mesh_path, forcing_path, dtype, pad_to,
                            cavity_depth, n_refine)


def _finish_pi_setup(cfg, mesh_path, forcing_path, dtype, pad_to,
                     cavity_depth, n_refine):
    from .forcing.atmos import load_core_forcing

    pc = dict(use_partial_cell=cfg.ale.use_partial_cell,
              partial_cell_thresh=cfg.ale.partial_cell_thresh)
    if n_refine > 0:
        from .mesh.refine import refined_mesh
        mesh = refined_mesh(mesh_path, n_refine, force_rotation=True,
                            cyclic_length_deg=360.0, dtype=dtype, **pc)
    else:
        mesh = build_mesh(mesh_path, force_rotation=True,
                          cyclic_length_deg=360.0,
                          cavity_depth=cavity_depth, dtype=dtype, **pc)
    if cavity_depth is not None:
        cfg.run.use_cavity = True
    if pad_to > 1:
        from .parallel.padding import pad_mesh
        mesh = pad_mesh(mesh, pad_to)
    tst = build_tracer_statics(mesh, K_hor=cfg.tra.K_hor, dtype=dtype)
    diag = ssh.ssh_matrix_diagonal(mesh, cfg)
    diag_inv = jnp.where(diag > 0, 1.0 / jnp.where(diag > 0, diag, 1.0), 0.0)
    # density_ref is evaluated on the unperturbed mid depths, which with
    # partial cells differ from mesh.Z in the bottom layer (ref
    # init_ref_density oce_ale_pressure_bv.F90:3024 uses Z_3d_n)
    from .core.state import initial_z3d
    _, Z3 = initial_z3d(mesh, dtype)
    dref = eos.reference_density(mesh, Z3, cfg.dyn.state_equation)
    dense_inv = ssh.ssh_dense_inverse(mesh, cfg, dtype) \
        if mesh.n_nodes <= DENSE_SSH_MAX_NODES else None
    block_pc = None if dense_inv is not None \
        else ssh.build_block_schwarz(mesh, cfg, dtype=dtype)
    if dense_inv is not None:
        ring = None
    elif cfg.ale.which_ALE == "linfs":
        ring = ssh.build_ssh_ring(mesh, cfg, dtype=dtype)
    else:
        ring = ssh.build_ssh_ring_ale(mesh, cfg, dtype=dtype)
    model = Model(mesh=mesh, cfg=cfg, tracer_statics=tst,
                  ssh_diag_inv=diag_inv, density_ref=dref,
                  ssh_dense_inv=dense_inv, ssh_block_pc=block_pc,
                  ssh_ring=ring)
    if cfg.ice.evp_subdomain_lat is not None:
        from .ice.subdomain import build_ice_subdomain
        model.ice_submesh = build_ice_subdomain(
            mesh, lat_deg=cfg.ice.evp_subdomain_lat)
    year = cfg.clock.yearnew
    from .forcing.atmos import ncep_test_sbc, load_sbc_forcing
    if cfg.sbc.configured and os.path.exists(
            f"{cfg.sbc.nm_xwind_file}{year}.nc"):
        # namelist-driven source layout (&nam_sbc engine)
        sbc_eff = cfg.sbc
    else:
        # shipped NCEP test-set layout expressed through the same engine
        sbc_eff = ncep_test_sbc(forcing_path)
        if not os.path.exists(f"{sbc_eff.nm_xwind_file}{year}.nc"):
            # perpetual-year behavior of the test data set: the shipped
            # forcing covers 1948 only; clock years without files reuse it
            # (the y_perpetual knob of &nam_sbc).  y_perpetual must actually
            # be SET here, or run_pi builds an SbcProvider at the first year
            # rollover and crashes on the nonexistent next-year file.
            import dataclasses as _dc
            sbc_eff = _dc.replace(sbc_eff, y_perpetual=True)
            year = 1948
    model.sbc = sbc_eff          # run_pi's year-rollover provider hook
    atm = load_sbc_forcing(mesh, sbc_eff, year=year, dtype=dtype)
    return model, atm


def pi_initial_state(model: Model, forcing_path: str =
                     "/root/reference/test/input/global",
                     dtype=jnp.float64):
    """Ocean + ice initial state from the WOA18 climatology (gen_ic3d analog)
    + reference ice_initial_state (``ice_setup_step.F90:284-330``)."""
    import os
    from .core.ic import climatology_ic
    from .ice.state import allocate_ice
    import dataclasses as dc

    state = allocate_state(model.mesh, model.cfg.tra.num_tracers, dtype,
                           n_dvd=2 if model.cfg.diag.ldiag_DVD else 0,
                           with_gm=model.cfg.dyn.Fer_GM)
    state = init_thickness_linfs(state, model.mesh)
    T, S = climatology_ic(model.mesh,
                          os.path.join(forcing_path, "woa18_netcdf_5deg.nc"))
    tr = state.tr.at[0].set(jnp.asarray(T, dtype)).at[1].set(jnp.asarray(S, dtype))
    state = replace(state, tr=tr, tr_old=tr)
    model.Ssurf = tr[1, 0]
    # climatology targets for relax_to_clim (ref oce_setup_step.F90:479-484)
    model.Tclim, model.Sclim = tr[0], tr[1]
    model.relax2clim = jnp.zeros(model.mesh.n_nodes, dtype)
    if model.cfg.tra.num_tracers > 2:
        state = setup_passive_tracers(model, state)

    ice = allocate_ice(model.mesh, dtype)
    glat = model.mesh.geo_coords[:, 1]
    cold = tr[0, 0] < 0.0
    north = glat > 0
    ice = dc.replace(
        ice,
        m_ice=jnp.where(cold, jnp.where(north, 1.0, 2.0), 0.0).astype(dtype),
        m_snow=jnp.where(cold, jnp.where(north, 0.1, 0.5), 0.0).astype(dtype),
        a_ice=jnp.where(cold, 0.9, 0.0).astype(dtype))
    return state, ice


def pi_coupled_parts(model: Model, atm, ice_update: bool = True):
    """The coupled-pi step implementation + raw statics, shared between the
    single-device driver (pi_coupled_step_fn) and the distributed driver
    (parallel/dist.py): impl(state, ice, step_idx, SP[, ipk]) -> outputs,
    with SP the statics pytree returned alongside."""
    from .forcing.atmos import update_atm_forcing
    from .ice.state import zero_ice_forcing
    from .ice import coupling as ice_cpl

    cfg = model.cfg
    dtype = model.density_ref.dtype
    coupled = coupled_step_impl(model, ice_update=ice_update)

    tide_offset = None
    use_tides = cfg.run.use_global_tides
    if use_tides:
        from .forcing import tides
        start_month = 1 + (cfg.clock.daynew - 1) // 31
        tide_offset = tides.foreph_offset(cfg.clock.yearnew, start_month,
                                          cfg.dt)

    def step_impl(state, ice, step_idx, SP, ipk=None):
        S = SP["S"]
        mesh = S["mesh"]
        atm_ = SP["atm"]
        t_sec = (step_idx.astype(dtype)) * cfg.dt
        surf = ice_cpl.ocean2ice(state, mesh)
        ice_forcing = update_atm_forcing(atm_, t_sec, ice.u_ice, ice.v_ice,
                                         surf.u_w, surf.v_w, surf.T_oc,
                                         SP["base_ice_forcing"])
        oce_forcing = SP["base_oce_forcing"]
        if use_tides:
            # ref fvom_main.F90:199-202: foreph increments mmccdt first
            mmccdt = SP["tide_offset"] + step_idx.astype(dtype) + 1.0
            from .forcing import tides
            ssh_gp = tides.tidal_potential(mmccdt, cfg.dt,
                                           mesh.geo_coords[:, 0],
                                           mesh.geo_coords[:, 1])
            oce_forcing = replace(oce_forcing, ssh_gp=ssh_gp)
        if cfg.run.use_icepack:
            # fractional day-of-year for the icepack FY-tracer reset
            yday = jnp.mod(cfg.clock.daynew - 1.0 + t_sec / 86400.0,
                           365.0) + 1.0
            return coupled(state, ice, oce_forcing, ice_forcing, S, ipk,
                           yday=yday)
        return coupled(state, ice, oce_forcing, ice_forcing, S)

    SP_raw = dict(
        S=model.statics(), atm=atm,
        base_ice_forcing=zero_ice_forcing(model.mesh, dtype),
        base_oce_forcing=zero_forcing(model.mesh, dtype),
        tide_offset=tide_offset)
    return step_impl, SP_raw


def pi_coupled_step_fn(model: Model, atm, jit: bool = True,
                       donate: bool = False):
    """Full coupled step with on-device atmospheric forcing update.

    (state, ice, step_idx) -> (state, ice, ocean_forcing); model time =
    step_idx*dt measured from year start (clock offset of the CI run).

    donate=True aliases the input state/ice buffers to the outputs
    (jit donate_argnums) — halves state HBM and skips the output copy.
    Only for drivers that never reuse a pre-step state (run loop, bench);
    profiling/tests that re-call with the same state must keep False.
    """
    cfg = model.cfg
    jkw = dict(donate_argnums=(0, 1)) if donate else {}

    def dedup(state, ice):
        # donation forbids the same buffer appearing twice in the donated
        # args; the initial state aliases (tr_old=tr etc.), so copy any
        # repeated leaf.  After the first step outputs are distinct, so
        # this is a no-op in the hot loop.
        if not donate:
            return state, ice
        seen = set()

        def f(x):
            if hasattr(x, "dtype"):
                if id(x) in seen:
                    return x.copy()
                seen.add(id(x))
            return x
        return jax.tree.map(f, state), jax.tree.map(f, ice)
    step_impl, SP_raw = pi_coupled_parts(model, atm)
    bind = _statics_binder(SP_raw)
    # sequential ice stepping (ice_ave_steps > 1, fvom_main.F90:231-239):
    # a second jitted variant holds the ice state on non-update steps; the
    # update cadence is resolved at the Python level from the step index
    # (ice updates when (k+1) % ice_ave_steps == 0, matching the
    # ice_steps_since_upd counter starting at 0)
    ave = max(1, int(cfg.ice.ice_ave_steps))
    step_impl_hold = pi_coupled_parts(model, atm, ice_update=False)[0] \
        if ave > 1 else None

    if not cfg.run.use_icepack:
        def step3_impl(state, ice, step_idx, SP):
            return step_impl(state, ice, step_idx, SP)
        core3 = jax.jit(step3_impl, **jkw) if jit else step3_impl
        if ave > 1:
            def step3h_impl(state, ice, step_idx, SP):
                return step_impl_hold(state, ice, step_idx, SP)
            core3h = jax.jit(step3h_impl, **jkw) if jit else step3h_impl

        def step3(state, ice, step_idx):
            c = core3 if ave == 1 or (int(step_idx) + 1) % ave == 0 \
                else core3h
            state, ice = dedup(state, ice)
            return c(state, ice, step_idx,
                     bind(jax.tree.leaves(state)[0]))
        return step3

    core = jax.jit(step_impl, **jkw) if jit else step_impl
    coreh = (jax.jit(step_impl_hold, **jkw) if jit else step_impl_hold) \
        if ave > 1 else None

    def step(state, ice, step_idx, ipk=None):
        c = core if ave == 1 or (int(step_idx) + 1) % ave == 0 else coreh
        state, ice = dedup(state, ice)
        return c(state, ice, step_idx,
                 bind(jax.tree.leaves(state)[0]), ipk)
    return step


def setup_soufflet_model(mesh_path: str = "/root/reference/test/meshes/soufflet",
                         dtype=jnp.float64, step_per_day: int = 72,
                         pad_to: int = 1, which_ale: str = "linfs",
                         cfg: ModelConfig = None) -> Model:
    """Build the soufflet toy-channel model (ref namelist.config.toy_soufflet)."""
    if cfg is not None:
        return _finish_soufflet_setup(cfg, mesh_path, dtype, pad_to)
    cfg = ModelConfig()
    cfg.timestep.step_per_day = step_per_day
    cfg.run.toy_ocean = True
    cfg.run.which_toy = "soufflet"
    cfg.run.use_sw_pene = False
    cfg.geometry.cyclic_length = 4.5
    cfg.geometry.force_rotation = False
    cfg.ale.which_ALE = which_ale
    cfg.dyn.state_equation = 0
    cfg.dyn.visc_option = 5
    cfg.dyn.gamma0 = 0.0
    cfg.dyn.gamma1 = 0.002
    cfg.dyn.gamma2 = 0.02
    cfg.dyn.easy_bs_return = 1.5
    cfg.dyn.A_ver = 1.0e-4
    cfg.dyn.mom_adv = 2
    cfg.dyn.scale_area = 5.8e9
    cfg.tra.K_ver = 1.0e-5
    cfg.tra.K_hor = 10.0
    cfg.tra.use_instabmix = True
    cfg.tra.instabmix_kv = 0.1
    cfg.tra.use_momix = False
    cfg.tra.tra_adv_hor = "MUSCL"
    cfg.tra.tra_adv_ver = "QR4C"
    cfg.tra.tra_adv_lim = "FCT"
    cfg.dyn.mix_scheme = "PP"
    return _finish_soufflet_setup(cfg, mesh_path, dtype, pad_to)


def _finish_soufflet_setup(cfg, mesh_path, dtype, pad_to):
    mesh = build_mesh(mesh_path,
                      cyclic_length_deg=cfg.geometry.cyclic_length,
                      force_rotation=False, dtype=dtype)
    if pad_to > 1:
        from .parallel.padding import pad_mesh
        mesh = pad_mesh(mesh, pad_to)
    tst = build_tracer_statics(mesh, K_hor=cfg.tra.K_hor, dtype=dtype)
    diag = ssh.ssh_matrix_diagonal(mesh, cfg)
    diag_inv = jnp.where(diag > 0, 1.0 / jnp.where(diag > 0, diag, 1.0), 0.0)
    Z3 = jnp.broadcast_to(mesh.Z[:, None], (mesh.nl - 1, mesh.n_nodes))
    dref = eos.reference_density(mesh, Z3, cfg.dyn.state_equation,
                                 toy_soufflet=True)
    _, _, sst = soufflet.setup_soufflet(mesh, dtype)
    dense_inv = ssh.ssh_dense_inverse(mesh, cfg, dtype) \
        if mesh.n_nodes <= DENSE_SSH_MAX_NODES else None
    block_pc = None if dense_inv is not None \
        else ssh.build_block_schwarz(mesh, cfg, dtype=dtype)
    if dense_inv is not None:
        ring = None
    elif cfg.ale.which_ALE == "linfs":
        ring = ssh.build_ssh_ring(mesh, cfg, dtype=dtype)
    else:
        ring = ssh.build_ssh_ring_ale(mesh, cfg, dtype=dtype)
    return Model(mesh=mesh, cfg=cfg, tracer_statics=tst, ssh_diag_inv=diag_inv,
                 density_ref=dref, soufflet_statics=sst,
                 ssh_dense_inv=dense_inv, ssh_block_pc=block_pc,
                 ssh_ring=ring)
