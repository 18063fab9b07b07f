"""mkrun analog: drive runs from reference ``setups/*/setup.yml`` files.

The reference CI uses the external ``fesom2-testing`` package: ``mkrun pi
test_pi -m docker`` generates a work dir from ``setups/test_pi/setup.yml``
(base namelists + yaml overrides), runs ``fesom.x``, and ``fcheck .``
compares output-field means against the goldens stored in the yaml
(``.github/workflows/fesom2.1.yml:30-50``).  This module reproduces that
contract end-to-end: the reference namelist files are parsed by
``config.load_config``, the yaml's ``namelist.*`` groups are applied on
top, the run executes through the normal driver, and ``post.fcheck``
checks the result — so reference setup files port verbatim.

Usage:
    python -m fesom2_tpu.mkrun /root/reference/setups/test_pi/setup.yml \
        --result /tmp/work_pi [--steps N]
"""
from __future__ import annotations

import os

import jax.numpy as jnp

from .config import ModelConfig, load_config, _apply

REF_ROOT = os.environ.get("FESOM2_REF_ROOT", "/root/reference")
# default id -> path maps for the in-repo test data; the reference's own
# mechanism is a per-machine paths.yml (mkrun -m <machine>), reproduced
# here: FESOM2_TPU_PATHS may point at a yaml with `mesh:` / `forcing:`
# maps that override or extend these (see _machine_paths)
MESH_PATHS = {
    "test_global": os.path.join(REF_ROOT, "test/meshes/pi"),
    "test_souf": os.path.join(REF_ROOT, "test/meshes/soufflet"),
}
FORCING_PATHS = {
    "test_global": os.path.join(REF_ROOT, "test/input/global"),
}


def _machine_paths():
    """Merge the per-machine paths yaml (env FESOM2_TPU_PATHS, the
    `mkrun -m machine` analog) over the built-in test-data defaults."""
    mesh = dict(MESH_PATHS)
    forcing = dict(FORCING_PATHS)
    pf = os.environ.get("FESOM2_TPU_PATHS")
    if pf and os.path.exists(pf):
        import yaml
        with open(pf) as f:
            y = yaml.safe_load(f) or {}
        mesh.update(y.get("mesh", {}) or {})
        forcing.update(y.get("forcing", {}) or {})
    return mesh, forcing

# yaml namelist group -> ModelConfig sub-dataclass attribute path(s)
_GROUP_TARGETS = {
    "timestep": ("timestep",),
    "clockinit": ("clock",),
    "calendar": ("clock",),
    "ale_def": ("ale",),
    "geometry": ("geometry",),
    "run_config": ("run",),
    "restart_log": (None,),          # top-level fields on ModelConfig
    "inout": (None,),
    "oce_dyn": ("dyn", "tra"),
    "oce_tra": ("tra", "dyn"),
    "ice_dyn": ("ice",),
    "ice_therm": ("ice",),
    "ice_stress": ("ice",),
    "nam_sbc": ("sbc",),
}


# reference namelist.icepack key -> IcepackConfig field.  env_nml uses the
# icepack.settings names (nicecat..., trage as 0/1 ints,
# config/namelist.icepack:1-24); tracer_nml the tr_* logicals (:30-39)
_ICEPACK_KEYS = {
    "nicecat": "ncat", "nicelyr": "nilyr", "nsnwlyr": "nslyr",
    "trage": "tr_iage", "trfy": "tr_FY", "trlvl": "tr_lvl",
    "trpnd": "tr_pond_cesm", "trbgcs": "tr_bgc",
    "tr_iage": "tr_iage", "tr_fy": "tr_FY", "tr_lvl": "tr_lvl",
    "tr_pond_cesm": "tr_pond_cesm", "tr_fsd": "tr_fsd",
    "kcatbound": "kcatbound",
    "kitd": "kitd", "ktherm": "ktherm", "conduct": "conduct",
    "ksno": "ksno",
    "shortwave": "shortwave", "albicev": "albicev", "albicei": "albicei",
    "albsnowv": "albsnowv", "albsnowi": "albsnowi", "albocn": "albocn",
    "ahmax": "ahmax", "dt_mlt": "dT_mlt",
    "rfracmin": "rfracmin", "rfracmax": "rfracmax",
    "pndaspect": "pndaspect",
    "kstrength": "kstrength", "krdg_partic": "krdg_partic",
    "krdg_redist": "krdg_redist", "mu_rdg": "mu_rdg", "cf": "Cf",
    "ndtd": "ndtd",
}
_ICEPACK_BOOL = {"tr_iage", "tr_FY", "tr_lvl", "tr_pond_cesm", "tr_bgc",
                 "tr_fsd"}


def icepack_opts_from_nml(groups: dict) -> dict:
    """Flatten parsed namelist.icepack groups into IcepackConfig kwargs."""
    opts = {}
    for items in groups.values():
        if not isinstance(items, dict):
            continue
        for key, val in items.items():
            field = _ICEPACK_KEYS.get(key.lower())
            if field is None:
                continue
            if field in _ICEPACK_BOOL:
                val = bool(val)
            opts[field] = val
    # nfsdcat > 1 switches the FSD tracer on (env_nml analog of tr_fsd)
    for items in groups.values():
        if isinstance(items, dict) and int(items.get("nfsdcat", 1) or 1) > 1:
            opts["tr_fsd"] = True
            opts["nfsd"] = int(items["nfsdcat"])
    return opts


def load_setup(setup_yml: str):
    """Parse a reference setup.yml into (cfg, mesh_path, forcing_path,
    goldens dict, icepack_opts or None)."""
    import yaml
    with open(setup_yml) as f:
        y = yaml.safe_load(f)

    cfg = load_config(os.path.join(REF_ROOT, "config/namelist.config"),
                      os.path.join(REF_ROOT, "config/namelist.oce"),
                      os.path.join(REF_ROOT, "config/namelist.ice"),
                      os.path.join(REF_ROOT, "config/namelist.forcing"))

    # the icepack CI variant is selected by the presence of a
    # namelist.icepack section (the reference CI builds fesom with
    # __icepack for setups/test_pi_icepack, .github/workflows)
    ipk_opts = None
    if "namelist.icepack" in y:
        from .config import parse_namelist
        base = os.path.join(REF_ROOT, "config/namelist.icepack")
        groups = parse_namelist(base) if os.path.exists(base) else {}
        for gname, items in (y.get("namelist.icepack") or {}).items():
            if isinstance(items, dict) and gname.lower() != "nml_list_icepack":
                groups.setdefault(gname.lower(), {}).update(items)
        ipk_opts = icepack_opts_from_nml(groups)
    for nml in ("namelist.config", "namelist.oce", "namelist.ice",
                "namelist.forcing"):
        groups = y.get(nml) or {}
        for gname, items in groups.items():
            targets = _GROUP_TARGETS.get(gname.lower())
            if targets is None or not isinstance(items, dict):
                continue
            for t in targets:
                _apply(cfg if t is None else getattr(cfg, t), items)

    # output stream list: namelist.io &nml_list, replaced by the setup.yml
    # io_list override when present (reference mkrun substitutes the
    # namelist variable wholesale)
    from .io.streams import parse_namelist_io
    io_nml = os.path.join(REF_ROOT, "config/namelist.io")
    io_list = parse_namelist_io(io_nml) if os.path.exists(io_nml) else []
    y_io = ((y.get("namelist.io") or {}).get("nml_list") or {})
    if isinstance(y_io.get("io_list"), dict):
        io_list = [(sid.strip(), int(spec.get("freq", 1)),
                    str(spec.get("unit", "d")),
                    "f4" if int(spec.get("prec", 8)) == 4 else "f8")
                   for sid, spec in y_io["io_list"].items()]
    for gname, items in ((y.get("namelist.io") or {}).items()):
        if gname.lower() == "diag_list" and isinstance(items, dict):
            _apply(cfg.diag, items)

    mesh_key = y.get("mesh", "test_global")
    forcing_key = y.get("forcing", "test_global")
    goldens = y.get("fcheck", {}) or {}
    mesh_paths, forcing_paths = _machine_paths()
    if mesh_key not in mesh_paths:
        raise KeyError(
            f"mesh id '{mesh_key}' not in the paths map; provide it via a "
            f"FESOM2_TPU_PATHS yaml (mesh: {{{mesh_key}: /path}})")
    return (cfg, mesh_paths[mesh_key], forcing_paths.get(forcing_key),
            goldens, ipk_opts, io_list)


def _run_length_steps(cfg: ModelConfig) -> int:
    n = cfg.timestep.run_length
    unit = cfg.timestep.run_length_unit
    spd = cfg.timestep.step_per_day
    days = {"d": 1, "m": 31, "y": 365}.get(unit, 1) * n
    if unit == "s":
        return max(1, int(n / (86400.0 / spd)))
    return days * spd


def run_setup(setup_yml: str, result_path: str, steps: int = None,
              dtype=jnp.float64, verbose: bool = True, rtol: float = 0.05):
    """Build + run a reference setup; returns (ok, means, goldens).

    ``ok`` is the fcheck verdict at relative tolerance ``rtol`` — the
    default 5% reflects that this is an independent re-implementation
    checked against the Fortran reference's exact CI means."""
    from .model import setup_pi_model, setup_soufflet_model
    from .run import run_pi, run_soufflet
    from .post.fcheck import field_means

    (cfg, mesh_path, forcing_path, goldens, ipk_opts,
     io_list) = load_setup(setup_yml)
    n_steps = steps if steps is not None else _run_length_steps(cfg)
    os.makedirs(result_path, exist_ok=True)

    if cfg.run.toy_ocean:
        model = setup_soufflet_model(mesh_path, cfg=cfg, dtype=dtype)
        run_soufflet(n_steps, result_path, dtype, verbose=verbose,
                     model=model)
    else:
        from .io.streams import streams_from_io_list
        model, atm = setup_pi_model(mesh_path, forcing_path, cfg=cfg,
                                    dtype=dtype)
        stream_defs = streams_from_io_list(io_list, model.mesh, model.cfg,
                                           atm=atm) if io_list else None
        run_pi(n_steps, result_path, dtype, verbose=verbose,
               model_atm=(model, atm), use_icepack=ipk_opts is not None,
               icepack_opts=ipk_opts, stream_defs=stream_defs)

    means = field_means(result_path)
    ok = True
    report = []
    for name, gold in goldens.items():
        if name not in means:
            report.append(f"MISSING {name} (golden {gold})")
            ok = False
            continue
        got = means[name]
        denom = max(abs(gold), 1e-3)       # near-zero goldens (u, v): abs
        rel = abs(got - gold) / denom
        good = rel <= rtol
        ok = ok and good
        report.append(f"{'OK  ' if good else 'FAIL'} {name}: got {got:.9g} "
                      f"golden {gold:.9g} rel {rel:.2e}")
    if verbose:
        print("\n".join(report))
    return ok, means, goldens


def main():
    import argparse
    p = argparse.ArgumentParser(description="mkrun+fcheck from a reference "
                                            "setup.yml")
    p.add_argument("setup_yml")
    p.add_argument("--result", default="./work")
    p.add_argument("--steps", type=int, default=None)
    p.add_argument("--rtol", type=float, default=0.05)
    p.add_argument("--f32", action="store_true")
    args = p.parse_args()
    import jax
    if not args.f32:
        jax.config.update("jax_enable_x64", True)
    dtype = jnp.float32 if args.f32 else jnp.float64
    ok, _, _ = run_setup(args.setup_yml, args.result, steps=args.steps,
                         dtype=dtype, rtol=args.rtol)
    raise SystemExit(0 if ok else 1)


if __name__ == "__main__":
    main()
