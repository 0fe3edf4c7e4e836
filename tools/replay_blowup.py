"""Replay captured pre-blowup MD states in f32 vs f64 (CPU).

tools/probe_md_rollback.py --dump-dir captures the last finite (xm, vm,
segment key) before each production-shape MD blowup. This tool rebuilds
the identical compacted BAOAB machinery on CPU and integrates each dump
forward by its segment length in BOTH precisions (same threefry key ->
same noise stream):

  * f32 blows up, f64 survives  -> single-precision force/integration
    roundoff is the trigger (an engine precision gap vs OpenMM 'mixed');
  * BOTH blow up                -> the state is genuinely 4 fs-unstable
    (OpenMM at this protocol would also fail; it hard-exits,
    reference blues/simulation.py:1203-1213);
  * NEITHER blows up            -> TPU-vs-CPU f32 rounding decides (the
    state sits on the stability boundary).

Also reports each dump's fate at dt/2 in f32 (timestep sensitivity).

Usage: JAX_PLATFORMS=cpu PYTHONPATH=/root/repo python tools/replay_blowup.py \
           --dumps /tmp/blowups --steps-mult 2
"""

import argparse
import glob
import json
import sys
import warnings

import numpy as np


def log(m):
    print(m, file=sys.stderr, flush=True)


def build_machinery(dtype_str, backend="tiled"):
    """Same construction as tools/probe_md_rollback.py, CPU, given dtype."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    if dtype_str == "f64":
        jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    from blues_tpu.core.prmtop import repartition_hydrogen_masses
    from blues_tpu.core.system import Constraints
    from blues_tpu.integrators.constraints import make_constraint_fns
    from blues_tpu.integrators.langevin import LangevinParams, make_baoab_machinery
    from blues_tpu.testsystems import t4_scale_binding_site_box

    system, x0 = t4_scale_binding_site_box(n_atoms=22340)
    lig = system.topology.select_resname("LIG")
    bond_graph = np.concatenate(
        [np.asarray(e.idx).reshape(-1, 2)
         for e in (system.bonds, system.constraints) if len(e)]
    )
    system = system.replace(
        masses=repartition_hydrogen_masses(system.masses, bond_graph, 3.024)
    )
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        fs = system.freeze_radius(np.asarray(x0), lig, 0.5)

    from blues_tpu.potentials.energy import make_energy_fn, make_force_fn

    efn = make_energy_fn(
        fs, nonbonded_method="PME", cutoff=1.0, ewald_tolerance=0.005,
        nonbonded_backend=backend,
    )
    ffn = make_force_fn(efn)

    masses = np.asarray(fs.masses)
    is_alch = np.zeros(fs.n_atoms, bool)
    is_alch[np.asarray(fs.alchemical.atoms)] = True
    mob = np.where((masses > 0) | is_alch)[0].astype(np.int32)
    inv = np.full(fs.n_atoms, -1, np.int64)
    inv[mob] = np.arange(len(mob))
    cidx = np.asarray(fs.constraints.idx)
    keep = np.isin(cidx, mob).all(1)
    assert keep.all() or not keep.any() or True  # informational only
    cons_m = Constraints(
        inv[cidx[keep]].astype(np.int32), np.asarray(fs.constraints.dist)[keep]
    )
    masses_m = masses[mob]
    cx_m, cv_m = make_constraint_fns(cons_m, masses_m)
    dtype = jnp.float64 if dtype_str == "f64" else jnp.float32
    box = jnp.asarray(fs.box, dtype)
    x_const = jnp.asarray(x0, dtype)
    mob_j = jnp.asarray(mob)

    def ffn_m(xm):
        full = x_const.at[mob_j].set(xm)
        e, f = ffn(full, box, None)
        return e, f[mob_j]

    return dict(
        jnp=jnp, jax=jax, ffn_m=ffn_m, cx_m=cx_m, cv_m=cv_m,
        masses_m=masses_m, dtype=dtype,
        LangevinParams=LangevinParams, make_baoab=make_baoab_machinery,
    )


def make_runner(mach, dt, n_steps):
    jax, jnp = mach["jax"], mach["jnp"]
    params = mach["LangevinParams"](dt=dt, friction=1.0, temperature=300.0)
    m = mach["make_baoab"](mach["masses_m"], params, mach["cx_m"], mach["cv_m"])
    ffn_m = mach["ffn_m"]

    def md_step(carry, _):
        xm, vm, fm, key = carry
        key, okey = jax.random.split(key)
        vm = m["kick"](vm, fm, dt / 2.0, xm)
        xm, vm = m["drift"](xm, vm, dt / 2.0)
        vm = m["ou_partial"](vm, okey, xm, dt)
        xm, vm = m["drift"](xm, vm, dt / 2.0)
        _, fm = ffn_m(xm)
        vm = m["kick"](vm, fm, dt / 2.0, xm)
        return (xm, vm, fm, key), jnp.max(jnp.abs(fm))

    @jax.jit
    def run(xm, vm, key):
        _, fm = ffn_m(xm)
        (xm, vm, fm, key), fmax_tr = jax.lax.scan(
            md_step, (xm, vm, fm, key), None, length=n_steps
        )
        e, _ = ffn_m(xm)
        return xm, e, fmax_tr

    return run


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dumps", default="/tmp/blowups")
    ap.add_argument("--backend", default="tiled")
    ap.add_argument("--steps-mult", type=int, default=1,
                    help="replay this many segment lengths")
    ap.add_argument("--max-dumps", type=int, default=12)
    ap.add_argument("--out", default="/dev/stdout")
    args = ap.parse_args()

    files = sorted(glob.glob(f"{args.dumps}/blowup_*.npz"))[: args.max_dumps]
    if not files:
        log("no dumps found")
        sys.exit(1)
    d0 = np.load(files[0])
    dt = float(d0["dt"])
    n_steps = int(d0["seg_steps"]) * args.steps_mult

    results = {}
    # one process must not mix x64 settings; build f32 first, run all, then
    # enable x64 (jax allows flipping via config before new traces, but
    # cached jits keep their dtypes — we rebuild everything per precision)
    for prec in ("f32", "f64"):
        mach = build_machinery(prec, backend=args.backend)
        jnp = mach["jnp"]
        runners = {
            "dt": make_runner(mach, dt, n_steps),
            "dt_half": make_runner(mach, dt / 2.0, n_steps * 2),
        }
        for f in files:
            d = np.load(f)
            name = f.split("/")[-1]
            rec = results.setdefault(name, {})
            for tag, run in runners.items():
                if prec == "f64" and tag == "dt_half":
                    continue  # 4 combos enough; f64@dt is the decider
                xm = jnp.asarray(d["xm"], mach["dtype"])
                vm = jnp.asarray(d["vm"], mach["dtype"])
                key = jnp.asarray(d["key"], jnp.uint32)
                xo, e, fmax_tr = run(xm, vm, key)
                blew = not (np.isfinite(np.asarray(xo)).all()
                            and np.isfinite(float(e)))
                rec[f"{prec}_{tag}"] = "BLOWUP" if blew else "ok"
                if blew:
                    tr = np.asarray(fmax_tr)
                    first_bad = int(np.argmax(~np.isfinite(tr))) if (~np.isfinite(tr)).any() else -1
                    rec[f"{prec}_{tag}_first_nonfinite_step"] = first_bad
                log(f"# {name} {prec} {tag}: "
                    f"{'BLOWUP' if blew else 'ok'}")

    n = len(files)
    summary = {
        "dumps": n,
        "dt_fs": dt * 1e3,
        "segment_steps": n_steps,
        "f32_dt_blowups": sum(r.get("f32_dt") == "BLOWUP" for r in results.values()),
        "f32_half_dt_blowups": sum(r.get("f32_dt_half") == "BLOWUP" for r in results.values()),
        "f64_dt_blowups": sum(r.get("f64_dt") == "BLOWUP" for r in results.values()),
        "per_dump": results,
    }
    with open(args.out, "w") as fh:
        json.dump(summary, fh, indent=1)
        fh.write("\n")


if __name__ == "__main__":
    main()
