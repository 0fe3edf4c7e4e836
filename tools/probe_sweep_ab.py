"""Same-process A/B of the frozen-production pair backends (tiled vs sweep).

The remote-TPU tunnel's throughput varies 2-3x between sessions (CLAUDE.md),
so the tiled-vs-sweep decision must come from ONE process: this probe builds
the flagship frozen system once, then for each backend times (a) the
mobile-compacted NCMC protocol step batch at R replicas, (b) the e0f0
lambda-independent E+F eval, and (c) the eafa alchemical E+F eval — the
three components of docs/perf_decomposition_r256.json.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/probe_sweep_ab.py \
           [--replicas 256] [--nsteps 40] [--backends tiled,sweep,sweep:g8]

A backend spec "sweep:gN" runs the sweep backend with per-row-group column
culling (sweep_row_group=N, pallas/sweep_kernel.build_row_groups).
"""

import argparse
import json
import sys
import time
import warnings

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--replicas", type=int, default=256)
    ap.add_argument("--nsteps", type=int, default=40)
    ap.add_argument("--backends", default="tiled,sweep")
    args = ap.parse_args()
    R = args.replicas

    from blues_tpu.core.prmtop import repartition_hydrogen_masses
    from blues_tpu.core.state import maxwell_boltzmann_velocities
    from blues_tpu.core.system import Constraints
    from blues_tpu.integrators.constraints import make_constraint_fns
    from blues_tpu.integrators.langevin import LangevinParams
    from blues_tpu.integrators.minimize import minimize_fire
    from blues_tpu.integrators.ncmc import make_ncmc_protocol
    from blues_tpu.integrators.schedules import build_ncmc_schedule
    from blues_tpu.moves import RandomLigandRotationMove
    from blues_tpu.potentials.energy import make_energy_fn, make_force_fn
    from blues_tpu.testsystems import t4_scale_binding_site_box

    system, x0 = t4_scale_binding_site_box(n_atoms=22340)
    lig = system.topology.select_resname("LIG")
    bond_graph = np.concatenate(
        [np.asarray(e.idx).reshape(-1, 2) for e in (system.bonds, system.constraints) if len(e)]
    )
    system = system.replace(
        masses=repartition_hydrogen_masses(system.masses, bond_graph, 3.024)
    )
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        fs = system.freeze_radius(np.asarray(x0), lig, 0.5)

    # minimize once with tiled (same start for every backend)
    efn0 = make_energy_fn(
        fs, nonbonded_method="PME", cutoff=1.0, ewald_tolerance=0.005,
        nonbonded_backend="tiled",
    )
    cx, cv = make_constraint_fns(fs.constraints, fs.masses)
    box = jnp.asarray(fs.box, jnp.float32)
    x = jnp.asarray(x0, jnp.float32)
    x, _ = jax.jit(
        lambda y: minimize_fire(
            make_force_fn(efn0), fs.masses, y, box, n_steps=400, constrain_x=cx
        )
    )(x)
    jax.block_until_ready(x)

    params = LangevinParams(dt=0.004, friction=1.0, temperature=300.0)
    schedule = build_ncmc_schedule(args.nsteps)
    key0 = jax.random.PRNGKey(7)

    # ---- mobile compaction (as the driver's frozen_compact does) ----------
    masses = np.asarray(fs.masses)
    is_alch = np.zeros(fs.n_atoms, bool)
    is_alch[np.asarray(fs.alchemical.atoms)] = True
    mob = np.where((masses > 0) | is_alch)[0].astype(np.int32)
    inv = np.full(fs.n_atoms, -1, np.int64)
    inv[mob] = np.arange(len(mob))
    cidx = np.asarray(fs.constraints.idx)
    keep = np.isin(cidx, mob).all(1)
    cons_m = Constraints(
        inv[cidx[keep]].astype(np.int32), np.asarray(fs.constraints.dist)[keep]
    )
    masses_m = masses[mob]
    cx_m, cv_m = make_constraint_fns(cons_m, masses_m)
    x_const = jnp.asarray(x)
    mob_j = jnp.asarray(mob)
    move_m = RandomLigandRotationMove(inv[np.asarray(lig)], masses_m)
    log(f"# mobile subset: {len(mob)} / {fs.n_atoms}")

    kv, _ = jax.random.split(key0)
    v0 = cv(maxwell_boltzmann_velocities(kv, fs.masses, 300.0), x)
    xm0 = x[mob_j]
    vm0 = jnp.asarray(v0)[mob_j]

    def timeit_vscan(step, x_init, n_inner=20, n_outer=3):
        vstep = jax.vmap(step)

        @jax.jit
        def scanned(c0):
            def body(c, _):
                return vstep(c), None

            return jax.lax.scan(body, c0, None, length=n_inner)[0]

        xs = jnp.broadcast_to(x_init, (R,) + x_init.shape)
        out = scanned(xs)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(n_outer):
            out = scanned(xs)
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / (n_outer * n_inner) * 1e3

    results = {}
    for spec in args.backends.split(","):
        backend = spec.strip()
        group = None
        if ":g" in backend:
            backend, g_ = backend.split(":g")
            group = int(g_)
        efn = make_energy_fn(
            fs, nonbonded_method="PME", cutoff=1.0, ewald_tolerance=0.005,
            nonbonded_backend=backend, sweep_row_group=group,
        )
        ffn = make_force_fn(efn)
        resolved = getattr(efn.nonbonded, "backend", backend)
        backend = spec.strip()
        log(f"# backend {backend} (resolved {resolved}), "
            f"cull {efn.nonbonded.cull_info}, noimg {efn.nonbonded.no_min_image}")

        def full_of(xm):
            return x_const.astype(xm.dtype).at[mob_j].set(xm)

        def efn_m(xm, box=None, globals_=None):
            return efn(full_of(xm), box, globals_)

        def _slice(ef):
            e, f = ef
            return e, f[mob_j]

        efn_m.lambda_e0_f0 = lambda xm, box=None: _slice(
            efn.lambda_e0_f0(full_of(xm), box)
        )
        efn_m.lambda_ea_fa = lambda xm, box=None, g=None: _slice(
            efn.lambda_ea_fa(full_of(xm), box, g)
        )

        def ffn_m(xm, box=None, globals_=None):
            e, f = ffn(full_of(xm), box, globals_)
            return e, f[mob_j]

        prot = make_ncmc_protocol(
            efn_m, ffn_m, masses_m, params, cx_m, cv_m, schedule, move=move_m
        )
        vp = jax.jit(jax.vmap(prot, in_axes=(0, 0, None, 0)))
        xs = jnp.broadcast_to(xm0, (R,) + xm0.shape)
        vs = jnp.broadcast_to(vm0, (R,) + vm0.shape)
        keys = jax.random.split(key0, R)
        r = vp(xs, vs, box, keys)
        jax.block_until_ready(r.positions)
        t0 = time.perf_counter()
        for i in range(2):
            keys_i = jax.vmap(lambda k: jax.random.fold_in(k, i + 1))(keys)
            r = vp(xs, vs, box, keys_i)
            jax.block_until_ready(r.positions)
        prot_ms = (time.perf_counter() - t0) / (2 * args.nsteps) * 1e3
        w = np.asarray(r.protocol_work)
        kT = 8.31446261815324e-3 * 300.0
        fin = w[np.isfinite(w) & (np.abs(w) < 9e5)] / kT
        g7 = {
            "lambda_sterics": jnp.float32(0.7),
            "lambda_electrostatics": jnp.float32(0.7),
        }

        def _one(fn):
            def step(c):
                e, f = fn(c)
                return c + 1e-30 * f + 1e-30 * e

            return step

        e0f0_ms = timeit_vscan(_one(lambda c: efn_m.lambda_e0_f0(c, box)), xm0)
        eafa_ms = timeit_vscan(_one(lambda c: efn_m.lambda_ea_fa(c, box, g7)), xm0)
        results[backend] = {
            "resolved": resolved,
            "protocol_ms_per_step_batch": round(prot_ms, 3),
            "aggregate_sps": round(1000.0 * R / prot_ms, 1),
            "e0f0_ms": round(e0f0_ms, 3),
            "eafa_ms": round(eafa_ms, 3),
            "work_median_kT": round(float(np.median(fin)), 3) if len(fin) else None,
            "n_finite_work": int(len(fin)),
        }
        log(f"# {backend}: protocol {prot_ms:.2f} ms/step-batch "
            f"({1000.0 * R / prot_ms:.0f} sps), e0f0 {e0f0_ms:.2f} ms, "
            f"eafa {eafa_ms:.2f} ms, work median "
            f"{results[backend]['work_median_kT']} kT ({len(fin)} finite)")

    print(json.dumps({"replicas": R, "nsteps": args.nsteps, "backends": results}))


if __name__ == "__main__":
    main()
