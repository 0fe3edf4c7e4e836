"""Probe: mobile-compacted NCMC dynamics on the frozen production protocol.

At R=64 the protocol spends most of its step-batch time on full-array
(R, 22344, 3) dynamics ops — OU noise generation, kicks, drifts, constraint
scatters — although only ~121 atoms are mobile. This probe runs the SAME
protocol with the dynamics state compacted to the mobile subset: the full
position array is materialized exactly once per force eval
(x_const.at[mobile].set(xm)), everything else operates on (R, 121, 3).

Compares full vs compacted protocol step time at R replicas; agreement of
the protocol work distributions is a sanity check (identical RNG streams on
different-shaped arrays give different draws, so work agrees statistically,
not bitwise).

Usage: PYTHONPATH=/root/repo python tools/probe_compact.py [--replicas 64]
"""

import argparse
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--replicas", type=int, default=64)
    ap.add_argument("--nsteps", type=int, default=50)
    ap.add_argument("--backend", default=None)
    ap.add_argument(
        "--skip-full", action="store_true",
        help="skip the (compile-heavy) uncompacted full-array protocol",
    )
    args = ap.parse_args()
    R = args.replicas

    import warnings

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

    backend = args.backend or ("pallas" if jax.default_backend() == "tpu" else "tiled")
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

    efn = make_energy_fn(
        fs, nonbonded_method="PME", cutoff=1.0, ewald_tolerance=0.005,
        nonbonded_backend=backend,
    )
    ffn = make_force_fn(efn)
    cx, cv = make_constraint_fns(fs.constraints, fs.masses)
    box = jnp.asarray(fs.box, jnp.float32)
    x = jnp.asarray(x0, jnp.float32)
    x, _ = jax.jit(
        lambda y: minimize_fire(ffn, fs.masses, y, box, n_steps=400, constrain_x=cx)
    )(x)
    jax.block_until_ready(x)

    params = LangevinParams(dt=0.004, friction=1.0, temperature=300.0)
    schedule = build_ncmc_schedule(args.nsteps)
    key0 = jax.random.PRNGKey(7)

    def time_protocol(protocol, x_init, v_init):
        vp = jax.jit(jax.vmap(protocol, in_axes=(0, 0, None, 0)))
        xs = jnp.broadcast_to(x_init, (R,) + x_init.shape)
        keys = jax.random.split(key0, R)
        vs = jnp.broadcast_to(v_init, (R,) + v_init.shape)
        r = vp(xs, vs, box, keys)
        jax.block_until_ready(r.positions)
        t0 = time.perf_counter()
        for i in range(2):
            keys_i = jax.vmap(lambda k: jax.random.fold_in(k, i + 1))(keys)
            r = vp(xs, vs, box, keys_i)
            jax.block_until_ready(r.positions)
        ms = (time.perf_counter() - t0) / (2 * args.nsteps) * 1e3
        return ms, np.asarray(r.protocol_work)

    # ---- full-array protocol (as benched today) ----------------------------
    masses = np.asarray(fs.masses)
    move = RandomLigandRotationMove(lig, fs.masses)
    prot_full = make_ncmc_protocol(efn, ffn, fs.masses, params, cx, cv, schedule, move=move)
    kv, _ = jax.random.split(key0)
    v0 = cv(maxwell_boltzmann_velocities(kv, fs.masses, 300.0), x)
    if args.skip_full:
        full_ms, w_full = float("nan"), np.full(R, np.nan)
        log("# full protocol: skipped (--skip-full)")
    else:
        full_ms, w_full = time_protocol(prot_full, x, v0)
        log(f"# full protocol: {full_ms:.3f} ms/step-batch ({1000.0 * R / full_ms:.0f} sps)")

    # ---- mobile-compacted protocol -----------------------------------------
    is_alch = np.zeros(fs.n_atoms, bool)
    is_alch[np.asarray(fs.alchemical.atoms)] = True
    mob = np.where((masses > 0) | is_alch)[0].astype(np.int32)
    inv = np.full(fs.n_atoms, -1, np.int64)
    inv[mob] = np.arange(len(mob))
    log(f"# mobile subset: {len(mob)} atoms")

    cidx = np.asarray(fs.constraints.idx)
    in_mob = np.isin(cidx, mob)
    mixed = in_mob.any(1) & ~in_mob.all(1)
    assert not mixed.any(), "mixed mobile/frozen constraints; compaction invalid"
    keep = in_mob.all(1)
    cons_m = Constraints(inv[cidx[keep]].astype(np.int32), np.asarray(fs.constraints.dist)[keep])
    masses_m = masses[mob]
    cx_m, cv_m = make_constraint_fns(cons_m, masses_m)

    x_const = jnp.asarray(x)
    mob_j = jnp.asarray(mob)

    def full_of(xm):
        return x_const.astype(xm.dtype).at[mob_j].set(xm)

    def efn_m(xm, box=None, globals_=None):
        return efn(full_of(xm), box, globals_)

    def _slice(ef):
        e, f = ef
        return e, f[mob_j]

    efn_m.lambda_e0_f0 = lambda xm, box=None: _slice(efn.lambda_e0_f0(full_of(xm), box))
    efn_m.lambda_ea_fa = lambda xm, box=None, g=None: _slice(
        efn.lambda_ea_fa(full_of(xm), box, g)
    )

    def ffn_m(xm, box=None, globals_=None):
        e, f = ffn(full_of(xm), box, globals_)
        return e, f[mob_j]

    move_m = RandomLigandRotationMove(inv[np.asarray(lig)], masses_m)
    prot_m = make_ncmc_protocol(
        efn_m, ffn_m, masses_m, params, cx_m, cv_m, schedule, move=move_m
    )
    xm0 = x[mob_j]
    vm0 = v0[mob_j]
    comp_ms, w_comp = time_protocol(prot_m, xm0, vm0)
    log(f"# compacted protocol: {comp_ms:.3f} ms/step-batch ({1000.0 * R / comp_ms:.0f} sps)")

    # ---- same-process component timings of the compacted step --------------
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

    g7 = {"lambda_sterics": jnp.float32(0.7), "lambda_electrostatics": jnp.float32(0.7)}

    # ONE call per scan body (two calls with identical args get CSE'd by
    # XLA, halving the apparent cost)
    def _one(fn):
        def step(c):
            e, f = fn(c)
            return c + 1e-30 * f + 1e-30 * e
        return step

    e0f0_ms = timeit_vscan(_one(lambda c: efn_m.lambda_e0_f0(c, box)), xm0)
    eafa_ms = timeit_vscan(_one(lambda c: efn_m.lambda_ea_fa(c, box, g7)), xm0)
    log(f"# compact e0f0: {e0f0_ms:.3f} ms, eafa: {eafa_ms:.3f} ms (per step-batch)")

    # PME reciprocal E+F alone (frozen background grid + mobile-subset
    # spread, compact in / compact grad out) — decomposes e0f0 into the
    # pair-kernel part vs the reciprocal part
    from blues_tpu.potentials.nonbonded import choose_pme_params
    from blues_tpu.potentials.pme import make_pme_reciprocal, precompute_spread_grid

    pme_params = choose_pme_params(np.diag(np.asarray(fs.box)), 1.0, 0.005)
    log(f"# pme grid {pme_params.grid} alpha {pme_params.alpha:.3f}")
    frozen_idx = np.setdiff1d(np.arange(fs.n_atoms), mob)
    charges = np.asarray(fs.nonbonded.charge)
    base = precompute_spread_grid(
        pme_params, np.asarray(x)[frozen_idx], charges[frozen_idx], np.asarray(fs.box)
    )
    rfn = make_pme_reciprocal(pme_params, base_grid=base, spread_subset=mob)
    q_std = jnp.asarray(charges * (1.0 - is_alch), jnp.float32)
    recip_vg = jax.value_and_grad(lambda xm: rfn(full_of(xm), q_std, box))
    recip_ms = timeit_vscan(_one(recip_vg), xm0)
    log(f"# compact PME recip E+F alone: {recip_ms:.3f} ms/step-batch")

    # dynamics-only: same protocol machinery with a free constant-force field
    def efn_0(xm, box=None, globals_=None):
        return jnp.zeros((), xm.dtype)

    efn_0.lambda_e0_f0 = lambda xm, box=None: (
        jnp.zeros((), xm.dtype), jnp.zeros_like(xm)
    )
    efn_0.lambda_ea_fa = lambda xm, box=None, g=None: (
        jnp.zeros((), xm.dtype), jnp.zeros_like(xm)
    )

    def ffn_0(xm, box=None, globals_=None):
        return jnp.zeros((), xm.dtype), jnp.zeros_like(xm)

    prot_0 = make_ncmc_protocol(
        efn_0, ffn_0, masses_m, params, cx_m, cv_m, schedule, move=move_m
    )
    dyn_ms, _ = time_protocol(prot_0, xm0, vm0)
    log(f"# compact dynamics-only (zero force): {dyn_ms:.3f} ms/step-batch")

    kT = 8.31446261815324e-3 * 300.0
    fin_f = w_full[np.isfinite(w_full) & (np.abs(w_full) < 9e5)] / kT
    fin_c = w_comp[np.isfinite(w_comp) & (np.abs(w_comp) < 9e5)] / kT
    log(
        f"# work medians (kT): full {np.median(fin_f) if len(fin_f) else float('nan'):+.2f} "
        f"({len(fin_f)} finite), compact {np.median(fin_c) if len(fin_c) else float('nan'):+.2f} "
        f"({len(fin_c)} finite)"
    )
    print(json.dumps({
        "replicas": R,
        "backend": backend,
        "compact_e0f0_ms": round(e0f0_ms, 3),
        "compact_eafa_ms": round(eafa_ms, 3),
        "compact_recip_EF_ms": round(recip_ms, 3),
        "compact_dynamics_only_ms": round(dyn_ms, 3),
        # --skip-full leaves full_ms NaN; emit null (json.dumps would print
        # a bare NaN token, which strict parsers like jq reject)
        "full_ms_per_step_batch": round(full_ms, 3) if np.isfinite(full_ms) else None,
        "compact_ms_per_step_batch": round(comp_ms, 3),
        "speedup": round(full_ms / comp_ms, 2) if np.isfinite(full_ms) else None,
        "full_sps": round(1000.0 * R / full_ms, 1) if np.isfinite(full_ms) else None,
        "compact_sps": round(1000.0 * R / comp_ms, 1),
        "work_median_kT_full": round(float(np.median(fin_f)), 3) if len(fin_f) else None,
        "work_median_kT_compact": round(float(np.median(fin_c)), 3) if len(fin_c) else None,
    }))


if __name__ == "__main__":
    main()
