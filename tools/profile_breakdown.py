"""Coarse per-component timing of the flagship benchmark protocol.

Times, on the current default backend (TPU under axon), each component of
the frozen-production NCMC switching step and of the unfrozen MD-stage
energy+force eval, so optimization effort goes where the milliseconds are.

The remote-TPU tunnel has a ~2.5 ms per-dispatch latency floor, so every
sub-ms component is timed by scanning it 50x inside ONE jitted call.

Usage: python tools/profile_breakdown.py
Diagnostics to stderr, one summary JSON line to stdout.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def timeit(fn, *args, n=10, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1e3  # ms


def timeit_scan(step_x_to_x, x, n_inner=50, n_outer=3):
    """Time a (N,3)->(N,3) function by scanning it n_inner times inside ONE
    jitted call (beats the per-dispatch latency floor)."""

    @jax.jit
    def scanned(x0):
        return jax.lax.scan(
            lambda c, _: (step_x_to_x(c), None), x0, None, length=n_inner
        )[0]

    out = scanned(x)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n_outer):
        out = scanned(x)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / (n_outer * n_inner) * 1e3  # ms


def main():
    import warnings

    from blues_tpu.testsystems import t4_scale_binding_site_box

    system, x0 = t4_scale_binding_site_box(n_atoms=22340)
    lig = system.topology.select_resname("LIG")

    backend = "pallas" if jax.default_backend() == "tpu" else "tiled"
    from blues_tpu.core.state import maxwell_boltzmann_velocities
    from blues_tpu.integrators.constraints import make_constraint_fns
    from blues_tpu.integrators.langevin import LangevinParams
    from blues_tpu.integrators.minimize import minimize_fire
    from blues_tpu.integrators.ncmc import make_ncmc_protocol
    from blues_tpu.integrators.schedules import build_ncmc_schedule
    from blues_tpu.moves import RandomLigandRotationMove
    from blues_tpu.potentials.energy import make_energy_fn, make_force_fn
    from blues_tpu.potentials.nonbonded import make_nonbonded_energy

    res = {}
    box = jnp.asarray(system.box, jnp.float32)

    # minimize on the unfrozen system (as bench.py does), then freeze at the
    # relaxed positions so the profiled protocol matches the benchmark
    efn_u = make_energy_fn(
        system.replace(alchemical=None), nonbonded_method="PME", cutoff=0.9,
        ewald_tolerance=0.005, nonbonded_backend="cells",
    )
    ffn_u = make_force_fn(efn_u)
    cx_u, _ = make_constraint_fns(system.constraints, system.masses)
    x = jax.jit(
        lambda x: minimize_fire(ffn_u, system.masses, x, box, n_steps=400,
                                constrain_x=cx_u)[0]
    )(jnp.asarray(x0, jnp.float32))
    jax.block_until_ready(x)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        fro = system.freeze_radius(np.asarray(x), lig, 0.5)

    # ---- frozen components (the NCMC switching-step cost) ----
    efn = make_energy_fn(
        fro, nonbonded_method="PME", cutoff=0.9, ewald_tolerance=0.005,
        nonbonded_backend=backend,
    )
    ffn = make_force_fn(efn)

    def ef_step(c):
        e, f = ffn(c, box, None)
        return c + 1e-30 * f + 1e-30 * e

    res["frozen_EF_ms"] = timeit_scan(ef_step, x)
    log(f"frozen full E+F (culled): {res['frozen_EF_ms']:.3f} ms")

    efn_nocull = make_energy_fn(
        fro, nonbonded_method="PME", cutoff=0.9, ewald_tolerance=0.005,
        nonbonded_backend=backend, frozen_cull_skin=None,
    )
    ffn_nc = make_force_fn(efn_nocull)

    def ef_step_nc(c):
        e, f = ffn_nc(c, box, None)
        return c + 1e-30 * f + 1e-30 * e

    res["frozen_EF_nocull_ms"] = timeit_scan(ef_step_nc, x)
    log(f"frozen full E+F (un-culled): {res['frozen_EF_nocull_ms']:.3f} ms")

    # PME reciprocal only (frozen background path)
    from blues_tpu.potentials.nonbonded import choose_pme_params
    from blues_tpu.potentials.pme import make_pme_reciprocal, precompute_spread_grid

    pme_params = choose_pme_params(np.diag(np.asarray(fro.box)), 0.9, 0.005)
    log(f"pme grid: {pme_params.grid}, alpha {pme_params.alpha:.3f}")
    is_alch = np.zeros(fro.n_atoms, bool)
    is_alch[np.asarray(fro.alchemical.atoms)] = True
    rows = np.where((np.asarray(fro.masses) > 0) | is_alch)[0].astype(np.int32)
    frozen_idx = np.setdiff1d(np.arange(fro.n_atoms), rows)
    charges = np.asarray(fro.nonbonded.charge)
    q_std = charges * (1.0 - is_alch)
    base = precompute_spread_grid(
        pme_params, np.asarray(x)[frozen_idx], charges[frozen_idx], np.asarray(fro.box)
    )
    rfn = make_pme_reciprocal(pme_params, base_grid=base, spread_subset=rows)
    q = jnp.asarray(q_std, jnp.float32)
    recip_g = jax.grad(lambda y: rfn(y, q, box))

    def recip_step(c):
        return c + 1e-30 * recip_g(c)

    res["frozen_pme_recip_EF_ms"] = timeit_scan(recip_step, x)
    log(f"frozen PME recip E+F: {res['frozen_pme_recip_EF_ms']:.3f} ms")

    # culled pair sum + corrections only (CutoffPeriodic proxy: no recip)
    pair_e = make_nonbonded_energy(
        fro.nonbonded, method="CutoffPeriodic", cutoff=0.9,
        alchemical=fro.alchemical, box_for_pme=np.asarray(fro.box),
        backend=backend, masses=fro.masses, dispersion_correction=False,
        frozen_ref_positions=fro.frozen_ref_positions,
    )
    log(f"pair cull_info: {pair_e.cull_info}")
    pair_g = jax.grad(lambda y: pair_e(y, box, None))

    def pair_step(c):
        return c + 1e-30 * pair_g(c)

    res["frozen_pair_EF_ms"] = timeit_scan(pair_step, x)
    log(f"frozen pair+corr E+F: {res['frozen_pair_EF_ms']:.3f} ms")

    # constraints on the frozen system
    cx, cv = make_constraint_fns(fro.constraints, fro.masses)
    res["frozen_constrain_x_ms"] = timeit_scan(lambda c: cx(c, c), x)
    log(f"frozen constrain_x: {res['frozen_constrain_x_ms']:.3f} ms")

    # one full NCMC switching step via the 50-step protocol
    params = LangevinParams(dt=0.002, friction=1.0, temperature=300.0)
    schedule = build_ncmc_schedule(50)
    move = RandomLigandRotationMove(lig, fro.masses)
    prot = jax.jit(make_ncmc_protocol(
        efn, ffn, fro.masses, params, cx, cv, schedule, move=move
    ))
    key = jax.random.PRNGKey(0)
    kv, kp = jax.random.split(key)
    v = cv(maxwell_boltzmann_velocities(kv, fro.masses, 300.0), x)
    r = prot(x, v, box, kp)
    jax.block_until_ready(r.positions)
    t0 = time.perf_counter()
    for i in range(3):
        r = prot(x, v, box, jax.random.fold_in(kp, i))
    jax.block_until_ready(r.positions)
    res["frozen_switching_step_ms"] = (time.perf_counter() - t0) / 3 / 50 * 1e3
    log(f"frozen switching step: {res['frozen_switching_step_ms']:.3f} ms "
        f"(work finite: {bool(jnp.isfinite(r.protocol_work))})")

    # ---- unfrozen components (MD-stage cost) ----
    for b in ("pallas", "cells") if jax.default_backend() == "tpu" else ("cells",):
        e_u = make_energy_fn(
            system, nonbonded_method="PME", cutoff=0.9, ewald_tolerance=0.005,
            nonbonded_backend=b,
        )
        f_u = make_force_fn(e_u)

        def uf_step(c, _f=f_u):
            e, f = _f(c, box, None)
            return c + 1e-30 * f + 1e-30 * e

        res[f"unfrozen_EF_{b}_ms"] = timeit_scan(uf_step, x, n_inner=20)
        log(f"unfrozen full E+F [{b}]: {res[f'unfrozen_EF_{b}_ms']:.3f} ms")

    # unfrozen PME reciprocal (full spread)
    rfn_u = make_pme_reciprocal(pme_params)
    qf = jnp.asarray(charges, jnp.float32)
    recip_gu = jax.grad(lambda y: rfn_u(y, qf, box))
    res["unfrozen_pme_recip_EF_ms"] = timeit_scan(
        lambda c: c + 1e-30 * recip_gu(c), x, n_inner=20
    )
    log(f"unfrozen PME recip E+F: {res['unfrozen_pme_recip_EF_ms']:.3f} ms")

    # unfrozen constraints
    res["unfrozen_constrain_x_ms"] = timeit_scan(lambda c: cx_u(c, c), x, n_inner=20)
    log(f"unfrozen constrain_x: {res['unfrozen_constrain_x_ms']:.3f} ms")

    print(json.dumps({k: round(v, 3) for k, v in res.items()}))


if __name__ == "__main__":
    main()
