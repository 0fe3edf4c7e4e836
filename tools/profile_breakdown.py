"""Coarse per-component timing of the flagship benchmark protocol.

Times, on the current default backend (TPU under axon), each component of
the frozen-production NCMC switching step and of the unfrozen MD-stage
energy+force eval, so optimization effort goes where the milliseconds are.

Usage: python tools/profile_breakdown.py [--unfrozen-only]
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


def timeit(fn, *args, n=20, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1e3  # ms


def main():
    import warnings

    from blues_tpu.testsystems import t4_scale_binding_site_box

    system, x0 = t4_scale_binding_site_box(n_atoms=22340)
    lig = system.topology.select_resname("LIG")
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        fro = system.freeze_radius(np.asarray(x0), lig, 0.5)

    backend = "pallas" if jax.default_backend() == "tpu" else "tiled"
    from blues_tpu.core.state import maxwell_boltzmann_velocities
    from blues_tpu.integrators.constraints import make_constraint_fns
    from blues_tpu.integrators.langevin import LangevinParams
    from blues_tpu.integrators.ncmc import make_ncmc_protocol
    from blues_tpu.integrators.schedules import build_ncmc_schedule
    from blues_tpu.moves import RandomLigandRotationMove
    from blues_tpu.potentials.energy import make_energy_fn, make_force_fn

    res = {}
    box = jnp.asarray(system.box, jnp.float32)
    x = jnp.asarray(x0, jnp.float32)

    # ---- frozen-system components (the NCMC switching-step cost) ----
    efn = make_energy_fn(
        fro, nonbonded_method="PME", cutoff=0.9, ewald_tolerance=0.005,
        nonbonded_backend=backend,
    )
    ffn = jax.jit(make_force_fn(efn))
    res["frozen_EF_full_ms"] = timeit(lambda: ffn(x, box, None))
    log(f"frozen full E+F: {res['frozen_EF_full_ms']:.3f} ms")

    # nonbonded-only (pair sum + corrections, incl PME)
    from blues_tpu.potentials.nonbonded import make_nonbonded_energy

    nb_e = make_nonbonded_energy(
        fro.nonbonded, method="PME", cutoff=0.9,
        alchemical=fro.alchemical, ewald_tolerance=0.005,
        box_for_pme=np.asarray(fro.box), backend=backend,
        masses=fro.masses, frozen_ref_positions=np.asarray(x0),
    )
    nb_f = jax.jit(lambda x: jax.value_and_grad(lambda y: nb_e(y, box, None))(x))
    res["frozen_nonbonded_EF_ms"] = timeit(lambda: nb_f(x))
    log(f"frozen nonbonded E+F: {res['frozen_nonbonded_EF_ms']:.3f} ms")

    # PME reciprocal only (frozen background path)
    from blues_tpu.potentials.pme import make_pme_reciprocal, precompute_spread_grid
    from blues_tpu.potentials.nonbonded import choose_pme_params

    pme_params = choose_pme_params(np.diag(np.asarray(fro.box)), 0.9, 0.005)
    log(f"pme grid: {pme_params.grid}, alpha {pme_params.alpha:.3f}")
    mobile = np.where((np.asarray(fro.masses) > 0))[0]
    is_alch = np.zeros(fro.n_atoms, bool)
    is_alch[np.asarray(fro.alchemical.atoms)] = True
    rows = np.where((np.asarray(fro.masses) > 0) | is_alch)[0].astype(np.int32)
    frozen_idx = np.setdiff1d(np.arange(fro.n_atoms), rows)
    charges = np.asarray(fro.nonbonded.charge)
    q_std = charges * (1.0 - is_alch)
    base = precompute_spread_grid(pme_params, np.asarray(x0)[frozen_idx], charges[frozen_idx], np.asarray(fro.box))
    rfn = make_pme_reciprocal(pme_params, base_grid=base, spread_subset=rows)
    q = jnp.asarray(q_std, jnp.float32)
    recip_f = jax.jit(lambda x: jax.value_and_grad(lambda y: rfn(y, q, box))(x))
    res["frozen_pme_recip_EF_ms"] = timeit(lambda: recip_f(x))
    log(f"frozen PME recip E+F: {res['frozen_pme_recip_EF_ms']:.3f} ms")

    # pair kernel only
    pair_full = make_nonbonded_energy(
        fro.nonbonded, method="CutoffPeriodic", cutoff=0.9,
        alchemical=fro.alchemical, box_for_pme=np.asarray(fro.box),
        backend=backend, masses=fro.masses, dispersion_correction=False,
    )
    pair_f = jax.jit(lambda x: jax.value_and_grad(lambda y: pair_full(y, box, None))(x))
    res["frozen_pair_plus_corr_EF_ms"] = timeit(lambda: pair_f(x))
    log(f"frozen pairsum(CutoffPeriodic proxy) E+F: {res['frozen_pair_plus_corr_EF_ms']:.3f} ms")

    # bonded only: full energy minus nonbonded is small; time the composed
    # energy with a no-op nonbonded by subtraction instead: skip (cheap).

    # one full NCMC switching step cost via the 50-step protocol
    cx, cv = make_constraint_fns(fro.constraints, fro.masses)
    params = LangevinParams(dt=0.002, friction=1.0, temperature=300.0)
    schedule = build_ncmc_schedule(50)
    move = RandomLigandRotationMove(lig, fro.masses)
    efn_f = make_energy_fn(
        fro, nonbonded_method="PME", cutoff=0.9, ewald_tolerance=0.005,
        nonbonded_backend=backend,
    )
    prot = jax.jit(make_ncmc_protocol(
        efn_f, make_force_fn(efn_f), fro.masses, params, cx, cv, schedule, move=move
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
    ms = (time.perf_counter() - t0) / 3 / 50 * 1e3
    res["frozen_switching_step_ms"] = ms
    log(f"frozen switching step: {ms:.3f} ms (protocol of 50)")

    # constraints-only cost on the frozen system
    vv = maxwell_boltzmann_velocities(kv, fro.masses, 300.0)
    cxj = jax.jit(cx)
    res["frozen_constrain_x_ms"] = timeit(lambda: cxj(x + 1e-4 * vv, x))
    log(f"frozen constrain_x: {res['frozen_constrain_x_ms']:.3f} ms")

    # ---- unfrozen components (MD-stage cost) ----
    for b in ("pallas", "cells") if jax.default_backend() == "tpu" else ("cells",):
        e_u = make_energy_fn(
            system, nonbonded_method="PME", cutoff=0.9, ewald_tolerance=0.005,
            nonbonded_backend=b,
        )
        f_u = jax.jit(make_force_fn(e_u))
        res[f"unfrozen_EF_{b}_ms"] = timeit(lambda: f_u(x, box, None), n=10)
        log(f"unfrozen full E+F [{b}]: {res[f'unfrozen_EF_{b}_ms']:.3f} ms")

    # unfrozen PME reciprocal (full spread)
    rfn_u = make_pme_reciprocal(pme_params)
    qf = jnp.asarray(charges, jnp.float32)
    recip_u = jax.jit(lambda x: jax.value_and_grad(lambda y: rfn_u(y, qf, box))(x))
    res["unfrozen_pme_recip_EF_ms"] = timeit(lambda: recip_u(x), n=10)
    log(f"unfrozen PME recip E+F: {res['unfrozen_pme_recip_EF_ms']:.3f} ms")

    # unfrozen constraints
    cxu, _ = make_constraint_fns(system.constraints, system.masses)
    cxuj = jax.jit(cxu)
    vu = maxwell_boltzmann_velocities(kv, system.masses, 300.0)
    res["unfrozen_constrain_x_ms"] = timeit(lambda: cxuj(x + 1e-4 * vu, x), n=10)
    log(f"unfrozen constrain_x: {res['unfrozen_constrain_x_ms']:.3f} ms")

    # unfrozen MD step (langevin BAOAB with constraints), cells backend
    from blues_tpu.integrators.langevin import baoab_step  # noqa: F401

    print(json.dumps({k: round(v, 3) for k, v in res.items()}))


if __name__ == "__main__":
    main()
