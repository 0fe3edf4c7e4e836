"""Benchmark: NCMC switching-step throughput on the T4-toluene-scale system.

Metric (BASELINE.json): NCMC switching steps/sec/chip at 22,340 atoms.
The benchmark system is toluene + TIP3P water constructed at the reference
benchmark's atom count (the reference's own eqToluene prmtop is a missing
large blob; see blues_tpu.testsystems.t4_scale_toluene_box). Each switching
step is a full "H V R O R V H" BAOAB micro-step of the lambda protocol —
softcore LJ + PME electrostatics energy AND forces twice per step — run as
a jit-scanned protocol on one chip via the Pallas pair kernel + MXU PME.

vs_baseline: ratio to an OpenMM-CPU estimate for the same protocol
(~15 switching steps/s: 22k-atom PME MD on a modern CPU runs ~15 ns/day at
2 fs = ~87 steps/s; the reference's NCMC integrator performs ~3 energy+force
passes per step through CustomNonbondedForce softcore paths, ~6x MD cost).
The driver-set target is >= 10x (BASELINE.json north_star).

Prints ONE JSON line.
"""

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

# persistent compilation cache: the 22k-atom protocol compile is minutes on
# the remote-compile TPU path; cached reruns start in seconds
jax.config.update("jax_compilation_cache_dir", os.environ.get("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

OPENMM_CPU_BASELINE_STEPS_PER_SEC = 15.0
N_ATOMS = 22340
NSTEPS_NC = 50


def main():
    from blues_tpu.core.state import maxwell_boltzmann_velocities
    from blues_tpu.integrators.constraints import make_constraint_fns
    from blues_tpu.integrators.langevin import LangevinParams
    from blues_tpu.integrators.minimize import minimize_fire
    from blues_tpu.integrators.ncmc import make_ncmc_protocol
    from blues_tpu.integrators.schedules import build_ncmc_schedule
    from blues_tpu.moves import RandomLigandRotationMove
    from blues_tpu.potentials.energy import make_energy_fn, make_force_fn
    from blues_tpu.testsystems import t4_scale_toluene_box

    on_tpu = jax.default_backend() == "tpu"
    backend = "pallas" if on_tpu else "tiled"

    system, x0 = t4_scale_toluene_box(n_atoms=N_ATOMS)
    lig = system.topology.select_resname("LIG")
    # the reference production protocol freezes atoms > 5 A from the ligand
    # (examples/rotmove_cuda.yml:42-45); frozen-frozen pair energy is a
    # constant, so the kernels compute mobile rows only
    system = system.freeze_radius(x0, lig, 0.5)
    import sys
    print(f"# mobile atoms: {(system.masses > 0).sum()} / {system.n_atoms}",
          file=sys.stderr, flush=True)

    # ewaldErrorTolerance 0.005 matches the reference production protocol
    # (examples/rotmove_cuda.yml:26)
    efn = make_energy_fn(
        system, nonbonded_method="PME", cutoff=0.9, ewald_tolerance=0.005,
        nonbonded_backend=backend,
    )
    ffn = make_force_fn(efn)
    cx, cv = make_constraint_fns(system.constraints, system.masses)
    box = jnp.asarray(system.box, jnp.float32)
    x = jnp.asarray(x0, jnp.float32)

    # resolve lattice clashes once (reference minimizes before running too,
    # tests/test_simulation.py:139-141)
    x, _ = jax.jit(
        lambda x: minimize_fire(ffn, system.masses, x, box, n_steps=400, constrain_x=cx)
    )(x)

    params = LangevinParams(dt=0.002, friction=1.0, temperature=300.0)
    schedule = build_ncmc_schedule(NSTEPS_NC)
    move = RandomLigandRotationMove(lig, system.masses)
    protocol = make_ncmc_protocol(
        efn, ffn, system.masses, params, cx, cv, schedule, move=move
    )
    protocol_j = jax.jit(protocol)

    key = jax.random.PRNGKey(0)
    kv, kp = jax.random.split(key)
    v = cv(maxwell_boltzmann_velocities(kv, system.masses, 300.0), x)

    res = protocol_j(x, v, box, kp)  # compile + warmup
    jax.block_until_ready(res.positions)

    n_rep = 3
    t0 = time.time()
    for i in range(n_rep):
        res = protocol_j(x, v, box, jax.random.fold_in(kp, i))
    jax.block_until_ready(res.positions)
    dt = (time.time() - t0) / n_rep
    single_sps = schedule.n_micro / dt

    # per-chip capacity: batched replicas (BASELINE.json configs[4])
    R = 8
    vprot = jax.jit(jax.vmap(protocol, in_axes=(0, 0, None, 0)))
    xs = jnp.broadcast_to(x, (R,) + x.shape)
    keys = jax.random.split(kp, R)
    vs = jax.vmap(
        lambda k: maxwell_boltzmann_velocities(k, system.masses, 300.0)
    )(keys)
    r = vprot(xs, vs, box, keys)
    jax.block_until_ready(r.positions)
    t0 = time.time()
    for i in range(2):
        keys_i = jax.vmap(lambda k: jax.random.fold_in(k, i + 1))(keys)
        r = vprot(xs, vs, box, keys_i)
        jax.block_until_ready(r.positions)
    agg_sps = 2 * R * schedule.n_micro / (time.time() - t0)

    steps_per_sec = max(single_sps, agg_sps)
    print(
        json.dumps(
            {
                "metric": "ncmc_switching_steps_per_sec_per_chip_22340atoms",
                "value": round(steps_per_sec, 2),
                "n_atoms": N_ATOMS,
                "protocol": "freeze>5A production config, 22340 atoms, PME 9A, softcore NCMC",
                "single_replica_steps_per_sec": round(single_sps, 2),
                "aggregate_8_replicas_steps_per_sec": round(agg_sps, 2),
                "unit": "switching_steps/s",
                "vs_baseline": round(steps_per_sec / OPENMM_CPU_BASELINE_STEPS_PER_SEC, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
