"""Bisect the TPU driver-iteration fault at production scale.

tools/acceptance_study.py dies with 'UNAVAILABLE: TPU device error' on its
first driver iteration (R=64, nstepsNC=10000, nstepsMD=2000, pallas) while
bench.py's protocol-only timings at R=64/256 and the 10k-step single-replica
run both succeed. This probe builds the flagship system ONCE and walks a
ladder of (R, nstepsNC, nstepsMD) driver configs to find the first failing
shape — separating scan length, replica count, and the MD stage.

Usage:
    tools/snapshot_run.sh python tools/probe_driver_scale.py
"""

import sys
import time

import jax
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    import warnings

    from blues_tpu.moves import MoveEngine, RandomLigandRotationMove
    from blues_tpu.simulation import BLUESSimulation, SimulationConfig
    from blues_tpu.testsystems import t4_scale_binding_site_box
    from blues_tpu.core.prmtop import repartition_hydrogen_masses

    t0 = time.time()
    system, x0 = t4_scale_binding_site_box(n_atoms=22340)
    bond_graph = np.concatenate(
        [np.asarray(e.idx).reshape(-1, 2) for e in (system.bonds, system.constraints) if len(e)]
    )
    system = system.replace(masses=repartition_hydrogen_masses(system.masses, bond_graph, 3.024))
    lig = system.topology.select_resname("LIG")
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        fs = system.freeze_radius(np.asarray(x0), lig, 0.5)
    backend = "pallas" if jax.default_backend() == "tpu" else "tiled"
    log(f"# built in {time.time() - t0:.0f}s; backend={backend}")

    # minimize once, reuse positions for every config
    cfg0 = SimulationConfig(
        nIter=1, nstepsNC=10, nstepsMD=10, dt=0.004, temperature=300.0,
        friction=1.0, nonbonded_method="PME", cutoff=1.0,
        ewald_tolerance=0.005, nonbonded_backend=backend,
    )
    sim0 = BLUESSimulation(fs, MoveEngine(RandomLigandRotationMove(lig, fs.masses)), cfg0)
    sim0.initialize(x0, key=jax.random.PRNGKey(7))
    sim0.minimize(600)
    x_min = np.asarray(sim0.state.positions)
    log(f"# minimized at {time.time() - t0:.0f}s")

    ladder = [
        # (R, nstepsNC, nstepsMD)  — one driver iteration each
        (64, 100, 100),
        (64, 1000, 100),
        (64, 1000, 2000),
        (64, 4000, 2000),
        (64, 10000, 100),
        (64, 10000, 2000),
    ]
    for R, nc, md in ladder:
        cfg = SimulationConfig(
            nIter=1, nstepsNC=nc, nstepsMD=md, dt=0.004, temperature=300.0,
            friction=1.0, nonbonded_method="PME", cutoff=1.0,
            ewald_tolerance=0.005, nonbonded_backend=backend, n_replicas=R,
        )
        sim = BLUESSimulation(fs, MoveEngine(RandomLigandRotationMove(lig, fs.masses)), cfg)
        sim.initialize(x_min, key=jax.random.PRNGKey(11))
        t1 = time.time()
        try:
            stats, _, _ = sim.run_iteration()
            jax.block_until_ready(stats.accepted)
            acc = float(np.asarray(stats.accepted).mean())
            w = np.asarray(stats.protocol_work)
            log(
                f"# OK  R={R} nc={nc} md={md}: {time.time() - t1:.0f}s "
                f"acc={acc:.3f} medW={np.median(w):+.1f} finite={np.isfinite(w).all()}"
            )
        except Exception as e:
            log(f"# FAIL R={R} nc={nc} md={md} after {time.time() - t1:.0f}s: {type(e).__name__}: {e}")
            break


if __name__ == "__main__":
    main()
