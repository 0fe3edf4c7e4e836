"""Run the ethylene [0.25, 0.75] physics gate ON the real TPU.

The CI suite executes tests/test_ethylene_populations.py on the CPU
backend (tests/conftest.py forces an 8-device virtual mesh); this tool
runs the identical protocol — charged ethylene, 20-step NCMC + random
ligand rotation, 5 vmapped replicas x 100 iterations, the reference's
golden two-state populations (reference tests/test_ethylene.py:140-163) —
on the actual chip, so the acceptance-critical physics (softcore energies,
work telescoping, Metropolis correction) is pinned on TPU hardware, f32
Mosaic kernels and all, not just on the CPU emulation path.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/ethylene_gate_tpu.py
One JSON line to stdout; diagnostics to stderr.
"""

import json
import sys
import time

import jax
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    from blues_tpu.moves import MoveEngine, RandomLigandRotationMove
    from blues_tpu.simulation import BLUESSimulation, SimulationConfig
    from blues_tpu.testsystems import charged_ethylene

    log(f"# backend: {jax.default_backend()} ({jax.devices()})")
    system, positions = charged_ethylene()
    lig = system.topology.select_resname("LIG")
    move = MoveEngine(RandomLigandRotationMove(lig, system.masses))
    cfg = SimulationConfig(
        nIter=100, nstepsNC=20, nstepsMD=20, temperature=200.0, dt=0.001,
        friction=1.0, moveStep=10, md_report_interval=5, n_replicas=5,
    )
    sim = BLUESSimulation(system, move, cfg)
    sim.initialize(positions, key=jax.random.PRNGKey(20260816))

    t0 = time.time()
    frames, accepted = [], 0
    for i in range(100):
        stats, fr, _ = sim.run_iteration()
        accepted += int(np.asarray(stats.accepted).sum())
        frames.append(np.asarray(fr))
        if (i + 1) % 25 == 0:
            log(f"# iter {i + 1}/100 ({time.time() - t0:.0f} s)")
    frames = np.concatenate(frames, axis=1)  # (R, T, N, 3)

    dists = np.linalg.norm(frames[:, :, 0] - frames[:, :, 2], axis=-1)
    state1 = (dists > 0.49).astype(np.float64)
    pops = [float(1.0 - state1.mean()), float(state1.mean())]
    flips = (np.diff(state1.astype(int), axis=1) != 0).sum(axis=1)
    out = {
        "what": "ethylene two-state populations gate executed on real TPU "
                "hardware (golden [0.25, 0.75], reference "
                "tests/test_ethylene.py:140-163)",
        "backend": jax.default_backend(),
        "populations": [round(p, 4) for p in pops],
        "golden": [0.25, 0.75],
        "acceptance": round(accepted / (100 * 5), 4),
        "flips_per_replica": [int(f) for f in flips],
        "elapsed_s": round(time.time() - t0, 1),
    }
    ok = abs(pops[0] - 0.25) < 0.1 and (flips > 0).all()
    out["ok"] = bool(ok)
    print(json.dumps(out))
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
