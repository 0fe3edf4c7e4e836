"""End-to-end statistical regression: ethylene two-state populations.

The rebuild's golden-physics gate, mirroring the reference's
tests/test_ethylene.py:140-163: the charged-ethylene system sampled with
20-step NCMC + random ligand rotation must reproduce the analytically known
two-state populations [0.25, 0.75] within run error. The reference runs
5 sequential seeded repeats; here the 5 repeats are vmapped replicas in a
single launch (the TPU-native replica axis, SURVEY.md 2.4).
"""

import jax
import numpy as np
import pytest

from blues_tpu.moves import MoveEngine, RandomLigandRotationMove
from blues_tpu.simulation import BLUESSimulation, SimulationConfig
from blues_tpu.testsystems import charged_ethylene

POPULATIONS = [0.25, 0.75]
N_REPLICAS = 5
N_ITER = 100


def _populations(dist):
    state1 = (dist > 0.49).astype(np.float64)
    return np.array([1.0 - state1.mean(), state1.mean()])


def _stderr(dist, n_points=10):
    """Convergence error estimate in the spirit of the reference's
    graphConvergence (tests/test_ethylene.py:118-137): std of the running
    population estimate over checkpoints, scaled by 1/sqrt(n)."""
    fractions = []
    for n in range(n_points, len(dist) + 1, n_points):
        fractions.append((dist[:n] > 0.49).mean())
    fr = np.asarray(fractions)
    return np.std(fr) / np.sqrt(len(fr))


@pytest.mark.slow
def test_ethylene_two_state_populations():
    system, positions = charged_ethylene()
    lig = system.topology.select_resname("LIG")
    move = MoveEngine(RandomLigandRotationMove(lig, system.masses))
    cfg = SimulationConfig(
        nIter=N_ITER,
        nstepsNC=20,
        nstepsMD=20,
        temperature=200.0,
        dt=0.001,
        friction=1.0,
        moveStep=10,
        md_report_interval=5,
        n_replicas=N_REPLICAS,
    )
    sim = BLUESSimulation(system, move, cfg)
    sim.initialize(positions, key=jax.random.PRNGKey(20260816))

    frames = []
    for _ in range(N_ITER):
        _, fr, _ = sim.run_iteration()
        frames.append(np.asarray(fr))  # (R, n_chunks, N, 3)
    frames = np.concatenate(frames, axis=1)  # (R, T, N, 3)

    dists = np.linalg.norm(frames[:, :, 0] - frames[:, :, 2], axis=-1)  # (R, T)
    freqs = np.stack([_populations(d) for d in dists])
    errs = np.stack([_stderr(d) for d in dists])
    avg_freq = freqs.mean(axis=0)
    avg_err = max(errs.mean(), 0.03)  # floor mirrors small-sample noise
    print("populations", avg_freq, "err", avg_err)
    assert np.allclose(avg_freq, POPULATIONS, atol=3 * avg_err), (avg_freq, avg_err)
    # sanity: each replica actually flipped states
    flips = (np.diff((dists > 0.49).astype(int), axis=1) != 0).sum(axis=1)
    assert (flips > 0).all(), flips
