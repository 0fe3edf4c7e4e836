"""MD NaN-rollback must not bias the sampled ensemble (VERDICT r3 next #3).

The driver's failure-recovery path keeps the pre-MD state when the post-MD
state is non-finite (simulation/driver.py md_ok; the reference instead
hard-exits on NaN, blues/simulation.py:1203-1213). A rolled-back MD stage
is a no-op decorrelation move: the configurational state is an unmodified
valid sample and velocities are Maxwell-resampled at the next stage, so the
stationary distribution is untouched — rollbacks only slow decorrelation.
This test PROVES that end to end: with fault injection poisoning ~30% of MD
stages, the ethylene two-state populations must still reproduce
[0.25, 0.75] (the reference's golden physics, tests/test_ethylene.py:140-163).
"""

import jax
import numpy as np
import pytest

from blues_tpu.moves import MoveEngine, RandomLigandRotationMove
from blues_tpu.simulation import BLUESSimulation, SimulationConfig
from blues_tpu.testsystems import charged_ethylene

FAULT_RATE = 0.3
N_REPLICAS = 5
N_ITER = 100


@pytest.mark.slow
def test_populations_unbiased_under_forced_rollbacks():
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
        n_replicas=N_REPLICAS,
        md_fault_injection=FAULT_RATE,
    )
    sim = BLUESSimulation(system, move, cfg)
    sim.initialize(positions, key=jax.random.PRNGKey(20260819))

    dists = []
    n_failed = 0
    n_stages = 0
    for _ in range(N_ITER):
        stats, _, _ = sim.run_iteration()
        n_failed += int(np.asarray(stats.md_failed).sum())
        n_stages += N_REPLICAS
        x = np.asarray(sim.state.positions)  # (R, N, 3)
        dists.append(np.linalg.norm(x[:, 0] - x[:, 2], axis=-1))
    dists = np.stack(dists, axis=1)  # (R, T)

    # the injector actually exercised the rollback path at ~the target rate
    rate = n_failed / n_stages
    assert 0.15 < rate < 0.45, rate
    # positions always finite: every poisoned stage was rolled back
    assert np.isfinite(np.asarray(sim.state.positions)).all()

    state1 = (dists > 0.49).mean()
    freqs = np.array([1.0 - state1, state1])
    # end-of-iteration samples are sparser than the gate test's MD frames
    # (100 vs 400 per replica) -> slightly wider tolerance, same physics
    assert np.allclose(freqs, [0.25, 0.75], atol=0.1), freqs
    flips = (np.diff((dists > 0.49).astype(int), axis=1) != 0).sum(axis=1)
    assert (flips > 0).all(), flips
