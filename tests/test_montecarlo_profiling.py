"""MonteCarloSimulation (pure-MC variant) + profiling counters."""

import jax
import numpy as np

from blues_tpu.moves import RandomLigandRotationMove
from blues_tpu.profiling import SimulationTimer
from blues_tpu.simulation import BLUESSimulation, MonteCarloSimulation, SimulationConfig
from blues_tpu.testsystems import charged_ethylene


def test_montecarlo_simulation_samples():
    """Pure-MC variant (reference MonteCarloSimulation,
    blues/simulation.py:1260-1335): instantaneous rotations accepted on
    dPE, followed by MD."""
    system, x = charged_ethylene()
    lig = system.topology.select_resname("LIG")
    move = RandomLigandRotationMove(lig, system.masses)
    cfg = SimulationConfig(nIter=20, nstepsMD=20, temperature=200.0, dt=0.001)
    sim = MonteCarloSimulation(system, move, cfg, mc_per_iter=2)
    sim.initialize(x, key=jax.random.PRNGKey(4))
    ratio = sim.run(20)
    assert 0.0 <= ratio <= 1.0
    dpes = np.concatenate([np.atleast_1d(s.delta_pe) for s in sim.stats_history])
    assert np.isfinite(dpes).all()
    # with a symmetric rotation move on this two-state system some
    # proposals must be accepted and some rejected over 40 attempts
    accs = np.concatenate([np.atleast_1d(s.accepted) for s in sim.stats_history])
    assert 0 < accs.sum() < accs.size


def test_simulation_timer_counters():
    system, x = charged_ethylene()
    cfg = SimulationConfig(nIter=3, nstepsNC=10, nstepsMD=20, temperature=200.0,
                           dt=0.001, moveStep=5)
    from blues_tpu.moves import NullMove

    sim = BLUESSimulation(system, NullMove(), cfg)
    sim.initialize(x, key=jax.random.PRNGKey(0))
    timer = SimulationTimer(sim).start()
    for _ in range(3):
        sim.run_iteration()
        timer.tick()
    s = timer.summary()
    assert s["iterations"] == 3
    assert s["md_steps"] == 60
    assert s["ncmc_switching_steps"] == 30
    assert s["force_evaluations"] == 60 + 2 * 30 + 12
    assert s["ns_per_day_md"] > 0
