"""Arbitrary Langevin splitting strings for the NCMC dynamics core.

The reference's AlchemicalExternalLangevinIntegrator accepts any
openmmtools splitting string (default 'H V R O R V H',
blues/simulation.py:654-660). Here the non-H tokens define the per-step
substep sequence with the openmmtools timestep conventions (each R gets
dt/n_R, each V dt/n_V, each O an OU sub-interval of dt/n_O).
"""

import jax
import numpy as np
import pytest

from blues_tpu import units
from blues_tpu.moves import NullMove, RandomLigandRotationMove
from blues_tpu.simulation import BLUESSimulation, SimulationConfig
from blues_tpu.testsystems import charged_ethylene


def _run(splitting, move=None, n_iter=5, seed=7):
    system, x = charged_ethylene()
    if move is None:
        move = NullMove()
    cfg = SimulationConfig(
        nIter=n_iter, nstepsNC=20, nstepsMD=20, temperature=200.0, dt=0.001,
        splitting=splitting,
    )
    sim = BLUESSimulation(system, move, cfg)
    sim.initialize(x, key=jax.random.PRNGKey(seed))
    works, accs = [], []
    for _ in range(n_iter):
        stats, _, _ = sim.run_iteration()
        works.append(float(np.asarray(stats.protocol_work)))
        accs.append(float(np.asarray(stats.accepted)))
    return np.asarray(works), np.asarray(accs)


@pytest.mark.parametrize(
    "splitting",
    ["H V R O R V H", "O V R V O H", "H R V O V R H", "V R R O R R V H"],
)
def test_splittings_run_with_sane_work(splitting):
    """Identity move + cyclic protocol: any valid splitting must give
    near-zero protocol work (the work accounting is splitting-independent)
    and high acceptance."""
    works, accs = _run(splitting)
    kT = units.kT(200.0)
    assert np.isfinite(works).all()
    assert np.all(np.abs(works) < 1.5 * kT), works / kT
    assert accs.mean() >= 0.8


def test_splitting_sampling_equivalent():
    """A rotation-move run under 'O V R V O H' still samples a working
    two-state protocol (finite work, mixed acceptance)."""
    system, x = charged_ethylene()
    lig = system.topology.select_resname("LIG")
    works, accs = _run(
        "O V R V O H",
        move=RandomLigandRotationMove(lig, system.masses),
        n_iter=20,
    )
    assert np.isfinite(works).all()
    assert 0.05 <= accs.mean() <= 0.95


def test_invalid_splitting_rejected():
    with pytest.raises(ValueError, match="splitting"):
        _run("H X R O R V H")
    with pytest.raises(ValueError, match="splitting"):
        _run("H O O H")  # no V/R
