"""Round-2 regression tests: reporter cadence, NCMC frame_indices,
per-move acceptance statistics, nprop>1 end-to-end, barostat state
persistence, MD chunk remainders, and the periodic MC path.

These pin the behaviors flagged in the round-1 review: reporter intervals
must convert from steps to iterations exactly once (not collapse to 1),
NCMC snapshots must honor the reference's frame_indices sentinels
(0.5 -> moveStep, -1 -> last; reference blues/settings.py:271-277), and
extra propagation (nprop > 1, reference blues/integrators.py:194-203) must
not double-count protocol work.
"""

import os

import jax
import numpy as np
import pytest

from blues_tpu.integrators.schedules import (
    build_ncmc_schedule,
    calculate_ncmc_steps,
    resolve_frame_indices,
)
from blues_tpu.moves import MoveEngine, NullMove, RandomLigandRotationMove
from blues_tpu.reporters import NetCDFReporter, StateDataReporter
from blues_tpu.simulation import BLUESSimulation, SimulationConfig
from blues_tpu.testsystems import charged_ethylene

DATA = "/root/reference/blues/tests/data"
needs_data = pytest.mark.skipif(not os.path.isdir(DATA), reason="no reference data")


def _ethylene_sim(**overrides):
    system, x = charged_ethylene()
    lig = system.topology.select_resname("LIG")
    move = overrides.pop("_move", None)
    if move is None:
        move = MoveEngine(RandomLigandRotationMove(lig, system.masses))
    kwargs = dict(
        nIter=4, nstepsNC=20, nstepsMD=20, temperature=200.0, dt=0.001,
        moveStep=10, md_report_interval=10,
    )
    kwargs.update(overrides)
    cfg = SimulationConfig(**kwargs)
    sim = BLUESSimulation(system, move, cfg)
    sim.initialize(x, key=jax.random.PRNGKey(11))
    return sim


# --- frame_indices sentinel resolution --------------------------------------


def test_resolve_frame_indices_sentinels():
    # reference mapping: 0.5 -> moveStep, -1 -> nstepsNC (settings.py:271-277)
    assert resolve_frame_indices([1, 0.5, -1], 20, 10) == (1, 10, 20)
    assert resolve_frame_indices([-1], 100, 50) == (100,)
    assert resolve_frame_indices([0.5, 0.5, 5], 100, 50) == (5, 50)
    with pytest.raises(ValueError):
        resolve_frame_indices([999], 20, 10)


def test_schedule_micro_of_step_maps_steps():
    s = build_ncmc_schedule(10, nprop=2, prop_lambda=0.3)
    assert s.micro_of_step[0] == 0
    assert s.micro_of_step[-1] == s.n_micro
    assert np.all(np.diff(s.micro_of_step) >= 1)
    # inside the prop window each integrator step maps to 2 micro steps
    assert s.n_micro > 10


def test_driver_honors_frame_indices():
    sim = _ethylene_sim(ncmc_frame_indices=(1, 0.5, -1))
    assert sim.ncmc_frame_steps == (1, 10, 20)
    assert sim.ncmc_frame_lambdas == (1 / 20, 0.5, 1.0)
    stats, frames, ncmc_frames = sim.run_iteration()
    pos = np.asarray(ncmc_frames.positions)
    work = np.asarray(ncmc_frames.work)
    assert pos.shape == (3, sim.system.n_atoms, 3)
    assert work.shape == (3,)
    assert np.isfinite(pos).all() and np.isfinite(work).all()
    # final snapshot work equals the protocol work (no veto here)
    assert work[-1] == pytest.approx(float(np.asarray(stats.protocol_work)), abs=1e-4)


# --- reporter cadence (intervals must not collapse to 1) --------------------


def test_netcdf_reporter_cadence(tmp_path):
    sim = _ethylene_sim()
    # 40 steps interval over 20-step iterations -> write every 2 iterations;
    # md_report_interval=10 -> 2 md frames per written iteration
    rep = NetCDFReporter(str(tmp_path / "md.nc"), reportInterval=40, source="md")
    sim.run(4, reporters=[rep])
    rep.close()
    from scipy.io import netcdf_file

    nc = netcdf_file(str(tmp_path / "md.nc"), "r", mmap=False)
    assert nc.variables["coordinates"].shape[0] == 2 * 2  # 2 writes x 2 frames
    nc.close()


def test_ncmc_reporter_writes_per_frame_work_lambda(tmp_path):
    sim = _ethylene_sim(ncmc_frame_indices=(1, 0.5, -1))
    rep = NetCDFReporter(
        str(tmp_path / "ncmc.nc"), source="ncmc",
        protocolWork=True, alchemicalLambda=True, frame_indices=(1, 0.5, -1),
    )
    sim.run(2, reporters=[rep])
    rep.close()
    from scipy.io import netcdf_file

    nc = netcdf_file(str(tmp_path / "ncmc.nc"), "r", mmap=False)
    lam = np.asarray(nc.variables["alchemicalLambda"][:])
    work = np.asarray(nc.variables["protocolWork"][:])
    nc.close()
    assert lam.shape[0] == 6  # 3 frames x 2 iterations
    np.testing.assert_allclose(lam[:3], [1 / 20, 0.5, 1.0], rtol=1e-6)
    np.testing.assert_allclose(lam[3:], [1 / 20, 0.5, 1.0], rtol=1e-6)
    assert np.isfinite(work).all()


def test_stream_reporter_interval_stable(tmp_path):
    sim = _ethylene_sim()
    rep = StateDataReporter(title="md", reportInterval=40, source="md")
    sim.run(4, reporters=[rep])
    # steps->iterations conversion ran once: interval stays 2
    assert rep.interval == 2


# --- per-move acceptance statistics ------------------------------------------


def test_per_move_acceptance_counters():
    system, x = charged_ethylene()
    lig = system.topology.select_resname("LIG")
    engine = MoveEngine(
        [NullMove(), RandomLigandRotationMove(lig, system.masses)],
        probabilities=[0.5, 0.5],
    )
    cfg = SimulationConfig(
        nIter=16, nstepsNC=10, nstepsMD=10, temperature=200.0, dt=0.001, moveStep=5
    )
    sim = BLUESSimulation(system, engine, cfg)
    sim.initialize(x, key=jax.random.PRNGKey(2))
    sim.run(16)
    stats = sim.move_stats
    assert stats.shape == (2, 2)
    assert stats[:, 0].sum() == 16  # every iteration attributed to a move
    assert (stats[:, 1] <= stats[:, 0]).all()
    assert (stats[:, 0] > 0).all()  # both moves were attempted
    # the identity move accumulates ~zero work: always accepted
    assert stats[0, 1] == stats[0, 0]


# --- nprop > 1 end-to-end ----------------------------------------------------


def test_nprop_extra_propagation_end_to_end():
    """nprop=2 through the full driver: extra propagation is scheduled
    (propSteps > nstepsNC) and a real rotation-move protocol stays finite
    with sane acceptance."""
    params = calculate_ncmc_steps(20, nprop=2, propLambda=0.3)
    sim = _ethylene_sim(
        nIter=10, nstepsNC=20, nprop=2, propLambda=0.3,
        moveStep=None, md_report_interval=None,
    )
    assert sim.propSteps == params["propSteps"]
    assert sim.propSteps > sim.nstepsNC  # extra propagation actually scheduled
    # the executable schedule doubles every step whose end-of-step lambda
    # falls in the window; the reference's calculateNCMCSteps estimate
    # (blues/utils.py:89-145) can differ by the boundary step
    assert abs(sim.schedule.n_micro - sim.propSteps) <= 1
    assert sim.schedule.n_micro > sim.nstepsNC
    works = []
    for _ in range(10):
        stats, _, _ = sim.run_iteration()
        works.append(float(np.asarray(stats.protocol_work)))
    assert np.isfinite(works).all()


def test_nprop_nullmove_work_not_double_counted():
    """NullMove + nprop=2: the repeated-lambda micro steps must contribute
    zero lambda-transition work (the reference's prop-guard,
    blues/integrators.py:194-203,217). Protocol work stays O(<1 kT) and
    acceptance stays ~1."""
    system, x = charged_ethylene()
    cfg = SimulationConfig(
        nIter=5, nstepsNC=20, nstepsMD=10, temperature=200.0, dt=0.001,
        nprop=2, propLambda=0.3,
    )
    sim = BLUESSimulation(system, NullMove(), cfg)
    sim.initialize(x, key=jax.random.PRNGKey(5))
    from blues_tpu import units

    kT = units.kT(200.0)
    accs = []
    for _ in range(5):
        stats, _, _ = sim.run_iteration()
        w = float(np.asarray(stats.protocol_work)) / kT
        # identity move + round-trip protocol: work fluctuates O(<1 kT);
        # double-counted window work would be systematically large
        assert abs(w) < 1.0
        accs.append(float(np.asarray(stats.accepted)))
    assert np.mean(accs) >= 0.8


# --- barostat state persistence + MD chunk remainder -------------------------


def test_barostat_state_persists_across_iterations():
    system, x = charged_ethylene()
    cfg = SimulationConfig(
        nIter=2, nstepsNC=10, nstepsMD=50, temperature=200.0, dt=0.001,
        moveStep=5, pressure=1.0, barostat_frequency=10,
    )
    sim = BLUESSimulation(system, NullMove(), cfg)
    sim.initialize(x, key=jax.random.PRNGKey(0))
    sim.run_iteration()
    assert int(np.asarray(sim.barostat_state.n_attempted)) == 5
    sim.run_iteration()
    # counters accumulate across iterations (adaptation can trigger)
    assert int(np.asarray(sim.barostat_state.n_attempted)) == 10
    assert float(np.asarray(sim.barostat_state.volume_scale)) > 0


def test_md_runs_when_nsteps_below_barostat_frequency():
    """Old behavior ran ZERO MD steps when nstepsMD < barostat_frequency;
    the chunk size now clamps to nstepsMD and the barostat still attempts."""
    system, x = charged_ethylene()
    cfg = SimulationConfig(
        nIter=2, nstepsNC=10, nstepsMD=5, temperature=200.0, dt=0.001,
        moveStep=5, pressure=1.0, barostat_frequency=25,
    )
    sim = BLUESSimulation(system, NullMove(), cfg)
    sim.initialize(x, key=jax.random.PRNGKey(1))
    sim.run_iteration()
    assert int(np.asarray(sim.barostat_state.n_attempted)) == 1


def test_md_remainder_steps_not_dropped():
    """nstepsMD=25 with md_report_interval=10 -> 2 chunks + 5 remainder
    steps; the iteration must still run and emit exactly 2 frames."""
    sim = _ethylene_sim(nstepsMD=25, md_report_interval=10, nIter=1)
    stats, frames, _ = sim.run_iteration()
    assert np.asarray(frames).shape[0] == 2
    assert np.isfinite(np.asarray(stats.md_potential))


# --- periodic Monte Carlo path ------------------------------------------------


@needs_data
@pytest.mark.slow
def test_montecarlo_periodic_pme():
    """MC proposals on the periodic TOL-parm PME system: the proposal
    energies must use the real box (minimum image + reciprocal sum)."""
    from blues_tpu.core.amber_coords import load_inpcrd
    from blues_tpu.core.prmtop import load_prmtop
    from blues_tpu.simulation.montecarlo import MonteCarloSimulation

    system = load_prmtop(f"{DATA}/TOL-parm.prmtop")
    crd = load_inpcrd(f"{DATA}/TOL-parm.inpcrd")
    system = system.replace(box=crd.box)
    lig = system.topology.select_resname("LIG")
    assert len(lig) == 15
    cfg = SimulationConfig(
        nIter=2, nstepsMD=5, temperature=300.0, dt=0.002,
        nonbonded_method="PME", cutoff=0.9,
    )
    move = RandomLigandRotationMove(lig, system.masses)
    mc = MonteCarloSimulation(system, move, cfg, mc_per_iter=2)
    # the stored inpcrd is clashy (PE ~1.6e7 kJ/mol): relax before dynamics,
    # like the reference's minimizeEnergy() pre-step
    from blues_tpu.integrators.minimize import minimize_fire

    import jax.numpy as jnp

    x0, _ = minimize_fire(
        mc.force, system.masses, jnp.asarray(crd.positions, jnp.float32),
        jnp.asarray(crd.box, jnp.float32), n_steps=800,
        constrain_x=mc._constrain[0],
    )
    mc.initialize(x0, box=crd.box, key=jax.random.PRNGKey(0))
    ratio = mc.run(2)
    assert 0.0 <= ratio <= 1.0
    stats = mc.stats_history[-1]
    assert np.isfinite(np.asarray(stats.delta_pe)).all()
    assert np.isfinite(np.asarray(stats.md_potential))


def test_md_nan_rollback():
    """A non-finite MD relaxation rolls the state back to the pre-MD point
    (md_failed=True) instead of corrupting the run — the recoverable analog
    of the reference's dump-frame-and-exit (blues/simulation.py:1203-1213).
    Forced here with a catastrophically large timestep."""
    import jax
    import numpy as np

    from blues_tpu.moves import MoveEngine, NullMove
    from blues_tpu.simulation import BLUESSimulation, SimulationConfig
    from blues_tpu.testsystems import charged_ethylene

    system, x0 = charged_ethylene()
    cfg = SimulationConfig(nIter=1, nstepsNC=4, nstepsMD=50, dt=2.5,
                           temperature=200.0, moveStep=2)
    sim = BLUESSimulation(system, MoveEngine(NullMove()), cfg)
    sim.initialize(x0, key=jax.random.PRNGKey(0))
    x_before = np.asarray(sim.state.positions)
    stats, _, _ = sim.run_iteration()
    assert bool(np.asarray(stats.md_failed))
    x_after = np.asarray(sim.state.positions)
    assert np.isfinite(x_after).all()
    # rolled back to the post-accept/reject (== pre-MD) positions: with a
    # NullMove 4-step NCMC either outcome keeps positions near x_before
    assert np.abs(x_after - x_before).max() < 1.0


def test_yaml_perf_knobs_plumb_through():
    """frozen_cull_skin / nlist_rebuild_interval / nonbonded_backend ride
    from YAML into SimulationConfig."""
    from blues_tpu.config.settings import Settings

    cfg = Settings({
        "system": {"nonbondedMethod": "PME", "nonbondedCutoff": "9 * angstroms"},
        "simulation": {"nstepsNC": 10, "frozen_cull_skin": None,
                       "nlist_rebuild_interval": 25,
                       "nonbonded_backend": "cells"},
    }).asDict()
    sim_cfg = cfg["simulation"]
    assert sim_cfg["frozen_cull_skin"] is None
    assert sim_cfg["nlist_rebuild_interval"] == 25
    assert sim_cfg["nonbonded_backend"] == "cells"


def test_npt_with_frozen_atoms_rejected():
    """The frozen-background PME grid assumes a fixed box, so NPT + frozen
    atoms must be rejected loudly, never silently mis-integrated."""
    import warnings

    import jax
    import numpy as np
    import pytest

    from blues_tpu.core.amber_coords import load_inpcrd
    from blues_tpu.core.prmtop import load_prmtop
    from blues_tpu.core.system import AlchemicalRegion
    from blues_tpu.moves import MoveEngine, NullMove
    from blues_tpu.simulation import BLUESSimulation, SimulationConfig

    DATA = "/root/reference/blues/tests/data"
    import os

    if not os.path.isdir(DATA):
        pytest.skip("no reference data")
    system = load_prmtop(f"{DATA}/TOL-parm.prmtop")
    crd = load_inpcrd(f"{DATA}/TOL-parm.inpcrd")
    system = system.replace(box=crd.box)
    lig = system.topology.select_resname("LIG")
    system = system.replace(alchemical=AlchemicalRegion(atoms=lig))
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        frozen = system.freeze_radius(np.asarray(crd.positions), lig, 0.4)
    cfg = SimulationConfig(nIter=1, nstepsNC=4, nstepsMD=4,
                           nonbonded_method="PME", cutoff=0.6, pressure=1.0)
    with pytest.raises(ValueError, match="frozen"):
        BLUESSimulation(frozen, MoveEngine(NullMove()), cfg)
