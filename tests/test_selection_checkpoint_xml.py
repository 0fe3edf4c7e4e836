"""Amber-mask selection, checkpoint/resume, OpenMM XML importer."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from blues_tpu.core.checkpoint import load_checkpoint, save_checkpoint
from blues_tpu.core.openmm_xml import load_openmm_system_xml
from blues_tpu.core.selection import (
    amber_selection_to_atomidx,
    check_amber_selection,
)
from blues_tpu.moves import NullMove, RandomLigandRotationMove
from blues_tpu.potentials.energy import make_energy_fn
from blues_tpu.simulation import BLUESSimulation, SimulationConfig
from blues_tpu.testsystems import charged_ethylene

DATA = "/root/reference/blues/tests/data"
needs_data = pytest.mark.skipif(not os.path.isdir(DATA), reason="no reference data")


@needs_data
def test_amber_masks_on_toluene_box():
    from blues_tpu.core.amber_coords import load_inpcrd
    from blues_tpu.core.prmtop import load_prmtop

    system = load_prmtop(f"{DATA}/TOL-parm.prmtop")
    crd = load_inpcrd(f"{DATA}/TOL-parm.inpcrd")
    top = system.topology
    assert len(amber_selection_to_atomidx(top, ":LIG")) == 15
    assert len(amber_selection_to_atomidx(top, ":HOH")) == 960
    assert len(amber_selection_to_atomidx(top, ":LIG, HOH")) == 975
    assert len(amber_selection_to_atomidx(top, "!:HOH")) == 15
    assert len(amber_selection_to_atomidx(top, ":1")) == 15  # residue 1 = LIG
    assert len(amber_selection_to_atomidx(top, ":2-4")) == 9
    # atom-name selection within the ligand
    ca = amber_selection_to_atomidx(top, ":LIG & @C1")
    assert len(ca) == 1 and top.atom_names[ca[0]] == "C1"
    # distance selection: residues within 5 A of the ligand
    near = amber_selection_to_atomidx(top, ":LIG<:5.0", positions=crd.positions)
    assert len(near) > 15 and len(near) < 975
    with pytest.raises(ValueError, match="matches no atoms"):
        check_amber_selection(top, ":BOGUS")


def test_checkpoint_roundtrip(tmp_path):
    system, x = charged_ethylene()
    cfg = SimulationConfig(nIter=3, nstepsNC=10, nstepsMD=10, temperature=200.0,
                           dt=0.001, moveStep=5)
    sim = BLUESSimulation(system, NullMove(), cfg)
    sim.initialize(x, key=jax.random.PRNGKey(11))
    sim.run(2)
    path = str(tmp_path / "ckpt.npz")
    save_checkpoint(path, sim)
    # continue the original
    stats_a, _, _ = sim.run_iteration()

    # restore into a fresh simulation and continue: bitwise identical
    sim2 = BLUESSimulation(system, NullMove(), cfg)
    sim2.initialize(x, key=jax.random.PRNGKey(999))  # different seed, overwritten
    load_checkpoint(path, sim2)
    assert sim2.iteration_count == 2
    stats_b, _, _ = sim2.run_iteration()
    assert np.allclose(float(stats_a.protocol_work), float(stats_b.protocol_work))
    assert bool(stats_a.accepted) == bool(stats_b.accepted)
    assert np.allclose(np.asarray(sim.state.positions), np.asarray(sim2.state.positions))


@needs_data
def test_openmm_xml_matches_native_ethylene():
    sx = load_openmm_system_xml(f"{DATA}/ethylene_system.xml")
    sn, x = charged_ethylene()
    assert np.allclose(sx.masses, sn.masses)
    ex = make_energy_fn(sx)
    en = make_energy_fn(sn)
    xj = jnp.asarray(x, jnp.float32)
    for lam in (None, {"lambda_sterics": 0.3, "lambda_electrostatics": 0.7}):
        assert float(ex(xj, None, lam)) == pytest.approx(float(en(xj, None, lam)), abs=1e-4)
