"""Amber prmtop/inpcrd/rst7 loaders + PME + minimization on real systems.

Uses the reference repo's Amber data files (read-only) when present,
mirroring the reference's own fixtures (tests/test_simulation.py:16-142).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from blues_tpu import units
from blues_tpu.core.amber_coords import AmberCoords, load_inpcrd, write_rst7
from blues_tpu.core.prmtop import load_prmtop, repartition_hydrogen_masses
from blues_tpu.integrators.constraints import make_constraint_fns
from blues_tpu.integrators.langevin import LangevinParams, run_md
from blues_tpu.integrators.minimize import minimize_fire
from blues_tpu.core.state import maxwell_boltzmann_velocities
from blues_tpu.potentials.energy import make_energy_fn, make_force_fn

DATA = "/root/reference/blues/tests/data"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(DATA), reason="reference Amber data not available"
)


@pytest.fixture(scope="module")
def tol():
    system = load_prmtop(f"{DATA}/TOL-parm.prmtop")
    crd = load_inpcrd(f"{DATA}/TOL-parm.inpcrd")
    return system, crd


def test_prmtop_basic(tol):
    system, crd = tol
    assert system.n_atoms == 975
    assert crd.positions.shape == (975, 3)
    assert abs(system.nonbonded.charge.sum()) < 1e-4  # neutral box
    assert np.allclose(np.diag(system.box), 2.1786, atol=1e-3)
    assert len(system.topology.select_resname("LIG")) == 15
    # toluene: 7 C (12.01) + 8 H
    lig = system.topology.select_resname("LIG")
    assert (system.masses[lig] > 11).sum() == 7


def test_prmtop_water_constraints(tol):
    system, _ = tol
    # 320 waters x 3 constraints (OH, OH, HH) + toluene 8 C-H constraints
    n_wat = sum(1 for r in set(zip(system.topology.residue_ids.tolist(),
                                   system.topology.residue_names))
                if r[1] == "HOH")
    assert n_wat == 320
    assert len(system.constraints) == 3 * 320 + 8


def test_hmr(tol):
    system, _ = tol
    m = repartition_hydrogen_masses(system.masses, system.topology.bonds, 3.024)
    assert np.isclose(m.sum(), system.masses.sum())
    is_h = system.masses < 3.5
    assert np.allclose(m[is_h], 3.024)
    assert (m[~is_h] > 0).all()


def test_rst7_roundtrip(tmp_path, tol):
    system, crd = tol
    rng = np.random.default_rng(0)
    vel = rng.normal(size=crd.positions.shape)
    path = str(tmp_path / "out.rst7")
    write_rst7(path, crd.positions, vel, crd.box)
    back = load_inpcrd(path)
    assert np.allclose(back.positions, crd.positions, atol=1e-6)
    assert np.allclose(back.velocities, vel, atol=1e-5)
    assert np.allclose(np.diag(back.box), np.diag(crd.box), atol=1e-6)


@pytest.mark.slow
def test_minimize_then_stable_md(tol):
    system, crd = tol
    efn = make_energy_fn(system, nonbonded_method="PME", cutoff=0.9)
    ffn = make_force_fn(efn)
    x = jnp.asarray(crd.positions, jnp.float32)
    box = jnp.asarray(crd.box, jnp.float32)
    cx, cv = make_constraint_fns(system.constraints, system.masses)
    xmin, emin = jax.jit(
        lambda x: minimize_fire(ffn, system.masses, x, box, n_steps=2000, constrain_x=cx)
    )(x)
    assert float(emin) < -5000.0  # clashes resolved (start is ~1.6e7)
    params = LangevinParams(0.002, 1.0, 300.0)
    kv, kmd = jax.random.split(jax.random.PRNGKey(0))
    v0 = cv(maxwell_boltzmann_velocities(kv, system.masses, 300.0), xmin)
    xf, vf, _, pe = jax.jit(
        lambda x, v, k: run_md(ffn, system.masses, params, cx, cv, x, v, box, k, 1000)
    )(xmin, v0, kmd)
    assert np.isfinite(float(pe))
    d = np.linalg.norm(
        np.asarray(xf)[system.constraints.idx[:, 0]]
        - np.asarray(xf)[system.constraints.idx[:, 1]],
        axis=1,
    )
    assert np.max(np.abs(d / system.constraints.dist - 1)) < 1e-4


@pytest.mark.slow
def test_alchemical_pme_treatments(tol):
    """'exact' treatment makes the NCMC potential equal the MD potential at
    full lambda (correction identically ~0); 'direct-space' (the reference
    default) leaves a nonzero correction that the driver applies
    (blues/simulation.py:1100-1119)."""
    from blues_tpu.core.system import AlchemicalRegion
    from blues_tpu.moves import NullMove
    from blues_tpu.simulation import BLUESSimulation, SimulationConfig

    system, crd = tol
    lig = system.topology.select_resname("LIG")
    system = system.replace(alchemical=AlchemicalRegion(atoms=lig))
    corrections = {}
    for treatment in ("exact", "direct-space"):
        cfg = SimulationConfig(
            nIter=1, nstepsNC=10, nstepsMD=0, temperature=300.0, dt=0.002,
            moveStep=5, nonbonded_method="PME", cutoff=0.9,
            alchemical_pme_treatment=treatment,
        )
        sim = BLUESSimulation(system, NullMove(), cfg)
        sim.initialize(crd.positions, key=jax.random.PRNGKey(1))
        sim.minimize(400)
        stats, _, _ = sim.run_iteration()
        corrections[treatment] = float(stats.correction)
    # exact: U_alch(x, lam=1) == U_md(x) -> correction is f32 noise only
    assert abs(corrections["exact"]) < 0.05, corrections
    # direct-space: ligand reciprocal-space terms differ between the
    # protocol's endpoint configurations -> distinctly nonzero
    assert abs(corrections["direct-space"]) > 0.05, corrections
