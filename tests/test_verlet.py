"""Verlet neighbor-list backend: agreement with tiled, staleness semantics.

The (N, K) list is a pure acceleration structure — while valid, energies and
forces must match the tiled O(N^2) backend to f64 roundoff. Also covers the
build/apply reuse path (list built once, applied at displaced positions) and
the staleness/overflow poisoning.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from blues_tpu.core.build import solvated_ligand_box
from blues_tpu.core.system import AlchemicalRegion
from blues_tpu.ligands import toluene_system
from blues_tpu.potentials.energy import make_energy_fn, make_force_fn


@pytest.fixture(scope="module")
def water_tol_system():
    lig, lig_x = toluene_system()
    system, x = solvated_ligand_box(lig, lig_x, 3000, seed=1)
    lig_idx = system.topology.select_resname("LIG")
    system = system.replace(alchemical=AlchemicalRegion(atoms=lig_idx))
    return system, jnp.asarray(x, jnp.float32)


def _efn(system, backend, **kw):
    return make_energy_fn(
        system, nonbonded_method="PME", cutoff=0.9,
        nonbonded_backend=backend, **kw,
    )


@pytest.mark.parametrize("lam", [1.0, 0.4])
def test_verlet_matches_tiled_energy_forces(water_tol_system, lam):
    system, x = water_tol_system
    g = {"lambda_sterics": lam, "lambda_electrostatics": lam}
    with jax.enable_x64(True):
        x64 = jnp.asarray(np.asarray(x), jnp.float64)
        box = jnp.asarray(np.asarray(system.box), jnp.float64)
        e_t, f_t = make_force_fn(_efn(system, "tiled"))(x64, box, g)
        e_v, f_v = make_force_fn(_efn(system, "verlet"))(x64, box, g)
        assert float(jnp.abs(e_v - e_t)) / (abs(float(e_t)) + 1.0) < 1e-10
        fdiff = float(jnp.max(jnp.abs(f_v - f_t)))
        assert fdiff / (float(jnp.max(jnp.abs(f_t))) + 1.0) < 1e-10


def test_verlet_build_apply_reuse(water_tol_system):
    """A list built at x stays exact for displacements below skin/2 (every
    pair within the cutoff is still on the list) and poisons beyond."""
    system, x = water_tol_system
    efn_v = _efn(system, "verlet")
    efn_t = _efn(system, "tiled")
    skin = efn_v.nlist_skin
    with jax.enable_x64(True):
        x64 = jnp.asarray(np.asarray(x), jnp.float64)
        box = jnp.asarray(np.asarray(system.box), jnp.float64)
        nlist = efn_v.nlist_build(x64, box)
        assert not bool(nlist["invalid"])
        rng = np.random.default_rng(0)
        # random small displacement: |dx| < skin/2 per atom
        dx = rng.normal(size=x.shape)
        dx *= 0.4 * skin / 2.0 / np.linalg.norm(dx, axis=1, keepdims=True)
        x2 = x64 + jnp.asarray(dx)
        e_nl, f_nl = efn_v.force_with_nlist(nlist, x2, box, None)
        e_t, f_t = make_force_fn(efn_t)(x2, box, None)
        assert float(jnp.abs(e_nl - e_t)) / (abs(float(e_t)) + 1.0) < 1e-10
        assert float(jnp.max(jnp.abs(f_nl - f_t))) / (
            float(jnp.max(jnp.abs(f_t))) + 1.0
        ) < 1e-10
        # past skin/2 the list is stale -> poisoned, never silently wrong.
        # BOTH outputs must poison: the driver's amortized MD path consumes
        # only forces, so clean forces on a stale list would be silently
        # wrong physics that never trips the rollback.
        x3 = x64.at[0].add(jnp.asarray([skin, 0.0, 0.0]))
        e_stale, f_stale = efn_v.force_with_nlist(nlist, x3, box, None)
        assert not np.isfinite(float(e_stale))
        assert not np.all(np.isfinite(np.asarray(f_stale)))


def test_verlet_frozen_fallback(water_tol_system):
    """Frozen systems are ineligible (no row compaction) and silently fall
    back to tiled."""
    system, x = water_tol_system
    lig = system.topology.select_resname("LIG")
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        frozen = system.freeze_radius(np.asarray(x), lig, 0.6, solvent_resnames=())
    box = jnp.asarray(system.box, jnp.float32)
    e_v = _efn(frozen, "verlet", frozen_cull_skin=None)(x, box, None)
    e_t = _efn(frozen, "tiled", frozen_cull_skin=None)(x, box, None)
    assert float(e_v) == pytest.approx(float(e_t), rel=1e-5)


def test_verlet_driver_md(water_tol_system):
    """Full driver iteration with the verlet backend: the MD stage rebuilds
    the list every nlist_rebuild_interval steps and stays finite."""
    from blues_tpu.moves import MoveEngine, RandomLigandRotationMove
    from blues_tpu.simulation import BLUESSimulation, SimulationConfig

    system, x = water_tol_system
    lig = system.topology.select_resname("LIG")
    cfg = SimulationConfig(
        nIter=1, nstepsNC=10, nstepsMD=12, dt=0.001,
        nonbonded_method="PME", cutoff=0.9,
        nonbonded_backend="verlet", nlist_rebuild_interval=5,
    )
    sim = BLUESSimulation(
        system, MoveEngine(RandomLigandRotationMove(lig, system.masses)), cfg
    )
    assert sim._md_nlist is not None  # verlet path actually wired
    sim.initialize(x, key=jax.random.PRNGKey(11))
    sim.minimize(150)
    stats, _, _ = sim.run_iteration()
    assert np.isfinite(float(np.asarray(stats.md_potential)))
    assert not bool(np.asarray(stats.md_failed))
