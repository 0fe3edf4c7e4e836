"""Cell-list backend: agreement with the tiled O(N^2) reference backend.

The cell list is a pure acceleration structure — for any configuration
whose pairs all fit the grid, energies and forces must match the tiled
backend to f32 roundoff. Also covers: alchemical lambda scaling, frozen-row
compaction, NPT-shrink poisoning, and the auto-backend eligibility fallback.
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


@pytest.mark.parametrize("lam", [1.0, 0.5, 0.0])
def test_cells_match_tiled_energy_forces(water_tol_system, lam):
    """f64 comparison: the cell list is pure bookkeeping, so agreement must
    be at roundoff (the unminimized lattice box has ~1e7 clash forces that
    amplify f32 summation-order noise past any useful f32 tolerance)."""
    system, x = water_tol_system
    g = {"lambda_sterics": lam, "lambda_electrostatics": lam}
    with jax.enable_x64(True):
        x64 = jnp.asarray(np.asarray(x), jnp.float64)
        box = jnp.asarray(np.asarray(system.box), jnp.float64)
        e_t, f_t = make_force_fn(_efn(system, "tiled"))(x64, box, g)
        e_c, f_c = make_force_fn(_efn(system, "cells"))(x64, box, g)
        assert float(jnp.abs(e_c - e_t)) / (abs(float(e_t)) + 1.0) < 1e-10
        fdiff = float(jnp.max(jnp.abs(f_c - f_t)))
        assert fdiff / (float(jnp.max(jnp.abs(f_t))) + 1.0) < 1e-10


def test_cells_match_with_frozen_rows(water_tol_system):
    system, x = water_tol_system
    lig = system.topology.select_resname("LIG")
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        frozen = system.freeze_radius(np.asarray(x), lig, 0.6, solvent_resnames=())
    with jax.enable_x64(True):
        x64 = jnp.asarray(np.asarray(x), jnp.float64)
        box = jnp.asarray(np.asarray(system.box), jnp.float64)
        e_t, f_t = make_force_fn(_efn(frozen, "tiled"))(x64, box, None)
        e_c, f_c = make_force_fn(_efn(frozen, "cells"))(x64, box, None)
        assert float(jnp.abs(e_c - e_t)) / (abs(float(e_t)) + 1.0) < 1e-10
        assert (
            float(jnp.max(jnp.abs(f_c - f_t)))
            / (float(jnp.max(jnp.abs(f_t))) + 1.0)
            < 1e-10
        )


def test_half_neighborhood_matches_full(water_tol_system):
    """Newton's-third-law variant (kept for the future Pallas neighbor
    kernel): one visit per pair + two-sided force scatter must equal the
    both-sides sweep at f64 roundoff."""
    from blues_tpu.potentials.cells import make_cell_pair_sum
    from blues_tpu.potentials.tiled import build_pair_features

    system, x = water_tol_system
    nb = system.nonbonded
    n = system.n_atoms
    is_alch = np.zeros(n, bool)
    is_alch[np.asarray(system.alchemical.atoms)] = True
    feats = build_pair_features(
        np.asarray(nb.charge), nb.sigma, nb.epsilon, is_alch, None
    )
    kw = dict(method="PME", cutoff=0.9, alpha_ewald=3.0, k_rf=0.0, c_rf=0.0,
              annihilate_sterics=False, box0=np.asarray(system.box))
    with jax.enable_x64(True):
        x64 = jnp.asarray(np.asarray(x), jnp.float64)
        box = jnp.asarray(np.asarray(system.box), jnp.float64)
        one = jnp.asarray(1.0, jnp.float64)
        e_f, ff = make_cell_pair_sum(feats, **kw)(x64, box, one, one, one)
        e_h, fh = make_cell_pair_sum(feats, half_neighborhood=True, **kw)(
            x64, box, one, one, one
        )
        assert float(jnp.abs(e_h - e_f)) / (abs(float(e_f)) + 1.0) < 1e-10
        assert float(jnp.max(jnp.abs(fh - ff))) / (
            float(jnp.max(jnp.abs(ff))) + 1.0
        ) < 1e-10


def test_cells_poison_on_shrunken_box(water_tol_system):
    system, x = water_tol_system
    box = jnp.asarray(system.box, jnp.float32)
    efn = _efn(system, "cells")
    # shrinking the box below grid validity must poison, not silently drop.
    # BOTH energy AND forces: the MD driver consumes only forces, so a
    # clean-force return would be silently wrong physics that never trips
    # the rollback (same invariant as the verlet staleness poison).
    from blues_tpu.potentials.energy import make_force_fn

    e_bad, f_bad = make_force_fn(efn)(x * 0.5, box * 0.5, None)
    assert not np.isfinite(float(e_bad))
    assert not np.all(np.isfinite(np.asarray(f_bad)))


def test_cull_guard_poisons_forces():
    """A violated culling reach ball must poison FORCES as well as energy
    (the MD stage discards per-step energies)."""
    import os

    DATA = "/root/reference/blues/tests/data"
    if not os.path.isdir(DATA):
        pytest.skip("no reference data")
    import warnings

    from blues_tpu.core.amber_coords import load_inpcrd
    from blues_tpu.core.prmtop import load_prmtop
    from blues_tpu.core.system import AlchemicalRegion
    from blues_tpu.potentials.energy import make_energy_fn, make_force_fn

    system = load_prmtop(f"{DATA}/watDivaline.prmtop")
    crd = load_inpcrd(f"{DATA}/watDivaline.inpcrd")
    system = system.replace(box=crd.box)
    val = system.topology.select_resname("VAL")
    system = system.replace(alchemical=AlchemicalRegion(atoms=val[:16]))
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        frozen = system.freeze_radius(np.asarray(crd.positions), val[:16], 0.3)
    efn = make_energy_fn(
        frozen, nonbonded_method="PME", cutoff=0.6,
        nonbonded_backend="tiled", frozen_cull_skin=0.25,
        frozen_cull_cage_margin=0.3,
    )
    assert efn.nonbonded.cull_info is not None
    mobile = np.where(np.asarray(frozen.masses) > 0)[0]
    is_alch = np.zeros(system.n_atoms, bool)
    is_alch[val[:16]] = True
    mob_nonalch = mobile[~is_alch[mobile]]
    x3 = np.array(crd.positions)
    x3[mob_nonalch[0]] += 1.0  # far outside its permanent reach ball
    box = jnp.asarray(crd.box, jnp.float32)
    e_bad, f_bad = make_force_fn(efn)(jnp.asarray(x3, jnp.float32), box, None)
    assert not np.isfinite(float(e_bad))
    assert not np.all(np.isfinite(np.asarray(f_bad)))


def test_cells_auto_fallback_small_box():
    """A box too small for a 3x3x3 grid silently falls back to tiled."""
    import os

    DATA = "/root/reference/blues/tests/data"
    if not os.path.isdir(DATA):
        pytest.skip("no reference data")
    from blues_tpu.core.amber_coords import load_inpcrd
    from blues_tpu.core.prmtop import load_prmtop

    system = load_prmtop(f"{DATA}/TOL-parm.prmtop")
    crd = load_inpcrd(f"{DATA}/TOL-parm.inpcrd")
    system = system.replace(box=crd.box)
    x = jnp.asarray(crd.positions, jnp.float32)
    box = jnp.asarray(crd.box, jnp.float32)
    e_cells = _efn(system, "cells")(x, box, None)  # falls back internally
    e_tiled = _efn(system, "tiled")(x, box, None)
    assert float(e_cells) == pytest.approx(float(e_tiled), rel=1e-6)
