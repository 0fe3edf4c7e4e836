"""Lambda-split decomposition: E(x, lam) = E0(x) + Ea(x, lam).

The NCMC hot-loop accelerator (potentials/nonbonded.py, integrators/
ncmc.py): the lambda-independent part (non-alchemical pair sum, q_std
reciprocal terms, bonded) is cached across the micro-step boundary where
only lambda changes, so each micro step costs one full kernel pass + two
tiny alchemical evals instead of two full passes. These tests pin the
decomposition exactly against the unsplit energy and the protocol-level
work agreement.
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
def tol_box():
    lig, lig_x = toluene_system()
    system, x = solvated_ligand_box(lig, lig_x, 2500, seed=2)
    lig_idx = system.topology.select_resname("LIG")
    system = system.replace(alchemical=AlchemicalRegion(atoms=lig_idx))
    return system, x


LAMBDAS = [
    {"lambda_sterics": 1.0, "lambda_electrostatics": 1.0},
    {"lambda_sterics": 0.6, "lambda_electrostatics": 0.3},
    {"lambda_sterics": 0.0, "lambda_electrostatics": 0.0},
]


@pytest.mark.parametrize("backend", ["tiled", "cells"])
@pytest.mark.parametrize("treatment", ["direct-space", "coulomb"])
def test_split_decomposition_matches_full(tol_box, treatment, backend):
    system, x = tol_box
    efn = make_energy_fn(
        system, nonbonded_method="PME", cutoff=0.9,
        nonbonded_backend=backend, alchemical_pme_treatment=treatment,
    )
    assert hasattr(efn, "lambda_e0_f0"), f"split not built for {backend}+alchemical"
    ffn = make_force_fn(efn)
    with jax.enable_x64(True):
        x64 = jnp.asarray(np.asarray(x), jnp.float64)
        box = jnp.asarray(np.asarray(system.box), jnp.float64)
        e0, f0 = efn.lambda_e0_f0(x64, box)
        for lam in LAMBDAS:
            ea, fa = efn.lambda_ea_fa(x64, box, lam)
            e_full, f_full = ffn(x64, box, lam)
            assert float(jnp.abs((e0 + ea) - e_full)) < 1e-7, (
                treatment, lam, float(e0 + ea), float(e_full),
            )
            fdiff = float(jnp.max(jnp.abs((f0 + fa) - f_full)))
            assert fdiff < 1e-7, (treatment, lam, fdiff)


def test_split_decomposition_frozen(tol_box):
    """With frozen atoms (the production path: row compaction + culling +
    filtered corrections), the split must still reproduce the full
    potential exactly."""
    import warnings

    system, x = tol_box
    lig = system.topology.select_resname("LIG")
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        frozen = system.freeze_radius(np.asarray(x), lig, 0.6, solvent_resnames=())
    efn = make_energy_fn(
        frozen, nonbonded_method="PME", cutoff=0.9, nonbonded_backend="tiled",
    )
    assert hasattr(efn, "lambda_e0_f0")
    ffn = make_force_fn(efn)
    with jax.enable_x64(True):
        x64 = jnp.asarray(np.asarray(x), jnp.float64)
        box = jnp.asarray(np.asarray(system.box), jnp.float64)
        e0, f0 = efn.lambda_e0_f0(x64, box)
        for lam in LAMBDAS:
            ea, fa = efn.lambda_ea_fa(x64, box, lam)
            e_full, f_full = ffn(x64, box, lam)
            assert float(jnp.abs((e0 + ea) - e_full)) < 1e-6
            assert float(jnp.max(jnp.abs((f0 + fa) - f_full))) < 1e-6


def test_split_protocol_work_matches_unsplit(tol_box):
    """The split protocol's work telescopes identically: with a tiny dt
    (positions barely move) the Kahan work of split vs unsplit protocols
    must agree to f32 energy-difference noise."""
    from blues_tpu.core.state import maxwell_boltzmann_velocities
    from blues_tpu.integrators.constraints import make_constraint_fns
    from blues_tpu.integrators.langevin import LangevinParams
    from blues_tpu.integrators.ncmc import make_ncmc_protocol
    from blues_tpu.integrators.schedules import build_ncmc_schedule
    from blues_tpu.moves import NullMove

    from blues_tpu.integrators.minimize import minimize_fire

    system, x = tol_box
    efn = make_energy_fn(
        system, nonbonded_method="PME", cutoff=0.9, nonbonded_backend="tiled",
    )
    ffn = make_force_fn(efn)
    cx, cv = make_constraint_fns(system.constraints, system.masses)
    params = LangevinParams(dt=1e-7, friction=1.0, temperature=300.0)
    schedule = build_ncmc_schedule(10)
    key = jax.random.PRNGKey(9)
    kv, kp = jax.random.split(key)
    box = jnp.asarray(system.box, jnp.float32)
    # minimize away lattice clashes first: at a clashy config the O(1e6)
    # pair terms make BOTH formulations' f32 work pure cancellation noise
    xj, _ = jax.jit(
        lambda x0: minimize_fire(
            ffn, system.masses, x0, box, n_steps=400, constrain_x=cx
        )
    )(jnp.asarray(x, jnp.float32))
    v = cv(maxwell_boltzmann_velocities(kv, system.masses, 300.0), xj)
    works = {}
    for split in (False, True):
        protocol = make_ncmc_protocol(
            efn, ffn, system.masses, params, cx, cv, schedule,
            move=NullMove(), lambda_split=split,
        )
        res = jax.jit(protocol)(xj, v, box, kp)
        works[split] = float(res.protocol_work)
        assert np.isfinite(works[split])
        assert np.isfinite(float(res.e_initial)) and np.isfinite(float(res.e_final))
    # same schedule, near-identical trajectories at dt=1e-7: the lambda
    # work telescopes to the same value up to f32 rounding of the
    # large-energy differences the split formulation avoids. The UNSPLIT
    # path's noise floor sets the tolerance: each of its ~22 work terms is a
    # difference of full energies whose pair sums pass through O(1e6) kJ/mol
    # partials (water-lattice contacts), i.e. ~0.1 kJ/mol rounding per term,
    # ~0.5-1 kJ/mol accumulated. A real telescoping bug (dropped lambda jump
    # or move term) would be Ea-scale — O(1e2) kJ/mol — far above this.
    assert works[True] == pytest.approx(works[False], abs=2.0), works


def test_split_rejected_for_exact_treatment(tol_box):
    """'exact' scales the reciprocal charges by lambda — the split's
    cached-E0 assumption is invalid and must not be offered."""
    system, x = tol_box
    efn = make_energy_fn(
        system, nonbonded_method="PME", cutoff=0.9,
        nonbonded_backend="tiled", alchemical_pme_treatment="exact",
    )
    assert not hasattr(efn, "lambda_e0_f0")
