"""The VMEM-accumulator Pallas sweep kernel (culled frozen pair sweep).

Agreement pins on a culled frozen system (the production pair space,
reference freeze_radius protocol blues/simulation.py:394-480):

  * full-path energy+forces vs the golden-pinned tiled backend (identical
    shared potentials.pairs formulas; both f32 with build-time exclusion
    masking, so agreement is at f32 summation-order noise);
  * the lambda-split pieces (pair_sum0 / ea sweep with column reaction
    forces) against tiled's split;
  * vmap consistency: the replica-batched kernel must match per-replica
    single calls bitwise-close (guards the program_id-under-vmap hazard the
    marker operand exists for — jax.vmap PREPENDS a grid dimension).

Runs in Pallas interpret mode on CPU (tests/conftest.py); the same code
compiles through Mosaic on TPU.
"""

import warnings

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from blues_tpu.core.build import solvated_ligand_box
from blues_tpu.core.system import AlchemicalRegion
from blues_tpu.ligands import toluene_system
from blues_tpu.potentials.energy import make_energy_fn, make_force_fn


@pytest.fixture(scope="module")
def frozen_system():
    lig, lig_x = toluene_system()
    system, x = solvated_ligand_box(lig, lig_x, 6500, seed=5)
    lig_idx = system.topology.select_resname("LIG")
    system = system.replace(alchemical=AlchemicalRegion(atoms=lig_idx))
    from blues_tpu.integrators.minimize import minimize_fire

    efn_u = make_energy_fn(
        system, nonbonded_method="PME", cutoff=0.65, nonbonded_backend="tiled"
    )
    x = np.asarray(
        jax.jit(
            lambda y: minimize_fire(
                make_force_fn(efn_u), system.masses, y,
                jnp.asarray(system.box, jnp.float32), n_steps=200,
            )[0]
        )(jnp.asarray(x, jnp.float32))
    )
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        frozen = system.freeze_radius(np.asarray(x), lig_idx, 0.3)
    return frozen, x


def _build(frozen, backend):
    return make_energy_fn(
        frozen,
        nonbonded_method="PME",
        cutoff=0.65,
        ewald_tolerance=5e-4,
        nonbonded_backend=backend,
        frozen_cull_skin=0.25,
    )


def test_sweep_matches_tiled_f32(frozen_system):
    frozen, x = frozen_system
    efn_s = _build(frozen, "sweep")
    efn_t = _build(frozen, "tiled")
    assert efn_s.nonbonded.backend == "sweep"
    assert efn_s.nonbonded.cull_info is not None, "culling must engage"
    x32 = jnp.asarray(np.asarray(x), jnp.float32)
    box = jnp.asarray(np.asarray(frozen.box), jnp.float32)
    for g in (None, {"lambda_sterics": 0.4, "lambda_electrostatics": 0.4}):
        e_t, f_t = make_force_fn(efn_t)(x32, box, g)
        e_s, f_s = make_force_fn(efn_s)(x32, box, g)
        assert np.isfinite(float(e_t))
        assert abs(float(e_s) - float(e_t)) <= 5e-5 * abs(float(e_t)) + 1e-2, g
        fscale = float(jnp.max(jnp.abs(f_t))) + 1.0
        assert float(jnp.max(jnp.abs(f_s - f_t))) < 2e-5 * fscale, (
            g, float(jnp.max(jnp.abs(f_s - f_t))), fscale,
        )


def test_sweep_lambda_split_consistent(frozen_system):
    """E0 + Ea == full energy, and the split forces (cached-E0 + Ea path the
    NCMC integrator runs) match the full path's forces."""
    frozen, x = frozen_system
    efn = _build(frozen, "sweep")
    x32 = jnp.asarray(np.asarray(x), jnp.float32)
    box = jnp.asarray(np.asarray(frozen.box), jnp.float32)
    g = {"lambda_sterics": 0.4, "lambda_electrostatics": 0.4}
    e0, f0 = efn.lambda_e0_f0(x32, box)
    ea, fa = efn.lambda_ea_fa(x32, box, g)
    e_full, f_full = make_force_fn(efn)(x32, box, g)
    assert abs(float(e0 + ea) - float(e_full)) <= 5e-5 * abs(float(e_full)) + 1e-2
    fscale = float(jnp.max(jnp.abs(f_full))) + 1.0
    assert float(jnp.max(jnp.abs((f0 + fa) - f_full))) < 2e-5 * fscale
    # the ea piece must carry reaction forces on mobile non-alch atoms
    # (the dense NA block differentiates through the gathered columns)
    efn_t = _build(frozen, "tiled")
    ea_t, fa_t = efn_t.lambda_ea_fa(x32, box, g)
    assert abs(float(ea) - float(ea_t)) <= 5e-5 * abs(float(ea_t)) + 1e-2
    fascale = float(jnp.max(jnp.abs(fa_t))) + 1.0
    assert float(jnp.max(jnp.abs(fa - fa_t))) < 2e-5 * fascale


def test_sweep_vmap_matches_single(frozen_system):
    frozen, x = frozen_system
    efn = _build(frozen, "sweep")
    ffn = make_force_fn(efn)
    box = jnp.asarray(np.asarray(frozen.box), jnp.float32)
    g = {"lambda_sterics": 0.6, "lambda_electrostatics": 0.6}
    rng = np.random.default_rng(2)
    mobile = np.asarray(frozen.masses) > 0
    R = 3
    xs = np.repeat(np.asarray(x, np.float32)[None], R, axis=0)
    # jitter mobile atoms per replica (stay inside the culling balls)
    xs[:, mobile] += 0.002 * rng.standard_normal((R, int(mobile.sum()), 3)).astype(
        np.float32
    )
    xs = jnp.asarray(xs)
    ev, fv = jax.vmap(lambda xx: ffn(xx, box, g))(xs)
    for r in range(R):
        e1, f1 = ffn(xs[r], box, g)
        assert float(ev[r]) == pytest.approx(float(e1), rel=1e-6), r
        assert float(jnp.max(jnp.abs(fv[r] - f1))) < 1e-4, r
    # and the ea sweep (col_forces output) under vmap
    eav, fav = jax.vmap(lambda xx: efn.lambda_ea_fa(xx, box, g))(xs)
    for r in range(R):
        ea1, fa1 = efn.lambda_ea_fa(xs[r], box, g)
        assert float(eav[r]) == pytest.approx(float(ea1), rel=1e-6), r
        assert float(jnp.max(jnp.abs(fav[r] - fa1))) < 1e-4, r


def test_sweep_cull_guard_poisons(frozen_system):
    """A mobile atom leaving its permanent reach ball must poison energy
    AND forces to NaN (driver NaN -> reject; never silently wrong)."""
    frozen, x = frozen_system
    efn = _build(frozen, "sweep")
    ffn = make_force_fn(efn)
    box = jnp.asarray(np.asarray(frozen.box), jnp.float32)
    rows, centers, radii = efn.nonbonded.cull_bounds
    xbad = np.array(x, np.float32)
    xbad[rows[0]] = centers[0] + (radii[0] + 1.0)
    e, f = ffn(jnp.asarray(xbad), box, None)
    assert not np.isfinite(float(e))
    assert not np.all(np.isfinite(np.asarray(f)))


def test_large_alchemical_region_falls_back_to_dense_ea(frozen_system):
    """r4 review fix: alchemical regions of 129-512 atoms previously
    crashed the sweep build (the EA sweep requires a single 128-row tile
    for column reaction forces). They must now build with the dense NA
    block serving Ea, and the split must still reconstruct the full
    energy: E(x, lam) == E0(x) + Ea(x, lam)."""
    frozen, x = frozen_system
    big = frozen.replace(
        alchemical=AlchemicalRegion(atoms=np.arange(150, dtype=np.int64))
    )
    efn = _build(big, "sweep")  # crashed before the <=128 gate
    assert efn.lambda_e0_f0 is not None and efn.lambda_ea_fa is not None
    xj = jnp.asarray(x, jnp.float32)
    box = jnp.asarray(big.box, jnp.float32)
    g = {"lambda_sterics": 0.7, "lambda_electrostatics": 0.4}
    e_full = float(jax.jit(efn)(xj, box, g))
    e0, _ = jax.jit(efn.lambda_e0_f0)(xj, box)
    ea, _ = jax.jit(lambda a, b, c: efn.lambda_ea_fa(a, b, c))(xj, box, g)
    assert np.isfinite(e_full)
    assert e_full == pytest.approx(float(e0) + float(ea), abs=2e-3 * abs(e_full) + 1.0)
