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


def _build_grouped(frozen, group):
    return make_energy_fn(
        frozen,
        nonbonded_method="PME",
        cutoff=0.65,
        ewald_tolerance=5e-4,
        nonbonded_backend="sweep",
        frozen_cull_skin=0.25,
        sweep_row_group=group,
    )


def test_grouped_sweep_matches_ungrouped(frozen_system):
    """Per-row-group column culling (sweep_row_group) computes a strict
    SUBSET of pair slots — every runtime-reachable pair must still be
    covered, so energies/forces must match the shared-column layout at f32
    summation-order noise, at every lambda and for the split pieces."""
    frozen, x = frozen_system
    efn_u = _build(frozen, "sweep")
    x32 = jnp.asarray(np.asarray(x), jnp.float32)
    box = jnp.asarray(np.asarray(frozen.box), jnp.float32)
    for group in (8, 16):
        efn_g = _build_grouped(frozen, group)
        assert efn_g.nonbonded.backend == "sweep"
        for g in (None, {"lambda_sterics": 0.4, "lambda_electrostatics": 0.4}):
            e_u, f_u = make_force_fn(efn_u)(x32, box, g)
            e_g, f_g = make_force_fn(efn_g)(x32, box, g)
            assert abs(float(e_g) - float(e_u)) <= 5e-5 * abs(float(e_u)) + 1e-2, (
                group, g,
            )
            fscale = float(jnp.max(jnp.abs(f_u))) + 1.0
            assert float(jnp.max(jnp.abs(f_g - f_u))) < 2e-5 * fscale, (group, g)
        # the lambda-split pieces the NCMC hot loop runs
        gl = {"lambda_sterics": 0.3, "lambda_electrostatics": 0.6}
        e0u, f0u = efn_u.lambda_e0_f0(x32, box)
        e0g, f0g = efn_g.lambda_e0_f0(x32, box)
        assert abs(float(e0g) - float(e0u)) <= 5e-5 * abs(float(e0u)) + 1e-2, group
        fscale = float(jnp.max(jnp.abs(f0u))) + 1.0
        assert float(jnp.max(jnp.abs(f0g - f0u))) < 2e-5 * fscale, group
        eau, fau = efn_u.lambda_ea_fa(x32, box, gl)
        eag, fag = efn_g.lambda_ea_fa(x32, box, gl)
        assert abs(float(eag) - float(eau)) <= 5e-5 * abs(float(eau)) + 1e-2, group
        fascale = float(jnp.max(jnp.abs(fau))) + 1.0
        assert float(jnp.max(jnp.abs(fag - fau))) < 2e-5 * fascale, group


def test_grouped_sweep_vmap_matches_single(frozen_system):
    """Replica batching over the grouped layout: vmap prepends a grid
    dimension; the per-group F_FIRST init flags and padding-tile gates are
    data-baked, so batched results must match per-replica calls."""
    frozen, x = frozen_system
    efn = _build_grouped(frozen, 8)
    ffn = make_force_fn(efn)
    box = jnp.asarray(np.asarray(frozen.box), jnp.float32)
    g = {"lambda_sterics": 0.6, "lambda_electrostatics": 0.6}
    rng = np.random.default_rng(7)
    mobile = np.asarray(frozen.masses) > 0
    R = 3
    xs = np.repeat(np.asarray(x, np.float32)[None], R, axis=0)
    xs[:, mobile] += 0.002 * rng.standard_normal((R, int(mobile.sum()), 3)).astype(
        np.float32
    )
    xs = jnp.asarray(xs)
    ev, fv = jax.vmap(lambda xx: ffn(xx, box, g))(xs)
    for r in range(R):
        e1, f1 = ffn(xs[r], box, g)
        assert float(ev[r]) == pytest.approx(float(e1), rel=1e-6), r
        assert float(jnp.max(jnp.abs(fv[r] - f1))) < 1e-4, r


def test_grouped_layout_unit():
    """Direct unit check of make_sweep_pair_sum(groups=...): a synthetic
    pair space where groups genuinely shrink the column storage, pinned
    against the ungrouped layout (same kernel, different BlockSpecs), with
    an exclusion whose partner must be force-included by the caller."""
    from blues_tpu.potentials.pallas.sweep_kernel import (
        build_row_groups,
        make_sweep_pair_sum,
    )

    rng = np.random.default_rng(3)
    n = 600
    x0 = rng.uniform(0.0, 3.0, (n, 3))
    rows = np.arange(0, 32, dtype=np.int64)
    x0[rows] = rng.uniform(1.2, 1.8, (len(rows), 3))  # mobile cluster
    cols = np.arange(n, dtype=np.int64)
    centers = x0[rows].copy()
    radii = np.full(len(rows), 0.15)
    per_atom = dict(
        q_std=rng.uniform(-0.5, 0.5, n),
        q_alch=np.zeros(n),
        sigma=np.full(n, 0.3),
        epsilon=np.full(n, 0.4),
        alch=np.zeros(n),
        in_rows=np.isin(np.arange(n), rows).astype(np.float64),
    )
    excl = np.zeros((len(rows), n), bool)
    excl[0, 599] = True  # far-away excluded partner: must be force-included
    common = dict(
        n_atoms=n, method="CutoffNonPeriodic", cutoff=0.55, alpha_ewald=0.0,
        k_rf=0.0, c_rf=0.0, annihilate_sterics=True, periodic=False,
    )
    ps_u = make_sweep_pair_sum(
        row_gid=rows, col_gid=cols, per_atom=per_atom, excl_mask=excl, **common
    )
    groups = build_row_groups(
        rows=rows, centers=centers, radii=radii, cols=cols, ref_positions=x0,
        box_lengths=None, cutoff=0.55, group_size=8, excl_mask=excl,
    )
    assert any(599 in cols[np.asarray(cs)] for _, cs in groups)
    ps_g = make_sweep_pair_sum(
        row_gid=rows, col_gid=cols, per_atom=per_atom, excl_mask=excl,
        groups=groups, **common,
    )
    assert ps_g.shape_info["n_groups"] == len(groups)
    assert ps_g.shape_info["compute_slots"] < ps_u.shape_info["compute_slots"]
    xj = jnp.asarray(x0, jnp.float32)
    args = (xj, None, jnp.float32(1.0), jnp.float32(1.0), jnp.float32(1.0))
    e_u, f_u = ps_u(*args)
    e_g, f_g = ps_g(*args)
    assert float(e_u) == pytest.approx(float(e_g), rel=1e-5)
    assert float(jnp.max(jnp.abs(f_u - f_g))) < 1e-4 * (
        float(jnp.max(jnp.abs(f_u))) + 1.0
    )
