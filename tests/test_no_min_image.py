"""The tiled kernel's no-minimum-image matmul-force fast path.

On a culled frozen system satisfying the _no_image_geometry extent
condition, the fast path (raw displacements, forces via
f_i = (x_i - c0) * rowsum(g) - g @ (x_c - c0)) must reproduce the standard
wrapped/einsum path exactly in f64 — same pairs, same formulas, different
contraction order. The standard path is golden-pinned
(tests/test_golden_parity.py), so agreement here pins the fast path too.
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
    # minimize first: stored solvated configs carry LJ overlaps whose huge
    # radial factors dominate force comparisons (CLAUDE.md); production
    # trajectories run from minimized structures
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


def _build(frozen, fast: bool, monkeypatch):
    from blues_tpu.potentials import nonbonded as nbmod

    if not fast:
        monkeypatch.setattr(nbmod, "_no_image_geometry", lambda *a, **k: None)
    efn = make_energy_fn(
        frozen,
        nonbonded_method="PME",
        cutoff=0.65,
        ewald_tolerance=5e-4,
        nonbonded_backend="tiled",
        frozen_cull_skin=0.25,
    )
    return efn


def test_fast_path_matches_standard_f64(frozen_system, monkeypatch):
    frozen, x = frozen_system
    efn_fast = _build(frozen, True, monkeypatch)
    assert efn_fast.nonbonded.no_min_image, "fixture must be extent-eligible"
    efn_std = _build(frozen, False, monkeypatch)
    assert not efn_std.nonbonded.no_min_image

    with jax.enable_x64(True):
        x64 = jnp.asarray(np.asarray(x), jnp.float64)
        box = jnp.asarray(np.asarray(frozen.box), jnp.float64)
        for g in (None, {"lambda_sterics": 0.4, "lambda_electrostatics": 0.4}):
            e0, f0 = make_force_fn(efn_std)(x64, box, g)
            e1, f1 = make_force_fn(efn_fast)(x64, box, g)
            assert np.isfinite(float(e0))
            assert abs(float(e1) - float(e0)) <= 1e-9 * abs(float(e0)), g
            fscale = float(jnp.max(jnp.abs(f0))) + 1.0
            assert float(jnp.max(jnp.abs(f1 - f0))) < 1e-9 * fscale, g

    # lambda-split decomposition agrees too (pair_sum0 shares the fast path)
    with jax.enable_x64(True):
        x64 = jnp.asarray(np.asarray(x), jnp.float64)
        box = jnp.asarray(np.asarray(frozen.box), jnp.float64)
        g = {"lambda_sterics": 0.4, "lambda_electrostatics": 0.4}
        for efn in (efn_fast, efn_std):
            e_split = efn.lambda_e0_f0(x64, box)[0] + efn.lambda_ea_fa(x64, box, g)[0]
            e_full = efn(x64, box, g)
            assert abs(float(e_split) - float(e_full)) <= 1e-9 * abs(float(e_full))


def test_fast_path_f32_forces_track_f64(frozen_system, monkeypatch):
    """f32 force accuracy vs the f64 ground truth. The fast path's
    build-time exclusion masking removes the standard path's
    compute-then-subtract cancellation (excluded bonded pairs pass ~1e7
    kJ/mol partials through f32 on their way to cancellation — measured
    ~20 kJ/mol/nm of residual force error on mobile atoms), so the fast
    path must track f64 MUCH tighter, not merely match the noisy standard
    path."""
    frozen, x = frozen_system
    efn_fast = _build(frozen, True, monkeypatch)
    efn_std = _build(frozen, False, monkeypatch)
    x32 = jnp.asarray(np.asarray(x), jnp.float32)
    box32 = jnp.asarray(np.asarray(frozen.box), jnp.float32)
    with jax.enable_x64(True):
        x64 = jnp.asarray(np.asarray(x), jnp.float64)
        box64 = jnp.asarray(np.asarray(frozen.box), jnp.float64)
        _, f_true = make_force_fn(efn_std)(x64, box64, None)
        f_true = np.asarray(f_true)
    _, f_fast = make_force_fn(efn_fast)(x32, box32, None)
    err_fast = float(np.max(np.abs(np.asarray(f_fast, np.float64) - f_true)))
    assert err_fast < 0.05, err_fast  # measured ~0.004
    _, f_std = make_force_fn(efn_std)(x32, box32, None)
    err_std = float(np.max(np.abs(np.asarray(f_std, np.float64) - f_true)))
    assert err_fast < err_std, (err_fast, err_std)


def test_small_box_falls_back(monkeypatch):
    """A box too small for the extent condition must keep the standard
    wrapped path (flag off), not produce wrong physics."""
    lig, lig_x = toluene_system()
    system, x = solvated_ligand_box(lig, lig_x, 2000, seed=3)
    lig_idx = system.topology.select_resname("LIG")
    system = system.replace(alchemical=AlchemicalRegion(atoms=lig_idx))
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        frozen = system.freeze_radius(np.asarray(x), lig_idx, 0.3)
    efn = make_energy_fn(
        frozen,
        nonbonded_method="PME",
        cutoff=0.9,
        nonbonded_backend="tiled",
        frozen_cull_skin=0.25,
    )
    assert not efn.nonbonded.no_min_image
