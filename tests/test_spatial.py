"""Spatial (atom-dimension) sharding: 8-device agreement with single-device.

The sharded pair sum + replicated rest terms must reproduce the composed
single-device energy and forces (same math, psum'd partials) on the virtual
8-CPU-device mesh (tests/conftest.py). Comparisons run in f64; the residual
tolerance is the f32 floor of the PME reciprocal grid (the spread/FFT are
f32 by design in both paths, and the 1/D-weighted replication re-rounds it).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from blues_tpu.core.build import solvated_ligand_box
from blues_tpu.core.system import AlchemicalRegion
from blues_tpu.ligands import toluene_system
from blues_tpu.parallel.spatial import make_spatial_force_fn
from blues_tpu.potentials.energy import make_energy_fn, make_force_fn


@pytest.fixture(scope="module")
def system_x():
    lig, lig_x = toluene_system()
    system, x = solvated_ligand_box(lig, lig_x, 2000, seed=3)
    lig_idx = system.topology.select_resname("LIG")
    system = system.replace(alchemical=AlchemicalRegion(atoms=lig_idx))
    return system, x


def test_spatial_matches_single_device(system_x):
    system, x = system_x
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual mesh")
    mesh = Mesh(np.asarray(jax.devices()[:8]), ("atoms",))
    kw = dict(nonbonded_method="PME", cutoff=0.9)
    ref = make_force_fn(make_energy_fn(system, nonbonded_backend="tiled", **kw))
    sp = make_spatial_force_fn(system, mesh, **kw)
    with jax.enable_x64(True):
        x64 = jnp.asarray(np.asarray(x), jnp.float64)
        box = jnp.asarray(np.asarray(system.box), jnp.float64)
        for lam in (1.0, 0.35):
            g = {"lambda_sterics": lam, "lambda_electrostatics": lam}
            e0, f0 = ref(x64, box, g)
            e1, f1 = jax.jit(sp)(x64, box, g)
            assert abs(float(e1) - float(e0)) <= 1e-7 * abs(float(e0)) + 1e-3, lam
            assert float(jnp.max(jnp.abs(f1 - f0))) < 2e-3, lam


def test_spatial_frozen_rows(system_x):
    """Row sharding composes with frozen-row compaction: shards split the
    compacted row set, the frozen-frozen constant is dropped identically."""
    system, x = system_x
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual mesh")
    import warnings

    lig = system.topology.select_resname("LIG")
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        frozen = system.freeze_radius(np.asarray(x), lig, 0.5, solvent_resnames=())
    mesh = Mesh(np.asarray(jax.devices()[:8]), ("atoms",))
    kw = dict(nonbonded_method="PME", cutoff=0.9)
    ref = make_force_fn(
        make_energy_fn(frozen, nonbonded_backend="tiled", frozen_cull_skin=None, **kw)
    )
    sp = make_spatial_force_fn(frozen, mesh, **kw)
    with jax.enable_x64(True):
        x64 = jnp.asarray(np.asarray(x), jnp.float64)
        box = jnp.asarray(np.asarray(system.box), jnp.float64)
        e0, f0 = ref(x64, box, None)
        e1, f1 = jax.jit(sp)(x64, box, None)
        assert abs(float(e1) - float(e0)) <= 1e-7 * abs(float(e0)) + 1e-3
        mobile = np.where(frozen.masses > 0)[0]
        assert float(jnp.max(jnp.abs(f1[mobile] - f0[mobile]))) < 2e-3
