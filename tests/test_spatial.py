"""Spatial (atom-dimension) sharding: 8-device agreement with single-device.

The sharded pair sum + replicated rest terms must reproduce the composed
single-device energy and forces (same math, psum'd partials) on the virtual
8-CPU-device mesh (tests/conftest.py). Comparisons run in f64; the residual
tolerance is the f32 floor of the PME reciprocal grid (the spread/FFT are
f32 by design in both paths, and the 1/D-weighted replication re-rounds it).
"""

from functools import partial

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


def test_distributed_slab_fft_recip_matches_replicated():
    """The slab-decomposed reciprocal (psum_scatter -> local FFTs ->
    all_to_all transpose -> sliced influence sum) must reproduce the
    single-device rfftn pipeline — energy AND autodiff forces — on a grid
    divisible by the mesh."""
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P

    from blues_tpu.potentials.nonbonded import PMEParams
    from blues_tpu.potentials.pme import (
        make_pme_reciprocal,
        make_pme_reciprocal_sharded,
    )

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual mesh")
    ndev = 8
    mesh = Mesh(np.asarray(jax.devices()[:ndev]), ("atoms",))
    params = PMEParams(alpha=3.12, grid=(32, 24, 30), order=5)
    ref = make_pme_reciprocal(params)
    dist = make_pme_reciprocal_sharded(params, "atoms", ndev)

    rng = np.random.default_rng(11)
    n = 160
    box_np = np.diag([2.1, 1.9, 2.3])
    x_np = rng.uniform(0, 1.8, (n, 3))
    q_np = rng.normal(0, 0.5, n)
    q_np -= q_np.mean()

    per = n // ndev
    idx = np.arange(n).reshape(ndev, per)

    def worker(x, q, box):
        d = jax.lax.axis_index("atoms")
        i = jnp.asarray(idx)[d]
        g_local = ref.spread_grid(x[i], q[i], box)
        return dist(g_local, box) / ndev

    # check_vma=False: jax 0.9's fft transpose rule drops the varying-axes
    # tag, so grad-through-fft inside shard_map trips the static checker
    # (cotangent "expected unvarying"); the collectives are correct by
    # construction and the assertions below pin values against the
    # single-device path
    @partial(
        jax.shard_map, mesh=mesh, in_specs=(P(), P(), P()), out_specs=(P(), P()),
        check_vma=False,
    )
    def sharded_eg(x, q, box):
        e, g = jax.value_and_grad(worker)(x, q, box)
        return jax.lax.psum(e, "atoms"), jax.lax.psum(g, "atoms")

    with jax.enable_x64(True):
        x = jnp.asarray(x_np, jnp.float64)
        q = jnp.asarray(q_np, jnp.float64)
        box = jnp.asarray(box_np, jnp.float64)
        e0, g0 = jax.value_and_grad(lambda xx: ref(xx, q, box))(x)
        e1, g1 = jax.jit(sharded_eg)(x, q, box)
        # the spread/FFT run f32 by design in both paths; compare at that floor
        assert abs(float(e1) - float(e0)) <= 1e-6 * abs(float(e0)) + 1e-4
        assert float(jnp.max(jnp.abs(g1 - g0))) < 2e-3


def test_sharded_recip_indivisible_grid_raises():
    from blues_tpu.potentials.nonbonded import PMEParams
    from blues_tpu.potentials.pme import make_pme_reciprocal_sharded

    with pytest.raises(ValueError, match="not divisible"):
        make_pme_reciprocal_sharded(
            PMEParams(alpha=3.0, grid=(27, 32, 32), order=5), "atoms", 8
        )


def test_spatial_slab_fft_path_end_to_end(system_x):
    """Full spatial force fn with a mesh-divisible PME grid (32^3 at
    ewald_tolerance 2e-4): the distributed slab-FFT reciprocal must engage
    (asserted via the builder's eligibility rule) and reproduce the
    single-device composed energy/forces."""
    system, x = system_x
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual mesh")
    from blues_tpu.potentials.nonbonded import choose_pme_params

    kw = dict(nonbonded_method="PME", cutoff=0.9, ewald_tolerance=2e-4)
    grid = choose_pme_params(
        np.diag(np.asarray(system.box)), 0.9, 2e-4
    ).grid
    assert grid[0] % 8 == 0 and grid[1] % 8 == 0, grid  # slab path engages
    mesh = Mesh(np.asarray(jax.devices()[:8]), ("atoms",))
    ref = make_force_fn(make_energy_fn(system, nonbonded_backend="tiled", **kw))
    sp = make_spatial_force_fn(system, mesh, **kw)
    with jax.enable_x64(True):
        x64 = jnp.asarray(np.asarray(x), jnp.float64)
        box = jnp.asarray(np.asarray(system.box), jnp.float64)
        g = {"lambda_sterics": 0.6, "lambda_electrostatics": 0.6}
        e0, f0 = ref(x64, box, g)
        e1, f1 = jax.jit(sp)(x64, box, g)
        assert abs(float(e1) - float(e0)) <= 1e-7 * abs(float(e0)) + 1e-3
        assert float(jnp.max(jnp.abs(f1 - f0))) < 2e-3
