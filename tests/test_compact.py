"""Mobile-state compaction (simulation/compact.py + driver integration).

Key exactness property: when the mobile subset is a PREFIX of the atom
array (mobile_idx == arange(M)), threefry draws for the compacted
(M, 3)-shaped noise are bit-identical to the first M rows of the full
(N, 3) draws, so the compacted driver must reproduce the full driver's
trajectories and work values BITWISE. The 2000-atom fixture frozen at
radius 0.3 leaves exactly the ligand (atoms 0-14) mobile, which realizes
that case. Slice-agreement tests pin the adapters themselves for the
general (non-prefix) case.
"""

import warnings

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from blues_tpu.core.build import solvated_ligand_box
from blues_tpu.core.system import AlchemicalRegion
from blues_tpu.ligands import toluene_system
from blues_tpu.moves import MoveEngine, RandomLigandRotationMove
from blues_tpu.simulation import BLUESSimulation, SimulationConfig
from blues_tpu.simulation.compact import build_mobile_compaction


@pytest.fixture(scope="module")
def frozen_prefix():
    """Frozen system whose mobile set is the ligand prefix (atoms 0-14)."""
    lig, lig_x = toluene_system()
    system, x = solvated_ligand_box(lig, lig_x, 2000, seed=3)
    lig_idx = system.topology.select_resname("LIG")
    system = system.replace(alchemical=AlchemicalRegion(atoms=lig_idx))
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        frozen = system.freeze_radius(np.asarray(x), lig_idx, 0.3)
    assert np.array_equal(
        np.where(np.asarray(frozen.masses) > 0)[0], np.arange(len(lig_idx))
    )
    return frozen, np.asarray(x), lig_idx


def _cfg(**kw):
    base = dict(
        nIter=3, nstepsNC=10, nstepsMD=10, temperature=300.0, dt=0.002,
        moveStep=5, nonbonded_method="PME", cutoff=0.65,
        nonbonded_backend="tiled", frozen_cull_skin=0.25,
    )
    base.update(kw)
    return SimulationConfig(**base)


def _run(sim, x, n=3, seed=11):
    sim.initialize(np.asarray(x), key=jax.random.PRNGKey(seed))
    out = []
    for _ in range(n):
        stats = sim.run_iteration()[0]
        out.append(
            (float(stats.protocol_work), float(stats.accepted),
             float(stats.md_potential))
        )
    return out, np.asarray(sim.state.positions)


def test_prefix_mobile_bitwise_identity(frozen_prefix):
    """Compact on vs off: identical work/acceptance/MD energies and final
    positions when the mobile set is a prefix (same RNG stream)."""
    frozen, x, lig_idx = frozen_prefix
    move = lambda: MoveEngine(RandomLigandRotationMove(lig_idx, frozen.masses))
    sim_c = BLUESSimulation(frozen, move(), _cfg(frozen_compact="auto"))
    sim_f = BLUESSimulation(frozen, move(), _cfg(frozen_compact=False))
    assert sim_c._compact is not None and sim_f._compact is None
    out_c, x_c = _run(sim_c, x)
    out_f, x_f = _run(sim_f, x)
    assert out_c == out_f, (out_c, out_f)
    np.testing.assert_array_equal(x_c, x_f)


def test_segmented_compact_matches_monolithic(frozen_prefix):
    """Segmented dispatch with compaction == monolithic with compaction
    (same RNG threading), and frozen coordinates never move."""
    frozen, x, lig_idx = frozen_prefix
    move = lambda: MoveEngine(RandomLigandRotationMove(lig_idx, frozen.masses))
    sim_m = BLUESSimulation(frozen, move(), _cfg(frozen_compact="auto"))
    sim_s = BLUESSimulation(
        frozen, move(), _cfg(frozen_compact="auto", max_steps_per_dispatch=4)
    )
    assert sim_s._compact is not None
    out_m, x_m = _run(sim_m, x, n=2)
    out_s, x_s = _run(sim_s, x, n=2)
    for (wm, am, em), (ws, a_s, es) in zip(out_m, out_s):
        assert wm == pytest.approx(ws, abs=2e-3), (wm, ws)
        assert am == a_s
    frz = np.asarray(frozen.masses) == 0
    np.testing.assert_allclose(x_s[frz], np.asarray(x)[frz], atol=5e-7)


def test_adapter_slice_agreement(frozen_prefix):
    """efn_m/ffn_m reproduce the full path exactly (f64)."""
    from blues_tpu.potentials.energy import make_energy_fn, make_force_fn

    frozen, x, lig_idx = frozen_prefix
    efn = make_energy_fn(
        frozen, nonbonded_method="PME", cutoff=0.65,
        nonbonded_backend="tiled", frozen_cull_skin=0.25,
    )
    ffn = make_force_fn(efn)
    comp = build_mobile_compaction(frozen, efn, ffn, None)
    assert comp is not None
    mob = comp.mobile_idx
    with jax.enable_x64(True):
        x64 = jnp.asarray(x, jnp.float64)
        box = jnp.asarray(np.asarray(frozen.box), jnp.float64)
        g = {"lambda_sterics": 0.5, "lambda_electrostatics": 0.5}
        # perturb mobile coords so the test is not at the reference frame
        xm = x64[jnp.asarray(mob)] + 0.003
        e_full, f_full = ffn(x64.at[jnp.asarray(mob)].set(xm), box, g)
        e_m, f_m = comp.ffn_m(xm, box, g)
        # frozen entries come from the f32 baked frame in the adapter;
        # mobile coordinates are exact, so agreement is at the f32 floor of
        # the frozen coordinates' contribution
        assert abs(float(e_m) - float(e_full)) <= 1e-6 * abs(float(e_full))
        assert float(jnp.max(jnp.abs(f_m - f_full[jnp.asarray(mob)]))) < 2e-3


def test_move_remap_equivalence(frozen_prefix):
    """A remapped rotation proposes the same geometry (same key)."""
    frozen, x, lig_idx = frozen_prefix
    from blues_tpu.simulation.compact import _remap_move

    masses = np.asarray(frozen.masses)
    mob = np.where(masses > 0)[0]
    mapping = np.full(frozen.n_atoms, -1, np.int64)
    mapping[mob] = np.arange(len(mob))
    move = RandomLigandRotationMove(lig_idx, frozen.masses)
    move_m, ok = _remap_move(move, mapping, masses[mob], mob)
    assert ok
    key = jax.random.PRNGKey(7)
    xj = jnp.asarray(x, jnp.float32)
    box = jnp.asarray(frozen.box, jnp.float32)
    x_new, _ = move.propose(key, xj, box, None)
    xm_new, _ = move_m.propose(key, xj[jnp.asarray(mob)], box, None)
    np.testing.assert_array_equal(np.asarray(xm_new), np.asarray(x_new)[mob])


def test_teleporting_move_ineligible(frozen_prefix):
    frozen, x, lig_idx = frozen_prefix
    from blues_tpu.moves.base import Move

    class Teleporter(Move):
        teleports = True

    comp = build_mobile_compaction(
        frozen, lambda *a: 0, lambda *a: (0, 0), Teleporter()
    )
    assert comp is None


def test_compact_true_raises_on_unfrozen():
    lig, lig_x = toluene_system()
    system, x = solvated_ligand_box(lig, lig_x, 600, seed=1)
    lig_idx = system.topology.select_resname("LIG")
    with pytest.raises(ValueError, match="frozen_compact"):
        BLUESSimulation(
            system,
            MoveEngine(RandomLigandRotationMove(lig_idx, system.masses)),
            _cfg(frozen_compact=True, cutoff=0.6),
        )
