"""Backend agreement: dense vs tiled vs pallas(interpret) nonbonded.

All three backends share potentials.pairs formulas; this asserts the
full pipelines (pair sum + exclusions + exceptions + PME extras) agree to
f32 rounding on a real solvated system with an alchemical region.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from blues_tpu.core.amber_coords import load_inpcrd
from blues_tpu.core.prmtop import load_prmtop
from blues_tpu.core.system import AlchemicalRegion
from blues_tpu.potentials.nonbonded import make_nonbonded_energy
from blues_tpu.potentials.pairs import erfc_approx

DATA = "/root/reference/blues/tests/data"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(DATA), reason="reference Amber data not available"
)


@pytest.fixture(scope="module")
def tol_system():
    system = load_prmtop(f"{DATA}/TOL-parm.prmtop")
    crd = load_inpcrd(f"{DATA}/TOL-parm.inpcrd")
    lig = system.topology.select_resname("LIG")
    system = system.replace(alchemical=AlchemicalRegion(atoms=lig))
    return system, crd


def test_erfc_approx_accuracy():
    from scipy.special import erfc as scipy_erfc

    x = np.linspace(0, 6, 500)
    # tests run f32 (A&S 7.1.26 is 1.4e-7 exact; f32 rounding adds ~3e-7)
    ours = np.asarray(erfc_approx(jnp.asarray(x, jnp.float32)))
    assert np.max(np.abs(ours - scipy_erfc(x))) < 7e-7


@pytest.mark.parametrize("treatment", ["direct-space", "coulomb", "exact"])
@pytest.mark.parametrize("other", ["tiled", "pallas"])
def test_backend_agreement(tol_system, treatment, other):
    system, crd = tol_system
    x = jnp.asarray(crd.positions, jnp.float32)
    box = jnp.asarray(crd.box, jnp.float32)
    kw = dict(
        method="PME",
        cutoff=0.9,
        alchemical=system.alchemical,
        alchemical_pme_treatment=treatment,
        box_for_pme=np.asarray(box),
    )
    ref_fn = make_nonbonded_energy(system.nonbonded, backend="dense", **kw)
    fn = make_nonbonded_energy(system.nonbonded, backend=other, **kw)
    for lam in (
        {"lambda_sterics": 1.0, "lambda_electrostatics": 1.0},
        {"lambda_sterics": 0.4, "lambda_electrostatics": 0.1},
    ):
        e0 = float(ref_fn(x, box, lam))
        e1 = float(fn(x, box, lam))
        assert abs(e0 - e1) / max(abs(e0), 1.0) < 5e-6, (treatment, other, lam, e0, e1)
        g0 = jax.grad(ref_fn)(x, box, lam)
        g1 = jax.grad(fn)(x, box, lam)
        gerr = float(jnp.max(jnp.abs(g0 - g1)) / (jnp.max(jnp.abs(g0)) + 1e-9))
        assert gerr < 5e-6, (treatment, other, lam, gerr)


def test_frozen_rows_equivalence(tol_system):
    """Active-row compaction: energy *differences* (positions and lambda)
    and mobile-atom forces match the full computation; only the constant
    frozen-frozen offset is dropped (validated to 1e-9 in f64)."""
    system, crd = tol_system
    lig = system.topology.select_resname("LIG")
    frozen = system.freeze_radius(crd.positions, lig, 0.6)
    x = jnp.asarray(crd.positions, jnp.float32)
    box = jnp.asarray(crd.box, jnp.float32)
    kw = dict(method="PME", cutoff=0.9, alchemical=system.alchemical,
              box_for_pme=np.asarray(box))
    full = make_nonbonded_energy(system.nonbonded, backend="tiled", **kw)
    froz = make_nonbonded_energy(system.nonbonded, backend="tiled",
                                 masses=frozen.masses, **kw)
    mobile = np.where(frozen.masses > 0)[0]
    x2 = np.array(crd.positions)
    x2[mobile[:30]] += 0.01
    x2 = jnp.asarray(x2, jnp.float32)
    lam = {"lambda_sterics": 0.5, "lambda_electrostatics": 0.3}
    # forces on mobile atoms identical
    g1 = jax.grad(full)(x, box, lam)
    g2 = jax.grad(froz)(x, box, lam)
    assert float(jnp.max(jnp.abs(g1[mobile] - g2[mobile]))) < 1e-3
    # position-difference energies agree (f32 cancellation noise scales with
    # the clashy config's |E| ~ 2e7, so tolerance is loose here; exact to
    # 1e-9 in f64)
    d_full = float(full(x2, box, lam)) - float(full(x, box, lam))
    d_froz = float(froz(x2, box, lam)) - float(froz(x, box, lam))
    assert abs(d_full - d_froz) < 1e-3 * abs(d_full) + 16.0


@pytest.mark.parametrize("kind", ["erfc", "rf", "plain", "softcore"])
def test_pair_force_factors_match_fd(kind):
    """The analytic radial force factors g = (dU/dr)/r in potentials.pairs
    must match finite differences of the pair energies — guards the custom
    VJP force path at the formula level (clash-dominated whole-system
    comparisons can mask electrostatic force errors)."""
    from blues_tpu.potentials import pairs

    h = 1e-5
    for r in (0.2, 0.45, 0.8):
        if kind == "erfc":
            fn = lambda rr: pairs.coulomb_erfc(jnp.asarray(rr * rr), 0.7, 2.92)
        elif kind == "rf":
            fn = lambda rr: pairs.coulomb_rf(jnp.asarray(rr * rr), 0.7, 0.63, 1.63)
        elif kind == "plain":
            fn = lambda rr: pairs.coulomb_plain(jnp.asarray(rr * rr), 0.7)
        else:
            fn = lambda rr: pairs.softcore_lj(
                jnp.asarray(rr * rr), 0.31, 0.6, 0.5
            )
        e, g = fn(r)
        ep, _ = fn(r + h)
        em, _ = fn(r - h)
        fd = (float(ep) - float(em)) / (2 * h) / r
        assert abs(float(g) - fd) < 5e-3 * max(abs(fd), 1.0), (kind, r, float(g), fd)


def _watdiv_culled_pair():
    import warnings

    system = load_prmtop(f"{DATA}/watDivaline.prmtop")
    crd = load_inpcrd(f"{DATA}/watDivaline.inpcrd")
    system = system.replace(box=crd.box)
    val = system.topology.select_resname("VAL")
    system = system.replace(alchemical=AlchemicalRegion(atoms=val[:16]))
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        frozen = system.freeze_radius(np.asarray(crd.positions), val[:16], 0.3)
    kw = dict(method="PME", cutoff=0.6, alchemical=system.alchemical,
              box_for_pme=np.asarray(crd.box), masses=frozen.masses,
              frozen_ref_positions=np.asarray(crd.positions),
              bonds_for_cull=np.asarray(system.bonds.idx))
    plain = make_nonbonded_energy(
        system.nonbonded, backend="tiled", frozen_cull_skin=None, **kw)
    culled = make_nonbonded_energy(
        system.nonbonded, backend="tiled", frozen_cull_skin=0.25,
        frozen_cull_cage_margin=0.3, **kw)
    return system, crd, frozen, val, plain, culled


def test_frozen_column_culling():
    """Static column culling: energies/forces identical to the unculled
    computation while mobile atoms stay inside their permanent reach balls
    (anchored-chain bounds; COM ball for a free alchemical region);
    violating a ball poisons to NaN. Runs on watDivaline (3,593 atoms)
    where the box is large enough for culling to engage."""
    system, crd, frozen, val, plain, culled = _watdiv_culled_pair()
    assert culled.cull_info is not None  # chain bounds engaged culling
    x = jnp.asarray(crd.positions, jnp.float32)
    box = jnp.asarray(crd.box, jnp.float32)
    is_alch = np.zeros(system.n_atoms, bool)
    is_alch[val[:16]] = True
    mobile = np.where(frozen.masses > 0)[0]
    mob_nonalch = mobile[~is_alch[mobile]]
    lam = {"lambda_sterics": 0.5, "lambda_electrostatics": 0.3}
    # agreement is exact in f64; the f32 tolerance is summation-order
    # cancellation noise on the clashy stored config (same caveat as
    # test_frozen_rows_equivalence)
    e0, e1 = float(plain(x, box, lam)), float(culled(x, box, lam))
    assert abs(e0 - e1) <= 5e-4 * abs(e0)
    g0 = jax.grad(plain)(x, box, lam)
    g1 = jax.grad(culled)(x, box, lam)
    assert float(jnp.max(jnp.abs(g0[mobile] - g1[mobile]))) < 2e-3
    # small physical displacement: still agrees (chain balls hold)
    x2 = np.array(crd.positions)
    x2[mobile] += 0.02
    x2 = jnp.asarray(x2, jnp.float32)
    d0 = float(plain(x2, box, lam)) - e0
    d1 = float(culled(x2, box, lam)) - e1
    assert abs(d0 - d1) < 1e-3 * abs(d0) + 16.0
    # a mobile atom displaced far past its chain ball poisons to NaN
    # (driver rejects/rolls back), never silently wrong
    x3 = np.array(crd.positions)
    x3[mob_nonalch[0]] += 1.0
    assert not np.isfinite(float(culled(jnp.asarray(x3, jnp.float32), box, lam)))
    assert np.isfinite(float(plain(jnp.asarray(x3, jnp.float32), box, lam)))


def test_culling_free_ligand_rotation_stays_green():
    """A FREE (unanchored) alchemical ligand rotates about its COM without
    tripping the culling guard (the COM-ball bound), and the guard still
    poisons when the ligand leaves the ball entirely."""
    import warnings

    from blues_tpu.testsystems import t4_scale_binding_site_box

    system, x0 = t4_scale_binding_site_box(n_atoms=9000, n_peptides=8)
    lig = system.topology.select_resname("LIG")
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        frozen = system.freeze_radius(np.asarray(x0), lig, 0.5)
    from blues_tpu.potentials.energy import make_energy_fn

    efn = make_energy_fn(frozen, nonbonded_method="PME", cutoff=0.9,
                         nonbonded_backend="tiled", frozen_cull_skin=0.15,
                         frozen_cull_cage_margin=0.35)
    assert efn.nonbonded.cull_info is not None
    x = jnp.asarray(x0, jnp.float32)
    box = jnp.asarray(system.box, jnp.float32)
    w = np.asarray(system.masses)[lig]
    com = (np.asarray(x0)[lig] * w[:, None]).sum(0) / w.sum()
    c, s = np.cos(2.2), np.sin(2.2)
    R = np.array([[c, -s, 0.0], [s, c, 0.0], [0.0, 0.0, 1.0]])
    x4 = np.array(x0)
    x4[lig] = (x4[lig] - com) @ R.T + com
    assert np.isfinite(float(efn(jnp.asarray(x4, jnp.float32), box, None)))
    # translate the ligand out of the ball: poison
    x5 = np.array(x0)
    x5[lig] += 2.5
    assert not np.isfinite(float(efn(jnp.asarray(x5, jnp.float32), box, None)))
