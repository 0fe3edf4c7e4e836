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


@pytest.mark.parametrize("treatment", ["direct-space", "exact"])
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
