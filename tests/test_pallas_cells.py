"""Pallas cells-neighborhood kernel vs the XLA cells backend.

The pcells kernel (potentials/pallas/cells_kernel.py) shares the per-pair
formulas (potentials/pairs.py) with all other backends; these tests pin
f32 E+F agreement against the XLA cells backend — itself golden-parity
pinned against the independent f64 oracle — on synthetic dense boxes and
the reference's watDivaline system, plus replica-vmap consistency,
frozen-row masking, alchemical factors, and the overflow poison invariant.
CPU runs use Pallas interpret mode (same partitioning as jnp ops).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from blues_tpu.potentials.cells import make_cell_pair_sum
from blues_tpu.potentials.pallas.cells_kernel import make_pallas_cells_pair_sum
from blues_tpu.potentials.tiled import build_pair_features

DATA = "/root/reference/blues/tests/data"

COMMON = dict(
    method="PME",
    cutoff=0.9,
    alpha_ewald=3.2,
    k_rf=0.0,
    c_rf=0.0,
    annihilate_sterics=False,
    softcore_alpha=0.5,
    periodic=True,
)


def _synthetic_box(n=700, L=2.9, seed=0, n_alch=8):
    rng = np.random.default_rng(seed)
    x = rng.uniform(0, L, (n, 3))
    q = rng.normal(0, 0.3, n)
    q -= q.mean()
    sig = rng.uniform(0.25, 0.35, n)
    eps = rng.uniform(0.1, 0.8, n)
    alch = np.zeros(n)
    alch[:n_alch] = 1.0
    box = np.diag([L, L, L])
    return x, q, sig, eps, alch, box


def _pair(feats, box, pallas=True):
    make = make_pallas_cells_pair_sum if pallas else make_cell_pair_sum
    return make(feats, box0=box, **COMMON)


def test_matches_cells_backend_unfrozen():
    x, q, sig, eps, alch, box = _synthetic_box()
    feats = build_pair_features(q, sig, eps, alch)
    ps_p = _pair(feats, box, pallas=True)
    ps_c = _pair(feats, box, pallas=False)
    args = (jnp.asarray(x, jnp.float32), jnp.asarray(box, jnp.float32),
            jnp.float32(0.7), jnp.float32(0.8), jnp.float32(0.3))
    e_p, f_p = jax.jit(ps_p)(*args)
    e_c, f_c = jax.jit(ps_c)(*args)
    assert np.isfinite(float(e_p))
    assert float(e_p) == pytest.approx(float(e_c), rel=2e-5), (e_p, e_c)
    fs = np.abs(np.asarray(f_c)).max()
    np.testing.assert_allclose(
        np.asarray(f_p), np.asarray(f_c), atol=3e-4 * fs, rtol=2e-4
    )


def test_matches_cells_backend_frozen_rows():
    x, q, sig, eps, alch, box = _synthetic_box(seed=1)
    rows = np.sort(np.random.default_rng(2).choice(len(q), 60, replace=False))
    feats = build_pair_features(q, sig, eps, alch, active_rows=rows)
    ps_p = _pair(feats, box, pallas=True)
    ps_c = _pair(feats, box, pallas=False)
    args = (jnp.asarray(x, jnp.float32), jnp.asarray(box, jnp.float32),
            jnp.float32(1.0), jnp.float32(1.0), jnp.float32(1.0))
    e_p, f_p = jax.jit(ps_p)(*args)
    e_c, f_c = jax.jit(ps_c)(*args)
    assert float(e_p) == pytest.approx(float(e_c), rel=2e-5)
    fs = np.abs(np.asarray(f_c)).max()
    np.testing.assert_allclose(
        np.asarray(f_p), np.asarray(f_c), atol=3e-4 * fs, rtol=2e-4
    )
    # frozen (non-row) atoms carry no force from this sum
    mask = np.ones(len(q), bool)
    mask[rows] = False
    assert np.abs(np.asarray(f_p)[mask]).max() == 0.0


def test_vmap_replica_consistency():
    x, q, sig, eps, alch, box = _synthetic_box(n=400, seed=3)
    feats = build_pair_features(q, sig, eps, alch)
    ps_p = _pair(feats, box, pallas=True)
    xb = jnp.asarray(
        np.stack([x, x + 0.01, np.roll(x, 5, axis=0)]), jnp.float32
    )
    boxj = jnp.asarray(box, jnp.float32)
    one = jnp.float32(1.0)
    ev, fv = jax.jit(
        jax.vmap(lambda xx: ps_p(xx, boxj, one, one, one))
    )(xb)
    for r in range(3):
        e1, f1 = jax.jit(ps_p)(xb[r], boxj, one, one, one)
        assert float(ev[r]) == pytest.approx(float(e1), rel=1e-6)
        np.testing.assert_allclose(
            np.asarray(fv[r]), np.asarray(f1), atol=1e-5, rtol=1e-5
        )


def test_custom_vjp_grad_matches_forces():
    x, q, sig, eps, alch, box = _synthetic_box(n=400, seed=4)
    feats = build_pair_features(q, sig, eps, alch)
    ps_p = _pair(feats, box, pallas=True)
    args = (jnp.asarray(box, jnp.float32), jnp.float32(1.0),
            jnp.float32(1.0), jnp.float32(1.0))
    xj = jnp.asarray(x, jnp.float32)
    g = jax.jit(jax.grad(lambda y: ps_p.energy(y, *args)))(xj)
    _, f = jax.jit(ps_p)(xj, *args)
    np.testing.assert_allclose(np.asarray(g), -np.asarray(f), atol=1e-6)


def test_overflow_poisons():
    """Collapsing every atom into one cell overflows its bin capacity: both
    outputs must poison to NaN (rejected iteration), never drop pairs."""
    x, q, sig, eps, alch, box = _synthetic_box(n=700, seed=5)
    feats = build_pair_features(q, sig, eps, alch)
    ps_p = _pair(feats, box, pallas=True)
    x_collapsed = jnp.asarray(
        0.02 * np.random.default_rng(6).standard_normal((700, 3)) + 1.0,
        jnp.float32,
    )
    e, f = jax.jit(ps_p)(
        x_collapsed, jnp.asarray(box, jnp.float32),
        jnp.float32(1.0), jnp.float32(1.0), jnp.float32(1.0),
    )
    assert not np.isfinite(float(e))
    assert not np.isfinite(np.asarray(f)).all()


def test_rejects_triclinic_and_small_grids():
    x, q, sig, eps, alch, box = _synthetic_box(n=100, L=1.5, seed=7)
    feats = build_pair_features(q, sig, eps, alch)
    with pytest.raises(ValueError, match="too small"):
        _pair(feats, np.diag([1.5, 1.5, 1.5]), pallas=True)
    tri = np.array([[3.0, 0, 0], [1.4, 3.0, 0], [0.2, 0.1, 3.0]])
    with pytest.raises(ValueError, match="orthorhombic"):
        _pair(feats, tri, pallas=True)


@pytest.mark.skipif(not os.path.isdir(DATA), reason="no reference data")
def test_watdivaline_agreement_via_energy_fn():
    """Full make_energy_fn stack (exclusions/exceptions/PME reciprocal all
    composed) on the reference's watDivaline box: pcells == cells."""
    from blues_tpu.core.amber_coords import load_inpcrd
    from blues_tpu.core.prmtop import load_prmtop
    from blues_tpu.potentials.energy import make_energy_fn, make_force_fn

    system = load_prmtop(f"{DATA}/watDivaline.prmtop")
    crd = load_inpcrd(f"{DATA}/watDivaline.inpcrd")
    system = system.replace(box=crd.box)
    x = jnp.asarray(crd.positions, jnp.float32)
    box = jnp.asarray(crd.box, jnp.float32)
    out = {}
    for be in ("cells", "pcells"):
        efn = make_energy_fn(
            system, nonbonded_method="PME", cutoff=0.9,
            nonbonded_backend=be,
        )
        e, f = jax.jit(make_force_fn(efn))(x, box, None)
        out[be] = (float(e), np.asarray(f))
    e_c, f_c = out["cells"]
    e_p, f_p = out["pcells"]
    # the raw pair sums are ~2.6e6 kJ/mol (excluded bonded pairs are
    # computed then subtracted by the shared rest term), so the composed
    # ~-35e3 total carries f32 cancellation noise of that scale — compare
    # with an absolute tolerance anchored to the RAW magnitude (the same
    # convention as tests/test_pair_backends.py; raw-scale agreement is
    # pinned at 2e-5 by the synthetic tests above)
    assert e_p == pytest.approx(e_c, abs=120.0), (e_p, e_c)
    # solute atoms carry ~1e5 kJ/mol/nm excluded-bonded partials through
    # the kernels (subtracted by the rest term), so per-atom f32 noise of
    # ~2e-4 of that scale is expected; a wrong pair/image would be 100s+
    np.testing.assert_allclose(f_p, f_c, atol=25.0)


def test_pcells_lambda_split_reconstructs_full_energy():
    """r4 review fix: pcells participates in the lambda-split (E0 via the
    zero-charge/zero-eps trick, like cells); E(x, lam) == E0(x) + Ea."""
    from blues_tpu.core.system import AlchemicalRegion, NonbondedParams, System
    from blues_tpu.potentials.energy import make_energy_fn

    x, q, sig, eps, alch, box = _synthetic_box(n=500, seed=8)
    nb = NonbondedParams(
        charge=q, sigma=sig, epsilon=eps,
        exclusions=np.zeros((0, 2), np.int32),
        exceptions_idx=np.zeros((0, 2), np.int32),
        exceptions_chargeprod=np.zeros(0), exceptions_sigma=np.zeros(0),
        exceptions_epsilon=np.zeros(0),
    )
    system = System(
        masses=np.full(500, 12.0), nonbonded=nb, box=box,
        alchemical=AlchemicalRegion(atoms=np.where(alch > 0)[0]),
    )
    efn = make_energy_fn(
        system, nonbonded_method="PME", cutoff=0.9, nonbonded_backend="pcells"
    )
    assert getattr(efn, "lambda_e0_f0", None) is not None, (
        "pcells must expose the lambda split"
    )
    xj = jnp.asarray(x, jnp.float32)
    boxj = jnp.asarray(box, jnp.float32)
    g = {"lambda_sterics": 0.6, "lambda_electrostatics": 0.3}
    e_full = float(jax.jit(efn)(xj, boxj, g))
    e0, _ = jax.jit(efn.lambda_e0_f0)(xj, boxj)
    ea, _ = jax.jit(lambda a, b, c: efn.lambda_ea_fa(a, b, c))(xj, boxj, g)
    assert np.isfinite(e_full)
    assert e_full == pytest.approx(
        float(e0) + float(ea), abs=2e-4 * abs(e_full) + 0.5
    )


def test_pcells_triclinic_falls_back_to_cells():
    """r4 review fix: a triclinic box with backend='pcells' must degrade to
    the (triclinic-capable) XLA cells backend, as documented — not raise."""
    from blues_tpu.core.system import NonbondedParams, System
    from blues_tpu.potentials.energy import make_energy_fn

    x, q, sig, eps, alch, box = _synthetic_box(n=500, L=3.0, seed=9)
    tri = np.array([[3.0, 0.0, 0.0], [0.3, 3.0, 0.0], [0.2, 0.1, 3.0]])
    nb = NonbondedParams(
        charge=q, sigma=sig, epsilon=eps,
        exclusions=np.zeros((0, 2), np.int32),
        exceptions_idx=np.zeros((0, 2), np.int32),
        exceptions_chargeprod=np.zeros(0), exceptions_sigma=np.zeros(0),
        exceptions_epsilon=np.zeros(0),
    )
    system = System(masses=np.full(500, 12.0), nonbonded=nb, box=tri)
    efn = make_energy_fn(
        system, nonbonded_method="PME", cutoff=0.9, nonbonded_backend="pcells"
    )
    e = float(jax.jit(efn)(jnp.asarray(x, jnp.float32),
                           jnp.asarray(tri, jnp.float32), None))
    assert np.isfinite(e)
