"""Analytic SETTLE for rigid 3-site waters (integrators/constraints.py).

SETTLE (Miyamoto & Kollman 1992) is the closed-form solution of the SAME
constrained problem the clustered Newton/SHAKE solver iterates on —
corrections along reference bond directions, internal (momentum-conserving)
forces — so the two paths must agree to solver tolerance. TPU-native
replacement for OpenMM's C++ SETTLE (reference configs use
`constraints: HBonds` + `rigidWater: True`, blues/settings.py:218).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from blues_tpu.core.system import Constraints
from blues_tpu.integrators.constraints import _build_clusters, make_constraint_fns

D_OH = 0.09572
D_HH = 0.15139
M_O = 15.999
M_H = 1.008


def water_box(n_waters, seed=0, extra_cluster=False):
    """Random rigid TIP3P geometries + optionally one non-water cluster."""
    rng = np.random.default_rng(seed)
    half = D_HH / 2.0
    h = np.sqrt(D_OH**2 - half**2)
    tri = np.array([[0.0, 0.0, 0.0], [half, -h, 0.0], [-half, -h, 0.0]])
    xs, idx, dist, masses = [], [], [], []
    for w in range(n_waters):
        # random rotation via QR
        q, _ = np.linalg.qr(rng.normal(size=(3, 3)))
        if np.linalg.det(q) < 0:
            q[:, 0] *= -1
        base = 3 * w
        xs.append(tri @ q.T + rng.uniform(0, 3.0, 3))
        idx += [[base, base + 1], [base, base + 2], [base + 1, base + 2]]
        dist += [D_OH, D_OH, D_HH]
        masses += [M_O, M_H, M_H]
    if extra_cluster:
        # a methyl-like 4-atom cluster: C with 3 H at 0.109 (K=3, A=4;
        # NOT settle-eligible)
        base = 3 * n_waters
        c = rng.uniform(0, 3.0, 3)
        xs.append(
            np.concatenate(
                [
                    c[None],
                    c[None] + 0.109 * np.eye(3) * np.array([1, -1, 1])[:, None],
                ]
            )
        )
        idx += [[base, base + 1], [base, base + 2], [base, base + 3]]
        dist += [0.109] * 3
        masses += [12.011, 1.008, 1.008, 1.008]
    x = np.concatenate(xs)
    cons = Constraints(np.asarray(idx, np.int32), np.asarray(dist))
    return x, cons, np.asarray(masses)


def test_partition_finds_waters():
    x, cons, masses = water_box(5, extra_cluster=True)
    cl = _build_clusters(cons, masses)
    assert cl["settle"] is not None and cl["settle"]["n_waters"] == 5
    assert cl["n_clusters"] == 1  # the methyl stays on the Newton path
    cl_off = _build_clusters(cons, masses, use_settle=False)
    assert cl_off.get("settle") is None and cl_off["n_clusters"] == 6


@pytest.mark.parametrize("noise", [1e-3, 1e-2, 2e-2])
def test_settle_matches_newton(noise):
    """SETTLE positions/velocities == the Newton/RATTLE solution (same
    SHAKE parameterization, solved analytically). Holds for physical step
    sizes (a 4 fs HMR step moves atoms ~0.01 nm); at unphysically large
    displacements (>~0.05 nm) the two parameterizations can pick different
    constraint-manifold branches and both remain valid."""
    x, cons, masses = water_box(12, seed=3, extra_cluster=True)
    rng = np.random.default_rng(7)
    x_new = x + noise * rng.normal(size=x.shape)
    v = rng.normal(size=x.shape)
    with jax.enable_x64(True):
        x64 = jnp.asarray(x, jnp.float64)
        xn64 = jnp.asarray(x_new, jnp.float64)
        v64 = jnp.asarray(v, jnp.float64)
        cx_s, cv_s = make_constraint_fns(cons, masses)
        cx_n, cv_n = make_constraint_fns(cons, masses, use_settle=False)
        xs = np.asarray(cx_s(xn64, x64))
        xn = np.asarray(cx_n(xn64, x64))
        assert np.abs(xs - xn).max() < 1e-7, np.abs(xs - xn).max()
        vs = np.asarray(cv_s(v64, jnp.asarray(xs)))
        vn = np.asarray(cv_n(v64, jnp.asarray(xs)))
        assert np.abs(vs - vn).max() < 1e-9


def test_settle_satisfies_constraints_and_momentum():
    x, cons, masses = water_box(30, seed=11)
    rng = np.random.default_rng(5)
    x_new = x + 2e-2 * rng.normal(size=x.shape)
    with jax.enable_x64(True):
        cx, cv = make_constraint_fns(cons, masses)
        xs = np.asarray(cx(jnp.asarray(x_new), jnp.asarray(x)))
        i, j = np.asarray(cons.idx).T
        d = np.linalg.norm(xs[i] - xs[j], axis=1)
        assert np.abs(d - np.asarray(cons.dist)).max() < 1e-9
        # constraint forces are internal: per-water momentum change is zero
        dp = (masses[:, None] * (xs - x_new)).reshape(-1, 3, 3).sum(1)
        assert np.abs(dp).max() < 1e-9
        # velocity projection kills bond-direction relative velocity
        v = rng.normal(size=x.shape)
        vs = np.asarray(cv(jnp.asarray(v), jnp.asarray(xs)))
        rel = np.sum((vs[i] - vs[j]) * (xs[i] - xs[j]), 1)
        assert np.abs(rel).max() < 1e-9


def test_settle_f32_path():
    """f32 (the production dtype) stays well within integrator tolerance."""
    x, cons, masses = water_box(50, seed=2)
    rng = np.random.default_rng(9)
    x_new = (x + 1e-2 * rng.normal(size=x.shape)).astype(np.float32)
    cx, cv = make_constraint_fns(cons, masses)
    xs = np.asarray(jax.jit(cx)(jnp.asarray(x_new), jnp.asarray(x, jnp.float32)))
    i, j = np.asarray(cons.idx).T
    d = np.linalg.norm(xs[i] - xs[j], axis=1)
    assert np.abs(d - np.asarray(cons.dist)).max() < 5e-6


def test_all_water_system_has_no_newton_path():
    x, cons, masses = water_box(4)
    cl = _build_clusters(cons, masses)
    assert cl["n_clusters"] == 0 and cl["settle"]["n_waters"] == 4
    cx, cv = make_constraint_fns(cons, masses)
    rng = np.random.default_rng(1)
    xn = x + 1e-2 * rng.normal(size=x.shape)
    with jax.enable_x64(True):
        xs = np.asarray(cx(jnp.asarray(xn), jnp.asarray(x)))
    i, j = np.asarray(cons.idx).T
    assert np.abs(np.linalg.norm(xs[i] - xs[j], 1) - 0).all() is not None  # shape smoke
    d = np.linalg.norm(xs[i] - xs[j], axis=1)
    assert np.abs(d - np.asarray(cons.dist)).max() < 1e-9


def test_frozen_water_stays_on_newton_path():
    """A water with a frozen atom is not a free rigid body — it must not be
    routed through SETTLE."""
    x, cons, masses = water_box(3)
    masses = masses.copy()
    masses[0] = 0.0  # freeze one O
    cl = _build_clusters(cons, masses)
    assert cl["settle"]["n_waters"] == 2
    assert cl["n_clusters"] == 1
