"""Holonomic distance constraints: clustered batched Newton solver.

TPU-native replacement for OpenMM's C++ SHAKE/SETTLE/CCMA solvers, which
every reference config relies on (`constraints: HBonds`, `rigidWater: True`,
reference: blues/settings.py:218, examples/rotmove_cuda.yml:22-23; the
integrator programs call addConstrainPositions/Velocities,
reference: blues/integrators.py:168-169).

Design: constraints partition into tiny independent clusters (a rigid
water = 3 atoms / 3 constraints, a methyl = 4 / 3, ...). A global
scatter-add SHAKE sweep costs ~1 ms *per sweep* on TPU (serialized
scatters); instead all clusters are padded to a uniform (A_max, K_max)
shape and solved together entirely in registers:

  * positions: damped Newton on phi_k = |x_i - x_j|^2 - d^2 with the SHAKE
    parameterization (displacements along *reference* bond directions),
    batched (C, K, K) linear solves; quadratic convergence, fixed 6
    iterations reaches ~1e-7 relative.
  * velocities: the RATTLE projection is exactly linear -> ONE batched
    solve, no iteration.

Each projection costs one gather + one scatter over the constrained atoms,
independent of iteration count (~200x faster than the sweep formulation at
22k atoms). Constraints between two frozen (zero-mass) atoms are inert and
masked out.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..core.system import Constraints

NEWTON_ITERS = 6


def _build_clusters(constraints: Constraints, masses):
    """Partition constraints into connected clusters; return padded arrays."""
    idx = np.asarray(constraints.idx, np.int64)
    d = np.asarray(constraints.dist, np.float64)
    masses = np.asarray(masses, np.float64)
    invm = np.where(masses > 0, 1.0 / np.maximum(masses, 1e-30), 0.0)

    # drop constraints whose atoms are both frozen (they cannot move)
    live = (invm[idx[:, 0]] + invm[idx[:, 1]]) > 0
    idx, d = idx[live], d[live]
    if len(idx) == 0:
        return None

    # union-find over atoms
    parent = {}

    def find(a):
        root = a
        while parent.get(root, root) != root:
            root = parent[root]
        while parent.get(a, a) != a:
            parent[a], a = root, parent[a]
        return root

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb

    for i, j in idx:
        union(int(i), int(j))

    clusters = {}
    for k, (i, j) in enumerate(idx):
        root = find(int(i))
        clusters.setdefault(root, []).append(k)

    cluster_list = list(clusters.values())
    a_max = max(
        len({int(a) for k in cons for a in idx[k]}) for cons in cluster_list
    )
    k_max = max(len(cons) for cons in cluster_list)
    C = len(cluster_list)

    atoms = np.zeros((C, a_max), np.int32)
    atom_valid = np.zeros((C, a_max), bool)
    con_i = np.zeros((C, k_max), np.int32)  # local slot of atom i
    con_j = np.zeros((C, k_max), np.int32)
    con_valid = np.zeros((C, k_max), bool)
    d2 = np.ones((C, k_max), np.float64)
    for c, cons in enumerate(cluster_list):
        local = {}
        for k in cons:
            for a in idx[k]:
                local.setdefault(int(a), len(local))
        for a, slot in local.items():
            atoms[c, slot] = a
            atom_valid[c, slot] = True
        # pad unused atom slots with the first atom (gather-safe, masked);
        # scatters use a separate uniquely-indexed table (see below)
        for slot in range(len(local), a_max):
            atoms[c, slot] = atoms[c, 0]
        for kk, k in enumerate(cons):
            con_i[c, kk] = local[int(idx[k, 0])]
            con_j[c, kk] = local[int(idx[k, 1])]
            con_valid[c, kk] = True
            d2[c, kk] = d[k] * d[k]

    invm_c = invm[atoms] * atom_valid  # (C, A)
    # uniquely-indexed scatter table: every PAD slot gets its own ghost
    # index >= n_atoms, so the projection's scatter-add has provably unique
    # indices and XLA vectorizes it (duplicate-index scatters serialize on
    # TPU — they were the dominant cost of a projection at 22k atoms)
    n_atoms = int(max(idx.max() + 1, len(masses)))
    scatter_atoms = atoms.copy().astype(np.int64)
    pads = ~atom_valid
    scatter_atoms[pads] = n_atoms + np.arange(int(pads.sum()))
    return dict(
        atoms=atoms,
        scatter_atoms=scatter_atoms.astype(np.int32),
        n_atoms=n_atoms,
        n_ghost=int(pads.sum()),
        atom_valid=atom_valid,
        con_i=con_i,
        con_j=con_j,
        con_valid=con_valid,
        d2=d2,
        invm=invm_c,
        n_clusters=C,
        a_max=a_max,
        k_max=k_max,
    )


def _bsum(a, b, axis):
    """einsum via broadcast-multiply-sum: the contracted axes here are tiny
    (K, A <= ~4), and XLA lowers such einsums to batched matmuls whose 3x4
    operands pad catastrophically on the 128x128 MXU — elementwise VPU code
    is ~10x faster for these shapes."""
    return jnp.sum(a * b, axis=axis)


def _solve_small(J, b, K):
    """Batched solve for tiny K x K systems via closed forms (TPU-friendly;
    jnp.linalg.solve on many tiny matrices is slow)."""
    if K == 1:
        return b / J[..., 0, 0:1]
    if K == 2:
        a, b_, c, d = J[..., 0, 0], J[..., 0, 1], J[..., 1, 0], J[..., 1, 1]
        det = a * d - b_ * c
        x0 = (d * b[..., 0] - b_ * b[..., 1]) / det
        x1 = (-c * b[..., 0] + a * b[..., 1]) / det
        return jnp.stack([x0, x1], -1)
    if K == 3:
        # adjugate / Cramer
        m = J
        c00 = m[..., 1, 1] * m[..., 2, 2] - m[..., 1, 2] * m[..., 2, 1]
        c01 = m[..., 1, 2] * m[..., 2, 0] - m[..., 1, 0] * m[..., 2, 2]
        c02 = m[..., 1, 0] * m[..., 2, 1] - m[..., 1, 1] * m[..., 2, 0]
        det = m[..., 0, 0] * c00 + m[..., 0, 1] * c01 + m[..., 0, 2] * c02
        c10 = m[..., 0, 2] * m[..., 2, 1] - m[..., 0, 1] * m[..., 2, 2]
        c11 = m[..., 0, 0] * m[..., 2, 2] - m[..., 0, 2] * m[..., 2, 0]
        c12 = m[..., 0, 1] * m[..., 2, 0] - m[..., 0, 0] * m[..., 2, 1]
        c20 = m[..., 0, 1] * m[..., 1, 2] - m[..., 0, 2] * m[..., 1, 1]
        c21 = m[..., 0, 2] * m[..., 1, 0] - m[..., 0, 0] * m[..., 1, 2]
        c22 = m[..., 0, 0] * m[..., 1, 1] - m[..., 0, 1] * m[..., 1, 0]
        inv = jnp.stack(
            [
                jnp.stack([c00, c10, c20], -1),
                jnp.stack([c01, c11, c21], -1),
                jnp.stack([c02, c12, c22], -1),
            ],
            -2,
        ) / det[..., None, None]
        return jnp.sum(inv * b[..., None, :], axis=-1)
    return jnp.linalg.solve(J, b[..., :, None])[..., 0]


def make_constraint_fns(constraints: Constraints, masses, tol: float = 1e-6):
    """Build (constrain_positions, constrain_velocities); identities when the
    system has no constraints. `tol` is kept for API compatibility; the
    fixed Newton iteration converges far below 1e-6 relative."""
    if len(constraints) == 0:
        return (lambda x_new, x_ref: x_new), (lambda v, x: v)
    cl = _build_clusters(constraints, masses)
    if cl is None:
        return (lambda x_new, x_ref: x_new), (lambda v, x: v)

    atoms = jnp.asarray(cl["atoms"])
    atom_valid_f = jnp.asarray(cl["atom_valid"], jnp.float32)
    con_valid = cl["con_valid"]
    d2_np = cl["d2"]
    invm_np = cl["invm"]
    C, A, K = cl["n_clusters"], cl["a_max"], cl["k_max"]
    eye = np.eye(K)

    # incidence tensors: differences and mass-weighted application become
    # small batched einsums (no scatters inside the Newton loop)
    ci, cj = cl["con_i"], cl["con_j"]
    slots = np.arange(A)
    P_np = (
        (slots[None, None, :] == ci[:, :, None]).astype(np.float64)
        - (slots[None, None, :] == cj[:, :, None])
    ) * con_valid[:, :, None]  # (C, K, A): dr_k = sum_a P[k,a] x_a
    B_np = -invm_np[:, :, None] * np.swapaxes(P_np, 1, 2)  # (C, A, K)
    # coupling w_lk and pad-stabilized identity, precomputed in numpy
    invm_i = np.take_along_axis(invm_np, ci, 1)
    invm_j = np.take_along_axis(invm_np, cj, 1)
    ii = ci[:, :, None] == ci[:, None, :]
    ij = ci[:, :, None] == cj[:, None, :]
    ji = cj[:, :, None] == ci[:, None, :]
    jj = cj[:, :, None] == cj[:, None, :]
    w_np = invm_i[:, :, None] * (ii.astype(np.float64) - ij) + invm_j[:, :, None] * (
        jj.astype(np.float64) - ji
    )
    vv = con_valid.astype(np.float64)
    pad_eye_np = eye[None] * (1.0 - vv[:, :, None] * vv[:, None, :])

    scatter_atoms = jnp.asarray(cl["scatter_atoms"].reshape(-1))
    n_ghost = cl["n_ghost"]

    def _gather(x):
        return x[atoms]  # (C, A, 3)

    def _scatter_delta(x, p, p0):
        # pad slots own distinct ghost indices (>= n), so indices are
        # unique and the scatter-add vectorizes instead of serializing
        delta = (p - p0) * atom_valid_f[:, :, None]
        ext = jnp.concatenate([x, jnp.zeros((n_ghost, 3), x.dtype)])
        ext = ext.at[scatter_atoms].add(
            delta.reshape(-1, 3).astype(x.dtype),
            unique_indices=True,
            indices_are_sorted=False,
        )
        return ext[: x.shape[0]]

    def constrain_positions(x_new, x_ref):
        dtype = x_new.dtype
        d2 = jnp.asarray(d2_np, dtype)
        P = jnp.asarray(P_np, dtype)
        B = jnp.asarray(B_np, dtype)
        w = jnp.asarray(w_np, dtype)
        pad_eye = jnp.asarray(pad_eye_np, dtype)
        vmask = jnp.asarray(con_valid)
        p = _gather(x_new)
        p0 = p
        ref = _gather(x_ref)
        dr_ref = _bsum(P[:, :, :, None], ref[:, None, :, :], 2)  # (C, K, 3)

        def newton(p, _):
            dr = _bsum(P[:, :, :, None], p[:, None, :, :], 2)
            phi = jnp.sum(dr * dr, -1) - d2
            phi = jnp.where(vmask, phi, 0.0)
            J = 2.0 * _bsum(dr[:, :, None, :], dr_ref[:, None, :, :], -1) * w + pad_eye
            g = _solve_small(J, phi, K)
            g = jnp.where(vmask, g, 0.0)
            p = p + _bsum(B[:, :, :, None], (g[:, :, None] * dr_ref)[:, None, :, :], 2)
            return p, None

        p, _ = jax.lax.scan(newton, p, None, length=NEWTON_ITERS)
        return _scatter_delta(x_new, p, p0)

    def constrain_velocities(v, x):
        dtype = v.dtype
        P = jnp.asarray(P_np, dtype)
        B = jnp.asarray(B_np, dtype)
        w = jnp.asarray(w_np, dtype)
        pad_eye = jnp.asarray(pad_eye_np, dtype)
        vmask = jnp.asarray(con_valid)
        pv = _gather(v)
        pv0 = pv
        px = _gather(x)
        dr = _bsum(P[:, :, :, None], px[:, None, :, :], 2)  # (C, K, 3)
        dv = _bsum(P[:, :, :, None], pv[:, None, :, :], 2)
        c = jnp.where(vmask, jnp.sum(dv * dr, -1), 0.0)
        Jv = _bsum(dr[:, :, None, :], dr[:, None, :, :], -1) * w + pad_eye
        g = jnp.where(vmask, _solve_small(Jv, c, K), 0.0)
        pv = pv + _bsum(B[:, :, :, None], (g[:, :, None] * dr)[:, None, :, :], 2)
        return _scatter_delta(v, pv, pv0)

    return constrain_positions, constrain_velocities
