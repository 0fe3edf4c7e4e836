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


def _settle_partition(cluster_list, idx, d, masses, invm):
    """Split clusters into analytic-SETTLE-eligible rigid triangles (3 atoms
    / 3 constraints, fully mobile, isoceles about an apex with equal-mass
    base atoms — every rigid 3-site water) and the Newton rest.

    Returns (settle_arrays | None, remaining_cluster_list). settle_arrays:
    atoms (W, 3) ordered [apex, base1, base2], masses (W, 3), and the
    canonical frame geometry ra/rb/rc (W,) of Miyamoto & Kollman 1992."""
    settle, rest = [], []
    for cons in cluster_list:
        ok = False
        if len(cons) == 3:
            pairs = [tuple(int(a) for a in idx[k]) for k in cons]
            atoms = sorted({a for p in pairs for a in p})
            if len(atoms) == 3 and all(invm[a] > 0 for a in atoms):
                # find an apex whose two constraint distances are equal and
                # whose base atoms have equal mass
                dist = {frozenset(p): float(d[k]) for p, k in zip(pairs, cons)}
                if len(dist) == 3:
                    for apex in atoms:
                        b1, b2 = [a for a in atoms if a != apex]
                        dab = dist[frozenset((apex, b1))]
                        dac = dist[frozenset((apex, b2))]
                        dbc = dist[frozenset((b1, b2))]
                        if (
                            abs(dab - dac) < 1e-9
                            and abs(masses[b1] - masses[b2]) < 1e-6
                            and dbc < dab + dac  # non-degenerate triangle
                        ):
                            settle.append((apex, b1, b2, dab, dbc))
                            ok = True
                            break
        if not ok:
            rest.append(cons)
    if not settle:
        return None, rest
    arr = np.asarray([(a, b, c) for a, b, c, _, _ in settle], np.int32)
    dab = np.asarray([x[3] for x in settle], np.float64)
    dbc = np.asarray([x[4] for x in settle], np.float64)
    m = masses[arr]  # (W, 3)
    rc = 0.5 * dbc
    t = np.sqrt(dab * dab - rc * rc)  # apex height over the base
    ra = (m[:, 1] + m[:, 2]) / m.sum(1) * t  # apex -> COM along the axis
    rb = t - ra  # COM -> base midpoint
    return (
        dict(atoms=arr, m=m, ra=ra, rb=rb, rc=rc, n_waters=len(arr)),
        rest,
    )


def _build_clusters(constraints: Constraints, masses, use_settle: bool = True):
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
    settle_arrays = None
    if use_settle:
        settle_arrays, cluster_list = _settle_partition(
            cluster_list, idx, d, masses, invm
        )
    if not cluster_list:
        return dict(settle=settle_arrays, n_clusters=0, n_atoms=len(masses))
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
        settle=settle_arrays,
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


def _make_settle_fns(st):
    """Analytic SETTLE (Miyamoto & Kollman, J Comput Chem 13:952, 1992) for
    rigid isoceles triangles — every 3-site water. Replaces the iterated
    Newton position projection with closed-form batched trig: no scan, no
    linear solves, one gather + one unique-index scatter. The velocity
    projection is the exact RATTLE 3x3 solve (linear, one shot).

    TPU note: everything is (W, ...) elementwise VPU math; the atom triplets
    are disjoint across waters, so the scatter has provably unique indices.
    """
    atoms = jnp.asarray(st["atoms"])  # (W, 3) [apex, base1, base2]
    m_np = st["m"]
    ra_np, rb_np, rc_np = st["ra"], st["rb"], st["rc"]
    invm_np = 1.0 / m_np

    # fixed incidence for the velocity RATTLE: constraints (A-B1, A-B2,
    # B1-B2) over local atoms (0, 1, 2)
    P_np = np.array([[1.0, -1.0, 0.0], [1.0, 0.0, -1.0], [0.0, 1.0, -1.0]])
    ci = np.array([0, 0, 1])
    cj = np.array([1, 2, 2])
    ii = ci[:, None] == ci[None, :]
    ij = ci[:, None] == cj[None, :]
    ji = cj[:, None] == ci[None, :]
    jj = cj[:, None] == cj[None, :]
    w_np = invm_np[:, ci][:, :, None] * (ii.astype(np.float64) - ij) + invm_np[
        :, cj
    ][:, :, None] * (jj.astype(np.float64) - ji)  # (W, 3, 3)
    B_np = -invm_np[:, :, None] * P_np.T[None]  # (W, 3atoms, 3cons)

    def settle_positions(x_new, x_ref):
        dtype = x_new.dtype
        m = jnp.asarray(m_np, dtype)[..., None]  # (W, 3, 1)
        ra = jnp.asarray(ra_np, dtype)
        rb = jnp.asarray(rb_np, dtype)
        rc = jnp.asarray(rc_np, dtype)
        q = x_ref[atoms]  # (W, 3, 3) old, constraint-satisfying
        p = x_new[atoms]  # (W, 3, 3) new, unconstrained
        com = jnp.sum(m * p, 1) / jnp.sum(m, 1)
        a1 = p[:, 0] - com
        b1 = p[:, 1] - com
        c1 = p[:, 2] - com
        xb0 = q[:, 1] - q[:, 0]
        xc0 = q[:, 2] - q[:, 0]

        def unit(u):
            return u / jnp.linalg.norm(u, axis=-1, keepdims=True)

        n0 = unit(jnp.cross(xb0, xc0))  # normal of the OLD plane
        n1 = unit(jnp.cross(a1, n0))
        n2 = jnp.cross(n0, n1)
        dot = lambda u, v: jnp.sum(u * v, -1)
        xb0d, yb0d = dot(xb0, n1), dot(xb0, n2)
        xc0d, yc0d = dot(xc0, n1), dot(xc0, n2)
        za1d = dot(a1, n0)
        xb1d, yb1d, zb1d = dot(b1, n1), dot(b1, n2), dot(b1, n0)
        xc1d, yc1d, zc1d = dot(c1, n1), dot(c1, n2), dot(c1, n0)

        sinphi = jnp.clip(za1d / ra, -1.0, 1.0)
        cosphi = jnp.sqrt(jnp.maximum(1.0 - sinphi * sinphi, 1e-12))
        sinpsi = jnp.clip((zb1d - zc1d) / (2.0 * rc * cosphi), -1.0, 1.0)
        cospsi = jnp.sqrt(jnp.maximum(1.0 - sinpsi * sinpsi, 0.0))

        ya2d = ra * cosphi
        xb2d = -rc * cospsi
        yb2d = -rb * cosphi - rc * sinpsi * sinphi
        yc2d = -rb * cosphi + rc * sinpsi * sinphi

        alpha = xb2d * (xb0d - xc0d) + yb0d * yb2d + yc0d * yc2d
        beta = xb2d * (yc0d - yb0d) + xb0d * yb2d + xc0d * yc2d
        gamma = xb0d * yb1d - xb1d * yb0d + xc0d * yc1d - xc1d * yc0d
        al2be2 = alpha * alpha + beta * beta
        sintheta = jnp.clip(
            (alpha * gamma - beta * jnp.sqrt(jnp.maximum(al2be2 - gamma * gamma, 0.0)))
            / al2be2,
            -1.0,
            1.0,
        )
        costheta = jnp.sqrt(jnp.maximum(1.0 - sintheta * sintheta, 0.0))

        za2d = ra * sinphi
        zb2d = -rb * sinphi + rc * sinpsi * cosphi
        zc2d = -rb * sinphi - rc * sinpsi * cosphi
        a3 = jnp.stack([-ya2d * sintheta, ya2d * costheta, za2d], -1)
        b3 = jnp.stack(
            [
                xb2d * costheta - yb2d * sintheta,
                xb2d * sintheta + yb2d * costheta,
                zb2d,
            ],
            -1,
        )
        c3 = jnp.stack(
            [
                -xb2d * costheta - yc2d * sintheta,
                -xb2d * sintheta + yc2d * costheta,
                zc2d,
            ],
            -1,
        )

        def back(dd):
            return com + dd[:, 0:1] * n1 + dd[:, 1:2] * n2 + dd[:, 2:3] * n0

        newp = jnp.stack([back(a3), back(b3), back(c3)], 1)  # (W, 3, 3)
        return x_new.at[atoms.reshape(-1)].set(
            newp.reshape(-1, 3).astype(dtype), unique_indices=True
        )

    def settle_velocities(v, x):
        dtype = v.dtype
        w = jnp.asarray(w_np, dtype)
        Bw = jnp.asarray(B_np, dtype)
        Pj = jnp.asarray(P_np, dtype)
        px = x[atoms]
        pv = v[atoms]
        dr = jnp.sum(Pj[None, :, :, None] * px[:, None, :, :], 2)  # (W, 3, 3)
        dv = jnp.sum(Pj[None, :, :, None] * pv[:, None, :, :], 2)
        c = jnp.sum(dv * dr, -1)
        J = jnp.sum(dr[:, :, None, :] * dr[:, None, :, :], -1) * w
        g = _solve_small(J, c, 3)
        delta = jnp.sum(Bw[:, :, :, None] * (g[:, :, None] * dr)[:, None, :, :], 2)
        return v.at[atoms.reshape(-1)].add(
            delta.reshape(-1, 3).astype(dtype), unique_indices=True
        )

    return settle_positions, settle_velocities


def make_constraint_fns(
    constraints: Constraints, masses, tol: float = 1e-6, use_settle: bool = True
):
    """Build (constrain_positions, constrain_velocities); identities when the
    system has no constraints. `tol` is kept for API compatibility; the
    fixed Newton iteration converges far below 1e-6 relative.

    Rigid 3-site waters are split out and solved analytically (SETTLE,
    unless ``use_settle=False``); everything else goes through the
    clustered batched Newton solver."""
    if len(constraints) == 0:
        return (lambda x_new, x_ref: x_new), (lambda v, x: v)
    cl = _build_clusters(constraints, masses, use_settle=use_settle)
    if cl is None:
        return (lambda x_new, x_ref: x_new), (lambda v, x: v)

    st = cl.get("settle")
    settle_pos, settle_vel = _make_settle_fns(st) if st is not None else (None, None)
    if cl["n_clusters"] == 0:
        return settle_pos or (lambda x_new, x_ref: x_new), settle_vel or (
            lambda v, x: v
        )

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

    if settle_pos is None:
        return constrain_positions, constrain_velocities

    # waters and Newton clusters touch disjoint atom sets: compose freely
    def constrain_positions_both(x_new, x_ref):
        return constrain_positions(settle_pos(x_new, x_ref), x_ref)

    def constrain_velocities_both(v, x):
        return constrain_velocities(settle_vel(v, x), x)

    return constrain_positions_both, constrain_velocities_both
