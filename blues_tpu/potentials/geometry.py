"""Periodic geometry primitives (minimum image, distances, COM).

Replaces the mdtraj C kernels used by the reference's move layer
(compute_distances / quaternion utils, reference: blues/moves.py:299-300,990)
with few-line JAX functions that fuse into surrounding kernels.

Boxes are (3,3) row-vector matrices; orthorhombic boxes are the fast path
(diagonal). Triclinic reduced boxes use the general minimum-image formula.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def periodic_displacement(dr, box):
    """Minimum-image displacement vectors for box row-vectors ``box``.

    dr: (..., 3) raw displacement (xi - xj). Returns wrapped (..., 3).
    """
    if box is None:
        return dr
    box = jnp.asarray(box, dr.dtype)
    # triclinic-safe: subtract box rows by rounded fractional coords
    # (requires OpenMM-style reduced boxes; exact for orthorhombic)
    dr = dr - box[2] * jnp.round(dr[..., 2:3] / box[2, 2])
    dr = dr - box[1] * jnp.round(dr[..., 1:2] / box[1, 1])
    dr = dr - box[0] * jnp.round(dr[..., 0:1] / box[0, 0])
    return dr


def distance(dr, eps: float = 1e-12):
    """Safe norm with nonzero gradient at r=0 avoided via eps clamp."""
    return jnp.sqrt(jnp.maximum(jnp.sum(dr * dr, axis=-1), eps))


def center_of_mass(positions, masses):
    m = jnp.asarray(masses, positions.dtype)
    return jnp.sum(positions * m[:, None], axis=0) / jnp.sum(m)


def wrap_to_box(positions, box):
    """Wrap positions into the primary periodic cell (orthorhombic)."""
    blen = jnp.diagonal(box)
    return positions - blen * jnp.floor(positions / blen)


def random_rotation_matrix(key, dtype=jnp.float32):
    """Uniform random rotation via a uniform quaternion (Shoemake), the
    same construction as mdtraj.utils.uniform_quaternion used by the
    reference's RandomLigandRotationMove (blues/moves.py:299-300)."""
    u = jax.random.uniform(key, (3,), dtype)
    q = jnp.array(
        [
            jnp.sqrt(1.0 - u[0]) * jnp.sin(2.0 * jnp.pi * u[1]),
            jnp.sqrt(1.0 - u[0]) * jnp.cos(2.0 * jnp.pi * u[1]),
            jnp.sqrt(u[0]) * jnp.sin(2.0 * jnp.pi * u[2]),
            jnp.sqrt(u[0]) * jnp.cos(2.0 * jnp.pi * u[2]),
        ],
        dtype=dtype,
    )
    return rotation_matrix_from_quaternion(q)


def rotation_matrix_from_quaternion(q):
    """3x3 rotation matrix from quaternion (w, x, y, z) ordering mdtraj uses
    after Shoemake sampling (x, y, z, w ordering handled by caller)."""
    x, y, z, w = q[0], q[1], q[2], q[3]
    return jnp.array(
        [
            [1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)],
            [2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)],
            [2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)],
        ],
        q.dtype,
    )


def axis_angle_rotation_matrix(axis, theta):
    """Rotation about ``axis`` by ``theta`` (Euler-Rodrigues), the same
    operation as the reference SideChainMove.rotation_matrix
    (blues/moves.py:731-750)."""
    axis = axis / distance(axis)
    a = jnp.cos(theta / 2.0)
    bcd = -axis * jnp.sin(theta / 2.0)
    b, c, d = bcd[0], bcd[1], bcd[2]
    aa, bb, cc, dd = a * a, b * b, c * c, d * d
    bc, ad, ac, ab, bd, cd = b * c, a * d, a * c, a * b, b * d, c * d
    return jnp.array(
        [
            [aa + bb - cc - dd, 2 * (bc + ad), 2 * (bd - ac)],
            [2 * (bc - ad), aa + cc - bb - dd, 2 * (cd + ab)],
            [2 * (bd + ac), 2 * (cd - ab), aa + dd - bb - cc],
        ],
        theta.dtype if hasattr(theta, "dtype") else jnp.float32,
    )


def kabsch_align(P, Q, weights=None):
    """Optimal rigid superposition of point set P onto Q (least squares).

    Returns (R, com_P, com_Q) such that ``(P - com_P) @ R.T + com_Q`` is
    the aligned copy of P. Kabsch algorithm via 3x3 SVD with the
    determinant correction (proper rotation, no reflection) — the JAX
    equivalent of mdtraj's Theobald-QCP ``superpose`` C kernel the
    reference uses for pose darting (blues/posedart.py:145-146; SURVEY.md
    2.3 mdtraj-kernel row). Jittable and differentiable.
    """
    if weights is None:
        w = jnp.full(P.shape[0], 1.0 / P.shape[0], P.dtype)
    else:
        w = jnp.asarray(weights, P.dtype)
        w = w / jnp.sum(w)
    com_P = jnp.sum(P * w[:, None], axis=0)
    com_Q = jnp.sum(Q * w[:, None], axis=0)
    Pc = P - com_P
    Qc = Q - com_Q
    H = Pc.T @ (Qc * w[:, None])  # (3, 3) weighted covariance
    U, _, Vt = jnp.linalg.svd(H)
    d = jnp.sign(jnp.linalg.det(Vt.T @ U.T))
    D = jnp.diag(jnp.array([1.0, 1.0, 1.0], P.dtype).at[2].set(d))
    R = Vt.T @ D @ U.T
    return R, com_P, com_Q


def superpose(P, Q, weights=None):
    """P rigidly superposed onto Q: ``(P - com_P) @ R.T + com_Q``."""
    R, com_P, com_Q = kabsch_align(P, Q, weights)
    return (P - com_P) @ R.T + com_Q


def random_sphere_point(key, radius, dtype=jnp.float32):
    """Uniform random point inside a sphere of ``radius`` (reference:
    blues/moves.py:898-918 _random_sphere_point)."""
    k1, k2 = jax.random.split(key)
    r = radius * jax.random.uniform(k1, (), dtype) ** (1.0 / 3.0)
    v = jax.random.normal(k2, (3,), dtype)
    return r * v / distance(v)
