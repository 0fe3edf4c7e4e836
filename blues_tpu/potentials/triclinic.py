"""Triclinic periodic boxes: reduction, minimum image, PME lattice sums.

The reference's systems are all orthorhombic water boxes, but OpenMM (and
Amber) support triclinic cells; this module supplies the general-lattice
pieces so the dense backend + PME compose for them (completeness item,
docs/roadmap.md). Conventions follow OpenMM:

  * the box is a lower-triangular 3x3 matrix of row vectors a, b, c with
    ax > 0, by > 0, cz > 0;
  * vectors are *reduced* so |bx| <= ax/2, |cx| <= ax/2, |cy| <= by/2
    (OpenMM reduceBoxVectors) — any lattice-equivalent cell maps to the
    same reduced form, and the staircase minimum image below is then exact
    for distances up to half the smallest reduced width.

Minimum image (staircase): subtract c*round(dz/cz), then b*round(dy/by),
then a*round(dx/ax) — exact for reduced cells within the cutoff regime
OpenMM enforces (cutoff <= half the periodic box width).
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp


def reduce_box_vectors(box):
    """Reduce a (possibly lattice-skewed) lower-triangular box to OpenMM's
    canonical reduced form. numpy, build-time."""
    box = np.asarray(box, np.float64).copy()
    a, b, c = box[0].copy(), box[1].copy(), box[2].copy()
    if not (abs(a[1]) < 1e-12 and abs(a[2]) < 1e-12 and abs(b[2]) < 1e-12):
        raise ValueError(
            "triclinic boxes must be lower-triangular (a along x, b in xy)"
        )
    c -= b * np.round(c[1] / b[1])
    c -= a * np.round(c[0] / a[0])
    b -= a * np.round(b[0] / a[0])
    return np.stack([a, b, c])


def is_triclinic(box) -> bool:
    box = np.asarray(box)
    off = box[np.tril_indices(3, -1)]
    return bool(np.abs(off).max() > 1e-10) if off.size else False


def triclinic_displacement(dr, box):
    """Minimum-image displacement for a reduced lower-triangular box
    (staircase method). dr: (..., 3); box: (3, 3) row vectors."""
    a = box[0]
    b = box[1]
    c = box[2]
    dr = dr - c * jnp.round(dr[..., 2:3] / c[2])
    dr = dr - b * jnp.round(dr[..., 1:2] / b[1])
    dr = dr - a * jnp.round(dr[..., 0:1] / a[0])
    return dr


def fractional_coords(x, box):
    """x -> fractional coordinates u in [0, 1) for a lower-triangular box
    (used by the PME spread). u = x @ inv(H^T) for row-vector convention:
    x = u @ H, so u = x @ inv(H)."""
    inv = jnp.linalg.inv(box)
    u = x @ inv
    return u - jnp.floor(u)


def reciprocal_m2(mx, my, mz, box):
    """|m @ H^-1|^2 for integer mode triplets — the general-lattice
    replacement of (m/L)^2 in the PME influence function. mx/my/mz are the
    aliased integer mode arrays along each axis; returns the (Kx, Ky, Kz[h])
    grid of squared reciprocal-vector magnitudes."""
    inv = jnp.linalg.inv(box)  # rows: a*, columns mapping
    # reciprocal vector for modes (i, j, k): g = i*inv[:,0] ... careful:
    # x = u @ H; plane-wave exp(2 pi i m·u) has wavevector k = m @ inv(H)
    g = inv  # (3, 3): k = m_x * inv[0] + m_y * inv[1] + m_z * inv[2]? No:
    # u = x @ inv  =>  m·u = x @ (inv @ m)  => k_vec = inv @ m (column form)
    gx = inv[:, 0]
    gy = inv[:, 1]
    gz = inv[:, 2]
    # k = mx*row? Derive: m·u = sum_d m_d u_d, u = x @ inv => u_d = sum_e x_e inv[e, d]
    # m·u = sum_e x_e (sum_d inv[e, d] m_d) => k_e = sum_d inv[e, d] m_d
    kx = (
        mx[:, None, None] * inv[0, 0]
        + my[None, :, None] * inv[0, 1]
        + mz[None, None, :] * inv[0, 2]
    )
    ky = (
        mx[:, None, None] * inv[1, 0]
        + my[None, :, None] * inv[1, 1]
        + mz[None, None, :] * inv[1, 2]
    )
    kz = (
        mx[:, None, None] * inv[2, 0]
        + my[None, :, None] * inv[2, 1]
        + mz[None, None, :] * inv[2, 2]
    )
    return kx * kx + ky * ky + kz * kz
