"""Bonded energy terms: bonds, angles, torsions, restraints, centroid tether.

TPU-native replacements for OpenMM's HarmonicBondForce / HarmonicAngleForce /
PeriodicTorsionForce / CustomExternalForce / CustomCentroidBondForce used by
every reference system (see forces list in
reference: blues/tests/data/ethylene_system.xml and
blues/simulation.py:347-360). Each term is a vectorized gather + reduction —
elementwise VPU work that XLA fuses into the surrounding force computation;
atom counts are tiny compared to nonbonded so no Pallas kernel is warranted.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core.system import (
    CentroidRestraint,
    HarmonicAngles,
    HarmonicBonds,
    PeriodicTorsions,
    PositionRestraints,
)
from .geometry import distance, periodic_displacement


def bond_energy(positions, bonds: HarmonicBonds, box=None):
    if len(bonds) == 0:
        return jnp.zeros((), positions.dtype)
    xi = positions[bonds.idx[:, 0]]
    xj = positions[bonds.idx[:, 1]]
    r = distance(xi - xj)
    k = jnp.asarray(bonds.k, positions.dtype)
    r0 = jnp.asarray(bonds.length, positions.dtype)
    return jnp.sum(0.5 * k * (r - r0) ** 2)


def angle_energy(positions, angles: HarmonicAngles, box=None):
    if len(angles) == 0:
        return jnp.zeros((), positions.dtype)
    xi = positions[angles.idx[:, 0]]
    xj = positions[angles.idx[:, 1]]
    xk = positions[angles.idx[:, 2]]
    a = xi - xj
    b = xk - xj
    cos_t = jnp.sum(a * b, -1) / (distance(a) * distance(b))
    theta = jnp.arccos(jnp.clip(cos_t, -1.0 + 1e-7, 1.0 - 1e-7))
    k = jnp.asarray(angles.k, positions.dtype)
    t0 = jnp.asarray(angles.theta0, positions.dtype)
    return jnp.sum(0.5 * k * (theta - t0) ** 2)


def torsion_energy(positions, torsions: PeriodicTorsions, box=None):
    if len(torsions) == 0:
        return jnp.zeros((), positions.dtype)
    xi = positions[torsions.idx[:, 0]]
    xj = positions[torsions.idx[:, 1]]
    xk = positions[torsions.idx[:, 2]]
    xl = positions[torsions.idx[:, 3]]
    b1 = xj - xi
    b2 = xk - xj
    b3 = xl - xk
    n1 = jnp.cross(b1, b2)
    n2 = jnp.cross(b2, b3)
    m1 = jnp.cross(n1, b2 / distance(b2)[..., None])
    x = jnp.sum(n1 * n2, -1)
    y = jnp.sum(m1 * n2, -1)
    phi = jnp.arctan2(y, x)
    k = jnp.asarray(torsions.k, positions.dtype)
    n = jnp.asarray(torsions.periodicity, positions.dtype)
    phase = jnp.asarray(torsions.phase, positions.dtype)
    return jnp.sum(k * (1.0 + jnp.cos(n * phi - phase)))


def position_restraint_energy(positions, restraints: PositionRestraints, box=None):
    """E = k * periodicdistance(x, x0)^2 (no 1/2 factor; reference:
    blues/simulation.py:347)."""
    dr = positions[restraints.idx] - jnp.asarray(restraints.x0, positions.dtype)
    dr = periodic_displacement(dr, box)
    return restraints.k * jnp.sum(dr * dr)


def centroid_restraint_energy(positions, rest: CentroidRestraint, box=None):
    w1 = jnp.asarray(rest.weights1, positions.dtype)[:, None]
    w2 = jnp.asarray(rest.weights2, positions.dtype)[:, None]
    c1 = jnp.sum(positions[rest.group1] * w1, axis=0)
    c2 = jnp.sum(positions[rest.group2] * w2, axis=0)
    d = distance(c1 - c2)
    return 0.5 * rest.k * d * d
