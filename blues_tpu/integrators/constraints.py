"""Holonomic distance constraints: vectorized SHAKE / RATTLE.

TPU-native replacement for OpenMM's C++ SHAKE/SETTLE/CCMA solvers, which
every reference config relies on (`constraints: HBonds`, `rigidWater: True`,
reference: blues/settings.py:218, examples/rotmove_cuda.yml:22-23; the
integrator programs call addConstrainPositions/Velocities,
reference: blues/integrators.py:168-169).

All constraints are iterated Jacobi-style in parallel (one scatter-add per
sweep over the whole constraint list) inside a `lax.while_loop` with a
relative tolerance, so the solver jits into MD/NCMC scans and vmaps over
replicas. H-bond clusters are tiny (<= 3 coupled constraints), so Jacobi
converges in a handful of sweeps.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..core.system import Constraints

DEFAULT_TOL = 1e-6  # relative; OpenMM default 1e-8 needs f64
MAX_ITER = 100


def make_constraint_fns(constraints: Constraints, masses, tol: float = DEFAULT_TOL):
    """Build (constrain_positions, constrain_velocities) for a system.

    Both are identity functions when the system has no constraints.
    constrain_positions(x_new, x_ref) projects x_new onto the constraint
    manifold using reference directions from x_ref (standard SHAKE).
    constrain_velocities(v, x) removes velocity components along constrained
    bonds (RATTLE projection).
    """
    if len(constraints) == 0:
        return (lambda x_new, x_ref: x_new), (lambda v, x: v)

    idx_i = np.asarray(constraints.idx[:, 0], np.int32)
    idx_j = np.asarray(constraints.idx[:, 1], np.int32)
    d0 = np.asarray(constraints.dist, np.float64)
    masses = np.asarray(masses, np.float64)
    invm = np.where(masses > 0, 1.0 / np.maximum(masses, 1e-30), 0.0)
    invm_i = invm[idx_i]
    invm_j = invm[idx_j]
    red_mass = invm_i + invm_j
    n_atoms = masses.shape[0]

    def constrain_positions(x_new, x_ref):
        dtype = x_new.dtype
        d2 = jnp.asarray(d0 * d0, dtype)
        im_i = jnp.asarray(invm_i, dtype)[:, None]
        im_j = jnp.asarray(invm_j, dtype)[:, None]
        rm = jnp.asarray(red_mass, dtype)
        dr_ref = x_ref[idx_i] - x_ref[idx_j]

        def cond(carry):
            _, it, err = carry
            return (it < MAX_ITER) & (err > tol)

        def body(carry):
            x, it, _ = carry
            dr = x[idx_i] - x[idx_j]
            r2 = jnp.sum(dr * dr, -1)
            diff = r2 - d2
            denom = 2.0 * rm * jnp.sum(dr * dr_ref, -1)
            g = diff / jnp.where(jnp.abs(denom) > 1e-12, denom, 1e-12)
            # Jacobi under-relaxation for stability of coupled clusters
            g = 0.9 * g
            dx = g[:, None] * dr_ref
            x = x.at[idx_i].add(-im_i * dx)
            x = x.at[idx_j].add(im_j * dx)
            err = jnp.max(jnp.abs(diff) / d2)
            return x, it + 1, err

        x, _, _ = jax.lax.while_loop(
            cond, body, (x_new, jnp.zeros((), jnp.int32), jnp.asarray(jnp.inf, dtype))
        )
        return x

    def constrain_velocities(v, x):
        dtype = v.dtype
        d2 = jnp.asarray(d0 * d0, dtype)
        im_i = jnp.asarray(invm_i, dtype)[:, None]
        im_j = jnp.asarray(invm_j, dtype)[:, None]
        rm = jnp.asarray(red_mass, dtype)
        dr = x[idx_i] - x[idx_j]

        def cond(carry):
            _, it, err = carry
            return (it < MAX_ITER) & (err > tol)

        def body(carry):
            v, it, _ = carry
            rv = jnp.sum((v[idx_i] - v[idx_j]) * dr, -1)
            g = rv / (rm * d2)
            dv = g[:, None] * dr
            v = v.at[idx_i].add(-im_i * dv)
            v = v.at[idx_j].add(im_j * dv)
            # relative residual in velocity units
            err = jnp.max(jnp.abs(rv) / d2)
            return v, it + 1, err

        v, _, _ = jax.lax.while_loop(
            cond, body, (v, jnp.zeros((), jnp.int32), jnp.asarray(jnp.inf, dtype))
        )
        return v

    return constrain_positions, constrain_velocities
