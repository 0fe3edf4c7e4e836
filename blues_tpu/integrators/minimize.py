"""Energy minimization: FIRE descent, jit-scanned.

Replaces OpenMM's LocalEnergyMinimizer (L-BFGS, C++) used by the reference
before MD (reference: blues/tests/test_simulation.py:139-141). FIRE
(Bitzek et al. 2006) is robust from clashy starting points (the stored
Amber test boxes contain overlaps), has no line search — so it maps onto a
fixed-iteration `lax.scan` — and needs only the same fused energy+force
evaluation the integrators use. Frozen (zero-mass) atoms never move.
After descent, positions are projected back onto the constraint manifold.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np


def minimize_fire(
    force_fn: Callable,
    masses,
    x,
    box=None,
    globals_=None,
    *,
    n_steps: int = 1000,
    dt_start: float = 1e-4,
    dt_max: float = 2e-3,
    f_inc: float = 1.1,
    f_dec: float = 0.5,
    alpha_start: float = 0.1,
    f_alpha: float = 0.99,
    n_min: int = 5,
    constrain_x=None,
):
    """Minimize energy with FIRE; returns (x_min, final_energy).

    force_fn(x, box, globals) -> (E, F). Mobile mask from masses > 0.
    """
    masses = np.asarray(masses, np.float64)
    mobile = jnp.asarray((masses > 0)[:, None])

    def step(carry, _):
        x, v, dt, alpha, n_pos = carry
        e, f = force_fn(x, box, globals_)
        f = jnp.where(mobile, f, 0.0)
        # guard against NaN/inf forces from overlapping atoms: clip
        f = jnp.clip(jnp.nan_to_num(f, nan=0.0, posinf=1e8, neginf=-1e8), -1e8, 1e8)
        power = jnp.vdot(f, v)
        f_norm = jnp.sqrt(jnp.vdot(f, f)) + 1e-12
        v_norm = jnp.sqrt(jnp.vdot(v, v))
        v_mix = (1.0 - alpha) * v + alpha * f * (v_norm / f_norm)

        uphill = power <= 0.0
        v = jnp.where(uphill, jnp.zeros_like(v), v_mix)
        n_pos = jnp.where(uphill, 0, n_pos + 1)
        grow = (~uphill) & (n_pos > n_min)
        dt = jnp.where(grow, jnp.minimum(dt * f_inc, dt_max), jnp.where(uphill, dt * f_dec, dt))
        alpha = jnp.where(grow, alpha * f_alpha, jnp.where(uphill, alpha_start, alpha))

        # semi-implicit Euler with velocity and displacement caps: the cap on
        # |v| (not just |dx|) prevents runaway accumulation on the huge
        # forces of an overlapping start, which would otherwise carry the
        # system past minima once the landscape flattens
        max_disp = 0.01  # nm per step cap
        v = v + dt * f
        v_cap = max_disp / dt
        per_atom_v = jnp.sqrt(jnp.sum(v * v, -1, keepdims=True))
        v = jnp.where(per_atom_v > v_cap, v * (v_cap / (per_atom_v + 1e-12)), v)
        dx = dt * v
        dx_norm = jnp.sqrt(jnp.sum(dx * dx, -1, keepdims=True))
        dx = jnp.where(dx_norm > max_disp, dx * (max_disp / (dx_norm + 1e-12)), dx)
        x_new = x + jnp.where(mobile, dx, 0.0)
        if constrain_x is not None:
            # constrained minimization: project every step (constrained bonds
            # have no bonded energy term, so unconstrained descent would let
            # LJ-less hydrogens collapse onto neighboring charges)
            x_new = constrain_x(x_new, x)
        return (x_new, v, dt, alpha, n_pos), e

    # periodic cold restarts (v, dt, alpha reset) make descent robust from
    # strongly overlapping starts, where accumulated FIRE velocity otherwise
    # overshoots once the landscape flattens
    restart_len = 100
    n_restarts = max(1, n_steps // restart_len)

    def restart_block(carry, _):
        x, best_x, best_e = carry
        carry0 = (
            x,
            jnp.zeros_like(x),
            jnp.asarray(dt_start, x.dtype),
            jnp.asarray(alpha_start, x.dtype),
            jnp.zeros((), jnp.int32),
        )
        (x, _, _, _, _), energies = jax.lax.scan(step, carry0, None, length=restart_len)
        # FIRE is dynamics, not strict descent: keep the best state seen
        # (block energies are evaluated pre-step; the block end state is
        # scored against the running best via its own energy)
        e_end, _ = force_fn(x, box, globals_)
        block_best = jnp.min(energies)
        improved = e_end < best_e
        best_x = jnp.where(improved, x, best_x)
        best_e = jnp.where(improved, e_end, best_e)
        # continue from wherever we are unless the block diverged badly
        diverged = e_end > best_e + jnp.abs(best_e) * 0.5 + 1e3
        x = jnp.where(diverged, best_x, x)
        return (x, best_x, best_e), None

    if constrain_x is not None:
        x = constrain_x(x, x)
    e0, _ = force_fn(x, box, globals_)
    (x, best_x, best_e), _ = jax.lax.scan(
        restart_block, (x, x, e0), None, length=n_restarts
    )
    e_final, _ = force_fn(x, box, globals_)
    final_better = e_final < best_e
    x = jnp.where(final_better, x, best_x)
    e_final = jnp.where(final_better, e_final, best_e)
    return x, e_final
