"""Langevin dynamics: constrained BAOAB, jit-scanned.

Replaces OpenMM's LangevinIntegrator for the MD phase (reference:
blues/simulation.py:628-648) and provides the V/R/O substep machinery shared
with the NCMC protocol integrator. BAOAB (= the "V R O R V" splitting with
the O step in the middle) is used for MD: it has the best configurational
sampling accuracy of the Langevin splittings at large timesteps
(Leimkuhler & Matthews 2013; equivalent to GROMACS sd, arXiv:2204.02105).

Where the reference steps the device one step per Python call
(blues/simulation.py:1189-1213, the dominant overhead per SURVEY.md 3.2),
here the whole MD segment is one `lax.scan` under jit.
"""

from __future__ import annotations

import math
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .. import units


class LangevinParams(NamedTuple):
    dt: float  # ps
    friction: float  # 1/ps
    temperature: float  # K


def make_baoab_machinery(masses, params: LangevinParams, constrain_x, constrain_v):
    """Shared substep closures for BAOAB-style integrators.

    Returns dict with kick/drift/ou functions. Zero-mass atoms (frozen,
    reference: blues/utils.py:202-221) receive no updates anywhere because
    every update is proportional to the inverse mass.
    """
    masses = np.asarray(masses, np.float64)
    invm = np.where(masses > 0, 1.0 / np.maximum(masses, 1e-30), 0.0)
    kT = units.kT(params.temperature)
    a = math.exp(-params.friction * params.dt)
    b = math.sqrt(1.0 - a * a)
    sigma_v = np.sqrt(kT * invm)  # per-atom OU noise scale (0 for frozen)

    def kick(v, f, h, x):
        """v += h * f/m, then RATTLE."""
        dtype = v.dtype
        v = v + h * f * jnp.asarray(invm, dtype)[:, None]
        return constrain_v(v, x)

    def drift(x, v, h):
        """x += h * v, then SHAKE with velocity correction."""
        x_new_unc = x + h * v
        x_new = constrain_x(x_new_unc, x)
        v = v + (x_new - x_new_unc) / h
        return x_new, v

    def ou(v, key, x):
        """Full-dt Ornstein-Uhlenbeck heat-bath step, then RATTLE."""
        dtype = v.dtype
        noise = jax.random.normal(key, v.shape, dtype)
        v = a * v + b * jnp.asarray(sigma_v, dtype)[:, None] * noise
        return constrain_v(v, x)

    def ou_partial(v, key, x, h):
        """OU heat-bath over a sub-interval h (splittings with multiple O
        substeps, e.g. 'O V R V O'), then RATTLE."""
        ah = math.exp(-params.friction * h)
        bh = math.sqrt(1.0 - ah * ah)
        dtype = v.dtype
        noise = jax.random.normal(key, v.shape, dtype)
        v = ah * v + bh * jnp.asarray(sigma_v, dtype)[:, None] * noise
        return constrain_v(v, x)

    return {"kick": kick, "drift": drift, "ou": ou, "ou_partial": ou_partial, "invm": invm}


def make_md_step(force_fn: Callable, masses, params: LangevinParams, constrain_x, constrain_v):
    """One BAOAB MD step with force caching (1 force eval per step).

    force_fn(x, box, globals) -> (E, F). Carry: (x, v, f, key).
    """
    m = make_baoab_machinery(masses, params, constrain_x, constrain_v)
    h = params.dt / 2.0

    def step(carry, _):
        x, v, f, key, box = carry
        key, okey = jax.random.split(key)
        v = m["kick"](v, f, h, x)
        x, v = m["drift"](x, v, h)
        v = m["ou"](v, okey, x)
        x, v = m["drift"](x, v, h)
        e, f = force_fn(x, box, None)
        v = m["kick"](v, f, h, x)
        return (x, v, f, key, box), e

    return step


def run_md(
    force_fn: Callable,
    masses,
    params: LangevinParams,
    constrain_x,
    constrain_v,
    x,
    v,
    box,
    key,
    n_steps: int,
):
    """Run n_steps of BAOAB MD; returns (x, v, key, final_pe)."""
    step = make_md_step(force_fn, masses, params, constrain_x, constrain_v)
    _, f0 = force_fn(x, box, None)
    (x, v, f, key, box), energies = jax.lax.scan(
        step, (x, v, f0, key, box), None, length=n_steps
    )
    return x, v, key, energies[-1] if n_steps > 0 else jnp.zeros((), x.dtype)
