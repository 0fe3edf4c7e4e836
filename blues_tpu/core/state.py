"""Simulation state pytrees.

The reference shuttles state through `context.getState()` dicts keyed
positions/velocities/box_vectors/energies (blues/simulation.py:883-963).
Here state is a functional pytree: "getState"/"setState" are free, and the
whole MD <-> NCMC state sync (blues/simulation.py:1028-1037) is a pure
function. Batching over replicas is `jax.vmap` over the leading axes.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp


def pytree_dataclass(cls=None, *, meta_fields=()):
    """Register a dataclass as a JAX pytree (data fields traced)."""

    def wrap(c):
        c = dataclasses.dataclass(c)
        data_fields = tuple(
            f.name for f in dataclasses.fields(c) if f.name not in meta_fields
        )
        jax.tree_util.register_dataclass(c, data_fields, tuple(meta_fields))
        return c

    return wrap if cls is None else wrap(cls)


@pytree_dataclass
class SimState:
    """Dynamic state of one replica (or a batch, with leading axes)."""

    positions: jax.Array  # (N, 3) nm
    velocities: jax.Array  # (N, 3) nm/ps
    box: jax.Array  # (3, 3) nm
    rng_key: jax.Array  # jax PRNG key

    def replace(self, **kw) -> "SimState":
        return dataclasses.replace(self, **kw)


@pytree_dataclass
class KahanAccumulator:
    """Compensated (Kahan) f32 accumulator.

    TPU is float32-native; OpenMM accumulates work in double. Protocol work
    summed naively in f32 over 10k+ switching steps drifts by O(kT), which
    would bias acceptance. Kahan summation keeps the error at O(eps * |W|).
    """

    total: jax.Array
    compensation: jax.Array

    @classmethod
    def zeros(cls, dtype=jnp.float32, shape=()):
        return cls(jnp.zeros(shape, dtype), jnp.zeros(shape, dtype))

    def add(self, value) -> "KahanAccumulator":
        y = value - self.compensation
        t = self.total + y
        comp = (t - self.total) - y
        return KahanAccumulator(t, comp)

    @property
    def value(self):
        return self.total


@pytree_dataclass
class NaiveAccumulator:
    """Plain-sum accumulator with the KahanAccumulator interface — used to
    MEASURE the accumulation error Kahan removes (tools/
    run_production_protocol.py quantifies |dW| over a 10k-step protocol)."""

    total: jax.Array

    @classmethod
    def zeros(cls, dtype=jnp.float32, shape=()):
        return cls(jnp.zeros(shape, dtype))

    def add(self, value) -> "NaiveAccumulator":
        return NaiveAccumulator(self.total + value)

    @property
    def value(self):
        return self.total


def maxwell_boltzmann_velocities(key, masses, temperature: float, dtype=jnp.float32):
    """Sample velocities from the Maxwell-Boltzmann distribution.

    Zero-mass (frozen) atoms get zero velocity — the reference resamples MD
    velocities every iteration via context.setVelocitiesToTemperature
    (blues/simulation.py:1186-1187).
    """
    from .. import units

    masses = jnp.asarray(masses, dtype)
    n = masses.shape[0]
    inv_mass = jnp.where(masses > 0, 1.0 / jnp.maximum(masses, 1e-30), 0.0)
    sigma = jnp.sqrt(units.kT(temperature) * inv_mass)[:, None]
    return sigma * jax.random.normal(key, (n, 3), dtype)


def kinetic_energy(velocities, masses):
    m = jnp.asarray(masses, velocities.dtype)
    return 0.5 * jnp.sum(m[:, None] * velocities * velocities)


def instantaneous_temperature(velocities, masses):
    """Temperature from KE with DOF = 3 * n_mobile (no constraint/COM
    correction — matches a plain 2KE/(3N kB) estimate)."""
    from .. import units

    m = jnp.asarray(masses, velocities.dtype)
    n_mobile = jnp.sum(m > 0)
    ke = kinetic_energy(velocities, masses)
    return 2.0 * ke / (3.0 * n_mobile * units.BOLTZMANN_KJMOL)
