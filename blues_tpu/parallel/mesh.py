"""Multi-chip scaling: replica data-parallelism over a device mesh.

The reference is strictly single-device (SURVEY.md 2.4); its only
"parallelism" is sequential seed repeats (reference:
tests/test_ethylene.py:140-141). The TPU-native scaling model is a 1-D
``replica`` mesh: each chip runs a batch of vmapped NCMC replicas, sharded
with `jax.sharding.NamedSharding`; XLA inserts the (tiny) collectives for
gathered statistics. Replicas never communicate during an iteration, so
scaling is embarrassingly linear over ICI and DCN alike.

For single very large systems, spatial sharding of the pair kernel would be
the tensor-parallel analog (SURVEY.md 5.7) — out of scope for the <= 50k
atom baseline systems, which fit comfortably on one chip.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_replica_mesh(devices=None, axis_name: str = "replica") -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def shard_simulation_state(sim, mesh: Mesh, axis_name: str = "replica"):
    """Place a BLUESSimulation's replica-batched state on the mesh
    (replica axis sharded, box replicated)."""
    if sim.cfg.n_replicas % mesh.devices.size != 0:
        raise ValueError(
            f"n_replicas={sim.cfg.n_replicas} must divide over {mesh.devices.size} devices"
        )
    batched = NamedSharding(mesh, P(axis_name))
    s = sim.state
    sim.state = type(s)(
        positions=jax.device_put(s.positions, batched),
        velocities=jax.device_put(s.velocities, batched),
        box=jax.device_put(s.box, batched),
        rng_key=jax.device_put(s.rng_key, batched),
    )
    return sim.state


def make_sharded_iteration(sim, mesh: Mesh, axis_name: str = "replica"):
    """Jit the (already replica-vmapped) iteration with explicit shardings.

    Returns step(state) -> (state, stats, frames) where all replica-batched
    leaves are sharded over the mesh.
    """
    batched = NamedSharding(mesh, P(axis_name))
    replicated = NamedSharding(mesh, P())

    raw = sim._iteration  # vmapped, jitted; re-jit underlying with shardings
    fn = getattr(raw, "__wrapped__", raw)

    # pytree-prefix shardings: the leading spec broadcasts over the state
    # tuple (x, v, box[, barostat_state]) and every stats/frames leaf, so the
    # jit signature tracks driver state-structure changes automatically
    step = jax.jit(
        fn,
        in_shardings=(batched, batched),
        out_shardings=(batched, batched, batched, batched),
    )
    return step
