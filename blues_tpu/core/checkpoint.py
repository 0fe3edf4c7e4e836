"""Full simulation checkpointing.

The reference only supports "soft" restarts — an rst7 with positions/
velocities/box written by RestartReporter; RNG state, iteration counter,
and acceptance statistics are lost (SURVEY.md 5.4). Here a checkpoint is
the complete SimState pytree (positions, velocities, box, rng keys — any
replica batch shape) plus driver counters, written as a compressed .npz;
`load_checkpoint` restores a bitwise-identical continuation point.
rst7 compatibility lives in core.amber_coords / reporters.RestartReporter.
"""

from __future__ import annotations

import json

import jax
import numpy as np

from .state import SimState

FORMAT_VERSION = 1


def save_checkpoint(path: str, sim) -> None:
    """Checkpoint a BLUESSimulation (or MonteCarloSimulation)."""
    s = sim.state
    if s is None:
        raise RuntimeError("simulation has no state to checkpoint")
    meta = {
        "format_version": FORMAT_VERSION,
        "iteration_count": getattr(sim, "iteration_count", 0),
        "accept_counter": getattr(sim, "accept_counter", 0),
        "n_replicas": sim.cfg.n_replicas,
        "n_atoms": sim.system.n_atoms,
    }
    extra = {}
    bstate = getattr(sim, "barostat_state", None)
    if bstate is not None:
        extra["barostat_volume_scale"] = np.asarray(bstate.volume_scale)
        extra["barostat_n_attempted"] = np.asarray(bstate.n_attempted)
        extra["barostat_n_accepted"] = np.asarray(bstate.n_accepted)
    if getattr(sim, "move_stats", None) is not None:
        extra["move_stats"] = np.asarray(sim.move_stats)
    np.savez_compressed(
        path,
        positions=np.asarray(s.positions),
        velocities=np.asarray(s.velocities),
        box=np.asarray(s.box),
        rng_key=np.asarray(s.rng_key),
        meta=json.dumps(meta),
        **extra,
    )


def load_checkpoint(path: str, sim) -> SimState:
    """Restore state + counters into an existing simulation object."""
    import jax.numpy as jnp

    data = np.load(path, allow_pickle=False)
    meta = json.loads(str(data["meta"]))
    if meta["n_atoms"] != sim.system.n_atoms:
        raise ValueError(
            f"checkpoint is for {meta['n_atoms']} atoms, system has {sim.system.n_atoms}"
        )
    if meta["n_replicas"] != sim.cfg.n_replicas:
        raise ValueError(
            f"checkpoint has n_replicas={meta['n_replicas']}, config has {sim.cfg.n_replicas}"
        )
    key = jnp.asarray(data["rng_key"])
    # uint32 raw keys round-trip as plain arrays
    sim.state = SimState(
        positions=jnp.asarray(data["positions"]),
        velocities=jnp.asarray(data["velocities"]),
        box=jnp.asarray(data["box"]),
        rng_key=key,
    )
    sim.iteration_count = meta["iteration_count"]
    sim.accept_counter = meta["accept_counter"]
    if "barostat_volume_scale" in data and hasattr(sim, "barostat_state"):
        from ..integrators.barostat import BarostatState

        sim.barostat_state = BarostatState(
            volume_scale=jnp.asarray(data["barostat_volume_scale"]),
            n_attempted=jnp.asarray(data["barostat_n_attempted"]),
            n_accepted=jnp.asarray(data["barostat_n_accepted"]),
        )
    if "move_stats" in data and hasattr(sim, "move_stats"):
        sim.move_stats = np.asarray(data["move_stats"])
    return sim.state
