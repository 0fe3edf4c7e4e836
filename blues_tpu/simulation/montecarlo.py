"""Pure Monte Carlo variant: instantaneous moves, no NCMC work protocol.

Equivalent of the reference MonteCarloSimulation
(blues/simulation.py:1260-1335): per iteration, ``mc_per_iter`` proposals
are made directly on the MD potential and accepted on a plain
-(dPE)/kT Metropolis criterion (_stepMC_/_acceptRejectMove,
reference :1274-1302), followed by an MD relaxation segment with freshly
resampled velocities. The whole iteration is one jitted function.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .. import units
from ..core.state import SimState, maxwell_boltzmann_velocities, pytree_dataclass
from ..core.system import System
from ..integrators.constraints import make_constraint_fns
from ..integrators.langevin import LangevinParams, make_md_step
from ..potentials.energy import make_energy_fn, make_force_fn
from .driver import SimulationConfig


@pytree_dataclass
class MCStats:
    accepted: jax.Array  # (mc_per_iter,) bools
    delta_pe: jax.Array  # (mc_per_iter,)
    md_potential: jax.Array


class MonteCarloSimulation:
    def __init__(self, system: System, move, config: SimulationConfig, mc_per_iter: int = 1):
        self.system = system
        self.move = move
        self.cfg = config
        self.mc_per_iter = mc_per_iter
        self.energy = make_energy_fn(
            system.replace(alchemical=None),
            nonbonded_method=config.nonbonded_method,
            cutoff=config.cutoff,
            switch_distance=config.switch_distance,
            ewald_tolerance=config.ewald_tolerance,
            nonbonded_backend=config.nonbonded_backend,
        )
        self.force = make_force_fn(self.energy)
        cx, cv = make_constraint_fns(system.constraints, system.masses, tol=config.constraint_tolerance)
        self._constrain = (cx, cv)
        lp = LangevinParams(config.dt, config.friction, config.temperature)
        self._md_step = make_md_step(self.force, system.masses, lp, cx, cv)
        self._kT = units.kT(config.temperature)
        self._iteration = jax.jit(self._build_iteration())
        self.state: Optional[SimState] = None
        self.stats_history: list = []

    def _build_iteration(self):
        cfg = self.cfg
        kT = self._kT
        energy = self.energy
        move = self.move
        md_step = self._md_step
        n_md = cfg.nstepsMD
        mc_per_iter = self.mc_per_iter

        def mc_step(carry, _):
            # box rides the scan carry so periodic systems (PME / cutoff
            # minimum-image) get correct proposal energies, matching the MD
            # stage of the same iteration
            x, key, box = carry
            key, ksel, kp, ka = jax.random.split(key, 4)
            e0 = energy(x, box, None)
            x_new, _ = move.propose(kp, x, box, move.select(ksel))
            e1 = energy(x_new, box, None)
            d = (e1 - e0) / kT
            accept = jnp.isfinite(d) & (
                -d > jnp.log(jax.random.uniform(ka, (), x.dtype))
            )
            x = jnp.where(accept, x_new, x)
            return (x, key, box), (accept, e1 - e0)

        def iteration(x, v, key, box):
            (x, key, box), (accepts, dpes) = jax.lax.scan(
                mc_step, (x, key, box), None, length=mc_per_iter
            )
            key, kv = jax.random.split(key)
            v = maxwell_boltzmann_velocities(kv, self.system.masses, cfg.temperature, x.dtype)
            v = self._constrain[1](v, x)
            _, f0 = self.force(x, box, None)
            carry = (x, v, f0, key, box)
            if n_md > 0:
                carry, _ = jax.lax.scan(md_step, carry, None, length=n_md)
            x, v, _, key, _ = carry
            e_end = energy(x, box, None)
            return x, v, key, MCStats(accepted=accepts, delta_pe=dpes, md_potential=e_end)

        return iteration

    def initialize(self, positions, box=None, key=None):
        if key is None:
            key = jax.random.PRNGKey(0)
        box = jnp.asarray(
            box if box is not None else (self.system.box if self.system.box is not None else np.eye(3) * 999.0),
            jnp.float32,
        )
        key, kv = jax.random.split(key)
        x = jnp.asarray(positions, jnp.float32)
        v = maxwell_boltzmann_velocities(kv, self.system.masses, self.cfg.temperature)
        self.state = SimState(x, v, box, key)
        return self.state

    def run(self, n_iter: Optional[int] = None):
        n_iter = n_iter if n_iter is not None else self.cfg.nIter
        n_acc = n_tot = 0
        for _ in range(n_iter):
            s = self.state
            x, v, key, stats = self._iteration(s.positions, s.velocities, s.rng_key, s.box)
            self.state = SimState(x, v, s.box, key)
            self.stats_history.append(jax.tree.map(np.asarray, stats))
            acc = np.asarray(stats.accepted)
            n_acc += acc.sum()
            n_tot += acc.size
        return n_acc / max(n_tot, 1)
