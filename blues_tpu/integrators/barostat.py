"""Monte Carlo barostat: isotropic volume moves for NPT MD.

Equivalent of OpenMM's MonteCarloBarostat, which the reference attaches to
the MD system only (NCMC has no pressure control — reference:
blues/simulation.py:602-626, 784-785; attempts every 25 steps,
:615-616). A volume move scales molecule centers of mass (not atom
positions individually, so constrained internal geometry is untouched) and
accepts on

    dW = dU + P dV - N_molecules kT ln(V'/V)

with the proposal size adapting toward ~50% acceptance, as OpenMM does.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .. import units
from ..core.system import System


class BarostatState(NamedTuple):
    volume_scale: jax.Array  # current max dV proposal (nm^3)
    n_attempted: jax.Array
    n_accepted: jax.Array


def molecule_ids(system: System) -> np.ndarray:
    """Connected components of the bond+constraint graph -> molecule id per
    atom (needed for COM scaling)."""
    n = system.n_atoms
    parent = np.arange(n)

    def find(a):
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    edges = [np.asarray(system.topology.bonds if system.topology is not None else system.bonds.idx)]
    edges.append(np.asarray(system.constraints.idx))
    for arr in edges:
        for i, j in arr.reshape(-1, 2):
            ri, rj = find(int(i)), find(int(j))
            if ri != rj:
                parent[ri] = rj
    roots = np.array([find(a) for a in range(n)])
    _, ids = np.unique(roots, return_inverse=True)
    return ids.astype(np.int32)


def make_barostat(
    system: System,
    energy_fn,
    pressure: float,  # kJ/(mol nm^3); use units.BAR_TO_KJMOL_PER_NM3 * bar
    temperature: float,
    initial_scale_fraction: float = 0.01,
):
    """Build barostat_step(x, box, key, bstate) -> (x, box, bstate).

    energy_fn(x, box, globals) -> potential energy.
    """
    mol_id = molecule_ids(system)
    n_mol = int(mol_id.max()) + 1
    masses = np.asarray(system.masses, np.float64)
    # frozen atoms (zero mass) should not be scaled: freeze their molecules
    mol_mass = np.zeros(n_mol)
    np.add.at(mol_mass, mol_id, masses)
    mol_mobile = np.zeros(n_mol)
    np.add.at(mol_mobile, mol_id, (masses > 0).astype(np.float64))
    movable = mol_mobile > 0
    n_movable = int(movable.sum())
    kT = units.kT(temperature)
    mol_id_j = jnp.asarray(mol_id)
    mol_mass_j = jnp.asarray(np.maximum(mol_mass, 1e-30))
    movable_j = jnp.asarray(movable.astype(np.float32))

    def init_state(box) -> BarostatState:
        v0 = float(np.prod(np.diagonal(np.asarray(box))))
        return BarostatState(
            volume_scale=jnp.asarray(initial_scale_fraction * v0, jnp.float32),
            n_attempted=jnp.zeros((), jnp.int32),
            n_accepted=jnp.zeros((), jnp.int32),
        )

    def barostat_step(x, box, key, bstate: BarostatState):
        dtype = x.dtype
        k1, k2 = jax.random.split(key)
        blen = jnp.diagonal(box)
        v0 = blen[0] * blen[1] * blen[2]
        dv = (2.0 * jax.random.uniform(k1, (), dtype) - 1.0) * bstate.volume_scale
        v1 = v0 + dv
        s = (v1 / v0) ** (1.0 / 3.0)

        # scale molecule COMs; internal geometry fixed
        m = jnp.asarray(masses, dtype)[:, None]
        com_sum = jax.ops.segment_sum(x * m, mol_id_j, n_mol)
        com = com_sum / mol_mass_j[:, None]
        shift = (s - 1.0) * com * movable_j[:, None]
        x_new = x + shift[mol_id_j]
        box_new = box * s

        e0 = energy_fn(x, box, None)
        e1 = energy_fn(x_new, box_new, None)
        dw = (e1 - e0) + pressure * dv - n_movable * kT * jnp.log(v1 / v0)
        accept = (dw <= 0) | (
            jax.random.uniform(k2, (), dtype) < jnp.exp(-dw / kT)
        )
        accept = accept & jnp.isfinite(dw)

        x = jnp.where(accept, x_new, x)
        box = jnp.where(accept, box_new, box)
        n_att = bstate.n_attempted + 1
        n_acc = bstate.n_accepted + accept.astype(jnp.int32)
        # OpenMM-style adaptive proposal size every 10 attempts
        ratio = n_acc.astype(dtype) / jnp.maximum(n_att.astype(dtype), 1.0)
        adjust = jnp.where(
            n_att % 10 == 0,
            jnp.where(ratio < 0.25, 0.9, jnp.where(ratio > 0.75, 1.1, 1.0)),
            1.0,
        )
        scale = jnp.clip(bstate.volume_scale * adjust, 1e-5 * v0, 0.3 * v0)
        return x, box, BarostatState(scale, n_att, n_acc)

    barostat_step.init_state = init_state
    return barostat_step
