"""Water translation (hopping) move — the reference's v0.2.5 headline
feature (WaterTranslationMove, reference: blues/moves.py:846-1083).

Protocol phases (all pure functions over the state):
  before: pick a random water within ``radius`` of the protein COM and swap
          its positions AND velocities with the designated *alchemical*
          water (reference :951-1006). If none is in range, no swap happens
          and the midpoint move is skipped (the reference's ``self.go``
          flag).
  propose: translate the alchemical water to a uniform random point in the
          sphere of ``radius`` about the protein COM (reference :1018-1048,
          _random_sphere_point :898-918).
  after: if the alchemical water ends outside the sphere, veto — the
          reference poisons protocol_work to 999999 (:1050-1083).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..potentials.geometry import periodic_displacement, random_sphere_point
from .base import Move


class WaterTranslationMove(Move):

    teleports = True
    def __init__(
        self,
        topology,
        masses,
        protein_atoms,
        radius: float = 2.0,
        water_resnames=("WAT", "HOH"),
        alchemical_water: int | None = None,
    ):
        """topology: core.system.Topology; protein_atoms: indices defining
        the COM the sphere is centered on; radius in nm."""
        self.radius = float(radius)
        waters = {}
        for i, rn in enumerate(topology.residue_names):
            if rn in water_resnames:
                waters.setdefault(int(topology.residue_ids[i]), []).append(i)
        trip = [v for v in waters.values() if len(v) >= 3]
        if not trip:
            raise ValueError("no waters found in topology")
        self.water_atoms = np.asarray([v[:3] for v in trip], np.int32)  # (W, 3)
        # the first water is the designated alchemical water (reference :889)
        self.alch_water = (
            self.water_atoms[0]
            if alchemical_water is None
            else self.water_atoms[alchemical_water]
        )
        self.other_waters = self.water_atoms[1:] if alchemical_water is None else np.array(
            [w for k, w in enumerate(self.water_atoms) if k != alchemical_water], np.int32
        )
        self.protein_atoms = np.asarray(protein_atoms, np.int32)
        self.protein_masses = np.asarray(masses, np.float64)[self.protein_atoms]

    def _com(self, x):
        m = jnp.asarray(self.protein_masses, x.dtype)[:, None]
        return jnp.sum(x[self.protein_atoms] * m, 0) / jnp.sum(m)

    def init_aux(self):
        return {"swapped": jnp.zeros((), bool)}

    def before(self, key, x, v, box):
        com = self._com(x)
        o_idx = self.other_waters[:, 0]
        d = jnp.linalg.norm(periodic_displacement(x[o_idx] - com, box), axis=-1)
        within = d < self.radius
        any_within = jnp.any(within)
        # uniform choice among waters in range (guard: if none, p is unused)
        p = jnp.where(within, 1.0, 0.0)
        p = p / jnp.maximum(jnp.sum(p), 1.0)
        chosen = jax.random.choice(key, o_idx.shape[0], p=p)
        sel = jnp.asarray(self.other_waters)[chosen]  # (3,) atom indices
        alch = jnp.asarray(self.alch_water)

        def swap(arr):
            a_vals = arr[alch]
            s_vals = arr[sel]
            arr = arr.at[alch].set(jnp.where(any_within, s_vals, a_vals))
            arr = arr.at[sel].set(jnp.where(any_within, a_vals, s_vals))
            return arr

        return swap(x), swap(v), {"swapped": any_within}

    def propose(self, key, x, box, aux):
        com = self._com(x)
        alch = jnp.asarray(self.alch_water)
        point = com + random_sphere_point(key, self.radius, x.dtype)
        w = x[alch]
        offsets = w - w[0]
        new_w = point[None, :] + offsets
        new_x = x.at[alch].set(new_w)
        return jnp.where(aux["swapped"], 1.0, 0.0) * (new_x - x) + x, aux

    def after(self, key, x, box, aux):
        com = self._com(x)
        o = x[jnp.asarray(self.alch_water)[0]]
        d = jnp.linalg.norm(periodic_displacement(o - com, box))
        return aux["swapped"] & (d > self.radius)
