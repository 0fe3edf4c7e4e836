"""Random rigid-body rotation of a ligand about its center of mass.

Equivalent of the reference RandomLigandRotationMove
(reference: blues/moves.py:148-310): draw a uniform random rotation
(Shoemake quaternion, as mdtraj.utils.uniform_quaternion does), rotate the
ligand atoms about their center of mass, leave everything else unchanged.
The proposal is volume-preserving and symmetric, so it needs no Jacobian.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..potentials.geometry import random_rotation_matrix
from .base import Move


class RandomLigandRotationMove(Move):
    def __init__(self, atom_indices, masses):
        """atom_indices: ligand atoms (reference getAtomIndices by residue
        name, blues/moves.py:206-228); masses: per-atom masses of the ligand
        atoms (for the COM, blues/moves.py:230-270)."""
        self.atom_indices = np.asarray(atom_indices, np.int32)
        self.masses = np.asarray(masses, np.float64)[self.atom_indices]

    def propose(self, key, x, box, aux):
        lig = x[self.atom_indices]
        m = jnp.asarray(self.masses, x.dtype)[:, None]
        com = jnp.sum(lig * m, axis=0) / jnp.sum(m)
        rot = random_rotation_matrix(key, x.dtype)
        new_lig = (lig - com) @ rot + com
        return x.at[self.atom_indices].set(new_lig), aux
