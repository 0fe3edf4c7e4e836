"""Protein sidechain torsion move with open-source rotatable-bond perception.

Equivalent of the reference SideChainMove (blues/moves.py:418-844), which
requires a closed-source OpenEye license for bond perception
(blues/moves.py:27-36). Here perception is plain graph analysis on the
topology — removing the license dependency (SURVEY.md 2.3):

  * backbone atoms identified by canonical names (N, CA, C, O, H, HA, ...)
  * a rotatable bond is heavy-heavy, not in a ring (removing it disconnects
    the graph), not involving backbone-backbone pairs, with more than one
    atom on the distal side
  * atoms distal to each bond found by BFS (reference getRotAtoms
    :603-669 does the same via OE subgraphs)

The move: pick (bond, angle~U[0,2pi)) uniformly (reference
chooseBondandTheta :703-729) and rotate the distal atoms about the bond
axis (Euler-Rodrigues, reference rotation_matrix :731-750).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..potentials.geometry import axis_angle_rotation_matrix
from .base import Move

BACKBONE_NAMES = {"N", "CA", "C", "O", "H", "HA", "H1", "H2", "H3", "OXT", "HA2", "HA3"}


def find_rotatable_bonds(topology, residue_ids=None, masses=None):
    """Returns list of (i, j, distal_mask) for rotatable heavy bonds.

    residue_ids: restrict to bonds whose atoms are in these residues
    (reference getTargetAtoms :512-558). distal_mask marks atoms on the j
    side (the side that rotates).
    """
    n = topology.n_atoms
    bonds = np.asarray(topology.bonds, np.int64)
    adj = [[] for _ in range(n)]
    for a, b in bonds:
        adj[a].append(int(b))
        adj[b].append(int(a))
    heavy = (
        np.asarray(masses) > 3.5
        if masses is not None
        else np.array([not nm.startswith("H") for nm in topology.atom_names])
    )

    def reachable_without(start, blocked_a, blocked_b):
        """BFS from start avoiding the (blocked_a, blocked_b) edge."""
        seen = {start}
        stack = [start]
        while stack:
            cur = stack.pop()
            for nxt in adj[cur]:
                if cur == blocked_a and nxt == blocked_b:
                    continue
                if cur == blocked_b and nxt == blocked_a:
                    continue
                if nxt not in seen:
                    seen.add(nxt)
                    stack.append(nxt)
        return seen

    rot = []
    resids = np.asarray(topology.residue_ids)
    for a, b in bonds:
        a, b = int(a), int(b)
        if not (heavy[a] and heavy[b]):
            continue
        if residue_ids is not None and not (
            resids[a] in residue_ids and resids[b] in residue_ids
        ):
            continue
        na = topology.atom_names[a]
        nb = topology.atom_names[b]
        if na in BACKBONE_NAMES and nb in BACKBONE_NAMES:
            continue
        # rotor: each end bonded to >= 2 heavy atoms (OpenEye IsRotor
        # semantics — excludes terminal methyl spins, so valine yields
        # exactly one chi1 bond like the reference test expects,
        # tests/test_sidechain.py:62-66)
        if sum(heavy[x_] for x_ in adj[a]) < 2 or sum(heavy[x_] for x_ in adj[b]) < 2:
            continue
        side_b = reachable_without(b, a, b)
        if a in side_b:
            continue  # ring bond: removing it doesn't split the graph
        # rotate the smaller side about the axis; exclude the axis atom b
        side_a = set(range(n)) - side_b
        distal = side_b if len(side_b) <= len(side_a) else side_a
        axis_i, axis_j = (a, b) if distal is side_b else (b, a)
        mask = np.zeros(n, bool)
        mask[list(distal)] = True
        mask[axis_j] = False  # pivot stays
        if mask.sum() < 1:
            continue
        rot.append((axis_i, axis_j, mask))
    return rot


class SideChainMove(Move):
    def __init__(self, topology, residue_ids, masses=None):
        self.rot_bonds = find_rotatable_bonds(topology, set(residue_ids), masses)
        if not self.rot_bonds:
            raise ValueError(f"no rotatable bonds found in residues {residue_ids}")
        self.axis_i = np.asarray([r[0] for r in self.rot_bonds], np.int32)
        self.axis_j = np.asarray([r[1] for r in self.rot_bonds], np.int32)
        self.masks = np.stack([r[2] for r in self.rot_bonds])  # (B, N)

    @property
    def n_rotatable(self):
        return len(self.rot_bonds)

    def propose(self, key, x, box, aux):
        kb, kt = jax.random.split(key)
        b = jax.random.randint(kb, (), 0, len(self.rot_bonds))
        theta = jax.random.uniform(kt, (), x.dtype) * 2.0 * jnp.pi
        pi = x[jnp.asarray(self.axis_i)[b]]
        pj = x[jnp.asarray(self.axis_j)[b]]
        rotm = axis_angle_rotation_matrix(pj - pi, theta)
        mask = jnp.asarray(self.masks)[b][:, None]
        rotated = (x - pj) @ rotm.T + pj
        return jnp.where(mask, rotated, x), aux
