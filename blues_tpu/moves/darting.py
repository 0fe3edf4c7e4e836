"""Smart darting between known binding modes: COM darts and pose (Mol) darts.

SmartDartMove: Andricioaei-style smart darting (reference:
blues/moves.py:1086-1514). Dart centers are stored in the local coordinate
frame of three ``basis_particles`` so they move with the receptor
(dartsFromParmEd / _changeBasis, reference :1148-1193, 1360-1514). At move
time: rebuild the lab-frame dart centers from the current basis particles,
find which dart contains the ligand COM, pick a different dart uniformly,
and translate the ligand preserving its offset from the dart center
(_calc_from_center / _reDart, reference :1245-1358). Overlapping darts are
rejected at construction time because they break detailed balance.

MolDartMove: per-atom pose darting (capability folded in from the
reference's legacy posedart.py:114-262 per SURVEY.md 2.2): stored ligand
poses; if the current ligand geometry is within ``dart_radius`` RMSD of a
pose, jump to another pose, carrying over the per-atom deviation so the
move is an exact bijection between pose basins.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .base import Move


def _basis_frame(p1, p2, p3):
    """3x3 basis matrix (rows = frame vectors) + origin from 3 particles,
    the reference's particle-pair basis (_findNewCoord, reference
    blues/moves.py:1360-1420)."""
    mod = jnp if isinstance(p1, jnp.ndarray) else np
    v1 = p2 - p1
    v2 = p3 - p1
    v3 = mod.cross(v1, v2)
    return mod.stack([v1, v2, v3]), p1


class SmartDartMove(Move):

    teleports = True
    def __init__(
        self,
        ligand_atoms,
        masses,
        basis_particles,
        dart_centers_local,
        dart_radius: float = 0.2,
    ):
        """dart_centers_local: (D, 3) COM dart centers expressed in the
        basis-particle frame (as produced by `darts_from_positions`)."""
        self.ligand_atoms = np.asarray(ligand_atoms, np.int32)
        self.lig_masses = np.asarray(masses, np.float64)[self.ligand_atoms]
        # basis_particles=None: lab-frame dart centers (rigid receptor)
        self.basis_particles = (
            None if basis_particles is None else np.asarray(basis_particles, np.int32)
        )
        self.darts_local = np.asarray(dart_centers_local, np.float64)
        if self.darts_local.ndim != 2 or self.darts_local.shape[0] < 2:
            raise ValueError("need at least two dart centers")
        self.dart_radius = float(dart_radius)

    @classmethod
    def from_coordinates(
        cls, ligand_atoms, masses, basis_particles, coordinate_sets, dart_radius=0.2
    ):
        """Build dart centers from full-coordinate snapshots of the known
        binding modes (the reference loads coordinate files,
        dartsFromParmEd :1148-1193)."""
        ligand_atoms = np.asarray(ligand_atoms, np.int64)
        m = np.asarray(masses)[ligand_atoms][:, None]
        locals_ = []
        for coords in coordinate_sets:
            coords = np.asarray(coords)
            com = (coords[ligand_atoms] * m).sum(0) / m.sum()
            if basis_particles is None:
                locals_.append(com)
            else:
                b1, b2, b3 = coords[np.asarray(basis_particles, np.int64)]
                basis, origin = _basis_frame(b1, b2, b3)
                locals_.append(np.linalg.solve(basis.T, com - origin))
        darts = np.asarray(locals_)
        move = cls(ligand_atoms, masses, basis_particles, darts, dart_radius)
        # overlapping darts break detailed balance (reference :1268-1290)
        if basis_particles is None:
            lab = darts
        else:
            b1, b2, b3 = np.asarray(coordinate_sets[0])[np.asarray(basis_particles, np.int64)]
            basis, origin = _basis_frame(b1, b2, b3)
            lab = darts @ basis + origin
        for i in range(len(lab)):
            for j in range(i + 1, len(lab)):
                if np.linalg.norm(lab[i] - lab[j]) < 2 * dart_radius:
                    raise ValueError(f"darts {i} and {j} overlap; reduce dart_radius")
        return move

    def _lab_darts(self, x):
        if self.basis_particles is None:
            return jnp.asarray(self.darts_local, x.dtype)
        bp = x[jnp.asarray(self.basis_particles)]
        basis, origin = _basis_frame(bp[0], bp[1], bp[2])
        return jnp.asarray(self.darts_local, x.dtype) @ basis + origin

    def propose(self, key, x, box, aux):
        lig = jnp.asarray(self.ligand_atoms)
        m = jnp.asarray(self.lig_masses, x.dtype)[:, None]
        com = jnp.sum(x[lig] * m, 0) / jnp.sum(m)
        darts = self._lab_darts(x)  # (D, 3)
        d = jnp.linalg.norm(darts - com, axis=-1)
        inside = d < self.dart_radius
        in_any = jnp.any(inside)
        current = jnp.argmax(inside)  # index of containing dart (if any)
        # choose uniformly among the D-1 other darts
        n_darts = darts.shape[0]
        u = jax.random.randint(key, (), 0, n_darts - 1)
        target = jnp.where(u >= current, u + 1, u)
        # translate preserving the offset from the dart center
        # (changevec, reference :1293-1297)
        shift = darts[target] - darts[current]
        new_x = x.at[lig].add(jnp.where(in_any, 1.0, 0.0) * shift[None, :])
        return new_x, aux


class MolDartMove(Move):
    """Per-atom pose darting (reference posedart.py:114-262 algorithm)."""

    teleports = True

    def __init__(self, ligand_atoms, poses, dart_radius: float = 0.1):
        """poses: (P, L, 3) stored ligand-pose coordinates (lab frame)."""
        self.ligand_atoms = np.asarray(ligand_atoms, np.int32)
        self.poses = np.asarray(poses, np.float64)
        if self.poses.ndim != 3 or self.poses.shape[0] < 2:
            raise ValueError("need at least two poses (P, L, 3)")
        self.dart_radius = float(dart_radius)

    def propose(self, key, x, box, aux):
        lig = jnp.asarray(self.ligand_atoms)
        cur = x[lig]  # (L, 3)
        poses = jnp.asarray(self.poses, x.dtype)
        rmsd = jnp.sqrt(jnp.mean(jnp.sum((poses - cur[None]) ** 2, -1), -1))  # (P,)
        inside = rmsd < self.dart_radius
        in_any = jnp.any(inside)
        current = jnp.argmax(inside)
        n_poses = poses.shape[0]
        u = jax.random.randint(key, (), 0, n_poses - 1)
        target = jnp.where(u >= current, u + 1, u)
        # jump pose, preserving per-atom deviations (poseRedart,
        # reference posedart.py:215-262)
        deviation = cur - poses[current]
        new_lig = poses[target] + deviation
        new_x = x.at[lig].set(jnp.where(in_any, new_lig, cur))
        return new_x, aux
