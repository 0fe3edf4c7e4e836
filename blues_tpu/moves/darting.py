"""Smart darting between known binding modes: COM darts and pose (Mol) darts.

SmartDartMove: Andricioaei-style smart darting (reference:
blues/moves.py:1086-1514). Dart centers are stored in the local coordinate
frame of three ``basis_particles`` so they move with the receptor
(dartsFromParmEd / _changeBasis, reference :1148-1193, 1360-1514). At move
time: rebuild the lab-frame dart centers from the current basis particles,
find which dart contains the ligand COM, pick a different dart uniformly,
and translate the ligand preserving its offset from the dart center
(_calc_from_center / _reDart, reference :1245-1358). Overlapping darts break
detailed balance, so they are rejected at construction time AND guarded at
move time: the reference raises when the ligand COM sits inside >= 2 dart
regions (reference blues/moves.py:1292); here — inside traced code, where
raising is impossible — the proposal is suppressed and the move's veto
channel forces rejection of the iteration (protocol_work = VETO_WORK), so
an overlap can never silently pick a dart by argmax order.

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

    def init_aux(self):
        # overlap-veto flag (see module docstring / after())
        return jnp.zeros((), bool)

    def propose(self, key, x, box, aux):
        lig = jnp.asarray(self.ligand_atoms)
        m = jnp.asarray(self.lig_masses, x.dtype)[:, None]
        com = jnp.sum(x[lig] * m, 0) / jnp.sum(m)
        darts = self._lab_darts(x)  # (D, 3)
        d = jnp.linalg.norm(darts - com, axis=-1)
        inside = d < self.dart_radius
        in_any = jnp.any(inside)
        # runtime overlap guard: with moving basis particles the lab-frame
        # darts can drift into overlap after construction; a COM inside >= 2
        # darts makes the dart choice ambiguous (detailed-balance violation,
        # the reference raises — blues/moves.py:1292). Suppress the move and
        # veto the iteration via after().
        overlap = jnp.sum(inside.astype(jnp.int32)) > 1
        current = jnp.argmax(inside)  # index of containing dart (if any)
        # choose uniformly among the D-1 other darts
        n_darts = darts.shape[0]
        u = jax.random.randint(key, (), 0, n_darts - 1)
        target = jnp.where(u >= current, u + 1, u)
        # translate preserving the offset from the dart center
        # (changevec, reference :1293-1297)
        shift = darts[target] - darts[current]
        # the veto must be two-sided: a proposal LANDING in an overlap
        # region is exactly the reverse of a proposal STARTING there, so
        # accepting the forward while always vetoing the reverse would
        # break detailed balance. The destination COM is inside the target
        # dart by construction (the offset is preserved); veto if it is
        # inside any OTHER dart too.
        d_dest = jnp.linalg.norm(darts - (com + shift), axis=-1)
        dest_overlap = jnp.sum((d_dest < self.dart_radius).astype(jnp.int32)) > 1
        veto = overlap | (in_any & dest_overlap)
        do_move = in_any & ~veto
        new_x = x.at[lig].add(jnp.where(do_move, 1.0, 0.0) * shift[None, :])
        return new_x, veto

    def after(self, key, x, box, aux):
        return aux  # veto iff the overlap guard fired in propose


class MolDartMove(Move):
    """Per-atom pose darting (reference posedart.py:114-262 algorithm).

    With ``fit_atoms`` set, the stored poses are SUPERPOSED onto the
    current receptor frame before the RMSD test and the dart jump — the
    reference aligns each stored binding-mode trajectory onto the current
    frame with mdtraj's Theobald-QCP superpose (posedart.py:145-146), so
    pose detection keeps firing when the receptor rotates or drifts.
    Without fit_atoms the poses are lab-frame (rigidly frozen receptors
    only). The superposition transform depends only on receptor
    coordinates, which the move never touches, so the pose jump remains an
    exact bijection between basins (detailed balance is preserved).
    """

    teleports = True

    def __init__(
        self,
        ligand_atoms,
        poses,
        dart_radius: float = 0.1,
        fit_atoms=None,
        fit_reference=None,
    ):
        """poses: (P, L, 3) stored ligand-pose coordinates.
        fit_atoms: receptor atom indices used for the superposition.
        fit_reference: (P, F, 3) receptor coordinates from each pose's
        snapshot (same frame as the stored pose), required with fit_atoms.
        """
        self.ligand_atoms = np.asarray(ligand_atoms, np.int32)
        self.poses = np.asarray(poses, np.float64)
        if self.poses.ndim != 3 or self.poses.shape[0] < 2:
            raise ValueError("need at least two poses (P, L, 3)")
        self.dart_radius = float(dart_radius)
        if (fit_atoms is None) != (fit_reference is None):
            raise ValueError("fit_atoms and fit_reference go together")
        self.fit_atoms = None if fit_atoms is None else np.asarray(fit_atoms, np.int32)
        self.fit_reference = (
            None if fit_reference is None else np.asarray(fit_reference, np.float64)
        )
        if self.fit_reference is not None and self.fit_reference.shape[:2] != (
            self.poses.shape[0],
            len(self.fit_atoms),
        ):
            raise ValueError(
                "fit_reference must be (P, F, 3) matching poses and fit_atoms"
            )

    @classmethod
    def from_coordinates(
        cls, ligand_atoms, coordinate_sets, dart_radius=0.1, fit_atoms=None
    ):
        """Build poses from full-coordinate binding-mode snapshots (the
        reference loads pose trajectories, posedart.py:114-144)."""
        ligand_atoms = np.asarray(ligand_atoms, np.int64)
        coords = [np.asarray(c) for c in coordinate_sets]
        poses = np.stack([c[ligand_atoms] for c in coords])
        if fit_atoms is None:
            return cls(ligand_atoms, poses, dart_radius)
        fit = np.asarray(fit_atoms, np.int64)
        ref = np.stack([c[fit] for c in coords])
        return cls(ligand_atoms, poses, dart_radius, fit_atoms=fit, fit_reference=ref)

    def _aligned_poses(self, x):
        """Poses mapped into the CURRENT receptor frame: for each pose p,
        the rigid transform superposing its stored receptor snapshot onto
        x[fit_atoms] is applied to the stored ligand pose."""
        poses = jnp.asarray(self.poses, x.dtype)
        if self.fit_atoms is None:
            return poses
        from ..potentials.geometry import kabsch_align

        cur_fit = x[jnp.asarray(self.fit_atoms)]  # (F, 3)
        refs = jnp.asarray(self.fit_reference, x.dtype)  # (P, F, 3)

        def align_one(ref_p, pose_p):
            R, com_ref, com_cur = kabsch_align(ref_p, cur_fit)
            return (pose_p - com_ref) @ R.T + com_cur

        return jax.vmap(align_one)(refs, poses)

    def init_aux(self):
        # overlap-veto flag (same guard as SmartDartMove.after)
        return jnp.zeros((), bool)

    def propose(self, key, x, box, aux):
        lig = jnp.asarray(self.ligand_atoms)
        cur = x[lig]  # (L, 3)
        poses = self._aligned_poses(x)  # (P, L, 3) in the current frame
        rmsd = jnp.sqrt(jnp.mean(jnp.sum((poses - cur[None]) ** 2, -1), -1))  # (P,)
        inside = rmsd < self.dart_radius
        in_any = jnp.any(inside)
        # runtime overlap guard: a geometry within dart_radius RMSD of >= 2
        # stored poses makes the basin assignment ambiguous — suppress the
        # jump and veto (the reference raises in the equivalent COM case,
        # blues/moves.py:1292)
        overlap = jnp.sum(inside.astype(jnp.int32)) > 1
        current = jnp.argmax(inside)
        n_poses = poses.shape[0]
        u = jax.random.randint(key, (), 0, n_poses - 1)
        target = jnp.where(u >= current, u + 1, u)
        # jump pose, preserving per-atom deviations (poseRedart,
        # reference posedart.py:215-262)
        deviation = cur - poses[current]
        new_lig = poses[target] + deviation
        # two-sided veto (see SmartDartMove.propose): the destination
        # geometry is inside the target basin by construction (deviations
        # are preserved); veto if it is within dart_radius RMSD of any
        # OTHER stored pose as well
        rmsd_dest = jnp.sqrt(
            jnp.mean(jnp.sum((poses - new_lig[None]) ** 2, -1), -1)
        )
        dest_overlap = (
            jnp.sum((rmsd_dest < self.dart_radius).astype(jnp.int32)) > 1
        )
        veto = overlap | (in_any & dest_overlap)
        new_x = x.at[lig].set(jnp.where(in_any & ~veto, new_lig, cur))
        return new_x, veto

    def after(self, key, x, box, aux):
        return aux  # veto iff the overlap guard fired in propose
