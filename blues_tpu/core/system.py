"""System specification: topology + force-field parameters as plain arrays.

This replaces the reference's `openmm.System` object graph
(built via parmed `structure.createSystem`, reference:
blues/simulation.py:139-219) with flat numpy parameter arrays that energy
functions close over. The arrays become XLA constants at jit time — there is
no runtime "force object" dispatch, and "Platform"/"Context" (reference:
blues/simulation.py:707-745) reduce to device placement of a state pytree.

All quantities are in MD units (nm, ps, kJ/mol, dalton, elementary charge).
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Optional

import numpy as np


def _np(x, dtype):
    return np.asarray(x, dtype=dtype)


@dataclass
class HarmonicBonds:
    """E = 0.5 * k * (r - length)^2 (OpenMM HarmonicBondForce convention)."""

    idx: np.ndarray  # (B, 2) int32
    length: np.ndarray  # (B,) nm
    k: np.ndarray  # (B,) kJ/mol/nm^2

    @classmethod
    def empty(cls):
        return cls(np.zeros((0, 2), np.int32), np.zeros(0), np.zeros(0))

    def __len__(self):
        return self.idx.shape[0]


@dataclass
class HarmonicAngles:
    """E = 0.5 * k * (theta - theta0)^2."""

    idx: np.ndarray  # (A, 3) int32
    theta0: np.ndarray  # (A,) rad
    k: np.ndarray  # (A,) kJ/mol/rad^2

    @classmethod
    def empty(cls):
        return cls(np.zeros((0, 3), np.int32), np.zeros(0), np.zeros(0))

    def __len__(self):
        return self.idx.shape[0]


@dataclass
class PeriodicTorsions:
    """E = k * (1 + cos(n*phi - phase))."""

    idx: np.ndarray  # (T, 4) int32
    periodicity: np.ndarray  # (T,) int32
    phase: np.ndarray  # (T,) rad
    k: np.ndarray  # (T,) kJ/mol

    @classmethod
    def empty(cls):
        return cls(np.zeros((0, 4), np.int32), np.zeros(0, np.int32), np.zeros(0), np.zeros(0))

    def __len__(self):
        return self.idx.shape[0]


@dataclass
class NonbondedParams:
    """Standard LJ + Coulomb parameters (OpenMM NonbondedForce equivalent).

    ``exclusions`` are atom pairs whose direct interaction is fully removed
    (bonded 1-2/1-3 neighbors). ``exceptions`` are pairs computed with their
    own parameters instead of the combination rule (Amber 1-4 scaling);
    exception pairs are also excluded from the main sum. This mirrors the
    OpenMM exception model the reference systems rely on.
    """

    charge: np.ndarray  # (N,) e
    sigma: np.ndarray  # (N,) nm
    epsilon: np.ndarray  # (N,) kJ/mol
    exclusions: np.ndarray  # (E, 2) int32 (includes exception pairs)
    exceptions_idx: np.ndarray  # (X, 2) int32
    exceptions_chargeprod: np.ndarray  # (X,) e^2
    exceptions_sigma: np.ndarray  # (X,) nm
    exceptions_epsilon: np.ndarray  # (X,) kJ/mol

    @classmethod
    def empty(cls, n: int):
        z = np.zeros
        return cls(z(n), z(n), z(n), z((0, 2), np.int32), z((0, 2), np.int32), z(0), z(0), z(0))


@dataclass
class CustomPairForce:
    """A pair interaction defined by a Lepton-style energy expression.

    Equivalent of OpenMM CustomNonbondedForce restricted to interaction
    groups (the form used by the ethylene regression system, reference:
    blues/tests/data/ethylene_system.xml). ``energy`` may reference ``r``,
    per-particle parameters suffixed 1/2, and named globals.
    """

    energy: str
    per_particle_names: tuple  # tuple[str, ...]
    per_particle: np.ndarray  # (N, P)
    globals_defaults: dict  # name -> float
    group_a: np.ndarray  # (Ga,) int32 — interaction group set 1
    group_b: np.ndarray  # (Gb,) int32 — interaction group set 2
    cutoff: Optional[float] = None  # nm; None = no cutoff
    uses_periodic: bool = False


@dataclass
class CentroidRestraint:
    """E = 0.5 * k * |com(group1) - com(group2)|^2 (CustomCentroidBondForce

    with energy '0.5*k*distance(g1,g2)^2', reference:
    blues/tests/data/ethylene_system.xml force 5)."""

    group1: np.ndarray  # (G1,) int32
    group2: np.ndarray  # (G2,) int32
    weights1: np.ndarray  # (G1,) normalized COM weights
    weights2: np.ndarray  # (G2,)
    k: float  # kJ/mol/nm^2


@dataclass
class PositionRestraints:
    """E = k * periodicdistance(x, x0)^2 over selected atoms.

    Equivalent of the reference's CustomExternalForce positional restraint
    (blues/simulation.py:347-360, 'k_restr*periodicdistance(...)^2' — note
    no factor 1/2, matching the reference)."""

    idx: np.ndarray  # (R,) int32
    x0: np.ndarray  # (R, 3) nm
    k: float  # kJ/mol/nm^2


@dataclass
class Constraints:
    """Holonomic distance constraints |x_i - x_j| = d."""

    idx: np.ndarray  # (C, 2) int32
    dist: np.ndarray  # (C,) nm

    @classmethod
    def empty(cls):
        return cls(np.zeros((0, 2), np.int32), np.zeros(0))

    def __len__(self):
        return self.idx.shape[0]


@dataclass
class AlchemicalRegion:
    """Which atoms are alchemical + softcore functional-form parameters.

    Defaults replicate the reference's `generateAlchSystem`
    (blues/simulation.py:221-317): softcore_alpha=0.5, a=b=1, c=6,
    softcore_beta=0 (linear electrostatic scaling), annihilate
    electrostatics but decouple sterics.
    """

    atoms: np.ndarray  # (M,) int32 alchemical atom indices
    annihilate_electrostatics: bool = True
    annihilate_sterics: bool = False
    softcore_alpha: float = 0.5
    softcore_a: float = 1.0
    softcore_b: float = 1.0
    softcore_c: float = 6.0
    softcore_beta: float = 0.0
    softcore_d: float = 1.0
    softcore_e: float = 1.0
    softcore_f: float = 2.0


@dataclass
class Topology:
    """Minimal chemical topology: names for selection & move perception."""

    atom_names: list  # list[str], len N
    residue_names: list  # list[str], len N (per atom)
    residue_ids: np.ndarray  # (N,) int32
    elements: list = field(default_factory=list)  # list[str]
    bonds: np.ndarray = field(default_factory=lambda: np.zeros((0, 2), np.int32))

    @property
    def n_atoms(self) -> int:
        return len(self.atom_names)

    def select_resname(self, resname: str) -> np.ndarray:
        """Atom indices whose residue name matches (reference:
        blues/moves.py:206-228 getAtomIndices)."""
        return np.array(
            [i for i, rn in enumerate(self.residue_names) if rn == resname], dtype=np.int32
        )


@dataclass
class System:
    """The full simulation system: parameters for every energy term."""

    masses: np.ndarray  # (N,) dalton; 0 = frozen atom
    bonds: HarmonicBonds = field(default_factory=HarmonicBonds.empty)
    angles: HarmonicAngles = field(default_factory=HarmonicAngles.empty)
    torsions: PeriodicTorsions = field(default_factory=PeriodicTorsions.empty)
    nonbonded: Optional[NonbondedParams] = None
    custom_pairs: list = field(default_factory=list)  # list[CustomPairForce]
    centroid_restraints: list = field(default_factory=list)  # list[CentroidRestraint]
    position_restraints: Optional[PositionRestraints] = None
    constraints: Constraints = field(default_factory=Constraints.empty)
    box: Optional[np.ndarray] = None  # (3, 3) nm box vectors, or None (no PBC)
    alchemical: Optional[AlchemicalRegion] = None
    topology: Optional[Topology] = None
    #: reference positions captured when atoms were frozen (enables the
    #: constant-background PME grid optimization; set by freeze_radius)
    frozen_ref_positions: Optional[np.ndarray] = None
    #: generalized-Born implicit solvent parameters
    #: (potentials.gb.GBParams, from the prmtop RADII/SCREEN sections;
    #: reference `implicitSolvent` config, blues/settings.py:205-230)
    gb: Optional[object] = None

    @property
    def n_atoms(self) -> int:
        return int(self.masses.shape[0])

    def replace(self, **kwargs) -> "System":
        return dataclasses.replace(self, **kwargs)

    # --- system-modification utilities (reference SystemFactory methods) ---

    def zero_masses(self, atom_indices) -> "System":
        """Freeze atoms by zeroing masses (reference: blues/utils.py:202-221).

        Zero-mass atoms do not move but still interact."""
        masses = self.masses.copy()
        masses[np.asarray(atom_indices, dtype=np.int64)] = 0.0
        return self.replace(masses=masses)

    def freeze_atoms(self, atom_indices) -> "System":
        """Reference: blues/simulation.py:364-392 freeze_atoms."""
        return self.zero_masses(atom_indices)

    def freeze_radius(
        self, positions, center_indices, freeze_distance: float, solvent_resnames=("WAT", "HOH", "NA", "CL", "Na+", "Cl-")
    ) -> "System":
        """Freeze everything except the binding site — the inverted selection
        '(center<:r)&!(solvent)' of reference blues/simulation.py:394-480.

        Mobile = atoms of residues within ``freeze_distance`` (nm) of ANY
        center atom, EXCLUDING solvent (the reference freezes water/ions even
        inside the radius, blues/simulation.py:433, default freeze_solvent
        ':HOH,NA,CL'); everything else is frozen. The distance test is
        residue-based ('<:' in Amber mask syntax: a residue is in if any of
        its atoms is within r), matching parmed's mask semantics.
        """
        positions = np.asarray(positions)
        center = positions[np.asarray(center_indices, dtype=np.int64)]
        diff = positions[:, None, :] - center[None, :, :]
        if self.box is not None:
            blen = np.diag(self.box)
            diff -= blen * np.round(diff / blen)
        dmin = np.sqrt((diff**2).sum(-1)).min(axis=1)
        within = dmin < freeze_distance
        if self.topology is not None:
            # residue-based: whole residue is within if any atom is
            res_ids = np.asarray(self.topology.residue_ids)
            within_res = np.unique(res_ids[within])
            within = np.isin(res_ids, within_res)
            is_solvent = np.isin(
                np.asarray(self.topology.residue_names), list(solvent_resnames)
            )
        else:
            is_solvent = np.zeros(self.n_atoms, bool)
        mobile = within & ~is_solvent
        # the center selection itself always stays mobile (it is the
        # alchemical ligand; freezing it would break the NCMC move)
        mobile[np.asarray(center_indices, dtype=np.int64)] = True
        frozen_idx = np.where(~mobile)[0]
        n_frozen = frozen_idx.size
        n = self.n_atoms
        # sanity thresholds mirroring reference blues/simulation.py:440-473
        if n_frozen == n:
            raise ValueError("freeze_radius would freeze every atom in the system")
        if n_frozen / n > 0.98:
            import warnings

            warnings.warn(
                f"freeze_radius freezes {n_frozen}/{n} atoms (>98%); "
                "check your selection/radius if unintended"
            )
        return self.zero_masses(frozen_idx).replace(
            frozen_ref_positions=np.asarray(positions).copy()
        )

    def restrain_positions(self, positions, atom_indices, weight_kcal_per_A2: float = 5.0) -> "System":
        """Add harmonic positional restraints (reference:
        blues/simulation.py:319-362; weight in kcal/mol/A^2)."""
        from .. import units

        k = weight_kcal_per_A2 * units.KCAL_TO_KJ * 100.0  # -> kJ/mol/nm^2
        idx = np.asarray(atom_indices, dtype=np.int32)
        x0 = np.asarray(positions)[idx].copy()
        return self.replace(position_restraints=PositionRestraints(idx=idx, x0=x0, k=k))


def exclusions_from_bonds(n_atoms: int, bond_idx: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Derive 1-2/1-3 exclusions and 1-4 pairs from the bond graph.

    Returns (excl_pairs, pairs14) as (K,2) int32 arrays with i<j, following
    the Amber/OpenMM convention the reference systems use.
    """
    adj = [set() for _ in range(n_atoms)]
    for i, j in np.asarray(bond_idx, dtype=np.int64):
        adj[i].add(int(j))
        adj[j].add(int(i))
    excl = set()
    pairs14 = set()
    for a in range(n_atoms):
        for b in adj[a]:
            if a < b:
                excl.add((a, b))
            for c in adj[b]:
                if c != a:
                    excl.add((min(a, c), max(a, c)))
                    for d in adj[c]:
                        if d != b and d != a:
                            pairs14.add((min(a, d), max(a, d)))
    pairs14 -= excl
    to_arr = lambda s: (
        np.array(sorted(s), dtype=np.int32) if s else np.zeros((0, 2), np.int32)
    )
    return to_arr(excl), to_arr(pairs14)
