"""Built-in test systems.

`charged_ethylene()` reconstructs the reference's 8-particle two-state
regression system natively (parameters transcribed from
reference: blues/tests/data/ethylene_system.xml and initial coordinates
from blues/tests/data/ethylene_structure.pdb): two fixed charged sites plus
an ethylene molecule tethered between them by a stiff centroid spring, with
a CustomNonbondedForce-style interaction `q/(r^2) + LJ` whose sigma/epsilon
are scaled by the lambda_sterics / lambda_electrostatics globals. The
equilibrium two-state populations are [0.25, 0.75]
(reference: blues/tests/test_ethylene.py:151), which the end-to-end
statistical test reproduces.
"""

from __future__ import annotations

import math

import numpy as np

from .core.system import (
    CentroidRestraint,
    Constraints,
    CustomPairForce,
    HarmonicAngles,
    HarmonicBonds,
    PeriodicTorsions,
    System,
    Topology,
)

ETHYLENE_ENERGY = (
    "q/(r^2) + 4*epsilon*((sigma/r)^12-(sigma/r)^6);"
    " sigma=0.5*(sigma1+sigma2)*lambda_sterics;"
    " epsilon=sqrt(epsilon1*epsilon2)*lambda_electrostatics;"
    " q = lambda_charge*(q1*q2)"
)


def charged_ethylene():
    """Returns (System, positions_nm). Alchemical atoms are [2..7]."""
    masses = np.array([0.0, 0.0, 12.01, 12.01, 1.008, 1.008, 1.008, 1.008])

    bonds = HarmonicBonds(
        idx=np.array([[2, 3], [2, 4], [2, 5], [3, 6], [3, 7]], np.int32),
        length=np.array([0.13343, 0.10879, 0.10879, 0.10879, 0.10879]),
        k=np.array([476473.92, 287106.08, 287106.08, 287106.08, 287106.08]),
    )
    angles = HarmonicAngles(
        idx=np.array(
            [[2, 3, 6], [2, 3, 7], [3, 2, 4], [3, 2, 5], [4, 2, 5], [6, 3, 7]], np.int32
        ),
        theta0=np.array([2.10190092] * 4 + [2.04029077] * 2),
        k=np.array([417.1448] * 4 + [318.90448] * 2),
    )
    torsions = PeriodicTorsions(
        idx=np.array([[4, 2, 3, 6], [4, 2, 3, 7], [5, 2, 3, 6], [5, 2, 3, 7]], np.int32),
        periodicity=np.array([2, 2, 2, 2], np.int32),
        phase=np.array([3.141594] * 4),
        k=np.array([27.8236] * 4),
    )
    constraints = Constraints(
        idx=np.array([[2, 4], [2, 5], [3, 6], [3, 7]], np.int32),
        dist=np.array([0.10879] * 4),
    )
    # per-particle params: (sigma, epsilon, q, lambda_on)
    per_particle = np.array(
        [
            [0.324999852378, 0.71128, -0.2, 10.0],
            [0.324999852378, 0.71128, -0.5, 10.0],
            [0.40796034095337974, 0.35982400053705343, 0.0, 0.0],
            [0.40796034095337974, 0.35982400053705343, 0.0, 0.0],
            [0.31195709504821023, 0.06276000026869927, 1.0, 0.0],
            [0.31195709504821023, 0.06276000026869927, 1.0, 0.0],
            [0.31195709504821023, 0.06276000026869927, 0.0, 0.0],
            [0.31195709504821023, 0.06276000026869927, 0.0, 0.0],
        ]
    )
    custom = CustomPairForce(
        energy=ETHYLENE_ENERGY,
        per_particle_names=("sigma", "epsilon", "q", "lambda_on"),
        per_particle=per_particle,
        globals_defaults={
            "lambda_sterics": 1.0,
            "lambda_electrostatics": 1.0,
            "lambda_charge": 1.0,
        },
        group_a=np.array([0, 1], np.int32),
        group_b=np.array([2, 3, 4, 5, 6, 7], np.int32),
        cutoff=None,  # OpenMM method=0 (NoCutoff)
        uses_periodic=False,
    )
    centroid = CentroidRestraint(
        group1=np.array([0, 1], np.int32),
        group2=np.array([2, 3], np.int32),
        weights1=np.array([0.5, 0.5]),
        weights2=np.array([0.5, 0.5]),  # equal carbon masses -> equal weights
        k=100000.0,
    )
    topology = Topology(
        atom_names=["N", "N", "C1", "C2", "H1", "H2", "H3", "H4"],
        residue_names=["TMP", "TMP", "LIG", "LIG", "LIG", "LIG", "LIG", "LIG"],
        residue_ids=np.array([1, 2, 3, 3, 3, 3, 3, 3], np.int32),
        elements=["N", "N", "C", "C", "H", "H", "H", "H"],
        bonds=bonds.idx,
    )
    box = np.eye(3) * 2.0

    system = System(
        masses=masses,
        bonds=bonds,
        angles=angles,
        torsions=torsions,
        custom_pairs=[custom],
        centroid_restraints=[centroid],
        constraints=constraints,
        box=box,
        topology=topology,
    )

    # initial coordinates (Angstrom -> nm)
    positions = 0.1 * np.array(
        [
            [-3.000, 5.000, -3.000],
            [3.000, 0.000, 3.000],
            [0.284, 1.030, -0.184],
            [-0.640, 1.956, -0.447],
            [1.336, 1.290, -0.150],
            [0.000, 0.000, 0.000],
            [-1.692, 1.695, -0.481],
            [-0.356, 2.986, -0.632],
        ]
    )
    return system, positions


def t4_scale_binding_site_box(
    n_atoms: int = 22340, n_peptides: int = 24, seed: int = 0
):
    """Toluene in a shell of divaline peptides (real Amber force-field
    parameters from the reference's vacDivaline.prmtop) solvated in TIP3P
    at the T4-lysozyme benchmark scale (22,340 atoms,
    reference: blues/tests/data/eqToluene.inpcrd:2).

    The production protocol freezes everything outside 5 A of the ligand
    AND all solvent (reference blues/simulation.py:400-433), so on a pure
    water box the mobile set degenerates to the ligand alone. This system
    surrounds the ligand with peptides so the mobile set is binding-site
    like: protein residues within the radius stay mobile and their bonded
    terms run in the hot loop, as in the real T4 protocol.

    Returns (System, positions) with the toluene marked alchemical.
    Requires the reference data directory; see t4_scale_toluene_box for the
    data-free fallback.
    """
    import os

    from .core.amber_coords import load_inpcrd
    from .core.build import merge_systems, solvated_ligand_box
    from .core.prmtop import load_prmtop
    from .core.system import AlchemicalRegion
    from .ligands import toluene_system

    data = "/root/reference/blues/tests/data"
    if not os.path.isdir(data):
        raise FileNotFoundError(
            "reference data directory unavailable; use t4_scale_toluene_box"
        )
    rng = np.random.default_rng(seed)
    lig, lig_x = toluene_system()
    pep = load_prmtop(f"{data}/vacDivaline.prmtop")
    pep_x = load_inpcrd(f"{data}/vacDivaline.inpcrd").positions
    pep_x = pep_x - pep_x.mean(0)

    solute, x = lig, np.asarray(lig_x) - np.asarray(lig_x).mean(0)
    # pack peptides around the ligand: for each Fibonacci-sphere direction,
    # push the (randomly rotated) peptide outward until it just clears the
    # already-placed solute — a snug shell, like binding-site residues
    contact = 0.30  # nm minimum heavy-atom clearance
    for k in range(n_peptides):
        i = k + 0.5
        phi = math.acos(1.0 - 2.0 * i / n_peptides)
        theta = math.pi * (1.0 + 5.0**0.5) * i
        u = np.array(
            [
                math.sin(phi) * math.cos(theta),
                math.sin(phi) * math.sin(theta),
                math.cos(phi),
            ]
        )
        # random proper rotation (QR of a gaussian matrix)
        q, r_ = np.linalg.qr(rng.standard_normal((3, 3)))
        q *= np.sign(np.diag(r_))
        if np.linalg.det(q) < 0:
            q[:, 0] *= -1.0
        pk = pep_x @ q.T
        t = 0.3
        while True:
            cand = pk + t * u
            dmin = np.sqrt(
                ((cand[:, None, :] - x[None, :, :]) ** 2).sum(-1)
            ).min()
            if dmin >= contact:
                break
            t += 0.03
        solute, x = merge_systems(solute, x, pep, pk + t * u)
    x = x - x.mean(0)
    system, positions = solvated_ligand_box(solute, x, n_atoms, seed=seed)
    lig_idx = system.topology.select_resname("LIG")
    return system.replace(alchemical=AlchemicalRegion(atoms=lig_idx)), positions


def t4_scale_toluene_box(n_atoms: int = 22340, seed: int = 0):
    """Toluene in TIP3P water at the T4-lysozyme/toluene benchmark scale
    (22,340 atoms, reference: blues/tests/data/eqToluene.inpcrd:2; the
    reference prmtop itself is a missing large blob, so the benchmark
    system is constructed programmatically at the same atom count, with
    the same ligand, water model, and force-field terms).

    Returns (System, positions) with the toluene marked alchemical.
    """
    from .core.build import solvated_ligand_box
    from .core.system import AlchemicalRegion
    from .ligands import toluene_system

    lig, lig_x = toluene_system()
    system, x = solvated_ligand_box(lig, lig_x, n_atoms, seed=seed)
    lig_idx = system.topology.select_resname("LIG")
    return system.replace(alchemical=AlchemicalRegion(atoms=lig_idx)), x
