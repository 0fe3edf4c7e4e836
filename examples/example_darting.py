"""Smart-darting NCMC between binding sites (BASELINE config 4).

Demonstrates SmartDartMove (COM darting, reference: blues/moves.py:1086-1514)
on toluene in water: two artificial "binding sites" 1 nm apart; the move
proposes rigid COM jumps between them at the NCMC midpoint while the
switching protocol softens the ligand, and Metropolis filters the results.
(MolDartMove provides the per-atom pose-darting variant for orientationally
confined ligands; see tests/test_moves.py.)
"""

import jax
import numpy as np

from blues_tpu.core.amber_coords import load_inpcrd
from blues_tpu.core.prmtop import load_prmtop
from blues_tpu.moves import SmartDartMove
from blues_tpu.simulation import BLUESSimulation, SimulationConfig

DATA = "/root/reference/blues/tests/data"


def main():
    system = load_prmtop(f"{DATA}/TOL-parm.prmtop")
    crd = load_inpcrd(f"{DATA}/TOL-parm.inpcrd")
    lig = system.topology.select_resname("LIG")

    # two sites: the ligand's current location and a second one 1 nm away.
    # Carve the waters out of site 2 so it is a genuine cavity — without
    # one, regrowing the ligand inside bulk water needs far longer
    # switching protocols than this demo runs.
    positions = np.array(crd.positions)
    pose1 = positions
    pose2 = np.array(positions)
    pose2[lig] += np.array([1.0, 0.0, 0.0])
    from blues_tpu.core.build import extract_atoms, merge_systems

    o_idx = system.topology.select_resname("HOH")[::3]
    blen = np.diagonal(system.box)
    dr = positions[o_idx][:, None, :] - pose2[lig][None, :, :]
    dr -= blen * np.round(dr / blen)  # minimum image: the site wraps
    d = np.linalg.norm(dr, axis=-1).min(1)
    keep_waters = o_idx[d > 0.4]
    keep = np.concatenate(
        [lig] + [np.arange(o, o + 3) for o in keep_waters]
    ).astype(np.int64)
    keep.sort()
    system, positions = extract_atoms(system, keep, positions)
    lig = system.topology.select_resname("LIG")
    from blues_tpu.core.system import AlchemicalRegion

    system = system.replace(alchemical=AlchemicalRegion(atoms=lig))
    crd_positions = positions
    pose1 = positions
    pose2 = np.array(positions)
    pose2[lig] += np.array([1.0, 0.0, 0.0])
    move = SmartDartMove.from_coordinates(
        lig, system.masses, basis_particles=None,
        coordinate_sets=[pose1, pose2], dart_radius=0.35,
    )

    cfg = SimulationConfig(
        nIter=10, nstepsNC=200, nstepsMD=100, temperature=300.0, dt=0.002,
        nonbonded_method="PME", cutoff=0.9,
    )
    sim = BLUESSimulation(system, move, cfg)
    sim.initialize(crd_positions, key=jax.random.PRNGKey(0))
    sim.minimize(1500)

    m = system.masses[lig][:, None]
    jumps = 0
    for it in range(cfg.nIter):
        com_before = (np.asarray(sim.state.positions)[lig] * m).sum(0) / m.sum()
        stats, _, _ = sim.run_iteration()
        com_after = (np.asarray(sim.state.positions)[lig] * m).sum(0) / m.sum()
        moved = np.linalg.norm(com_after - com_before)
        jumps += bool(stats.accepted) and moved > 0.5
        print(
            f"iter {it}: work={float(stats.protocol_work):8.2f} kJ/mol "
            f"accepted={bool(stats.accepted)} com_moved={moved:.2f} nm"
        )
    print(f"accepted site jumps: {jumps}/{cfg.nIter}")
    print(
        "note: converged site-hopping needs production-length protocols\n"
        "(the reference uses nstepsNC=10000, examples/rotmove_cuda.yml:57);\n"
        "this demo shows the dart mechanics and work accounting only."
    )


if __name__ == "__main__":
    main()
