"""Sidechain torsion NCMC example, YAML-driven (open-source rotatable-bond
perception — no OpenEye license requirement).

Equivalent workflow to the reference's examples/example_sidechain.py +
sidechain_cuda.yml on the divaline test peptide.
"""

import sys

from blues_tpu.config import Settings, create_simulation, load_structure
from blues_tpu.moves import SideChainMove


def main(yaml_path):
    settings = Settings(yaml_path)
    cfg = settings.asDict()
    system, _, _ = load_structure(cfg)
    move = SideChainMove(system.topology, {2}, system.masses)
    print(f"rotatable bonds in residue 2: {move.n_rotatable}")
    sim, md_reps, ncmc_reps = create_simulation(settings, move=move)
    ratio = sim.run(reporters=md_reps + ncmc_reps)
    for rep in md_reps + ncmc_reps:
        rep.close()
    print(f"Acceptance ratio: {ratio:.3f}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "examples/sidechain.yml")
