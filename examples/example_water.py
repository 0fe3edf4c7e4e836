"""Water-hopping NCMC (WaterTranslationMove) example, YAML-driven.

Equivalent workflow to the reference's examples/example_water.py +
water_cuda.yaml: the designated alchemical water is swapped with a random
water within a sphere of the ligand and translated to a random point;
out-of-sphere endings are vetoed. Reporters come from the YAML's
md_reporters / ncmc_reporters blocks.
"""

import sys

from blues_tpu import units
from blues_tpu.config import Settings, create_simulation, load_structure
from blues_tpu.moves import WaterTranslationMove


def main(yaml_path):
    settings = Settings(yaml_path)
    cfg = settings.asDict()
    system, _, _ = load_structure(cfg)
    lig_resname = (cfg.get("ligand", {}) or {}).get("resname", "LIG")
    lig = system.topology.select_resname(lig_resname)
    radius = units.parse_quantity(
        (cfg.get("water", {}) or {}).get("radius", 20.0), "angstroms"
    )
    move = WaterTranslationMove(
        system.topology, system.masses, protein_atoms=lig, radius=radius
    )
    sim, md_reps, ncmc_reps = create_simulation(settings, move=move)
    ratio = sim.run(reporters=md_reps + ncmc_reps)
    for rep in md_reps + ncmc_reps:
        rep.close()
    print(f"Acceptance ratio: {ratio:.3f}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "examples/water.yml")
