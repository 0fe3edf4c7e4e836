"""Water-hopping NCMC (WaterTranslationMove) example.

Equivalent workflow to the reference's examples/example_water.py: the
designated alchemical water is swapped with a random water within a sphere
of the ligand and translated to a random point; out-of-sphere endings are
vetoed.
"""

import sys

import jax

from blues_tpu.config import Settings, load_structure
from blues_tpu.moves import WaterTranslationMove
from blues_tpu.simulation import BLUESSimulation, SimulationConfig


def main(yaml_path):
    cfg = Settings(yaml_path).asDict()
    system, positions, velocities = load_structure(cfg)
    sim_cfg = cfg["simulation"]
    lig = system.topology.select_resname("LIG")
    move = WaterTranslationMove(
        system.topology, system.masses, protein_atoms=lig, radius=0.7
    )
    config = SimulationConfig(
        nIter=int(sim_cfg.get("nIter", 10)),
        nstepsNC=int(sim_cfg.get("nstepsNC", 100)),
        nstepsMD=int(sim_cfg.get("nstepsMD", 100)),
        temperature=float(sim_cfg.get("temperature", 300.0)),
        dt=float(sim_cfg.get("dt", 0.002)),
        nonbonded_method="PME",
        cutoff=float(cfg["system"].get("nonbondedCutoff", 0.9)),
    )
    sim = BLUESSimulation(system, move, config)
    sim.initialize(positions, key=jax.random.PRNGKey(0))
    sim.minimize(int(sim_cfg.get("minimize", 1000)))
    ratio = sim.run()
    print(f"Acceptance ratio: {ratio:.3f}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "examples/rotmove.yml")
