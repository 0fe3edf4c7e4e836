"""Sidechain torsion NCMC example (open-source rotatable-bond perception).

Equivalent workflow to the reference's examples/example_sidechain.py, on
the divaline test peptide, without the OpenEye license requirement.
"""

import jax

from blues_tpu.core.amber_coords import load_inpcrd
from blues_tpu.core.prmtop import load_prmtop
from blues_tpu.moves import SideChainMove
from blues_tpu.simulation import BLUESSimulation, SimulationConfig

DATA = "/root/reference/blues/tests/data"


def main():
    system = load_prmtop(f"{DATA}/vacDivaline.prmtop")
    crd = load_inpcrd(f"{DATA}/vacDivaline.inpcrd")
    move = SideChainMove(system.topology, {2}, system.masses)
    print(f"rotatable bonds in residue 2: {move.n_rotatable}")
    cfg = SimulationConfig(
        nIter=10, nstepsNC=100, nstepsMD=100, temperature=300.0, dt=0.002,
        nonbonded_method="NoCutoff",
    )
    sim = BLUESSimulation(system, move, cfg)
    sim.initialize(crd.positions, key=jax.random.PRNGKey(0))
    sim.minimize(500)
    ratio = sim.run()
    print(f"Acceptance ratio: {ratio:.3f}")


if __name__ == "__main__":
    main()
