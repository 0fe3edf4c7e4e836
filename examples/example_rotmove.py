"""Random ligand rotation NCMC on toluene-in-water (YAML-driven).

Equivalent workflow to the reference's examples/example_rotmove.py: load a
YAML config, build the system + move engine, run the MD<->NCMC loop with
reporters. Usage:

    python examples/example_rotmove.py [examples/rotmove.yml]
"""

import sys

from blues_tpu.config import create_simulation


def main(yaml_path):
    sim, md_reps, ncmc_reps = create_simulation(yaml_path)
    ratio = sim.run(reporters=md_reps + ncmc_reps)
    for rep in md_reps + ncmc_reps:
        rep.close()
    print(f"Acceptance ratio: {ratio:.3f}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "examples/rotmove.yml")
