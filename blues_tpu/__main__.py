"""Command-line interface: ``python -m blues_tpu <command>``.

The reference has no CLI (entry is bare example scripts, SURVEY.md 1);
this provides the same YAML-driven workflow as a proper command:

    python -m blues_tpu run config.yml [--iterations N] [--replicas R]
    python -m blues_tpu info system.prmtop
    python -m blues_tpu bench
"""

from __future__ import annotations

import argparse
import json
import sys


def cmd_run(args):
    from blues_tpu.config import create_simulation

    sim, md_reps, ncmc_reps = create_simulation(args.config, n_replicas=args.replicas)
    n_iter = args.iterations if args.iterations else None
    ratio = sim.run(n_iter, reporters=md_reps + ncmc_reps)
    for rep in md_reps + ncmc_reps:
        rep.close()
    print(f"Acceptance ratio: {ratio:.4f}")


def cmd_info(args):
    from blues_tpu.core.prmtop import load_prmtop

    system = load_prmtop(args.prmtop)
    res = sorted(set(system.topology.residue_names))
    print(
        json.dumps(
            {
                "n_atoms": system.n_atoms,
                "n_bonds": len(system.bonds),
                "n_angles": len(system.angles),
                "n_torsions": len(system.torsions),
                "n_constraints": len(system.constraints),
                "n_exclusions": int(system.nonbonded.exclusions.shape[0]),
                "n_exceptions": int(system.nonbonded.exceptions_idx.shape[0]),
                "total_charge": round(float(system.nonbonded.charge.sum()), 6),
                "residue_names": res,
                "box_nm": None
                if system.box is None
                else [round(float(v), 4) for v in system.box.diagonal()],
            },
            indent=2,
        )
    )


def cmd_bench(args):
    import runpy

    sys.argv = ["bench.py"]
    runpy.run_path("bench.py", run_name="__main__")


def main(argv=None):
    p = argparse.ArgumentParser(prog="blues_tpu", description=__doc__)
    sub = p.add_subparsers(dest="command", required=True)

    pr = sub.add_parser("run", help="run a YAML-configured simulation")
    pr.add_argument("config")
    pr.add_argument("--iterations", type=int, default=None)
    pr.add_argument("--replicas", type=int, default=1)
    pr.set_defaults(fn=cmd_run)

    pi = sub.add_parser("info", help="inspect an Amber prmtop")
    pi.add_argument("prmtop")
    pi.set_defaults(fn=cmd_info)

    pb = sub.add_parser("bench", help="run the NCMC throughput benchmark")
    pb.set_defaults(fn=cmd_bench)

    args = p.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
