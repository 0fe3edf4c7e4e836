"""Acceptance-vs-protocol-length curve at the PRODUCTION shape (VERDICT r3
next #4).

The JPCB reference paper's qualitative claim (10.1021/acs.jpcb.7b11820,
Fig. 4 discussion) is that LONGER NCMC switching protocols dissipate less
work and accept more rotation moves. That trend is a free parity check this
engine can run directly: same system, same move, nstepsNC in {1k, 5k, 10k}
(dt 4 fs HMR 3.024, PME 10 A tol 0.005, freeze >5 A + solvent — the
rotmove_cuda.yml:25-26,42-67 shape on the flagship binding-site system;
the reference's own eqToluene prmtop is a missing blob).

Writes docs/acceptance_curve.json incrementally: per-length acceptance with
binomial stderr, finite-work quantiles, veto/NaN counts, per-iteration
rows, and the total proposal count. The MD decorrelation stage between
proposals is shortened (--nsteps-md); it does not enter the acceptance
criterion.

Usage (TPU):
    PYTHONPATH=/root/repo python tools/acceptance_curve.py \
        --lengths 1000:40,5000:40,10000:160
"""

import argparse
import json
import os
import sys
import time
import warnings

import jax
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

KT300 = 8.31446261815324e-3 * 300.0


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--lengths", default="1000:40,5000:40,10000:160",
        help="comma list of nstepsNC:iters",
    )
    ap.add_argument("--replicas", type=int, default=64)
    ap.add_argument("--nsteps-md", type=int, default=2000)
    ap.add_argument("--n-atoms", type=int, default=22340)
    ap.add_argument("--max-dispatch", type=int, default=1000)
    ap.add_argument("--out", default="docs/acceptance_curve.json")
    args = ap.parse_args()
    plan = [
        (int(spec.split(":")[0]), int(spec.split(":")[1]))
        for spec in args.lengths.split(",")
    ]

    from blues_tpu.core.prmtop import repartition_hydrogen_masses
    from blues_tpu.moves import MoveEngine, RandomLigandRotationMove
    from blues_tpu.simulation import BLUESSimulation, SimulationConfig
    from blues_tpu.testsystems import t4_scale_binding_site_box

    t_build = time.time()
    system, x0 = t4_scale_binding_site_box(n_atoms=args.n_atoms)
    bond_graph = np.concatenate(
        [
            np.asarray(e.idx).reshape(-1, 2)
            for e in (system.bonds, system.constraints)
            if len(e)
        ]
    )
    system = system.replace(
        masses=repartition_hydrogen_masses(system.masses, bond_graph, 3.024)
    )
    lig = system.topology.select_resname("LIG")
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        fs = system.freeze_radius(np.asarray(x0), lig, 0.5)
    mobile = int((fs.masses > 0).sum())
    backend = "sweep" if jax.default_backend() == "tpu" else "tiled"
    log(f"# system {system.n_atoms} atoms, {mobile} mobile; backend={backend}; "
        f"built in {time.time() - t_build:.0f}s")

    curve = []
    artifact = {
        "protocol": {
            "system": f"binding-site flagship {system.n_atoms} atoms ({mobile} mobile)",
            "nstepsMD": args.nsteps_md,
            "dt_fs": 4.0,
            "hydrogen_mass_Da": 3.024,
            "cutoff_nm": 1.0,
            "ewald_tolerance": 0.005,
            "freeze": ">5A from LIG + solvent (reference rotmove_cuda.yml:42-45)",
            "replicas": args.replicas,
            "backend": backend,
            "note": (
                "Acceptance vs NCMC protocol length for the production-shape "
                "RandomLigandRotation move. Expected parity trend (JPCB 2018, "
                "10.1021/acs.jpcb.7b11820): longer switching protocols "
                "dissipate less work -> higher acceptance, saturating in the "
                "low single-digit percent regime at 10k steps."
            ),
        },
        "curve": curve,
    }

    def write():
        os.makedirs(os.path.dirname(args.out), exist_ok=True)
        artifact["total_proposals"] = int(
            sum(pt["samples"] for pt in curve)
        )
        with open(args.out, "w") as f:
            json.dump(artifact, f, indent=1, allow_nan=False)

    for nsteps_nc, iters in plan:
        cfg = SimulationConfig(
            nIter=iters,
            nstepsNC=nsteps_nc,
            nstepsMD=args.nsteps_md,
            dt=0.004,
            temperature=300.0,
            friction=1.0,
            nonbonded_method="PME",
            cutoff=1.0,
            ewald_tolerance=0.005,
            nonbonded_backend=backend,
            n_replicas=args.replicas,
            max_steps_per_dispatch=args.max_dispatch or None,
        )
        sim = BLUESSimulation(
            fs, MoveEngine(RandomLigandRotationMove(lig, fs.masses)), cfg
        )
        sim.initialize(x0, key=jax.random.PRNGKey(20260819 + nsteps_nc))
        sim.minimize(600)
        log(f"# nstepsNC={nsteps_nc}: compiling + {iters} iteration batches...")

        acc_total = 0
        n_total = 0
        works = []
        rows = []
        point = {
            "nstepsNC": nsteps_nc,
            "iterations": iters,
            "samples": 0,
            "per_iteration": rows,
        }
        curve.append(point)
        for i in range(iters):
            t0 = time.time()
            stats, _, _ = sim.run_iteration()
            jax.block_until_ready(stats.accepted)
            wall = time.time() - t0
            acc = np.asarray(stats.accepted)
            w = np.asarray(stats.protocol_work) / KT300
            fin = w[np.isfinite(w) & (np.abs(w) < 9e5)]
            acc_total += int(acc.sum())
            n_total += acc.size
            works.extend(fin.tolist())
            rows.append(
                {
                    "iter": i,
                    "wall_s": round(wall, 2),
                    "acceptance": float(acc.mean()),
                    "work_kT_median": (
                        round(float(np.median(fin)), 3) if len(fin) else None
                    ),
                    "n_work_nonfinite_or_veto": int(acc.size - len(fin)),
                    "md_failed": int(np.asarray(stats.md_failed).sum()),
                }
            )
            p = acc_total / max(n_total, 1)
            point.update(
                samples=int(n_total),
                acceptance=p,
                acceptance_stderr=float(np.sqrt(p * (1 - p) / max(n_total, 1))),
                work_kT={
                    "median": round(float(np.median(works)), 3) if works else None,
                    "p5": round(float(np.percentile(works, 5)), 3) if works else None,
                    "p95": round(float(np.percentile(works, 95)), 3) if works else None,
                    "n_finite": len(works),
                },
                wall_s_per_iteration=(
                    round(float(np.mean([r["wall_s"] for r in rows[1:]])), 1)
                    if len(rows) > 1
                    else None
                ),
            )
            write()  # incremental: partial runs still land
            log(
                f"# NC={nsteps_nc} iter {i}: acc {acc.mean():.3f} "
                f"(cum {p:.4f} over {n_total}), median work "
                f"{np.median(fin) if len(fin) else float('nan'):+.2f} kT, {wall:.0f}s"
            )
        log(f"# nstepsNC={nsteps_nc}: acceptance {point['acceptance']:.4f} "
            f"± {point['acceptance_stderr']:.4f} over {n_total}")

    write()
    print(
        json.dumps(
            {
                "curve": [
                    {
                        "nstepsNC": pt["nstepsNC"],
                        "acceptance": pt.get("acceptance"),
                        "samples": pt.get("samples"),
                    }
                    for pt in curve
                ]
            }
        )
    )


if __name__ == "__main__":
    main()
