"""Acceptance-rate study at the PRODUCTION protocol shape (VERDICT r2 #2).

Reference production protocol (rotmove_cuda.yml:25,47-67): T4-lysozyme +
toluene, nstepsNC=10000, dt=4 fs with HMR 3.024 Da, PME cutoff 10 A,
freeze >5 A + solvent, RandomLigandRotation at the protocol midpoint.

This runs that NCMC shape on the flagship binding-site system (the
reference's eqToluene prmtop is a missing blob) with 64 vmapped replicas
on one chip and records per-iteration acceptance, protocol-work
distribution, and wall-clock into docs/acceptance_production.json.

The MD relaxation stage between proposals is shortened (--nsteps-md,
default 2000 vs the reference's 10000) — it only decorrelates
configurations and does not enter the acceptance criterion; the NCMC
switching protocol itself is the full production length. Recorded in the
artifact.

Usage (TPU, ~6-8 min/iteration-batch at 64 replicas):
    PYTHONPATH=/root/repo python tools/acceptance_study.py --iters 20
"""

import argparse
import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--replicas", type=int, default=64)
    ap.add_argument("--nsteps-nc", type=int, default=10000)
    ap.add_argument("--nsteps-md", type=int, default=2000)
    ap.add_argument("--n-atoms", type=int, default=22340)
    # bounded dispatch: monolithic R=64 iterations at production length die
    # in the remote-TPU execution tunnel (tools/probe_driver_scale.py:
    # OK at nstepsNC<=1000, 'UNAVAILABLE: TPU device error' at 4000);
    # segments of 1000 micro-steps keep each device call ~15 s
    ap.add_argument("--max-dispatch", type=int, default=1000)
    ap.add_argument("--out", default="docs/acceptance_production.json")
    args = ap.parse_args()

    import warnings

    from blues_tpu.moves import MoveEngine, RandomLigandRotationMove
    from blues_tpu.simulation import BLUESSimulation, SimulationConfig
    from blues_tpu.testsystems import t4_scale_binding_site_box

    t_build = time.time()
    system, x0 = t4_scale_binding_site_box(n_atoms=args.n_atoms)
    # HMR 3.024 Da (reference rotmove_cuda.yml:25) over the full bond graph
    # (H bonds live in the constraint list after HBonds conversion)
    from blues_tpu.core.prmtop import repartition_hydrogen_masses

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
    # VMEM-accumulator sweep kernel on TPU (2.22x over tiled,
    # docs/sweep_ab_r256.json); interpret-mode sweep is slow on CPU
    backend = "sweep" if jax.default_backend() == "tpu" else "tiled"
    log(f"# system {system.n_atoms} atoms, {mobile} mobile; backend={backend}")

    cfg = SimulationConfig(
        nIter=args.iters,
        nstepsNC=args.nsteps_nc,
        nstepsMD=args.nsteps_md,
        dt=0.004,  # 4 fs with HMR 3.024 (reference rotmove_cuda.yml:25)
        temperature=300.0,
        friction=1.0,
        nonbonded_method="PME",
        cutoff=1.0,  # 10 A production cutoff
        ewald_tolerance=0.005,
        nonbonded_backend=backend,
        n_replicas=args.replicas,
        max_steps_per_dispatch=args.max_dispatch or None,
    )
    sim = BLUESSimulation(
        fs, MoveEngine(RandomLigandRotationMove(lig, fs.masses)), cfg
    )
    sim.initialize(x0, key=jax.random.PRNGKey(20260817))
    sim.minimize(600)
    log(f"# built+minimized in {time.time() - t_build:.1f}s; compiling protocol...")

    iters = []
    acc_total = 0
    n_total = 0
    works = []

    def write_artifact():
        works_a = np.asarray(works)
        finite = works_a[np.isfinite(works_a) & (np.abs(works_a) < 9e5)]
        artifact = {
            "protocol": {
                "system": f"binding-site flagship {system.n_atoms} atoms ({mobile} mobile)",
                "nstepsNC": args.nsteps_nc,
                "nstepsMD": args.nsteps_md,
                "nstepsMD_reference": 10000,
                "dt_fs": 4.0,
                "hydrogen_mass_Da": 3.024,
                "cutoff_nm": 1.0,
                "ewald_tolerance": 0.005,
                "freeze": ">5A from LIG + solvent (reference rotmove_cuda.yml:42-45)",
                "replicas": args.replicas,
                "max_steps_per_dispatch": args.max_dispatch or None,
                "note": (
                    "NCMC switching protocol at full production length; the MD "
                    "decorrelation stage is shortened (does not enter the "
                    "acceptance criterion). Reference acceptance regime for "
                    "T4-toluene rotation moves (JPCB 2018, 10.1021/acs.jpcb.7b11820) "
                    "is low single-digit percent at 10k-step protocols."
                ),
            },
            "samples": int(n_total),
            "acceptance_ratio": acc_total / max(n_total, 1),
            "acceptance_stderr": float(
                np.sqrt(max(acc_total, 1) * (1 - acc_total / max(n_total, 1))) / max(n_total, 1)
            ),
            "work_kT": {
                "mean": float(np.mean(finite)) if len(finite) else None,
                "median": float(np.median(finite)) if len(finite) else None,
                "p5": float(np.percentile(finite, 5)) if len(finite) else None,
                "p95": float(np.percentile(finite, 95)) if len(finite) else None,
                "n_vetoed_or_nan": int(len(works_a) - len(finite)),
            },
            "per_iteration": iters,
            "wall_s_per_iteration_batch": float(np.mean([it["wall_s"] for it in iters[1:]])) if len(iters) > 1 else None,
            "device": str(jax.devices()[0]),
        }
        os.makedirs(os.path.dirname(args.out), exist_ok=True)
        with open(args.out, "w") as f:
            json.dump(artifact, f, indent=1)
        return artifact

    for i in range(args.iters):
        t0 = time.time()
        stats, _, _ = sim.run_iteration()
        jax.block_until_ready(stats.accepted)
        wall = time.time() - t0
        acc = np.asarray(stats.accepted)
        w = np.asarray(stats.protocol_work) / (8.31446261815324e-3 * 300.0)
        la = np.asarray(stats.log_accept)
        acc_total += int(acc.sum())
        n_total += acc.size
        works.extend([float(v) for v in np.ravel(w)])
        iters.append(
            {
                "iter": i,
                "wall_s": round(wall, 2),
                "acceptance": float(acc.mean()),
                # vetoed/clashed replicas carry NaN work (rejected by
                # construction); stats are over the finite samples
                "work_kT_mean": float(np.nanmean(w)) if np.isfinite(w).any() else None,
                "work_kT_median": float(np.nanmedian(w)) if np.isfinite(w).any() else None,
                "n_work_nan": int(np.sum(~np.isfinite(w))),
                "log_accept_mean": float(np.mean(la[np.isfinite(la)])) if np.isfinite(la).any() else None,
                "md_failed": int(np.asarray(stats.md_failed).sum()),
                # do MD blowups (NaN -> rollback) hit the replicas whose
                # move was just accepted (strained accepted poses), or
                # random ones? diagnostic for 4 fs HMR stability
                "md_failed_and_accepted": int(
                    (np.asarray(stats.md_failed) & acc.astype(bool)).sum()
                ),
            }
        )
        log(
            f"# iter {i}: acc {acc.mean():.3f} (cum {acc_total / max(n_total, 1):.3f}), "
            f"median work {np.nanmedian(w) if np.isfinite(w).any() else float('nan'):+.2f} kT, {wall:.1f}s"
        )
        artifact = write_artifact()  # incremental: partial runs still commit

    log(f"# wrote {args.out}")
    print(json.dumps({"acceptance": artifact["acceptance_ratio"], "samples": n_total}))


if __name__ == "__main__":
    main()
