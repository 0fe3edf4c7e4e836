"""Production-length work-precision evidence (VERDICT r2 #7; SURVEY 7.3.5).

Runs the FULL 10,000-step production NCMC switching protocol on the frozen
flagship system in f32 (the TPU production dtype), recording the
end-of-micro-step positions of the mobile subset (NCMCResult.micro_stream),
then REPLAYS the exact work bookkeeping of that same trajectory in f64:

    W = sum_k [ E(x_{k-1}, g_k) - E(x_{k-1}, g_{k-1}) ]        (lambda terms)
      + E(x_mm, g_pre) - E(x_mm, g_mm)                          (move-lambda)
      + E(x_mid, g_pre) - E(x_mm, g_pre)                        (move work)
      + E(x_M, g_final) - E(x_M, g_M)                           (closing)

Every term is an energy difference at a RECORDED position, so the f64 sum
is the ground-truth work of the f32 trajectory — it captures BOTH the f32
accumulation error (what Kahan fixes) and the per-evaluation f32 energy
rounding (the cancellation of ~1e5 kJ/mol energies into ~1e-2 kJ/mol
differences). The protocol is also run with naive f32 accumulation (same
keys -> bitwise-same trajectory; the accumulator does not feed back into
dynamics) to separate the two error sources.

Writes docs/work_precision_production.json:
    {W_kahan_f32, W_naive_f32, W_f64_replay, |dW| values in kT, ...}

Two phases (x64 is unavailable on the TPU backend, so the f64 replay runs
in a separate CPU process):
    python tools/work_precision_replay.py --phase run            # TPU f32
    JAX_PLATFORMS=cpu python tools/work_precision_replay.py --phase replay
The run phase dumps the stream to --stream-file (npz); the replay phase
loads it and writes the final artifact.
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

KT300 = 8.31446261815324e-3 * 300.0


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nsteps", type=int, default=10000)
    ap.add_argument("--n-atoms", type=int, default=22340)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--phase", choices=["run", "replay", "both"], default="both")
    ap.add_argument("--stream-file", default="/tmp/wp_stream.npz")
    ap.add_argument(
        "--replay-no-split", action="store_true",
        help="diagnostic: full-E lambda differences instead of lambda_ea",
    )
    ap.add_argument(
        "--replay-f32", action="store_true",
        help="diagnostic: replay in f32 — should reproduce the protocol's "
        "own W if the replay bookkeeping matches the protocol exactly",
    )
    ap.add_argument("--out", default="docs/work_precision_production.json")
    args = ap.parse_args()
    if args.cpu or args.phase == "replay":
        jax.config.update("jax_platforms", "cpu")

    import warnings

    from blues_tpu.core.state import maxwell_boltzmann_velocities
    from blues_tpu.integrators.constraints import make_constraint_fns
    from blues_tpu.integrators.langevin import LangevinParams
    from blues_tpu.integrators.minimize import minimize_fire
    from blues_tpu.integrators.ncmc import make_ncmc_protocol
    from blues_tpu.integrators.schedules import build_ncmc_schedule
    from blues_tpu.moves import RandomLigandRotationMove
    from blues_tpu.potentials.energy import make_energy_fn, make_force_fn
    from blues_tpu.testsystems import t4_scale_binding_site_box

    backend = "pallas" if jax.default_backend() == "tpu" else "tiled"
    system, x0 = t4_scale_binding_site_box(n_atoms=args.n_atoms)
    lig = system.topology.select_resname("LIG")
    # HMR 3.024 Da over bonds+constraints — required for the 4 fs production
    # timestep (reference examples/rotmove_cuda.yml:25); without it the f32
    # run integrates unstably and the stream goes NaN mid-protocol
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
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        fs = system.freeze_radius(np.asarray(x0), lig, 0.5)
    m = np.asarray(fs.masses)
    is_alch = np.zeros(fs.n_atoms, bool)
    is_alch[np.asarray(fs.alchemical.atoms)] = True
    stream_atoms = np.where((m > 0) | is_alch)[0]
    log(f"# {fs.n_atoms} atoms, stream subset {len(stream_atoms)}; backend={backend}")

    # culling disabled: over a 10k-step (40 ps) protocol the DECOUPLED ligand
    # free-diffuses ~1 nm and escapes its COM cage ball; the guard's
    # NaN-poison veto is correct production behavior (driver rejects) but
    # this study needs one finite trajectory — the reference completes such
    # proposals and Metropolis-rejects them, so an unvetoed trajectory is
    # the faithful shape (measured: un-HMR'd dt=4fs went NaN by instability;
    # HMR'd went NaN at step 4223 by cage escape)
    efn_kwargs = dict(
        nonbonded_method="PME", cutoff=1.0, ewald_tolerance=0.005,
        frozen_cull_skin=None,
    )
    params = LangevinParams(dt=0.004, friction=1.0, temperature=300.0)
    schedule = build_ncmc_schedule(args.nsteps)
    M = schedule.n_micro
    mm = schedule.move_micro

    if args.phase in ("run", "both"):
        efn = make_energy_fn(fs, nonbonded_backend=backend, **efn_kwargs)
        ffn = make_force_fn(efn)
        cx, cv = make_constraint_fns(fs.constraints, fs.masses)
        box = jnp.asarray(fs.box, jnp.float32)
        x = jnp.asarray(x0, jnp.float32)
        x, _ = jax.jit(
            lambda x: minimize_fire(ffn, fs.masses, x, box, n_steps=400, constrain_x=cx)
        )(x)

        move = RandomLigandRotationMove(lig, fs.masses)
        key = jax.random.PRNGKey(777)
        kv, kp = jax.random.split(key)
        v = cv(maxwell_boltzmann_velocities(kv, fs.masses, 300.0), x)

        results = {}
        stream = None
        for label, naive in (("kahan", False), ("naive", True)):
            protocol = make_ncmc_protocol(
                efn, ffn, fs.masses, params, cx, cv, schedule, move=move,
                naive_accumulation=naive,
                stream_atoms=stream_atoms if not naive else None,
            )
            pj = jax.jit(protocol)
            t0 = time.time()
            res = pj(x, v, box, kp)
            jax.block_until_ready(res.protocol_work)
            w = float(res.protocol_work)
            log(f"# {label}: W = {w:.6f} kJ/mol ({w / KT300:.6f} kT) in {time.time() - t0:.0f}s")
            results[label] = w
            if not naive:
                stream = np.asarray(res.micro_stream)  # (M, S, 3) f32
                mid_pos = np.asarray(res.mid_positions)
                e_init_f32 = float(res.e_initial)
                e_final_f32 = float(res.e_final)
        x_start = np.asarray(jax.jit(lambda xx: cx(xx, xx))(x), np.float64)
        np.savez_compressed(
            args.stream_file,
            stream=stream,
            mid_pos=mid_pos,
            x_start=x_start,
            w_kahan=results["kahan"],
            w_naive=results["naive"],
            e_init_f32=e_init_f32,
            e_final_f32=e_final_f32,
            stream_atoms=stream_atoms,
            run_backend=backend,
            run_device=str(jax.devices()[0]),
        )
        log(f"# wrote stream to {args.stream_file}")
        if args.phase == "run":
            return

    data = np.load(args.stream_file)
    stream = data["stream"]
    mid_pos = data["mid_pos"]
    x_start = data["x_start"]
    results = {"kahan": float(data["w_kahan"]), "naive": float(data["w_naive"])}
    e_init_f32 = float(data["e_init_f32"])
    e_final_f32 = float(data["e_final_f32"])
    assert (data["stream_atoms"] == stream_atoms).all()
    # provenance of the f32 RUN phase (the artifact is written by the CPU
    # replay process; without these the backend/device fields would
    # misreport the replay environment)
    run_backend = str(data["run_backend"]) if "run_backend" in data.files else backend
    run_device = str(data["run_device"]) if "run_device" in data.files else None

    # --- f64 replay of the recorded trajectory's work bookkeeping -----------
    assert stream.shape[0] == M, stream.shape
    template = np.array(x_start)  # frozen atoms never move

    def full_x(sub):
        out = template.copy()
        out[stream_atoms] = np.asarray(sub, np.float64)
        return out

    rdtype = jnp.float32 if args.replay_f32 else jnp.float64
    log(f"# building {jnp.dtype(rdtype).name} replay energy fn (tiled backend)...")
    t0 = time.time()
    with jax.enable_x64(not args.replay_f32):
        efn64 = make_energy_fn(fs, nonbonded_backend="tiled", **efn_kwargs)
        box64 = jnp.asarray(np.asarray(fs.box), rdtype)
        efn64_j = jax.jit(efn64, static_argnames=())

        def E(xf, g):
            gg = {k: jnp.asarray(v, rdtype) for k, v in g.items()}
            return float(efn64_j(jnp.asarray(xf, rdtype), box64, gg))

        # lambda-difference terms at fixed positions need only the
        # alchemical part (E0 + bonded cancel EXACTLY) — this is what makes
        # a full 10k-step f64 replay run in minutes instead of hours
        ea64_raw = (
            None
            if args.replay_no_split
            else getattr(efn64.nonbonded, "lambda_ea", None)
        )
        if ea64_raw is not None:
            ea64_j = jax.jit(ea64_raw)

            def dE_lam(xf, g_new, g_old):
                x64v = jnp.asarray(xf, rdtype)
                gn = {k: jnp.asarray(v, rdtype) for k, v in g_new.items()}
                go = {k: jnp.asarray(v, rdtype) for k, v in g_old.items()}
                return float(ea64_j(x64v, box64, gn)) - float(ea64_j(x64v, box64, go))

        else:

            def dE_lam(xf, g_new, g_old):
                return E(xf, g_new) - E(xf, g_old)

        g_step = [
            {k: schedule.globals_per_step[k][i] for k in schedule.globals_per_step}
            for i in range(M)
        ]
        g_init = schedule.globals_initial
        g_pre = schedule.globals_pre_move

        W64 = 0.0
        report_every = max(M // 20, 1)
        for k in range(1, M + 1):
            if k == mm + 1 and mm > 0:
                x_prev = full_x(mid_pos[stream_atoms])
                g_prev = g_pre
            else:
                x_prev = x_start if k == 1 else full_x(stream[k - 2])
                g_prev = g_init if k == 1 else g_step[k - 2]
            W64 += dE_lam(x_prev, g_step[k - 1], g_prev)
            if k == mm and mm > 0:
                x_mm = full_x(stream[mm - 1])
                W64 += dE_lam(x_mm, g_pre, g_step[mm - 1])
                x_mid = full_x(mid_pos[stream_atoms])
                # external move work: positions change -> full energies
                W64 += E(x_mid, g_pre) - E(x_mm, g_pre)
            if k % report_every == 0:
                log(f"#   replay {k}/{M}  W64 = {W64 / KT300:+.6f} kT")
        x_end = full_x(stream[M - 1])
        W64 += dE_lam(x_end, schedule.globals_final, g_step[M - 1])
    log(f"# f64 replay done in {time.time() - t0:.0f}s")

    artifact = {
        "protocol": {
            "nstepsNC": args.nsteps,
            "n_micro": M,
            "dt_fs": 4.0,
            "cutoff_nm": 1.0,
            "system_atoms": int(fs.n_atoms),
            "mobile_atoms": int(len(stream_atoms)),
            "backend_f32": run_backend,
            "device_f32_run": run_device,
            "backend_f64_replay": "tiled (exact lax.erfc in f64)",
            "hmr_Da": 3.024,
            "frozen_cull": "disabled (cage-ball veto would truncate the "
            "stream; reference never vetoes — see tool docstring)",
            "note": (
                "f64 replay recomputes every work term (energy differences "
                "at recorded f32-trajectory positions) in float64 — ground "
                "truth for BOTH accumulation and per-eval rounding error."
            ),
        },
        "W_kahan_f32_kT": results["kahan"] / KT300,
        "W_naive_f32_kT": results["naive"] / KT300,
        "W_f64_replay_kT": W64 / KT300,
        "abs_err_kahan_vs_f64_kT": abs(results["kahan"] - W64) / KT300,
        "abs_err_naive_vs_f64_kT": abs(results["naive"] - W64) / KT300,
        "kahan_vs_naive_kT": abs(results["kahan"] - results["naive"]) / KT300,
        "e_initial_f32": e_init_f32,
        "e_final_f32": e_final_f32,
        "device_f64_replay": str(jax.devices()[0]),
    }
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(artifact, f, indent=1)
    log(f"# wrote {args.out}")
    print(json.dumps({k: artifact[k] for k in (
        "W_kahan_f32_kT", "W_naive_f32_kT", "W_f64_replay_kT",
        "abs_err_kahan_vs_f64_kT", "abs_err_naive_vs_f64_kT")}))


if __name__ == "__main__":
    main()
