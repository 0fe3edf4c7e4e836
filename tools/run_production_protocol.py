"""Production-length NCMC protocol on-chip: work-precision + throughput.

Runs the reference production protocol shape (nstepsNC=10000,
examples/rotmove_cuda.yml:57) on the 22,340-atom flagship system on the
TPU: a single 10k-micro-step switching protocol with the midpoint rotation,
frozen production config, culled pallas kernel.

Evidence recorded (docs/roadmap.md work-precision item, SURVEY.md 7.3.5):
  * the protocol completes with finite work of plausible magnitude (the
    slow 10k-step switch should accumulate far less work than the 50-step
    bench protocol);
  * Kahan-compensated f32 accumulation vs the plain-sum accumulator
    (integrators/ncmc.py naive_accumulation): |dW| << kT over 10k steps;
  * wall-clock per switching step at production length.

One JSON line to stdout.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    import warnings

    from blues_tpu import units
    from blues_tpu.core.state import maxwell_boltzmann_velocities
    from blues_tpu.integrators.constraints import make_constraint_fns
    from blues_tpu.integrators.langevin import LangevinParams
    from blues_tpu.integrators.minimize import minimize_fire
    from blues_tpu.integrators.ncmc import make_ncmc_protocol
    from blues_tpu.integrators.schedules import build_ncmc_schedule
    from blues_tpu.moves import RandomLigandRotationMove
    from blues_tpu.potentials.energy import make_energy_fn, make_force_fn
    from blues_tpu.testsystems import t4_scale_binding_site_box

    n_nc = int(os.environ.get("NSTEPS_NC", "10000"))
    cull = os.environ.get("CULL", "1") == "1"
    system, x0 = t4_scale_binding_site_box(n_atoms=22340)
    lig = system.topology.select_resname("LIG")
    box = jnp.asarray(system.box, jnp.float32)

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        fro = system.freeze_radius(np.asarray(x0), lig, 0.5)
    cx, cv = make_constraint_fns(fro.constraints, fro.masses)
    efn = make_energy_fn(fro, nonbonded_method="PME", cutoff=0.9,
                         ewald_tolerance=0.005, nonbonded_backend="pallas",
                         frozen_cull_skin=0.45 if cull else None)
    ffn = make_force_fn(efn)
    x = jax.jit(lambda x: minimize_fire(ffn, fro.masses, x, box, n_steps=400,
                constrain_x=cx)[0])(jnp.asarray(x0, jnp.float32))
    jax.block_until_ready(x)
    e0 = efn(x, box, None)
    log(f"cull={cull}; post-minimize E = {float(e0):.1f}")

    lp = LangevinParams(dt=0.002, friction=1.0, temperature=300.0)
    schedule = build_ncmc_schedule(n_nc)
    move = RandomLigandRotationMove(lig, fro.masses)
    key = jax.random.PRNGKey(0)
    kv, kp = jax.random.split(key)
    v = cv(maxwell_boltzmann_velocities(kv, fro.masses, 300.0), x)
    kT = units.kT(300.0)

    out = {"nstepsNC": n_nc}
    for name, naive in (("kahan", False), ("naive", True)):
        prot = jax.jit(make_ncmc_protocol(
            efn, ffn, fro.masses, lp, cx, cv, schedule, move=move,
            naive_accumulation=naive,
        ))
        r = prot(x, v, box, kp)
        jax.block_until_ready(r.positions)
        t0 = time.perf_counter()
        r = prot(x, v, box, jax.random.fold_in(kp, 1))
        jax.block_until_ready(r.positions)
        dt_ms = (time.perf_counter() - t0) / n_nc * 1e3
        w = float(r.protocol_work)
        out[f"work_{name}_kJmol"] = w
        out[f"step_{name}_ms"] = round(dt_ms, 4)
        log(f"{name}: W = {w:.4f} kJ/mol ({w/kT:.3f} kT), "
            f"{dt_ms:.3f} ms/step, finite={np.isfinite(w)}; "
            f"mid_work={float(r.mid_work):.3f} "
            f"e_final={float(r.e_final):.1f} "
            f"x_finite={bool(jnp.all(jnp.isfinite(r.positions)))} "
            f"maxdisp={float(jnp.max(jnp.linalg.norm(r.positions - x, axis=-1))):.3f}")
    out["dW_kT"] = abs(out["work_kahan_kJmol"] - out["work_naive_kJmol"]) / kT
    out["kT_kJmol"] = kT
    log(f"|W_kahan - W_naive| = {out['dW_kT']:.5f} kT")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
