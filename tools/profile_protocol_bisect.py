"""Bisect the 64-replica NCMC protocol step cost: which component owns the
gap between the sum-of-parts (~7 ms/step-batch) and the measured ~35 ms?

Variants timed at R=64 (and an R-scaling sweep of the best config):
  full        — production protocol as benched
  no_move     — move=None (strips before/propose/after machinery)
  no_constr   — identity constraint projections (strips 5 solves/step)
  naive_acc   — naive instead of Kahan accumulation
  free_flight — no_move + no_constr (lower bound of the dynamics core)
"""

import argparse
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
    ap.add_argument("--n-atoms", type=int, default=22340)
    ap.add_argument("--nsteps", type=int, default=50)
    ap.add_argument("--replicas", type=int, default=64)
    ap.add_argument("--sweep", default="")
    args = ap.parse_args()

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
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        fs = system.freeze_radius(np.asarray(x0), lig, 0.5)
    efn = make_energy_fn(
        fs, nonbonded_method="PME", cutoff=0.9, ewald_tolerance=0.005,
        nonbonded_backend=backend,
    )
    ffn = make_force_fn(efn)
    cx, cv = make_constraint_fns(fs.constraints, fs.masses)
    ident_x = lambda xn, x0_: xn
    ident_v = lambda v, x: v
    box = jnp.asarray(fs.box, jnp.float32)
    x = jnp.asarray(x0, jnp.float32)
    x, _ = jax.jit(
        lambda x: minimize_fire(ffn, fs.masses, x, box, n_steps=400, constrain_x=cx)
    )(x)
    params = LangevinParams(dt=0.002, friction=1.0, temperature=300.0)
    schedule = build_ncmc_schedule(args.nsteps)
    move = RandomLigandRotationMove(lig, fs.masses)
    key = jax.random.PRNGKey(0)
    kv, kp = jax.random.split(key)
    v = cv(maxwell_boltzmann_velocities(kv, fs.masses, 300.0), x)

    R = args.replicas

    def time_protocol(protocol, R):
        if R == 1:
            pj = jax.jit(protocol)
            r = pj(x, v, box, kp)
            jax.block_until_ready(r.positions)
            t0 = time.time()
            for i in range(3):
                r = pj(x, v, box, jax.random.fold_in(kp, i))
            jax.block_until_ready(r.positions)
            return 3 * schedule.n_micro / (time.time() - t0)
        vp = jax.jit(jax.vmap(protocol, in_axes=(0, 0, None, 0)))
        xs = jnp.broadcast_to(x, (R,) + x.shape)
        keys = jax.random.split(kp, R)
        vs = jax.vmap(lambda k: maxwell_boltzmann_velocities(k, fs.masses, 300.0))(keys)
        r = vp(xs, vs, box, keys)
        jax.block_until_ready(r.positions)
        t0 = time.time()
        for i in range(2):
            keys_i = jax.vmap(lambda k: jax.random.fold_in(k, i + 1))(keys)
            r = vp(xs, vs, box, keys_i)
            jax.block_until_ready(r.positions)
        return 2 * R * schedule.n_micro / (time.time() - t0)

    variants = {
        "full": dict(move=move, cx=cx, cv=cv, naive=False),
        "no_move": dict(move=None, cx=cx, cv=cv, naive=False),
        "no_constr": dict(move=move, cx=ident_x, cv=ident_v, naive=False),
        "naive_acc": dict(move=move, cx=cx, cv=cv, naive=True),
        "free_flight": dict(move=None, cx=ident_x, cv=ident_v, naive=False),
    }
    for name, spec in variants.items():
        protocol = make_ncmc_protocol(
            efn, ffn, fs.masses, params, spec["cx"], spec["cv"], schedule,
            move=spec["move"], naive_accumulation=spec["naive"],
        )
        sps = time_protocol(protocol, R)
        log(f"# {name}: {sps:.1f} sps aggregate at R={R} ({1000.0 * R * 1.0 / sps:.2f} ms/step-batch)")

    if args.sweep:
        protocol = make_ncmc_protocol(
            efn, ffn, fs.masses, params, cx, cv, schedule, move=move
        )
        for R2 in [int(s) for s in args.sweep.split(",")]:
            sps = time_protocol(protocol, R2)
            log(f"# sweep R={R2}: {sps:.1f} sps aggregate ({sps / R2:.2f}/replica)")


if __name__ == "__main__":
    main()
