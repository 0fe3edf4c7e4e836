"""Aggregate switching throughput vs replica count (frozen culled protocol)."""

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

    from blues_tpu.core.state import maxwell_boltzmann_velocities
    from blues_tpu.integrators.constraints import make_constraint_fns
    from blues_tpu.integrators.langevin import LangevinParams
    from blues_tpu.integrators.minimize import minimize_fire
    from blues_tpu.integrators.ncmc import make_ncmc_protocol
    from blues_tpu.integrators.schedules import build_ncmc_schedule
    from blues_tpu.moves import RandomLigandRotationMove
    from blues_tpu.potentials.energy import make_energy_fn, make_force_fn
    from blues_tpu.testsystems import t4_scale_binding_site_box

    system, x0 = t4_scale_binding_site_box(n_atoms=22340)
    lig = system.topology.select_resname("LIG")
    box = jnp.asarray(system.box, jnp.float32)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        fro = system.freeze_radius(np.asarray(x0), lig, 0.5)
    cx, cv = make_constraint_fns(fro.constraints, fro.masses)
    efn = make_energy_fn(fro, nonbonded_method="PME", cutoff=0.9,
                         ewald_tolerance=0.005, nonbonded_backend="pallas")
    ffn = make_force_fn(efn)
    x = jax.jit(lambda x: minimize_fire(ffn, fro.masses, x, box, n_steps=400,
                constrain_x=cx)[0])(jnp.asarray(x0, jnp.float32))
    jax.block_until_ready(x)
    lp = LangevinParams(dt=0.002, friction=1.0, temperature=300.0)
    schedule = build_ncmc_schedule(50)
    move = RandomLigandRotationMove(lig, fro.masses)
    protocol = make_ncmc_protocol(efn, ffn, fro.masses, lp, cx, cv, schedule, move=move)
    key = jax.random.PRNGKey(0)
    kv, kp = jax.random.split(key)

    res = {}
    for R in (32, 64):
        if R == 1:
            pj = jax.jit(protocol)
            v = cv(maxwell_boltzmann_velocities(kv, fro.masses, 300.0), x)
            r = pj(x, v, box, kp)
            jax.block_until_ready(r.positions)
            t0 = time.perf_counter()
            for i in range(3):
                r = pj(x, v, box, jax.random.fold_in(kp, i))
            jax.block_until_ready(r.positions)
            sps = 3 * 50 / (time.perf_counter() - t0)
        else:
            vprot = jax.jit(jax.vmap(protocol, in_axes=(0, 0, None, 0)))
            xs = jnp.broadcast_to(x, (R,) + x.shape)
            keys = jax.random.split(kp, R)
            vs = jax.vmap(lambda k: cv(
                maxwell_boltzmann_velocities(k, fro.masses, 300.0), x))(keys)
            r = vprot(xs, vs, box, keys)
            jax.block_until_ready(r.positions)
            t0 = time.perf_counter()
            for i in range(2):
                keys_i = jax.vmap(lambda k: jax.random.fold_in(k, i + 1))(keys)
                r = vprot(xs, vs, box, keys_i)
                jax.block_until_ready(r.positions)
            sps = 2 * R * 50 / (time.perf_counter() - t0)
        res[str(R)] = round(sps, 1)
        log(f"replicas={R}: {sps:.1f} aggregate switching steps/s")
    print(json.dumps(res))


if __name__ == "__main__":
    main()
