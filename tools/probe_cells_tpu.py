"""TPU probe: shift-table cells backend + unique-index constraint scatter.

Scan-amortized timings at 22,340 atoms. One JSON line to stdout.
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


def timeit_scan(step, x, n_inner=20, n_outer=3):
    @jax.jit
    def scanned(x0):
        return jax.lax.scan(lambda c, _: (step(c), None), x0, None, length=n_inner)[0]

    out = scanned(x)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n_outer):
        out = scanned(x)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / (n_outer * n_inner) * 1e3


def main():
    from blues_tpu.core.state import maxwell_boltzmann_velocities
    from blues_tpu.integrators.constraints import make_constraint_fns
    from blues_tpu.integrators.langevin import LangevinParams, run_md
    from blues_tpu.potentials.energy import make_energy_fn, make_force_fn
    from blues_tpu.testsystems import t4_scale_binding_site_box

    system, x0 = t4_scale_binding_site_box(n_atoms=22340)
    box = jnp.asarray(system.box, jnp.float32)
    x = jnp.asarray(x0, jnp.float32)
    res = {}

    # pallas O(N^2) as the in-process scale reference
    for b in ("pallas", "cells"):
        efn = make_energy_fn(system, nonbonded_method="PME", cutoff=0.9,
                             ewald_tolerance=0.005, nonbonded_backend=b)
        ffn = make_force_fn(efn)

        def ef(c, _f=ffn):
            e, f = _f(c, box, None)
            return c + 1e-30 * f + 1e-30 * e

        res[f"EF_{b}_ms"] = timeit_scan(ef, x)
        log(f"unfrozen E+F [{b}]: {res[f'EF_{b}_ms']:.3f} ms")

    cx, cv = make_constraint_fns(system.constraints, system.masses)
    res["constrain_x_ms"] = timeit_scan(lambda c: cx(c, c), x)
    res["constrain_v_ms"] = timeit_scan(lambda c: cv(c, c), x)
    log(f"constrain_x: {res['constrain_x_ms']:.3f} ms, "
        f"constrain_v: {res['constrain_v_ms']:.3f} ms")

    # full unfrozen MD step with cells (the production nstepsMD stage cost)
    efc = make_energy_fn(system, nonbonded_method="PME", cutoff=0.9,
                         ewald_tolerance=0.005, nonbonded_backend="cells")
    ffc = make_force_fn(efc)
    lp = LangevinParams(dt=0.002, friction=1.0, temperature=300.0)
    key = jax.random.PRNGKey(0)
    v = cv(maxwell_boltzmann_velocities(key, system.masses, 300.0), x)

    @jax.jit
    def md20(x, v, key):
        return run_md(ffc, system.masses, lp, cx, cv, x, v, box, key, 20)[0]

    out = md20(x, v, key)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for i in range(3):
        out = md20(x, v, jax.random.fold_in(key, i))
    jax.block_until_ready(out)
    res["md_step_cells_ms"] = (time.perf_counter() - t0) / 3 / 20 * 1e3
    log(f"unfrozen MD step [cells]: {res['md_step_cells_ms']:.3f} ms")

    print(json.dumps({k: round(v, 3) for k, v in res.items()}))


if __name__ == "__main__":
    main()
