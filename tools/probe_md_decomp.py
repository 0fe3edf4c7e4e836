"""Decompose the unfrozen MD-step cost (cells backend, 22k atoms).

Variants timed scan-amortized: force-only, force+integrator (no
constraints), full BAOAB. One JSON line to stdout.
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
    from blues_tpu.core.state import maxwell_boltzmann_velocities
    from blues_tpu.integrators.constraints import make_constraint_fns
    from blues_tpu.integrators.langevin import LangevinParams, run_md
    from blues_tpu.potentials.energy import make_energy_fn, make_force_fn
    from blues_tpu.testsystems import t4_scale_binding_site_box

    system, x0 = t4_scale_binding_site_box(n_atoms=22340)
    box = jnp.asarray(system.box, jnp.float32)
    x = jnp.asarray(x0, jnp.float32)
    res = {}

    efn = make_energy_fn(system, nonbonded_method="PME", cutoff=0.9,
                         ewald_tolerance=0.005, nonbonded_backend="cells")
    ffn = make_force_fn(efn)
    cx, cv = make_constraint_fns(system.constraints, system.masses)
    ident_x = lambda xn, xr: xn
    ident_v = lambda v, xx: v
    lp = LangevinParams(dt=0.002, friction=1.0, temperature=300.0)
    key = jax.random.PRNGKey(0)
    v = cv(maxwell_boltzmann_velocities(key, system.masses, 300.0), x)

    def timed_md(cxf, cvf, label, n_steps=20, n_rep=3):
        @jax.jit
        def md(x, v, key):
            return run_md(ffn, system.masses, lp, cxf, cvf, x, v, box, key, n_steps)[0]

        out = md(x, v, key)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for i in range(n_rep):
            out = md(x, v, jax.random.fold_in(key, i))
        jax.block_until_ready(out)
        ms = (time.perf_counter() - t0) / (n_rep * n_steps) * 1e3
        log(f"MD step [{label}]: {ms:.3f} ms")
        return ms

    # force-only scan baseline
    @jax.jit
    def fscan(x0):
        def body(c, _):
            e, f = ffn(c, box, None)
            return c + 1e-30 * f + 1e-30 * e, None

        return jax.lax.scan(body, x0, None, length=20)[0]

    out = fscan(x)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(3):
        out = fscan(x)
    jax.block_until_ready(out)
    res["force_only_ms"] = (time.perf_counter() - t0) / 60 * 1e3
    log(f"force only: {res['force_only_ms']:.3f} ms")

    res["md_noconstraints_ms"] = timed_md(ident_x, ident_v, "no constraints")
    res["md_full_ms"] = timed_md(cx, cv, "full")

    print(json.dumps({k: round(v, 3) for k, v in res.items()}))


if __name__ == "__main__":
    main()
