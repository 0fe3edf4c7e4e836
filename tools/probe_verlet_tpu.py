"""TPU probe: verlet-list cost model at benchmark scale (22,340 atoms).

Measures build, apply, stateless E+F, and the amortized MD step with
rebuild-every-R — all scan-amortized to beat the remote-tunnel dispatch
floor. Diagnostics to stderr, one JSON line to stdout.
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


def timeit_scan(step_x_to_x, x, n_inner=20, n_outer=3):
    @jax.jit
    def scanned(x0):
        return jax.lax.scan(
            lambda c, _: (step_x_to_x(c), None), x0, None, length=n_inner
        )[0]

    out = scanned(x)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n_outer):
        out = scanned(x)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / (n_outer * n_inner) * 1e3


def main():
    from blues_tpu.testsystems import t4_scale_binding_site_box
    from blues_tpu.potentials.energy import make_energy_fn, make_force_fn
    from blues_tpu.integrators.constraints import make_constraint_fns
    from blues_tpu.integrators.langevin import LangevinParams, make_md_step
    from blues_tpu.integrators.minimize import minimize_fire
    from blues_tpu.core.state import maxwell_boltzmann_velocities

    system, x0 = t4_scale_binding_site_box(n_atoms=22340)
    box = jnp.asarray(system.box, jnp.float32)
    res = {}

    efn = make_energy_fn(system, nonbonded_method="PME", cutoff=0.9,
                         ewald_tolerance=0.005, nonbonded_backend="verlet")
    ffn = make_force_fn(efn)
    cx, cv = make_constraint_fns(system.constraints, system.masses)
    # minimize with the cells backend (stateless verlet inside the FIRE
    # loop is a needlessly heavy compile)
    efm = make_energy_fn(system, nonbonded_method="PME", cutoff=0.9,
                         ewald_tolerance=0.005, nonbonded_backend="cells")
    ffm = make_force_fn(efm)
    x = jax.jit(lambda x: minimize_fire(ffm, system.masses, x, box,
                n_steps=200, constrain_x=cx)[0])(jnp.asarray(x0, jnp.float32))
    jax.block_until_ready(x)
    ps = efn.nonbonded.pair_sum
    log(f"grid {ps.grid} K {ps.capacity} skin {ps.skin}")

    # stateless E+F (build per eval)
    def ef(c):
        e, f = ffn(c, box, None)
        return c + 1e-30 * f + 1e-30 * e

    res["verlet_stateless_EF_ms"] = timeit_scan(ef, x)
    log(f"stateless E+F: {res['verlet_stateless_EF_ms']:.3f} ms")

    # build only
    def b(c):
        nl = efn.nlist_build(c, box)
        return c + 1e-30 * nl["ref_x"] + 1e-30 * nl["idx"].sum().astype(c.dtype)

    res["verlet_build_ms"] = timeit_scan(b, x)
    log(f"build: {res['verlet_build_ms']:.3f} ms")

    # apply only (fixed list)
    nlist = jax.jit(efn.nlist_build)(x, box)
    jax.block_until_ready(nlist["idx"])

    def a(c):
        e, f = efn.force_with_nlist(nlist, c, box, None)
        return c + 1e-30 * f + 1e-30 * e

    res["verlet_apply_EF_ms"] = timeit_scan(a, x)
    log(f"apply E+F (incl. rest terms): {res['verlet_apply_EF_ms']:.3f} ms")

    # amortized MD step, rebuild every 10
    lp = LangevinParams(dt=0.002, friction=1.0, temperature=300.0)
    key = jax.random.PRNGKey(0)
    v = cv(maxwell_boltzmann_velocities(key, system.masses, 300.0), x)

    @jax.jit
    def md50(x, v, key):
        def seg(carry, _):
            x, v, f, key, box_ = carry
            nl = efn.nlist_build(x, box_)
            ffl = lambda xx, bb, g: efn.force_with_nlist(nl, xx, bb, g)
            step = make_md_step(ffl, system.masses, lp, cx, cv)
            out, _ = jax.lax.scan(step, (x, v, f, key, box_), None, length=10)
            return out, None

        _, f0 = ffn(x, box, None)
        carry = (x, v, f0, key, box)
        carry, _ = jax.lax.scan(seg, carry, None, length=5)
        return carry[0], carry[1]

    xo, vo = md50(x, v, key)
    jax.block_until_ready(xo)
    t0 = time.perf_counter()
    for i in range(3):
        xo, vo = md50(x, v, jax.random.fold_in(key, i))
    jax.block_until_ready(xo)
    res["verlet_md_step_ms"] = (time.perf_counter() - t0) / 3 / 50 * 1e3
    e_end, _ = ffn(xo, box, None)
    log(f"MD step (rebuild/10): {res['verlet_md_step_ms']:.3f} ms; "
        f"end E finite: {bool(jnp.isfinite(e_end))}")

    # reference: cells backend stateless E+F
    efc = make_energy_fn(system, nonbonded_method="PME", cutoff=0.9,
                         ewald_tolerance=0.005, nonbonded_backend="cells")
    ffc = make_force_fn(efc)

    def efc_step(c):
        e, f = ffc(c, box, None)
        return c + 1e-30 * f + 1e-30 * e

    res["cells_EF_ms"] = timeit_scan(efc_step, x)
    log(f"cells E+F: {res['cells_EF_ms']:.3f} ms")

    print(json.dumps({k: round(v, 3) for k, v in res.items()}))


if __name__ == "__main__":
    main()
