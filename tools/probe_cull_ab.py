"""A/B the frozen NCMC protocol: culled vs un-culled pallas columns.

Also times raw E+F scans for both variants (non-foldable feedback) and the
shift-table cells backend. One JSON line to stdout.
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


def timeit_scan(step, x, n_inner=50, n_outer=3):
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
    res = {}

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        fro = system.freeze_radius(np.asarray(x0), lig, 0.5)
    cx, cv = make_constraint_fns(fro.constraints, fro.masses)

    # minimize with the un-culled pallas path (known good)
    ef0 = make_energy_fn(fro, nonbonded_method="PME", cutoff=0.9,
                         ewald_tolerance=0.005, nonbonded_backend="pallas",
                         frozen_cull_skin=None)
    ff0 = make_force_fn(ef0)
    x = jax.jit(lambda x: minimize_fire(ff0, fro.masses, x, box, n_steps=400,
                constrain_x=cx)[0])(jnp.asarray(x0, jnp.float32))
    jax.block_until_ready(x)

    lp = LangevinParams(dt=0.002, friction=1.0, temperature=300.0)
    schedule = build_ncmc_schedule(50)
    move = RandomLigandRotationMove(lig, fro.masses)
    key = jax.random.PRNGKey(0)
    kv, kp = jax.random.split(key)
    v = cv(maxwell_boltzmann_velocities(kv, fro.masses, 300.0), x)

    for name, skin in (("nocull", None), ("cull", 0.45)):
        efn = make_energy_fn(fro, nonbonded_method="PME", cutoff=0.9,
                             ewald_tolerance=0.005, nonbonded_backend="pallas",
                             frozen_cull_skin=skin)
        ffn = make_force_fn(efn)

        def ef(c, _f=ffn):
            e, f = _f(c, box, None)
            return c + 1e-30 * f + 1e-30 * e

        res[f"EF_{name}_ms"] = timeit_scan(ef, x)
        log(f"E+F [{name}]: {res[f'EF_{name}_ms']:.3f} ms "
            f"(cull_info {getattr(efn.nonbonded, 'cull_info', None)})")

        prot = jax.jit(make_ncmc_protocol(
            efn, ffn, fro.masses, lp, cx, cv, schedule, move=move))
        r = prot(x, v, box, kp)
        jax.block_until_ready(r.positions)
        t0 = time.perf_counter()
        for i in range(3):
            r = prot(x, v, box, jax.random.fold_in(kp, i))
        jax.block_until_ready(r.positions)
        res[f"step_{name}_ms"] = (time.perf_counter() - t0) / 3 / 50 * 1e3
        log(f"switching step [{name}]: {res[f'step_{name}_ms']:.3f} ms "
            f"(work finite {bool(jnp.isfinite(r.protocol_work))})")

    # shift-table cells backend, unfrozen E+F
    efc = make_energy_fn(system, nonbonded_method="PME", cutoff=0.9,
                         ewald_tolerance=0.005, nonbonded_backend="cells")
    ffc = make_force_fn(efc)

    def efcs(c):
        e, f = ffc(c, box, None)
        return c + 1e-30 * f + 1e-30 * e

    res["cells_shift_EF_ms"] = timeit_scan(efcs, x, n_inner=20)
    log(f"cells (shift minimg) unfrozen E+F: {res['cells_shift_EF_ms']:.3f} ms")

    print(json.dumps({k: round(v, 3) for k, v in res.items()}))


if __name__ == "__main__":
    main()
