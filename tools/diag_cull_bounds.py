"""Diagnose which culling bound a production-length protocol violates.

Runs the un-culled 1000-step protocol with snapshots and reports, per
snapshot, the max non-alchemical mobile displacement from build positions
and the max ligand distance from the alchemical build COM — against the
culling guard's bounds (skin, r_alch + 2 skin)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


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

    n_nc = 1000
    system, x0 = t4_scale_binding_site_box(n_atoms=22340)
    lig = system.topology.select_resname("LIG")
    box = jnp.asarray(system.box, jnp.float32)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        fro = system.freeze_radius(np.asarray(x0), lig, 0.5)
    cx, cv = make_constraint_fns(fro.constraints, fro.masses)
    efn = make_energy_fn(fro, nonbonded_method="PME", cutoff=0.9,
                         ewald_tolerance=0.005, nonbonded_backend="pallas",
                         frozen_cull_skin=None)
    ffn = make_force_fn(efn)
    x = jax.jit(lambda x: minimize_fire(ffn, fro.masses, x, box, n_steps=400,
                constrain_x=cx)[0])(jnp.asarray(x0, jnp.float32))
    jax.block_until_ready(x)

    lp = LangevinParams(dt=0.002, friction=1.0, temperature=300.0)
    schedule = build_ncmc_schedule(n_nc)
    move = RandomLigandRotationMove(lig, fro.masses)
    rec = tuple(int(v) for v in np.linspace(0, schedule.n_micro, 11))
    prot = jax.jit(make_ncmc_protocol(
        efn, ffn, fro.masses, lp, cx, cv, schedule, move=move,
        record_micro=rec))
    key = jax.random.PRNGKey(0)
    kv, kp = jax.random.split(key)
    v = cv(maxwell_boltzmann_velocities(kv, fro.masses, 300.0), x)
    r = prot(x, v, box, kp)
    jax.block_until_ready(r.positions)

    is_alch = np.zeros(fro.n_atoms, bool)
    is_alch[np.asarray(fro.alchemical.atoms)] = True
    mobile = (np.asarray(fro.masses) > 0) | is_alch
    na_rows = np.where(mobile & ~is_alch)[0]
    al = np.where(is_alch)[0]
    x_np = np.asarray(x)
    w = np.asarray(fro.masses)[al]
    com0 = (x_np[al] * w[:, None]).sum(0) / w.sum()
    r_alch = np.sqrt(((x_np[al] - com0) ** 2).sum(-1).max())
    print(f"# r_alch={r_alch:.3f}; bounds: na skin=0.45, "
          f"alch ball={r_alch + 0.9:.3f}")
    snaps = np.asarray(r.snapshots)
    for m, s in zip(rec, snaps):
        d_na = np.linalg.norm(s[na_rows] - x_np[na_rows], axis=1).max()
        d_al = np.linalg.norm(s[al] - com0, axis=1).max()
        worst = na_rows[np.argmax(np.linalg.norm(s[na_rows] - x_np[na_rows], axis=1))]
        print(f"micro {m:5d}: max_na_disp={d_na:.3f} (atom {worst}) "
              f"max_alch_from_com0={d_al:.3f}")


if __name__ == "__main__":
    main()
