"""Root-cause the ~3.6% MD NaN-rollback rate at production shape (VERDICT
r3 weak #4 / next #3).

The driver's MD stage rolls a replica back when the post-MD state is
non-finite (simulation/driver.py md_ok). The acceptance study measured
~2.3/64 replicas per iteration hitting that path at the reference protocol
(dt 4 fs HMR 3.024, 2k MD steps). This probe reproduces the compacted MD
stage and CLASSIFIES each failure at segment granularity:

  * 'blowup'     — non-finite positions: integration/constraint instability;
  * 'cull_guard' — finite positions but a mobile atom outside its permanent
                   reach ball (the static-culling veto; physically a free
                   fragment diffusing past its COM cage margin);
  * 'poison'     — finite positions inside all balls but non-finite energy
                   (kernel overflow / PME etc.).

For 'cull_guard' failures it reports WHICH ball (anchored chain vs free
fragment, by radius provenance) and by how much, plus the rate at
dt=2 fs for the timestep-instability hypothesis.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/probe_md_rollback.py \
           [--replicas 64] [--blocks 10] [--md-steps 2000] [--dt 0.004]
"""

import argparse
import json
import sys
import time
import warnings

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--replicas", type=int, default=64)
    ap.add_argument("--blocks", type=int, default=10, help="MD blocks (driver iterations)")
    ap.add_argument("--md-steps", type=int, default=2000)
    ap.add_argument("--seg", type=int, default=200, help="steps per finiteness check")
    ap.add_argument("--dt", type=float, default=0.004)
    ap.add_argument("--backend", default="tiled")
    ap.add_argument("--cage-margin", type=float, default=1.0)
    ap.add_argument("--newton-iters", type=int, default=None,
                    help="override constraints.NEWTON_ITERS (solver-"
                         "divergence hypothesis)")
    ap.add_argument("--min-steps", type=int, default=400)
    ap.add_argument("--dump-dir", default=None,
                    help="dump each blowup's last-finite (xm, vm, key) for "
                         "offline f64/f32 replay (tools/replay_blowup.py)")
    args = ap.parse_args()
    R = args.replicas

    if args.newton_iters is not None:
        import blues_tpu.integrators.constraints as _c

        _c.NEWTON_ITERS = args.newton_iters

    from blues_tpu.core.prmtop import repartition_hydrogen_masses
    from blues_tpu.core.state import maxwell_boltzmann_velocities
    from blues_tpu.core.system import Constraints
    from blues_tpu.integrators.constraints import make_constraint_fns
    from blues_tpu.integrators.langevin import LangevinParams, make_baoab_machinery
    from blues_tpu.integrators.minimize import minimize_fire
    from blues_tpu.potentials.energy import make_energy_fn, make_force_fn
    from blues_tpu.testsystems import t4_scale_binding_site_box

    system, x0 = t4_scale_binding_site_box(n_atoms=22340)
    lig = system.topology.select_resname("LIG")
    bond_graph = np.concatenate(
        [np.asarray(e.idx).reshape(-1, 2) for e in (system.bonds, system.constraints) if len(e)]
    )
    system = system.replace(
        masses=repartition_hydrogen_masses(system.masses, bond_graph, 3.024)
    )
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        fs = system.freeze_radius(np.asarray(x0), lig, 0.5)

    efn = make_energy_fn(
        fs, nonbonded_method="PME", cutoff=1.0, ewald_tolerance=0.005,
        nonbonded_backend=args.backend, frozen_cull_cage_margin=args.cage_margin,
    )
    ffn = make_force_fn(efn)
    cx, cv = make_constraint_fns(fs.constraints, fs.masses)
    box = jnp.asarray(fs.box, jnp.float32)
    x = jnp.asarray(x0, jnp.float32)
    x, _ = jax.jit(
        lambda y: minimize_fire(
            ffn, fs.masses, y, box, n_steps=args.min_steps, constrain_x=cx
        )
    )(x)
    jax.block_until_ready(x)

    rows, centers, radii = efn.nonbonded.cull_bounds
    # anchored-chain balls have radius = summed bond lengths (< ~2 nm but
    # with distinct provenance); classify by whether the row's center is a
    # frozen atom position (anchored) — free fragments use their own COM
    x0n = np.asarray(x0)
    anchored = np.zeros(len(rows), bool)
    frozen_pos = x0n[np.asarray(fs.masses) <= 0]
    # centers of anchored rows coincide with SOME frozen atom's position
    from scipy.spatial import cKDTree

    tree = cKDTree(frozen_pos)
    d, _ = tree.query(centers, k=1)
    anchored = d < 1e-9

    # ---- compacted MD machinery (same as driver frozen_compact) -----------
    masses = np.asarray(fs.masses)
    is_alch = np.zeros(fs.n_atoms, bool)
    is_alch[np.asarray(fs.alchemical.atoms)] = True
    mob = np.where((masses > 0) | is_alch)[0].astype(np.int32)
    inv = np.full(fs.n_atoms, -1, np.int64)
    inv[mob] = np.arange(len(mob))
    cidx = np.asarray(fs.constraints.idx)
    keep = np.isin(cidx, mob).all(1)
    cons_m = Constraints(inv[cidx[keep]].astype(np.int32), np.asarray(fs.constraints.dist)[keep])
    masses_m = masses[mob]
    cx_m, cv_m = make_constraint_fns(cons_m, masses_m)
    x_const = jnp.asarray(x)
    mob_j = jnp.asarray(mob)
    row_pos_in_mob = inv[rows]  # rows are mobile by construction
    centers_j = jnp.asarray(centers, jnp.float32)
    radii_j = jnp.asarray(radii, jnp.float32)
    Lbox = jnp.diagonal(box)

    params = LangevinParams(dt=args.dt, friction=1.0, temperature=300.0)
    m = make_baoab_machinery(masses_m, params, cx_m, cv_m)

    def full_of(xm):
        return x_const.astype(xm.dtype).at[mob_j].set(xm)

    def ffn_m(xm):
        e, f = ffn(full_of(xm), box, None)
        return e, f[mob_j]

    def md_step(carry, _):
        xm, vm, fm, key = carry
        key, okey = jax.random.split(key)
        vm = m["kick"](vm, fm, params.dt / 2.0, xm)
        xm, vm = m["drift"](xm, vm, params.dt / 2.0)
        vm = m["ou_partial"](vm, okey, xm, params.dt)
        xm, vm = m["drift"](xm, vm, params.dt / 2.0)
        _, fm = ffn_m(xm)
        vm = m["kick"](vm, fm, params.dt / 2.0, xm)
        return (xm, vm, fm, key), None

    @jax.jit
    def run_seg(xm, vm, key):
        _, fm = ffn_m(xm)
        (xm, vm, fm, key), _ = jax.lax.scan(
            md_step, (xm, vm, fm, key), None, length=args.seg
        )
        e, _ = ffn_m(xm)
        return xm, vm, key, e

    vseg = jax.jit(jax.vmap(run_seg))

    @jax.jit
    def ball_excess(xm):
        """Per-replica max (and argmax row) of |x_row - center| - radius."""
        d = xm[jnp.asarray(row_pos_in_mob)] - centers_j
        d = d - Lbox * jnp.round(d / Lbox)
        exc = jnp.sqrt(jnp.sum(d * d, -1)) - radii_j
        return jnp.max(exc), jnp.argmax(exc)

    vexc = jax.jit(jax.vmap(ball_excess))

    kB = 8.31446261815324e-3
    cons_ij = jnp.asarray(np.asarray(cons_m.idx), jnp.int32)
    cons_d0 = jnp.asarray(np.asarray(cons_m.dist), jnp.float32)
    mjj = jnp.asarray(masses_m, jnp.float32)
    ndof = 3 * len(mob) - len(np.asarray(cons_m.idx))

    @jax.jit
    def diag(xm, vm):
        """Last-finite-state forensics: max |F|, instantaneous T, max
        constraint-length violation."""
        _, fm = ffn_m(xm)
        fmax = jnp.max(jnp.sqrt(jnp.sum(fm * fm, -1)))
        T = jnp.sum(mjj[:, None] * vm * vm) / (ndof * kB)
        d = xm[cons_ij[:, 0]] - xm[cons_ij[:, 1]]
        viol = jnp.max(jnp.abs(jnp.sqrt(jnp.sum(d * d, -1)) - cons_d0))
        return fmax, T, viol

    key0 = jax.random.PRNGKey(11)
    xm = jnp.broadcast_to(x[mob_j], (R, len(mob), 3))
    n_segs = args.md_steps // args.seg
    counts = {"blowup": 0, "cull_guard": 0, "poison": 0}
    guard_rows = []
    guard_excess = []
    total_blocks = 0
    t_start = time.time()
    for blk in range(args.blocks):
        keys = jax.random.split(jax.random.fold_in(key0, blk), R)
        vm = jax.vmap(
            lambda k: maxwell_boltzmann_velocities(k, masses_m, 300.0)
        )(keys)
        vm = jax.vmap(cv_m)(vm, xm)
        xm_keep = xm
        failed = np.zeros(R, bool)
        for s in range(n_segs):
            keys = jax.vmap(lambda k: jax.random.fold_in(k, s + 100))(keys)
            xm_new, vm_new, _, e = vseg(xm, vm, keys)
            fin_x = np.asarray(jax.vmap(lambda a: jnp.all(jnp.isfinite(a)))(xm_new))
            fin_e = np.isfinite(np.asarray(e))
            exc, exc_row = jax.tree.map(np.asarray, vexc(xm_new))
            bad = ~(fin_x & fin_e)
            for r in np.where(bad & ~failed)[0]:
                if not fin_x[r]:
                    # classify with the LAST finite state's ball excess
                    exc_prev, row_prev = jax.tree.map(
                        np.asarray, ball_excess(xm[r])
                    )
                    fmax, T, viol = (float(np.asarray(a))
                                     for a in diag(xm[r], vm[r]))
                    counts["blowup"] += 1
                    log(f"# blk {blk} seg {s} rep {r}: BLOWUP "
                        f"(prev ball excess {float(exc_prev):+.3f} nm, "
                        f"prev max|F| {fmax:.1f} kJ/mol/nm, T {T:.0f} K, "
                        f"constraint viol {viol:.2e} nm)")
                    if args.dump_dir:
                        import os

                        os.makedirs(args.dump_dir, exist_ok=True)
                        np.savez(
                            f"{args.dump_dir}/blowup_b{blk}_s{s}_r{r}.npz",
                            xm=np.asarray(xm[r]), vm=np.asarray(vm[r]),
                            key=np.asarray(keys[r]), seg_steps=args.seg,
                            dt=args.dt,
                        )
                elif exc[r] > 0:
                    counts["cull_guard"] += 1
                    ridx = int(exc_row[r])
                    guard_rows.append(ridx)
                    guard_excess.append(float(exc[r]))
                    log(f"# blk {blk} seg {s} rep {r}: CULL_GUARD row {rows[ridx]} "
                        f"excess {float(exc[r]):+.4f} nm "
                        f"({'anchored' if anchored[ridx] else 'free-fragment'}, "
                        f"radius {radii[ridx]:.3f})")
                else:
                    counts["poison"] += 1
                    log(f"# blk {blk} seg {s} rep {r}: POISON (finite x, "
                        f"inside balls, non-finite E)")
            failed |= bad
            # driver semantics: failed replicas roll back, others continue
            xm = jnp.where(jnp.asarray(failed)[:, None, None], xm, xm_new)
            vm = jnp.where(jnp.asarray(failed)[:, None, None], vm, vm_new)
        total_blocks += 1
        n_failed = int(failed.sum())
        log(f"# block {blk}: {n_failed}/{R} rolled back "
            f"({time.time() - t_start:.0f}s elapsed)")
        # rolled-back replicas restart from block start (driver keeps state)
        xm = jnp.where(jnp.asarray(failed)[:, None, None], xm_keep, xm)

    n_events = sum(counts.values())
    out = {
        "dt_fs": args.dt * 1000,
        "backend": args.backend,
        "cage_margin_nm": args.cage_margin,
        "replicas": R,
        "blocks": total_blocks,
        "md_steps_per_block": args.md_steps,
        "events": counts,
        "rollback_rate_per_block": round(n_events / (R * total_blocks), 5),
        "guard_excess_nm": {
            "median": round(float(np.median(guard_excess)), 4) if guard_excess else None,
            "max": round(float(np.max(guard_excess)), 4) if guard_excess else None,
        },
        "guard_rows_anchored": int(np.sum([anchored[r] for r in guard_rows])) if guard_rows else 0,
        "guard_rows_free": int(np.sum([not anchored[r] for r in guard_rows])) if guard_rows else 0,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
