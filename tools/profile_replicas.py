"""Profile the per-replica cost breakdown of the frozen NCMC protocol.

VERDICT r2 weak #2: 64x the replicas buys only 11.5x the throughput
(151.6 -> 27.3 sps/replica). This script measures, same-process on the TPU,
where the per-replica loss goes at R in {1, 8, 64}:

  * full protocol micro-step (the headline unit)
  * fused energy+force eval (2 per micro-step)
  * pair-kernel (culled pallas) E+F alone
  * "rest" E+F alone (exclusion/exception corrections + PME recip/self)
  * PME reciprocal alone (mobile-subset spread + FFT + influence)
  * constraint projection + OU noise (integrator overhead)

All timings inside a lax.scan with a non-foldable output (CLAUDE.md:
per-call dispatch floor ~2.5 ms on the remote-TPU tunnel). Only
same-process ratios are meaningful.

Usage: python tools/profile_replicas.py [--reps 1,8,64]
"""

import argparse
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def timed_scan(fn, args, length=10, n_rep=5, vmap_axes=None):
    """Time fn under jit(scan) with a LOOP-CARRIED input perturbation.

    The first positional arg is perturbed by 1e-30 * carry each iteration —
    without this, loop-invariant args let XLA hoist the entire body out of
    the scan and the 'per-call' time measures only launch overhead (this
    bug made the r2-era component numbers meaningless lower bounds).
    Returns ms per inner call (aggregate across the batch if vmapped)."""
    if vmap_axes is not None:
        fn = jax.vmap(fn, in_axes=vmap_axes)

    @jax.jit
    def scanned(*a):
        def body(c, _):
            out = fn(a[0] + 1e-30 * c, *a[1:])
            leaves = [l for l in jax.tree_util.tree_leaves(out)]
            bump = sum(
                jnp.sum(l.astype(jnp.float32)) * 1e-30
                for l in leaves
                if jnp.issubdtype(l.dtype, jnp.floating)
            )
            return c + bump, None

        return jax.lax.scan(body, jnp.zeros(()), None, length=length)[0]

    out = scanned(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(n_rep):
        out = scanned(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / (n_rep * length) * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", default="1,8,64")
    ap.add_argument("--n-atoms", type=int, default=22340)
    args = ap.parse_args()
    reps = [int(v) for v in args.reps.split(",")]

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
    log(f"# backend={backend} device={jax.devices()[0]}")

    system, x0 = t4_scale_binding_site_box(n_atoms=args.n_atoms)
    lig = system.topology.select_resname("LIG")
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        fs = system.freeze_radius(np.asarray(x0), lig, 0.5)
    mobile = int((fs.masses > 0).sum())
    log(f"# atoms={system.n_atoms} mobile={mobile}")

    efn = make_energy_fn(
        fs, nonbonded_method="PME", cutoff=0.9, ewald_tolerance=0.005,
        nonbonded_backend=backend,
    )
    nb = efn.nonbonded
    log(f"# pme grid={nb.pme_params.grid} order={nb.pme_params.order} cull={nb.cull_info}")
    ffn = make_force_fn(efn)
    cx, cv = make_constraint_fns(fs.constraints, fs.masses)
    box = jnp.asarray(fs.box, jnp.float32)
    x = jnp.asarray(x0, jnp.float32)
    x, _ = jax.jit(
        lambda x: minimize_fire(ffn, fs.masses, x, box, n_steps=400, constrain_x=cx)
    )(x)
    jax.block_until_ready(x)

    params = LangevinParams(dt=0.002, friction=1.0, temperature=300.0)
    schedule = build_ncmc_schedule(50)
    move = RandomLigandRotationMove(lig, fs.masses)
    protocol = make_ncmc_protocol(efn, ffn, fs.masses, params, cx, cv, schedule, move=move)

    key = jax.random.PRNGKey(0)
    v = cv(maxwell_boltzmann_velocities(key, fs.masses, 300.0), x)

    g = {"lambda_sterics": 0.6, "lambda_electrostatics": 0.4}

    # components as (E, F)-style closures ------------------------------------
    pair_e = lambda xx: nb.pair_sum.energy(xx, box, *nb.pair_factors(g, jnp.float32))
    pair_ef = jax.value_and_grad(pair_e)
    rest_ef = jax.value_and_grad(lambda xx: nb.rest(xx, box, g))
    full_ef = lambda xx: ffn(xx, box, g)

    # PME recip alone: rebuild the same frozen-subset reciprocal
    from blues_tpu.potentials.nonbonded import PMEParams  # noqa: F401

    q_std = np.asarray(fs.nonbonded.charge, np.float64)
    is_alch = np.zeros(fs.n_atoms, bool)
    if fs.alchemical is not None and len(fs.alchemical.atoms):
        is_alch[np.asarray(fs.alchemical.atoms)] = True
    q_eff = jnp.asarray(np.where(is_alch, 0.0, q_std), jnp.float32)
    from blues_tpu.potentials.pme import make_pme_reciprocal, precompute_spread_grid

    m = np.asarray(fs.masses)
    active = np.where((m > 0) | is_alch)[0].astype(np.int32)
    frozen_idx = np.where(~((m > 0) | is_alch))[0]
    base = precompute_spread_grid(
        nb.pme_params, np.asarray(x0)[frozen_idx], q_std[frozen_idx], np.asarray(fs.box)
    )
    recip = make_pme_reciprocal(nb.pme_params, base_grid=base, spread_subset=active)
    recip_ef = jax.value_and_grad(lambda xx: recip(xx, q_eff, box))

    def one_micro(xx, vv, kk):
        e, f = ffn(xx, box, g)
        vv = vv + 1e-3 * f
        xx2, vv = xx + params.dt * vv, vv
        xx2 = cx(xx2, xx)
        e2, f2 = ffn(xx2, box, g)
        kk, ok = jax.random.split(kk)
        noise = jax.random.normal(ok, vv.shape, vv.dtype)
        return xx2 + 1e-30 * noise, vv + 1e-3 * f2, kk

    def constraints_only(xx, vv):
        return cx(xx + 1e-6, xx), cv(vv, xx)

    rows = []
    for R in reps:
        if R == 1:
            xa, va, ka = x, v, key
            vx = None
        else:
            xa = jnp.broadcast_to(x, (R,) + x.shape)
            keys = jax.random.split(key, R)
            va = jax.vmap(lambda k: cv(maxwell_boltzmann_velocities(k, fs.masses, 300.0), x))(keys)
            ka = keys
            vx = 0
        row = {"R": R}
        row["full_EF_ms"] = timed_scan(full_ef, (xa,), vmap_axes=(0,) if vx == 0 else None)
        row["pair_EF_ms"] = timed_scan(pair_ef, (xa,), vmap_axes=(0,) if vx == 0 else None)
        row["rest_EF_ms"] = timed_scan(rest_ef, (xa,), vmap_axes=(0,) if vx == 0 else None)
        row["recip_EF_ms"] = timed_scan(recip_ef, (xa,), vmap_axes=(0,) if vx == 0 else None)
        row["recip_E_ms"] = timed_scan(
            lambda xx: recip(xx, q_eff, box), (xa,),
            vmap_axes=(0,) if vx == 0 else None,
        )
        # raw batched FFT cost at this grid (the reciprocal's core op)
        Kx, Ky, Kz = nb.pme_params.grid
        grid_shape = ((R,) if R > 1 else ()) + (Kx, Ky, Kz)
        garr = jnp.ones(grid_shape, jnp.float32)
        row["fft_ms"] = timed_scan(
            lambda g_: jnp.sum(jnp.abs(jnp.fft.rfftn(g_, axes=(-3, -2, -1)))),
            (garr,),
        )
        # one full BAOAB-machinery micro-step (real kick/drift/ou + 2 evals)
        row["constraints_ms"] = timed_scan(
            constraints_only, (xa, va), vmap_axes=(0, 0) if vx == 0 else None
        )
        row["micro_ms"] = timed_scan(
            one_micro, (xa, va, ka), length=5,
            vmap_axes=(0, 0, 0) if vx == 0 else None,
        )
        log(f"# {row}")
        rows.append(row)

    # protocol-level sps for reference
    for R in reps:
        if R == 1:
            pj = jax.jit(protocol)
            r = pj(x, v, box, key)
            jax.block_until_ready(r.positions)
            t0 = time.time()
            for i in range(3):
                r = pj(x, v, box, jax.random.fold_in(key, i))
            jax.block_until_ready(r.positions)
            sps = 3 * schedule.n_micro / (time.time() - t0)
        else:
            vp = jax.jit(jax.vmap(protocol, in_axes=(0, 0, None, 0)))
            xs = jnp.broadcast_to(x, (R,) + x.shape)
            keys = jax.random.split(key, R)
            vs = jax.vmap(lambda k: maxwell_boltzmann_velocities(k, fs.masses, 300.0))(keys)
            r = vp(xs, vs, box, keys)
            jax.block_until_ready(r.positions)
            t0 = time.time()
            for i in range(2):
                keys_i = jax.vmap(lambda k: jax.random.fold_in(k, i + 1))(keys)
                r = vp(xs, vs, box, keys_i)
            jax.block_until_ready(r.positions)
            sps = 2 * R * schedule.n_micro / (time.time() - t0)
        log(f"# R={R} protocol {sps:.1f} sps ({sps / R:.2f} per replica)")

    import json

    print(json.dumps(rows))


if __name__ == "__main__":
    main()
