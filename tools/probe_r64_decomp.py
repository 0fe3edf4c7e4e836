"""Decompose the R=64 production-shape NCMC micro-step cost (VERDICT r2 #3).

Times each component of the lambda-split switching micro-step — e0f0 (the
one full kernel pass), eafa (the tiny alchemical passes), PME reciprocal
E+F alone, culled pair E+F alone, constraint projections, OU noise — each
vmapped over R replicas and scanned inside ONE jitted call (the remote-TPU
tunnel has a ~2.5 ms dispatch floor), then the full 50-step protocol as the
reference point. Sum-of-parts vs measured locates where the per-step-batch
milliseconds go.

Usage: PYTHONPATH=/root/repo python tools/probe_r64_decomp.py [--replicas 64]
Diagnostics to stderr, one JSON line to stdout.
"""

import argparse
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def log(m):
    print(m, file=sys.stderr, flush=True)


def timeit_vscan(step, x0, R, n_inner=20, n_outer=3):
    """step: (N, 3) -> (N, 3), vmapped over R replicas and scanned n_inner
    times in one jit."""
    vstep = jax.vmap(step)

    @jax.jit
    def scanned(c0):
        def body(c, _):
            return vstep(c), None

        return jax.lax.scan(body, c0, None, length=n_inner)[0]

    xs = jnp.broadcast_to(x0, (R,) + x0.shape)
    out = scanned(xs)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n_outer):
        out = scanned(xs)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / (n_outer * n_inner) * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--replicas", type=int, default=64)
    ap.add_argument("--nsteps", type=int, default=50)
    ap.add_argument("--backend", default=None)
    args = ap.parse_args()
    R = args.replicas

    import warnings

    from blues_tpu.core.prmtop import repartition_hydrogen_masses
    from blues_tpu.core.state import maxwell_boltzmann_velocities
    from blues_tpu.integrators.constraints import make_constraint_fns
    from blues_tpu.integrators.langevin import LangevinParams, make_baoab_machinery
    from blues_tpu.integrators.minimize import minimize_fire
    from blues_tpu.integrators.ncmc import make_ncmc_protocol
    from blues_tpu.integrators.schedules import build_ncmc_schedule
    from blues_tpu.moves import RandomLigandRotationMove
    from blues_tpu.potentials.energy import make_energy_fn, make_force_fn
    from blues_tpu.testsystems import t4_scale_binding_site_box

    backend = args.backend or ("pallas" if jax.default_backend() == "tpu" else "tiled")
    # "sweep:gN" = sweep backend with per-row-group column culling
    group = None
    if ":g" in backend:
        backend, g_ = backend.split(":g")
        group = int(g_)
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
        nonbonded_backend=backend, sweep_row_group=group,
    )
    ffn = make_force_fn(efn)
    cx, cv = make_constraint_fns(fs.constraints, fs.masses)
    box = jnp.asarray(fs.box, jnp.float32)
    x = jnp.asarray(x0, jnp.float32)
    x, _ = jax.jit(
        lambda y: minimize_fire(ffn, fs.masses, y, box, n_steps=400, constrain_x=cx)
    )(x)
    jax.block_until_ready(x)

    res = {"replicas": R, "backend": backend}

    e0f0 = efn.lambda_e0_f0
    eafa = efn.lambda_ea_fa
    g = {"lambda_sterics": jnp.float32(0.7), "lambda_electrostatics": jnp.float32(0.7)}

    res["e0f0_ms"] = timeit_vscan(
        lambda c: c + 1e-30 * e0f0(c, box)[1] + 1e-30 * e0f0(c, box)[0], x, R
    ) / 2.0  # two evals per scan body
    log(f"# e0f0 (full kernel E+F): {res['e0f0_ms']:.3f} ms/step-batch")

    res["eafa_ms"] = timeit_vscan(
        lambda c: c + 1e-30 * eafa(c, box, g)[1] + 1e-30 * eafa(c, box, g)[0], x, R
    ) / 2.0
    log(f"# eafa (alchemical E+F): {res['eafa_ms']:.3f} ms/step-batch")

    # PME reciprocal alone (frozen background + mobile-subset spread), E+F
    from blues_tpu.potentials.nonbonded import choose_pme_params
    from blues_tpu.potentials.pme import make_pme_reciprocal, precompute_spread_grid

    pme_params = choose_pme_params(np.diag(np.asarray(fs.box)), 1.0, 0.005)
    log(f"# pme grid {pme_params.grid} alpha {pme_params.alpha:.3f}")
    is_alch = np.zeros(fs.n_atoms, bool)
    is_alch[np.asarray(fs.alchemical.atoms)] = True
    rows = np.where((np.asarray(fs.masses) > 0) | is_alch)[0].astype(np.int32)
    frozen_idx = np.setdiff1d(np.arange(fs.n_atoms), rows)
    charges = np.asarray(fs.nonbonded.charge)
    base = precompute_spread_grid(
        pme_params, np.asarray(x)[frozen_idx], charges[frozen_idx], np.asarray(fs.box)
    )
    rfn = make_pme_reciprocal(pme_params, base_grid=base, spread_subset=rows)
    q = jnp.asarray(charges * (1.0 - is_alch), jnp.float32)
    recip_vg = jax.value_and_grad(lambda y: rfn(y, q, box))
    res["recip_EF_ms"] = timeit_vscan(
        lambda c: c + 1e-30 * recip_vg(c)[1] + 1e-30 * recip_vg(c)[0], x, R
    )
    log(f"# PME recip E+F alone: {res['recip_EF_ms']:.3f} ms/step-batch")

    # spread-only forward (no FFT, no grad): isolates the spread matmuls
    spread = rfn.spread_grid
    rows_j = jnp.asarray(rows)
    res["spread_fwd_ms"] = timeit_vscan(
        lambda c: c + 1e-30 * jnp.sum(spread(c[rows_j], q[rows_j], box)) , x, R
    )
    log(f"# spread forward alone: {res['spread_fwd_ms']:.3f} ms/step-batch")

    # constraints
    res["constrain_x_ms"] = timeit_vscan(lambda c: cx(c, c), x, R)
    res["constrain_v_ms"] = timeit_vscan(lambda c: cv(c, c), x, R)
    log(f"# constrain_x: {res['constrain_x_ms']:.3f}, constrain_v: {res['constrain_v_ms']:.3f} ms")

    # OU noise (one partial step)
    params = LangevinParams(dt=0.004, friction=1.0, temperature=300.0)
    m = make_baoab_machinery(fs.masses, params, cx, cv)
    key0 = jax.random.PRNGKey(7)
    res["ou_ms"] = timeit_vscan(
        lambda c: c + 1e-30 * m["ou_partial"](c, key0, c, 0.004), x, R
    )
    log(f"# OU partial: {res['ou_ms']:.3f} ms")

    # full protocol reference point
    schedule = build_ncmc_schedule(args.nsteps)
    move = RandomLigandRotationMove(lig, fs.masses)
    protocol = make_ncmc_protocol(efn, ffn, fs.masses, params, cx, cv, schedule, move=move)
    vp = jax.jit(jax.vmap(protocol, in_axes=(0, 0, None, 0)))
    xs = jnp.broadcast_to(x, (R,) + x.shape)
    keys = jax.random.split(key0, R)
    vs = jax.vmap(lambda k: maxwell_boltzmann_velocities(k, fs.masses, 300.0))(keys)
    r = vp(xs, vs, box, keys)
    jax.block_until_ready(r.positions)
    t0 = time.perf_counter()
    for i in range(2):
        keys_i = jax.vmap(lambda k: jax.random.fold_in(k, i + 1))(keys)
        r = vp(xs, vs, box, keys_i)
        jax.block_until_ready(r.positions)
    res["protocol_step_ms"] = (time.perf_counter() - t0) / (2 * args.nsteps) * 1e3
    res["protocol_sps"] = 1000.0 / res["protocol_step_ms"] * R
    parts = res["e0f0_ms"] + 2 * res["eafa_ms"] + 2 * res["constrain_x_ms"] + 2 * res["constrain_v_ms"] + res["ou_ms"]
    res["sum_of_parts_ms"] = parts
    log(
        f"# protocol step-batch: {res['protocol_step_ms']:.3f} ms "
        f"({res['protocol_sps']:.0f} sps aggregate); sum-of-parts {parts:.3f} ms"
    )
    print(json.dumps({k: (round(v, 4) if isinstance(v, float) else v) for k, v in res.items()}))


if __name__ == "__main__":
    main()
