"""Same-process A/B of the UNFROZEN pair backends (cells vs pcells).

The measured keep/retire decision for the Pallas cells-neighborhood kernel
(VERDICT r3 next #6): one process builds the unfrozen 22,344-atom flagship
box and the reference's watDivaline box, then for each backend times

  (a) a single-replica jitted E+F eval (scan-timed: the per-call floor is
      ~2.5 ms dispatch latency, so sub-ms evals are timed inside a
      lax.scan with a non-foldable accumulator c + 1e-30*f);
  (b) an R-replica BAOAB MD step batch (the unfrozen production hot loop).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/probe_pcells_ab.py \
           [--replicas 8] [--backends cells,pcells]
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


def scan_time_ef(ffn, x, box, n_inner=30, n_outer=3):
    """ms per E+F eval via an unfoldable scan (CLAUDE.md timing recipe)."""

    @jax.jit
    def scanned(x0):
        def body(c, _):
            e, f = ffn(c, box, None)
            return c + 1e-30 * f, e

        return jax.lax.scan(body, x0, None, length=n_inner)

    out = scanned(x)
    jax.block_until_ready(out[0])
    t0 = time.perf_counter()
    for _ in range(n_outer):
        out = scanned(x)
    jax.block_until_ready(out[0])
    return (time.perf_counter() - t0) / (n_outer * n_inner) * 1e3


def scan_time_md(step, carry, n_inner=20, n_outer=3):
    @jax.jit
    def scanned(c0):
        def body(c, _):
            return step(c), None

        return jax.lax.scan(body, c0, None, length=n_inner)[0]

    out = scanned(carry)
    jax.block_until_ready(out[0])
    t0 = time.perf_counter()
    for _ in range(n_outer):
        out = scanned(carry)
    jax.block_until_ready(out[0])
    return (time.perf_counter() - t0) / (n_outer * n_inner) * 1e3


def bench_system(name, system, x0, cutoff, backends, R, dt=0.002):
    from blues_tpu.core.state import maxwell_boltzmann_velocities
    from blues_tpu.integrators.constraints import make_constraint_fns
    from blues_tpu.integrators.langevin import LangevinParams, make_baoab_machinery
    from blues_tpu.integrators.minimize import minimize_fire
    from blues_tpu.potentials.energy import make_energy_fn, make_force_fn

    cx, cv = make_constraint_fns(system.constraints, system.masses)
    box = jnp.asarray(system.box, jnp.float32)
    efn0 = make_energy_fn(
        system, nonbonded_method="PME", cutoff=cutoff, ewald_tolerance=0.005,
        nonbonded_backend="cells",
    )
    x = jnp.asarray(x0, jnp.float32)
    x, _ = jax.jit(
        lambda y: minimize_fire(
            make_force_fn(efn0), system.masses, y, box, n_steps=200,
            constrain_x=cx,
        )
    )(x)
    jax.block_until_ready(x)
    params = LangevinParams(dt=dt, friction=1.0, temperature=300.0)
    m = make_baoab_machinery(system.masses, params, cx, cv)
    v0 = cv(
        maxwell_boltzmann_velocities(jax.random.PRNGKey(3), system.masses, 300.0),
        x,
    )

    out = {}
    e_ref = None
    for backend in backends:
        efn = make_energy_fn(
            system, nonbonded_method="PME", cutoff=cutoff,
            ewald_tolerance=0.005, nonbonded_backend=backend,
        )
        ffn = make_force_fn(efn)
        ef_ms = scan_time_ef(ffn, x, box)
        e0, f0 = jax.jit(lambda y: ffn(y, box, None))(x)
        e0 = float(e0)
        if e_ref is None:
            e_ref = e0

        def md_step(carry, _ffn=ffn):
            xx, vv, ff, key = carry
            key, okey = jax.random.split(key)
            vv = m["kick"](vv, ff, dt / 2.0, xx)
            xx, vv = m["drift"](xx, vv, dt / 2.0)
            vv = m["ou_partial"](vv, okey, xx, dt)
            xx, vv = m["drift"](xx, vv, dt / 2.0)
            _, ff = _ffn(xx, box, None)
            vv = m["kick"](vv, ff, dt / 2.0, xx)
            return (xx, vv, ff, key)

        vstep = jax.vmap(md_step)
        carry = (
            jnp.broadcast_to(x, (R,) + x.shape),
            jnp.broadcast_to(v0, (R,) + v0.shape),
            jnp.broadcast_to(f0, (R,) + np.asarray(f0).shape),
            jax.random.split(jax.random.PRNGKey(11), R),
        )
        md_ms = scan_time_md(vstep, carry)
        out[backend] = {
            "ef_ms_single": round(ef_ms, 3),
            "md_ms_per_step_R": round(md_ms, 3),
            "md_aggregate_sps": round(R / md_ms * 1e3, 1),
            "energy": e0,
        }
        log(f"# {name} {backend}: E+F {ef_ms:.3f} ms (1 rep), MD step "
            f"{md_ms:.3f} ms @ R={R} ({R / md_ms * 1e3:.0f} sps), E={e0:.1f}")
        assert abs(e0 - e_ref) < 1e-4 * abs(e_ref) + 50.0, (e0, e_ref)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--replicas", type=int, default=8)
    ap.add_argument("--backends", default="cells,pcells")
    ap.add_argument("--skip-flagship", action="store_true")
    args = ap.parse_args()
    backends = [b.strip() for b in args.backends.split(",")]

    from blues_tpu.core.amber_coords import load_inpcrd
    from blues_tpu.core.prmtop import load_prmtop
    from blues_tpu.testsystems import t4_scale_binding_site_box

    results = {"replicas": args.replicas, "systems": {}}

    system = load_prmtop("/root/reference/blues/tests/data/watDivaline.prmtop")
    crd = load_inpcrd("/root/reference/blues/tests/data/watDivaline.inpcrd")
    system = system.replace(box=crd.box, alchemical=None)
    results["systems"]["watDivaline_2591"] = bench_system(
        "watDivaline", system, crd.positions, 0.9, backends, args.replicas
    )

    if not args.skip_flagship:
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            big, xb = t4_scale_binding_site_box(n_atoms=22340)
        big = big.replace(alchemical=None)
        results["systems"]["unfrozen_22344"] = bench_system(
            "unfrozen-22k", big, xb, 1.0, backends, args.replicas, dt=0.002
        )

    print(json.dumps(results))


if __name__ == "__main__":
    main()
