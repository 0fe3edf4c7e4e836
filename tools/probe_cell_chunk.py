"""Sweep CELL_CHUNK for the cells backend at 22k atoms (one process)."""

import importlib
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
    from blues_tpu.testsystems import t4_scale_binding_site_box
    from blues_tpu.potentials.energy import make_energy_fn, make_force_fn
    from blues_tpu.potentials import cells as cells_mod

    system, x0 = t4_scale_binding_site_box(n_atoms=22340)
    box = jnp.asarray(system.box, jnp.float32)
    x = jnp.asarray(x0, jnp.float32)
    res = {}
    for chunk in (27, 36, 54, 72, 108, 216):
        cells_mod.CELL_CHUNK = chunk
        efn = make_energy_fn(system, nonbonded_method="PME", cutoff=0.9,
                             ewald_tolerance=0.005, nonbonded_backend="cells")
        ffn = make_force_fn(efn)

        @jax.jit
        def scanned(x0):
            def body(c, _):
                e, f = ffn(c, box, None)
                return c + 1e-30 * f + 1e-30 * e, None

            return jax.lax.scan(body, x0, None, length=20)[0]

        out = scanned(x)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(3):
            out = scanned(x)
        jax.block_until_ready(out)
        ms = (time.perf_counter() - t0) / 60 * 1e3
        res[str(chunk)] = round(ms, 3)
        log(f"CELL_CHUNK={chunk}: {ms:.3f} ms")
    print(json.dumps(res))


if __name__ == "__main__":
    main()
