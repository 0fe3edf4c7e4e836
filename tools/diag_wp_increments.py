"""Diagnostic: per-increment f32-vs-f64 error of the work bookkeeping.

Loads a recorded stream (tools/work_precision_replay.py --phase run) and
computes every work increment in BOTH f32 and f64 on the tiled backend,
printing the largest |delta| terms — locates whether the f32 work error is
a random walk of reduction noise or one badly conditioned term.
"""

import sys

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp  # noqa: E402

KT300 = 8.31446261815324e-3 * 300.0


def main():
    stream_file = sys.argv[1] if len(sys.argv) > 1 else "/tmp/wp_smoke2.npz"
    n_atoms = int(sys.argv[2]) if len(sys.argv) > 2 else 6000
    nsteps = int(sys.argv[3]) if len(sys.argv) > 3 else 50

    import warnings

    from blues_tpu.core.prmtop import repartition_hydrogen_masses
    from blues_tpu.integrators.schedules import build_ncmc_schedule
    from blues_tpu.potentials.energy import make_energy_fn
    from blues_tpu.testsystems import t4_scale_binding_site_box

    system, x0 = t4_scale_binding_site_box(n_atoms=n_atoms)
    bond_graph = np.concatenate(
        [
            np.asarray(e.idx).reshape(-1, 2)
            for e in (system.bonds, system.constraints)
            if len(e)
        ]
    )
    system = system.replace(
        masses=repartition_hydrogen_masses(system.masses, bond_graph, 3.024)
    )
    lig = system.topology.select_resname("LIG")
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        fs = system.freeze_radius(np.asarray(x0), lig, 0.5)
    m = np.asarray(fs.masses)
    is_alch = np.zeros(fs.n_atoms, bool)
    is_alch[np.asarray(fs.alchemical.atoms)] = True
    stream_atoms = np.where((m > 0) | is_alch)[0]

    data = np.load(stream_file)
    stream = data["stream"]
    mid_pos = data["mid_pos"]
    x_start = data["x_start"]
    assert (data["stream_atoms"] == stream_atoms).all()

    schedule = build_ncmc_schedule(nsteps)
    M, mm = schedule.n_micro, schedule.move_micro

    efn_kwargs = dict(
        nonbonded_method="PME", cutoff=1.0, ewald_tolerance=0.005,
        frozen_cull_skin=None,  # match work_precision_replay.py
    )
    efn = make_energy_fn(fs, nonbonded_backend="tiled", **efn_kwargs)
    ea_fn = efn.nonbonded.lambda_ea
    # protocol evaluates Ea through value_and_grad (the eafa pass) — compare
    # that compiled program too, to expose reduction-order noise
    import blues_tpu.potentials.energy as energy_mod  # noqa: F401

    ea_vg = jax.value_and_grad(ea_fn)
    ea_j = {
        np.float32: jax.jit(lambda x, b, g: ea_fn(x, b, g)),
        np.float64: jax.jit(lambda x, b, g: ea_fn(x, b, g)),
    }
    eavg_j = jax.jit(lambda x, b, g: ea_vg(x, b, g)[0])
    efull_j = jax.jit(efn)

    box = np.asarray(fs.box)
    template = np.array(x_start, np.float64)

    def full_x(sub):
        out = template.copy()
        out[stream_atoms] = np.asarray(sub, np.float64)
        return out

    def ea(xf, g, dt):
        gg = {k: jnp.asarray(v, dt) for k, v in g.items()}
        return float(ea_j[dt](jnp.asarray(xf, dt), jnp.asarray(box, dt), gg))

    def eavg(xf, g, dt):
        gg = {k: jnp.asarray(v, dt) for k, v in g.items()}
        return float(eavg_j(jnp.asarray(xf, dt), jnp.asarray(box, dt), gg))

    def efull(xf, g, dt):
        gg = {k: jnp.asarray(v, dt) for k, v in g.items()}
        return float(efull_j(jnp.asarray(xf, dt), jnp.asarray(box, dt), gg))

    g_step = [
        {k: schedule.globals_per_step[k][i] for k in schedule.globals_per_step}
        for i in range(M)
    ]
    g_init = schedule.globals_initial
    g_pre = schedule.globals_pre_move

    rows = []  # (label, d32, d64, dvg)
    W = {np.float32: 0.0, np.float64: 0.0, "vg32": 0.0}

    def inc_lam(label, xf, g_new, g_old):
        for dt in (np.float32, np.float64):
            W[dt] += ea(xf, g_new, dt) - ea(xf, g_old, dt)
        dvg = eavg(xf, g_new, np.float32) - eavg(xf, g_old, np.float32)
        W["vg32"] += dvg
        d32 = ea(xf, g_new, np.float32) - ea(xf, g_old, np.float32)
        d64 = ea(xf, g_new, np.float64) - ea(xf, g_old, np.float64)
        rows.append((label, d32, d64, dvg))

    def inc_move(label, x_new, x_old, g):
        d32 = efull(x_new, g, np.float32) - efull(x_old, g, np.float32)
        d64 = efull(x_new, g, np.float64) - efull(x_old, g, np.float64)
        W[np.float32] += d32
        W[np.float64] += d64
        W["vg32"] += d32
        rows.append((label, d32, d64, d32))

    for k in range(1, M + 1):
        if k == mm + 1 and mm > 0:
            x_prev, g_prev = full_x(mid_pos[stream_atoms]), g_pre
        else:
            x_prev = x_start if k == 1 else full_x(stream[k - 2])
            g_prev = g_init if k == 1 else g_step[k - 2]
        inc_lam(f"lam[{k}]", x_prev, g_step[k - 1], g_prev)
        if k == mm and mm > 0:
            x_mm = full_x(stream[mm - 1])
            inc_lam("lam[move-jump]", x_mm, g_pre, g_step[mm - 1])
            inc_move("move-work", full_x(mid_pos[stream_atoms]), x_mm, g_pre)
    x_end = full_x(stream[M - 1])
    inc_lam("lam[closing]", x_end, schedule.globals_final, g_step[M - 1])

    print(f"W_f32      = {W[np.float32] / KT300:+.6f} kT")
    print(f"W_vg32     = {W['vg32'] / KT300:+.6f} kT   (value_and_grad program)")
    print(f"W_f64      = {W[np.float64] / KT300:+.6f} kT")
    errs = sorted(rows, key=lambda r: -abs(r[1] - r[2]))
    print("\nworst |d32 - d64| increments (kJ/mol):")
    for label, d32, d64, dvg in errs[:12]:
        print(
            f"  {label:16s} d32={d32:+12.6f} d64={d64:+12.6f} "
            f"err32={d32 - d64:+.3e} errvg={dvg - d64:+.3e}"
        )
    tot = sum(abs(r[1] - r[2]) for r in rows)
    print(f"\nsum|err32| = {tot:.4f} kJ/mol over {len(rows)} increments")


if __name__ == "__main__":
    main()
