"""Physics validation beyond the ethylene gate: water box equilibration.

A TIP3P lattice box run under NVT must relax to a sensible potential energy
per water (bulk TIP3P is ~ -40 kJ/mol per molecule at 300 K; a short run
from a jittered lattice should get most of the way) while conserving
rigid-water geometry — an end-to-end check of the builder, PME, BAOAB, and
the constraint solver together.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from blues_tpu.core.build import tip3p_water_box
from blues_tpu.core.state import maxwell_boltzmann_velocities
from blues_tpu.integrators.constraints import make_constraint_fns
from blues_tpu.integrators.langevin import LangevinParams, run_md
from blues_tpu.integrators.minimize import minimize_fire
from blues_tpu.potentials.energy import make_energy_fn, make_force_fn
from blues_tpu import units


@pytest.mark.slow
def test_water_box_equilibration():
    n_wat = 216
    system, x0 = tip3p_water_box(n_wat, seed=3)
    efn = make_energy_fn(system, nonbonded_method="PME", cutoff=0.85)
    ffn = make_force_fn(efn)
    cx, cv = make_constraint_fns(system.constraints, system.masses)
    box = jnp.asarray(system.box, jnp.float32)
    x = jnp.asarray(x0, jnp.float32)
    x, e_min = jax.jit(
        lambda x: minimize_fire(ffn, system.masses, x, box, n_steps=800, constrain_x=cx)
    )(x)
    T = 300.0
    params = LangevinParams(dt=0.002, friction=2.0, temperature=T)
    kv, kmd = jax.random.split(jax.random.PRNGKey(1))
    v = cv(maxwell_boltzmann_velocities(kv, system.masses, T), x)
    run = jax.jit(
        lambda x, v, k: run_md(ffn, system.masses, params, cx, cv, x, v, box, k, 500)
    )
    pes = []
    for i in range(6):
        kmd, sub = jax.random.split(kmd)
        x, v, _, pe = run(x, v, sub)
        pes.append(float(pe))
    assert np.isfinite(pes).all()
    e_per_water = pes[-1] / n_wat
    # equilibrated TIP3P PE/water ~ -40 kJ/mol; accept a broad band for a
    # short 6 ps run from a lattice
    assert -50.0 < e_per_water < -20.0, (e_per_water, pes)
    # temperature in band
    m = np.asarray(system.masses)
    ke = 0.5 * np.sum(m[:, None] * np.asarray(v) ** 2)
    dof = 3 * system.n_atoms - len(system.constraints) - 3
    t_est = 2 * ke / (dof * units.BOLTZMANN_KJMOL)
    assert abs(t_est - T) < 0.15 * T, t_est
    # rigid waters stayed rigid
    d = np.linalg.norm(
        np.asarray(x)[system.constraints.idx[:, 0]]
        - np.asarray(x)[system.constraints.idx[:, 1]],
        axis=1,
    )
    assert np.max(np.abs(d / system.constraints.dist - 1)) < 1e-4
