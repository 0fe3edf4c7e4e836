"""Smoke tests on the charged-ethylene system: energies, MD, NCMC driver."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from blues_tpu import units
from blues_tpu.core.state import maxwell_boltzmann_velocities
from blues_tpu.integrators.constraints import make_constraint_fns
from blues_tpu.integrators.langevin import LangevinParams, run_md
from blues_tpu.moves import NullMove, RandomLigandRotationMove
from blues_tpu.potentials.energy import make_energy_fn, make_force_fn
from blues_tpu.simulation import BLUESSimulation, SimulationConfig
from blues_tpu.testsystems import charged_ethylene


@pytest.fixture(scope="module")
def ethylene():
    return charged_ethylene()


def test_energy_finite_and_terms(ethylene):
    system, x = ethylene
    efn = make_energy_fn(system)
    e = efn(jnp.asarray(x, jnp.float32), jnp.asarray(system.box, jnp.float32), None)
    assert np.isfinite(float(e))


def test_energy_hand_check_pair_term(ethylene):
    """Cross-check the custom pair energy against a direct numpy evaluation."""
    system, x = ethylene
    efn = make_energy_fn(system.replace(bonds=system.bonds.__class__.empty(),
                                        angles=system.angles.__class__.empty(),
                                        torsions=system.torsions.__class__.empty(),
                                        centroid_restraints=[]))
    e = float(efn(jnp.asarray(x, jnp.float64), None, None))
    # numpy reference
    pp = system.custom_pairs[0].per_particle
    total = 0.0
    for i in (0, 1):
        for j in range(2, 8):
            r = np.linalg.norm(x[i] - x[j])
            sig = 0.5 * (pp[i, 0] + pp[j, 0])
            eps = np.sqrt(pp[i, 1] * pp[j, 1])
            q = pp[i, 2] * pp[j, 2]
            total += q / r**2 + 4 * eps * ((sig / r) ** 12 - (sig / r) ** 6)
    assert np.isclose(e, total, rtol=1e-6)


def test_forces_match_numerical_gradient(ethylene):
    system, x = ethylene
    efn = make_energy_fn(system)
    ffn = make_force_fn(efn)
    x64 = jnp.asarray(x, jnp.float32)
    box = jnp.asarray(system.box, jnp.float32)
    _, f = ffn(x64, box, None)
    # central differences on a few random components
    rng = np.random.default_rng(0)
    h = 1e-4
    for _ in range(6):
        i = rng.integers(0, 8)
        d = rng.integers(0, 3)
        xp = np.array(x, np.float64)
        xm = np.array(x, np.float64)
        xp[i, d] += h
        xm[i, d] -= h
        fd = -(float(efn(jnp.asarray(xp, jnp.float32), box, None))
               - float(efn(jnp.asarray(xm, jnp.float32), box, None))) / (2 * h)
        assert abs(fd - float(f[i, d])) < 2e-2 * max(1.0, abs(fd)), (i, d, fd, float(f[i, d]))


def test_constraints_preserved_in_md(ethylene):
    system, x = ethylene
    efn = make_energy_fn(system)
    ffn = make_force_fn(efn)
    cx, cv = make_constraint_fns(system.constraints, system.masses)
    params = LangevinParams(dt=0.001, friction=1.0, temperature=200.0)
    key = jax.random.PRNGKey(0)
    kv, kmd = jax.random.split(key)
    x0 = jnp.asarray(x, jnp.float32)
    v0 = maxwell_boltzmann_velocities(kv, system.masses, 200.0)
    v0 = cv(v0, x0)
    box = jnp.asarray(system.box, jnp.float32)
    xf, vf, _, pe = jax.jit(
        lambda x, v, k: run_md(ffn, system.masses, params, cx, cv, x, v, box, k, 200)
    )(x0, v0, kmd)
    d = np.linalg.norm(np.asarray(xf)[system.constraints.idx[:, 0]]
                       - np.asarray(xf)[system.constraints.idx[:, 1]], axis=1)
    assert np.allclose(d, system.constraints.dist, rtol=5e-5), d
    assert np.isfinite(float(pe))
    # frozen atoms did not move
    assert np.allclose(np.asarray(xf)[:2], x[:2])


def test_md_temperature_equilibration(ethylene):
    """Long MD should fluctuate around the bath temperature."""
    system, x = ethylene
    efn = make_energy_fn(system)
    ffn = make_force_fn(efn)
    cx, cv = make_constraint_fns(system.constraints, system.masses)
    T = 200.0
    params = LangevinParams(dt=0.001, friction=5.0, temperature=T)
    key = jax.random.PRNGKey(42)
    kv, kmd = jax.random.split(key)
    x0 = jnp.asarray(x, jnp.float32)
    v0 = cv(maxwell_boltzmann_velocities(kv, system.masses, T), x0)
    box = jnp.asarray(system.box, jnp.float32)

    # average KE over trajectory via chunked runs
    kes = []
    xc, vc = x0, v0
    run = jax.jit(lambda x, v, k: run_md(ffn, system.masses, params, cx, cv,
                                         x, v, box, k, 100))
    for i in range(60):
        kmd, sub = jax.random.split(kmd)
        xc, vc, _, _ = run(xc, vc, sub)
        m = np.asarray(system.masses)
        ke = 0.5 * np.sum(m[:, None] * np.asarray(vc) ** 2)
        kes.append(ke)
    # DOF: 6 mobile atoms * 3 - 4 constraints = 14
    dof = 14
    t_est = 2.0 * np.mean(kes[10:]) / (dof * units.BOLTZMANN_KJMOL)
    assert abs(t_est - T) < 0.25 * T, t_est


def test_null_move_acceptance_near_one(ethylene):
    """Identity move => protocol work ~ 0 => acceptance ~ 1
    (reference test pattern: tests/test_simulation.py:80-88)."""
    system, x = ethylene
    cfg = SimulationConfig(
        nIter=10, nstepsNC=20, nstepsMD=20, temperature=200.0, dt=0.001,
        friction=1.0, moveStep=10,
    )
    sim = BLUESSimulation(system, NullMove(), cfg)
    sim.initialize(x, key=jax.random.PRNGKey(1))
    ratio = sim.run(10)
    works = np.array([s.protocol_work for s in sim.stats_history])
    # protocol work fluctuates thermally but should be small vs the veto scale
    assert np.all(np.isfinite(works))
    assert ratio > 0.5, (ratio, works)


def test_rotation_move_runs(ethylene):
    system, x = ethylene
    lig = system.topology.select_resname("LIG")
    move = RandomLigandRotationMove(lig, system.masses)
    cfg = SimulationConfig(
        nIter=5, nstepsNC=20, nstepsMD=20, temperature=200.0, dt=0.001,
        friction=1.0, moveStep=10,
    )
    sim = BLUESSimulation(system, move, cfg)
    sim.initialize(x, key=jax.random.PRNGKey(2))
    sim.run(5)
    works = np.array([s.protocol_work for s in sim.stats_history])
    assert np.all(np.isfinite(works))


def test_nan_work_forces_rejection(ethylene):
    """Failure-detection parity (SURVEY.md 5.2-5.3): a NaN protocol work
    must reject the iteration rather than corrupt or kill the run (the
    reference checks isnan(work) before applying the correction,
    blues/simulation.py:1134)."""
    import blues_tpu.moves.base as mb

    class PoisonMove(mb.Move):
        def propose(self, key, x, box, aux):
            return x * jnp.nan, aux

    system, x = charged_ethylene()
    cfg = SimulationConfig(nIter=2, nstepsNC=10, nstepsMD=10, temperature=200.0,
                           dt=0.001, moveStep=5)
    sim = BLUESSimulation(system, PoisonMove(), cfg)
    sim.initialize(x, key=jax.random.PRNGKey(0))
    stats, _, _ = sim.run_iteration()
    assert not bool(stats.accepted)
    # the MD state survived: positions finite (rejection restored them)
    assert bool(jnp.isfinite(sim.state.positions).all())


def test_md_state_unchanged_on_reject(ethylene):
    """The reference verifies the MD context's PE is untouched after a
    rejected move to 1e-6 rel (blues/simulation.py:1160-1166). Functionally,
    rejection must restore the exact pre-NCMC positions before MD resumes:
    with nstepsMD=0 and a veto-forcing move, state is bitwise unchanged."""
    import blues_tpu.moves.base as mb

    class VetoMove(mb.Move):
        def propose(self, key, x, box, aux):
            lig = jnp.arange(2, 8)
            return x.at[lig].add(0.3), aux

        def after(self, key, x, box, aux):
            return jnp.ones((), bool)  # always veto => work = 999999

    system, x = charged_ethylene()
    cfg = SimulationConfig(nIter=1, nstepsNC=10, nstepsMD=0, temperature=200.0,
                           dt=0.001, moveStep=5)
    sim = BLUESSimulation(system, VetoMove(), cfg)
    sim.initialize(x, key=jax.random.PRNGKey(9))
    x_before = np.asarray(sim.state.positions)
    stats, _, _ = sim.run_iteration()
    assert not bool(stats.accepted)
    assert float(stats.protocol_work) > 900000.0
    assert np.array_equal(np.asarray(sim.state.positions), x_before)
