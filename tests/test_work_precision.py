"""Work-accumulation precision + nonequilibrium work-distribution checks.

SURVEY.md 7.3.5: OpenMM mixes single-precision forces with double
accumulators; the TPU rebuild is f32-native and uses Kahan-compensated
accumulation for protocol work (integrators/ncmc.py). Two properties are
pinned here:

1. Accumulator fidelity: Kahan-f32 summation of production-scale increment
   streams (10k+ energy differences, including adversarial large-magnitude
   cancellations) tracks f64 summation to << kT, where naive f32 drifts.
2. Physics of the work distribution: for a cyclic protocol (lambda off and
   back on, DeltaF = 0) from equilibrated states, Jarzynski's equality
   <exp(-W/kT)> = 1 must hold within sampling error, and mean dissipated
   work must be >= 0 (second law). This is the Crooks-symmetry-grade check
   on the whole NCMC work bookkeeping (driver + integrator + schedule),
   far stronger than the 20-step smoke tests.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from blues_tpu import units
from blues_tpu.core.state import KahanAccumulator
from blues_tpu.moves import NullMove, RandomLigandRotationMove
from blues_tpu.simulation import BLUESSimulation, SimulationConfig
from blues_tpu.testsystems import charged_ethylene


# --- 1. accumulator precision ------------------------------------------------


def _stream(n, rng):
    """A production-like increment stream: small dissipative work increments
    (the running total grows to O(1e3) kJ/mol like a long dissipative
    switching protocol) plus occasional large cancelling lambda-transition
    pairs (the telescoped accounting produces exactly such pairs at window
    boundaries)."""
    small = rng.normal(0.3, 5.0, n)  # positive mean: dissipation
    big = np.zeros(n)
    idx = rng.choice(n // 2, size=n // 50, replace=False) * 2
    big[idx] = rng.normal(0.0, 2e4, idx.size)
    big[idx + 1] = -big[idx]
    return (small + big).astype(np.float32)


@pytest.mark.parametrize("n", [10_000, 50_000])
def test_kahan_f32_tracks_f64_on_production_streams(n):
    """Kahan-f32 accumulation of production-like increment streams tracks
    the f64 sum to << kT. (On THIS stream naive f32 happens to do about as
    well — the naive-f32-fails property is pinned by the offset-pathology
    companion test below, where naive loses every small increment.)"""
    rng = np.random.default_rng(0)
    inc = _stream(n, rng)
    ref = float(np.sum(inc.astype(np.float64)))

    def scan_sum(acc_update):
        def body(carry, v):
            return acc_update(carry, v), None

        return body

    # Kahan f32
    kah, _ = jax.lax.scan(
        scan_sum(lambda a, v: a.add(v)),
        KahanAccumulator.zeros(jnp.float32),
        jnp.asarray(inc),
    )
    kT = units.kT(300.0)
    err_kahan = abs(float(kah.value) - ref)
    # << kT even at 5x the production protocol length with O(2e4 kJ/mol)
    # transients: acceptance bias from accumulation error is negligible
    assert err_kahan < 0.05 * kT, (err_kahan, ref)


def test_kahan_recovers_small_increments_under_large_offset():
    """The compensation-specific pathology: a transient O(1e6) term (a
    lambda window boundary on an unfrozen 22k-atom system) followed by 10k
    small increments. Naive f32 loses every small increment (each is below
    the ulp of the running total); Kahan recovers the true sum."""
    import jax

    inc = np.concatenate(
        [[2.0e6], np.full(10_000, 0.01), [-2.0e6]]
    ).astype(np.float32)
    ref = 100.0

    def body_k(c, v):
        return c.add(v), None

    def body_n(c, v):
        return c + v, None

    kah, _ = jax.lax.scan(
        body_k, KahanAccumulator.zeros(jnp.float32), jnp.asarray(inc)
    )
    naive, _ = jax.lax.scan(body_n, jnp.zeros((), jnp.float32), jnp.asarray(inc))
    assert abs(float(kah.value) - ref) < 0.01
    assert abs(float(naive) - ref) > 50.0  # naive loses the increments


def test_micro_stream_replay_reproduces_work():
    """NCMCResult.micro_stream records enough positions to replay the
    protocol's exact work bookkeeping externally (the f64 ground-truth
    replay of tools/work_precision_replay.py). Here the replay runs in f64
    on the ethylene protocol and must match the protocol's own Kahan-f32
    work to f32 precision of the energy differences."""
    from blues_tpu.core.state import maxwell_boltzmann_velocities
    from blues_tpu.integrators.constraints import make_constraint_fns
    from blues_tpu.integrators.langevin import LangevinParams
    from blues_tpu.integrators.ncmc import make_ncmc_protocol
    from blues_tpu.integrators.schedules import build_ncmc_schedule
    from blues_tpu.potentials.energy import make_energy_fn, make_force_fn

    system, x0 = charged_ethylene()
    lig = system.topology.select_resname("LIG")
    efn = make_energy_fn(system)
    ffn = make_force_fn(efn)
    cx, cv = make_constraint_fns(system.constraints, system.masses)
    params = LangevinParams(dt=0.001, friction=1.0, temperature=200.0)
    schedule = build_ncmc_schedule(20)
    move = RandomLigandRotationMove(lig, system.masses)
    stream_atoms = np.arange(system.n_atoms)
    protocol = make_ncmc_protocol(
        efn, ffn, system.masses, params, cx, cv, schedule, move=move,
        stream_atoms=stream_atoms,
    )
    key = jax.random.PRNGKey(5)
    kv, kp = jax.random.split(key)
    x = jnp.asarray(x0, jnp.float32)
    v = cv(maxwell_boltzmann_velocities(kv, system.masses, 200.0), x)
    res = jax.jit(protocol)(x, v, None, kp)
    stream = np.asarray(res.micro_stream)
    M, mm = schedule.n_micro, schedule.move_micro
    assert stream.shape == (M, system.n_atoms, 3)

    with jax.enable_x64(True):
        efn64 = make_energy_fn(system)

        def E(xf, g):
            gg = {k: jnp.asarray(v, jnp.float64) for k, v in g.items()}
            return float(efn64(jnp.asarray(xf, jnp.float64), None, gg))

        g_step = [
            {k: schedule.globals_per_step[k][i] for k in schedule.globals_per_step}
            for i in range(M)
        ]
        x_start = np.asarray(cx(x, x), np.float64)
        mid = np.asarray(res.mid_positions, np.float64)
        W = 0.0
        for k in range(1, M + 1):
            if k == mm + 1 and mm > 0:
                x_prev, g_prev = mid, schedule.globals_pre_move
            else:
                x_prev = x_start if k == 1 else stream[k - 2]
                g_prev = schedule.globals_initial if k == 1 else g_step[k - 2]
            W += E(x_prev, g_step[k - 1]) - E(x_prev, g_prev)
            if k == mm and mm > 0:
                x_mm = stream[mm - 1]
                W += E(x_mm, schedule.globals_pre_move) - E(x_mm, g_step[mm - 1])
                W += E(mid, schedule.globals_pre_move) - E(x_mm, schedule.globals_pre_move)
        x_end = stream[M - 1]
        W += E(x_end, schedule.globals_final) - E(x_end, g_step[M - 1])

    w32 = float(res.protocol_work)
    # agreement limited only by f32 energy-difference rounding (ethylene
    # energies are O(10) kJ/mol -> absolute f32 noise ~1e-5/step)
    assert abs(W - w32) < 5e-3, (W, w32)


# --- 2. Jarzynski / dissipation on the full driver ----------------------------


@pytest.fixture(scope="module")
def work_samples():
    """240 protocol-work samples from equilibrated ethylene states: 16
    replicas x 15 iterations of a 20-step cyclic NCMC protocol with an
    identity move (DeltaF = 0)."""
    system, x = charged_ethylene()
    cfg = SimulationConfig(
        nIter=15, nstepsNC=20, nstepsMD=50, temperature=200.0, dt=0.001,
        n_replicas=16,
    )
    sim = BLUESSimulation(system, NullMove(), cfg)
    sim.initialize(x, key=jax.random.PRNGKey(42))
    # burn-in: equilibrate each replica with MD before sampling
    for _ in range(3):
        sim.run_iteration()
    works = []
    for _ in range(15):
        stats, _, _ = sim.run_iteration()
        works.append(np.asarray(stats.protocol_work))
    return np.concatenate(works) / units.kT(200.0)  # beta*W


def test_jarzynski_identity_cyclic_protocol(work_samples):
    bw = work_samples
    assert np.isfinite(bw).all()
    # <exp(-beta W)> = exp(-beta DeltaF) = 1 for the cyclic protocol.
    # Estimate with bootstrap error bars; the estimator is noisy for broad
    # distributions, so assert within 4 sigma.
    est = np.exp(-bw).mean()
    rng = np.random.default_rng(1)
    boots = [
        np.exp(-rng.choice(bw, bw.size, replace=True)).mean() for _ in range(400)
    ]
    sem = np.std(boots)
    assert abs(est - 1.0) < 4.0 * sem + 0.05, (est, sem)


def test_mean_dissipated_work_nonnegative(work_samples):
    bw = work_samples
    sem = bw.std() / np.sqrt(bw.size)
    # second law: <W_diss> = <W> - DeltaF >= 0 (DeltaF = 0 here)
    assert bw.mean() > -3.0 * sem, (bw.mean(), sem)
