"""Profiling and timing utilities.

The reference's only perf instrumentation is the ns/day `speed` column and
an end-of-run force-evaluation tally (_printSimulationTiming,
reference: blues/simulation.py:965-1011; reporters.py:655-686). This module
provides the same counters plus real tracing:

  * `simulation_timing(sim)` — the reference's end-of-run summary:
    total force evaluations, simulated picoseconds, ns/day, switching
    steps/sec.
  * `trace(path)` — context manager around `jax.profiler` emitting a
    TensorBoard/Perfetto trace of the jitted iteration.
"""

from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a device trace viewable in TensorBoard / Perfetto."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class SimulationTimer:
    """Wall-clock + throughput accounting over driver iterations."""

    def __init__(self, sim):
        self.sim = sim
        self.t0 = None
        self.iterations = 0

    def start(self):
        self.t0 = time.time()
        self.iterations = 0
        return self

    def tick(self, n: int = 1):
        self.iterations += n

    def summary(self) -> dict:
        """Reference-style timing report (_printSimulationTiming)."""
        elapsed = max(time.time() - (self.t0 or time.time()), 1e-9)
        cfg = self.sim.cfg
        prop_steps = getattr(self.sim, "propSteps", cfg.nstepsNC)
        md_steps = self.iterations * cfg.nstepsMD
        nc_steps = self.iterations * prop_steps
        # force evaluations: 1 per MD step, 2 per NCMC micro-step, + the
        # per-protocol boundary evaluations
        force_evals = md_steps + 2 * nc_steps + 4 * self.iterations
        ps = md_steps * cfg.dt
        return {
            "iterations": self.iterations,
            "elapsed_s": elapsed,
            "md_steps": md_steps,
            "ncmc_switching_steps": nc_steps,
            "force_evaluations": force_evals,
            "simulated_ps_md": ps,
            "ns_per_day_md": ps / elapsed * 86.4,
            "switching_steps_per_s": nc_steps / elapsed,
        }
