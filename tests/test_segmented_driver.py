"""Segmented (bounded-dispatch) driver path vs the monolithic iteration.

SimulationConfig.max_steps_per_dispatch splits one iteration into a
host-driven sequence of jitted calls so a single device execution never
exceeds the remote-TPU tunnel's limit (tools/probe_driver_scale.py: R=64
production protocols fault monolithically at nstepsNC>=4000). The staged
path must run the SAME math with the SAME RNG stream as the monolithic
iteration — these tests pin that equivalence on CPU.
"""

import jax
import numpy as np
import pytest

from blues_tpu.moves import MoveEngine, RandomLigandRotationMove
from blues_tpu.simulation import BLUESSimulation, SimulationConfig
from blues_tpu.testsystems import charged_ethylene


def _sim(**overrides):
    system, x = charged_ethylene()
    lig = system.topology.select_resname("LIG")
    kwargs = dict(
        nIter=2, nstepsNC=20, nstepsMD=14, temperature=200.0, dt=0.001,
        moveStep=10,
    )
    kwargs.update(overrides)
    cfg = SimulationConfig(**kwargs)
    sim = BLUESSimulation(
        system, MoveEngine(RandomLigandRotationMove(lig, system.masses)), cfg
    )
    sim.initialize(x, key=jax.random.PRNGKey(3))
    return sim


def _stats_dict(stats):
    import dataclasses

    return {
        f.name: np.asarray(getattr(stats, f.name))
        for f in dataclasses.fields(stats)
    }


@pytest.mark.parametrize("n_replicas", [1, 3])
def test_segmented_matches_monolithic(n_replicas):
    mono = _sim(n_replicas=n_replicas)
    seg = _sim(n_replicas=n_replicas, max_steps_per_dispatch=6)
    assert seg._seg is not None
    # 20 micro-steps, move at 10, default snapshots at micro 0/10/20 ->
    # snap | 6+4 | move snap | 6+4 (+ final snapshot after close);
    # MD 14 -> chunks 6+6+2
    kinds = [e[0] for e in seg._seg["staged"].plan]
    assert kinds == ["snap", "seg", "seg", "move", "snap", "seg", "seg"]
    assert seg._seg["staged"].record_final
    assert seg._seg["md_plan"] == [6, 6, 2]

    for it in range(2):
        s_m, _, f_m = mono.run_iteration()
        s_s, _, f_s = seg.run_iteration()
        dm, ds = _stats_dict(s_m), _stats_dict(s_s)
        for k in dm:
            np.testing.assert_allclose(
                ds[k], dm[k], rtol=1e-5, atol=1e-5, err_msg=f"iter {it}: {k}"
            )
        np.testing.assert_allclose(
            np.asarray(f_s.positions), np.asarray(f_m.positions),
            rtol=1e-5, atol=1e-5,
        )
        np.testing.assert_allclose(
            np.asarray(f_s.work), np.asarray(f_m.work), rtol=1e-5, atol=1e-4
        )
        np.testing.assert_allclose(
            np.asarray(seg.state.positions), np.asarray(mono.state.positions),
            rtol=1e-5, atol=1e-5, err_msg=f"iter {it}: end positions",
        )
        np.testing.assert_allclose(
            np.asarray(seg.state.rng_key), np.asarray(mono.state.rng_key),
            err_msg=f"iter {it}: RNG keys diverged",
        )


def test_segmented_frame_indices():
    seg = _sim(max_steps_per_dispatch=7, ncmc_frame_indices=(1, 0.5, -1))
    mono = _sim(ncmc_frame_indices=(1, 0.5, -1))
    _, _, f_s = seg.run_iteration()
    _, _, f_m = mono.run_iteration()
    assert np.asarray(f_s.positions).shape == np.asarray(f_m.positions).shape
    np.testing.assert_allclose(
        np.asarray(f_s.work), np.asarray(f_m.work), rtol=1e-5, atol=1e-4
    )


def test_segmented_rejects_npt_and_frames():
    with pytest.raises(ValueError, match="NPT"):
        _sim(max_steps_per_dispatch=5, pressure=1.0)
    with pytest.raises(ValueError, match="frames"):
        _sim(max_steps_per_dispatch=5, md_report_interval=5)


def test_segmented_run_loop_aggregates():
    seg = _sim(n_replicas=2, max_steps_per_dispatch=10, nIter=2)
    ratio = seg.run()
    assert 0.0 <= ratio <= 1.0
    assert seg.iteration_count == 2
