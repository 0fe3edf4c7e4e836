"""Utils parity tests: tabulated schedules, frame dump, quantity parsing."""

import numpy as np
import pytest

from blues_tpu import units
from blues_tpu.utils import save_simulation_frame, tabulated_schedule
from blues_tpu.core.amber_coords import load_pdb_positions
from blues_tpu.testsystems import charged_ethylene


def test_tabulated_schedule_interpolation():
    f = tabulated_schedule([0.0, 0.5, 1.0], [1.0, 0.0, 1.0])
    assert f(0.0) == 1.0 and f(0.5) == 0.0 and f(0.25) == 0.5
    # usable directly as an alchemical function
    from blues_tpu.integrators.schedules import build_ncmc_schedule

    sched = build_ncmc_schedule(
        10, alchemical_functions={"lambda_sterics": f, "lambda_electrostatics": f}
    )
    assert sched.globals_per_step["lambda_sterics"][0] == pytest.approx(0.9)
    assert sched.globals_final["lambda_sterics"] == pytest.approx(1.0)


def test_save_frame_roundtrip(tmp_path):
    system, x = charged_ethylene()
    path = str(tmp_path / "frame.pdb")
    save_simulation_frame(system, x, path, system.box)
    pos, names, resnames, resids, elements = load_pdb_positions(path)
    assert pos.shape == (8, 3)
    assert np.allclose(pos, x, atol=1e-3)
    assert resnames[2] == "LIG"


def test_parse_quantity_forms():
    assert units.parse_quantity("10 * angstroms") == pytest.approx(1.0)
    assert units.parse_quantity("0.004 * picoseconds") == pytest.approx(0.004)
    assert units.parse_quantity("1 * 1/picoseconds") == pytest.approx(1.0)
    assert units.parse_quantity("300*kelvin") == pytest.approx(300.0)
    assert units.parse_quantity(10, "angstroms") == pytest.approx(1.0)
    assert units.parse_quantity("3.024*daltons") == pytest.approx(3.024)
    with pytest.raises(ValueError):
        units.parse_quantity("ten angstroms")
