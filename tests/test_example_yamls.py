"""Every shipped example YAML must pass the STRICT Settings validator.

config/settings.py rejects unknown ``system``/``simulation``/``freeze``/
``restraints`` keys (the round-4 strictness fix for silently-ignored
physics keys), so any schema change that orphans a shipped example must
fail here instead of failing for users. The reference ships the analogous
files (/root/reference/examples/*.yml) consumed by blues/settings.py
set_Parameters (:286-307); Settings() only parses + validates — no
structure load — so this stays milliseconds-fast per file.
"""

import glob
import os

import pytest

from blues_tpu.config import Settings

_EXAMPLES_DIR = os.path.join(os.path.dirname(__file__), "..", "examples")
EXAMPLE_YAMLS = sorted(
    glob.glob(os.path.join(_EXAMPLES_DIR, "*.yml"))
    + glob.glob(os.path.join(_EXAMPLES_DIR, "*.yaml"))
)


def test_examples_present():
    # the repo ships at least rotmove/water/sidechain (reference parity)
    names = {os.path.basename(p) for p in EXAMPLE_YAMLS}
    assert {"rotmove.yml", "water.yml", "sidechain.yml"} <= names


def test_no_unvalidated_yaml_like_files():
    # every YAML-looking file in examples/ must be in the validated set
    # (the reference itself ships both .yml and .yaml examples)
    all_yamlish = {
        p
        for p in glob.glob(os.path.join(_EXAMPLES_DIR, "*"))
        if os.path.splitext(p)[1].lower() in (".yml", ".yaml")
    }
    assert all_yamlish == set(EXAMPLE_YAMLS)


@pytest.mark.parametrize(
    "path", EXAMPLE_YAMLS, ids=[os.path.basename(p) for p in EXAMPLE_YAMLS]
)
def test_example_yaml_validates(path, tmp_path, monkeypatch):
    # Settings mkdirs output_dir relative to cwd; keep test runs clean
    monkeypatch.chdir(tmp_path)
    cfg = Settings(os.path.abspath(path)).config
    assert isinstance(cfg.get("system"), dict)
    sim = cfg.get("simulation") or {}
    if "nstepsNC" in sim:
        # derived keys injected by calculate_ncmc_steps (reference
        # blues/utils.py:89-145 semantics)
        assert sim["moveStep"] == sim["nstepsNC"] // 2
        assert sim["nstepsNC"] % 2 == 0


def test_implicit_gb_example_selects_gb_model(tmp_path, monkeypatch):
    path = os.path.join(_EXAMPLES_DIR, "implicit_gb.yml")
    monkeypatch.chdir(tmp_path)
    cfg = Settings(os.path.abspath(path)).config
    assert str(cfg["system"]["implicitSolvent"]) == "OBC2"
    # GB requires NoCutoff (validator enforces; pin the example obeys)
    assert str(cfg["system"].get("nonbondedMethod", "NoCutoff")) == "NoCutoff"
