"""LJ switching function (useSwitchingFunction / switchDistance).

OpenMM semantics the reference forwards through createSystem
(blues/simulation.py:139-219): LJ energy is multiplied by
S = 1 - 10t^3 + 15t^4 - 6t^5 on [switchDistance, cutoff], making the LJ
term and force go smoothly to zero at the cutoff. Electrostatics are
unaffected.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from blues_tpu.core.system import NonbondedParams, System
from blues_tpu.potentials.energy import make_energy_fn, make_force_fn


def _two_atom_system(sigma=0.3, epsilon=1.0):
    nb = NonbondedParams(
        charge=np.zeros(2),
        sigma=np.full(2, sigma),
        epsilon=np.full(2, epsilon),
        exclusions=np.zeros((0, 2), np.int32),
        exceptions_idx=np.zeros((0, 2), np.int32),
        exceptions_chargeprod=np.zeros(0),
        exceptions_sigma=np.zeros(0),
        exceptions_epsilon=np.zeros(0),
    )
    return System(masses=np.ones(2), nonbonded=nb, box=np.eye(3) * 4.0)


@pytest.mark.parametrize("backend", ["dense", "tiled"])
def test_switch_profile_and_continuity(backend):
    system = _two_atom_system()
    rc, rs = 1.0, 0.8
    box = jnp.eye(3) * 4.0
    e_sw = make_energy_fn(
        system, nonbonded_method="CutoffPeriodic", cutoff=rc,
        switch_distance=rs, nonbonded_backend=backend,
        dispersion_correction=False,
    )
    e_raw = make_energy_fn(
        system, nonbonded_method="CutoffPeriodic", cutoff=rc,
        nonbonded_backend=backend, dispersion_correction=False,
    )

    def at(r, fn):
        x = jnp.asarray([[0.0, 0.0, 0.0], [r, 0.0, 0.0]], jnp.float32)
        return float(fn(x, box, None))

    # below the switch radius: identical
    assert at(0.5, e_sw) == pytest.approx(at(0.5, e_raw), rel=1e-6)
    # inside the switch window: scaled by S in (0, 1)
    r_mid = 0.9
    t = (r_mid - rs) / (rc - rs)
    s = 1 - 10 * t**3 + 15 * t**4 - 6 * t**5
    assert at(r_mid, e_sw) == pytest.approx(s * at(r_mid, e_raw), rel=1e-5)
    # at the cutoff: switched energy -> 0 (continuous), raw truncation != 0
    assert abs(at(0.9999, e_sw)) < 1e-6
    assert abs(at(0.9999, e_raw)) > 1e-6


def test_switch_force_matches_fd():
    system = _two_atom_system()
    box = jnp.eye(3) * 4.0
    ffn = make_force_fn(
        make_energy_fn(
            system, nonbonded_method="CutoffPeriodic", cutoff=1.0,
            switch_distance=0.8, nonbonded_backend="tiled",
            dispersion_correction=False,
        )
    )
    efn = make_energy_fn(
        system, nonbonded_method="CutoffPeriodic", cutoff=1.0,
        switch_distance=0.8, nonbonded_backend="tiled",
        dispersion_correction=False,
    )
    for r in (0.6, 0.85, 0.95):
        x = jnp.asarray([[0.0, 0.0, 0.0], [r, 0.0, 0.0]], jnp.float32)
        _, f = ffn(x, box, None)
        h = 1e-3
        xp = x.at[1, 0].add(h)
        xm = x.at[1, 0].add(-h)
        fd = -(float(efn(xp, box, None)) - float(efn(xm, box, None))) / (2 * h)
        assert float(f[1, 0]) == pytest.approx(fd, rel=2e-2, abs=1e-3)


def test_alch_coulomb_treatment_switched():
    """The 'coulomb' alchemical PME treatment's bare-1/r alchemical pairs
    must be switched when switch_distance is set: unlike erfc (negligible
    at the cutoff by construction), 1/r is O(1 kJ/mol) there, and hard
    truncation would leak discontinuities into the NCMC work stream."""
    from blues_tpu.core.system import AlchemicalRegion
    from blues_tpu.potentials import pairs

    rc, rs = 1.0, 0.8
    # formula level: switched alch-coulomb term -> 0 at the cutoff and its
    # radial force factor matches finite differences inside the window
    def at(r, sw):
        return pairs.pair_energy_force(
            jnp.asarray(r * r), 0.3, 0.0, 0.0, 0.7, 0.0,
            jnp.asarray(False),
            lam_sterics=1.0, f_na=1.0, f_aa=1.0, method="PME",
            alpha_ewald=3.2, switch_distance=(rs if sw else None),
            cutoff=rc, alch_coulomb=True,
        )

    e_c, _ = at(0.9999, True)
    e_raw, _ = at(0.9999, False)
    assert abs(float(e_c)) < 1e-4 < abs(float(e_raw))
    for r in (0.6, 0.85, 0.95):
        e, g = at(r, True)
        h = 1e-4
        fd = (float(at(r + h, True)[0]) - float(at(r - h, True)[0])) / (2 * h) / r
        assert float(g) == pytest.approx(fd, rel=2e-3, abs=1e-4)

    # system level: dense and tiled agree with the switch + 'coulomb'
    # treatment at intermediate lambda (covers both new code paths)
    import dataclasses

    system = _two_atom_system()
    nb = dataclasses.replace(system.nonbonded, charge=np.array([0.4, -0.4]))
    system = system.replace(
        nonbonded=nb,
        alchemical=AlchemicalRegion(atoms=np.array([0], np.int32)),
    )
    box = jnp.eye(3) * 4.0
    lam = {"lambda_sterics": 0.7, "lambda_electrostatics": 0.4}
    kw = dict(
        nonbonded_method="PME", cutoff=rc, switch_distance=rs,
        alchemical_pme_treatment="coulomb", dispersion_correction=False,
    )
    e_d = make_energy_fn(system, nonbonded_backend="dense", **kw)
    e_t = make_energy_fn(system, nonbonded_backend="tiled", **kw)
    for r in (0.5, 0.9, 0.97):
        x = jnp.asarray([[0.0, 0.0, 0.0], [r, 0.0, 0.0]], jnp.float32)
        assert float(e_d(x, box, lam)) == pytest.approx(
            float(e_t(x, box, lam)), rel=1e-5, abs=1e-6
        )


def test_switch_distance_validated():
    system = _two_atom_system()
    with pytest.raises(ValueError, match="switch_distance"):
        make_energy_fn(
            system, nonbonded_method="CutoffPeriodic", cutoff=1.0,
            switch_distance=1.5,
        )


def test_unknown_alchemical_treatment_rejected():
    from blues_tpu.core.system import AlchemicalRegion

    system = _two_atom_system()
    system = system.replace(
        alchemical=AlchemicalRegion(atoms=np.array([0], np.int32))
    )
    with pytest.raises(ValueError, match="alchemical_pme_treatment"):
        make_energy_fn(
            system, nonbonded_method="PME", cutoff=1.0,
            alchemical_pme_treatment="bogus-treatment",
        )


def test_yaml_switch_plumbs_through():
    from blues_tpu.config.settings import Settings

    cfg = Settings(
        {
            "system": {
                "nonbondedMethod": "PME",
                "nonbondedCutoff": "9 * angstroms",
                "useSwitchingFunction": True,
                "switchDistance": "8 * angstroms",
            },
            "simulation": {"nstepsNC": 10},
        }
    ).asDict()
    assert cfg["system"]["switchDistance"] == pytest.approx(0.8)
