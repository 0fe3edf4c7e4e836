"""PME correctness against analytic golden values.

The reference's PME parity requirement (forces/energies <= 1e-4 relative,
BASELINE.md) cannot be checked against OpenMM here (not installed), so the
Ewald machinery is validated against the exactly known Madelung energy of
the rock-salt lattice — an end-to-end test of spreading, FFT, influence
function, self-energy, and exclusions-free direct space.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from blues_tpu import units
from blues_tpu.core.system import NonbondedParams
from blues_tpu.potentials.nonbonded import make_nonbonded_energy
from blues_tpu.potentials.pme import bspline_weights

MADELUNG_NACL = 1.7475645946331822


def _nacl(a=0.5):
    na = np.array([[0, 0, 0], [0.5, 0.5, 0], [0.5, 0, 0.5], [0, 0.5, 0.5]]) * a
    cl = np.array([[0.5, 0, 0], [0, 0.5, 0], [0, 0, 0.5], [0.5, 0.5, 0.5]]) * a
    pos = np.concatenate([na, cl])
    q = np.array([1.0] * 4 + [-1.0] * 4)
    nb = dataclasses.replace(
        NonbondedParams.empty(8), charge=q, sigma=np.full(8, 0.1), epsilon=np.zeros(8)
    )
    return pos, nb, np.eye(3) * a


@pytest.mark.parametrize("tol,rel", [(5e-4, 1e-3), (1e-5, 5e-5)])
def test_madelung_energy(tol, rel):
    a = 0.5
    pos, nb, box = _nacl(a)
    efn = make_nonbonded_energy(nb, method="PME", cutoff=0.24, ewald_tolerance=tol, box_for_pme=box)
    e = float(jax.jit(efn)(jnp.asarray(pos, jnp.float32), jnp.asarray(box, jnp.float32), None))
    e_exact = -4.0 * MADELUNG_NACL * units.ONE_4PI_EPS0 / (a / 2)
    assert abs(e - e_exact) / abs(e_exact) < rel


def test_madelung_forces_zero():
    """Perfect lattice: net force on every ion is zero by symmetry."""
    pos, nb, box = _nacl()
    efn = make_nonbonded_energy(nb, method="PME", cutoff=0.24, ewald_tolerance=1e-5, box_for_pme=box)
    g = jax.jit(jax.grad(efn))(jnp.asarray(pos, jnp.float32), jnp.asarray(box, jnp.float32), None)
    # force scale here is ~ E/d ~ 1.5e4; symmetric lattice must cancel to f32 noise
    assert float(jnp.max(jnp.abs(g))) < 2.0


def test_pme_force_matches_fd():
    """PME forces = -dE/dx via FD on a perturbed (asymmetric) configuration."""
    pos, nb, box = _nacl()
    rng = np.random.default_rng(3)
    pos = pos + 0.02 * rng.normal(size=pos.shape)
    efn = make_nonbonded_energy(nb, method="PME", cutoff=0.24, ewald_tolerance=1e-5, box_for_pme=box)
    jbox = jnp.asarray(box, jnp.float32)
    e, g = jax.jit(jax.value_and_grad(efn))(jnp.asarray(pos, jnp.float32), jbox, None)
    # f32 FD noise floor is ~|E| * eps / (2h) ~ 0.6 kJ/mol/nm at h=1e-3, so
    # check only large components loosely here; exact agreement (1e-8 rel)
    # is verified in float64 (see git history / f64 spot check)
    h = 1e-3
    for i, d in [(0, 0), (6, 2)]:
        xp, xm = pos.copy(), pos.copy()
        xp[i, d] += h
        xm[i, d] -= h
        fd = (float(efn(jnp.asarray(xp, jnp.float32), jbox, None))
              - float(efn(jnp.asarray(xm, jnp.float32), jbox, None))) / (2 * h)
        assert abs(fd - float(g[i, d])) < 5e-2 * max(abs(fd), 20.0), (i, d, fd, float(g[i, d]))


def test_bspline_partition_of_unity():
    w = jnp.linspace(0.0, 0.999, 64)
    for order in (4, 5, 6):
        total = bspline_weights(w, order).sum(-1)
        assert np.allclose(np.asarray(total), 1.0, atol=1e-5)
