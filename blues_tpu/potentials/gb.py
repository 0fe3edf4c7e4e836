"""Generalized-Born implicit solvent (HCT / OBC1 / OBC2) + ACE surface area.

TPU-native replacement for OpenMM's GBSAOBCForce, which the reference's
config layer enables via `implicitSolvent: OBC2` (reference:
blues/settings.py:205-230 maps the string onto `simtk.openmm.app` objects
consumed by parmed `createSystem`). The math follows OpenMM's reference
kernel (ReferenceObc::computeBornRadii / computeBornEnergyForces) and the
OBC paper (Onufriev, Bashford, Case, Proteins 55:383, 2004):

Born radii (pairwise HCT integral + OBC rescaling):

    or_i   = rho_i - offset                      (offset = 0.009 nm)
    sr_j   = screen_j * or_j
    L_ij   = 1 / max(or_i, |r - sr_j|)
    U_ij   = 1 / (r + sr_j)
    term   = L - U + r/4 (U^2 - L^2) + 1/(2r) ln(U/L) + sr_j^2/(4r) (L^2 - U^2)
             [+ 2 (1/or_i - L)  if or_i < sr_j - r]     (descreening overlap)
    psi_i  = or_i/2 * sum_{j != i, or_i < r + sr_j} term
    B_i    = 1 / (1/or_i - tanh(a psi - b psi^2 + c psi^3) / rho_i)

    (a, b, c) = (0.8, 0, 2.909125) for OBC1; (1.0, 0.8, 4.85) for OBC2;
    HCT uses no rescaling: B_i = 1 / (1/or_i - psi_i_raw) with the classic
    0.5*sum convention folded the same way (implemented as tanh(x) -> x is
    NOT equivalent; HCT here uses the direct 1/(1/or - I) form).

GB polarization energy (with optional Debye-Hueckel salt screening kappa):

    f_ij   = sqrt(r^2 + B_i B_j exp(-r^2 / (4 B_i B_j)))
    E_pol  = -ke/2 (1/eps_in - exp(-kappa f_ij)/eps_out) sum_ij q_i q_j / f_ij
             (double sum INCLUDING i == j, where f_ii = B_i)

ACE nonpolar surface-area term (OpenMM's includeAceApproximation):

    E_np   = sum_i 4 pi gamma (rho_i + r_probe)^2 (rho_i / B_i)^6
             gamma = 2.25936 kJ/mol/nm^2, r_probe = 0.14 nm
             (4 pi gamma = 28.3919551, OpenMM's pi4Asolv)

Dense O(N^2) jnp implementation with forces from jax.grad — GB systems are
implicit-solvent (no water box), typically <= 10k atoms, far below the pair
kernels' crossover. With an alchemical region, the polarization sum scales
those atoms' charges by the ``lambda_electrostatics`` global (openmmtools'
GBSAOBCForce treatment; see make_gb_energy), making the term
lambda-DEPENDENT — potentials/energy.py therefore disables the lambda-split
E0/Ea caching in that case, and only folds GB into E0 when no alchemical
region exists.

Verified against an independently written f64 numpy oracle
(tools/gb_oracle.py) and finite differences (tests/test_gb.py); OpenMM
itself is not installable in this environment, so the pin is
equation-level, not binary-level (documented in docs/parity.md).
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .. import units

DIELECTRIC_OFFSET = 0.009  # nm
PROBE_RADIUS = 0.14  # nm
PI4_ASOLV = 28.3919551  # kJ/mol/nm^2 (= 4 pi * 2.25936)

#: OBC rescaling coefficients (alpha, beta, gamma)
OBC_COEFFS = {
    "OBC1": (0.8, 0.0, 2.909125),
    "OBC2": (1.0, 0.8, 4.85),
}
GB_MODELS = ("HCT", "OBC1", "OBC2")


@dataclass(frozen=True)
class GBParams:
    """Per-atom GB parameters (from the prmtop RADII/SCREEN sections)."""

    radii: np.ndarray  # (N,) intrinsic radii rho_i, nm
    screen: np.ndarray  # (N,) HCT screening factors s_i
    model: str = "OBC2"
    solute_dielectric: float = 1.0
    solvent_dielectric: float = 78.5
    kappa: float = 0.0  # 1/nm Debye screening (implicitSolventKappa)
    include_ace: bool = True

    def __post_init__(self):
        if self.model not in GB_MODELS:
            raise ValueError(f"unknown GB model {self.model!r}; options: {GB_MODELS}")


def born_radii(positions, radii, screen, model: str):
    """Effective Born radii B_i (nm). Differentiable; O(N^2)."""
    n = radii.shape[0]
    dtype = positions.dtype
    rho = jnp.asarray(radii, dtype)
    or_ = rho - DIELECTRIC_OFFSET
    sr = jnp.asarray(screen, dtype) * or_

    dr = positions[:, None, :] - positions[None, :, :]
    r2 = jnp.sum(dr * dr, -1)
    eye = jnp.eye(n, dtype=bool)
    r = jnp.sqrt(jnp.where(eye, 1.0, r2))  # guard the i==j diagonal

    or_i = or_[:, None]
    sr_j = sr[None, :]
    # pair contributes only when the descreening sphere reaches atom i
    active = (~eye) & (or_i < r + sr_j)
    r_safe = jnp.where(active, r, 1.0)
    inv_r = 1.0 / r_safe
    L = 1.0 / jnp.maximum(or_i, jnp.abs(r_safe - sr_j))
    U = 1.0 / (r_safe + sr_j)
    L2 = L * L
    U2 = U * U
    term = (
        L
        - U
        + 0.25 * r_safe * (U2 - L2)
        + 0.5 * inv_r * jnp.log(U / L)
        + 0.25 * sr_j * sr_j * inv_r * (L2 - U2)
    )
    # atom i fully inside atom j's descreening sphere
    term = term + jnp.where(or_i < (sr_j - r_safe), 2.0 * (1.0 / or_i - L), 0.0)
    I = jnp.sum(jnp.where(active, term, 0.0), axis=1)

    if model == "HCT":
        # classic HCT: B = 1 / (1/or - I/2)
        return 1.0 / (1.0 / or_ - 0.5 * I)
    alpha, beta, gamma = OBC_COEFFS[model]
    psi = 0.5 * I * or_
    psi2 = psi * psi
    tanh_sum = jnp.tanh(alpha * psi - beta * psi2 + gamma * psi * psi2)
    return 1.0 / (1.0 / or_ - tanh_sum / rho)


def make_gb_energy(gb: GBParams, charges, alchemical_atoms=None) -> callable:
    """energy(positions, box=None, globals_=None) -> kJ/mol.

    Forces come from jax.grad through the Born radii (the exact derivative
    chain OpenMM implements by hand in its reference kernel).

    ``alchemical_atoms`` (optional index array): those atoms' charges enter
    the polarization sum scaled by the ``lambda_electrostatics`` global —
    the openmmtools GBSAOBCForce alchemical treatment (its CustomGBForce
    substitutes ``lambda_electrostatics*charge`` for alchemical particles;
    Born radii and the ACE term are charge-free and stay unmodified). At
    lambda=0 the decoupled ligand still descreens its neighbors' Born
    radii, exactly as in openmmtools."""
    q = np.asarray(charges, np.float64)
    radii = np.asarray(gb.radii, np.float64)
    screen = np.asarray(gb.screen, np.float64)
    if radii.shape != q.shape or screen.shape != q.shape:
        raise ValueError("GB radii/screen must match the charge array")
    if (radii <= DIELECTRIC_OFFSET).any():
        raise ValueError("GB radii must exceed the dielectric offset (9 pm)")
    ke = units.ONE_4PI_EPS0
    pre_in = 1.0 / gb.solute_dielectric
    pre_out = 1.0 / gb.solvent_dielectric
    model = gb.model
    kappa = float(gb.kappa)
    include_ace = bool(gb.include_ace)
    n = len(q)
    is_alch = np.zeros(n, np.float64)
    if alchemical_atoms is not None and len(np.atleast_1d(alchemical_atoms)):
        is_alch[np.asarray(alchemical_atoms, np.int64)] = 1.0
    has_alch = bool(is_alch.any())

    def energy(positions, box=None, globals_=None):
        dtype = positions.dtype
        qj = jnp.asarray(q, dtype)
        if has_alch:
            g = globals_ or {}
            lam_e = jnp.asarray(g.get("lambda_electrostatics", 1.0), dtype)
            # q_i -> lambda*q_i for alchemical atoms (openmmtools'
            # 'lambda_electrostatics*charge' per-particle substitution)
            qj = qj * (1.0 - jnp.asarray(is_alch, dtype) * (1.0 - lam_e))
        B = born_radii(positions, jnp.asarray(radii, dtype), jnp.asarray(screen, dtype), model)

        dr = positions[:, None, :] - positions[None, :, :]
        r2 = jnp.sum(dr * dr, -1)  # diagonal exactly 0 -> f_ii = B_i
        BB = B[:, None] * B[None, :]
        f2 = r2 + BB * jnp.exp(-r2 / (4.0 * BB))
        f = jnp.sqrt(f2)
        if kappa > 0.0:
            factor = pre_in - jnp.exp(-kappa * f) * pre_out
        else:
            factor = pre_in - pre_out
        qq = qj[:, None] * qj[None, :]
        e_pol = -0.5 * ke * jnp.sum(factor * qq / f)

        e_np = jnp.zeros((), dtype)
        if include_ace:
            rho = jnp.asarray(radii, dtype)
            rI = rho + PROBE_RADIUS
            ratio6 = (rho / B) ** 6
            e_np = PI4_ASOLV * jnp.sum(rI * rI * ratio6)
        return e_pol + e_np

    energy.n_atoms = n
    return energy


def gb_params_from_prmtop_sections(
    sections: dict,
    model: str = "OBC2",
    solute_dielectric: float = 1.0,
    solvent_dielectric: float = 78.5,
    kappa: float = 0.0,
) -> Optional[GBParams]:
    """Build GBParams from raw prmtop RADII/SCREEN sections (Angstrom ->
    nm). Returns None when the prmtop carries no GB sections."""
    if "RADII" not in sections or "SCREEN" not in sections:
        return None
    radii = np.asarray(sections["RADII"], np.float64) / 10.0
    screen = np.asarray(sections["SCREEN"], np.float64)
    return GBParams(
        radii=radii,
        screen=screen,
        model=model,
        solute_dielectric=solute_dielectric,
        solvent_dielectric=solvent_dielectric,
        kappa=kappa,
    )
