"""Shared per-pair nonbonded math (energy + radial force factor).

One set of formulas used by three backends so they agree bit-for-bit in
structure: the dense jnp path (small systems / tests), the scan-tiled jnp
path (large systems on CPU, correctness reference), and the Pallas TPU
kernel (production). Also used to *subtract* excluded-pair contributions
outside the kernels.

Electrostatics decomposition: with q_std = charges with alchemical atoms
zeroed (direct-space treatment) or lambda-scaled ('exact'), and
q_alch = charges on alchemical atoms only, every pair product is

    qq = qs_i qs_j  +  f_na (qs_i qa_j + qa_i qs_j)  +  f_aa qa_i qa_j

where (f_na, f_aa) are the lambda factors for non-alchemical x alchemical
and alchemical x alchemical pairs. Sterics: the softcore form evaluated at
lambda=1 *is* plain LJ, so per-pair effective lambda
lam_eff = scale ? lam_sterics : 1 removes all branching
(softcore defaults: reference blues/simulation.py:225-237).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from .. import units

SQRT_PI = math.sqrt(math.pi)


def erfc_approx(x):
    """erfc for x >= 0, Abramowitz & Stegun 7.1.26 (|err| <= 1.5e-7).

    Used instead of jax.lax.erfc so the identical formula lowers inside
    Pallas TPU kernels (erfc has no Mosaic lowering) and all three nonbonded
    backends agree bit-for-bit in structure. The 1.5e-7 absolute error is at
    the f32 rounding floor.
    """
    t = 1.0 / (1.0 + 0.3275911 * x)
    poly = t * (
        0.254829592
        + t * (-0.284496736 + t * (1.421413741 + t * (-1.453152027 + t * 1.061405429)))
    )
    return poly * jnp.exp(-x * x)


def softcore_lj(r2, sigma, epsilon, lam_eff, alpha=0.5):
    """Returns (energy, g) for softcore LJ with a=b=1, c=6.

    g = (dU/dr)/r, so the force on atom i is F_i = -g * dr_vec.
    """
    s2 = sigma * sigma
    s6 = s2 * s2 * s2
    r6 = r2 * r2 * r2
    reff6 = alpha * (1.0 - lam_eff) * s6 + r6
    inv_reff6 = 1.0 / reff6
    x = s6 * inv_reff6
    e = 4.0 * epsilon * lam_eff * (x * x - x)
    # dU/dr / r = -24 eps lam (2x - 1) s6 r^4 / reff6^2
    g = -24.0 * epsilon * lam_eff * (2.0 * x - 1.0) * x * inv_reff6 * r2 * r2
    return e, g


def coulomb_erfc(r2, qq, alpha_ewald):
    """Returns (energy, g) for ke*qq*erfc(alpha r)/r.

    Written around one rsqrt (hardware op) instead of sqrt + divides, and
    the erfc exponential reused for the force's Gaussian term.

    Precision branch (static at trace time): f32 — the TPU production
    dtype — uses the inline A&S 7.1.26 approximation (1.5e-7 abs, at the
    f32 rounding floor) because lax.erfc has no Mosaic lowering inside
    Pallas kernels; f64 — golden-parity / oracle-replay runs — uses the
    exact lax.erfc so the approximation never limits <=1e-4 force pins."""
    inv_r = jax.lax.rsqrt(r2)
    r = r2 * inv_r
    x = alpha_ewald * r
    gauss_exp = jnp.exp(-x * x)
    if jnp.result_type(r2) == jnp.float64:
        erfc_term = jax.lax.erfc(x)
    else:
        # A&S 7.1.26 inline so exp(-x^2) is shared with the force term
        t = 1.0 / (1.0 + 0.3275911 * x)
        poly = t * (
            0.254829592
            + t * (-0.284496736 + t * (1.421413741 + t * (-1.453152027 + t * 1.061405429)))
        )
        erfc_term = poly * gauss_exp
    e = units.ONE_4PI_EPS0 * qq * erfc_term * inv_r
    g = -(e + units.ONE_4PI_EPS0 * qq * (2.0 * alpha_ewald / SQRT_PI) * gauss_exp) * inv_r * inv_r
    return e, g


def coulomb_rf(r2, qq, k_rf, c_rf):
    """Reaction field: ke*qq*(1/r + k_rf r^2 - c_rf)."""
    inv_r = jax.lax.rsqrt(r2)
    r = r2 * inv_r
    e = units.ONE_4PI_EPS0 * qq * (inv_r + k_rf * r2 - c_rf)
    g = units.ONE_4PI_EPS0 * qq * (-inv_r * inv_r * inv_r + 2.0 * k_rf)
    return e, g


def coulomb_plain(r2, qq):
    inv_r = jax.lax.rsqrt(r2)
    e = units.ONE_4PI_EPS0 * qq * inv_r
    g = -e * inv_r * inv_r
    return e, g


def lj_switch(r2, cutoff, switch_distance):
    """OpenMM's LJ switching function S(r) and dS/dr on [rs, rc]:
    S = 1 - 10 t^3 + 15 t^4 - 6 t^5, t = (r - rs)/(rc - rs)
    (useSwitchingFunction/switchDistance createSystem kwargs the reference
    forwards, blues/simulation.py:139-219)."""
    inv_r = jax.lax.rsqrt(r2)
    r = r2 * inv_r
    width = cutoff - switch_distance
    t = jnp.clip((r - switch_distance) / width, 0.0, 1.0)
    s = 1.0 + t * t * t * (-10.0 + t * (15.0 - 6.0 * t))
    ds_dr = t * t * (-30.0 + t * (60.0 - 30.0 * t)) / width
    return s, ds_dr, inv_r


def pair_energy_force(
    r2,
    sig,
    eps,
    qq_std,
    qq_na,
    qq_aa,
    scale_ster,
    *,
    lam_sterics,
    f_na,
    f_aa,
    method: str,
    alpha_ewald: float = 0.0,
    k_rf: float = 0.0,
    c_rf: float = 0.0,
    softcore_alpha: float = 0.5,
    switch_distance: float = None,
    cutoff: float = 0.0,
    alch_coulomb: bool = False,
):
    """Full pair term on broadcastable arrays. Returns (e, g).

    alch_coulomb: openmmtools' 'coulomb' alchemical PME treatment — the
    alchemical pairs (qq_na / qq_aa) use the plain 1/r Coulomb kernel in
    direct space instead of the Ewald erfc attenuation (their charges are
    removed from the reciprocal sum exactly as in 'direct-space')."""
    lam_eff = jnp.where(scale_ster, lam_sterics, 1.0)
    e_lj, g_lj = softcore_lj(r2, sig, eps, lam_eff, softcore_alpha)
    if switch_distance is not None:
        # switching applies to the LJ term only (OpenMM convention);
        # U_sw = S U, so (dU_sw/dr)/r = S g + (dS/dr) U / r
        s, ds_dr, inv_r = lj_switch(r2, cutoff, switch_distance)
        g_lj = s * g_lj + ds_dr * e_lj * inv_r
        e_lj = s * e_lj
    if alch_coulomb and method == "PME":
        qq_alch = f_na * qq_na + f_aa * qq_aa
        e_el, g_el = coulomb_erfc(r2, qq_std, alpha_ewald)
        e_a, g_a = coulomb_plain(r2, qq_alch)
        if switch_distance is not None:
            # unlike erfc (negligible at the cutoff by construction), bare
            # 1/r is O(1 kJ/mol) at the cutoff — hard truncation would leak
            # energy/force discontinuities into the NCMC work stream, so the
            # 'coulomb' treatment's alchemical pairs are switched like LJ
            s, ds_dr, inv_r = lj_switch(r2, cutoff, switch_distance)
            g_a = s * g_a + ds_dr * e_a * inv_r
            e_a = s * e_a
        e_el, g_el = e_el + e_a, g_el + g_a
        return e_lj + e_el, g_lj + g_el
    qq = qq_std + f_na * qq_na + f_aa * qq_aa
    if method == "PME":
        e_el, g_el = coulomb_erfc(r2, qq, alpha_ewald)
    elif method in ("CutoffPeriodic", "CutoffNonPeriodic"):
        e_el, g_el = coulomb_rf(r2, qq, k_rf, c_rf)
    else:
        e_el, g_el = coulomb_plain(r2, qq)
    return e_lj + e_el, g_lj + g_el
