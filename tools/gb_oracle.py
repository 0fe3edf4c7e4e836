"""Independent f64 oracle for the GB (HCT/OBC) implicit-solvent term.

Deliberately written as explicit per-atom loops straight from the published
equations (OBC paper Proteins 55:383 (2004) Eqs. 3-8 + the HCT pairwise
descreening integral, and the ACE surface-area approximation) — structured
NOTHING like the vectorized jnp implementation in blues_tpu/potentials/gb.py
so a transcription error in one does not hide in the other. Used by
tests/test_gb.py; OpenMM itself is not installable here, so this oracle is
the strongest available pin (equation-level).

Run standalone for a quick printout:
    PYTHONPATH=/root/repo python tools/gb_oracle.py <prmtop> [model]
"""

import math
import sys

import numpy as np

# kJ mol^-1 nm e^-2: e^2 N_A / (4 pi eps0) from CODATA constants, derived
# here independently of blues_tpu.units (which computes the same value)
_E = 1.602176634e-19  # C
_NA = 6.02214076e23
_EPS0 = 8.8541878128e-12  # F/m
KE = _E * _E * _NA / (4.0 * math.pi * _EPS0) * 1e6  # J m -> kJ nm per mol
OFFSET = 0.009
PROBE = 0.14
PI4ASOLV = 28.3919551


def oracle_born_radii(x, rho, screen, model="OBC2"):
    n = len(rho)
    B = np.zeros(n)
    for i in range(n):
        oi = rho[i] - OFFSET
        integral = 0.0
        for j in range(n):
            if j == i:
                continue
            r = math.sqrt(((x[i] - x[j]) ** 2).sum())
            sj = screen[j] * (rho[j] - OFFSET)
            if oi >= r + sj:
                continue  # atom j's sphere never descreens atom i
            lower = max(oi, abs(r - sj))
            upper = r + sj
            term = (
                1.0 / lower
                - 1.0 / upper
                + (r / 4.0) * (1.0 / upper**2 - 1.0 / lower**2)
                + (1.0 / (2.0 * r)) * math.log(lower / upper)
                + (sj * sj / (4.0 * r)) * (1.0 / lower**2 - 1.0 / upper**2)
            )
            if oi < sj - r:
                term += 2.0 * (1.0 / oi - 1.0 / lower)
            integral += term
        if model == "HCT":
            B[i] = 1.0 / (1.0 / oi - 0.5 * integral)
        else:
            a, b, g = (0.8, 0.0, 2.909125) if model == "OBC1" else (1.0, 0.8, 4.85)
            psi = 0.5 * integral * oi
            t = math.tanh(a * psi - b * psi * psi + g * psi**3)
            B[i] = 1.0 / (1.0 / oi - t / rho[i])
    return B


def oracle_gb_energy(
    x, q, rho, screen, model="OBC2",
    eps_in=1.0, eps_out=78.5, kappa=0.0, ace=True,
):
    n = len(q)
    B = oracle_born_radii(x, rho, screen, model)
    e = 0.0
    for i in range(n):
        for j in range(n):
            r2 = float(((x[i] - x[j]) ** 2).sum())
            bb = B[i] * B[j]
            f = math.sqrt(r2 + bb * math.exp(-r2 / (4.0 * bb)))
            if kappa > 0.0:
                factor = 1.0 / eps_in - math.exp(-kappa * f) / eps_out
            else:
                factor = 1.0 / eps_in - 1.0 / eps_out
            e += -0.5 * KE * factor * q[i] * q[j] / f
    if ace:
        for i in range(n):
            e += PI4ASOLV * (rho[i] + PROBE) ** 2 * (rho[i] / B[i]) ** 6
    return e, B


def main():
    from blues_tpu.core.prmtop import Prmtop
    from blues_tpu import units as u

    path = sys.argv[1]
    model = sys.argv[2] if len(sys.argv) > 2 else "OBC2"
    top = Prmtop.load(path)
    s = top.sections
    q = np.asarray(s["CHARGE"]) / u.AMBER_CHARGE_SCALE
    rho = np.asarray(s["RADII"]) / 10.0
    screen = np.asarray(s["SCREEN"])
    import blues_tpu.core.amber_coords as ac

    crd = ac.load_inpcrd(path.replace(".prmtop", ".inpcrd"))
    e, B = oracle_gb_energy(np.asarray(crd.positions), q, rho, screen, model)
    print(f"{model} GB energy: {e:.6f} kJ/mol; Born radii "
          f"[{B.min():.4f}, {B.max():.4f}] nm over {len(B)} atoms")


if __name__ == "__main__":
    main()
