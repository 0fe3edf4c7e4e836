"""Unit system and physical constants.

The framework uses the OpenMM "MD unit system" internally everywhere:
length = nanometer, time = picosecond, mass = dalton (g/mol),
energy = kJ/mol, temperature = kelvin, charge = elementary charge.

This module replaces the reference's `simtk.unit` quantity strings
(reference: blues/utils.py:180-199 `parse_unit_quantity`) with a tiny
conversion table: quantities are parsed once at config time into plain
floats in MD units; no unit objects ever reach the compute path.
"""

from __future__ import annotations

import re

# --- Physical constants (CODATA 2018, matching OpenMM) -----------------------
#: Boltzmann constant * Avogadro, kJ/(mol*K)
BOLTZMANN_KJMOL = 8.31446261815324e-3
#: Coulomb constant 1/(4 pi eps0) in kJ*nm/(mol*e^2) (OpenMM ONE_4PI_EPS0)
ONE_4PI_EPS0 = 138.93545764438198
#: Avogadro's number, 1/mol
AVOGADRO = 6.02214076e23
#: 1 bar in kJ/(mol*nm^3) -- used for the PV term in the MC barostat
BAR_TO_KJMOL_PER_NM3 = 1.0e5 * 1e-27 * AVOGADRO / 1000.0  # = 0.0602214076

#: Amber prmtop charges are stored multiplied by 18.2223 = sqrt(kcal*A/mol/e^2)
AMBER_CHARGE_SCALE = 18.2223
KCAL_TO_KJ = 4.184


def kT(temperature: float) -> float:
    """Thermal energy kT in kJ/mol for a temperature in kelvin."""
    return BOLTZMANN_KJMOL * temperature


# --- Quantity-string parsing --------------------------------------------------
# Conversion factors of "unit name" -> (factor to MD units, dimension tag).
_UNIT_TABLE = {
    # length -> nm
    "nanometer": (1.0, "length"),
    "nanometers": (1.0, "length"),
    "angstrom": (0.1, "length"),
    "angstroms": (0.1, "length"),
    # time -> ps
    "picosecond": (1.0, "time"),
    "picoseconds": (1.0, "time"),
    "femtosecond": (1e-3, "time"),
    "femtoseconds": (1e-3, "time"),
    "nanosecond": (1e3, "time"),
    "nanoseconds": (1e3, "time"),
    # inverse time -> 1/ps
    "/picosecond": (1.0, "rate"),
    "/picoseconds": (1.0, "rate"),
    # temperature
    "kelvin": (1.0, "temperature"),
    # mass
    "dalton": (1.0, "mass"),
    "daltons": (1.0, "mass"),
    "amu": (1.0, "mass"),
    # energy
    "kilojoule_per_mole": (1.0, "energy"),
    "kilojoules_per_mole": (1.0, "energy"),
    "kilocalorie_per_mole": (KCAL_TO_KJ, "energy"),
    "kilocalories_per_mole": (KCAL_TO_KJ, "energy"),
    # pressure -> kJ/(mol*nm^3) via bar
    "bar": (BAR_TO_KJMOL_PER_NM3, "pressure"),
    "atmosphere": (1.01325 * BAR_TO_KJMOL_PER_NM3, "pressure"),
    "atmospheres": (1.01325 * BAR_TO_KJMOL_PER_NM3, "pressure"),
}

#: Default unit applied to bare numbers per config key, mirroring the
#: reference's per-key default table (blues/settings.py:152-187).
DEFAULT_UNITS = {
    "dt": "picoseconds",
    "friction": "/picosecond",
    "temperature": "kelvin",
    "pressure": "bar",
    "hydrogenMass": "daltons",
    "nonbondedCutoff": "angstroms",
    "switchDistance": "angstroms",
    "cutoff": "angstroms",
    "freeze_distance": "angstroms",
    "weight": "kilocalories_per_mole",  # restraint weight per A^2 handled at use site
    "radius": "angstroms",
}


def parse_quantity(value, default_unit: str | None = None) -> float:
    """Parse a quantity into a plain float in MD units.

    Accepts floats/ints (interpreted via ``default_unit`` if given) or strings
    like ``'10 * angstroms'``, ``'0.004 * picoseconds'``, ``'1/picosecond'``,
    ``'300*kelvin'`` (reference format: blues/utils.py:180-199).
    """
    if isinstance(value, (int, float)):
        if default_unit is None:
            return float(value)
        factor, _ = _UNIT_TABLE[default_unit]
        return float(value) * factor
    if not isinstance(value, str):
        raise TypeError(f"cannot parse quantity from {type(value)}")

    s = value.strip()
    # normalize '1 * 1/picoseconds' (reference friction format,
    # examples/rotmove_cuda.yml:54) to '1 / picoseconds'
    s = re.sub(r"\*\s*1\s*/", "/", s)
    m = re.match(r"^([-+0-9.eE]+)\s*([*/])\s*([A-Za-z_/]+)$", s)
    if m is None:
        # bare number as a string
        try:
            num = float(s)
        except ValueError:
            raise ValueError(f"cannot parse quantity string {value!r}") from None
        return parse_quantity(num, default_unit)
    num, op, unit_name = float(m.group(1)), m.group(2), m.group(3)
    unit_name = unit_name.strip()
    if op == "/":
        key = "/" + unit_name
        if key in _UNIT_TABLE:
            return num * _UNIT_TABLE[key][0]
        # e.g. '1/picoseconds'
        factor, _ = _UNIT_TABLE[unit_name]
        return num / factor
    factor, _ = _UNIT_TABLE[unit_name]
    return num * factor
