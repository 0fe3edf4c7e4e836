"""Compose a System into a single differentiable energy function.

This is the keystone design decision of the rebuild (SURVEY.md section 7.1):
one `energy_fn(positions, box, globals) -> E` per system, with forces from
`jax.value_and_grad`. It subsumes the reference's three separate OpenMM
Contexts (md / alch / ncmc, reference: blues/simulation.py:788-809): the
"alchemical system" is the same function evaluated with lambda globals != 1,
and the alchemical-correction energies (blues/simulation.py:1100-1119) are
just extra evaluations.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.system import System
from . import bonded
from .custom_pair import make_custom_pair_energy
from .nonbonded import NO_CUTOFF, make_nonbonded_energy


def make_energy_fn(
    system: System,
    *,
    nonbonded_method: str = NO_CUTOFF,
    cutoff: float = 1.0,
    alchemical_pme_treatment: str = "direct-space",
    ewald_tolerance: float = 5e-4,
    rf_dielectric: float = 78.3,
    use_pallas: Optional[bool] = None,
    nonbonded_backend: str = "auto",
    dispersion_correction: bool = True,
    switch_distance: float = None,
    frozen_cull_skin: float = 0.45,
    frozen_cull_cage_margin: float = 1.0,
    sweep_row_group: Optional[int] = None,
) -> Callable:
    """Build energy_fn(positions, box=None, globals_=None) -> scalar kJ/mol."""
    terms = []

    if len(system.bonds):
        terms.append(lambda x, box, g: bonded.bond_energy(x, system.bonds, box))
    if len(system.angles):
        terms.append(lambda x, box, g: bonded.angle_energy(x, system.angles, box))
    if len(system.torsions):
        terms.append(lambda x, box, g: bonded.torsion_energy(x, system.torsions, box))
    if system.position_restraints is not None:
        terms.append(
            lambda x, box, g: bonded.position_restraint_energy(
                x, system.position_restraints, box
            )
        )
    for rest in system.centroid_restraints:
        terms.append(
            lambda x, box, g, _r=rest: bonded.centroid_restraint_energy(x, _r, box)
        )
    for cp in system.custom_pairs:
        fn = make_custom_pair_energy(cp)
        terms.append(lambda x, box, g, _f=fn: _f(x, box, g))
    bonded_terms = list(terms)

    # generalized-Born implicit solvent (potentials/gb.py; the reference's
    # `implicitSolvent` config, blues/settings.py:205-230). Without an
    # alchemical region the term is lambda-independent and joins
    # bonded_terms (-> cached in the lambda-split E0); with one, its
    # polarization sum reads lambda_electrostatics (openmmtools GBSAOBC
    # treatment), so the lambda split is disabled below.
    gb_alch_atoms = None
    if system.gb is not None:
        if nonbonded_method != NO_CUTOFF:
            # OpenMM's GBSAOBCForce honors CutoffNonPeriodic with a
            # 1/f - 1/rcut shifted polarization sum; this GB term is
            # infinite-range only, so anything but NoCutoff would silently
            # run different physics than the reference — reject loudly
            raise ValueError(
                "implicit solvent (GB) is implemented for nonbonded_method "
                f"'NoCutoff' only, got {nonbonded_method!r} (the truncated "
                "GBSAOBC variant is not implemented; OpenMM createSystem "
                "rejects GB + periodic methods too)"
            )
        from .gb import make_gb_energy

        if system.alchemical is not None and len(system.alchemical.atoms):
            gb_alch_atoms = system.alchemical.atoms
        gb_fn = make_gb_energy(
            system.gb, system.nonbonded.charge, alchemical_atoms=gb_alch_atoms
        )
        gb_term = lambda x, box, g, _f=gb_fn: _f(x, box, g)
        terms.append(gb_term)
        if gb_alch_atoms is None:
            bonded_terms.append(gb_term)
    nb_fn = None
    if system.nonbonded is not None:
        nb_fn = make_nonbonded_energy(
            system.nonbonded,
            method=nonbonded_method,
            cutoff=cutoff,
            alchemical=system.alchemical,
            alchemical_pme_treatment=alchemical_pme_treatment,
            ewald_tolerance=ewald_tolerance,
            rf_dielectric=rf_dielectric,
            box_for_pme=system.box,
            use_pallas=bool(use_pallas),
            backend=nonbonded_backend,
            masses=system.masses,
            frozen_ref_positions=system.frozen_ref_positions,
            dispersion_correction=dispersion_correction,
            switch_distance=switch_distance,
            frozen_cull_skin=frozen_cull_skin,
            frozen_cull_cage_margin=frozen_cull_cage_margin,
            sweep_row_group=sweep_row_group,
            # the cull bond graph needs CONSTRAINED bonds too (H bonds are
            # constraints, not harmonic bonds — without them every H is a
            # spurious singleton "free fragment")
            bonds_for_cull=(
                np.concatenate(
                    [np.asarray(e.idx).reshape(-1, 2) for e in (system.bonds, system.constraints) if len(e)]
                )
                if (len(system.bonds) or len(system.constraints))
                else None
            ),
        )
        terms.append(lambda x, box, g: nb_fn(x, box, g))

    def energy_fn(positions, box=None, globals_=None):
        e = jnp.zeros((), positions.dtype)
        for t in terms:
            e = e + t(positions, box, globals_)
        return e

    # neighbor-list hooks (verlet backend): MD drivers build a list every
    # `rebuild_interval` steps and evaluate E+F against it — autodiffed
    # bonded/corrections/PME forces plus the list kernel's analytic pair
    # forces (potentials/verlet.py)
    pair_sum = getattr(nb_fn, "pair_sum", None)
    if pair_sum is not None and hasattr(pair_sum, "build"):

        def rest_energy(positions, box=None, globals_=None):
            e = nb_fn.rest(positions, box, globals_)
            for t in bonded_terms:
                e = e + t(positions, box, globals_)
            return e

        rest_vg = jax.value_and_grad(rest_energy)

        def force_with_nlist(nlist, positions, box=None, globals_=None):
            e_r, g_r = rest_vg(positions, box, globals_)
            lam = nb_fn.pair_factors(globals_, positions.dtype)
            e_p, f_p = pair_sum.apply(nlist, positions, box, *lam)
            return e_r + e_p, f_p - g_r

        energy_fn.nlist_build = pair_sum.build
        energy_fn.force_with_nlist = force_with_nlist
        energy_fn.nlist_skin = pair_sum.skin
    energy_fn.nonbonded = nb_fn

    # lambda-split (NCMC accelerator): E(x, lam) = E0(x) + Ea(x, lam) with
    # every lambda-independent term — including ALL bonded terms — in E0.
    # Disabled when custom pair potentials exist (they may read lambda
    # globals, e.g. the ethylene test force). See potentials/nonbonded.py.
    if (
        nb_fn is not None
        and getattr(nb_fn, "lambda_e0", None) is not None
        and not system.custom_pairs
        and gb_alch_atoms is None
    ):

        def _e0_total(positions, box=None):
            e = nb_fn.lambda_e0(positions, box)
            for t in bonded_terms:
                e = e + t(positions, box, None)
            return e

        _e0_vg = jax.value_and_grad(_e0_total)
        _ea_vg = jax.value_and_grad(nb_fn.lambda_ea)

        def lambda_e0_f0(positions, box=None):
            e, g = _e0_vg(positions, box)
            return e, -g

        def lambda_ea_fa(positions, box=None, globals_=None):
            e, g = _ea_vg(positions, box, globals_)
            return e, -g

        energy_fn.lambda_e0_f0 = lambda_e0_f0
        energy_fn.lambda_ea_fa = lambda_ea_fa
    return energy_fn


def make_force_fn(energy_fn: Callable) -> Callable:
    """fn(x, box, globals) -> (E, F) with F = -dE/dx."""

    grad_fn = jax.value_and_grad(energy_fn)

    def force_fn(positions, box=None, globals_=None):
        e, g = grad_fn(positions, box, globals_)
        return e, -g

    return force_fn
