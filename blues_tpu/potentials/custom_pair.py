"""Expression-defined pair interactions (CustomNonbondedForce equivalent).

The reference's ethylene regression system defines its nonbonded term as an
OpenMM CustomNonbondedForce with interaction groups and lambda-scaled
parameters (reference: blues/tests/data/ethylene_system.xml:52-93). OpenMM
compiles the energy string with Lepton (C++); here the same string is
compiled by `core.expressions` into a JAX function evaluated over the dense
group-a x group-b pair block — small interaction groups map to one fused VPU
loop, and forces come from `jax.grad` of the (differentiable) expression.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..core.expressions import compile_expression
from ..core.system import CustomPairForce
from .geometry import distance, periodic_displacement


def make_custom_pair_energy(force: CustomPairForce):
    """Compile a CustomPairForce into fn(positions, box, globals) -> energy."""
    expr = compile_expression(force.energy)
    names = force.per_particle_names
    params = np.asarray(force.per_particle, dtype=np.float64)
    ga = np.asarray(force.group_a, dtype=np.int32)
    gb = np.asarray(force.group_b, dtype=np.int32)
    pa = params[ga]  # (Ga, P)
    pb = params[gb]  # (Gb, P)
    defaults = dict(force.globals_defaults)
    cutoff = force.cutoff

    def energy(positions, box=None, globals_=None):
        dtype = positions.dtype
        env = {}
        for g, dv in defaults.items():
            v = None if globals_ is None else globals_.get(g)
            env[g] = jnp.asarray(dv if v is None else v, dtype)
        xa = positions[ga]  # (Ga, 3)
        xb = positions[gb]  # (Gb, 3)
        dr = xa[:, None, :] - xb[None, :, :]
        if force.uses_periodic and box is not None:
            dr = periodic_displacement(dr, box)
        r = distance(dr)
        env["r"] = r
        for p, name in enumerate(names):
            env[name + "1"] = jnp.asarray(pa[:, p], dtype)[:, None]
            env[name + "2"] = jnp.asarray(pb[:, p], dtype)[None, :]
        e = expr(env)
        # mask out self-pairs if the groups overlap
        overlap = (ga[:, None] == gb[None, :])
        if overlap.any():
            e = jnp.where(jnp.asarray(overlap), 0.0, e)
        if cutoff is not None:
            e = jnp.where(r < cutoff, e, 0.0)
        return jnp.sum(e)

    return energy
