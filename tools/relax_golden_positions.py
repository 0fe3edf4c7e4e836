"""Produce relaxed coordinates for the golden-parity fixture.

The stored reference inpcrds are clashy (TOL-parm PE ~1.9e7 kJ/mol); at a
clash the total energy is dominated by a handful of overlapping LJ pairs,
which makes a relative-error comparison meaningless for everything else.
This script FIRE-minimizes each system once and stores the relaxed
coordinates (nm, f64 values of the f32 result) in
tests/data/golden_parity_positions.npz. tools/golden_oracle.py and the
parity tests then both evaluate at these exact coordinates. Only the
*coordinates* come from the framework; every fixture energy is computed by
the independent oracle.
"""

import sys

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from blues_tpu.core.amber_coords import load_inpcrd  # noqa: E402
from blues_tpu.core.prmtop import load_prmtop  # noqa: E402
from blues_tpu.integrators.minimize import minimize_fire  # noqa: E402
from blues_tpu.potentials.energy import make_energy_fn, make_force_fn  # noqa: E402

DATA = "/root/reference/blues/tests/data"
SYSTEMS = {
    "vacDivaline": dict(inpcrd="vacDivaline.inpcrd", periodic=False),
    "TOL-parm": dict(inpcrd="TOL-parm.inpcrd", periodic=True),
    "watDivaline": dict(inpcrd="watDivaline.inpcrd", periodic=True),
}


def main(out="tests/data/golden_parity_positions.npz"):
    arrays = {}
    for name, spec in SYSTEMS.items():
        system = load_prmtop(f"{DATA}/{name}.prmtop", constraints="None")
        crd = load_inpcrd(f"{DATA}/{spec['inpcrd']}")
        if spec["periodic"]:
            system = system.replace(box=crd.box)
            efn = make_energy_fn(system, nonbonded_method="PME", cutoff=0.9)
            box = jnp.asarray(crd.box, jnp.float32)
        else:
            efn = make_energy_fn(system, nonbonded_method="NoCutoff")
            box = None
        ffn = make_force_fn(efn)
        run = jax.jit(
            lambda x, box=box: minimize_fire(ffn, system.masses, x, box, n_steps=1500)
        )
        x, e = run(jnp.asarray(crd.positions, jnp.float32))
        arrays[name] = np.asarray(x, np.float64)
        if box is not None:
            arrays[name + "_box"] = np.asarray(crd.box, np.float64)
        print(f"{name}: relaxed PE {float(e):.2f} kJ/mol", file=sys.stderr)
    np.savez(out, **arrays)
    print(f"wrote {out}", file=sys.stderr)


if __name__ == "__main__":
    main(*sys.argv[1:])
