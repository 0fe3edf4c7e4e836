"""blues_tpu: a TPU-native enhanced-sampling (MD + NCMC) framework.

Brand-new implementation of the capabilities of MobleyLab/blues on
JAX/XLA/Pallas. See SURVEY.md for the structural map of the reference and
docs/parity.md for the component-by-component equivalence table.
"""

__version__ = "0.1.0"

from . import units  # noqa: F401


def __getattr__(name):
    # lazy imports keep `import blues_tpu` light
    if name in ("BLUESSimulation", "SimulationConfig", "MonteCarloSimulation"):
        from . import simulation

        return getattr(simulation, name)
    if name in ("MoveEngine", "RandomLigandRotationMove", "WaterTranslationMove",
                "SideChainMove", "SmartDartMove", "MolDartMove", "CombinationMove",
                "NullMove", "Move"):
        from . import moves

        return getattr(moves, name)
    if name in ("Settings", "create_simulation"):
        from . import config

        return getattr(config, name)
    if name == "load_prmtop":
        from .core.prmtop import load_prmtop

        return load_prmtop
    if name == "load_inpcrd":
        from .core.amber_coords import load_inpcrd

        return load_inpcrd
    raise AttributeError(name)
