from .state import SimState, KahanAccumulator, maxwell_boltzmann_velocities
from .system import (
    System, Topology, HarmonicBonds, HarmonicAngles, PeriodicTorsions,
    NonbondedParams, CustomPairForce, CentroidRestraint, PositionRestraints,
    Constraints, AlchemicalRegion,
)
