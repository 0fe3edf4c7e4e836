from .driver import BLUESSimulation, SimulationConfig, IterationStats
from .montecarlo import MonteCarloSimulation, MCStats
