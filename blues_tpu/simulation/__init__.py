from .driver import BLUESSimulation, SimulationConfig, IterationStats
