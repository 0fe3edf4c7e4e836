from .energy import make_energy_fn, make_force_fn
