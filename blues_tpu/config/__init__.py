from .settings import Settings, create_simulation, load_structure
