from .langevin import LangevinParams, make_md_step, run_md
from .constraints import make_constraint_fns
from .schedules import build_ncmc_schedule, calculate_ncmc_steps, DEFAULT_ALCHEMICAL_FUNCTIONS
from .ncmc import make_ncmc_protocol, NCMCResult, VETO_WORK
