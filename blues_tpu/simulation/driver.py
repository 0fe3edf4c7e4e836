"""The hybrid MD <-> NCMC <-> Metropolis driver.

TPU-native equivalent of the reference BLUESSimulation
(reference: blues/simulation.py:812-1257). Where the reference crosses the
Python/device boundary >= 2*nstepsNC + nstepsMD times per iteration
(SURVEY.md 3.2), here one *entire iteration* — state sync, the NCMC
switching scan with the midpoint move, the alchemical correction, the
Metropolis accept/reject, velocity resampling, and the MD relaxation scan —
is a single jitted function, optionally vmapped over independent replicas.

Acceptance criterion (reference blues/simulation.py:1121-1166 +
blues/integrators.py:233-238):

    log_accept = -(protocol_work)/kT + correction      > log U(0,1)
    correction = -[(E_alchpot(x0) - E_mdpot(x0))
                   + (E_mdpot(x1) - E_alchpot(x1))]/kT

The correction accounts for the alchemical potential at full lambda
differing from the MD potential (direct-space PME treatment); with the
'exact' treatment it is identically zero. NaN work or correction forces
rejection (reference blues/simulation.py:1134).
"""

from __future__ import annotations

import logging
import time
from dataclasses import dataclass, field
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .. import units
from ..core.state import SimState, maxwell_boltzmann_velocities, pytree_dataclass
from ..core.system import System
from ..integrators.constraints import make_constraint_fns
from ..integrators.langevin import LangevinParams, make_md_step
from ..integrators.ncmc import make_ncmc_protocol, make_ncmc_protocol_staged
from ..integrators.schedules import (
    build_ncmc_schedule,
    calculate_ncmc_steps,
    resolve_frame_indices,
)
from ..potentials.energy import make_energy_fn, make_force_fn

logger = logging.getLogger("blues_tpu.simulation")


@dataclass
class SimulationConfig:
    nIter: int = 100
    nstepsNC: int = 100
    nstepsMD: int = 100
    temperature: float = 300.0  # K
    dt: float = 0.002  # ps
    friction: float = 1.0  # 1/ps
    nprop: int = 1
    propLambda: float = 0.3
    moveStep: Optional[int] = None  # default nstepsNC // 2
    splitting: str = "H V R O R V H"
    alchemical_functions: Optional[dict] = None
    nonbonded_method: str = "NoCutoff"
    cutoff: float = 1.0  # nm
    switch_distance: Optional[float] = None  # nm; LJ switching (OpenMM S(r))
    ewald_tolerance: float = 5e-4
    alchemical_pme_treatment: str = "direct-space"
    md_report_interval: Optional[int] = None  # collect MD frames every k steps
    pressure: Optional[float] = None  # bar; None = NVT (barostat on MD only)
    barostat_frequency: int = 25
    n_replicas: int = 1
    constraint_tolerance: float = 1e-6
    use_pallas: Optional[bool] = None
    nonbonded_backend: str = "auto"
    #: frozen-system pair-kernel column culling skin (nm); None disables.
    #: See potentials.nonbonded.make_nonbonded_energy(frozen_cull_skin=...).
    frozen_cull_skin: Optional[float] = 0.45
    #: per-row-GROUP column culling for the sweep backend: Morton groups of
    #: this many mobile rows each get their own culled column set (~2x
    #: fewer pair slots at the production flagship). None/0 = one shared
    #: column set (see pallas/sweep_kernel.build_row_groups).
    sweep_row_group: Optional[int] = None
    #: MD steps between neighbor-list rebuilds (verlet backend only). The
    #: staleness guard poisons to NaN if the skin is outrun, so a too-long
    #: interval rolls the segment back instead of sampling wrong physics.
    nlist_rebuild_interval: int = 10
    #: NCMC snapshot schedule in integrator-step units, with the reference's
    #: sentinels (0.5 -> moveStep, -1 -> last step; blues/settings.py:271-277).
    #: None = the default (0, moveStep, nstepsNC) protocol start/mid/end.
    ncmc_frame_indices: Optional[tuple] = None
    #: E(x, lam) = E0(x) + Ea(x, lam) micro-step caching (~2x on frozen
    #: production protocols; integrators/ncmc.py). None = auto when the
    #: energy function exposes the decomposition; False disables.
    lambda_split: Optional[bool] = None
    #: bound the work per device dispatch: when set, each iteration runs as
    #: a host-driven sequence of jitted calls (NCMC protocol segments of
    #: <= this many micro-steps, MD chunks of <= this many steps) with the
    #: state left on device between calls, instead of one monolithic
    #: execution. The remote-TPU execution tunnel kills single executions
    #: past ~1 minute: 64 replicas x 10k-step production protocols fault
    #: with 'UNAVAILABLE: TPU device error' monolithically
    #: (tools/probe_driver_scale.py) but run segmented. Identical math and
    #: RNG stream to the monolithic path (tests/test_segmented_driver.py).
    #: Unsupported with pressure (NPT) or md_report_interval frames.
    max_steps_per_dispatch: Optional[int] = None
    #: mobile-state compaction for frozen systems (simulation/compact.py):
    #: the NCMC/MD dynamics runs on (n_mobile, 3) arrays; the full array is
    #: reconstructed once per force eval from the frozen reference frame.
    #: "auto" = compact whenever eligible (frozen refs present, no
    #: boundary-straddling constraints, non-teleporting remappable move,
    #: no barostat/verlet); False disables; True requires (raises when
    #: ineligible). Identical physics through the same composed energy
    #: function; the dynamics RNG stream differs from the full-array path
    #: (noise is drawn per mobile atom, not per atom).
    frozen_compact: object = "auto"
    #: fault injection for the failure-recovery path (testing only):
    #: probability per replica-iteration of poisoning the post-MD positions
    #: to NaN, forcing the md_ok rollback. Lets tests PROVE the rollback
    #: leaves the sampled ensemble unbiased (tests/test_md_rollback_ensemble
    #: reproduces the ethylene [0.25, 0.75] gate under ~30% forced
    #: rollbacks) without contriving an unstable protocol.
    md_fault_injection: float = 0.0


@pytree_dataclass
class IterationStats:
    accepted: jax.Array
    protocol_work: jax.Array  # kJ/mol
    correction: jax.Array  # dimensionless (units of kT)
    log_accept: jax.Array
    md_potential: jax.Array  # kJ/mol at iteration end
    ncmc_potential: jax.Array  # alchemical potential at protocol end
    mid_work: jax.Array  # protocol work accumulated at the midpoint move
    selected_move: jax.Array  # index of the move chosen this iteration
    #: MD relaxation produced a non-finite energy and was rolled back (the
    #: recoverable analog of the reference's dump-frame-and-exit,
    #: blues/simulation.py:1203-1213)
    md_failed: jax.Array = None


class NCMCFrames(NamedTuple):
    """NCMC snapshot frames + the protocol work at each snapshot. Frame
    lambdas are static: BLUESSimulation.ncmc_frame_lambdas."""

    positions: jax.Array  # (K, N, 3)
    work: jax.Array  # (K,) kJ/mol


class BLUESSimulation:
    """Drives nIter iterations of [NCMC protocol -> accept/reject -> MD]."""

    def __init__(self, system: System, move, config: SimulationConfig):
        self.system = system
        self.move = move
        self.cfg = config

        ncmc_params = calculate_ncmc_steps(
            config.nstepsNC, config.nprop, config.propLambda
        )
        self.nstepsNC = ncmc_params["nstepsNC"]
        self.propSteps = ncmc_params["propSteps"]
        self.moveStep = (
            config.moveStep if config.moveStep is not None else ncmc_params["moveStep"]
        )

        # energy functions: the MD potential ignores the alchemical region;
        # the NCMC potential is lambda-parameterized
        md_system = system.replace(alchemical=None)
        # teleporting moves (water hop, darting) have no local displacement
        # bound — the frozen-system column-culling guard would veto every
        # proposal, so culling is disabled for them (see moves.base.Move)
        cull_skin = config.frozen_cull_skin
        if move is not None and getattr(move, "teleports", False):
            cull_skin = None
        common = dict(
            nonbonded_method=config.nonbonded_method,
            cutoff=config.cutoff,
            switch_distance=config.switch_distance,
            ewald_tolerance=config.ewald_tolerance,
            use_pallas=config.use_pallas,
            nonbonded_backend=config.nonbonded_backend,
            frozen_cull_skin=cull_skin,
            sweep_row_group=config.sweep_row_group,
        )
        self.energy_md = make_energy_fn(md_system, **common)
        if system.alchemical is not None or system.custom_pairs:
            self.energy_alch = make_energy_fn(
                system,
                alchemical_pme_treatment=config.alchemical_pme_treatment,
                **common,
            )
        else:
            self.energy_alch = self.energy_md
        self.force_md = make_force_fn(self.energy_md)
        self.force_alch = make_force_fn(self.energy_alch)

        constrain_x, constrain_v = make_constraint_fns(
            system.constraints, system.masses, tol=config.constraint_tolerance
        )
        self._constrain = (constrain_x, constrain_v)

        self.schedule = build_ncmc_schedule(
            self.nstepsNC,
            alchemical_functions=config.alchemical_functions,
            splitting=config.splitting,
            nprop=config.nprop,
            prop_lambda=config.propLambda,
            move_step=self.moveStep,
        )
        # NCMC snapshot schedule (reference frame_indices semantics,
        # blues/settings.py:271-277): step numbers -> protocol micro indices
        if config.ncmc_frame_indices is None:
            frame_steps = tuple(
                sorted({0, min(self.moveStep, self.nstepsNC), self.nstepsNC})
            )
        else:
            frame_steps = resolve_frame_indices(
                config.ncmc_frame_indices, self.nstepsNC, self.moveStep
            )
        self.ncmc_frame_steps = frame_steps
        self.ncmc_frame_lambdas = tuple(s / self.nstepsNC for s in frame_steps)
        record_micro = tuple(int(self.schedule.micro_of_step[s]) for s in frame_steps)
        lp = LangevinParams(config.dt, config.friction, config.temperature)
        self.langevin_params = lp
        self.protocol_fn = make_ncmc_protocol(
            self.energy_alch,
            self.force_alch,
            system.masses,
            lp,
            constrain_x,
            constrain_v,
            self.schedule,
            move=move,
            record_micro=record_micro,
            splitting=config.splitting,
            lambda_split=config.lambda_split,
        )
        self._md_step = make_md_step(
            self.force_md, system.masses, lp, constrain_x, constrain_v
        )
        # verlet-backend MD: the neighbor list is rebuilt every
        # nlist_rebuild_interval steps and applied in between (analytic
        # pair forces + autodiffed rest terms — potentials/verlet.py)
        self._md_nlist = None
        if hasattr(self.energy_md, "nlist_build"):

            def md_nlist_step_factory(nlist):
                ffn = lambda xx, bb, g: self.energy_md.force_with_nlist(
                    nlist, xx, bb, g
                )
                return make_md_step(ffn, system.masses, lp, constrain_x, constrain_v)

            self._md_nlist = (self.energy_md.nlist_build, md_nlist_step_factory)

        self._kT = units.kT(config.temperature)
        if (
            config.pressure is not None
            and system.frozen_ref_positions is not None
            and config.nonbonded_method == "PME"
        ):
            # the frozen-background PME grid assumes a fixed box; the
            # reference likewise warns that NCMC has no pressure control
            # (blues/simulation.py:784-785)
            raise ValueError(
                "pressure (NPT barostat) cannot be combined with frozen "
                "atoms under PME: the frozen-background grid assumes a "
                "fixed box"
            )
        if config.pressure is not None:
            from ..integrators.barostat import make_barostat

            self._barostat = make_barostat(
                system,
                self.energy_md,
                config.pressure * units.BAR_TO_KJMOL_PER_NM3,
                config.temperature,
            )
        else:
            self._barostat = None

        # --- mobile-state compaction (simulation/compact.py) ---------------
        # On the frozen production protocol only ~0.5% of atoms move; the
        # dynamics then runs on (n_mobile, 3) arrays and the full array is
        # rebuilt once per force eval. Protocol/MD machinery is rebuilt on
        # the compacted subsystem; iteration-level bookkeeping (correction
        # energies, frames, accept/reject) stays in full coordinates.
        self._compact = None
        if config.frozen_compact:
            from .compact import build_mobile_compaction

            comp = build_mobile_compaction(
                system, self.energy_alch, self.force_alch, move
            )
            eligible = (
                comp is not None
                and self._barostat is None
                and self._md_nlist is None
            )
            if config.frozen_compact is True and not eligible:
                raise ValueError(
                    "frozen_compact=True but the system/move is not "
                    "compaction-eligible (needs frozen reference positions, "
                    "no boundary-straddling constraints, a non-teleporting "
                    "remappable move, no barostat, no verlet neighbor lists)"
                )
            if eligible:
                self._compact = comp
                mob_j = jnp.asarray(comp.mobile_idx)
                cx_m, cv_m = make_constraint_fns(
                    comp.constraints_m,
                    comp.masses_m,
                    tol=config.constraint_tolerance,
                )
                self._constrain_m = (cx_m, cv_m)
                self.protocol_fn_m = make_ncmc_protocol(
                    comp.efn_m,
                    comp.ffn_m,
                    comp.masses_m,
                    lp,
                    cx_m,
                    cv_m,
                    self.schedule,
                    move=comp.move_m,
                    record_micro=record_micro,
                    splitting=config.splitting,
                    lambda_split=config.lambda_split,
                )

                def ffn_md_m(xm, box=None, globals_=None, _f=self.force_md):
                    e, f = _f(comp.expand(xm), box, globals_)
                    return e, f[mob_j]

                self._ffn_md_m = ffn_md_m
                self._md_step_m = make_md_step(
                    ffn_md_m, comp.masses_m, lp, cx_m, cv_m
                )

        self._iteration = self._build_iteration()
        if config.n_replicas > 1:
            self._iteration = jax.vmap(self._iteration, in_axes=(0, 0))
        self._iteration = jax.jit(self._iteration)

        self._seg = None
        if config.max_steps_per_dispatch:
            if config.pressure is not None:
                raise ValueError(
                    "max_steps_per_dispatch does not support NPT (pressure)"
                )
            if config.md_report_interval is not None:
                raise ValueError(
                    "max_steps_per_dispatch does not collect MD frames "
                    "(md_report_interval)"
                )
            self._seg = self._build_segmented(record_micro)

        self.state: Optional[SimState] = None
        #: persistent MC-barostat state (adapted proposal size + counters),
        #: carried across iterations (OpenMM keeps these on the force object)
        self.barostat_state = None
        self.accept_counter = 0
        self.iteration_count = 0
        self.stats_history: list = []
        n_moves = len(move.moves) if hasattr(move, "moves") else 1
        #: per-move (attempted, accepted) counters, aggregated by run()
        #: (reference logs per-run acceptance, blues/simulation.py:1255-1257)
        self.move_stats = np.zeros((n_moves, 2))

    # ------------------------------------------------------------------
    def _make_md_runner(self, md_step=None, md_nlist="default"):
        """run_md_steps(inner, k): k BAOAB steps on an (x, v, f, key, box)
        carry; with the verlet backend, the neighbor list is rebuilt every
        nlist_rebuild_interval steps and reused in between."""
        md_step = self._md_step if md_step is None else md_step
        md_nlist = self._md_nlist if md_nlist == "default" else md_nlist
        R = max(1, self.cfg.nlist_rebuild_interval)

        def run_md_steps(inner, k):
            if k <= 0:
                return inner
            if md_nlist is None:
                inner, _ = jax.lax.scan(md_step, inner, None, length=k)
                return inner
            build, step_factory = md_nlist

            def seg(carry, _, kk=R):
                x, v, f, key, box = carry
                step = step_factory(build(x, box))
                out, _ = jax.lax.scan(step, (x, v, f, key, box), None, length=kk)
                return out, None

            n_seg, rem = k // R, k % R
            if n_seg > 0:
                inner, _ = jax.lax.scan(seg, inner, None, length=n_seg)
            if rem > 0:
                inner, _ = seg(inner, None, kk=rem)
            return inner

        return run_md_steps

    # ------------------------------------------------------------------
    def _build_iteration(self) -> Callable:
        cfg = self.cfg
        masses = self.system.masses
        kT = self._kT
        energy_md = self.energy_md
        protocol_fn = self.protocol_fn
        n_md = cfg.nstepsMD
        interval = cfg.md_report_interval

        has_barostat = self._barostat is not None
        comp = self._compact

        def iteration_compact(x, v, box, key, bstate):
            """Same accounting as `iteration` below, with the NCMC/MD
            dynamics on the compacted mobile state (simulation/compact.py).
            Full coordinates appear only at iteration-level bookkeeping;
            frozen entries are taken from the traced input x (bitwise
            faithful — they equal the frozen reference frame by the frozen
            invariant)."""
            mob_j = jnp.asarray(comp.mobile_idx)
            key, k_acc, k_vel = jax.random.split(key, 3)

            e_md0 = energy_md(x, box, None)
            res = self.protocol_fn_m(x[mob_j], v[mob_j], box, key)
            key = res.rng_key
            res_pos_full = x.at[mob_j].set(res.positions)

            e_md1 = energy_md(res_pos_full, box, None)
            correction = -((res.e_initial - e_md0) + (e_md1 - res.e_final)) / kT
            log_accept = res.log_accept + correction
            finite = jnp.isfinite(log_accept)
            rand = jnp.log(jax.random.uniform(k_acc, (), x.dtype))
            accepted = finite & (log_accept > rand)
            x = jnp.where(accepted, res_pos_full, x)

            # resample velocities for the MOBILE subset only (frozen
            # velocities are identically zero)
            vm = maxwell_boltzmann_velocities(
                k_vel, comp.masses_m, cfg.temperature, x.dtype
            )
            xm = x[mob_j]
            vm = self._constrain_m[1](vm, xm)

            xm_keep, vm_keep = xm, vm
            _, fm0 = self._ffn_md_m(xm, box, None)
            chunk_size = interval if interval is not None else max(n_md, 1)
            chunk_size = max(min(chunk_size, max(n_md, 1)), 1)
            n_chunks = n_md // chunk_size if n_md > 0 else 0
            n_rem = n_md - n_chunks * chunk_size

            run_md_steps = self._make_md_runner(
                md_step=self._md_step_m, md_nlist=None
            )

            def chunk(carry, _):
                xm, vm, fm, key, box = carry
                xm, vm, fm, key, box = run_md_steps((xm, vm, fm, key, box), chunk_size)
                return (xm, vm, fm, key, box), xm

            frames = None
            carry = (xm, vm, fm0, key, box)
            if n_chunks > 0:
                carry, frames_m = jax.lax.scan(chunk, carry, None, length=n_chunks)
                if interval is not None:
                    frames = jax.vmap(lambda fm: x.at[mob_j].set(fm))(frames_m)
            if n_rem > 0:
                carry = run_md_steps(carry, n_rem)
            xm, vm, _, key, box = carry

            if self.cfg.md_fault_injection > 0.0:
                key, fk = jax.random.split(key)
                fault = jax.random.uniform(fk, ()) < self.cfg.md_fault_injection
                xm = jnp.where(fault, jnp.full_like(xm, jnp.nan), xm)
            e_md_end = energy_md(x.at[mob_j].set(xm), box, None)
            md_ok = jnp.isfinite(e_md_end) & jnp.all(jnp.isfinite(xm))
            xm = jnp.where(md_ok, xm, xm_keep)
            vm = jnp.where(md_ok, vm, vm_keep)
            x = x.at[mob_j].set(xm)
            v = jnp.zeros_like(v).at[mob_j].set(vm)

            aux = res.move_aux
            selected = (
                aux["selected"]
                if isinstance(aux, dict) and "selected" in aux
                else jnp.zeros((), jnp.int32)
            )
            stats = IterationStats(
                accepted=accepted,
                protocol_work=res.protocol_work,
                correction=correction,
                log_accept=log_accept,
                md_potential=e_md_end,
                ncmc_potential=res.e_final,
                mid_work=res.mid_work,
                selected_move=selected,
                md_failed=~md_ok,
            )
            snaps = res.snapshots
            if snaps is not None:
                snaps = jax.vmap(lambda sm: x.at[mob_j].set(sm))(snaps)
            ncmc_frames = NCMCFrames(snaps, res.snapshot_work)
            return (x, v, box, key), stats, frames, ncmc_frames, bstate

        def iteration(x, v, box, key, bstate):
            key, k_acc, k_vel = jax.random.split(key, 3)

            # --- NCMC stage (sync MD->NCMC is free: same pytree) -----------
            e_md0 = energy_md(x, box, None)
            res = protocol_fn(x, v, box, key)
            key = res.rng_key

            # --- alchemical correction + Metropolis ------------------------
            e_md1 = energy_md(res.positions, box, None)
            correction = -((res.e_initial - e_md0) + (e_md1 - res.e_final)) / kT
            log_accept = res.log_accept + correction
            finite = jnp.isfinite(log_accept)
            rand = jnp.log(jax.random.uniform(k_acc, (), x.dtype))
            accepted = finite & (log_accept > rand)
            x = jnp.where(accepted, res.positions, x)

            # --- reset: resample Maxwell-Boltzmann velocities --------------
            v = maxwell_boltzmann_velocities(k_vel, masses, cfg.temperature, x.dtype)
            v = self._constrain[1](v, x)

            # --- MD relaxation (NVT, or NPT when pressure is set) ----------
            # keep the pre-MD state so a non-finite MD segment (cell-list
            # overflow, culling-guard poison, blow-up) rolls back instead of
            # corrupting the run — recoverable analog of the reference's
            # dump-frame-and-exit failure path (blues/simulation.py:1203-1213)
            x_keep, v_keep, box_keep, bstate_keep = x, v, box, bstate
            _, f0 = self.force_md(x, box, None)
            barostat = self._barostat
            chunk_size = interval if interval is not None else (
                cfg.barostat_frequency if barostat is not None else max(n_md, 1)
            )
            chunk_size = max(min(chunk_size, max(n_md, 1)), 1)
            n_chunks = n_md // chunk_size if n_md > 0 else 0
            n_rem = n_md - n_chunks * chunk_size  # leftover steps < chunk_size

            run_md_steps = self._make_md_runner()

            def chunk(carry, _):
                x, v, f, key, box, bstate = carry
                inner = run_md_steps((x, v, f, key, box), chunk_size)
                x, v, f, key, box = inner
                if barostat is not None:
                    key, bk = jax.random.split(key)
                    x, box, bstate = barostat(x, box, bk, bstate)
                    _, f = self.force_md(x, box, None)
                return (x, v, f, key, box, bstate), x

            frames = None
            carry = (x, v, f0, key, box, bstate)
            if n_chunks > 0:
                carry, frames_all = jax.lax.scan(chunk, carry, None, length=n_chunks)
                frames = frames_all if interval is not None else None
            if n_rem > 0:
                # remainder MD steps (no barostat attempt, no frame)
                x, v, f, key, box, bstate = carry
                inner = run_md_steps((x, v, f, key, box), n_rem)
                x, v, f, key, box = inner
                carry = (x, v, f, key, box, bstate)
            x, v, _, key, box, bstate = carry

            if self.cfg.md_fault_injection > 0.0:
                key, fk = jax.random.split(key)
                fault = jax.random.uniform(fk, ()) < self.cfg.md_fault_injection
                x = jnp.where(fault, jnp.full_like(x, jnp.nan), x)
            e_md_end = energy_md(x, box, None)
            md_ok = jnp.isfinite(e_md_end) & jnp.all(jnp.isfinite(x))
            x = jnp.where(md_ok, x, x_keep)
            v = jnp.where(md_ok, v, v_keep)
            box = jnp.where(md_ok, box, box_keep)
            if bstate is not None:
                bstate = jax.tree.map(
                    lambda a, b: jnp.where(md_ok, a, b), bstate, bstate_keep
                )
            aux = res.move_aux
            selected = (
                aux["selected"]
                if isinstance(aux, dict) and "selected" in aux
                else jnp.zeros((), jnp.int32)
            )
            stats = IterationStats(
                accepted=accepted,
                protocol_work=res.protocol_work,
                correction=correction,
                log_accept=log_accept,
                md_potential=e_md_end,
                ncmc_potential=res.e_final,
                mid_work=res.mid_work,
                selected_move=selected,
                md_failed=~md_ok,
            )
            # NCMC snapshot frames at the configured frame_indices
            # (default: protocol start / midpoint / end; reference sentinels
            # 1 / 0.5 / -1, blues/settings.py:271-277)
            ncmc_frames = NCMCFrames(res.snapshots, res.snapshot_work)
            return (x, v, box, key), stats, frames, ncmc_frames, bstate

        def wrapped(state_in, keys):
            if has_barostat:
                x, v, box, bstate = state_in
            else:
                x, v, box = state_in
                bstate = None
            it = iteration_compact if comp is not None else iteration
            out, stats, frames, ncmc_frames, bstate = it(x, v, box, keys, bstate)
            x, v, box, key = out
            state_out = (x, v, box, bstate, key) if has_barostat else (x, v, box, key)
            return state_out, stats, frames, ncmc_frames

        return wrapped

    # ------------------------------------------------------------------
    def _build_segmented(self, record_micro):
        """Staged-dispatch machinery: the same iteration math as
        _build_iteration, split into bounded jitted calls (see
        SimulationConfig.max_steps_per_dispatch). Stage functions are
        vmapped over replicas exactly like the monolithic iteration; the
        RNG stream is threaded identically, so the two paths produce the
        same trajectories (tests/test_segmented_driver.py)."""
        cfg = self.cfg
        R = cfg.n_replicas
        energy_md = self.energy_md
        force_md = self.force_md
        masses = self.system.masses
        kT = self._kT
        cv = self._constrain[1]
        comp = self._compact

        if comp is None:
            staged = make_ncmc_protocol_staged(
                self.energy_alch,
                self.force_alch,
                masses,
                self.langevin_params,
                self._constrain[0],
                cv,
                self.schedule,
                move=self.move,
                record_micro=record_micro,
                splitting=cfg.splitting,
                lambda_split=cfg.lambda_split,
                seg_len=cfg.max_steps_per_dispatch,
            )
        else:
            # compacted staging (simulation/compact.py): the carry, the MD
            # chunks, and the snapshots are all (n_mobile, 3); full arrays
            # appear only in the pre/accept/close bookkeeping stages
            staged = make_ncmc_protocol_staged(
                comp.efn_m,
                comp.ffn_m,
                comp.masses_m,
                self.langevin_params,
                self._constrain_m[0],
                self._constrain_m[1],
                self.schedule,
                move=comp.move_m,
                record_micro=record_micro,
                splitting=cfg.splitting,
                lambda_split=cfg.lambda_split,
                seg_len=cfg.max_steps_per_dispatch,
            )
            mob_j = jnp.asarray(comp.mobile_idx)

        def vm(fn, in_axes):
            return jax.jit(jax.vmap(fn, in_axes=in_axes) if R > 1 else fn)

        def pre(x, box, key):
            key, k_acc, k_vel = jax.random.split(key, 3)
            return energy_md(x, box, None), key, k_acc, k_vel

        run_md_steps = self._make_md_runner(
            md_step=None if comp is None else self._md_step_m,
            md_nlist="default" if comp is None else None,
        )

        if comp is None:

            def init_stage(x, v, box, key):
                return staged.init_fn(x, v, box, key)

            def accept(x_old, x_new, box, e_md0, e0, e_final, pw, k_acc, k_vel):
                e_md1 = energy_md(x_new, box, None)
                correction = -((e0 - e_md0) + (e_md1 - e_final)) / kT
                log_accept = -pw / kT + correction
                finite = jnp.isfinite(log_accept)
                rand = jnp.log(jax.random.uniform(k_acc, (), x_old.dtype))
                accepted = finite & (log_accept > rand)
                x = jnp.where(accepted, x_new, x_old)
                v = maxwell_boltzmann_velocities(k_vel, masses, cfg.temperature, x.dtype)
                v = cv(v, x)
                _, f0 = force_md(x, box, None)
                return x, x, v, f0, accepted, correction, log_accept

            def md_close(x_full, x_md, v_md, box, x_keep, v_keep):
                e_md_end = energy_md(x_md, box, None)
                md_ok = jnp.isfinite(e_md_end) & jnp.all(jnp.isfinite(x_md))
                x = jnp.where(md_ok, x_md, x_keep)
                v = jnp.where(md_ok, v_md, v_keep)
                return x, v, e_md_end, md_ok

            def expand_snap(x, sm):
                return sm

        else:

            def init_stage(x, v, box, key):
                return staged.init_fn(x[mob_j], v[mob_j], box, key)

            def accept(x_old, xm_new, box, e_md0, e0, e_final, pw, k_acc, k_vel):
                x_new = x_old.at[mob_j].set(xm_new)
                e_md1 = energy_md(x_new, box, None)
                correction = -((e0 - e_md0) + (e_md1 - e_final)) / kT
                log_accept = -pw / kT + correction
                finite = jnp.isfinite(log_accept)
                rand = jnp.log(jax.random.uniform(k_acc, (), x_old.dtype))
                accepted = finite & (log_accept > rand)
                x = jnp.where(accepted, x_new, x_old)
                xm = x[mob_j]
                vmv = maxwell_boltzmann_velocities(
                    k_vel, comp.masses_m, cfg.temperature, x.dtype
                )
                vmv = self._constrain_m[1](vmv, xm)
                _, fm0 = self._ffn_md_m(xm, box, None)
                return x, xm, vmv, fm0, accepted, correction, log_accept

            def md_close(x_full, xm_md, vm_md, box, xm_keep, vm_keep):
                e_md_end = energy_md(x_full.at[mob_j].set(xm_md), box, None)
                md_ok = jnp.isfinite(e_md_end) & jnp.all(jnp.isfinite(xm_md))
                xm = jnp.where(md_ok, xm_md, xm_keep)
                vmv = jnp.where(md_ok, vm_md, vm_keep)
                x = x_full.at[mob_j].set(xm)
                v = jnp.zeros_like(x_full).at[mob_j].set(vmv)
                return x, v, e_md_end, md_ok

            def expand_snap(x, sm):
                return x.at[mob_j].set(sm)

        def make_md_chunk(k):
            def chunkf(x, v, f, key, box):
                return run_md_steps((x, v, f, key, box), k)

            return vm(chunkf, (0, 0, 0, 0, 0))

        L = int(cfg.max_steps_per_dispatch)
        n_md = cfg.nstepsMD
        md_plan = [L] * (n_md // L)
        if n_md % L:
            md_plan.append(n_md % L)
        md_chunk = {k: make_md_chunk(k) for k in sorted(set(md_plan))}

        return {
            "staged": staged,
            "pre": vm(pre, (0, 0, 0)),
            "init": vm(init_stage, (0, 0, 0, 0)),
            "seg": vm(staged.seg_fn, (0, None)),
            "move": vm(staged.move_fn, (0, 0)),
            "close": vm(staged.close_fn, (0, 0)),
            "accept": vm(accept, (0, 0, 0, 0, 0, 0, 0, 0, 0)),
            "md_plan": md_plan,
            "md_chunk": md_chunk,
            "md_close": vm(md_close, (0, 0, 0, 0, 0, 0)),
            "expand_snap": vm(expand_snap, (0, 0)),
        }

    def _run_iteration_segmented(self):
        sg = self._seg
        st = sg["staged"]
        cfg = self.cfg
        s = self.state
        x, v, box, key = s.positions, s.velocities, s.box, s.rng_key

        e_md0, kprot, k_acc, k_vel = sg["pre"](x, box, key)
        carry, aux, e0 = sg["init"](x, v, box, kprot)
        mid_w = st.work_of(carry)
        snaps, snap_works = [], []
        for entry in st.plan:
            kind = entry[0]
            if kind == "seg":
                carry = sg["seg"](carry, entry[1])
            elif kind == "move":
                carry, aux = sg["move"](carry, aux)
                mid_w = st.work_of(carry)
            else:  # snap
                snaps.append(sg["expand_snap"](x, st.positions_of(carry)))
                snap_works.append(st.work_of(carry))
        x_nc, _v_nc, key, pw, e_final, work_end = sg["close"](carry, aux)
        if st.record_final:
            snaps.append(sg["expand_snap"](x, x_nc))
            snap_works.append(work_end)

        x2full, x2, v2, f0, accepted, correction, log_accept = sg["accept"](
            x, x_nc, box, e_md0, e0, e_final, pw, k_acc, k_vel
        )

        mc = (x2, v2, f0, key, box)
        for k in sg["md_plan"]:
            mc = sg["md_chunk"][k](*mc)
        x3, v3, _f3, key, box = mc
        x_fin, v_fin, e_md_end, md_ok = sg["md_close"](x2full, x3, v3, box, x2, v2)

        R = cfg.n_replicas
        if isinstance(aux, dict) and "selected" in aux:
            selected = aux["selected"]
        else:
            selected = jnp.zeros((R,) if R > 1 else (), jnp.int32)
        stats = IterationStats(
            accepted=accepted,
            protocol_work=pw,
            correction=correction,
            log_accept=log_accept,
            md_potential=e_md_end,
            ncmc_potential=e_final,
            mid_work=mid_w,
            selected_move=selected,
            md_failed=~md_ok,
        )
        axis = 1 if R > 1 else 0
        ncmc_frames = NCMCFrames(
            jnp.stack(snaps, axis=axis) if snaps else None,
            jnp.stack(snap_works, axis=axis) if snap_works else None,
        )
        self.state = SimState(x_fin, v_fin, box, key)
        self.iteration_count += 1
        return stats, None, ncmc_frames

    # ------------------------------------------------------------------
    def initialize(self, positions, box=None, key=None, velocities=None):
        """Set the initial state. With n_replicas > 1, positions may be
        (N, 3) (broadcast) or (R, N, 3)."""
        cfg = self.cfg
        if key is None:
            key = jax.random.PRNGKey(int(time.time_ns() % (2**31)))
        if box is None:
            box = self.system.box
            if box is None:
                box = np.eye(3) * 999.0  # effectively non-periodic
        box = jnp.asarray(box, jnp.float32)
        x = jnp.asarray(positions, jnp.float32)
        R = cfg.n_replicas
        if R > 1:
            keys = jax.random.split(key, R)
            if x.ndim == 2:
                x = jnp.broadcast_to(x, (R,) + x.shape)
            if box.ndim == 2:
                box = jnp.broadcast_to(box, (R, 3, 3))
            if velocities is None:
                v = jax.vmap(
                    lambda k: maxwell_boltzmann_velocities(
                        k, self.system.masses, cfg.temperature
                    )
                )(jax.vmap(lambda k: jax.random.fold_in(k, 7))(keys))
            else:
                v = jnp.asarray(velocities, jnp.float32)
            self.state = SimState(x, v, box, keys)
        else:
            if velocities is None:
                key, vk = jax.random.split(key)
                v = maxwell_boltzmann_velocities(vk, self.system.masses, cfg.temperature)
            else:
                v = jnp.asarray(velocities, jnp.float32)
            self.state = SimState(x, v, box, key)
        return self.state

    def minimize(self, n_steps: int = 1000):
        """FIRE-minimize the current state's positions (the reference
        workflow calls minimizeEnergy() on its Simulations before running,
        tests/test_simulation.py:139-141)."""
        from ..integrators.minimize import minimize_fire

        s = self.state
        if s is None:
            raise RuntimeError("call initialize() first")
        cx = self._constrain[0]

        def _min(x, box):
            xm, _ = minimize_fire(
                self.force_md, self.system.masses, x, box,
                n_steps=n_steps, constrain_x=cx,
            )
            return xm

        fn = jax.jit(_min)
        if self.cfg.n_replicas > 1:
            # box is broadcast to (R, 3, 3) by initialize()
            fn = jax.jit(jax.vmap(_min, in_axes=(0, 0)))
        x = fn(s.positions, s.box)
        self.state = SimState(x, s.velocities, s.box, s.rng_key)
        return self.state

    def _init_barostat_state(self):
        box = self.state.box
        R = self.cfg.n_replicas
        box0 = box[0] if (R > 1 and box.ndim == 3) else box
        bstate = self._barostat.init_state(np.asarray(box0))
        if R > 1:
            bstate = jax.tree.map(
                lambda a: jnp.broadcast_to(a, (R,) + a.shape), bstate
            )
        return bstate

    def run_iteration(self):
        """One MD<->NCMC iteration; returns (stats, md_frames, ncmc_frames)."""
        if self._seg is not None:
            return self._run_iteration_segmented()
        s = self.state
        if self._barostat is not None:
            if self.barostat_state is None:
                self.barostat_state = self._init_barostat_state()
            state_in = (s.positions, s.velocities, s.box, self.barostat_state)
        else:
            state_in = (s.positions, s.velocities, s.box)
        state_out, stats, frames, ncmc_frames = self._iteration(state_in, s.rng_key)
        if self._barostat is not None:
            x, v, box, bstate, key = state_out
            self.barostat_state = bstate
        else:
            x, v, box, key = state_out
        self.state = SimState(x, v, box, key)
        self.iteration_count += 1
        return stats, frames, ncmc_frames

    def run(self, n_iter: Optional[int] = None, reporters=()):
        """Run the full loop, mirroring BLUESSimulation.run
        (reference: blues/simulation.py:1215-1257). Returns acceptance ratio.
        """
        n_iter = n_iter if n_iter is not None else self.cfg.nIter
        n_accept = 0.0
        n_total = 0.0
        for it in range(n_iter):
            stats, frames, ncmc_frames = self.run_iteration()
            acc = np.atleast_1d(np.asarray(stats.accepted))
            sel = np.atleast_1d(np.asarray(stats.selected_move))
            n_accept += float(acc.sum())
            n_total += float(acc.size)
            np.add.at(self.move_stats[:, 0], sel, 1.0)
            np.add.at(self.move_stats[:, 1], sel, acc.astype(np.float64))
            self.stats_history.append(jax.tree.map(np.asarray, stats))
            for rep in reporters:
                rep.report(self, it, stats, frames, ncmc_frames)
        ratio = n_accept / max(n_total, 1.0)
        logger.info("Acceptance Ratio: %s", ratio)
        logger.info("nIter: %s", n_iter)
        moves = getattr(self.move, "moves", [self.move])
        if len(moves) > 1:
            for i, m in enumerate(moves):
                att, acc_i = self.move_stats[i]
                logger.info(
                    "  %s: accepted %d / attempted %d (%.3f)",
                    type(m).__name__, int(acc_i), int(att),
                    acc_i / att if att else float("nan"),
                )
        return ratio
