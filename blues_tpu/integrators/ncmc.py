"""The NCMC switching protocol as a single jit-scanned pure function.

This replaces the reference's `AlchemicalExternalLangevinIntegrator`
CustomIntegrator program (reference: blues/integrators.py:159-231) plus the
Python-level step loop that drives it one step at a time
(blues/simulation.py:1039-1098). The whole protocol — lambda switching,
BAOAB propagation, protocol-work accumulation, the midpoint move, and the
external-work capture around it — is one traced computation: two `lax.scan`s
split at the move micro-step, with no host round-trips.

Work accounting (exactly the reference semantics, telescoped):
the reference accumulates, per integrator step,
  H substeps:   W += E(x, lam_new) - E(x, lam_old)      (integrators.py:211-231)
  top-of-step:  W += E_perturbed - E_unperturbed        (integrators.py:183-191)
Because every such term is an energy difference at a *fixed* position, the
sum telescopes: only positions changes (the midpoint move) and lambda
changes contribute. Each micro-step therefore needs exactly two fused
energy+force evaluations (the two V kicks), with the energy of the second
cached as next step's baseline — fewer evaluations than the reference's own
integrator program performs.

Accumulation uses Kahan compensation in f32 (TPU-native) so a 10k-step
protocol keeps work error << kT (SURVEY.md 7.3.5).
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .. import units
from ..core.state import KahanAccumulator, NaiveAccumulator
from .langevin import LangevinParams, make_baoab_machinery
from .schedules import NCMCSchedule

#: Work value used by moves to force rejection (reference: blues/moves.py:1079-1082)
VETO_WORK = 999999.0


class NCMCResult(NamedTuple):
    positions: jax.Array
    velocities: jax.Array
    rng_key: jax.Array
    protocol_work: jax.Array  # kJ/mol
    log_accept: jax.Array  # -(work)/kT, before alchemical correction
    e_initial: jax.Array  # alchemical-potential energy at protocol start
    e_final: jax.Array  # alchemical-potential energy at protocol end
    mid_positions: jax.Array  # positions right after the midpoint move
    mid_work: jax.Array  # protocol work accumulated up to the midpoint
    move_aux: object  # pytree returned by the move (diagnostics)
    snapshots: object  # (K, N, 3) positions at record_micro points, or None
    snapshot_work: object  # (K,) protocol work (kJ/mol) at those points
    #: (n_micro, S, 3) end-of-micro-step positions of the stream_atoms
    #: subset + initial/pre-move entries, or None (see make_ncmc_protocol)
    micro_stream: object = None


def _stack_schedule(schedule: NCMCSchedule, lo: int, hi: int, dtype):
    return {
        k: jnp.asarray(v[lo:hi], dtype) for k, v in schedule.globals_per_step.items()
    }


def _parse_splitting(splitting: str, dt: float):
    """Split the non-H tokens of an openmmtools splitting string into the
    per-micro-step substep sequence with openmmtools timestep conventions
    (each R gets dt/n_R, each V dt/n_V, each O an OU sub-interval dt/n_O)."""
    tokens = [t for t in splitting.upper().split() if t != "H"]
    bad = set(tokens) - {"V", "R", "O"}
    if bad:
        raise ValueError(f"unknown splitting substeps {bad}; allowed: H V R O")
    if "V" not in tokens or "R" not in tokens:
        raise ValueError("splitting must contain at least one V and one R substep")
    h_V = dt / tokens.count("V")
    h_R = dt / tokens.count("R")
    h_O = dt / max(tokens.count("O"), 1)
    return tokens, h_V, h_R, h_O


def _make_step_fns(m, tokens, h_V, h_R, h_O, force_fn, e0f0, eafa, stream_idx):
    """Build the scan bodies for one protocol micro-step: the plain variant
    (two fused energy+force passes) and the lambda-split variant (one full
    pass + two tiny alchemical passes). Shared by the monolithic
    make_ncmc_protocol and the staged/segmented-dispatch builder so the
    physics is defined exactly once."""

    def micro_step_split(carry, g):
        """Split micro step: the opening force reuses the cached
        lambda-independent (E0, F0) from the previous step's closing eval
        (same positions, only lambda changed); only Ea re-evaluates."""
        x, v, key, work, ea_cache, e0_x, f0_x, box = carry
        ea, fa = eafa(x, box, g)
        work = work.add(ea - ea_cache)
        f = f0_x + fa
        f_fresh = True
        for t in tokens:
            if t == "V":
                if not f_fresh:
                    e0_x, f0_x = e0f0(x, box)
                    ea, fa = eafa(x, box, g)
                    f = f0_x + fa
                    f_fresh = True
                v = m["kick"](v, f, h_V, x)
            elif t == "R":
                x, v = m["drift"](x, v, h_R)
                f_fresh = False
            else:  # O
                key, okey = jax.random.split(key)
                v = m["ou_partial"](v, okey, x, h_O)
        if not f_fresh:
            e0_x, f0_x = e0f0(x, box)
            ea, fa = eafa(x, box, g)
        y = None if stream_idx is None else x[stream_idx]
        return (x, v, key, work, ea, e0_x, f0_x, box), y

    def micro_step(carry, g):
        x, v, key, work, e_cache, box = carry
        e1, f = force_fn(x, box, g)
        work = work.add(e1 - e_cache)
        f_fresh = True  # force matches current x
        e_at_x = e1
        for t in tokens:
            if t == "V":
                if not f_fresh:
                    e_at_x, f = force_fn(x, box, g)
                    f_fresh = True
                v = m["kick"](v, f, h_V, x)
            elif t == "R":
                x, v = m["drift"](x, v, h_R)
                f_fresh = False
            else:  # O
                key, okey = jax.random.split(key)
                v = m["ou_partial"](v, okey, x, h_O)
        if not f_fresh:
            # energy baseline for the next step's work capture must be at
            # the final positions
            e_at_x, f = force_fn(x, box, g)
        y = None if stream_idx is None else x[stream_idx]
        return (x, v, key, work, e_at_x, box), y

    return micro_step, micro_step_split


def _make_apply_move(move, use_split, energy_fn, e0f0, eafa, g_pre):
    """Midpoint move with external-work capture (reference: move applied
    between integrator steps, its work counted via perturbed_pe -
    unperturbed_pe at the top of the next step, blues/simulation.py:1074-1079
    + blues/integrators.py:183-191). apply_move(carry, aux) -> (carry, aux)."""

    def apply_move(carry, aux):
        if use_split:
            x, v, key, work, ea_cache, e0_x, f0_x, box = carry
            ea_b, _ = eafa(x, box, g_pre)
            work = work.add(ea_b - ea_cache)  # lambda jump (E0 cancels)
            key, mkey = jax.random.split(key)
            x_new, aux2 = move.propose(mkey, x, box, aux)
            e0_n, f0_n = e0f0(x_new, box)
            ea_b2, _ = eafa(x_new, box, g_pre)
            # external (move) work: full energy difference across the
            # position change
            work = work.add((e0_n + ea_b2) - (e0_x + ea_b))
            return (x_new, v, key, work, ea_b2, e0_n, f0_n, box), aux2
        x, v, key, work, e_cache, box = carry
        e_b = energy_fn(x, box, g_pre)
        work = work.add(e_b - e_cache)  # lambda transition at fixed x
        key, mkey = jax.random.split(key)
        x_new, aux2 = move.propose(mkey, x, box, aux)
        e_b2 = energy_fn(x_new, box, g_pre)
        work = work.add(e_b2 - e_b)  # external (move) work
        return (x_new, v, key, work, e_b2, box), aux2

    return apply_move


def make_ncmc_protocol(
    energy_fn: Callable,
    force_fn: Callable,
    masses,
    params: LangevinParams,
    constrain_x,
    constrain_v,
    schedule: NCMCSchedule,
    move=None,
    dtype=jnp.float32,
    record_micro=(),
    splitting: str = "H V R O R V H",
    naive_accumulation: bool = False,
    stream_atoms=None,
    lambda_split: bool = None,
):
    """Build protocol_fn(x, v, box, key) -> NCMCResult.

    energy_fn(x, box, globals) -> E; force_fn -> (E, F). ``move`` follows the
    moves.base.Move protocol (before / propose / after); None = no move.

    ``record_micro``: static micro-step indices (0..n_micro) at which to
    snapshot positions + accumulated work into NCMCResult.snapshots /
    snapshot_work — the jit-compatible realization of the reference's
    frame_indices NCMC-reporter scheduling (blues/reporters.py:362-371).
    A snapshot at micro index m is taken after m micro steps, with the
    midpoint move included once m >= move_micro; the final snapshot
    (m == n_micro) includes the closing lambda-transition work.

    ``stream_atoms``: static atom indices whose END-of-micro-step positions
    are recorded per step via the scan's ys output into
    NCMCResult.micro_stream, shape (n_micro, S, 3) — every work term in the
    protocol is an energy difference at one of these recorded positions
    (plus the start/mid positions returned anyway), so an external f64
    replay can recompute the EXACT work of the f32 trajectory
    (tools/work_precision_replay.py; SURVEY.md 7.3.5). Intended for frozen
    systems where S = mobile atoms keeps the stream small.

    ``lambda_split``: use the E(x, lam) = E0(x) + Ea(x, lam) decomposition
    when ``energy_fn`` exposes it (potentials/energy.py). The micro-step's
    opening force eval is at the SAME positions as the previous step's
    closing eval — only lambda changed — so the cached lambda-independent
    (E0, F0) is reused and only the tiny alchemical part Ea re-evaluates:
    one full kernel pass per micro step instead of two (~2x on frozen
    production protocols). Work increments become Ea differences at fixed
    x — algebraically identical (E0 cancels) and numerically better
    conditioned in f32 (no large-E0 cancellation). None = auto-detect.
    """
    m = make_baoab_machinery(masses, params, constrain_x, constrain_v)
    kT = units.kT(params.temperature)
    mm = schedule.move_micro
    g_initial = {k: jnp.asarray(v, dtype) for k, v in schedule.globals_initial.items()}
    g_pre = {k: jnp.asarray(v, dtype) for k, v in schedule.globals_pre_move.items()}
    g_final = {k: jnp.asarray(v, dtype) for k, v in schedule.globals_final.items()}

    # --- dynamics core from the splitting string ----------------------------
    # The reference compiles arbitrary openmmtools splitting strings into a
    # CustomIntegrator program (blues/integrators.py + the parent class).
    # Forces are (re)evaluated lazily — only when a V follows a position
    # change — so the default "H V R O R V H" costs exactly two fused
    # energy+force passes per step. Lambda (H) placement: the flattened
    # schedule advances lambda once per step before the dynamics (exact for
    # splittings whose dynamics all sit between the H substeps, like the
    # reference default).
    tokens, h_V, h_R, h_O = _parse_splitting(splitting, params.dt)

    stream_idx = (
        None if stream_atoms is None else jnp.asarray(np.asarray(stream_atoms, np.int64))
    )

    e0f0 = getattr(energy_fn, "lambda_e0_f0", None)
    eafa = getattr(energy_fn, "lambda_ea_fa", None)
    use_split = (lambda_split is not False) and e0f0 is not None and eafa is not None
    if lambda_split is True and not use_split:
        raise ValueError(
            "lambda_split requested but energy_fn exposes no lambda_e0_f0/"
            "lambda_ea_fa decomposition (potentials/energy.py)"
        )

    micro_step, micro_step_split = _make_step_fns(
        m, tokens, h_V, h_R, h_O, force_fn, e0f0, eafa, stream_idx
    )
    apply_move = (
        _make_apply_move(move, use_split, energy_fn, e0f0, eafa, g_pre)
        if move is not None
        else None
    )

    rec = tuple(sorted(set(int(m) for m in record_micro)))
    if rec and not (0 <= rec[0] and rec[-1] <= schedule.n_micro):
        raise ValueError(
            f"record_micro {rec} out of range for n_micro={schedule.n_micro}"
        )
    # segment boundaries: every record point (except the final one, handled
    # after the closing lambda transition) plus the move micro-step
    boundaries = sorted(
        set(m for m in rec if 0 < m < schedule.n_micro) | {mm, schedule.n_micro}
    )
    rec_set = set(rec)

    def protocol_fn(x, v, box, key):
        x = constrain_x(x, x)
        v = constrain_v(v, x)

        key, bkey = jax.random.split(key)
        if move is not None:
            x, v, aux = move.before(bkey, x, v, box)
        else:
            aux = None

        # naive_accumulation exists to MEASURE the f32 accumulation error
        # Kahan removes (SURVEY.md 7.3.5); production always uses Kahan
        acc_cls = NaiveAccumulator if naive_accumulation else KahanAccumulator
        work = acc_cls.zeros(dtype)
        mid_positions, mid_work = x, work.value
        if use_split:
            ea_init, _ = eafa(x, box, g_initial)
            e0x, f0x = e0f0(x, box)
            e0 = e0x + ea_init  # full initial energy, split-consistent
            carry = (x, v, key, work, ea_init, e0x, f0x, box)
        else:
            e0 = energy_fn(x, box, g_initial)
            carry = (x, v, key, work, e0, box)
        snaps, snap_works = [], []

        if mm == 0 and move is not None:
            carry, aux = apply_move(carry, aux)
            mid_positions, mid_work = carry[0], carry[3].value
        if 0 in rec_set:
            snaps.append(carry[0])
            snap_works.append(carry[3].value)

        prev = 0
        stream_segs = []
        step_fn = micro_step_split if use_split else micro_step
        for p in boundaries:
            if p > prev:
                xs = _stack_schedule(schedule, prev, p, dtype)
                carry, ys = jax.lax.scan(step_fn, carry, xs)
                if stream_idx is not None:
                    stream_segs.append(ys)
            prev = p
            if p == mm and mm > 0 and move is not None:
                carry, aux = apply_move(carry, aux)
                mid_positions, mid_work = carry[0], carry[3].value
            if p in rec_set and p < schedule.n_micro:
                snaps.append(carry[0])
                snap_works.append(carry[3].value)

        # closing lambda transition to master lambda = 1
        if use_split:
            x, v, key, work, ea_cache, e0_x, f0_x, box = carry
            ea_fin, _ = eafa(x, box, g_final)
            work = work.add(ea_fin - ea_cache)
            e_final = e0_x + ea_fin
        else:
            x, v, key, work, e_cache, box = carry
            e_final = energy_fn(x, box, g_final)
            work = work.add(e_final - e_cache)
        if schedule.n_micro in rec_set:
            snaps.append(x)
            snap_works.append(work.value)

        protocol_work = work.value
        if move is not None:
            key, akey = jax.random.split(key)
            veto = move.after(akey, x, box, aux)
            protocol_work = protocol_work + jnp.where(veto, VETO_WORK, 0.0)

        return NCMCResult(
            positions=x,
            velocities=v,
            rng_key=key,
            protocol_work=protocol_work,
            log_accept=-protocol_work / kT,
            e_initial=e0,
            e_final=e_final,
            mid_positions=mid_positions,
            mid_work=mid_work,
            move_aux=aux,
            snapshots=jnp.stack(snaps) if snaps else None,
            snapshot_work=jnp.stack(snap_works) if snaps else None,
            micro_stream=(
                jnp.concatenate(stream_segs, axis=0) if stream_segs else None
            ),
        )

    return protocol_fn


class StagedNCMCProtocol(NamedTuple):
    """The NCMC protocol split into separately-jittable stages for
    bounded-length device dispatch (simulation/driver.py segmented mode).

    A single monolithic protocol execution at production shape (64 replicas
    x 10k micro-steps) runs for minutes on-device; the remote-TPU execution
    tunnel kills such calls with 'UNAVAILABLE: TPU device error'
    (tools/probe_driver_scale.py: R=64 passes at nstepsNC<=1000, faults at
    4000). The staged form runs the SAME math as make_ncmc_protocol's
    protocol_fn — identical RNG threading, Kahan work accounting, midpoint
    move, and closing lambda transition — as a host-driven sequence of
    bounded lax.scans with the carry left on device between calls.

    Stage signatures (carry layouts as in _make_step_fns; indices 0 and 3
    are positions and the work accumulator in both variants):
      init_fn(x, v, box, key)  -> (carry, aux, e_initial)
      seg_fn(carry, xs_dict)   -> carry       # len-L schedule slice; one
                                              # compile per distinct L
      move_fn(carry, aux)      -> (carry, aux)
      close_fn(carry, aux)     -> (x, v, key, protocol_work, e_final,
                                   work_end)  # work_end = pre-veto work

    ``plan`` drives the host loop: ('seg', xs_dict) entries run micro-step
    ranges, ('move',) applies the midpoint move, ('snap',) records
    (positions, work) for NCMCFrames; ``record_final`` asks for one more
    snapshot after close_fn (the reference's -1 frame sentinel).
    """

    init_fn: Callable
    seg_fn: Callable
    move_fn: Callable
    close_fn: Callable
    plan: tuple
    record_final: bool
    n_micro: int

    @staticmethod
    def positions_of(carry):
        return carry[0]

    @staticmethod
    def work_of(carry):
        return carry[3].value


def make_ncmc_protocol_staged(
    energy_fn: Callable,
    force_fn: Callable,
    masses,
    params: LangevinParams,
    constrain_x,
    constrain_v,
    schedule: NCMCSchedule,
    move=None,
    dtype=jnp.float32,
    record_micro=(),
    splitting: str = "H V R O R V H",
    lambda_split: bool = None,
    seg_len: int = 1000,
) -> StagedNCMCProtocol:
    """Staged counterpart of make_ncmc_protocol (same arguments, minus the
    replay-only stream_atoms/naive_accumulation). ``seg_len`` bounds the
    micro-steps per device dispatch; schedule slices are passed as traced
    scan xs, so all segments of equal length share one compile."""
    m = make_baoab_machinery(masses, params, constrain_x, constrain_v)
    mm = schedule.move_micro
    g_initial = {k: jnp.asarray(v, dtype) for k, v in schedule.globals_initial.items()}
    g_pre = {k: jnp.asarray(v, dtype) for k, v in schedule.globals_pre_move.items()}
    g_final = {k: jnp.asarray(v, dtype) for k, v in schedule.globals_final.items()}
    tokens, h_V, h_R, h_O = _parse_splitting(splitting, params.dt)

    e0f0 = getattr(energy_fn, "lambda_e0_f0", None)
    eafa = getattr(energy_fn, "lambda_ea_fa", None)
    use_split = (lambda_split is not False) and e0f0 is not None and eafa is not None
    if lambda_split is True and not use_split:
        raise ValueError(
            "lambda_split requested but energy_fn exposes no lambda_e0_f0/"
            "lambda_ea_fa decomposition (potentials/energy.py)"
        )

    micro_step, micro_step_split = _make_step_fns(
        m, tokens, h_V, h_R, h_O, force_fn, e0f0, eafa, None
    )
    step_fn = micro_step_split if use_split else micro_step
    apply_move = (
        _make_apply_move(move, use_split, energy_fn, e0f0, eafa, g_pre)
        if move is not None
        else None
    )

    def init_fn(x, v, box, key):
        x = constrain_x(x, x)
        v = constrain_v(v, x)
        key, bkey = jax.random.split(key)
        if move is not None:
            x, v, aux = move.before(bkey, x, v, box)
        else:
            aux = None
        work = KahanAccumulator.zeros(dtype)
        if use_split:
            ea_init, _ = eafa(x, box, g_initial)
            e0x, f0x = e0f0(x, box)
            e0 = e0x + ea_init  # full initial energy, split-consistent
            carry = (x, v, key, work, ea_init, e0x, f0x, box)
        else:
            e0 = energy_fn(x, box, g_initial)
            carry = (x, v, key, work, e0, box)
        return carry, aux, e0

    def seg_fn(carry, xs):
        carry, _ = jax.lax.scan(step_fn, carry, xs)
        return carry

    def move_fn(carry, aux):
        if apply_move is None:
            return carry, aux
        return apply_move(carry, aux)

    def close_fn(carry, aux):
        # closing lambda transition to master lambda = 1
        if use_split:
            x, v, key, work, ea_cache, e0_x, f0_x, box = carry
            ea_fin, _ = eafa(x, box, g_final)
            work = work.add(ea_fin - ea_cache)
            e_final = e0_x + ea_fin
        else:
            x, v, key, work, e_cache, box = carry
            e_final = energy_fn(x, box, g_final)
            work = work.add(e_final - e_cache)
        work_end = work.value
        protocol_work = work_end
        if move is not None:
            key, akey = jax.random.split(key)
            veto = move.after(akey, x, box, aux)
            protocol_work = protocol_work + jnp.where(veto, VETO_WORK, 0.0)
        return x, v, key, protocol_work, e_final, work_end

    # --- host-loop plan: same boundary semantics as protocol_fn ------------
    rec = tuple(sorted(set(int(r) for r in record_micro)))
    if rec and not (0 <= rec[0] and rec[-1] <= schedule.n_micro):
        raise ValueError(
            f"record_micro {rec} out of range for n_micro={schedule.n_micro}"
        )
    rec_set = set(rec)
    boundaries = sorted(
        set(r for r in rec if 0 < r < schedule.n_micro) | {mm, schedule.n_micro}
    )
    if seg_len < 1:
        raise ValueError(f"seg_len must be >= 1, got {seg_len}")
    plan = []
    if mm == 0 and move is not None:
        plan.append(("move",))
    if 0 in rec_set:
        plan.append(("snap",))
    prev = 0
    for p in boundaries:
        if p == 0:  # mm == 0: move + snapshot already handled pre-loop
            continue
        lo = prev
        while lo < p:
            hi = min(lo + seg_len, p)
            plan.append(("seg", _stack_schedule(schedule, lo, hi, dtype)))
            lo = hi
        prev = p
        if p == mm and mm > 0 and move is not None:
            plan.append(("move",))
        if p in rec_set and p < schedule.n_micro:
            plan.append(("snap",))

    return StagedNCMCProtocol(
        init_fn=init_fn,
        seg_fn=seg_fn,
        move_fn=move_fn,
        close_fn=close_fn,
        plan=tuple(plan),
        record_final=schedule.n_micro in rec_set,
        n_micro=schedule.n_micro,
    )
