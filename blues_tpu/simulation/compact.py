"""Mobile-state compaction for frozen production systems.

The reference production protocol freezes everything outside 5 A of the
ligand plus all solvent (blues/simulation.py:394-480 +
examples/rotmove_cuda.yml:42-45), leaving ~100-200 mobile atoms in a
22k-atom system. Running the NCMC/MD dynamics on full (R, N, 3) arrays
then wastes ~99.5% of every integration op — OU noise generation, kicks,
drifts, constraint projections — on atoms that never move (measured: the
full-array protocol step at 64 replicas spends more time on dead dynamics
traffic than on physics; tools/probe_compact.py).

This module compacts the DYNAMICS STATE to the mobile-or-alchemical subset:
positions/velocities/forces become (n_mobile, 3), the constraint clusters
and the move's atom indices are remapped into the compacted space, and the
energy functions reconstruct the full array exactly once per force eval by
scattering the mobile slice onto the frozen reference positions (which are
bit-identical to the frozen atoms' runtime coordinates for all time — the
same invariant the frozen PME background grid and the culling anchors
already rely on).

The compaction is a pure adapter: every energy/force value is produced by
the SAME underlying composed energy function, so correctness is inherited
(pinned by tests/test_compact.py slice-agreement tests)."""

from __future__ import annotations

import copy
from typing import Callable, NamedTuple, Optional

import jax.numpy as jnp
import numpy as np

from ..core.system import Constraints, System


class MobileCompaction(NamedTuple):
    """Compacted-dynamics adapters (see build_mobile_compaction)."""

    mobile_idx: np.ndarray  # (M,) global atom ids, ascending
    masses_m: np.ndarray  # (M,)
    efn_m: Callable  # efn_m(xm, box, globals) with lambda_* attrs when present
    ffn_m: Callable  # ffn_m(xm, box, globals) -> (E, F_m)
    constraints_m: Constraints  # remapped to compacted ids
    move_m: object  # remapped move (or None)
    x_frozen: jnp.ndarray  # (N, 3) frozen reference frame (constant)

    def gather(self, x_full):
        return x_full[jnp.asarray(self.mobile_idx)]

    def expand(self, xm, x_full=None):
        """Scatter the mobile slice into a full array. With x_full the
        frozen entries come from the (traced) runtime array — bitwise
        faithful; otherwise from the baked frozen reference frame."""
        base = self.x_frozen.astype(xm.dtype) if x_full is None else x_full
        return base.at[jnp.asarray(self.mobile_idx)].set(xm)


def _remap_move(move, mapping, masses_m, mobile_idx):
    """Remap a move's atom-index fields into the compacted space.
    Returns the remapped move or None when the move type is not
    compaction-safe (teleporting moves, unknown types)."""
    from ..moves.base import Move, NullMove
    from ..moves.combination import CombinationMove
    from ..moves.engine import MoveEngine
    from ..moves.rotation import RandomLigandRotationMove
    from ..moves.sidechain import SideChainMove

    if move is None:
        return None, True
    if getattr(move, "teleports", False):
        return None, False
    if isinstance(move, MoveEngine):
        subs = []
        for m in move.moves:
            r, ok = _remap_move(m, mapping, masses_m, mobile_idx)
            if not ok:
                return None, False
            subs.append(r)
        out = MoveEngine(subs, move.probabilities)
        return out, True
    if isinstance(move, CombinationMove):
        subs = []
        for m in move.moves:
            r, ok = _remap_move(m, mapping, masses_m, mobile_idx)
            if not ok:
                return None, False
            subs.append(r)
        return CombinationMove(subs), True
    if isinstance(move, RandomLigandRotationMove):
        idx = mapping[np.asarray(move.atom_indices, np.int64)]
        if (idx < 0).any():
            return None, False
        return type(move)(idx.astype(np.int32), masses_m), True
    if isinstance(move, SideChainMove):
        ai = mapping[np.asarray(move.axis_i, np.int64)]
        aj = mapping[np.asarray(move.axis_j, np.int64)]
        masks = np.asarray(move.masks)
        non_mob = np.ones(masks.shape[1], bool)
        non_mob[mobile_idx] = False
        if (ai < 0).any() or (aj < 0).any() or masks[:, non_mob].any():
            return None, False
        out = copy.copy(move)
        out.axis_i = ai.astype(np.int32)
        out.axis_j = aj.astype(np.int32)
        out.masks = masks[:, mobile_idx]
        return out, True
    if isinstance(move, NullMove) or type(move) is Move:
        return move, True
    return None, False


def build_mobile_compaction(
    system: System, efn: Callable, ffn: Callable, move=None
) -> Optional[MobileCompaction]:
    """Build the compacted-dynamics adapters, or None when ineligible.

    Eligible when: the system has frozen atoms with recorded reference
    positions; no constraint straddles the frozen boundary (freeze_radius
    is residue-based, so in practice none do); and the move — if any — is
    non-teleporting and index-remappable."""
    masses = np.asarray(system.masses)
    if system.frozen_ref_positions is None or not (masses <= 0).any():
        return None
    is_alch = np.zeros(system.n_atoms, bool)
    if system.alchemical is not None and len(system.alchemical.atoms):
        is_alch[np.asarray(system.alchemical.atoms)] = True
    mob = np.where((masses > 0) | is_alch)[0].astype(np.int32)
    if len(mob) == system.n_atoms:
        return None
    mapping = np.full(system.n_atoms, -1, np.int64)
    mapping[mob] = np.arange(len(mob))

    cidx = np.asarray(system.constraints.idx).reshape(-1, 2)
    if len(cidx):
        in_mob = mapping[cidx] >= 0
        if (in_mob.any(1) & ~in_mob.all(1)).any():
            return None  # mixed mobile/frozen constraint
        keep = in_mob.all(1)
        cons_m = Constraints(
            mapping[cidx[keep]].astype(np.int32),
            np.asarray(system.constraints.dist)[keep],
        )
    else:
        cons_m = Constraints.empty()
    masses_m = masses[mob]

    move_m, ok = _remap_move(move, mapping, masses_m, mob)
    if not ok:
        return None

    x_frozen = jnp.asarray(np.asarray(system.frozen_ref_positions), jnp.float32)
    mob_j = jnp.asarray(mob)

    def full_of(xm):
        return x_frozen.astype(xm.dtype).at[mob_j].set(xm)

    def efn_m(xm, box=None, globals_=None):
        return efn(full_of(xm), box, globals_)

    def ffn_m(xm, box=None, globals_=None):
        e, f = ffn(full_of(xm), box, globals_)
        return e, f[mob_j]

    e0f0 = getattr(efn, "lambda_e0_f0", None)
    eafa = getattr(efn, "lambda_ea_fa", None)
    if e0f0 is not None and eafa is not None:

        def _slice(ef):
            e, f = ef
            return e, f[mob_j]

        efn_m.lambda_e0_f0 = lambda xm, box=None: _slice(e0f0(full_of(xm), box))
        efn_m.lambda_ea_fa = lambda xm, box=None, g=None: _slice(
            eafa(full_of(xm), box, g)
        )

    return MobileCompaction(
        mobile_idx=mob,
        masses_m=masses_m,
        efn_m=efn_m,
        ffn_m=ffn_m,
        constraints_m=cons_m,
        move_m=move_m,
        x_frozen=x_frozen,
    )
