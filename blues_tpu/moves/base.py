"""Move protocol: pure-function proposals with before/propose/after phases.

Mirrors the reference Move lifecycle hooks `beforeMove` / `move` /
`afterMove` (reference: blues/moves.py:39-145) as pure functions over
(key, positions, velocities, box) so they trace into the NCMC protocol scan:

  before(key, x, v, box)   -> (x, v, aux)      NCMC start (step 0 hook)
  propose(key, x, box, aux) -> (x, aux)        instantaneous midpoint move
  after(key, x, box, aux)  -> veto (bool)      protocol end; True forces
                                               rejection (the reference's
                                               protocol_work = 999999
                                               channel, blues/moves.py:1079)

`aux` is an arbitrary pytree threaded through the phases (e.g. which water
was selected). Every phase must be jax-traceable.
"""

from __future__ import annotations

import jax.numpy as jnp


class Move:
    """Base move: identity in every phase."""

    #: True for moves whose proposal displacement has no local bound
    #: (water hops, pose darting). Drivers disable frozen-system column
    #: culling (potentials.nonbonded frozen_cull_skin) for such moves: the
    #: COM-ball reach bound used by the culling guard does not cover
    #: teleports, and the guard would veto every proposal.
    teleports = False

    def before(self, key, x, v, box):
        return x, v, self.init_aux()

    def propose(self, key, x, box, aux):
        return x, aux

    def after(self, key, x, box, aux):
        return jnp.zeros((), bool)

    def init_aux(self):
        return None

    def select(self, key):
        """Sample a fresh aux for a standalone (no before-phase) proposal —
        the reference's MoveEngine.selectMove used by the pure-MC path
        (blues/simulation.py:1274-1283). Base moves have nothing to sample."""
        return self.init_aux()


class NullMove(Move):
    """Identity move, the reference's test fake
    (NoRandomLigandRotation, reference: blues/tests/test_simulation.py:80-88).
    With no proposal, protocol work ~ 0 and acceptance ~ 1 — a physics check.
    """
