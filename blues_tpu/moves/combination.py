"""Sequential composition of moves (CombinationMove,
reference: blues/moves.py:1517-1556): execute the listed moves in order or
in reverse order with probability 1/2 each, preserving detailed balance.
(The reference implementation is flagged untested and has a known
self.move_list/self.moves attribute bug, reference :1530-1531 +
README.md:107; this one is tested.)"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .base import Move


class CombinationMove(Move):
    def __init__(self, moves):
        self.moves = list(moves)

    @property
    def teleports(self):
        return any(m.teleports for m in self.moves)

    def init_aux(self):
        return [m.init_aux() for m in self.moves]

    def before(self, key, x, v, box):
        auxs = []
        for m in self.moves:
            key, sub = jax.random.split(key)
            x, v, a = m.before(sub, x, v, box)
            auxs.append(a)
        return x, v, auxs

    def propose(self, key, x, box, auxs):
        key, kdir = jax.random.split(key)
        forward = jax.random.bernoulli(kdir)

        def run(order_moves, operand):
            x, key = operand
            new_auxs = list(auxs)
            for idx, m in order_moves:
                key, sub = jax.random.split(key)
                x, new_auxs[idx] = m.propose(sub, x, box, auxs[idx])
            return x, new_auxs

        fwd = list(enumerate(self.moves))
        x_new, new_auxs = jax.lax.cond(
            forward,
            lambda op: run(fwd, op),
            lambda op: run(fwd[::-1], op),
            (x, key),
        )
        return x_new, new_auxs

    def after(self, key, x, box, auxs):
        veto = jnp.zeros((), bool)
        for m, a in zip(self.moves, auxs):
            key, sub = jax.random.split(key)
            veto = veto | m.after(sub, x, box, a)
        return veto
