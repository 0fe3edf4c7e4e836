"""MoveEngine: categorical selection among multiple moves.

Equivalent of the reference MoveEngine (blues/moves.py:313-410): holds a
list of moves with normalized probabilities and samples one per NCMC
iteration. Selection is traced (`lax.switch`), so a vmapped replica batch
can have different replicas running different moves in the same launch.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .base import Move


class MoveEngine(Move):
    def __init__(self, moves, probabilities=None):
        if isinstance(moves, Move):
            moves = [moves]
        self.moves = list(moves)
        n = len(self.moves)
        if probabilities is None:
            p = np.full(n, 1.0 / n)
        else:
            p = np.asarray(probabilities, np.float64)
            if len(p) != n:
                raise ValueError("one probability per move required")
            p = p / p.sum()
        self.probabilities = p

    @property
    def teleports(self):
        return any(m.teleports for m in self.moves)

    def _aux(self, selected, auxs):
        return {"selected": selected, "auxs": auxs}

    def init_aux(self):
        return self._aux(jnp.zeros((), jnp.int32), [m.init_aux() for m in self.moves])

    def select(self, key):
        """Sample which move to propose (reference selectMove,
        blues/moves.py:377-383) without running any before-phase."""
        selected = jax.random.choice(
            key, len(self.moves), p=jnp.asarray(self.probabilities)
        ).astype(jnp.int32)
        return self._aux(selected, [m.init_aux() for m in self.moves])

    def before(self, key, x, v, box):
        ksel, kbefore = jax.random.split(key)
        selected = jax.random.choice(
            ksel, len(self.moves), p=jnp.asarray(self.probabilities)
        ).astype(jnp.int32)
        if len(self.moves) == 1:
            x, v, aux = self.moves[0].before(kbefore, x, v, box)
            return x, v, self._aux(selected, [aux])
        # run each move's before under lax.switch; auxs must share structure,
        # so every branch returns the full aux list with its slot updated
        auxs0 = [m.init_aux() for m in self.moves]

        def branch(i):
            def run(operand):
                k, x, v = operand
                xi, vi, aux_i = self.moves[i].before(k, x, v, box)
                auxs = list(auxs0)
                auxs[i] = aux_i
                return xi, vi, auxs

            return run

        x, v, auxs = jax.lax.switch(
            selected, [branch(i) for i in range(len(self.moves))], (kbefore, x, v)
        )
        return x, v, self._aux(selected, auxs)

    def propose(self, key, x, box, aux):
        selected = aux["selected"]
        auxs = aux["auxs"]
        if len(self.moves) == 1:
            xn, a = self.moves[0].propose(key, x, box, auxs[0])
            return xn, self._aux(selected, [a])

        def branch(i):
            def run(operand):
                k, x = operand
                xi, aux_i = self.moves[i].propose(k, x, box, auxs[i])
                new_auxs = list(auxs)
                new_auxs[i] = aux_i
                return xi, new_auxs

            return run

        xn, new_auxs = jax.lax.switch(
            selected, [branch(i) for i in range(len(self.moves))], (key, x)
        )
        return xn, self._aux(selected, new_auxs)

    def after(self, key, x, box, aux):
        selected = aux["selected"]
        auxs = aux["auxs"]
        if len(self.moves) == 1:
            return self.moves[0].after(key, x, box, auxs[0])
        return jax.lax.switch(
            selected,
            [
                (lambda i: lambda op: self.moves[i].after(op[0], op[1], box, auxs[i]))(i)
                for i in range(len(self.moves))
            ],
            (key, x),
        )
