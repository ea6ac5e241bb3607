"""Nonlinear conjugate gradient, Polak-Ribiere+ with automatic restart
(SURVEY.md §2 `optimize/nlcg.py`; Nocedal & Wright [GENRE])."""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax.numpy as jnp


@dataclasses.dataclass
class NlcgState:
    g_prev: Optional[jnp.ndarray] = None
    d_prev: Optional[jnp.ndarray] = None

    def reset(self):
        self.g_prev = None
        self.d_prev = None


def nlcg_direction(state: NlcgState, g: jnp.ndarray) -> jnp.ndarray:
    """d_k = -g_k + beta_PR+ * d_{k-1}; restarts to steepest descent when
    beta < 0 or when the new direction fails the descent test."""
    if state.g_prev is None or state.d_prev is None:
        d = -g
    else:
        gg_prev = float(jnp.vdot(state.g_prev, state.g_prev))
        beta = float(jnp.vdot(g, g - state.g_prev)) / max(gg_prev, 1e-300)
        beta = max(beta, 0.0)  # PR+
        d = -g + beta * state.d_prev
        if float(jnp.vdot(d, g)) >= 0.0:  # not a descent direction: restart
            d = -g
    state.g_prev = g
    state.d_prev = d
    return d
