"""Backtracking-Armijo line search with parabolic interpolation and
optional box projection (SURVEY.md §2 `optimize/linesearch.py`).

Host-side control flow (a handful of scalar decisions per outer iteration);
every trial evaluation is one call of the user's jitted loss — for FWI that
is a tape-free forward propagation (the custom-VJP primal path).
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional, Tuple

import jax.numpy as jnp


class LineSearchResult(NamedTuple):
    alpha: float
    x_new: jnp.ndarray
    f_new: float
    n_evals: int
    success: bool


def backtracking_line_search(
    f: Callable[[jnp.ndarray], jnp.ndarray],
    x: jnp.ndarray,
    fx: float,
    g: jnp.ndarray,
    d: jnp.ndarray,
    alpha0: float = 1.0,
    c1: float = 1e-4,
    shrink: float = 0.5,
    max_evals: int = 12,
    bounds: Optional[Tuple[float, float]] = None,
) -> LineSearchResult:
    """Armijo backtracking: find alpha with
    f(P(x + alpha d)) <= fx + c1 * <g, P(x + alpha d) - x>
    where P projects onto [bounds] (identity if None).

    The first backtrack uses the minimizer of the parabola through
    (0, fx), (alpha, f_trial) with slope gd at 0; later ones shrink
    geometrically. Safeguarded to [0.1, 0.5] * alpha.
    """

    def project(z):
        return jnp.clip(z, bounds[0], bounds[1]) if bounds is not None else z

    gd = float(jnp.vdot(g, d))
    if gd >= 0.0:
        # not a descent direction — caller should reset; signal failure
        return LineSearchResult(0.0, x, fx, 0, False)

    alpha = float(alpha0)
    n = 0
    while n < max_evals:
        x_trial = project(x + alpha * d)
        f_trial = float(f(x_trial))
        n += 1
        # Armijo on the projected step (projected-gradient form)
        decrease = float(jnp.vdot(g, x_trial - x))
        if jnp.isfinite(f_trial) and f_trial <= fx + c1 * decrease and decrease < 0.0:
            return LineSearchResult(alpha, x_trial, f_trial, n, True)
        # parabolic interpolation for the next trial
        denom = f_trial - fx - alpha * gd
        if denom > 0.0 and jnp.isfinite(f_trial):
            alpha_new = -0.5 * alpha * alpha * gd / denom
            alpha = float(min(max(alpha_new, 0.1 * alpha), 0.5 * alpha))
        else:
            alpha *= shrink
    return LineSearchResult(0.0, x, fx, n, False)
