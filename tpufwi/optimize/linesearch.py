"""Line searches: backtracking-Armijo (cheap trials: tape-free forward
only) and strong-Wolfe bracket+zoom (Nocedal & Wright alg. 3.5/3.6; each
trial evaluates value AND gradient, guaranteeing curvature pairs for
L-BFGS). SURVEY.md §2 `optimize/linesearch.py`.

Host-side control flow (a handful of scalar decisions per outer iteration);
every trial evaluation is one call of the user's jitted loss — for FWI that
is a tape-free forward propagation (the custom-VJP primal path), or a
fwd+adjoint pair for the Wolfe trials.
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


class WolfeResult(NamedTuple):
    alpha: float
    x_new: jnp.ndarray
    f_new: float
    g_new: Optional[jnp.ndarray]  # gradient at x_new (reused by the driver)
    n_evals: int
    success: bool


def _dot64(a, b):
    """Host-side f64 inner product: fp32 model gradients can be ~1e-23,
    whose squared sums underflow f32 accumulation to +-0 and break the
    descent test (gd >= 0). Tiny host transfer, once per trial."""
    import numpy as _np

    return float(_np.vdot(_np.asarray(a, _np.float64), _np.asarray(b, _np.float64)))


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

    gd = _dot64(g, d)
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
        decrease = _dot64(g, x_trial - x)
        if jnp.isfinite(f_trial) and f_trial <= fx + c1 * decrease and decrease < 0.0:
            return LineSearchResult(alpha, x_trial, f_trial, n, True)
        # far outside the trust region (non-finite, or orders of magnitude
        # above f): dive fast — the 0.1-safeguarded parabola below can only
        # shrink 10x per eval, which cannot recover from a wildly
        # overscaled alpha0 (tiny-amplitude objectives make the
        # 0.01*xscale/|d| first guess arbitrarily large)
        if (not bool(jnp.isfinite(f_trial))) or f_trial > 100.0 * abs(fx) + 1e-300:
            alpha *= 1e-3
            continue
        # parabolic interpolation for the next trial
        denom = f_trial - fx - alpha * gd
        if denom > 0.0:
            alpha_new = -0.5 * alpha * alpha * gd / denom
            alpha = float(min(max(alpha_new, 0.1 * alpha), 0.5 * alpha))
        else:
            alpha *= shrink
    return LineSearchResult(0.0, x, fx, n, False)


def strong_wolfe_line_search(
    value_and_grad: Callable,
    x: jnp.ndarray,
    fx: float,
    g: jnp.ndarray,
    d: jnp.ndarray,
    alpha0: float = 1.0,
    c1: float = 1e-4,
    c2: float = 0.9,
    max_evals: int = 10,
    alpha_max: float = 1e6,
    bounds: Optional[Tuple[float, float]] = None,
) -> WolfeResult:
    """Strong-Wolfe bracket + zoom [GENRE: Nocedal & Wright alg 3.5/3.6]:
    find alpha with  f(x+ad) <= f + c1 a g'd  and  |g(x+ad)'d| <= c2 |g'd|.

    Every trial costs a full value_and_grad (for FWI: fwd+adjoint), but the
    curvature condition guarantees s'y > 0, so L-BFGS never rejects the
    pair. The search runs on the unprojected line; the accepted point is
    box-projected afterwards (exact whenever the step stays interior, the
    normal FWI situation with sane velocity bounds).
    """

    def project(z):
        return jnp.clip(z, bounds[0], bounds[1]) if bounds is not None else z

    gd0 = _dot64(g, d)
    if gd0 >= 0.0:
        return WolfeResult(0.0, x, fx, None, 0, False)

    evals = [0]

    def phi(a):
        xt = x + a * d
        f_t, g_t = value_and_grad(xt)
        evals[0] += 1
        return float(f_t), _dot64(g_t, d), xt, g_t

    def interp(a_lo, a_hi, f_lo, gd_lo, f_hi):
        """Safeguarded cubic-ish trial inside (a_lo, a_hi): minimizer of the
        quadratic through (a_lo, f_lo, gd_lo) and (a_hi, f_hi), clamped."""
        da = a_hi - a_lo
        denom = f_hi - f_lo - gd_lo * da
        if denom > 0.0:
            a_t = a_lo - 0.5 * gd_lo * da * da / denom
        else:
            a_t = a_lo + 0.5 * da
        lo, hi = (a_lo, a_hi) if a_lo < a_hi else (a_hi, a_lo)
        margin = 0.1 * (hi - lo)
        return float(min(max(a_t, lo + margin), hi - margin))

    def zoom(a_lo, a_hi, f_lo, gd_lo, f_hi):
        while evals[0] < max_evals:
            a_j = interp(a_lo, a_hi, f_lo, gd_lo, f_hi)
            f_j, gd_j, xt, gt = phi(a_j)
            if (not jnp.isfinite(f_j)) or f_j > fx + c1 * a_j * gd0 or f_j >= f_lo:
                a_hi, f_hi = a_j, f_j
            else:
                if abs(gd_j) <= -c2 * gd0:
                    return WolfeResult(a_j, project(xt), f_j, gt, evals[0], True)
                if gd_j * (a_hi - a_lo) >= 0.0:
                    a_hi, f_hi = a_lo, f_lo
                a_lo, f_lo, gd_lo = a_j, f_j, gd_j
        # budget exhausted: Armijo point is still a safe decrease
        if f_lo < fx and a_lo > 0.0:
            xt = x + a_lo * d
            return WolfeResult(a_lo, project(xt), f_lo, None, evals[0], True)
        return WolfeResult(0.0, x, fx, None, evals[0], False)

    a_prev, f_prev, gd_prev = 0.0, fx, gd0
    alpha = float(min(alpha0, alpha_max))
    first = True
    while evals[0] < max_evals:
        f_i, gd_i, xt, gt = phi(alpha)
        if (not jnp.isfinite(f_i)) or f_i > fx + c1 * alpha * gd0 or (
            not first and f_i >= f_prev
        ):
            return zoom(a_prev, alpha, f_prev, gd_prev, f_i)
        if abs(gd_i) <= -c2 * gd0:
            return WolfeResult(alpha, project(xt), f_i, gt, evals[0], True)
        if gd_i >= 0.0:
            return zoom(alpha, a_prev, f_i, gd_i, f_prev)
        a_prev, f_prev, gd_prev = alpha, f_i, gd_i
        alpha = min(2.0 * alpha, alpha_max)
        if a_prev >= alpha_max:
            break
        first = False
    if f_prev < fx and a_prev > 0.0:  # ran out of budget while descending
        return WolfeResult(
            a_prev, project(x + a_prev * d), f_prev, None, evals[0], True
        )
    return WolfeResult(0.0, x, fx, None, evals[0], False)
