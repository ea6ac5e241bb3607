"""Generic bound-constrained minimize() driving L-BFGS or NLCG with the
Armijo line search (SURVEY.md §1 'optimization -> driver' interface:
minimize(f_and_g, m0, bounds, precond) -> m*)."""

from __future__ import annotations

import dataclasses
import time
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp

from .lbfgs import LbfgsHistory, lbfgs_direction
from .linesearch import backtracking_line_search, strong_wolfe_line_search
from .nlcg import NlcgState, nlcg_direction


@dataclasses.dataclass
class IterInfo:
    it: int
    f: float
    gnorm: float
    alpha: float
    n_evals: int
    seconds: float


def minimize(
    value_and_grad: Callable,
    x0: jnp.ndarray,
    iterations: int,
    method: str = "lbfgs",
    bounds: Optional[Tuple[float, float]] = None,
    precond: Optional[Callable] = None,
    lbfgs_m: int = 10,
    callback: Optional[Callable[[jnp.ndarray, IterInfo], None]] = None,
    loss_only: Optional[Callable] = None,
    gtol: float = 0.0,
    hist: Optional[LbfgsHistory] = None,
    init_alpha: Optional[float] = None,
    linesearch: str = "armijo",
    wolfe_c2: float = 0.9,
) -> Tuple[jnp.ndarray, list]:
    """Minimize value_and_grad(x) -> (f, g) subject to box bounds.

    Args:
      precond: optional g -> g~ applied before the direction update (the FWI
        illumination/depth/smoothing chain).
      loss_only: cheaper f(x) for line-search trials (defaults to
        value_and_grad(x)[0] — for FWI pass the tape-free forward).
      callback: called after each accepted iterate; a truthy return value
        stops the loop cleanly after that iterate.
      hist: externally owned L-BFGS history (checkpoint/resume); a fresh
        one is created if None.
      init_alpha: resume the previous accepted step length (bit-identical
        continuation across restarts).
      linesearch: "armijo" (cheap loss-only trials) or "wolfe" (strong-Wolfe
        bracket+zoom; each trial costs a value_and_grad but the curvature
        condition guarantees accepted L-BFGS pairs).
      wolfe_c2: curvature constant for linesearch="wolfe".

    Returns (x_final, [IterInfo...]).
    """
    f_only = loss_only if loss_only is not None else (lambda x: value_and_grad(x)[0])

    def project(z):
        return jnp.clip(z, bounds[0], bounds[1]) if bounds is not None else z

    x = project(x0)
    if hist is None:
        hist = LbfgsHistory(m=lbfgs_m)
    cg = NlcgState()
    infos: list = []
    f, g_raw = value_and_grad(x)
    f = float(f)
    g = precond(g_raw) if precond is not None else g_raw
    alpha_prev = init_alpha

    def search(d, alpha0):
        # Wolfe needs the RAW gradient for the curvature condition
        # (phi'(alpha) = <grad f, d>, not the preconditioned surrogate)
        if linesearch == "wolfe":
            return strong_wolfe_line_search(
                value_and_grad, x, f, g_raw, d, alpha0, c2=wolfe_c2, bounds=bounds
            )
        return backtracking_line_search(f_only, x, f, g, d, alpha0, bounds=bounds)

    for it in range(iterations):
        t0 = time.time()
        if method == "lbfgs":
            d = lbfgs_direction(hist, g)
        elif method == "nlcg":
            d = nlcg_direction(cg, g)
        elif method == "gd":
            d = -g
        else:
            raise ValueError(f"unknown method {method!r}")

        # initial step: L-BFGS is well-scaled after the first pair; others
        # reuse the previous accepted alpha (with headroom).
        if method == "lbfgs" and len(hist) > 0:
            alpha0 = 1.0
        elif alpha_prev is not None:
            alpha0 = 2.0 * alpha_prev
        else:
            # first iteration: scale so the step changes x by ~1% of range
            dmax = float(jnp.max(jnp.abs(d)))
            xscale = float(jnp.max(jnp.abs(x))) or 1.0
            alpha0 = 0.01 * xscale / max(dmax, 1e-300)

        ls = search(d, alpha0)
        if not ls.success:
            # reset memory and retry once with steepest descent
            hist.reset()
            cg.reset()
            d = -g
            dmax = float(jnp.max(jnp.abs(d)))
            xscale = float(jnp.max(jnp.abs(x))) or 1.0
            ls = search(d, 0.01 * xscale / max(dmax, 1e-300))
            if not ls.success:
                infos.append(IterInfo(it, f, float(jnp.linalg.norm(g)), 0.0, ls.n_evals, time.time() - t0))
                break

        x_new = ls.x_new
        g_new_raw = getattr(ls, "g_new", None)
        if g_new_raw is not None:
            f_new, extra = ls.f_new, 0  # Wolfe already evaluated (f, g) here
        else:
            (f_new, g_new_raw), extra = value_and_grad(x_new), 1
        f_new = float(f_new)
        g_new = precond(g_new_raw) if precond is not None else g_new_raw
        if method == "lbfgs":
            hist.update(x_new - x, g_new - g)
        alpha_prev = ls.alpha
        x, f, g, g_raw = x_new, f_new, g_new, g_new_raw
        gnorm = float(jnp.linalg.norm(g))
        info = IterInfo(it, f, gnorm, ls.alpha, ls.n_evals + extra, time.time() - t0)
        infos.append(info)
        if callback is not None:
            # a truthy return requests a clean early stop (wall-clock
            # budgets, external cancellation) AFTER the accepted iterate
            # and its checkpoint — never mid-step
            if callback(x, info):
                break
        if gtol and gnorm < gtol:
            break
    return x, infos


def snap_scales_pow2(scales):
    """Snap each scale to the nearest power of two. Scaling only needs
    order-of-magnitude conditioning, and power-of-two factors make the
    u = x/s round trip BITWISE exact in binary floating point — this is
    what lets checkpoint/resume of a scaled multiparameter run continue
    bit-identically (tests/test_resume.py)."""
    import math

    return [2.0 ** round(math.log2(float(s))) for s in scales]


def minimize_pytree(
    value_and_grad: Callable,
    x0_tree,
    iterations: int,
    bounds_tree=None,
    scales_tree=None,
    **kw,
):
    """Multiparameter minimize() over a pytree of model fields (e.g. the
    elastic (vp, vs, rho)) via ravel_pytree. ``bounds_tree`` is a list of
    (lo, hi) scalar pairs, one per flattened leaf of x0_tree; the box
    projection then acts per-field. Extra kwargs are forwarded to
    minimize() (precond/loss_only operate on flat vectors; use the returned
    `unravel` to map back).

    ``scales_tree`` balances parameter classes with wildly different
    magnitudes (vp ~3000 m/s vs Thomsen eps ~0.2): the optimizer works on
    u = x / s per leaf, so L-BFGS's identity initial Hessian and the line
    search's single alpha treat each class comparably — the standard
    multiparameter-FWI nondimensionalization [GENRE: e.g. Operto et al.
    2013 review]. Accepts a list of positive scalars per leaf, or "auto"
    to use the bound range (hi - lo) per leaf (requires bounds_tree; falls
    back to max|x0| per leaf without bounds). None = off (identity).

    Returns (x_tree, infos, unravel) with `unravel` mapping the optimizer's
    flat SCALED vector back to a model pytree (so precond/loss_only kwargs
    compose with it unchanged).
    """
    from jax.flatten_util import ravel_pytree

    flat0, unravel_x = ravel_pytree(x0_tree)
    leaves, treedef = jax.tree.flatten(x0_tree)

    def per_leaf_vec(vals):
        return ravel_pytree(treedef.unflatten(
            [jnp.full_like(x, v) for x, v in zip(leaves, vals)]
        ))[0]

    bounds = None
    if bounds_tree is not None:
        if len(bounds_tree) != len(leaves):
            raise ValueError("bounds_tree must give (lo, hi) per model field")
        bounds = (per_leaf_vec([b[0] for b in bounds_tree]),
                  per_leaf_vec([b[1] for b in bounds_tree]))

    if scales_tree == "auto":
        if bounds_tree is not None:
            scales_tree = [float(hi) - float(lo) for lo, hi in bounds_tree]
        else:
            scales_tree = [max(float(jnp.max(jnp.abs(x))), 1e-30)
                           for x in leaves]
    if scales_tree is not None:
        if len(scales_tree) != len(leaves):
            raise ValueError("scales_tree must give one scale per model field")
        if any(not (float(s) > 0.0) for s in scales_tree):
            raise ValueError(f"scales must be positive, got {scales_tree}")
        scales_tree = snap_scales_pow2(scales_tree)
        svec = per_leaf_vec(scales_tree)
        flat0 = flat0 / svec
        if bounds is not None:
            bounds = (bounds[0] / svec, bounds[1] / svec)
        unravel = lambda u: unravel_x(u * svec)
        grad_to_u = lambda g: g * svec  # chain rule: df/du = df/dx * s
    else:
        unravel = unravel_x
        grad_to_u = lambda g: g

    def vg_flat(v):
        f, g = value_and_grad(unravel(v))
        return f, grad_to_u(ravel_pytree(g)[0])

    # tree-level preconditioning (mask/smooth/illumination per model field).
    # The flat gradient lives in scaled space (g_x * s per leaf); unravel_x
    # gives it model structure, and any per-leaf LINEAR precondition (the
    # whole standard chain) commutes with the constant per-leaf scale, so
    # applying it there is exact.
    precond_tree = kw.pop("precond_tree", None)
    if precond_tree is not None:
        if kw.get("precond") is not None:
            raise ValueError("pass precond_tree or precond, not both")
        kw["precond"] = lambda gv: ravel_pytree(precond_tree(unravel_x(gv)))[0]

    loss_only = kw.pop("loss_only", None)
    if loss_only is not None:
        lo_fn = loss_only
        kw["loss_only"] = lambda v: lo_fn(unravel(v))

    # callback receives the iterate as a MODEL PYTREE in original units
    # (checkpointing/logging should not see the scaled flat vector)
    cb_user = kw.pop("callback", None)
    if cb_user is not None:
        kw["callback"] = lambda v, info: cb_user(unravel(v), info)

    x, infos = minimize(vg_flat, flat0, iterations, bounds=bounds, **kw)
    return unravel(x), infos, unravel
