"""First-arrival eikonal solver + traveltime tomography (initial-model
building for FWI).

Solves |grad t| = s (slowness s = 1/v) with the Godunov upwind
discretization [GENRE: Rouy & Tourin 1992; Zhao 2005 fast sweeping].
Instead of the sequential four-direction sweeps (hostile to SPMD
hardware), we iterate the SAME upwind update as a Jacobi fixed point
over the whole grid under `lax.scan`: every cell recomputes its
traveltime from its smallest upwind neighbours, monotonically
decreasing from a large init. Each iteration is one vectorized
stencil (TPU-shaped); information advances >= 1 cell per iteration, so
``n_iter ~ a few * max(shape)`` converges on smooth media — the classic
parallel/Jacobi fast-sweeping trade [GENRE: Detrixhe et al. 2013].

Differentiable: the solver is a fixed number of jnp ops, so slowness
gradients flow by plain AD (remat over the scan keeps memory at
O(sqrt(n_iter) * grid)); where the fixed point has converged the
unrolled gradient approaches the implicit-function one.
``traveltime_tomography`` uses exactly that to fit picked first breaks
— the standard initial-model builder ahead of multiscale FWI.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .grid import Grid
from .propagators.remat import checkpointed_scan


def _upwind_pair(t, axis, h):
    """Per-cell smallest upwind neighbour along ``axis`` (edge cells see
    only their single interior neighbour)."""
    big = jnp.asarray(jnp.inf, t.dtype)
    lo = jnp.concatenate(
        [jnp.full_like(jax.lax.slice_in_dim(t, 0, 1, axis=axis), big),
         jax.lax.slice_in_dim(t, 0, t.shape[axis] - 1, axis=axis)],
        axis=axis)
    hi = jnp.concatenate(
        [jax.lax.slice_in_dim(t, 1, t.shape[axis], axis=axis),
         jnp.full_like(jax.lax.slice_in_dim(t, 0, 1, axis=axis), big)],
        axis=axis)
    return jnp.minimum(lo, hi)


def _godunov_update(t, s, hs):
    """One Jacobi pass of the Godunov upwind solution of |grad t| = s,
    any ndim [GENRE: Rouy-Tourin / Zhao 2005].

    With a_i the smallest upwind neighbour along axis i, the update is
    the minimum over every non-empty axis subset S of the root of
    sum_{i in S} ((t - a_i)/h_i)^2 = s^2 that satisfies the upwind
    condition t >= max_{i in S} a_i (candidates violating it, or with a
    non-finite member, are discarded). The one-axis subsets a_i + s h_i
    are always valid for finite a_i, so the minimum exists. This
    enumeration (3 subsets in 2D, 7 in 3D) is the sorted-case analysis
    of the classic scheme written branch-free for SIMD hardware."""
    from itertools import combinations

    ndim = t.ndim
    nbrs = [_upwind_pair(t, ax, hs[ax]) for ax in range(ndim)]
    ws = [1.0 / float(hs[ax]) ** 2 for ax in range(ndim)]
    big = jnp.asarray(jnp.inf, t.dtype)

    best = None
    for r in range(1, ndim + 1):
        for sub in combinations(range(ndim), r):
            finite = None
            for ax in sub:
                f = jnp.isfinite(nbrs[ax])
                finite = f if finite is None else (finite & f)
            # zero out non-finite members so the arithmetic stays NaN-free;
            # the candidate is discarded via `finite` anyway
            a = [jnp.where(jnp.isfinite(nbrs[ax]), nbrs[ax], 0.0)
                 for ax in sub]
            A = sum(ws[ax] for ax in sub)
            B = sum(w * ai for w, ai in zip((ws[ax] for ax in sub), a))
            C = sum(w * ai * ai
                    for w, ai in zip((ws[ax] for ax in sub), a)) - s * s
            disc = B * B - A * C
            ok = finite & (disc >= 0.0)
            tc = (B + jnp.sqrt(jnp.where(ok, disc, 0.0))) / A
            amax = a[0]
            for ai in a[1:]:
                amax = jnp.maximum(amax, ai)
            ok = ok & (tc >= amax)
            cand = jnp.where(ok, tc, big)
            best = cand if best is None else jnp.minimum(best, cand)
    return best


def eikonal(
    slowness: jax.Array,
    h: Sequence[float],
    src_idx: jax.Array,
    n_iter: int = 0,
    t0: Optional[jax.Array] = None,
) -> jax.Array:
    """First-arrival traveltime field t(x) for point source(s).

    Args:
      slowness: 1/v on the UNPADDED grid (any ndim >= 1).
      h: cell sizes per axis.
      src_idx: (nsrc, ndim) integer cell indices — multiple sources give
        the min-over-sources field (simultaneous ignition).
      n_iter: Jacobi iterations; 0 picks 3 * max(shape) (safe for smooth
        media; strongly refracting media may need more — the field is
        monotone decreasing, so more never hurts).
      t0: optional warm start (e.g. the previous tomography iterate's
        field) — must be >= the true solution pointwise.

    Differentiable in ``slowness`` (remat scan). The source cells are
    pinned to zero; sub-cell source positions can be emulated by seeding
    ``t0`` with an analytic local field."""
    s = jnp.asarray(slowness)
    hs = tuple(float(x) for x in h)
    ndim = s.ndim
    src = jnp.atleast_2d(jnp.asarray(src_idx))
    src_t = tuple(src[:, d] for d in range(ndim))
    big = jnp.asarray(np.finfo(jnp.result_type(s.dtype)).max / 8, s.dtype)
    init = (jnp.full(s.shape, big, s.dtype) if t0 is None
            else jnp.asarray(t0, s.dtype))
    # analytic source seeding: the first-order Godunov scheme's dominant
    # error is the O(h) kink at the point-source singularity [GENRE:
    # factored eikonal, Fomel et al. 2009]. Seed t = s(src) * r on cells
    # near each source (exact for locally constant slowness) so the
    # iteration grows an already-round front.
    grids = jnp.meshgrid(
        *[jnp.arange(n, dtype=s.dtype) for n in s.shape], indexing="ij")
    seed_min = jnp.full(s.shape, big, s.dtype)
    for k in range(src.shape[0]):
        r2 = sum(((grids[d] - src[k, d].astype(s.dtype)) * hs[d]) ** 2
                 for d in range(ndim))
        r = jnp.sqrt(r2)
        seed = jnp.where(r <= 5.0 * max(hs), s[src_t][k] * r, big)
        seed_min = jnp.minimum(seed_min, seed)
    init = jnp.minimum(init, seed_min)
    init = init.at[src_t].set(0.0)
    n = int(n_iter) if n_iter else 3 * max(s.shape)

    def body_mono(t, _):
        # monotone phase: min against the current value guarantees the
        # decreasing fixed-point iteration converges from the big init
        t = jnp.minimum(t, _godunov_update(t, s, hs))
        t = t.at[src_t].set(0.0)
        return t, jnp.zeros((0,), s.dtype)

    def body_pure(t, _):
        # differentiable phase: at the fixed point min(t, G(t)) == G(t),
        # so replacing the value leaves the primal unchanged — but AD
        # through the bare update unrolls the Neumann series
        # sum_j (dG/dt)^j dG/ds of the implicit-function gradient,
        # whereas AD through the tied min starves it (measured: FD rel
        # err 0.31 via min-only vs 3e-8 with this polish). The analytic
        # source seed is re-imposed (it beats the one-step Godunov
        # recomputation near the singularity and is itself differentiable
        # in s, so the min's seed branch carries a correct gradient).
        t = jnp.minimum(_godunov_update(t, s, hs), seed_min)
        t = t.at[src_t].set(0.0)
        return t, jnp.zeros((0,), s.dtype)

    ck = max(8, int(np.sqrt(n) + 0.5))
    t, _ = checkpointed_scan(body_mono, init, jnp.zeros((n,), s.dtype), ck)
    t, _ = checkpointed_scan(body_pure, t, jnp.zeros((n,), s.dtype), ck)
    return t


def first_breaks(seis: jax.Array, dt: float, frac: float = 0.05) -> jax.Array:
    """Amplitude-threshold first-break picker: per trace, the first
    sample where |amplitude| exceeds ``frac`` of that trace's peak.
    Returns picks in seconds, shape (nrec,) for (nt, nrec) input (leading
    batch dims pass through). Crude but bias-consistent when applied to
    observed and synthetic data alike."""
    a = jnp.abs(seis)
    thr = frac * a.max(axis=-2, keepdims=True)
    hit = a >= thr
    idx = jnp.argmax(hit, axis=-2)  # first True along time
    return idx.astype(a.dtype) * dt


def traveltime_tomography(
    slowness0: jax.Array,
    h: Sequence[float],
    src_list: jax.Array,
    rcv_idx: jax.Array,
    t_obs: jax.Array,
    n_outer: int = 20,
    n_iter: int = 0,
    bounds: Optional[tuple] = None,
    smooth: Optional[Callable[[jax.Array], jax.Array]] = None,
    log_fn: Optional[Callable[[dict], None]] = None,
) -> jax.Array:
    """First-arrival traveltime tomography: fit picked times with the
    differentiable eikonal solver — the standard long-wavelength
    initial-model builder ahead of multiscale FWI [GENRE].

    Args:
      slowness0: starting 1/v field.
      src_list: (nshot, ndim) source cells; rcv_idx: (nrec, ndim)
        receiver cells (shared across shots); t_obs: (nshot, nrec)
        picked first-break times.
      bounds: optional (smin, smax) slowness box.
      smooth: optional gradient conditioner (e.g.
        precondition.gaussian_smooth partial) — tomography gradients are
        ray-thin; smoothing spreads them into the tomographic null space
        the same way FWI preconditioning does.

    Returns the inverted slowness. Uses L-BFGS (optimize.minimize) on
    J(s) = 0.5 sum (t_pred - t_obs)^2."""
    from .optimize import minimize

    rcv = tuple(jnp.asarray(rcv_idx)[:, d] for d in range(slowness0.ndim))
    srcs = jnp.atleast_2d(jnp.asarray(src_list))

    def predict(s):
        return jnp.stack([
            eikonal(s, h, srcs[i : i + 1], n_iter=n_iter)[rcv]
            for i in range(srcs.shape[0])
        ])

    def loss(s):
        r = predict(s) - t_obs
        return 0.5 * jnp.sum(r * r)

    vg = jax.jit(jax.value_and_grad(loss))

    def f_and_g(s):
        J, g = vg(s)
        if smooth is not None:
            g = smooth(g)
        return J, g

    cb = None
    if log_fn is not None:
        cb = lambda x, info: log_fn({"iter": info.it, "J": float(info.f)})
    s_star, _ = minimize(f_and_g, slowness0, n_outer, bounds=bounds,
                         callback=cb)
    return s_star
