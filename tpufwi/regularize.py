"""Model regularization terms for FWI (Tikhonov / total variation).

Each term is a differentiable scalar functional R(m) added to the data
misfit as J = J_data + weight * R(m); the optimizer sees one objective,
so L-BFGS/NLCG/line search work unchanged. Gradients come from AD —
O(grid) elementwise/stencil math that XLA fuses into the update step.

Scaling convention: both terms are normalized by the cell count so
``weight`` has comparable meaning across grid sizes; first differences
are per-cell (unit spacing) — fold physical anisotropy into ``weight``
if h differs per axis.
"""

from __future__ import annotations

import jax.numpy as jnp


def _diffs(m: jnp.ndarray):
    """Forward first differences along every axis (valid interior)."""
    out = []
    for ax in range(m.ndim):
        a = [slice(None)] * m.ndim
        b = [slice(None)] * m.ndim
        a[ax] = slice(1, None)
        b[ax] = slice(None, -1)
        out.append(m[tuple(a)] - m[tuple(b)])
    return out


def tikhonov(m: jnp.ndarray) -> jnp.ndarray:
    """First-order Tikhonov: mean of |grad m|^2 — smooth models."""
    return sum(jnp.sum(d * d) for d in _diffs(m)) / m.size


def total_variation(m: jnp.ndarray, eps: float = 1.0) -> jnp.ndarray:
    """Smoothed isotropic TV: mean of sqrt(|grad m|^2 + eps^2) — edge-
    preserving (blocky) models [GENRE: Rudin-Osher-Fatemi]. ``eps`` in
    model units (m/s) rounds the kink at zero gradient; values around
    the expected per-cell velocity jump / 100 behave like exact TV."""
    ds = _diffs(m)
    # pad each difference back to the full shape so the sum is pointwise
    g2 = None
    for ax, d in enumerate(ds):
        pad = [(0, 0)] * m.ndim
        pad[ax] = (0, 1)
        d2 = jnp.pad(d * d, pad)
        g2 = d2 if g2 is None else g2 + d2
    return jnp.sum(jnp.sqrt(g2 + eps * eps) - eps) / m.size


#: Registry for config selection (FwiConfig.reg; wired in invert.py's
#: stage loop so both value_and_grad AND the line-search loss carry the
#: term).
REGULARIZERS = {
    "tikhonov": tikhonov,
    "tv": total_variation,
}
