"""Gradient preconditioning (spec north star; SURVEY.md §2 `precondition.py`).

Source-illumination pseudo-Hessian division [GENRE: Shin et al. 2001],
depth weighting, top-of-model (water/source) masking, and Gaussian
smoothing — all pure JAX elementwise/separable-stencil ops that XLA fuses.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .kernels.stencils import apply_stencil


def gaussian_smooth(g: jnp.ndarray, sigma: float) -> jnp.ndarray:
    """Separable Gaussian blur with static sigma (in cells)."""
    if sigma <= 0:
        return g
    r = max(1, int(3.0 * sigma + 0.5))
    x = np.arange(-r, r + 1)
    k = np.exp(-0.5 * (x / sigma) ** 2)
    k /= k.sum()
    taps = tuple(float(v) for v in k)
    for ax in range(g.ndim):
        g = apply_stencil(g, taps, ax)
    return g


def precondition(
    g: jnp.ndarray,
    illum: jnp.ndarray | None = None,
    illum_eps: float = 1e-3,
    depth_power: float = 0.0,
    dz: float = 1.0,
    mask_top: int = 0,
    smooth_sigma: float = 0.0,
    z_axis: int = 0,
) -> jnp.ndarray:
    """Apply the standard FWI gradient preconditioning chain.

    Args:
      g: raw gradient on the physical grid.
      illum: source illumination sum_t p^2 (same shape as g) or None.
      illum_eps: stabilization, relative to max(illum).
      depth_power: multiply by (z*dz)^power to counter geometric spreading.
      mask_top: zero the first `mask_top` cells along the z axis (water layer
        / source imprint).
      smooth_sigma: Gaussian smoothing radius in cells (0 = off).
    """
    if illum is not None:
        g = g / (illum + illum_eps * jnp.max(illum))
    if depth_power != 0.0:
        nz = g.shape[z_axis]
        z = (jnp.arange(nz, dtype=g.dtype) + 1.0) * dz
        shape = [1] * g.ndim
        shape[z_axis] = nz
        g = g * (z**depth_power).reshape(shape)
    if mask_top > 0:
        idx = [slice(None)] * g.ndim
        idx[z_axis] = slice(0, mask_top)
        g = g.at[tuple(idx)].set(0.0)
    if smooth_sigma > 0:
        g = gaussian_smooth(g, smooth_sigma)
    return g
