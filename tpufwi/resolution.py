"""Resolution analysis on the Gauss-Newton Hessian H = F^T F.

Classic FWI resolution/uncertainty tooling [GENRE: Fichtner & Trampert
2011 Hessian kernels; point-spread-function probing]: everything here is
a thin composition of the Born pair (lsrtm.born_operators — forward-mode
jvp F, boundary-saving exact transpose F^T), so each PSF costs one
linearized forward + one adjoint, independent of grid size.

- ``psf``: H applied to point scatterers — the point-spread function(s)
  of the acquisition + physics at the linearization point. A perfectly
  resolved model would give back the spikes; the actual blur (and its
  side lobes / acquisition footprint) IS the local resolution.
- ``hessian_diag_points``: exact diag entries ||F e_j||^2 at chosen
  points (one jvp each) — the pointwise sensitivity the illumination
  preconditioner approximates.
- ``hessian_diag_probe``: Hutchinson estimate of the full diag(H) field
  with Rademacher probes, diag ~ mean_k z_k * (H z_k) — an O(n_probes
  * shot-pair) estimate of the same field everywhere; used as a
  data-driven preconditioner or a first-order posterior-variance proxy
  (Laplace: var ~ 1/(diag H + damping)).

All outputs live on the valid interior (margin radius+1 zeroed), where
F^T is the exact transpose of F (lsrtm.py docstring).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .lsrtm import born_operators


def _interior_mask(grid, dtype) -> jnp.ndarray:
    m = grid.radius + 1
    mask = np.zeros(grid.shape, bool)
    mask[(slice(m, -m),) * grid.ndim] = True
    return jnp.asarray(mask, dtype)


def psf(
    problem,
    vp_mig: jnp.ndarray,
    points: Sequence[Tuple[int, ...]],
    amplitude: float = 1.0,
    fmax: Optional[float] = None,
) -> jnp.ndarray:
    """Point-spread function image: H (sum of point scatterers).

    ``points`` are grid indices (z, x) / (y, z, x) on the UNPADDED grid;
    place them >= a few wavelengths apart or the PSFs overlap (that
    overlap is itself the classic inter-parameter leakage diagnostic).
    Returns the image (same shape as vp_mig)."""
    grid = problem.prop.grid
    dm = np.zeros(grid.shape, np.asarray(vp_mig).dtype)
    for pt in points:
        dm[tuple(int(c) for c in pt)] = amplitude
    F, Ft, _ = born_operators(problem, vp_mig, fmax)
    dm = jnp.asarray(dm) * _interior_mask(grid, dm.dtype)
    return Ft(F(dm))


def hessian_diag_points(
    problem,
    vp_mig: jnp.ndarray,
    points: Sequence[Tuple[int, ...]],
    fmax: Optional[float] = None,
) -> np.ndarray:
    """Exact diag(H) entries ||F e_j||^2 at ``points`` (one jvp each)."""
    grid = problem.prop.grid
    F, _, _ = born_operators(problem, vp_mig, fmax)
    out = []
    for pt in points:
        e = np.zeros(grid.shape, np.asarray(vp_mig).dtype)
        e[tuple(int(c) for c in pt)] = 1.0
        d = F(jnp.asarray(e))
        out.append(float(jnp.vdot(d, d).real))
    return np.asarray(out)


def hessian_diag_probe(
    problem,
    vp_mig: jnp.ndarray,
    n_probes: int = 16,
    fmax: Optional[float] = None,
    seed: int = 0,
) -> jnp.ndarray:
    """Hutchinson diag(H) estimate: mean over Rademacher probes of
    z * (H z). Unbiased; the estimator variance at cell j is
    sum_{k != j} H_jk^2, so band-limited side lobes make single-probe
    estimates noisy — n_probes ~ 16-64 gives a usable preconditioner
    field (tests/test_resolution.py measures the point-wise spread).
    Returns the diag field on the valid interior (margin zeroed)."""
    grid = problem.prop.grid
    F, Ft, _ = born_operators(problem, vp_mig, fmax)
    mask = _interior_mask(grid, np.asarray(vp_mig).dtype)
    rng = np.random.default_rng(seed)
    acc = jnp.zeros(grid.shape, np.asarray(vp_mig).dtype)
    for _ in range(n_probes):
        z = jnp.asarray(
            rng.choice(np.asarray([-1.0, 1.0], np.asarray(vp_mig).dtype),
                       size=grid.shape)
        ) * mask
        acc = acc + z * Ft(F(z))
    return acc / n_probes
