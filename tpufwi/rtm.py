"""Reverse-time migration (RTM) on the FWI adjoint machinery.

The zero-lag cross-correlation RTM image is exactly the FWI gradient
evaluated at a smooth (non-reflecting) migration velocity [GENRE:
Lailly 1983 / Tarantola 1984 — migration as the first gradient step]:
with smooth vp the synthetics contain only direct/diving energy, which
cancels against the data's direct arrivals in the residual, so the
back-propagated residual is the (negated) reflected field and the
boundary-saving imaging condition (adjoint.py) produces the migrated
section. Everything — engines, sharding, band limits — is inherited
from FwiProblem; this module only adds the standard RTM post-processing
chain (illumination normalization, source-imprint mask, Laplacian
high-pass against low-wavenumber backscatter artifacts).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from .kernels.stencils import apply_stencil
from .precondition import precondition


def laplacian_filter(img: jnp.ndarray) -> jnp.ndarray:
    """Sum of second differences over all axes (unit spacing — scale is
    irrelevant for imaging): the standard RTM high-pass that removes the
    low-wavenumber source/receiver backscatter halo."""
    out = None
    for ax in range(img.ndim):
        d = apply_stencil(img, (1.0, -2.0, 1.0), ax)
        out = d if out is None else out + d
    return -out  # -Laplacian keeps the reflector polarity of the input


def migrate(
    problem,
    vp_mig: jnp.ndarray,
    fmax: Optional[float] = None,
    illum_eps: float = 1e-3,
    mask_top: int = 0,
    laplace: bool = True,
    smooth_sigma: float = 0.0,
) -> jnp.ndarray:
    """RTM image from a FwiProblem and a smooth migration velocity.

    Args:
      problem: invert.FwiProblem (any engine / mesh / misfit — the image
        uses the L2 gradient path regardless of problem.misfit).
      vp_mig: smooth migration velocity on the physical grid.
      fmax: optional band limit (same in-misfit response as an FWI stage).
      illum_eps, mask_top, smooth_sigma: precondition() knobs.
      laplace: apply the Laplacian artifact filter.

    Returns the migrated image (same shape as vp_mig); positive polarity
    at impedance increases.
    """
    vg, _ = problem.stage_objectives(fmax)
    _, g = vg(vp_mig)
    # -gradient: the residual at a smooth model is (direct - data) ~
    # -reflections, so the gradient carries a minus sign relative to
    # reflectivity
    img = -g
    illum = problem.stage_illumination(vp_mig, fmax)
    img = precondition(
        img,
        illum=illum,
        illum_eps=illum_eps,
        mask_top=mask_top,
        smooth_sigma=smooth_sigma,
    )
    if laplace:
        img = laplacian_filter(img)
        if mask_top > 0:  # re-mask the filter's ring at the mask edge
            img = img.at[:mask_top].set(0.0)
    return img
