"""CPML (convolutional perfectly-matched layer) absorbing boundary profiles.

Spec C1 (BASELINE.json:5,7). Formulation per Komatitsch & Martin (2007) and
Pasalic & McGarry (2010) for the second-order acoustic form [GENRE]:

    d(l)     = d0 * (l/L)^p,     d0 = -(p+1) * c_max * ln(R0) / (2 L)
    alpha(l) = pi * f0 * (1 - l/L)
    kappa(l) = 1 + (kappa_max - 1) * (l/L)^p
    b        = exp(-(d/kappa + alpha) * dt)
    a        = d * (b - 1) / (kappa * (d + kappa * alpha))

``a`` and ``b`` are zero in the interior, so one uniform (branch-free) update
kernel covers the whole grid and the CPML memory variables stay identically
zero outside the layer — the design chosen in SURVEY.md §7 ("fuse via masked
profile arrays rather than branching").
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import numpy as np


@dataclasses.dataclass(frozen=True)
class CpmlProfile:
    """Per-axis 1-D CPML recursion coefficients on the padded grid.

    Attributes (each a float64 NumPy array of length ``n_padded`` for one
    axis; broadcast against the wavefield by the propagator):
      a:         convolution update weight (0 in the interior).
      b:         convolution decay factor (0 in the interior).
      inv_kappa: 1/kappa stretching (1 in the interior).
    """

    a: np.ndarray
    b: np.ndarray
    inv_kappa: np.ndarray

    @staticmethod
    def build(
        n: int,
        pml: int,
        radius: int,
        h: float,
        dt: float,
        c_max: float,
        f0: float,
        p: float = 2.0,
        r0: float = 1e-6,
        kappa_max: float = 1.0,
        free_lo: bool = False,
        free_hi: bool = False,
        stagger: float = 0.0,
    ) -> "CpmlProfile":
        """Build profiles for one axis of a padded grid.

        ``stagger`` offsets the evaluation points by that many cells
        (0.5 = half-point profiles for staggered first derivatives, used
        by the variable-density engine's phi memory variables).

        Args:
          n: physical size along this axis (unpadded).
          pml: CPML thickness in cells.
          radius: stencil ghost width (cells beyond the CPML, zero Dirichlet).
          h: grid spacing along this axis.
          dt: timestep.
          c_max: maximum velocity (sets d0).
          f0: dominant source frequency (sets alpha).
          p: profile polynomial power.
          r0: theoretical reflection coefficient.
          kappa_max: grid-stretching maximum (1 = no stretching).
          free_lo / free_hi: disable the layer on the low / high side
            (e.g. free surface at z=0).
        """
        n_pad = n + 2 * (pml + radius)
        if pml == 0:  # no absorbing layer: zero Dirichlet box (test configs)
            z = np.zeros(n_pad)
            return CpmlProfile(a=z, b=z, inv_kappa=np.ones(n_pad))
        L = pml * h
        d0 = -(p + 1.0) * c_max * np.log(r0) / (2.0 * L)

        # Signed distance into the PML, measured from the inner interface,
        # for every padded-grid point. Ghost cells (beyond the PML) get the
        # full-depth value; they are zero-Dirichlet anyway.
        idx = np.arange(n_pad, dtype=np.float64) + float(stagger)
        lo_interface = pml + radius  # first interior cell index
        hi_interface = pml + radius + n - 1  # last interior cell index
        depth = np.zeros(n_pad)
        if not free_lo:
            depth_lo = (lo_interface - idx) * h
            depth = np.where(idx < lo_interface, np.clip(depth_lo, 0.0, L), depth)
        if not free_hi:
            depth_hi = (idx - hi_interface) * h
            depth = np.where(idx > hi_interface, np.clip(depth_hi, 0.0, L), depth)

        x = depth / L
        d = d0 * x**p
        alpha = np.pi * f0 * (1.0 - x)
        kappa = 1.0 + (kappa_max - 1.0) * x**p

        b = np.exp(-(d / kappa + alpha) * dt)
        denom = kappa * (d + kappa * alpha)
        a = np.where(denom > 0.0, d * (b - 1.0) / np.where(denom > 0, denom, 1.0), 0.0)

        inside = x > 0.0
        a = np.where(inside, a, 0.0)
        b = np.where(inside, b, 0.0)
        inv_kappa = np.where(inside, 1.0 / kappa, 1.0)
        return CpmlProfile(a=a, b=b, inv_kappa=inv_kappa)

    def broadcast(self, axis: int, ndim: int, dtype=np.float32) -> Tuple[np.ndarray, ...]:
        """Reshape (a, b, inv_kappa) for broadcasting along ``axis`` of an
        ``ndim``-dimensional padded wavefield."""
        shape = [1] * ndim
        shape[axis] = self.a.shape[0]
        return (
            self.a.reshape(shape).astype(dtype),
            self.b.reshape(shape).astype(dtype),
            self.inv_kappa.reshape(shape).astype(dtype),
        )


def build_profiles(grid, dt: float, c_max: float, f0: float, dtype=np.float32, **kw):
    """Build broadcast-ready (a, b, inv_kappa) triples for every axis of a grid.

    Returns a list over axes; each entry is the broadcastable triple. The
    z-axis low side honours ``grid.free_surface``.
    """
    out = []
    z_axis = 0 if grid.ndim == 2 else 1  # (z, x) or (y, z, x)
    for ax in range(grid.ndim):
        prof = CpmlProfile.build(
            n=grid.shape[ax],
            pml=grid.pml,
            radius=grid.radius,
            h=grid.h[ax],
            dt=dt,
            c_max=c_max,
            f0=f0,
            free_lo=(grid.free_surface and ax == z_axis),
            **kw,
        )
        out.append(prof.broadcast(ax, grid.ndim, dtype=dtype))
    return out
