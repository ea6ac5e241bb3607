"""Grid geometry, CPML padding arithmetic, and CFL stability checks.

Capability C1 of the spec (BASELINE.json:7; SURVEY.md §2 `grid.py`).

Conventions used throughout the framework:

* 2D arrays are indexed ``(z, x)`` — x is the fastest-varying (lane) axis,
  which matches the TPU (8, 128) fp32 tile layout.
* 3D arrays are indexed ``(y, z, x)`` — domain sharding happens over the
  ``y`` (dim 0) and ``x`` (dim 2) axes.
* A "padded" grid is the physical grid extended by ``pml + radius`` cells on
  every side: ``pml`` absorbing cells plus ``radius = order // 2`` stencil
  ghost cells that are held at zero (Dirichlet) outside the CPML.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Sequence, Tuple

import numpy as np

# Second-derivative centred FD coefficients (full symmetric taps), per order.
# order -> taps of length (order + 1); divide by h**2 when applying.
D2_COEFFS = {
    2: np.array([1.0, -2.0, 1.0]),
    4: np.array([-1.0 / 12, 4.0 / 3, -5.0 / 2, 4.0 / 3, -1.0 / 12]),
    8: np.array(
        [
            -1.0 / 560,
            8.0 / 315,
            -1.0 / 5,
            8.0 / 5,
            -205.0 / 72,
            8.0 / 5,
            -1.0 / 5,
            8.0 / 315,
            -1.0 / 560,
        ]
    ),
}

# First-derivative centred FD coefficients; divide by h when applying.
D1_COEFFS = {
    2: np.array([-0.5, 0.0, 0.5]),
    4: np.array([1.0 / 12, -2.0 / 3, 0.0, 2.0 / 3, -1.0 / 12]),
    8: np.array(
        [
            1.0 / 280,
            -4.0 / 105,
            1.0 / 5,
            -4.0 / 5,
            0.0,
            4.0 / 5,
            -1.0 / 5,
            4.0 / 105,
            -1.0 / 280,
        ]
    ),
}

# Staggered-grid first-derivative coefficients (Levander 1988 [GENRE]);
# ``D f[i+1/2] = sum_k c[k] * (f[i+1+k] - f[i-k]) / h``.
D1_STAGGERED_COEFFS = {
    2: np.array([1.0]),
    4: np.array([9.0 / 8, -1.0 / 24]),
    8: np.array([1225.0 / 1024, -245.0 / 3072, 49.0 / 5120, -5.0 / 7168]),
}


def radius_for_order(order: int) -> int:
    """Stencil half-width for a given spatial FD order."""
    if order not in D2_COEFFS:
        raise ValueError(f"unsupported FD order {order}; choose from {sorted(D2_COEFFS)}")
    return order // 2


def cfl_dt(
    h: Sequence[float] | float,
    c_max: float,
    order: int = 4,
    safety: float = 0.8,
    ndim: int = 2,
) -> float:
    """Largest stable leapfrog timestep for the given grid.

    Von Neumann bound for ``p'' = c^2 L p`` with 2nd-order time stepping:
    ``dt <= 2 / (c_max * sqrt(S * sum_d 1/h_d^2))`` where ``S`` is the sum of
    absolute 2nd-derivative stencil weights.  ``safety`` scales the bound.
    """
    if np.isscalar(h):
        h = [float(h)] * ndim
    s = float(np.abs(D2_COEFFS[order]).sum())
    bound = 2.0 / (c_max * math.sqrt(s * sum(1.0 / hd**2 for hd in h)))
    # plain Python float: numpy scalars are STRONGLY typed in jax and a
    # np.float64 dt silently promotes f32 model-field products to f64
    return float(safety * bound)


@dataclasses.dataclass(frozen=True)
class Grid:
    """Physical grid + absorbing-boundary bookkeeping.

    Attributes:
      shape:  physical (unpadded) grid shape, (nz, nx) or (ny, nz, nx).
      h:      grid spacing per axis in metres (same length as shape).
      pml:    CPML thickness in cells (same on every side).
      order:  spatial FD order (4 or 8).
      free_surface: if True, the first z-plane is a free surface (no PML on
        top); currently the default is absorbing on all sides.
    """

    shape: Tuple[int, ...]
    h: Tuple[float, ...]
    pml: int = 20
    order: int = 4
    free_surface: bool = False

    def __post_init__(self):
        object.__setattr__(self, "shape", tuple(int(s) for s in self.shape))
        h = self.h
        if np.isscalar(h):
            h = (float(h),) * len(self.shape)
        object.__setattr__(self, "h", tuple(float(x) for x in h))
        if len(self.h) != len(self.shape):
            raise ValueError("h must have one spacing per axis")
        radius_for_order(self.order)  # validate

    @property
    def ndim(self) -> int:
        return len(self.shape)

    @property
    def radius(self) -> int:
        return radius_for_order(self.order)

    @property
    def pad(self) -> int:
        """Total padding per side: CPML + stencil ghost cells."""
        return self.pml + self.radius

    @property
    def padded_shape(self) -> Tuple[int, ...]:
        return tuple(s + 2 * self.pad for s in self.shape)

    @property
    def interior(self) -> Tuple[slice, ...]:
        """Slices selecting the physical grid inside a padded array."""
        return tuple(slice(self.pad, self.pad + s) for s in self.shape)

    def to_padded_index(self, idx: Sequence[int]) -> Tuple[int, ...]:
        """Map a physical grid index to the padded-array index."""
        return tuple(int(i) + self.pad for i in idx)

    def cfl_dt(self, c_max: float, safety: float = 0.8) -> float:
        return cfl_dt(self.h, c_max, self.order, safety, self.ndim)

    def check_dt(self, dt: float, c_max: float) -> None:
        limit = self.cfl_dt(c_max, safety=1.0)
        if dt > limit:
            raise ValueError(
                f"dt={dt:.6g} exceeds the CFL stability limit {limit:.6g}"
                f" (c_max={c_max}, h={self.h}, order={self.order})"
            )

    def points_per_wavelength(self, c_min: float, f_max: float) -> float:
        """Grid sampling of the shortest wavelength (dispersion guard)."""
        return c_min / (f_max * max(self.h))


def pad_model(field: np.ndarray, grid: Grid):
    """Edge-replicate a physical-grid field out to the padded grid.

    Works on NumPy or JAX arrays (uses the array's own ``__array_namespace__``
    style dispatch via jnp.pad / np.pad signature compatibility).
    """
    pad = grid.pad
    widths = [(pad, pad)] * grid.ndim
    if isinstance(field, np.ndarray):
        return np.pad(field, widths, mode="edge")
    import jax.numpy as jnp

    return jnp.pad(field, widths, mode="edge")
