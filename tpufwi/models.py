"""Velocity/density model containers (spec C1/C4; SURVEY.md §2 `models.py`)."""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from .grid import Grid


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Model:
    """Earth model on the physical (unpadded) grid.

    ``vp`` is always present; ``vs`` and ``rho`` are used by the elastic
    propagator (C4). The ``grid`` carries geometry and is static metadata
    (not traced).
    """

    vp: jax.Array
    grid: Grid = dataclasses.field(metadata=dict(static=True))
    vs: Optional[jax.Array] = None
    rho: Optional[jax.Array] = None

    def __post_init__(self):
        if hasattr(self.vp, "shape") and tuple(self.vp.shape) != tuple(self.grid.shape):
            raise ValueError(
                f"vp shape {self.vp.shape} != grid shape {self.grid.shape}"
            )

    @property
    def dtype(self):
        return self.vp.dtype

    def c_max(self) -> float:
        """Host-side max velocity (for CFL / CPML setup)."""
        import numpy as np

        return float(np.max(np.asarray(self.vp)))

    def c_min(self) -> float:
        import numpy as np

        return float(np.min(np.asarray(self.vp)))

    def to_lame(self):
        """(lambda, mu, rho) from (vp, vs, rho): lam = rho(vp^2 - 2 vs^2),
        mu = rho vs^2 [GENRE]."""
        if self.vs is None or self.rho is None:
            raise ValueError("elastic conversion requires vs and rho")
        mu = self.rho * self.vs**2
        lam = self.rho * self.vp**2 - 2.0 * mu
        return lam, mu, self.rho

    def clip_bounds(self, vmin: float, vmax: float) -> "Model":
        """Project vp onto box constraints [vmin, vmax] (used by optimizers)."""
        return dataclasses.replace(self, vp=jnp.clip(self.vp, vmin, vmax))


def from_lame(lam, mu, rho, grid: Grid) -> Model:
    """Inverse of :meth:`Model.to_lame`."""
    vs = jnp.sqrt(mu / rho)
    vp = jnp.sqrt((lam + 2.0 * mu) / rho)
    return Model(vp=vp, grid=grid, vs=vs, rho=rho)


def resample(m: jax.Array, new_shape, method: str = "linear") -> jax.Array:
    """Differentiable model resampling onto ``new_shape`` (any ndim).

    jax.image.resize with half-pixel-centered sampling: the coarse and
    fine grids cover the same physical extent, so ``h_new = h_old *
    (old-1)/(new-1)`` only approximately — for FWI grid continuation use
    extents that keep h integral, or accept the sub-cell shift (it is
    far below the low-band wavelength where coarse grids are used).
    Linear is the right default both ways: downsampling a smooth starting
    model aliases nothing at FWI frequencies, and upsampling is the
    standard prolongation. Differentiable, so a coarse-stage result can
    even sit inside an outer fine-grid objective.
    """
    return jax.image.resize(m, tuple(int(n) for n in new_shape), method)


def coarse_grid(grid: Grid, factor: int) -> Grid:
    """Grid for ``resample``-based frequency/grid continuation: every
    spatial extent divided by ``factor`` (ceil), spacing multiplied so the
    physical extent (n-1)*h is preserved per axis; pml/order/free_surface
    carried over. Points-per-wavelength bookkeeping is the caller's: at
    stage fmax the coarse h must keep c_min/(fmax*h) >= ~4 for order 8
    [GENRE: Levander 1988 dispersion limits]."""
    new_shape = tuple(max(2, -(-n // factor)) for n in grid.shape)
    new_h = tuple(
        h * (n - 1) / (m - 1) for h, n, m in zip(grid.h, grid.shape, new_shape)
    )
    return dataclasses.replace(grid, shape=new_shape, h=new_h)
