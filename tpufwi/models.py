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
