"""Shot geometry: source injection and receiver sampling as scatter/gather.

Spec north star (BASELINE.json:5): "source injection / receiver sampling
become scatter/gather ops on the wavefield". Sources scatter with
``wavefield.at[iz, ix].add(amp)``; receivers gather with advanced indexing.
SURVEY.md §2 `acquisition.py`.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .grid import Grid


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Geometry:
    """One shot's acquisition geometry, in *padded-grid* integer indices.

    Attributes:
      src_idx: (nsrc, ndim) int32 padded-grid indices of sources.
      rcv_idx: (nrec, ndim) int32 padded-grid indices of receivers.

    Stack instances with ``jax.tree.map(lambda *x: jnp.stack(x), *geoms)`` to
    get a batched Geometry for vmap/shard_map over shots (all shots must have
    equal nsrc/nrec — pad with repeated last entries if ragged).
    """

    src_idx: jax.Array
    rcv_idx: jax.Array

    @staticmethod
    def from_physical(grid: Grid, src: np.ndarray, rcv: np.ndarray) -> "Geometry":
        """Build from physical-grid (cell) coordinates.

        ``src``/``rcv`` are (n, ndim) integer cell indices on the unpadded
        grid, axis order matching the array layout ((z, x) in 2D, (y, z, x)
        in 3D).
        """
        src = np.atleast_2d(np.asarray(src, dtype=np.int32))
        rcv = np.atleast_2d(np.asarray(rcv, dtype=np.int32))
        for name, arr in (("src", src), ("rcv", rcv)):
            if arr.shape[1] != grid.ndim:
                raise ValueError(f"{name} must be (n, {grid.ndim})")
            if (arr < 0).any() or (arr >= np.array(grid.shape)).any():
                raise ValueError(f"{name} indices outside the physical grid")
        pad = grid.pad
        return Geometry(
            src_idx=jnp.asarray(src + pad), rcv_idx=jnp.asarray(rcv + pad)
        )

    @property
    def nsrc(self) -> int:
        return self.src_idx.shape[-2]

    @property
    def nrec(self) -> int:
        return self.rcv_idx.shape[-2]


def inject(field: jax.Array, idx: jax.Array, amp: jax.Array) -> jax.Array:
    """Scatter-add ``amp`` (scalar or (nsrc,)) into ``field`` at ``idx``.

    ``idx`` is (nsrc, ndim); works for 2D and 3D fields.
    """
    coords = tuple(idx[..., d] for d in range(idx.shape[-1]))
    return field.at[coords].add(amp, mode="drop")


def record(field: jax.Array, idx: jax.Array) -> jax.Array:
    """Gather field values at receiver indices (nrec, ndim) -> (nrec,)."""
    coords = tuple(idx[..., d] for d in range(idx.shape[-1]))
    return field[coords]


def kaiser_sinc_weights(offset: float, radius: int = 4, beta: float = 6.31):
    """Kaiser-windowed sinc interpolation coefficients for an off-grid
    point at fractional offset `offset` in [0, 1) from the base node
    [GENRE: Hicks 2002]. Returns (taps,) of length 2*radius for nodes
    base-radius+1 .. base+radius."""
    n = np.arange(-radius + 1, radius + 1, dtype=np.float64)
    x = n - float(offset)
    w = np.sinc(x)
    arg = 1.0 - (x / radius) ** 2
    arg = np.clip(arg, 0.0, None)
    w = w * np.i0(beta * np.sqrt(arg)) / np.i0(beta)
    return w


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class PointSet:
    """Off-grid points as sparse (index, weight) stencils (Hicks 2002).

    idx: (npts, K, ndim) int32 padded-grid indices; w: (npts, K) float
    weights, K = (2*radius)^ndim. Injection scatters amp*w over the
    stencil; recording is the w-weighted gather — the exact transpose, so
    adjoint tests hold for off-grid geometry too.
    """

    idx: jax.Array
    w: jax.Array

    @staticmethod
    def from_coords(grid: Grid, coords: np.ndarray, radius: int = 4) -> "PointSet":
        """coords: (npts, ndim) physical positions in metres (axis order =
        array layout). Points must be at least `radius` cells inside the
        physical grid."""
        coords = np.atleast_2d(np.asarray(coords, np.float64))
        npts, ndim = coords.shape
        if ndim != grid.ndim:
            raise ValueError(f"coords must be (n, {grid.ndim})")
        cells = coords / np.asarray(grid.h)
        base = np.floor(cells).astype(np.int64)
        frac = cells - base
        lo = base - radius + 1
        hi = base + radius
        if (lo < 0).any() or (hi >= np.asarray(grid.shape)).any():
            raise ValueError(
                f"off-grid stencil (radius {radius}) exceeds the physical grid"
            )
        taps1d = [
            np.stack([kaiser_sinc_weights(frac[p, d], radius) for p in range(npts)])
            for d in range(ndim)
        ]  # per-dim: (npts, 2R)
        offs = np.arange(-radius + 1, radius + 1)
        grids = np.meshgrid(*([offs] * ndim), indexing="ij")
        K = (2 * radius) ** ndim
        idx = np.empty((npts, K, ndim), np.int64)
        w = np.ones((npts, K), np.float64)
        for d in range(ndim):
            od = grids[d].reshape(-1)
            idx[:, :, d] = base[:, None, d] + od[None, :] + grid.pad
            sel = od + radius - 1
            w *= taps1d[d][:, sel]
        return PointSet(idx=jnp.asarray(idx, jnp.int32), w=jnp.asarray(w, jnp.float32))

    def inject(self, field: jax.Array, amp) -> jax.Array:
        """Scatter-add amp (scalar or (npts,)) spread over the stencils."""
        coords = tuple(self.idx[..., d] for d in range(self.idx.shape[-1]))
        vals = self.w * (amp if jnp.ndim(amp) == 0 else amp[:, None])
        return field.at[coords].add(vals.astype(field.dtype), mode="drop")

    def record(self, field: jax.Array) -> jax.Array:
        """(npts,) weighted gather — transpose of inject."""
        coords = tuple(self.idx[..., d] for d in range(self.idx.shape[-1]))
        return jnp.sum(field[coords] * self.w.astype(field.dtype), axis=-1)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class OffGridGeometry:
    """Continuous-coordinate acquisition: Kaiser-sinc stencils for both
    sources and receivers (adjoint.make_simulator_offgrid consumes it)."""

    src: PointSet
    rcv: PointSet

    @staticmethod
    def from_continuous(
        grid: Grid, src_m: np.ndarray, rcv_m: np.ndarray, radius: int = 4
    ) -> "OffGridGeometry":
        """src_m / rcv_m: (n, ndim) physical positions in METRES (axis
        order = array layout), anywhere >= radius cells inside the grid."""
        return OffGridGeometry(
            src=PointSet.from_coords(grid, src_m, radius=radius),
            rcv=PointSet.from_coords(grid, rcv_m, radius=radius),
        )


def line_geometry(
    grid: Grid,
    src_z: int,
    src_x: int,
    rcv_z: int,
    rcv_x0: int = 0,
    rcv_x1: int | None = None,
    rcv_dx: int = 1,
) -> Geometry:
    """Convenience 2D geometry: one source, a horizontal receiver line."""
    if rcv_x1 is None:
        rcv_x1 = grid.shape[1]
    rx = np.arange(rcv_x0, rcv_x1, rcv_dx, dtype=np.int32)
    rcv = np.stack([np.full_like(rx, rcv_z), rx], axis=1)
    return Geometry.from_physical(grid, np.array([[src_z, src_x]]), rcv)


def split_spread_survey(
    grid: Grid,
    n_shots: int,
    src_z: int,
    rcv_z: int,
    rcv_dx: int = 1,
) -> Geometry:
    """Batched 2D survey: n_shots sources evenly spread along x, every shot
    recorded by the same full receiver line. Returns a stacked Geometry with
    leading shot axis."""
    nx = grid.shape[1]
    sx = np.linspace(0, nx - 1, n_shots + 2)[1:-1].round().astype(np.int32)
    geoms = [
        line_geometry(grid, src_z, int(x), rcv_z, rcv_dx=rcv_dx) for x in sx
    ]
    return jax.tree.map(lambda *a: jnp.stack(a), *geoms)
