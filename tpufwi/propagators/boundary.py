"""Boundary-ring tape: extract/impose the wavefield frame each timestep.

Spec C2 (BASELINE.json:8): the adjoint pass reconstructs the source
wavefield by reverse time-stepping, storing only O(nt * perimeter * radius)
boundary rings instead of the full wavefield (SURVEY.md §3.2).

The ring is the width-``radius`` frame at the *outer edge of the interior*
(just inside the CPML). Forward updates at interior cells deeper than
``radius`` from the CPML are pure leapfrog (all CPML memory terms vanish
there), so the reverse recursion is exact on that region provided the ring
cells are re-imposed from the tape every step. Consequently the gradient is
exact on the interior shrunk by ``radius`` and defined as zero on the
outermost ``radius``-wide frame of the physical model (masked in the
adjoint engine).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp

from ..grid import Grid


@dataclasses.dataclass(frozen=True)
class RingSpec:
    """Static slicing plan for the boundary ring of a padded grid.

    The frame is tiled by 2*ndim non-overlapping slabs via onion peeling:
    slab for axis d spans the already-peeled extent on axes < d, the full
    interior on axes > d, and the width-r low/high strips on axis d.
    """

    slices: Tuple[Tuple[slice, ...], ...]
    valid: Tuple[slice, ...]  # region where reconstruction/gradient is exact
    tape_dtype: object = None  # None = store rings at wavefield dtype

    @staticmethod
    def build(grid: Grid, width: int | None = None,
              tape_dtype=None) -> "RingSpec":
        """``width`` overrides the ring thickness (default: the stencil
        radius). The variable-density engine's composite staggered
        operator D-(b D+(p)) reaches 2R-1 cells (R = order/2 staggered
        taps), so its rings must be that wide for exact reconstruction
        (adjoint.make_simulator_vd passes width=2R-1).

        ``tape_dtype`` (e.g. jnp.bfloat16) stores the ring tape compressed:
        extract() rounds to it, impose() casts back to the wavefield dtype.
        Halves tape HBM at bf16 — the lever for full-scale 3D where the
        tape is the memory binder (docs/COMPONENTS.md known constraints).
        Reconstruction is then inexact at ~bf16 eps on the ring; the
        measured gradient error this induces is checked by
        tests/test_adjoint.py::test_bf16_tape_gradient."""
        pad, r = grid.pad, (grid.radius if width is None else int(width))
        for n in grid.shape:
            if n <= 4 * r:
                raise ValueError(
                    f"grid extent {n} too small for ring width {r} (need > {4*r})"
                )
        slabs = []
        for d in range(grid.ndim):
            base = []
            for i in range(grid.ndim):
                ni = grid.shape[i]
                if i < d:  # peeled
                    base.append(slice(pad + r, pad + ni - r))
                else:  # full interior
                    base.append(slice(pad, pad + ni))
            lo = list(base)
            lo[d] = slice(pad, pad + r)
            hi = list(base)
            hi[d] = slice(pad + grid.shape[d] - r, pad + grid.shape[d])
            slabs.append(tuple(lo))
            slabs.append(tuple(hi))
        valid = tuple(slice(pad + r, pad + n - r) for n in grid.shape)
        return RingSpec(slices=tuple(slabs), valid=valid,
                        tape_dtype=tape_dtype)

    # Slabs are stored FLATTENED to 1D, so the stacked-over-nt tape is
    # (nt, n_slab) with a single large minor dim. In any orientation
    # that keeps the width-r extent as its own dim, XLA is free to tile
    # that tiny dim as T(8,128) lanes — measured 32-64x HBM padding
    # expansion at scale, on x/z slabs with natural minor r AND on y
    # slabs (nt, r, ny, nx) whose size-r dim a remat copy chose as lanes
    # (runs/tpu_queue5..6/{fullscale3d,elastic3d_*}.log). Slab i covers
    # axis i // 2 (low face for even i, high for odd).

    def _slab_dims(self, i: int) -> Tuple[int, ...]:
        return tuple(sl.stop - sl.start for sl in self.slices[i])

    def extract(self, p: jax.Array) -> Tuple[jax.Array, ...]:
        out = []
        for s in self.slices:
            slab = p[s].reshape(-1)
            if self.tape_dtype is not None:
                slab = slab.astype(self.tape_dtype)
            out.append(slab)
        return tuple(out)

    def impose(self, p: jax.Array, rings: Tuple[jax.Array, ...]) -> jax.Array:
        for i, (s, r) in enumerate(zip(self.slices, rings)):
            p = p.at[s].set(r.reshape(self._slab_dims(i)).astype(p.dtype))
        return p

    def zeros_like_rings(self, shape, dtype) -> Tuple[jax.Array, ...]:
        out = []
        for i in range(len(self.slices)):
            n = 1
            for d in self._slab_dims(i):
                n *= d
            out.append(jnp.zeros((n,), dtype))
        return tuple(out)

    def mask_valid(self, g: jax.Array) -> jax.Array:
        """Zero ``g`` outside the exact-gradient region."""
        out = jnp.zeros_like(g)
        return out.at[self.valid].set(g[self.valid])

    def tape_bytes_per_step(self, dtype_bytes: int = 4) -> int:
        total = 0
        for s in self.slices:
            n = 1
            for sl in s:
                n *= sl.stop - sl.start
            total += n
        return total * dtype_bytes
