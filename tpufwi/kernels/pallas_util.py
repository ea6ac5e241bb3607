"""Shared Pallas helpers.

``bspec`` — drop-in ``pl.BlockSpec`` constructor that makes every index
map ``jax_enable_x64``-proof.

Why: under ``jax_enable_x64`` (the test suite's conftest enables it for
fp64 oracle comparisons), integer literals inside BlockSpec index maps
are materialized as ``i64`` constants in the Mosaic transform function,
and the TPU Mosaic compiler refuses to legalize the resulting
``func.return`` ("failed to legalize operation 'func.return'", observed
on the hardware CI lane, runs/tpu_queue/tpu_ci.log 2026-08-18 and
runs/tpu_queue7/tpu_ci_d.log 2026-08-19). Two distinct holes, both
plugged here:

1. **Explicit maps returning python ints** (``lambda i: (i, 0, 0)``):
   the bare ``0`` becomes an ``i64`` constant, giving a mixed-width
   ``(i32, i64, i64)`` return. ``bspec`` wraps the map and coerces
   int literals to ``np.int32``. Traced values (program ids and
   arithmetic on them) stay i32 regardless of x64.
2. **The default index map** (``index_map=None``, e.g. a full-array
   ``bspec(memory_space=pltpu.VMEM)`` operand): jax's own
   ``default_index_map`` returns ``(0,) * ndim`` of python ints, which
   under x64 lowers to ``func.return (i64, i64, i64)`` — the transform
   IS emitted for VMEM operands even when the window is trivial
   (jax/_src/pallas/mosaic/lowering.py:814). The rank is unknown until
   the operand aval is seen, so ``bspec`` returns a BlockSpec subclass
   whose ``to_block_mapping`` substitutes an explicit
   ``(np.int32(0),) * ndim`` map at that point.
"""

from __future__ import annotations

import dataclasses

import numpy as np
from jax.experimental import pallas as pl


def _coerce(v):
    return np.int32(v) if isinstance(v, int) else v


def _i32_zero_map(ndim: int):
    zeros = (np.int32(0),) * ndim
    return lambda *args: zeros


@dataclasses.dataclass
class _X64SafeBlockSpec(pl.BlockSpec):
    """BlockSpec that never lets jax's default index map emit i64.

    ``to_block_mapping`` is the first point where the operand rank is
    known; if no index map was given, install an explicit all-i32-zero
    one there (semantically identical to jax's default, but typed).
    """

    def to_block_mapping(self, origin, array_aval, **kwargs):
        if self.index_map is None:
            fixed = pl.BlockSpec(
                self.block_shape,
                _i32_zero_map(len(array_aval.shape)),
                self.pipeline_mode,
                memory_space=self.memory_space,
            )
            return fixed.to_block_mapping(origin, array_aval, **kwargs)
        return super().to_block_mapping(origin, array_aval, **kwargs)


_SUBLANE_BY_ITEMSIZE = {4: 8, 2: 16, 1: 32}


def check_dma_tiling(shape, *, what, dtype=np.float32):
    """Static hardware-contract lint for TPU async-copy slices.

    Mosaic requires every ``make_async_copy`` slice to be aligned to the
    VMEM tile on its trailing two dims — (8, 128) for fp32 — and rejects
    the kernel at COMPILE time otherwise ("Slice shape along dimension 0
    must be aligned to tiling (8), but is 124"). Interpret mode cannot
    catch this (it has no tiles), and four rounds of hardware campaigns
    each lost a TPU slot to a layout-only defect of this family (i64
    index maps, lane-padded x-face rings, vpad broadcast, the cadb4b8
    final-field DMAs). Engine builders must route every DMA slice extent
    through this check so the failure happens at BUILD time, on CPU, in
    the fast lane.

    Raises ``ValueError`` naming ``what`` and the offending shape.
    1-D copies are exempt (lane-only transfers are tile-free).
    """
    shape = tuple(int(s) for s in shape)
    if len(shape) < 2:
        return shape
    sub = _SUBLANE_BY_ITEMSIZE.get(np.dtype(dtype).itemsize, 8)
    if shape[-2] % sub or shape[-1] % 128:
        raise ValueError(
            f"{what}: DMA slice shape {shape} violates the TPU "
            f"({sub},128) tiling contract on its trailing dims — Mosaic "
            "would reject this kernel at hardware compile time. Pad the "
            "copied extents (and the HBM buffer) to the tile and crop "
            "in the wrapper."
        )
    return shape


def bspec(block_shape=None, index_map=None, **kwargs):
    """``pl.BlockSpec`` with x64-proof (i32) index-map outputs."""
    if index_map is None:
        if block_shape is not None:
            return _X64SafeBlockSpec(block_shape, **kwargs)
        return _X64SafeBlockSpec(**kwargs)

    def wrapped(*args):
        out = index_map(*args)
        if isinstance(out, tuple):
            return tuple(_coerce(v) for v in out)
        return _coerce(out)

    return pl.BlockSpec(block_shape, wrapped, **kwargs)
