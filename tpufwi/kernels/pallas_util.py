"""Shared Pallas helpers.

``bspec`` — drop-in ``pl.BlockSpec`` constructor that coerces python-int
literals returned by index maps to ``np.int32``.

Why: under ``jax_enable_x64`` (the test suite's conftest enables it for
fp64 oracle comparisons), a bare python ``0`` returned from a BlockSpec
index map is materialized as an ``i64`` constant in the Mosaic transform
function (``func.func @transform_k(...) -> (i64, i32)``), and the TPU
Mosaic compiler refuses to legalize the mixed-width ``func.return``
("failed to legalize operation 'func.return'", observed on the hardware
CI lane, runs/tpu_queue/tpu_ci.log 2026-08-18). Traced values (program
ids and arithmetic on them) stay i32 regardless of x64, so coercing the
python-int literals alone makes every kernel x64-proof without touching
the maps themselves.
"""

from __future__ import annotations

import numpy as np
from jax.experimental import pallas as pl


def _coerce(v):
    return np.int32(v) if isinstance(v, int) else v


def bspec(block_shape=None, index_map=None, **kwargs):
    """``pl.BlockSpec`` with int-literal index-map outputs forced to i32."""
    if index_map is None:
        return pl.BlockSpec(block_shape, **kwargs) if block_shape is not None \
            else pl.BlockSpec(**kwargs)

    def wrapped(*args):
        out = index_map(*args)
        if isinstance(out, tuple):
            return tuple(_coerce(v) for v in out)
        return _coerce(out)

    return pl.BlockSpec(block_shape, wrapped, **kwargs)
