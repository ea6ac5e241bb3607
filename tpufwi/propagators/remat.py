"""Two-level checkpointed scan: sqrt-style rematerialization for time
loops whose reverse pass cannot use boundary-saving reconstruction
(dissipative interiors — viscoacoustic Q, Kelvin-Voigt damping).

Memory under reverse AD: a plain lax.scan stores every carry
(O(nt * grid)); splitting the loop into chunks with jax.checkpoint around
the inner scan stores one carry per CHUNK boundary plus one chunk's
carries transiently — O((nt/chunk + chunk) * grid), minimized at
chunk ~ sqrt(nt) — for one extra forward recompute of each chunk.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def checkpointed_scan(f, init, xs, chunk: int):
    """``lax.scan(f, init, xs)`` with jax.checkpoint at chunk granularity.

    xs: array or pytree with a common leading length nt. Full chunks run
    as a scan of checkpointed inner scans; the remainder (nt % chunk)
    runs as one extra checkpointed chunk — EXACT lax.scan semantics
    (carry and ys), no zero padding.
    """
    nt = jax.tree.leaves(xs)[0].shape[0]
    nfull = nt // chunk
    rem = nt - nfull * chunk

    @jax.checkpoint
    def inner(carry, xs_chunk):
        return lax.scan(f, carry, xs_chunk)

    carry = init
    ys_parts = []
    if nfull > 0:
        xs_full = jax.tree.map(
            lambda x: x[: nfull * chunk].reshape((nfull, chunk) + x.shape[1:]),
            xs,
        )
        carry, ys = lax.scan(inner, carry, xs_full)
        ys_parts.append(jax.tree.map(
            lambda y: y.reshape((nfull * chunk,) + y.shape[2:]), ys
        ))
    if rem > 0:
        carry, ys_r = inner(
            carry, jax.tree.map(lambda x: x[nfull * chunk :], xs)
        )
        ys_parts.append(ys_r)
    if len(ys_parts) == 1:
        return carry, ys_parts[0]
    return carry, jax.tree.map(
        lambda a, b: jnp.concatenate([a, b]), *ys_parts
    )
