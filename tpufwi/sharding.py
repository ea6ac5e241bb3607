"""Parallelism + communication backend: XLA collectives over a TPU mesh.

SURVEY.md §2 "Parallelism strategies" — the FWI mapping of the
transformer-era taxonomy:

  * DP  = shot parallelism: mesh axis "shot", per-shot gradients summed
          with lax.psum over ICI (BASELINE.json:5). Implemented here.
  * SP/CP = spatial domain decomposition of the 3D wavefield: mesh axes
          ("y","x"), per-step halo exchange via lax.ppermute (the ring-
          attention communication pattern carrying PDE halos). Implemented
          in halo_exchange()/shard_map composition (used by the 3D
          propagator, BASELINE.json:11).
  * TP/PP/EP: N/A for FWI — no weight matrices to split, time stepping is
          sequential physics, no experts. Documented, not faked.
  * Gradient accumulation = more shots than devices: sequential lax.map
          over the local shot chunk before the psum.

No NCCL/MPI/Gloo anywhere: collectives compile into the XLA program and
ride ICI within a slice (DCN via standard hybrid meshes for multi-slice).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(axis_sizes: dict[str, int] | None = None, devices=None) -> Mesh:
    """Create a mesh over the available devices.

    ``axis_sizes`` maps axis names to sizes, e.g. {"shot": 8} or
    {"shot": 2, "y": 2, "x": 2}; sizes must multiply to the device count.
    Defaults to a 1-axis "shot" mesh over all devices.
    """
    devices = devices if devices is not None else jax.devices()
    if axis_sizes is None:
        axis_sizes = {"shot": len(devices)}
    names = tuple(axis_sizes)
    sizes = tuple(axis_sizes[n] for n in names)
    if int(np.prod(sizes)) != len(devices):
        raise ValueError(f"mesh {axis_sizes} does not match {len(devices)} devices")
    dev_array = np.asarray(devices).reshape(sizes)
    return Mesh(dev_array, names)


def shard_shots(tree, mesh: Mesh, axis="shot"):
    """Place a pytree of shot-stacked arrays (leading dim = nshots) with the
    shot dimension sharded over ``axis`` and everything else replicated.

    ``axis`` may be a tuple of mesh axis names to shard shots over the
    flattened product of several axes — the multi-slice pod layout is
    ``axis=("slice", "shot")`` on a {"slice": n_slices, "shot": k} mesh:
    shots split across slices over DCN and within a slice over ICI, and
    the gradient psum becomes a hierarchical (intra-slice, then
    inter-slice) reduction that XLA schedules onto the right links.
    """
    def put(x):
        spec = P(axis, *([None] * (x.ndim - 1)))
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree.map(put, tree)


def replicate(tree, mesh: Mesh):
    return jax.tree.map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P())), tree
    )


def shot_parallel_loss(
    single_shot_loss: Callable,
    mesh: Mesh,
    axis="shot",
    shot_loop: str = "map",
) -> Callable:
    """Lift loss(model, shot_geom, shot_data, *extra) -> scalar to a
    shot-sharded total loss over stacked shots.

    Returns total(model, geoms, data, *extra) where geoms/data have a
    leading shot dimension sharded over ``axis`` and model/extra are
    replicated. Per-device shots run sequentially (lax.map: one wavefield
    in memory at a time — gradient accumulation), and the scalar losses are
    psum-reduced over ICI. Differentiable: the gradient of the result is
    the psum of per-shot gradients (BASELINE.json:5) via shard_map's
    transpose rule.

    ``axis`` may be a tuple of mesh axis names (see shard_shots): the
    multi-slice layout ``axis=("slice", "shot")`` psums over both — XLA
    reduces intra-slice partials over ICI before crossing DCN once.

    ``shot_loop``: "map" (default) runs the local shot chunk through
    ``lax.map`` — one wavefield in memory at a time. "unroll" runs a
    Python loop over the (static) local chunk instead: same gradient
    accumulation, but no while-loop wrapping — the form required by the
    whole-scan-resident pallas engine, whose streamed outputs do not
    tolerate lax.map while-body fusion (kernels/
    acoustic2d_pallas_scanres.py "Composition contract").
    """

    def total(model, geoms, data, *extra):
        def per_device(model_l, geoms_l, data_l, *extra_l):
            if shot_loop == "unroll":
                n = jax.tree.leaves(data_l)[0].shape[0]
                loss_l = sum(
                    single_shot_loss(
                        model_l,
                        jax.tree.map(lambda x: x[i], geoms_l),
                        jax.tree.map(lambda x: x[i], data_l),
                        *extra_l,
                    )
                    for i in range(n)
                )
                return jax.lax.psum(loss_l, axis)

            def one(args):
                g, d = args
                return single_shot_loss(model_l, g, d, *extra_l)

            losses = jax.lax.map(one, (geoms_l, data_l))
            return jax.lax.psum(jnp.sum(losses), axis)

        shot_spec = lambda t: jax.tree.map(
            lambda x: P(axis, *([None] * (x.ndim - 1))), t
        )
        in_specs = (P(), shot_spec(geoms), shot_spec(data)) + tuple(P() for _ in extra)
        # check_vma=False: the scan carry inside the propagator starts
        # unvarying (zeros) and becomes shot-varying after the first source
        # injection, which the varying-manual-axes checker rejects; the
        # computation is nevertheless correctly per-shot.
        fn = jax.shard_map(
            per_device, mesh=mesh, in_specs=in_specs, out_specs=P(), check_vma=False
        )
        return fn(model, geoms, data, *extra)

    return total


def halo_exchange(x: jnp.ndarray, axis_name: str, dim: int, radius: int):
    """Bidirectional neighbor halo exchange along one sharded dimension.

    Inside shard_map: each device sends its edge strips of width ``radius``
    to both neighbors via lax.ppermute and writes the received strips into
    its ghost cells (which must already exist as zero/stale padding at the
    block edges). Non-periodic: end devices keep their outer ghosts.

    Args:
      x: local block, ghost cells of width ``radius`` included on ``dim``.
      axis_name: mesh axis this dimension is sharded over.
      dim: array dimension to exchange along.
      radius: halo width (stencil order / 2).
    """
    n = jax.lax.axis_size(axis_name)
    if n == 1:
        return x
    idx = jax.lax.axis_index(axis_name)

    def take(lo, hi):
        sl = [slice(None)] * x.ndim
        sl[dim] = slice(lo, hi)
        return x[tuple(sl)]

    size = x.shape[dim]
    # interior strips adjacent to the ghosts
    send_lo = take(radius, 2 * radius)  # goes to left neighbor's high ghost
    send_hi = take(size - 2 * radius, size - radius)  # to right's low ghost

    right = [(i, i + 1) for i in range(n - 1)]
    left = [(i + 1, i) for i in range(n - 1)]
    recv_from_left = jax.lax.ppermute(send_hi, axis_name, right)
    recv_from_right = jax.lax.ppermute(send_lo, axis_name, left)

    lo_sl = [slice(None)] * x.ndim
    lo_sl[dim] = slice(0, radius)
    hi_sl = [slice(None)] * x.ndim
    hi_sl[dim] = slice(size - radius, size)
    x = jnp.where(
        (idx > 0),
        x.at[tuple(lo_sl)].set(recv_from_left),
        x,
    )
    x = jnp.where(
        (idx < n - 1),
        x.at[tuple(hi_sl)].set(recv_from_right),
        x,
    )
    return x
