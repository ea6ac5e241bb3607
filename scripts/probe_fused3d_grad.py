#!/usr/bin/env python
"""Tiny-scale hardware smoke of the fused 3D engine through the public
propagator API: forward AND value+grad compile + run (the reverse /
imaging kernels exercise a different Mosaic lowering path than the
forward — commit b2c75d5's host-constants fix must cover both). Bounded
minutes; run as tpu_queue10 step 0 before committing hours to the
Overthrust driver runs."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from tpufwi.acquisition import Geometry
from tpufwi.grid import Grid
from tpufwi.propagators.acoustic2d import AcousticPropagator
from tpufwi.wavelets import ricker


def main():
    grid = Grid(shape=(32, 32, 48), h=(25.0,) * 3, pml=10, order=8)
    dt = grid.cfl_dt(4000.0, safety=0.7)
    # long enough for the z=6..10 lens reflection to reach the receivers
    # (first queue10 run used nt=64 with a z>=12 lens: the reflection
    # never arrived, J and g were legitimately ZERO and the assert fired)
    nt = 160
    w = jnp.asarray(ricker(8.0, dt, nt), jnp.float32)
    vp = jnp.full(grid.shape, 3000.0, jnp.float32)
    vp_true = vp.at[8:24, 6:10, 8:40].set(2700.0)
    geom = Geometry.from_physical(
        grid, np.array([[16, 2, 8]]),
        np.array([[y, 3, x] for y in (8, 16, 24) for x in (12, 24, 40)]),
    )
    prop = AcousticPropagator(grid, dt, 8.0, 4000.0, impl="pallas3d")

    t0 = time.time()
    fwd = jax.jit(lambda v, g, w_: prop(v, g, w_))
    d_obs = jax.block_until_ready(fwd(vp_true, geom, w))
    print(f"fwd compile+run {time.time()-t0:.1f}s "
          f"|d|={float(jnp.linalg.norm(d_obs)):.3e}", flush=True)

    @jax.jit
    def vg(v, g, w_, d):
        r = prop(v, g, w_) - d
        return 0.5 * jnp.sum(r * r)

    t0 = time.time()
    J, gr = jax.block_until_ready(
        jax.value_and_grad(vg)(vp, geom, w, d_obs)
    )
    print(f"value+grad compile+run {time.time()-t0:.1f}s J={float(J):.3e} "
          f"|g|={float(jnp.linalg.norm(gr)):.3e} "
          f"finite={bool(jnp.isfinite(gr).all())}", flush=True)
    assert bool(jnp.isfinite(gr).all()) and float(jnp.linalg.norm(gr)) > 0
    print("OK", flush=True)


if __name__ == "__main__":
    main()
