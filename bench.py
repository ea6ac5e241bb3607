#!/usr/bin/env python
"""Headline benchmark: Marmousi2-scale shots/sec/chip, forward + adjoint.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

The graded metric (BASELINE.json:2) is "Marmousi2 shots/sec/chip
(fwd+adjoint)". No published reference numbers exist (BASELINE.md), so
vs_baseline is measured against the spec-derived speed-of-light estimate of
~4 shots/s/chip at 70% HBM SoL on a 10 m Marmousi2 grid with nt=5000
(SURVEY.md §6 worked example).
"""

import json
import time

import numpy as np


BASELINE_SHOTS_PER_SEC = 4.0  # SURVEY.md §6 70%-of-SoL estimate


def main():
    import jax
    import jax.numpy as jnp

    from tpufwi import AcousticPropagator, Geometry, Grid
    from tpufwi.misfit import l2_misfit
    from tpufwi.wavelets import ricker

    # Marmousi2 at 10 m: 3.5 km x 17 km -> 351 x 1701 cells, ~5000 steps
    nz, nx, h = 351, 1701, 10.0
    f0, c_max = 12.0, 4700.0
    grid = Grid(shape=(nz, nx), h=(h, h), pml=20, order=8)
    dt = grid.cfl_dt(c_max, safety=0.7)
    nt = 5000

    rng = np.random.default_rng(0)
    from tpufwi.io import marmousi_like

    vp_np, _ = marmousi_like(nz=nz, nx=nx, dx=h)
    vp = jnp.asarray(vp_np, jnp.float32)
    w = ricker(f0, dt, nt)
    rx = np.arange(8, nx - 8, 2, dtype=np.int32)
    rcv = np.stack([np.full_like(rx, 3), rx], 1)
    geom = Geometry.from_physical(grid, np.array([[3, nx // 2]]), rcv)
    prop = AcousticPropagator(grid, dt, f0, c_max, dtype=jnp.float32)

    d_obs = jax.jit(lambda v: prop(v, geom, w))(vp).block_until_ready()

    def loss(v):
        return l2_misfit(prop(v, geom, w), d_obs)

    vg = jax.jit(jax.value_and_grad(loss))
    # warmup/compile
    J, g = vg(vp)
    jax.block_until_ready((J, g))

    n_rep = 3
    t0 = time.perf_counter()
    for _ in range(n_rep):
        J, g = vg(vp)
    jax.block_until_ready((J, g))
    dt_wall = (time.perf_counter() - t0) / n_rep

    shots_per_sec = 1.0 / dt_wall
    print(
        json.dumps(
            {
                "metric": "marmousi2_shots_per_sec_per_chip_fwd_adjoint",
                "value": round(shots_per_sec, 4),
                "unit": "shots/s/chip",
                "vs_baseline": round(shots_per_sec / BASELINE_SHOTS_PER_SEC, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
