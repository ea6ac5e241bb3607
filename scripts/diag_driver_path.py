#!/usr/bin/env python
"""Second fullscale-crash bisection (runs/tpu_queue10/fullscale2.log):
the plain single-shot fused vg at fullscale shapes works
(diag2_fixed.log, 35 s) but the DRIVER path still kills the worker ~3
min after observed-data generation. The driver's stage-0 extras, one per
stage, each in its own process:

  A: FwiProblem.stage_illumination at fullscale shapes (the propagator's
     jnp single-step engine under lax.map over 16 shots — never run at
     this shape; the fused engine only covers simulate()).
  B: FwiProblem.stage_objectives(fmax=3.0) single gradient (the misfit
     wrapper: in-misfit lowpass response + L2) on 2 shots.

Usage: python scripts/diag_driver_path.py A|B
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    stage = sys.argv[1]
    import jax

    jax.config.update(
        "jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache")
    )
    import jax.numpy as jnp
    import numpy as np

    from tpufwi.acquisition import Geometry
    from tpufwi.grid import Grid
    from tpufwi.invert import FwiProblem
    from tpufwi.propagators.acoustic2d import AcousticPropagator
    from tpufwi.wavelets import ricker

    ny, nz, nx = 424, 142, 344
    grid = Grid(shape=(ny, nz, nx), h=(25.0,) * 3, pml=10, order=8)
    dt = grid.cfl_dt(6000.0, safety=0.7)
    nt = 700
    w = jnp.asarray(ricker(6.0, dt, nt), jnp.float32)
    vp = jnp.full(grid.shape, 3500.0, jnp.float32)
    rcv = np.array([[y, 3, x] for y in range(10, ny - 10, 10)
                    for x in range(10, nx - 10, 6)])
    nshot = 16 if stage == "A" else 2
    srcs = [(int(y), int(x))
            for y in np.linspace(0.2 * ny, 0.8 * ny, 4)
            for x in np.linspace(0.15 * nx, 0.75 * nx, 4)][:nshot]
    geoms = [Geometry.from_physical(grid, np.array([[sy, 2, sx]]), rcv)
             for sy, sx in srcs]
    stacked = jax.tree.map(lambda *x: jnp.stack(x), *geoms)
    prop = AcousticPropagator(grid, dt, 6.0, 6000.0, impl="auto")
    print(f"stage {stage}: nshot={nshot} "
          f"resolved={prop.resolve_impl(stacked, nt=nt)}", flush=True)

    fwd1 = jax.jit(lambda v, g, w_: prop(v, g, w_))
    d_obs = jnp.stack([fwd1(vp * 0.97, g, w) for g in geoms])
    print(f"d_obs |d|={float(jnp.linalg.norm(d_obs)):.3e}", flush=True)

    problem = FwiProblem(prop=prop, geoms=stacked, d_obs=d_obs,
                         wavelet=w, dt=dt)
    if stage == "A":
        t0 = time.time()
        il = problem.stage_illumination(vp, 3.0)
        print(f"illumination {time.time()-t0:.0f}s "
              f"sum={float(jnp.sum(il)):.3e}", flush=True)
    else:
        vg, loss = problem.stage_objectives(3.0)
        t0 = time.time()
        J, g = vg(vp)
        print(f"stage-0 vg {time.time()-t0:.0f}s J={float(J):.3e} "
              f"|g|={float(jnp.linalg.norm(g)):.3e}", flush=True)
    print("STAGE OK", flush=True)


if __name__ == "__main__":
    main()
