#!/usr/bin/env python
"""Isolate the fullscale TPU-worker crash (runs/tpu_queue10/fullscale.log):
the first 16-shot value+grad at (452,170,372) padded, nt=700, nrec=2214,
bf16 ring tape killed the worker mid-execution, while the 143M-cell probe
(runs/fullscale3d: nrec=286, single shot, bf16 tape) and the medium driver
run (nrec=240, fp32 tape) both work. Bisect one axis per stage, cheapest
first, single shot value+grad each:

  stage 1: fullscale grid + nrec=286,  bf16 tape, nt=700  (scale alone)
  stage 2: fullscale grid + nrec=2214, bf16 tape, nt=700  (receiver count)
  stage 3: fullscale grid + nrec=2214, fp32 tape, nt=220  (tape dtype)

Run each stage in its own process (a worker crash poisons the client):
  python scripts/diag_fullscale_crash.py <stage>
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    stage = int(sys.argv[1])
    import jax

    jax.config.update(
        "jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache")
    )
    import jax.numpy as jnp
    import numpy as np

    from tpufwi.acquisition import Geometry
    from tpufwi.grid import Grid
    from tpufwi.propagators.acoustic2d import AcousticPropagator
    from tpufwi.wavelets import ricker

    ny, nz, nx = 424, 142, 344
    grid = Grid(shape=(ny, nz, nx), h=(25.0,) * 3, pml=10, order=8)
    dt = grid.cfl_dt(6000.0, safety=0.7)
    nt = 220 if stage == 3 else 700
    impl = "pallas3d" if stage == 3 else "pallas3d_bf16"
    if stage == 1:
        rcv = np.array([[y, 3, x] for y in range(10, ny - 10, 30)
                        for x in range(10, nx - 10, 18)])  # ~266
    else:
        rcv = np.array([[y, 3, x] for y in range(10, ny - 10, 10)
                        for x in range(10, nx - 10, 6)])   # 2214
    print(f"stage {stage}: impl={impl} nt={nt} nrec={len(rcv)} "
          f"padded={grid.padded_shape}", flush=True)

    w = jnp.asarray(ricker(6.0, dt, nt), jnp.float32)
    vp = jnp.full(grid.shape, 3500.0, jnp.float32)
    geom = Geometry.from_physical(grid, np.array([[ny // 2, 2, nx // 2]]), rcv)
    prop = AcousticPropagator(grid, dt, 6.0, 6000.0, impl=impl)

    t0 = time.time()
    fwd = jax.jit(lambda v, g, w_: prop(v, g, w_))
    d = fwd(vp * 0.98, geom, w)
    print(f"fwd done {time.time()-t0:.0f}s |d|={float(jnp.linalg.norm(d)):.3e}",
          flush=True)

    @jax.jit
    def vg(v, g, w_, d_):
        r = prop(v, g, w_) - d_
        return 0.5 * jnp.sum(r * r)

    t0 = time.time()
    J, gr = jax.value_and_grad(vg)(vp, geom, w, d)
    print(f"value+grad done {time.time()-t0:.0f}s J={float(J):.3e} "
          f"|g|={float(jnp.linalg.norm(gr)):.3e}", flush=True)
    print("STAGE OK", flush=True)


if __name__ == "__main__":
    main()
