#!/usr/bin/env python
"""Direct (non-extrapolated) full-shot wall-clock at the official bench
configuration on the DEFAULT 2D path (VERDICT r3 item 6a).

The official headline is an nt-slope; the only direct nt=5000 number on
record is pre-high3 (0.263 s, BASELINE.md round 3). This script times
value_and_grad of one full nt=5000 Marmousi2 shot on whatever
impl='auto' resolves to (snap + high3 today), min-of-N direct calls with
fresh inputs, and prints the wall next to the slope-implied number.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nt", type=int, default=5000)
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()

    import jax

    jax.config.update(
        "jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache")
    )
    import jax.numpy as jnp
    import numpy as np

    from tpufwi import Geometry, Grid
    from tpufwi.io import marmousi_like
    from tpufwi.misfit import l2_misfit
    from tpufwi.propagators.acoustic2d import AcousticPropagator
    from tpufwi.wavelets import ricker

    nz, nx, h, order, pml = 351, 1701, 10.0, 8, 12
    grid = Grid(shape=(nz, nx), h=(h, h), pml=pml, order=order)
    f0, c_max = 12.0, 4700.0
    dt = grid.cfl_dt(c_max, safety=0.7)
    vp_np, _ = marmousi_like(nz=nz, nx=nx, dx=h)
    vp = jnp.asarray(vp_np, jnp.float32)
    rx = np.arange(8, nx - 8, 2, dtype=np.int32)
    rcv = np.stack([np.full_like(rx, 3), rx], 1)
    geom = Geometry.from_physical(grid, np.array([[3, nx // 2]]), rcv)
    prop = AcousticPropagator(grid, dt, f0, c_max, impl="auto")
    resolved = prop.fix_impl_for(geom, nt=args.nt)
    print(f"impl='auto' -> {resolved} ({prop.resolve_note})", flush=True)

    nt = args.nt
    w = ricker(f0, dt, nt)
    fwd = jax.jit(lambda v, g, w_: prop(v, g, w_))
    d_obs = jax.block_until_ready(fwd(vp, geom, w))

    @jax.jit
    def vg(v, g, w_, d):
        J, grad = jax.value_and_grad(
            lambda v_: l2_misfit(prop(v_, g, w_), d)
        )(v)
        return J + jnp.sum(grad * grad)  # scalar barrier

    t0 = time.perf_counter()
    float(vg(vp * 1.01, geom, w, d_obs))
    print(f"compile+first call: {time.perf_counter()-t0:.1f} s",
          flush=True)
    samples = []
    for i in range(args.reps):
        vpp = vp * (1.01 + 1e-4 * i)
        t0 = time.perf_counter()
        float(vg(vpp, geom, w, d_obs))
        samples.append(time.perf_counter() - t0)
    best = min(samples)
    print(f"direct full-shot fwd+adjoint nt={nt}: "
          f"min {best:.4f} s over {args.reps} "
          f"(all: {['%.4f' % s for s in samples]})", flush=True)
    print(f"=> {1.0/best:.3f} shots/s DIRECT (incl. relay dispatch "
          f"constant); engine {resolved}", flush=True)


if __name__ == "__main__":
    main()
