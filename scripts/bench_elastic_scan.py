#!/usr/bin/env python
"""Elastic 2D engine throughput: whole-scan engine vs the per-step fused
and XLA engines (VERDICT r3 item 5 — target >= 2x the fused gradient's
2.4 Gcu/s at Marmousi scale).

Relay-safe timing: nt-slope of scalar-output jitted programs, min-of-5
per nt point (the bench_stencil rationale — additive relay noise makes
the minimum the least-biased estimator; the per-call constant cancels in
the slope). Prints Gcu/s (padded cells x nt / seconds) per engine for
forward and value+grad.

Usage: python scripts/bench_elastic_scan.py [--nz 351 --nx 1701]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nz", type=int, default=351)
    ap.add_argument("--nx", type=int, default=1701)
    ap.add_argument("--pml", type=int, default=12)
    ap.add_argument("--order", type=int, default=4)
    ap.add_argument("--nts", type=int, nargs=2, default=[256, 512])
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--engines", nargs="+",
                    default=["pallas_scan", "pallas", "jnp"])
    ap.add_argument("--skip-grad", action="store_true")
    ap.add_argument("--free-surface", action="store_true",
                    help="bench the free-surface path (round-5 in-kernel "
                    "Levander images)")
    args = ap.parse_args()

    import jax

    jax.config.update(
        "jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache")
    )
    import jax.numpy as jnp
    import numpy as np

    from tpufwi import Geometry, Grid
    from tpufwi.propagators.elastic2d import (
        ElasticPropagator,
        elastic_cfl_dt,
    )
    from tpufwi.wavelets import ricker

    nz, nx = args.nz, args.nx
    rng = np.random.default_rng(0)
    vp = np.clip(2300 + 150 * rng.standard_normal((nz, nx)), 2000, 2600)
    vs = vp / 1.8
    rho = 1000.0 + 0.3 * vp
    grid = Grid(shape=(nz, nx), h=(10.0, 10.0), pml=args.pml,
                order=args.order, free_surface=args.free_surface)
    c_max = float(vp.max())
    dt = elastic_cfl_dt(grid.h, c_max, args.order, safety=0.7)
    cells = int(np.prod(grid.padded_shape))
    print(f"grid {grid.shape} padded {grid.padded_shape} = "
          f"{cells/1e6:.2f}M cells, dt={dt*1e3:.3f} ms", flush=True)

    src = np.array([[6, nx // 2]])
    rx = np.arange(8, nx - 8, 4)
    rcv = np.stack([np.full_like(rx, 5), rx], 1)
    geom = Geometry.from_physical(grid, src, rcv)
    vpj = jnp.asarray(vp, jnp.float32)
    vsj = jnp.asarray(vs, jnp.float32)
    rhoj = jnp.asarray(rho, jnp.float32)

    def slope(fn, nts, reps):
        """min-of-reps wall at each nt; returns s/step from the slope.
        Fresh inputs per rep (the relay result-caches identical
        program+input pairs)."""
        ts = []
        for nt in nts:
            w = jnp.asarray(ricker(12.0, dt, nt), jnp.float32)
            float(fn(w))  # compile warm-up
            best = None
            for _ in range(reps):
                wv = w * (1.0 + 1e-6 * np.random.rand())
                t0 = time.time()
                # scalar VALUE fetch as the barrier: block_until_ready
                # returns immediately through this relay (first queue10
                # run printed 0.0 ms); bench_fwi.py uses the same
                # float() pattern
                float(fn(wv))
                el = time.time() - t0
                best = el if best is None else min(best, el)
            ts.append(best)
            print(f"    nt={nt}: {best*1e3:.1f} ms", flush=True)
        return (ts[1] - ts[0]) / (nts[1] - nts[0])

    for impl in args.engines:
        prop = ElasticPropagator(grid, dt, 12.0, c_max,
                                 dtype=jnp.float32, impl=impl)

        # every device array is a jit ARGUMENT (closure device constants
        # hang this sandbox's relay at lowering — see
        # scripts/overthrust_fullscale_ms.py)
        def fwd_loss(v, s, rh, g_, wv, _p=prop):
            return jnp.sum(_p(v, s, rh, g_, wv) ** 2)

        f = jax.jit(fwd_loss)
        print(f"[{impl}] forward:", flush=True)
        sps = slope(lambda wv: f(vpj, vsj, rhoj, geom, wv),
                    args.nts, args.reps)
        print(f"[{impl}] forward {sps*1e6:.1f} us/step = "
              f"{cells/sps/1e9:.2f} Gcu/s", flush=True)
        if args.skip_grad:
            continue
        gj = jax.jit(jax.value_and_grad(fwd_loss, argnums=(0, 1)))
        print(f"[{impl}] value+grad:", flush=True)
        spg = slope(
            lambda wv: gj(vpj, vsj, rhoj, geom, wv)[0],
            args.nts, args.reps,
        )
        print(f"[{impl}] value+grad {spg*1e6:.1f} us/step = "
              f"{cells/spg/1e9:.2f} Gcu/s", flush=True)


if __name__ == "__main__":
    main()
