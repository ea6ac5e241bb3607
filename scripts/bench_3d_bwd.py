#!/usr/bin/env python
"""Throughput of the fused 3D forward+backward path (adjoint3d_pallas).

Measures, via the relay-safe nt-slope of scalar-output programs
(tpufwi/bench/bench_stencil.py docstring):
  1. forward simulate()        -> Gcu/s (one sweep per step)
  2. value+grad of an L2 loss  -> Gcu/s-equivalent (three sweeps per
     step: forward + reconstruction + transposed step; the imaging
     condition and ring re-injection are fused into those kernels)

Scale is bounded by the boundary-saving tape in HBM (docs/ROADMAP.md
"Known constraints"), so this runs at an enlarged reduced-Overthrust
size, not the full 801x187x801.

Run: python scripts/bench_3d_bwd.py [ny nz nx nt_hi]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"
    ),
)
import jax.numpy as jnp
import numpy as np

from tpufwi.adjoint3d_pallas import make_simulator3d_fused
from tpufwi.acquisition import Geometry
from tpufwi.grid import Grid
from tpufwi.misfit import l2_misfit
from tpufwi.wavelets import ricker


def main(ny=200, nz=140, nx=400, nt_hi=48):
    grid = Grid(shape=(ny, nz, nx), h=(25.0,) * 3, pml=10, order=8)
    c_max, f0 = 6000.0, 8.0
    dt = grid.cfl_dt(c_max, safety=0.7)
    rng = np.random.default_rng(0)
    vp = np.clip(
        3000.0 + 200.0 * rng.standard_normal(grid.shape), 2000.0, c_max
    ).astype(np.float32)
    rcv = np.array(
        [[y, 3, x] for y in range(10, ny - 10, 12) for x in range(10, nx - 10, 8)]
    )
    geom = Geometry.from_physical(
        grid, np.array([[ny // 2, 2, nx // 2]]), rcv
    )
    interpret = os.environ.get("TPUFWI_INTERPRET", "0") == "1"
    sim = make_simulator3d_fused(grid, dt, f0, c_max, by=16, bz=64,
                                 interpret=interpret)
    pad = grid.pad
    cells = float(np.prod(grid.padded_shape))

    def c2of(v):
        return (jnp.pad(v, [(pad, pad)] * 3, mode="edge") * dt) ** 2

    vp_j = jnp.asarray(vp)

    def run(label, make_prog, sweeps):
        nts = (8, nt_hi)
        med = {}
        for nt in nts:
            w = ricker(f0, dt, nt)
            prog = jax.jit(make_prog(w))
            float(prog(vp_j * 1.01))  # compile
            ts = []
            for i in range(3):
                t0 = time.perf_counter()
                float(prog(vp_j * (1.01 + 1e-4 * i)))
                ts.append(time.perf_counter() - t0)
            med[nt] = sorted(ts)[1]
        slope = (med[nts[1]] - med[nts[0]]) / (nts[1] - nts[0])
        print(
            f"{label:24s} {slope * 1e3:8.3f} ms/step "
            f"{cells / slope / 1e9:7.2f} Gcu/s ({sweeps} sweeps/step)",
            flush=True,
        )

    def fwd(w):
        return lambda v: jnp.sum(sim(c2of(v), w, geom.src_idx, geom.rcv_idx) ** 2)

    def grad(w):
        def loss(v):
            s = sim(c2of(v), w, geom.src_idx, geom.rcv_idx)
            return l2_misfit(s, jnp.zeros_like(s))

        g = jax.grad(loss)
        return lambda v: jnp.vdot(g(v), g(v))

    print(f"grid padded={grid.padded_shape} cells={cells / 1e6:.1f}M dt={dt:.5f}",
          flush=True)
    run("fused3d forward", fwd, 1)
    run("fused3d value+grad", grad, 3)


if __name__ == "__main__":
    a = [int(x) for x in sys.argv[1:]]
    main(*a)
