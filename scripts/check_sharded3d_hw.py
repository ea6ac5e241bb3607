#!/usr/bin/env python
"""Hardware compile/parity smoke of the sharded fused 3D engine.

The sandbox has ONE chip, so multi-device execution is CPU-interpret-
tested (tests/test_sharding3d.py); what only hardware can prove is that
the y_halo kernel variants COMPILE through Mosaic and run. A (shot=1,
y=1) mesh on the real chip must reproduce the unsharded fused engine
bitwise (the py=1 layout is identical; CPU-interpret already shows 0.0).
Prints one JSON line.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"),
)
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from tpufwi.acquisition import Geometry
from tpufwi.adjoint3d_pallas import make_simulator3d_fused
from tpufwi.adjoint3d_pallas_sharded import make_simulator3d_fused_sharded
from tpufwi.grid import Grid
from tpufwi.io import overthrust_like
from tpufwi.misfit import l2_misfit
from tpufwi.wavelets import ricker


def main():
    t0 = time.time()
    # ny=52 -> padded NY = 52 + 2*(pml+r) = 80, divisible by by=16
    # (the sharded module requires L = NY/py to be a block multiple)
    vp3, dx = overthrust_like(nz=40, ny=52, nx=80)
    vp = np.ascontiguousarray(np.transpose(vp3, (1, 0, 2)))
    grid = Grid(shape=vp.shape, h=(dx,) * 3, pml=10, order=8)
    c_max, f0 = float(vp.max()), 6.0
    dt = grid.cfl_dt(c_max, safety=0.7)
    nt = 160
    w = ricker(f0, dt, nt)
    pad = grid.pad
    rcv = np.array([[y, 3, x] for y in range(8, 40, 8)
                    for x in range(8, 72, 6)])
    geom = Geometry.from_physical(grid, np.array([[24, 2, 40]]), rcv)

    def c2of(v):
        return (jnp.pad(v, [(pad, pad)] * 3, mode="edge") * dt) ** 2

    vp_t = jnp.asarray(vp, jnp.float32)
    c2 = c2of(vp_t)
    mesh = Mesh(np.array(jax.devices()[:1]).reshape(1, 1), ("shot", "y"))
    sim_ref = make_simulator3d_fused(grid, dt, f0, c_max, by=16, bz=64)
    sim_sh = make_simulator3d_fused_sharded(
        grid, dt, f0, c_max, mesh, by=16, bz=64
    )
    si = geom.src_idx[None]
    ri = geom.rcv_idx[None]

    s_ref = np.asarray(jax.jit(
        lambda c: sim_ref(c, w, geom.src_idx, geom.rcv_idx))(c2))
    s_sh = np.asarray(jax.jit(lambda c: sim_sh(c, w, si, ri))(c2)[0])
    fwd_rel = float(np.abs(s_sh - s_ref).max()
                    / (np.abs(s_ref).max() + 1e-30))

    d = jnp.asarray(s_ref)
    g_ref = np.asarray(jax.jit(jax.grad(
        lambda c: l2_misfit(sim_ref(c, w, geom.src_idx, geom.rcv_idx), d)
    ))(c2 * 1.02))
    g_sh = np.asarray(jax.jit(jax.grad(
        lambda c: l2_misfit(sim_sh(c, w, si, ri)[0], d)
    ))(c2 * 1.02))
    grad_rel = float(np.abs(g_sh - g_ref).max()
                     / (np.abs(g_ref).max() + 1e-30))
    print(json.dumps({
        "sharded_fused_hw_smoke": "ok",
        "fwd_rel_vs_unsharded": fwd_rel,
        "grad_rel_vs_unsharded": grad_rel,
        "wall_seconds": round(time.time() - t0, 1),
    }), flush=True)


if __name__ == "__main__":
    main()
