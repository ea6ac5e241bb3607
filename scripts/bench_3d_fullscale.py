#!/usr/bin/env python
"""Full-scale 3D gradient on ONE chip (VERDICT r2 item 4; BASELINE.json:11).

Runs value+grad of a single-shot L2 misfit at real-Overthrust scale —
>= 100M physical cells — on the fused 3D engine with the bf16 ring tape
(the fp32 tape alone would need ~19 GB; bf16 halves it and the 143M-
extended-cell problem fits the 15.75 GB HBM). Records ms/step, achieved
Gcu/s, device memory stats when the backend exposes them, and tape-
compression parity (bf16 vs fp32 tape gradient) on a cropped subproblem.

Writes runs/fullscale3d/summary.json. Run alone on the chip.
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

from tpufwi.acquisition import Geometry
from tpufwi.adjoint3d_pallas import make_simulator3d_fused
from tpufwi.grid import Grid
from tpufwi.io import overthrust_like
from tpufwi.misfit import l2_misfit
from tpufwi.wavelets import ricker

NY = int(os.environ.get("TPUFWI_FS3D_NY", 340))
NZ = int(os.environ.get("TPUFWI_FS3D_NZ", 560))
NX = int(os.environ.get("TPUFWI_FS3D_NX", 560))
NTS = (128, 256)  # slope points; the tape scales with nt, both must fit
F0 = 6.0


def parity_crop():
    """bf16-tape vs fp32-tape gradient on a cropped subproblem."""
    vp3, dx = overthrust_like(nz=40, ny=48, nx=80)
    vp = np.ascontiguousarray(np.transpose(vp3, (1, 0, 2)))
    grid = Grid(shape=vp.shape, h=(dx,) * 3, pml=10, order=8)
    c_max = float(vp.max())
    dt = grid.cfl_dt(c_max, safety=0.7)
    nt = 160
    w = ricker(F0, dt, nt)
    pad = grid.pad
    rcv = np.array([[y, 3, x] for y in range(8, 40, 8)
                    for x in range(8, 72, 6)])
    geom = Geometry.from_physical(grid, np.array([[24, 2, 40]]), rcv)

    def c2of(v):
        return (jnp.pad(v, [(pad, pad)] * 3, mode="edge") * dt) ** 2

    vp_t = jnp.asarray(vp, jnp.float32)
    sims = {
        "fp32": make_simulator3d_fused(grid, dt, F0, c_max, by=16, bz=64),
        "bf16": make_simulator3d_fused(grid, dt, F0, c_max, by=16, bz=64,
                                       tape_dtype=jnp.bfloat16),
    }
    d_obs = jax.jit(lambda v: sims["fp32"](c2of(v), w, geom.src_idx,
                                           geom.rcv_idx))(vp_t)
    grads = {}
    for k, sim in sims.items():
        g = jax.jit(jax.grad(
            lambda v: l2_misfit(sim(c2of(v), w, geom.src_idx,
                                    geom.rcv_idx), d_obs)
        ))(vp_t * 0.97)
        grads[k] = np.asarray(jax.block_until_ready(g))
    rel = (np.abs(grads["bf16"] - grads["fp32"]).max()
           / np.abs(grads["fp32"]).max())
    return float(rel)


def main():
    os.makedirs("runs/fullscale3d", exist_ok=True)
    t0 = time.time()

    rel = parity_crop()
    print(json.dumps({"bf16_vs_fp32_tape_grad_rel": rel}), flush=True)

    # full-scale problem: synthetic Overthrust-like resampled to the
    # target dimensions (the generator is resolution-parametric)
    vp3, dx = overthrust_like(nz=NZ, ny=NY, nx=NX, dx=15.0)
    vp = np.ascontiguousarray(np.transpose(vp3, (1, 0, 2)))
    grid = Grid(shape=vp.shape, h=(15.0,) * 3, pml=20, order=8)
    cells_phys = int(np.prod(grid.shape))
    cells_pad = int(np.prod(grid.padded_shape))
    c_max = float(vp.max())
    dt = grid.cfl_dt(c_max, safety=0.7)
    pad = grid.pad
    NYp, NZp, NXp = grid.padded_shape
    rcv = np.array([[y, 3, x] for y in range(16, NY - 16, 24)
                    for x in range(16, NX - 16, 24)])
    geom = Geometry.from_physical(
        grid, np.array([[NY // 2, 2, NX // 2]]), rcv
    )
    sim = make_simulator3d_fused(grid, dt, F0, c_max, by=16, bz=64,
                                 tape_dtype=jnp.bfloat16)

    def c2of(v):
        return (jnp.pad(v, [(pad, pad)] * 3, mode="edge") * dt) ** 2

    vp_t = jnp.asarray(vp, jnp.float32)

    times = {}
    for nt in NTS:
        w = ricker(F0, dt, nt)
        vg = jax.jit(lambda v, w_: jax.value_and_grad(
            lambda v_: l2_misfit(
                sim(c2of(v_), w_, geom.src_idx, geom.rcv_idx),
                jnp.zeros((nt, geom.nrec), jnp.float32),
            )
        )(v)[1].sum())
        float(vg(vp_t, w))  # compile + warm (also the OOM gate)
        ts = []
        for i in range(3):
            t1 = time.perf_counter()
            float(vg(vp_t * (1.0 + 1e-4 * (i + 1)), w))
            ts.append(time.perf_counter() - t1)
        times[nt] = min(ts)
        print(json.dumps({"nt": nt, "seconds": round(times[nt], 3)}),
              flush=True)

    per_step = (times[NTS[1]] - times[NTS[0]]) / (NTS[1] - NTS[0])
    mem = {}
    try:
        stats = jax.local_devices()[0].memory_stats()
        if stats:
            mem = {k: int(v) for k, v in stats.items()
                   if "bytes" in k and isinstance(v, (int, float))}
    except Exception:
        pass
    summary = {
        "cells_physical": cells_phys,
        "cells_padded": cells_pad,
        "grid_padded": list(grid.padded_shape),
        "tape_dtype": "bfloat16",
        "value_and_grad_ms_per_step": round(per_step * 1e3, 3),
        "gcu_per_s_padded": round(cells_pad / per_step / 1e9, 3),
        "bf16_vs_fp32_tape_grad_rel_cropped": rel,
        "n_receivers": int(geom.nrec),
        "memory_stats": mem,
        "wall_seconds": round(time.time() - t0, 1),
        "chip": "v5e-1",
    }
    with open("runs/fullscale3d/summary.json", "w") as f:
        json.dump(summary, f, indent=1)
    print("SUMMARY", json.dumps(summary), flush=True)


if __name__ == "__main__":
    main()
