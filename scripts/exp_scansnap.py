#!/usr/bin/env python
"""Snapshot-engine hardware validation + bench (round 3).

The scanres rings fwd+adjoint is measured AT its 3-propagation-sweep
structural floor (BASELINE.md round-3 machine model) — the remaining
lever is removing a sweep. tape_mode="snap" streams the forward's
interior laplacian out as bf16 (nt*NZ*NX*2 B of HBM; 6.6 GB at nt=5000)
and the reverse skips reconstruction entirely: 2 sweeps per gradient.

This script, run alone on the chip:
  1. gradient parity snap-vs-rings at the official bench geometry
     (compiled, nt=512) — the bf16 tape rounding level on hardware;
  2. the official nt-slope bench on the snap engine
     (bench_fwd_adjoint(impl="pallas_scansnap"));
  3. ONE full nt=5000 value+grad, timed — proof the 6.6 GB tape fits
     HBM and the engine runs at the real shot length.

Prints one JSON line per stage.
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
from tpufwi.grid import Grid
from tpufwi.io import marmousi_like
from tpufwi.misfit import l2_misfit
from tpufwi.propagators.acoustic2d import AcousticPropagator
from tpufwi.wavelets import ricker


def main():
    nz, nx, h, order, pml = 351, 1701, 10.0, 8, 12
    grid = Grid(shape=(nz, nx), h=(h, h), pml=pml, order=order)
    f0, c_max = 12.0, 4700.0
    dt = grid.cfl_dt(c_max, safety=0.7)
    vp_np, _ = marmousi_like(nz=nz, nx=nx, dx=h)
    vp = jnp.asarray(vp_np, jnp.float32)
    rx = np.arange(8, nx - 8, 2, dtype=np.int32)
    rcv = np.stack([np.full_like(rx, 3), rx], 1)
    geom = Geometry.from_physical(grid, np.array([[3, nx // 2]]), rcv)

    # ---- 1. gradient parity vs rings (compiled, nt=512) ----
    nt = 512
    w = ricker(f0, dt, nt)
    props = {
        "rings": AcousticPropagator(grid, dt, f0, c_max,
                                    impl="pallas_scanres"),
        "snap": AcousticPropagator(grid, dt, f0, c_max,
                                   impl="pallas_scansnap"),
    }
    d_obs = jax.jit(lambda v: props["rings"](v, geom, w))(vp)
    grads = {}
    for k, prop in props.items():
        g = jax.jit(jax.grad(
            lambda v: l2_misfit(prop(v, geom, w), d_obs)
        ))(vp * 1.01)
        grads[k] = np.asarray(jax.block_until_ready(g))
    rel = (np.abs(grads["snap"] - grads["rings"]).max()
           / np.abs(grads["rings"]).max())
    print(json.dumps({"stage": "parity_nt512",
                      "snap_vs_rings_grad_rel": float(rel)}), flush=True)

    # ---- 2. official nt-slope bench on the snap engine ----
    from tpufwi.bench.bench_fwi import bench_fwd_adjoint

    res = bench_fwd_adjoint(impl="pallas_scansnap")
    res["stage"] = "bench_snap"
    print(json.dumps(res), flush=True)

    # ---- 3. one full nt=5000 value+grad (tape 6.6 GB must fit) ----
    nt5 = 5000
    w5 = ricker(f0, dt, nt5)
    prop = props["snap"]
    d5 = jax.jit(lambda v: prop(v, geom, w5))(vp)
    vg = jax.jit(lambda v: jax.value_and_grad(
        lambda v_: l2_misfit(prop(v_, geom, w5), d5)
    )(v)[1].sum())
    float(vg(vp * 1.01))  # compile + warm (the HBM-fit gate)
    ts = []
    for i in range(3):
        t0 = time.perf_counter()
        float(vg(vp * (1.01 + 1e-4 * i)))
        ts.append(time.perf_counter() - t0)
    print(json.dumps({
        "stage": "full_shot_nt5000",
        "seconds_per_shot": round(min(ts), 4),
        "shots_per_sec_direct": round(1.0 / min(ts), 4),
    }), flush=True)


if __name__ == "__main__":
    main()
