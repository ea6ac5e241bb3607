#!/usr/bin/env python
"""TPU throughput row for the 3D elastic engine (VERDICT r2 item 7).

The 3D elastic engine (9 fields + 18 CPML memories, boundary-saving
rings gradient) was CPU-verified in round 2 but had no hardware number.
This script nt-slope-times forward and value+grad on whatever backend
is active (TPU in anger) at a size chosen so the 27-array remat-free
state + the 9-field ring tape fit HBM comfortably.

Methodology: identical to bench_physics_engines.py — scalar-output
jitted programs, per-step cost = slope between two nt values, min-of-
reps per nt (relay noise is additive). One JSON line per kind.
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
from tpufwi.propagators.elastic3d import Elastic3dPropagator, elastic_cfl_dt
from tpufwi.wavelets import ricker_np

# 96^2 x 192 with nt=200 OOM'd the rings-gradient compile (the staged-
# transpose jax.vjp temporaries: runs/tpu_queue5/elastic3d_bench.log);
# 64^2 x 128 / nt=128 fits with margin and still amortizes dispatch
NY = int(os.environ.get("TPUFWI_BENCHE3D_NY", 64))
NZ = int(os.environ.get("TPUFWI_BENCHE3D_NZ", 64))
NX = int(os.environ.get("TPUFWI_BENCHE3D_NX", 128))
NT1 = int(os.environ.get("TPUFWI_BENCHE3D_NT", 128))
NTS = (NT1 // 4, NT1)
F0 = 8.0


def main():
    rng = np.random.default_rng(0)
    grid = Grid(shape=(NY, NZ, NX), h=(20.0, 20.0, 20.0), pml=10, order=4)
    cells = float(np.prod(grid.padded_shape))
    vp = np.clip(2500.0 + 150.0 * rng.standard_normal(grid.shape),
                 1800.0, 3500.0).astype(np.float32)
    vs = (vp / 1.9).astype(np.float32)
    rho = np.full(grid.shape, 2200.0, np.float32)
    vp_max = float(vp.max())
    dt = elastic_cfl_dt(grid.h, vp_max, grid.order, safety=0.7)
    prop = Elastic3dPropagator(grid, dt, F0, vp_max)
    src = np.array([[NY // 2, 4, NX // 2]])
    rxs = np.stack([
        np.linspace(4, NY - 5, 64).astype(np.int32),
        np.full(64, 3, np.int32),
        np.linspace(4, NX - 5, 64).astype(np.int32),
    ], -1)
    geom = Geometry.from_physical(grid, src, rxs)
    vpj, vsj, rhoj = map(jnp.asarray, (vp, vs, rho))

    def slope_us(fn, reps=4):
        times = {}
        for nt in NTS:
            w0 = jnp.asarray(ricker_np(F0, dt, nt))
            jitted = jax.jit(fn)
            float(jitted(w0, vpj))  # compile + warm
            ts = []
            for i in range(reps):
                w = w0 * (1.0 + 1e-4 * (i + 1))
                jax.block_until_ready(w)
                t0 = time.perf_counter()
                float(jitted(w, vpj))
                ts.append(time.perf_counter() - t0)
            times[nt] = min(ts)
        return 1e6 * (times[NTS[1]] - times[NTS[0]]) / (NTS[1] - NTS[0])

    def fwd(w, v):
        return jnp.sum(prop(v, vsj, rhoj, geom, w) ** 2)

    def grad(w, v):
        g = jax.grad(lambda m: fwd(w, m))(v)
        return jnp.sum(jnp.abs(g))

    for kind, fn in (("fwd", fwd), ("grad", grad)):
        us = slope_us(fn)
        print(json.dumps({
            "engine": "elastic3d_xla_rings",
            "kind": kind,
            "grid": list(grid.padded_shape),
            "cells": int(cells),
            "us_per_step": round(us, 2),
            "gcu_per_s": round(cells / us * 1e-3, 3),
        }), flush=True)


if __name__ == "__main__":
    main()
