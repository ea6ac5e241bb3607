#!/usr/bin/env python
"""3D FWI on the synthetic SEG/EAGE Overthrust analogue (spec config 5,
BASELINE.json:11): shot- and domain-shardable acoustic 3D inversion.

Two phases, recorded in runs/overthrust_demo/summary.json:
  1. HARDWARE: a reduced-Overthrust L-BFGS inversion on the one real chip
     (the sandbox has a single v5e; multi-chip runs change only the mesh
     shape). Gradient engine: the dimension-agnostic boundary-saving XLA
     VJP (tpufwi/adjoint.py), with GSPMD domain-sharding constraints —
     the production 3D path per docs/COMPONENTS.md.
  2. SEMANTICS: the same problem's first gradient, shot+domain sharded
     over the 8-virtual-device CPU mesh (shot x y x x = 2x2x2), compared
     against the unsharded gradient — the machine-checked evidence that
     the multi-chip path computes the same numbers.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def hardware_phase(engine: str = "xla"):
    """engine='fused' uses the fused 3D forward+backward pallas path
    (adjoint3d_pallas); 'xla' the dimension-agnostic jnp engine."""
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
    )
    import jax.numpy as jnp
    import numpy as np

    from tpufwi.adjoint import make_simulator
    from tpufwi.acquisition import Geometry
    from tpufwi.grid import Grid
    from tpufwi.io import overthrust_like
    from tpufwi.misfit import l2_misfit
    from tpufwi.optimize import minimize
    from tpufwi.wavelets import ricker

    # reduced Overthrust analogue, tpufwi layout (y, z, x)
    vp3, dx = overthrust_like(nz=94, ny=100, nx=200)
    vp_true = np.ascontiguousarray(np.transpose(vp3, (1, 0, 2)))
    grid = Grid(shape=vp_true.shape, h=(dx,) * 3, pml=10, order=8)
    c_max, f0 = float(vp_true.max()), 6.0
    dt = grid.cfl_dt(c_max, safety=0.7)
    nt = 420
    w = ricker(f0, dt, nt)
    NYp, NZp, NXp = grid.padded_shape

    # 4 surface shots along x at two y lines; surface receiver grid
    rcv = np.array(
        [[y, 3, x] for y in range(10, 90, 10) for x in range(10, 190, 6)]
    )
    geoms = [
        Geometry.from_physical(grid, np.array([[y, 2, x]]), rcv)
        for y in (20, 50, 80)
        for x in (40, 100, 160)
    ]
    if engine == "fused":
        from tpufwi.adjoint3d_pallas import make_simulator3d_fused

        sim = make_simulator3d_fused(grid, dt, f0, c_max, by=16, bz=64)
    else:
        sim = make_simulator(grid, dt, f0, c_max, dtype=jnp.float32)
    pad = grid.pad

    def c2of(v):
        return (jnp.pad(v, [(pad, pad)] * 3, mode="edge") * dt) ** 2

    fwd1 = jax.jit(lambda v, si, ri: sim(c2of(v), w, si, ri))
    vp_t = jnp.asarray(vp_true, jnp.float32)
    d_obs = [fwd1(vp_t, g.src_idx, g.rcv_idx) for g in geoms]

    from scipy.ndimage import gaussian_filter

    vp0 = jnp.asarray(
        np.clip(gaussian_filter(vp_true.astype(np.float64), 5.0), 2000, 6000),
        jnp.float32,
    )

    vg1 = jax.jit(
        jax.value_and_grad(
            lambda v, si, ri, d: l2_misfit(sim(c2of(v), w, si, ri), d)
        )
    )

    def vg(v):
        J = 0.0
        g = None
        for gm, d in zip(geoms, d_obs):
            Ji, gi = vg1(v, gm.src_idx, gm.rcv_idx, d)
            J = J + Ji
            g = gi if g is None else g + gi
        return J, g

    t0 = time.time()
    J0 = float(vg(vp0)[0])
    vp, infos = minimize(
        vg, vp0, iterations=12, method="lbfgs", bounds=(2000.0, 6000.0)
    )
    J1 = float(vg(vp)[0])
    t1 = time.time()
    err0 = float(np.sqrt(np.mean((np.asarray(vp0) - vp_true) ** 2)))
    err1 = float(np.sqrt(np.mean((np.asarray(vp) - vp_true) ** 2)))
    # illuminated-region error: 4 surface shots at 6 Hz constrain the top
    # of the model; the deep basement is outside the acquisition's reach,
    # so the whole-volume RMSE mostly measures the unilluminated half
    zt = vp_true.shape[1] // 3
    errt0 = float(np.sqrt(np.mean((np.asarray(vp0)[:, :zt] - vp_true[:, :zt]) ** 2)))
    errt1 = float(np.sqrt(np.mean((np.asarray(vp)[:, :zt] - vp_true[:, :zt]) ** 2)))
    return {
        "err_ratio_illuminated_third": errt1 / errt0,
        "grid_yzx": list(vp_true.shape),
        "padded_cells": int(NYp * NZp * NXp),
        "nt": nt,
        "n_shots": len(geoms),
        "iters": 12,
        "note": "raw gradient, single 6 Hz band",
        "J_ratio": J1 / J0,
        "err_ratio": err1 / err0,
        "wall_seconds": round(t1 - t0, 1),
        "chip": "v5e-1",
        "engine": engine,
    }


def semantics_phase():
    """Shot+domain-sharded gradient == unsharded, 8 virtual CPU devices."""
    code = r"""
import os, sys, json
os.environ['XLA_FLAGS'] = '--xla_force_host_platform_device_count=8'
import jax
jax.config.update('jax_platforms', 'cpu')
import jax.numpy as jnp, numpy as np
sys.path.insert(0, %r)
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from tpufwi.adjoint import make_simulator
from tpufwi.acquisition import Geometry
from tpufwi.grid import Grid
from tpufwi.io import overthrust_like
from tpufwi.misfit import l2_misfit
from tpufwi.sharding import make_mesh

vp3, dx = overthrust_like(nz=40, ny=48, nx=80)
vp_true = np.ascontiguousarray(np.transpose(vp3, (1, 0, 2)))
grid = Grid(shape=vp_true.shape, h=(dx,)*3, pml=8, order=8)
c_max, f0 = float(vp_true.max()), 6.0
dt = grid.cfl_dt(c_max, safety=0.7)
nt = 160
from tpufwi.wavelets import ricker
w = ricker(f0, dt, nt)
rcv = np.array([[y, 3, x] for y in range(8, 40, 8) for x in range(8, 72, 6)])
geoms = [Geometry.from_physical(grid, np.array([[y, 2, x]]), rcv)
         for y, x in ((16, 20), (32, 60))]
pad = grid.pad
def c2of(v):
    return (jnp.pad(v, [(pad, pad)]*3, mode='edge')*dt)**2
vp0 = jnp.asarray(vp_true*0.95, jnp.float32)

# unsharded reference
sim0 = make_simulator(grid, dt, f0, c_max, dtype=jnp.float32)
def loss0(v):
    return sum(l2_misfit(sim0(c2of(v), w, g.src_idx, g.rcv_idx),
                         jnp.zeros((nt, len(rcv)), jnp.float32)) for g in geoms)
g_ref = jax.jit(jax.grad(loss0))(vp0)

# shot (2) x domain (y=2, x=2) sharded
mesh = Mesh(np.array(jax.devices()).reshape(2, 2, 2), ("shot", "y", "x"))
sim1 = make_simulator(grid, dt, f0, c_max, dtype=jnp.float32,
                      wavefield_sharding=NamedSharding(mesh, P("y", None, "x")))
def loss1(v):
    return sum(l2_misfit(sim1(c2of(v), w, g.src_idx, g.rcv_idx),
                         jnp.zeros((nt, len(rcv)), jnp.float32)) for g in geoms)
g_sh = jax.jit(jax.grad(loss1))(vp0)
rel = float(jnp.abs(g_sh - g_ref).max() / jnp.abs(g_ref).max())
print(json.dumps({"sharded_vs_unsharded_grad_rel": rel}))
""" % (os.path.dirname(os.path.dirname(os.path.abspath(__file__))),)
    import subprocess

    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, timeout=1800
    )
    for line in out.stdout.splitlines()[::-1]:
        if line.startswith("{"):
            return json.loads(line)
    raise RuntimeError(out.stderr[-2000:])


def main():
    engine = "fused" if "--fused" in sys.argv else "xla"
    run_dir = "runs/overthrust_demo" + ("_fused" if engine == "fused" else "")
    os.makedirs(run_dir, exist_ok=True)
    hw = hardware_phase(engine)
    sem = semantics_phase()
    summary = {**hw, **sem}
    with open(os.path.join(run_dir, "summary.json"), "w") as f:
        json.dump(summary, f)
    print("SUMMARY", json.dumps(summary), flush=True)


if __name__ == "__main__":
    main()
