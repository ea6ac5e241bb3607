#!/usr/bin/env python
"""Elastic (vp, vs) FWI on the TPU whole-scan engine -> runs/elastic_tpu_demo/.

The C4 graded path end-to-end ON HARDWARE with the production default:
ElasticPropagator(impl='auto') resolves to the whole-scan P-SV engine
(kernels/elastic2d_pallas_scan.py — measured 7.47-7.94 Gcu/s value+grad
at the official grid), free surface ON (round-5 in-kernel Levander
images), force_z sources, multicomponent surface receivers, through
ElasticFwiProblem + invert_multiparameter with per-stage engine events.

Experiment design vs the CPU demo (scripts/elastic_demo.py): that
recipe's OBN bottom receiver line spans the full depth and would break
the scan engine's 16-row receiver-slab contract, so this demo uses a
SURFACE-only spread and moves the illumination down instead — a strong
1D gradient (dv/dz = 14 1/s) turns diving waves through the lens depths
and the free surface supplies multiples. Lenses sit at ~220 m (vp,
fast) and ~300 m (vs, slow, laterally offset so vs recovery cannot be
vp leakage).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    import jax

    jax.config.update(
        "jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache")
    )
    import jax.numpy as jnp
    import numpy as np
    from scipy.ndimage import gaussian_filter

    from tpufwi import Geometry, Grid
    from tpufwi.config import StageCfg
    from tpufwi.invert import ElasticFwiProblem, invert_multiparameter
    from tpufwi.precondition import gaussian_smooth
    from tpufwi.propagators.elastic2d import (
        ElasticPropagator,
        elastic_cfl_dt,
    )
    from tpufwi.wavelets import ricker

    run_dir = sys.argv[1] if len(sys.argv) > 1 else "runs/elastic_tpu_demo"
    os.makedirs(run_dir, exist_ok=True)

    nz, nx, f0 = 100, 300, 10.0
    zz, xx = np.mgrid[0:nz, 0:nx]
    vp_bg = 1700.0 + 14.0 * zz
    vs_bg = vp_bg / 1.9
    rho_t = (1000.0 + 0.25 * vp_bg).astype(np.float32)
    vp_t = vp_bg + 240.0 * np.exp(
        -(((zz - 22.0) / 7) ** 2 + ((xx - 100.0) / 16) ** 2)
    )
    vs_t = vs_bg - 120.0 * np.exp(
        -(((zz - 30.0) / 8) ** 2 + ((xx - 200.0) / 16) ** 2)
    )

    grid = Grid(shape=(nz, nx), h=(10.0, 10.0), pml=12, order=4,
                free_surface=True)
    dt = elastic_cfl_dt(grid.h, float(vp_t.max()), 4, safety=0.65)
    nt = int(1.6 / dt)
    w = ricker(f0, dt, nt, dtype=jnp.float32)
    prop = ElasticPropagator(grid, dt, f0, float(vp_t.max()),
                             dtype=jnp.float32, record="v",
                             source_type="force_z")

    n_shots = 8
    sx = np.linspace(10, nx - 10, n_shots).astype(int)
    rx = np.arange(6, nx - 6, 2)
    rcv = np.stack([np.full_like(rx, 3), rx], 1)
    geoms = jax.tree.map(
        lambda *x: jnp.stack(x),
        *[Geometry.from_physical(grid, np.array([[3, s]]), rcv)
          for s in sx],
    )
    impl = prop.resolve_impl(
        jax.tree.map(lambda x: x[0], geoms), nt=nt
    )
    print(f"impl='auto' -> {impl} ({prop.resolve_note})", flush=True)

    t0 = time.time()
    vptj = jnp.asarray(vp_t, jnp.float32)
    vstj = jnp.asarray(vs_t, jnp.float32)
    rhoj = jnp.asarray(rho_t, jnp.float32)
    fwd1 = jax.jit(lambda g: prop(vptj, vstj, rhoj, g, w))
    d_obs = jnp.stack([
        fwd1(jax.tree.map(lambda x: x[i], geoms)) for i in range(n_shots)
    ])
    print(f"observed data in {time.time()-t0:.1f} s "
          f"(engine event follows per stage)", flush=True)

    pb = ElasticFwiProblem(prop=prop, geoms=geoms, d_obs=d_obs,
                           wavelet=w, dt=dt)

    vp0, vs0 = vp_bg.astype(np.float32), vs_bg.astype(np.float32)
    m0 = (jnp.asarray(vp0), jnp.asarray(vs0), rhoj)
    bounds = ((1500.0, 3600.0), (750.0, 1900.0),
              (float(rho_t.min()), float(rho_t.max())))

    logf = open(os.path.join(run_dir, "log.jsonl"), "w")

    def log_fn(rec):
        rec = {**rec, "t": round(time.time() - t0, 1)}
        logf.write(json.dumps(rec) + "\n")
        logf.flush()
        print(rec, flush=True)

    taper = np.ones((nz, nx), np.float32)
    taper[:6, :] = 0.0  # source + receiver rows under the free surface
    taper = gaussian_filter(taper, 2.0).astype(np.float32)
    taper_j = jnp.asarray(taper)

    def precond(gtree):
        gvp, gvs, grho = gtree
        return (gaussian_smooth(gvp * taper_j, 1.5),
                gaussian_smooth(gvs * taper_j, 1.5),
                jnp.zeros_like(grho))

    stages = [StageCfg(fmax=6.0, iterations=12),
              StageCfg(fmax=8.5, iterations=12),
              StageCfg(fmax=None, iterations=20)]
    m1 = invert_multiparameter(pb, m0, stages, bounds=bounds,
                               log_fn=log_fn, scales="auto",
                               precond=precond, run_dir=run_dir)
    wall = time.time() - t0

    _, loss_full = pb.stage_objectives(None)
    J0 = float(loss_full(m0))
    J1 = float(loss_full(m1))

    def rel_err(a, b, a0):
        a, b, a0 = (np.asarray(x, np.float64) for x in (a, b, a0))
        return float(np.sqrt(np.mean((a - b) ** 2))
                     / np.sqrt(np.mean((a0 - b) ** 2)))

    summary = {
        "engine": pb.prop.impl,
        "engine_note": pb.prop.resolve_note,
        "shot_loop": pb.shot_loop,
        "free_surface": True,
        "grid": [nz, nx], "n_shots": n_shots, "nt": nt,
        "stages": [[s.fmax, s.iterations] for s in stages],
        "J_ratio": J1 / J0,
        "vp_err_vs_start": rel_err(m1[0], vp_t, vp0),
        "vs_err_vs_start": rel_err(m1[1], vs_t, vs0),
        "wall_seconds": round(wall, 1),
        "chip": "v5e-1",
    }
    with open(os.path.join(run_dir, "summary.json"), "w") as f:
        json.dump(summary, f, indent=1)
    np.save(os.path.join(run_dir, "vp_final.npy"), np.asarray(m1[0]))
    np.save(os.path.join(run_dir, "vs_final.npy"), np.asarray(m1[1]))
    print("SUMMARY", json.dumps(summary), flush=True)


if __name__ == "__main__":
    main()
