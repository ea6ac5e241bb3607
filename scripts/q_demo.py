#!/usr/bin/env python
"""Constant-Q attenuation inversion demo artifact -> runs/q_demo/.

The classic "gas cloud" Q-tomography setup: velocity is already known
(from FWI/moveout — held fixed here via the gradient preconditioner),
and the low-Q anomaly is inverted from the amplitude/dispersion
signature of waves transmitted through it. Acquisition is
surface-to-bottom (OBN-style): attenuation is constrained by
transmission paths, not reflections.

Engine: viscoacoustic single-SLS jnp (checkpointed-scan AD — attenuation
dissipates in the interior, so boundary-saving reconstruction does not
apply; see kernels/viscoacoustic_jnp.py), fp32 on CPU.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np


def main():
    from scipy.ndimage import gaussian_filter

    from tpufwi import Grid
    from tpufwi.acquisition import Geometry
    from tpufwi.adjoint import make_simulator_visco
    from tpufwi.config import StageCfg
    from tpufwi.invert import QFwiProblem, invert_multiparameter
    from tpufwi.precondition import gaussian_smooth
    from tpufwi.wavelets import ricker

    run_dir = "runs/q_demo"
    os.makedirs(run_dir, exist_ok=True)

    nz, nx, f0, rho = 56, 90, 13.0, 1000.0
    zz, xx = np.mgrid[0:nz, 0:nx].astype(np.float64)
    vp_t = (1900.0 + 8.0 * zz).astype(np.float32)
    q_bg = 120.0
    q_t = (q_bg - 95.0 * np.exp(
        -(((zz - 26.0) / 8) ** 2 + ((xx - 45.0) / 14) ** 2)
    )).astype(np.float32)  # Q ~ 25 in the cloud core

    grid = Grid(shape=(nz, nx), h=(10.0, 10.0), pml=10, order=4)
    dt = grid.cfl_dt(float(vp_t.max()), safety=0.6)
    nt = int(0.75 / dt)
    w = ricker(f0, dt, nt, dtype=jnp.float32)
    sim = make_simulator_visco(grid, dt, f0, float(vp_t.max()), jnp.float32)

    # surface sources, bottom receiver line (transmission through the
    # cloud) + surface line (reference amplitudes off the cloud)
    n_shots = 7
    sx = np.linspace(8, nx - 8, n_shots).astype(int)
    rx = np.arange(5, nx - 5, 2)
    rcv = np.concatenate([
        np.stack([np.full_like(rx, nz - 3), rx], 1),
        np.stack([np.full_like(rx, 2), rx], 1),
    ])
    geoms = jax.tree.map(
        lambda *x: jnp.stack(x),
        *[Geometry.from_physical(grid, np.array([[2, s]]), rcv) for s in sx],
    )

    t0 = time.time()
    pb0 = QFwiProblem(sim=sim, grid=grid, dt=dt, geoms=geoms,
                      d_obs=None, wavelet=w, rho=rho)
    kdt2, tau, bh = pb0._fields(jnp.asarray(vp_t), jnp.asarray(q_t))
    fwd1 = jax.jit(lambda g: sim(kdt2, tau, bh, w, g.src_idx, g.rcv_idx))
    d_obs = jnp.stack([
        fwd1(jax.tree.map(lambda x: x[i], geoms)) for i in range(n_shots)
    ])
    pb = QFwiProblem(sim=sim, grid=grid, dt=dt, geoms=geoms,
                     d_obs=d_obs, wavelet=w, rho=rho)

    q0 = np.full((nz, nx), q_bg, np.float32)
    m0 = (jnp.asarray(vp_t), jnp.asarray(q0))

    taper = np.ones((nz, nx), np.float32)
    taper[:4, :] = 0.0
    taper[-4:, :] = 0.0
    taper = gaussian_filter(taper, 2.0).astype(np.float32)
    taper_j = jnp.asarray(taper)

    def precond(gtree):
        gvp, gq = gtree
        # velocity is known: Q-only inversion (vp-Q crosstalk is the
        # standard failure mode; production does velocity first)
        return (jnp.zeros_like(gvp), gaussian_smooth(gq * taper_j, 1.5))

    log_path = os.path.join(run_dir, "log.jsonl")
    logf = open(log_path, "w")

    def log_fn(rec):
        rec = {**rec, "t": round(time.time() - t0, 1)}
        logf.write(json.dumps(rec) + "\n")
        logf.flush()
        print(rec, flush=True)

    stages = [StageCfg(fmax=None, iterations=90)]
    m1 = invert_multiparameter(pb, m0, stages,
                               bounds=((1800.0, 2400.0), (12.0, 300.0)),
                               scales="auto", precond=precond, log_fn=log_fn)
    logf.close()
    q1 = np.asarray(m1[1])
    wall = time.time() - t0

    err = lambda q: float(np.sqrt(np.mean((np.asarray(q, np.float64) - q_t) ** 2)))
    core = (slice(20, 33), slice(34, 57))
    summary = {
        "grid": [nz, nx], "n_shots": n_shots, "nt": nt, "f0": f0,
        "q_background": q_bg, "q_cloud_min_true": float(q_t.min()),
        "q_cloud_core_mean_true": float(q_t[core].mean()),
        "q_cloud_core_mean_inverted": float(q1[core].mean()),
        "q_err_vs_start": err(q1) / err(q0),
        "wall_seconds": round(wall, 1),
        "engine": "viscoacoustic SLS jnp (checkpointed-scan AD, fp32 on CPU)",
    }
    with open(os.path.join(run_dir, "summary.json"), "w") as f:
        json.dump(summary, f, indent=1)
    print("SUMMARY", json.dumps(summary), flush=True)

    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        panels = [(q_t, "Q true"), (q0, "Q start"), (q1, "Q inverted")]
        fig, axs = plt.subplots(1, 3, figsize=(13, 3.4), constrained_layout=True)
        for ax, (img, ttl) in zip(axs, panels):
            im = ax.imshow(np.asarray(img), aspect="auto", cmap="magma",
                           vmin=q_t.min(), vmax=q_bg)
            ax.set_title(ttl)
        fig.colorbar(im, ax=axs, shrink=0.85)
        fig.savefig(os.path.join(run_dir, "models.png"), dpi=110)
    except Exception as e:
        print("plot skipped:", e)


if __name__ == "__main__":
    main()
