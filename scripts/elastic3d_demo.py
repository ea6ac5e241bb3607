#!/usr/bin/env python
"""3D land elastic (vp, vs) FWI demo artifact -> runs/elastic3d_demo/.

The 3D companion to scripts/elastic_demo.py: free-surface land
acquisition (force_z vibrator-style sources just below the surface,
surface receiver grid + a bottom OBN-style plane for transmission
paths), truth = 1D gradient background + a fast vp lens and a slow vs
lens at different positions (so vs recovery cannot be vp/1.85 leakage),
start = the bare background.

Design lessons carried over from the measured 2D experiments
(scripts/elastic_demo.py): force_z sources (pressure sources barely
illuminate vs), bottom receivers (surface-only spreads see the deep
half via reflections alone), acquisition-plane gradient taper +
smoothing (without it the optimizer fits acquisition-point artifacts),
and full-band-heavy staging (aggressive low-pass of a 12 Hz Ricker
invites vp/vs crosstalk).

Engine: elastic3d jnp with the checkpointed-scan gradient (exact AD,
O(sqrt(nt)) memory), fp32 on CPU. Writes summary.json + log.jsonl +
slice PNGs.
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

    from tpufwi import Geometry, Grid
    from tpufwi.config import StageCfg
    from tpufwi.invert import ElasticFwiProblem, invert_multiparameter
    from tpufwi.precondition import gaussian_smooth
    from tpufwi.propagators.elastic3d import Elastic3dPropagator, elastic_cfl_dt
    from tpufwi.wavelets import ricker

    run_dir = "runs/elastic3d_demo"
    os.makedirs(run_dir, exist_ok=True)

    ny, nz, nx, f0 = 16, 24, 30, 12.0
    yy, zz, xx = np.mgrid[0:ny, 0:nz, 0:nx].astype(np.float64)
    vp_bg = 1900.0 + 14.0 * zz
    vs_bg = vp_bg / 1.85
    rho_t = (1000.0 + 0.25 * vp_bg).astype(np.float32)
    vp_t = vp_bg + 260.0 * np.exp(
        -(((yy - 8.0) / 5) ** 2 + ((zz - 9.0) / 4) ** 2 + ((xx - 11.0) / 6) ** 2)
    )
    vs_t = vs_bg - 120.0 * np.exp(
        -(((yy - 8.0) / 5) ** 2 + ((zz - 14.0) / 4) ** 2 + ((xx - 20.0) / 6) ** 2)
    )
    vp_t = vp_t.astype(np.float32)
    vs_t = vs_t.astype(np.float32)

    grid = Grid(shape=(ny, nz, nx), h=(10.0, 10.0, 10.0), pml=6, order=4,
                free_surface=True)
    dt = elastic_cfl_dt(grid.h, float(vp_t.max()), 4, safety=0.6)
    nt = int(0.55 / dt)
    # 1e6 source scale: force_z injection divides by rho and multiplies by
    # dt, so unit-amplitude sources leave fp32 traces ~1e-8 and the misfit
    # at the fp32 precision floor (measured: J0 ~ 1e-16, line search
    # hunting alpha ~ 6e14). The engine is linear in w — scaling the
    # source is a pure unit change that puts J ~ O(1).
    w = 1.0e6 * ricker(f0, dt, nt, dtype=jnp.float32)
    prop = Elastic3dPropagator(grid, dt, f0, float(vp_t.max()),
                               dtype=jnp.float32, source_type="force_z")

    # 4 shots on the surface (z=2), spread in y and x; receivers: surface
    # grid at z=2 + bottom plane at z=nz-3
    shots = [(5, 8), (5, 21), (10, 8), (10, 21)]
    r_surf = np.array([[y, 2, x] for y in range(2, ny - 1, 3)
                       for x in range(2, nx - 1, 3)])
    r_bot = np.array([[y, nz - 3, x] for y in range(3, ny - 2, 4)
                      for x in range(3, nx - 2, 4)])
    # two receiver wells: the surface force_z spread is S-dominant
    # (measured: 6+18 iterations recover vs to 0.33x start error while vp
    # stays at 0.94x) — near-vertical transmission through the vp lens is
    # what constrains vp, same lesson as the tomography demo's boreholes
    r_wells = np.array([[y, z, x] for (y, x) in ((8, 4), (8, 25))
                        for z in range(4, nz - 3, 3)])
    rcv = np.concatenate([r_surf, r_bot, r_wells])
    geoms = jax.tree.map(
        lambda *x: jnp.stack(x),
        *[Geometry.from_physical(grid, np.array([[sy, 2, sx]]), rcv)
          for sy, sx in shots],
    )

    t0 = time.time()
    vpj, vsj, rhoj = (jnp.asarray(a) for a in (vp_t, vs_t, rho_t))
    fwd1 = jax.jit(lambda g: prop(vpj, vsj, rhoj, g, w))
    d_obs = jnp.stack([
        fwd1(jax.tree.map(lambda x: x[i], geoms)) for i in range(len(shots))
    ])
    pb = ElasticFwiProblem(prop=prop, geoms=geoms, d_obs=d_obs,
                           wavelet=w, dt=dt)

    m0 = (jnp.asarray(vp_bg, jnp.float32), jnp.asarray(vs_bg, jnp.float32),
          rhoj)
    bounds = ((1700.0, 3100.0), (850.0, 1750.0),
              (float(rho_t.min()), float(rho_t.max())))

    log_path = os.path.join(run_dir, "log.jsonl")
    logf = open(log_path, "w")

    def log_fn(rec):
        rec = {**rec, "t": round(time.time() - t0, 1)}
        logf.write(json.dumps(rec) + "\n")
        logf.flush()
        print(rec, flush=True)

    # acquisition-plane taper: mask the source/surface-receiver rows and
    # the bottom receiver plane, smooth the rest (2D demo recipe in 3D)
    taper = np.ones((ny, nz, nx), np.float32)
    taper[:, :4, :] = 0.0
    taper[:, nz - 5:, :] = 0.0
    taper = gaussian_filter(taper, 1.5).astype(np.float32)
    taper_j = jnp.asarray(taper)

    def precond(gtree):
        gvp, gvs, grho = gtree
        return (gaussian_smooth(gvp * taper_j, 1.2),
                gaussian_smooth(gvs * taper_j, 1.2),
                jnp.zeros_like(grho))  # density held at truth

    # budget calibrated by measurement: the data are ~90% vs-sensitive
    # (J with true vs at the start vp removes 0.0074 -> 0.0007; true vp
    # alone only -> 0.0067), so the optimizer recovers vs first — at
    # 6+18 iterations J had reached exactly the true-vs level (7.1e-4)
    # with vp untouched. The long full-band tail is where the remaining
    # (pure-vp) residual is consumed.
    stages = [StageCfg(fmax=8.0, iterations=6),
              StageCfg(fmax=None, iterations=34)]
    m1 = invert_multiparameter(pb, m0, stages, bounds=bounds, log_fn=log_fn,
                               scales="auto", precond=precond)
    wall = time.time() - t0

    def rel_err(a, b, a0):
        a, b, a0 = (np.asarray(x, np.float64) for x in (a, b, a0))
        return float(np.sqrt(np.mean((a - b) ** 2))
                     / np.sqrt(np.mean((a0 - b) ** 2)))

    summary = {
        "grid": [ny, nz, nx], "n_shots": len(shots), "nt": nt, "f0": f0,
        "free_surface": True,
        "stages": [[s.fmax, s.iterations] for s in stages],
        "vp_err_vs_start": rel_err(m1[0], vp_t, np.asarray(m0[0])),
        "vs_err_vs_start": rel_err(m1[1], vs_t, np.asarray(m0[1])),
        "wall_seconds": round(wall, 1),
        "engine": "elastic3d jnp (checkpointed-scan AD, fp32 on CPU)",
    }
    with open(os.path.join(run_dir, "summary.json"), "w") as f:
        json.dump(summary, f, indent=1)
    print("SUMMARY", json.dumps(summary), flush=True)

    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        ysl = 8  # slice through both lens centres
        fig, axs = plt.subplots(2, 3, figsize=(13, 5.5),
                                constrained_layout=True)
        for r, (true, start, final, name) in enumerate(
            ((vp_t, np.asarray(m0[0]), np.asarray(m1[0]), "vp"),
             (vs_t, np.asarray(m0[1]), np.asarray(m1[1]), "vs"))
        ):
            vmin, vmax = float(true[ysl].min()), float(true[ysl].max())
            for c, (img, ttl) in enumerate(
                ((true, f"{name} true"), (start, f"{name} start"),
                 (final, f"{name} inverted"))
            ):
                im = axs[r, c].imshow(np.asarray(img)[ysl], aspect="auto",
                                      cmap="viridis", vmin=vmin, vmax=vmax)
                axs[r, c].set_title(f"{ttl} (y={ysl} slice)")
            fig.colorbar(im, ax=axs[r, :], shrink=0.85)
        fig.savefig(os.path.join(run_dir, "models.png"), dpi=110)
    except Exception as e:
        print("plot skipped:", e)


if __name__ == "__main__":
    main()
