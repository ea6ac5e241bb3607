#!/usr/bin/env python
"""Initial-model workflow demo -> runs/tomo_fwi_demo/.

The standard production pipeline end-to-end on one synthetic section:

  1. pick first breaks on the "field" data (threshold picker, DEBIASED
     by the same picker applied to the source wavelet — raw waveform
     picks carry the Ricker onset delay, which eikonal times don't),
  2. first-arrival traveltime tomography from a NAIVE CONSTANT start
     (no well log) -> long-wavelength background,
  3. multiscale FWI from the tomographic model vs from the naive start
     on the same budget.

Acquisition physics that shaped this demo (first attempt measured):
surface-to-surface diving waves in v = 1700 + 1.0*z m/s turn at
z* ~ 60 m for 900 m offsets — first arrivals are blind to the section
below, so surface-only tomography CANNOT constrain the trend (measured:
model error 55 -> 167, and FWI from that start diverged). Production
surveys solve this with borehole instrumentation; the tomography stage
here accordingly uses two receiver wells (plus the surface spread),
while FWI uses the surface spread only.
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
    from tpufwi import (AcousticPropagator, Geometry, Grid, eikonal,
                        first_breaks, ricker, traveltime_tomography)
    from tpufwi.config import FwiConfig, PrecondCfg, StageCfg
    from tpufwi.invert import FwiProblem, invert
    from tpufwi.precondition import gaussian_smooth

    run_dir = "runs/tomo_fwi_demo"
    os.makedirs(run_dir, exist_ok=True)
    t0 = time.time()

    # truth: 1D gradient + fast lens + slow lens; naive start: constant
    nz, nx, h, f0 = 60, 100, 10.0, 9.0
    zz, xx = np.mgrid[0:nz, 0:nx]
    v_bg = 1700.0 + 10.0 * zz
    v_t = v_bg + 260.0 * np.exp(-(((zz - 26) / 9) ** 2 + ((xx - 34) / 13) ** 2))
    v_t -= 180.0 * np.exp(-(((zz - 38) / 9) ** 2 + ((xx - 68) / 13) ** 2))
    v_naive = np.full((nz, nx), 1900.0)

    grid = Grid(shape=(nz, nx), h=(h, h), pml=14, order=8)
    dt = grid.cfl_dt(float(v_t.max()), safety=0.7)
    nt = int(1.1 / dt)
    w = ricker(f0, dt, nt)

    # FWI acquisition: surface spread
    n_shots = 8
    sx = np.linspace(6, nx - 6, n_shots).astype(int)
    rx = np.arange(4, nx - 4, 2)
    rcv_surf = np.stack([np.full_like(rx, 2), rx], 1)
    geoms = jax.tree.map(
        lambda *x: jnp.stack(x),
        *[Geometry.from_physical(grid, np.array([[2, s]]), rcv_surf)
          for s in sx],
    )
    prop = AcousticPropagator(grid, dt, f0=f0, c_max=float(v_t.max()))
    vp_t = jnp.asarray(v_t, jnp.float32)
    d_obs = jnp.stack([
        prop(vp_t, jax.tree.map(lambda x: x[i], geoms), w)
        for i in range(n_shots)
    ])

    # tomography acquisition: surface spread + two receiver wells
    wells = [8, nx - 9]
    rcv_tomo = np.concatenate(
        [rcv_surf]
        + [np.stack([np.arange(4, nz - 4, 3),
                     np.full_like(np.arange(4, nz - 4, 3), wx)], 1)
           for wx in wells])
    geoms_tomo = jax.tree.map(
        lambda *x: jnp.stack(x),
        *[Geometry.from_physical(grid, np.array([[2, s]]), rcv_tomo)
          for s in sx],
    )
    d_tomo = jnp.stack([
        prop(vp_t, jax.tree.map(lambda x: x[i], geoms_tomo), w)
        for i in range(n_shots)
    ])

    # ---- 1. debiased first-break picks ------------------------------------
    pick_delay = float(first_breaks(np.asarray(w)[:, None], dt)[0])
    picks = np.asarray(first_breaks(d_tomo, dt, frac=0.05)) - pick_delay

    # ---- 2. traveltime tomography from the naive constant start -----------
    src_cells = np.stack([np.full_like(sx, 2), sx], 1)
    s_tomo = traveltime_tomography(
        jnp.asarray(1.0 / v_naive, jnp.float64), (h, h), src_cells,
        rcv_tomo, jnp.asarray(picks, jnp.float64), n_outer=20,
        bounds=(1.0 / 3200.0, 1.0 / 1400.0),
        smooth=lambda g: gaussian_smooth(g, 3.0),
    )
    v_tomo = np.asarray(1.0 / s_tomo, np.float32)

    # ---- 3. multiscale FWI from each start, same budget --------------------
    def run_fwi(v0, name):
        cfg = FwiConfig(
            stages=(StageCfg(5.0, 10), StageCfg(8.0, 10)),
            run_dir=os.path.join(run_dir, name),
            precond=PrecondCfg(smooth_sigma=1.0, mask_top=4),
        )
        pb = FwiProblem(prop=prop, geoms=geoms, d_obs=d_obs, wavelet=w, dt=dt)
        logs = []
        v1 = invert(pb, jnp.asarray(v0, jnp.float32), cfg,
                    log_fn=lambda r: logs.append(r))
        return np.asarray(v1), logs

    v_fwi_tomo, log_t = run_fwi(v_tomo, "from_tomo")
    v_fwi_naive, log_n = run_fwi(v_naive.astype(np.float32), "from_naive")

    err = lambda v: float(np.sqrt(np.mean((np.asarray(v) - v_t) ** 2)))
    summary = {
        "grid": [nz, nx], "n_shots": n_shots, "nt": nt, "f0": f0,
        "pick_delay_s": pick_delay,
        "err_naive_start": err(v_naive),
        "err_tomo_model": err(v_tomo),
        "err_fwi_from_naive": err(v_fwi_naive),
        "err_fwi_from_tomo": err(v_fwi_tomo),
        "J_end_from_naive": log_n[-1]["J"],
        "J_end_from_tomo": log_t[-1]["J"],
        "wall_seconds": round(time.time() - t0, 1),
    }
    with open(os.path.join(run_dir, "summary.json"), "w") as f:
        json.dump(summary, f, indent=1)
    print("SUMMARY", json.dumps(summary), flush=True)

    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        panels = [(v_t, "true"), (v_naive, "naive start"),
                  (v_tomo, "tomography"), (v_fwi_tomo, "FWI from tomo"),
                  (v_fwi_naive, "FWI from naive")]
        fig, axs = plt.subplots(1, 5, figsize=(19, 3.2),
                                constrained_layout=True)
        for ax, (img, ttl) in zip(axs, panels):
            im = ax.imshow(np.asarray(img), aspect="auto", cmap="viridis",
                           vmin=v_t.min(), vmax=v_t.max())
            ax.set_title(ttl)
        fig.colorbar(im, ax=axs, shrink=0.8)
        fig.savefig(os.path.join(run_dir, "models.png"), dpi=110)
    except Exception as e:
        print("plot skipped:", e)


if __name__ == "__main__":
    main()
