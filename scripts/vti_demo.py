#!/usr/bin/env python
"""VTI anisotropic FWI demo artifact -> runs/vti_demo/.

The production question the VTI engine answers: what does ignoring
anisotropy cost? Observed data are generated with the VTI pseudo-
acoustic engine (smooth eps/delta background, known from moveout
analysis in practice); vp is then inverted twice on the same budget:

  A. anisotropy-aware: eps/delta held at truth (the standard workflow —
     anisotropy from calibration, vp from waveforms),
  B. isotropic assumption: eps = delta = 0 held frozen.

The horizontal velocity in the truth is vp*sqrt(1+2*0.08) ~ 1.08 vp —
an isotropic inversion must absorb that 8% kinematic error into vp,
mispositioning and defocusing the lens. The summary records the vp
error of both runs; models.png shows truth/start/A/B.

Engine: VTI jnp with the boundary-saving custom VJP, fp32 on CPU.
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
    from tpufwi.acquisition import split_spread_survey
    from tpufwi.adjoint import make_simulator_vti
    from tpufwi.config import StageCfg
    from tpufwi.invert import VtiFwiProblem, invert_multiparameter
    from tpufwi.precondition import gaussian_smooth
    from tpufwi.wavelets import ricker

    run_dir = "runs/vti_demo"
    os.makedirs(run_dir, exist_ok=True)

    nz, nx, f0 = 64, 110, 11.0
    zz, xx = np.mgrid[0:nz, 0:nx].astype(np.float64)
    vp_bg = 1800.0 + 10.0 * zz
    vp_t = (vp_bg + 240.0 * np.exp(
        -(((zz - 30.0) / 8) ** 2 + ((xx - 55.0) / 16) ** 2)
    )).astype(np.float32)
    # smooth anisotropy background ramping in below the near-surface
    # (shale section): eps 0 -> 0.08, delta 0 -> 0.03
    ramp = np.clip((zz - 8.0) / 16.0, 0.0, 1.0)
    ep_t = (0.08 * ramp).astype(np.float32)
    dl_t = (0.03 * ramp).astype(np.float32)

    grid = Grid(shape=(nz, nx), h=(10.0, 10.0), pml=10, order=4)
    vmax_h = float(vp_t.max()) * float(np.sqrt(1.0 + 2.0 * ep_t.max()))
    dt = grid.cfl_dt(vmax_h, safety=0.6)
    nt = int(0.85 / dt)
    w = ricker(f0, dt, nt, dtype=jnp.float32)
    sim = make_simulator_vti(grid, dt, f0, vmax_h, jnp.float32)

    n_shots = 6
    geoms = split_spread_survey(grid, n_shots, src_z=2, rcv_z=2, rcv_dx=2)

    t0 = time.time()
    pb0 = VtiFwiProblem(sim=sim, grid=grid, dt=dt, geoms=geoms,
                        d_obs=None, wavelet=w)
    vz2, fe, fd = pb0._fields(jnp.asarray(vp_t), jnp.asarray(ep_t),
                              jnp.asarray(dl_t))
    fwd1 = jax.jit(lambda g: sim(vz2, fe, fd, w, g.src_idx, g.rcv_idx))
    d_obs = jnp.stack([
        fwd1(jax.tree.map(lambda x: x[i], geoms)) for i in range(n_shots)
    ])
    pb = VtiFwiProblem(sim=sim, grid=grid, dt=dt, geoms=geoms,
                       d_obs=d_obs, wavelet=w)

    # start = the exact 1D background (lens-recovery experiment, as in the
    # elastic demos): the error metric then measures lens recovery alone.
    # A smoothed-truth start was measured to mislead here — its largest
    # errors sit in the taper-masked acquisition rows and near-surface,
    # where no update is allowed, flooring the error ratio for both runs.
    vp0 = vp_bg.astype(np.float32)

    taper = np.ones((nz, nx), np.float32)
    taper[:5, :] = 0.0  # acquisition rows
    taper = gaussian_filter(taper, 2.0).astype(np.float32)
    taper_j = jnp.asarray(taper)

    def precond(gtree):
        gvp, geps, gdel = gtree
        # vp-only inversion: anisotropy comes from calibration, not
        # waveforms (VtiFwiProblem docstring: eps/delta trade off with vp)
        return (gaussian_smooth(gvp * taper_j, 1.5),
                jnp.zeros_like(geps), jnp.zeros_like(gdel))

    stages = [StageCfg(fmax=7.0, iterations=10),
              StageCfg(fmax=None, iterations=25)]
    bounds = ((1600.0, 3000.0), (0.0, 0.12), (0.0, 0.05))

    def run(name, eps0, del0):
        logf = open(os.path.join(run_dir, f"log_{name}.jsonl"), "w")

        def log_fn(rec):
            rec = {**rec, "t": round(time.time() - t0, 1)}
            logf.write(json.dumps(rec) + "\n")
            logf.flush()
            print(name, rec, flush=True)

        m0 = (jnp.asarray(vp0), jnp.asarray(eps0), jnp.asarray(del0))
        m1 = invert_multiparameter(pb, m0, stages, bounds=bounds,
                                   scales="auto", precond=precond,
                                   log_fn=log_fn)
        logf.close()
        return np.asarray(m1[0])

    vp_aniso = run("aniso_aware", ep_t, dl_t)
    vp_iso = run("iso_assumed", np.zeros_like(ep_t), np.zeros_like(dl_t))
    wall = time.time() - t0

    def rel_err(a):
        return float(np.sqrt(np.mean((np.asarray(a, np.float64) - vp_t) ** 2))
                     / np.sqrt(np.mean((vp0.astype(np.float64) - vp_t) ** 2)))

    summary = {
        "grid": [nz, nx], "n_shots": n_shots, "nt": nt, "f0": f0,
        "eps_max": 0.08, "delta_max": 0.03,
        "stages": [[s.fmax, s.iterations] for s in stages],
        "vp_err_aniso_aware_vs_start": rel_err(vp_aniso),
        "vp_err_iso_assumed_vs_start": rel_err(vp_iso),
        "wall_seconds": round(wall, 1),
        "engine": "VTI jnp (boundary-saving custom VJP, fp32 on CPU)",
    }
    with open(os.path.join(run_dir, "summary.json"), "w") as f:
        json.dump(summary, f, indent=1)
    print("SUMMARY", json.dumps(summary), flush=True)

    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        panels = [(vp_t, "vp true"), (vp0, "start"),
                  (vp_aniso, "aniso-aware FWI"), (vp_iso, "iso-assumed FWI")]
        fig, axs = plt.subplots(1, 4, figsize=(17, 3.4), constrained_layout=True)
        for ax, (img, ttl) in zip(axs, panels):
            im = ax.imshow(np.asarray(img), aspect="auto", cmap="viridis",
                           vmin=vp_t.min(), vmax=vp_t.max())
            ax.set_title(ttl)
        fig.colorbar(im, ax=axs, shrink=0.85)
        fig.savefig(os.path.join(run_dir, "models.png"), dpi=110)
    except Exception as e:
        print("plot skipped:", e)


if __name__ == "__main__":
    main()
