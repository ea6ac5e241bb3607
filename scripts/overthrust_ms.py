#!/usr/bin/env python
"""3D multiscale FWI on the synthetic Overthrust analogue — the inversion
that RECOVERS the model (spec config 5, BASELINE.json:11).

Round-2 verdict: scripts/overthrust_demo.py drove a raw-gradient,
single-6 Hz-band loop that cut the misfit 85% while leaving the model
slightly WORSE (err_ratio 1.02) — the source/receiver imprint dominated
the update. This script runs the same reduced Overthrust problem through
the repo's own machinery instead:

  - frequency continuation: 3 low-pass bands (3 -> 4.5 -> 6 Hz), filter
    applied identically to observed data and wavelet (tpufwi/filters.py),
  - gradient preconditioning: source-illumination pseudo-Hessian division
    + top mask (source/receiver rows) + per-band Gaussian smoothing
    (tpufwi/precondition.py),
  - bound-constrained L-BFGS with the Armijo search and a tape-free
    forward for the trial evaluations (tpufwi/optimize/driver.py),
  - gradient engine: the fused 3D forward+backward pallas path
    (tpufwi/adjoint3d_pallas.py) — 2.2x over the XLA engine in round 2.

Success gate (VERDICT round 2, item 1): err_ratio_illuminated_third < 0.9
with a J_ratio comparable to the 0.148 of the raw-gradient run.

Writes runs/overthrust_demo_ms/{summary.json, log.jsonl}.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--engine", choices=["fused", "fused_sharded", "xla"],
        default="fused",
        help="fused_sharded runs the shot+domain-shardable engine "
        "(adjoint3d_pallas_sharded) on a (shot=1, y=N) device mesh — "
        "the multi-chip C5 path; N = all visible devices",
    )
    ap.add_argument("--iters", type=int, default=8, help="iterations per band")
    ap.add_argument("--bands", type=float, nargs="+", default=[3.0, 4.5, 6.0])
    ap.add_argument("--run-dir", default="runs/overthrust_demo_ms")
    ap.add_argument("--small", action="store_true",
                    help="tiny CPU smoke-test configuration")
    ap.add_argument("--nt", type=int, default=600)
    # scale knobs (defaults reproduce the runs/overthrust_demo_ms
    # configuration exactly; --ny 400 --nz 160 --nx 560 --nt 900 is the
    # large-scale single-chip configuration, ~44M padded cells)
    ap.add_argument("--ny", type=int, default=100)
    ap.add_argument("--nz", type=int, default=94)
    ap.add_argument("--nx", type=int, default=200)
    ap.add_argument("--shots-y", type=int, default=3)
    ap.add_argument("--shots-x", type=int, default=4)
    ap.add_argument("--rcv-dy", type=int, default=10)
    ap.add_argument("--rcv-dx", type=int, default=6)
    ap.add_argument("--lbfgs-m", type=int, default=10,
                    help="L-BFGS history pairs (device memory: 2*m models)")
    ap.add_argument("--by", type=int, default=16)
    ap.add_argument("--bz", type=int, default=64)
    ap.add_argument("--free-surface-model", dest="known_surface",
                    action="store_false",
                    help="do NOT pin the near-surface rows to truth")
    args = ap.parse_args()

    os.makedirs(args.run_dir, exist_ok=True)
    logf = open(os.path.join(args.run_dir, "log.jsonl"), "w")

    import jax

    jax.config.update(
        "jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache")
    )
    import jax.numpy as jnp
    import numpy as np

    from tpufwi.acquisition import Geometry
    from tpufwi.adjoint import make_simulator
    from tpufwi.filters import lowpass
    from tpufwi.grid import Grid
    from tpufwi.io import overthrust_like
    from tpufwi.misfit import l2_misfit
    from tpufwi.optimize import minimize
    from tpufwi.precondition import precondition
    from tpufwi.propagators.acoustic2d import AcousticPropagator
    from tpufwi.wavelets import ricker

    t_start = time.time()

    # same reduced Overthrust analogue as runs/overthrust_demo, tpufwi
    # layout (y, z, x)
    if args.small:
        vp3, dx = overthrust_like(nz=32, ny=32, nx=48)
        nt = 120
    else:
        vp3, dx = overthrust_like(nz=args.nz, ny=args.ny, nx=args.nx)
        nt = args.nt
    vp_true = np.ascontiguousarray(np.transpose(vp3, (1, 0, 2)))
    grid = Grid(shape=vp_true.shape, h=(dx,) * 3, pml=10, order=8)
    c_max, f0 = float(vp_true.max()), 6.0
    dt = grid.cfl_dt(c_max, safety=0.7)
    w = ricker(f0, dt, nt)
    NYp, NZp, NXp = grid.padded_shape

    # 9 surface shots on a 3x3 (y, x) grid; surface receiver carpet
    ny_, _, nx_ = vp_true.shape
    if args.small:
        rcv = np.array(
            [[y, 3, x] for y in range(4, ny_ - 4, 8)
             for x in range(4, nx_ - 4, 6)]
        )
        geoms = [
            Geometry.from_physical(grid, np.array([[y, 2, x]]), rcv)
            for y in (ny_ // 2,) for x in (nx_ // 3, 2 * nx_ // 3)
        ]
    else:
        rcv = np.array(
            [[y, 3, x] for y in range(10, ny_ - 10, args.rcv_dy)
             for x in range(10, nx_ - 10, args.rcv_dx)]
        )
        shot_ys = np.linspace(0.2 * ny_, 0.8 * ny_, args.shots_y)
        shot_xs = np.linspace(0.15 * nx_, 0.75 * nx_, args.shots_x)
        geoms = [
            Geometry.from_physical(grid, np.array([[int(y), 2, int(x)]]), rcv)
            for y in shot_ys
            for x in shot_xs
        ]

    if args.engine == "fused":
        from tpufwi.adjoint3d_pallas import make_simulator3d_fused

        sim = make_simulator3d_fused(grid, dt, f0, c_max,
                                     by=args.by, bz=args.bz)
    elif args.engine == "fused_sharded":
        from jax.sharding import Mesh

        from tpufwi.adjoint3d_pallas_sharded import (
            make_simulator3d_fused_sharded,
        )

        ndev = len(jax.devices())
        NYp_ = grid.padded_shape[0]
        py, by_sel = 1, 8
        for cand in range(ndev, 0, -1):
            if NYp_ % cand != 0:
                continue
            L_ = NYp_ // cand
            bys = [b for b in (16, 8) if L_ % b == 0]
            if bys:
                py, by_sel = cand, bys[0]
                break
        mesh = Mesh(np.array(jax.devices()[:py]).reshape(1, py),
                    ("shot", "y"))
        print(f"fused_sharded: y domain over {py} device(s), by={by_sel}",
              flush=True)
        sim_sh = make_simulator3d_fused_sharded(
            grid, dt, f0, c_max, mesh, by=by_sel, bz=64,
        )
        # per-shot wrapper (shots loop from the host, as the other
        # engines; the mesh's shot axis stays 1)
        sim = lambda c2, w_, si, ri: sim_sh(c2, w_, si[None], ri[None])[0]
    else:
        sim = make_simulator(grid, dt, f0, c_max, dtype=jnp.float32)
    pad = grid.pad

    def c2of(v):
        return (jnp.pad(v, [(pad, pad)] * 3, mode="edge") * dt) ** 2

    # observed data with the TRUE model at the full band
    fwd1 = jax.jit(lambda v, wv, si, ri: sim(c2of(v), wv, si, ri))
    vp_t = jnp.asarray(vp_true, jnp.float32)
    d_obs = [fwd1(vp_t, w, g.src_idx, g.rcv_idx) for g in geoms]
    jax.block_until_ready(d_obs[-1])
    t_data = time.time()

    from scipy.ndimage import gaussian_filter

    vp0_np = np.clip(
        gaussian_filter(vp_true.astype(np.float64), 5.0), 2000, 6000
    )
    mask_top = 5
    if args.known_surface:
        # the near-surface rows (sources z=2, receivers z=3, mask_top=5)
        # are pinned to truth and masked out of the update — the standard
        # "known near-surface / water column" convention the 2D driver
        # also uses (invert.py build_problem). Without it the source
        # injection amplitude c2[src] is wrong at the start and the
        # global amplitude residual it creates swamps the model residual:
        # measured on this problem, the resulting update is UNCORRELATED
        # with the true perturbation (corr 0.03) while J still drops 98%.
        vp0_np[:, :mask_top, :] = vp_true[:, :mask_top, :]
    vp0 = jnp.asarray(vp0_np, jnp.float32)

    # source illumination sum_t p^2 on the smooth starting model (the
    # pseudo-Hessian diagonal): computed once with the jnp engine (the
    # fused engine does not expose snapshots) and reused for all bands —
    # standard practice, the smooth model's illumination barely changes.
    prop = AcousticPropagator(grid, dt, f0, c_max, impl="jnp")
    illum = None
    ill_fn = jax.jit(
        lambda v, si, ri: prop.illumination(
            v, Geometry(src_idx=si, rcv_idx=ri), w
        )
    )
    for g in geoms:
        i1 = ill_fn(vp0, g.src_idx, g.rcv_idx)
        illum = i1 if illum is None else illum + i1
    illum = jax.block_until_ready(illum)
    t_illum = time.time()

    # Band-limiting is applied IN the misfit (filters.apply_response on the
    # synthetic seismogram, matching the pre-filtered data) — filtering the
    # wavelet instead is NOT equivalent: the zero-phase filter's pre-ring
    # clips at t=0 and the mismatch (measured 46% at 3 Hz on this Ricker)
    # would swamp the model residual. Same pattern as invert.py:127.
    from tpufwi.filters import apply_response, lowpass_response

    h2_id = jnp.ones(lowpass_response(nt, dt, 1.0).shape, jnp.float32)

    vg1 = jax.jit(
        jax.value_and_grad(
            lambda v, wv, h2, si, ri, d: l2_misfit(
                apply_response(sim(c2of(v), wv, si, ri), h2, axis=0), d
            )
        )
    )
    loss1 = jax.jit(
        lambda v, wv, h2, si, ri, d: l2_misfit(
            apply_response(fwd1(v, wv, si, ri), h2, axis=0), d
        )
    )

    def make_vg(h2, d_f):
        def vg(v):
            J, g = 0.0, None
            for gm, d in zip(geoms, d_f):
                Ji, gi = vg1(v, w, h2, gm.src_idx, gm.rcv_idx, d)
                J = J + Ji
                g = gi if g is None else g + gi
            return J, g

        def loss(v):
            return sum(
                loss1(v, w, h2, gm.src_idx, gm.rcv_idx, d)
                for gm, d in zip(geoms, d_f)
            )

        return vg, loss

    # full-band misfit bracketing (same J_ratio definition as the
    # raw-gradient run)
    vg_full, _ = make_vg(h2_id, d_obs)
    J0 = float(vg_full(vp0)[0])

    # per-band smoothing: more at the low bands
    sigmas = np.linspace(2.0, 1.0, num=len(args.bands))
    vp = vp0
    it_total = 0
    band_log = []
    for bi, fmax in enumerate(args.bands):
        # the final band runs on the unfiltered data (a 6 Hz Ricker has
        # energy well above its peak; the continuation low bands are the
        # filtered ones)
        full = fmax >= f0
        h2 = h2_id if full else lowpass_response(nt, dt, fmax)
        d_f = d_obs if full else [lowpass(d, dt, fmax) for d in d_obs]
        sigma = float(sigmas[bi])
        vg, loss = make_vg(jnp.asarray(h2, jnp.float32), d_f)

        def pre(g, _sigma=sigma):
            return precondition(
                g, illum=illum, illum_eps=1e-3, mask_top=mask_top,
                smooth_sigma=_sigma, z_axis=1,
            )

        def cb(x, info, _bi=bi, _fmax=fmax):
            rec = {
                "band": _bi, "fmax": _fmax, "it": info.it, "J": info.f,
                "gnorm": info.gnorm, "alpha": info.alpha,
                "n_evals": info.n_evals, "seconds": info.seconds,
                "t_wall": round(time.time() - t_start, 1),
            }
            logf.write(json.dumps(rec) + "\n")
            logf.flush()

        Jb0 = float(vg(vp)[0])
        vp, infos = minimize(
            vg, vp, iterations=args.iters, method="lbfgs",
            bounds=(2000.0, 6000.0), precond=pre, loss_only=loss,
            callback=cb, lbfgs_m=args.lbfgs_m,
        )
        Jb1 = float(vg(vp)[0])
        it_total += len(infos)
        band_log.append({"fmax": fmax, "J0": Jb0, "J1": Jb1,
                         "iters": len(infos), "sigma": sigma})
        print(f"band {fmax} Hz: J {Jb0:.4g} -> {Jb1:.4g} "
              f"({len(infos)} its, wall {time.time()-t_start:.0f}s)",
              flush=True)

    J1 = float(vg_full(vp)[0])
    t1 = time.time()

    vp_n = np.asarray(vp)
    vp0_n = np.asarray(vp0)
    err0 = float(np.sqrt(np.mean((vp0_n - vp_true) ** 2)))
    err1 = float(np.sqrt(np.mean((vp_n - vp_true) ** 2)))
    zt = vp_true.shape[1] // 3
    errt0 = float(np.sqrt(np.mean((vp0_n[:, :zt] - vp_true[:, :zt]) ** 2)))
    errt1 = float(np.sqrt(np.mean((vp_n[:, :zt] - vp_true[:, :zt]) ** 2)))

    summary = {
        "err_ratio_illuminated_third": errt1 / errt0,
        "err_ratio": err1 / err0,
        "J_ratio": J1 / J0,
        "grid_yzx": list(vp_true.shape),
        "padded_cells": int(NYp * NZp * NXp),
        "nt": nt,
        "n_shots": len(geoms),
        "iters_total": it_total,
        "bands_hz": args.bands,
        "bands": band_log,
        "note": ("multiscale frequency continuation + illumination/mask/"
                 "smoothing preconditioning + bounded L-BFGS"),
        "precondition": {"illum_eps": 1e-3, "mask_top": mask_top,
                         "smooth_sigma": list(map(float, sigmas))},
        "known_surface_rows": mask_top if args.known_surface else 0,
        "wall_seconds": round(t1 - t_start, 1),
        "wall_data": round(t_data - t_start, 1),
        "wall_illum": round(t_illum - t_data, 1),
        "chip": "v5e-1",
        "engine": args.engine,
    }
    with open(os.path.join(args.run_dir, "summary.json"), "w") as f:
        json.dump(summary, f, indent=1)
    np.save(os.path.join(args.run_dir, "vp_final.npy"), vp_n)
    print("SUMMARY", json.dumps(summary), flush=True)


if __name__ == "__main__":
    main()
