#!/usr/bin/env python
"""P1 demo at the spec configuration (BASELINE.json:5): full Marmousi2-scale
model (351x1701 at 10 m), 32 shots, 50 multiscale L-BFGS iterations.

One real chip here; shot data-parallel semantics over 8 devices are proven
separately on the virtual CPU mesh (tests/test_sharding.py and
__graft_entry__.dryrun_multichip). Writes runs/marmousi_32shot/{summary.json,
log.jsonl}. Engine: whole-scan-resident Pallas (prop.impl=pallas_scanres).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", cache)

import jax.numpy as jnp

from tpufwi.config import FwiConfig
from tpufwi.invert import build_synthetic_problem, invert
from tpufwi.io import marmousi_like


def main():
    # engine override via argv (round 3: the snapshot engine is the
    # auto-default; pass pallas_scanres to reproduce the rings run)
    engine = sys.argv[1] if len(sys.argv) > 1 else "pallas_scanres"
    run_dir = sys.argv[2] if len(sys.argv) > 2 else "runs/marmousi_32shot"
    cfg = FwiConfig().with_overrides([
        "run_dir=" + run_dir,
        "model.nz=351", "model.nx=1701",
        "acq.n_shots=32",
        "prop.impl=" + engine,
    ])
    vp_true, dx = marmousi_like(nz=cfg.model.nz, nx=cfg.model.nx, dx=cfg.model.dx)
    t0 = time.time()
    problem, vp0 = build_synthetic_problem(cfg, vp_true, dx, mesh=None)
    problem.shot_loop = "python"  # see FwiProblem._build
    recs = []

    def log(rec):
        recs.append(dict(rec))
        print(
            f"[stage {rec['stage']} f<{rec['fmax']}Hz it {rec['iter']:3d}] "
            f"J={rec['J']:.4e} {rec['seconds']}s {rec['shots_per_sec']} shots/s",
            flush=True,
        )

    t_setup = time.time()
    vp = invert(problem, vp0, cfg, log_fn=log)
    t1 = time.time()
    vp = np.asarray(vp)
    err0 = float(np.sqrt(np.mean((np.asarray(vp0) - vp_true) ** 2)))
    err1 = float(np.sqrt(np.mean((vp - vp_true) ** 2)))
    J0 = recs[0]["J"]
    J1 = recs[-1]["J"]
    # compare final misfit within the last stage band
    last_stage = recs[-1]["stage"]
    J0_last = next(r["J"] for r in recs if r["stage"] == last_stage)
    summary = {
        "wall_seconds": round(t1 - t0, 1),
        "setup_seconds": round(t_setup - t0, 1),
        "J_ratio_last_stage": J1 / J0_last,
        "err_ratio": err1 / err0,
        "n_iters": len(recs),
        "n_shots": cfg.acq.n_shots,
        "grid": [cfg.model.nz, cfg.model.nx],
        "nt": int(problem.wavelet.shape[0]),
        "chip": "v5e-1",
        "engine": engine,
    }
    with open(os.path.join(run_dir, "summary.json"), "w") as f:
        json.dump(summary, f)
    np.save(os.path.join(run_dir, "vp_final.npy"), vp)
    print("SUMMARY", json.dumps(summary), flush=True)


if __name__ == "__main__":
    main()
