#!/usr/bin/env python
"""Scanres MXU-precision A/B on the full engine (companion to
exp_2d_scanres.py): official-bench throughput and TPU gradient accuracy
per TPUFWI_SCANRES_MXU_PRECISION level.

Accuracy reference: the jnp/XLA engine's gradient on the SAME chip (its
scan carries no MXU strip products, so it is precision-level-neutral);
the round-2 record engine measured 1.5e-6 relative against the CPU fp64
path, so anything at that level is noise-floor-equivalent.

Each level runs in a subprocess (the precision env is read at module
import). Prints one JSON line per level.
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import json, os, sys
sys.path.insert(0, %(repo)r)
import jax
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(%(repo)r, ".jax_cache"))
import jax.numpy as jnp
import numpy as np
from tpufwi.acquisition import Geometry
from tpufwi.bench.bench_fwi import bench_fwd_adjoint
from tpufwi.grid import Grid
from tpufwi.io import marmousi_like
from tpufwi.misfit import l2_misfit
from tpufwi.propagators.acoustic2d import AcousticPropagator
from tpufwi.wavelets import ricker

out = {"precision": os.environ.get("TPUFWI_SCANRES_MXU_PRECISION",
                                   "highest")}

# gradient accuracy vs the jnp engine, small Marmousi-like problem
grid = Grid(shape=(120, 360), h=(10.0, 10.0), pml=12, order=8)
f0, c_max = 12.0, 4700.0
dt = grid.cfl_dt(c_max, safety=0.7)
nt = 512
vp_np, _ = marmousi_like(nz=120, nx=360, dx=10.0)
vp = jnp.asarray(vp_np, jnp.float32)
w = ricker(f0, dt, nt)
rx = np.arange(8, 352, 4, dtype=np.int32)
rcv = np.stack([np.full_like(rx, 3), rx], 1)
geom = Geometry.from_physical(grid, np.array([[3, 180]]), rcv)
grads = {}
for impl in ("jnp", "pallas_scanres"):
    prop = AcousticPropagator(grid, dt, f0, c_max, impl=impl)
    d = jax.jit(lambda v: prop(v, geom, w))(vp)
    g = jax.jit(jax.grad(
        lambda v: l2_misfit(prop(v, geom, w), d * 1.01)
    ))(vp)
    grads[impl] = np.asarray(jax.block_until_ready(g))
out["grad_rel_vs_jnp"] = float(
    np.abs(grads["pallas_scanres"] - grads["jnp"]).max()
    / np.abs(grads["jnp"]).max()
)

# official-bench throughput at this precision
res = bench_fwd_adjoint()
out.update({
    "shots_per_sec_per_chip": round(res["shots_per_sec_per_chip"], 4),
    "us_per_step_fwd_adjoint": round(res["us_per_step_fwd_adjoint"], 3),
    "impl": res["impl"],
})
print("RESULT " + json.dumps(out), flush=True)
"""


def main():
    # Mosaic supports only HIGHEST / DEFAULT dot precisions (HIGH fails
    # to lower). DEFAULT rounds through bf16 (~2e-3) — measured here for
    # the speed ceiling, not as a production candidate. high3 is the
    # manual 3-pass bf16-split emulation (kernels/
    # acoustic2d_pallas_scanres.py::_pdot) — the candidate middle path.
    levels = sys.argv[1:] or ["highest", "high3"]
    for prec in levels:
        env = dict(os.environ, TPUFWI_SCANRES_MXU_PRECISION=prec)
        code = CHILD % {"repo": REPO}
        r = subprocess.run([sys.executable, "-c", code], env=env,
                           capture_output=True, text=True, timeout=3600)
        printed = False
        for line in r.stdout.splitlines():
            if line.startswith("RESULT "):
                print(line[7:], flush=True)
                printed = True
        if not printed:
            print(json.dumps({"precision": prec,
                              "error": (r.stderr or r.stdout)[-500:]}),
                  flush=True)


if __name__ == "__main__":
    main()
