"""Pipeline-efficiency experiments on the fused2 3D merged kernel.

The attribution run (runs/tpu_queue2/attrib_3d.log) puts the merged
leapfrog+x-face kernel at 14.6 ms/step at Overthrust scale = ~33% of its
5.25-field HBM bound, with the corr slab kernels adding 5.0 ms; by=24
with bz=64 exceeds the 128 MB VMEM budget. This sweeps the remaining
levers on the FULL step (merged + corr slabs, carried states):

  - bz: 64 (baseline) / 96 / 128  — fewer, larger z-transfers per sweep
  - dimension_semantics: None vs ("arbitrary", "parallel") on (gz, gy)
    (y-blocks are independent; parallel lets Mosaic pipeline across the
    fastest grid dim. The sticky slab maps only skip refetches when the
    map value repeats between consecutive steps, which stays true within
    a z-row in either semantics.)
  - by=8 at bz=128 (smaller y window, more parallel grid steps)

nt-slope timing (relay-safe). Run: python scripts/exp_3d_merged.py
"""

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
from jax import lax

from tpufwi.grid import Grid
from tpufwi.kernels.acoustic3d_fused2 import make_acoustic3d_fused_step2
from tpufwi.kernels.acoustic3d_pallas import extend_yz

ny, nz, nx = 801, 187, 801
pml, order = 20, 8
grid = Grid(shape=(ny, nz, nx), h=(25.0,) * 3, pml=pml, order=order)
c_max, f0 = 6000.0, 8.0
dt = grid.cfl_dt(c_max, safety=0.7)
NY, NZ, NX = grid.padded_shape
cells = float(NY * NZ * NX)
rng = np.random.default_rng(0)
vp = (3000.0 + 100.0 * rng.standard_normal((NY, NZ, NX))).astype(np.float32)
c2_np = ((vp * dt) ** 2).astype(np.float32)


def slope(mkprog, c2e, nts=(8, 40), reps=3):
    # c2e is an explicit jit ARGUMENT: closure-capturing it embeds the
    # 750 MB field as an HLO constant and the relay rejects the compile
    # request with HTTP 413 (measured, runs/tpu_queue3).
    times = {}
    for nt in nts:
        p = jax.jit(mkprog(nt))
        arg = 1.0
        float(p(arg * 1.01, c2e))
        ts = []
        for i in range(reps):
            t0 = time.perf_counter()
            float(p(arg * (1.01 + 1e-4 * i), c2e))
            ts.append(time.perf_counter() - t0)
        times[nt] = sorted(ts)[len(ts) // 2]
    return (times[nts[1]] - times[nts[0]]) / (nts[1] - nts[0])


def bench(name, by, bz, sem, vmem=128, bz_y=16):
    # the axon remote-compile helper fails transiently with HTTP 500
    # (runs/tpu_queue3: same config compiles minutes later) — retry twice
    # so a flaky helper doesn't masquerade as a dead config
    for attempt in range(3):
        try:
            step, zero_state = make_acoustic3d_fused_step2(
                grid, dt, f0, c_max, by=by, bz=bz, bz_y=bz_y,
                dimension_semantics=sem, vmem_limit_mb=vmem,
            )
            c2e = jnp.asarray(extend_yz(jnp.asarray(c2_np), grid, by=by, bz=bz))

            def mk(nt):
                def prog(scale, c2):
                    s0 = zero_state()
                    s0 = (s0[0], s0[1] + 1e-6 * scale, s0[2])

                    def body(s, _):
                        return step(s, c2 * scale), ()

                    s, _ = lax.scan(body, s0, None, length=nt)
                    return jnp.sum(s[1][NY // 2])

                return prog

            per = slope(mk, c2e)
            print(f"{name}: {per*1e3:8.2f} ms/step  {cells/per*1e-9:6.2f} Gcu/s",
                  flush=True)
            return
        except Exception as e:  # noqa: BLE001
            retryable = "remote_compile: HTTP 500" in repr(e)
            if retryable and attempt < 2:
                print(f"{name}: transient compile-helper 500, retrying",
                      flush=True)
                continue
            print(f"{name}: FAILED {repr(e)[:300]}", flush=True)
            return


PAR = ("arbitrary", "parallel")  # (gz, gy)
# round 2 sweep B: the y/z halo re-read tax is 2H/by + 2H/bz of the p
# stream (H=8) -> 2.25x p reads at (16,64); larger by cuts it if VMEM
# allows. (24,64) died on VMEM in round 1; (32,32)/(48,32)/(32,64) fit.
bench("by16_bz64_none   (baseline)", 16, 64, None)
bench("by32_bz32_none   ", 32, 32, None)
bench("by32_bz64_none   ", 32, 64, None)
bench("by48_bz32_none   ", 48, 32, None)
bench("by32_bz32_par    ", 32, 32, PAR)
# retries of the round-1 sweep configs that hit HTTP 500s
bench("by16_bz64_bzy64  ", 16, 64, None, bz_y=64)
bench("by16_bz96_none   ", 16, 96, None)
bench("by16_bz128_none  ", 16, 128, None)
print("done", flush=True)
