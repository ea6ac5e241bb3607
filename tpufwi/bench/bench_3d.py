"""3D step throughput at SEG/EAGE Overthrust scale (spec C5).

Measures cell-updates/s of the fused 3D step (z-split blocked leapfrog +
six fused CPML slab kernels) and of the bare leapfrog, via the same
relay-safe nt-slope methodology as bench_stencil.py. Run:
    python -m tpufwi.bench.bench_3d [ny nz nx]
"""

from __future__ import annotations

import time


def bench_3d_step(ny=801, nz=187, nx=801, pml=20, order=8, by=8, bz=64,
                  nts=(8, 40), reps=3, which=("leapfrog", "full_step"),
                  by2=16, bz2=64):
    import os

    import jax

    cache = os.environ.get("JAX_COMPILATION_CACHE_DIR") or os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__)))), ".jax_cache"
    )
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    import jax.numpy as jnp
    import numpy as np
    from jax import lax

    from ..grid import Grid
    from ..kernels.acoustic3d_pallas import (
        extend_yz,
        make_leapfrog3d_zsplit,
        y_extended,
        z_extended,
    )
    from ..kernels.acoustic3d_strips_pallas import make_acoustic3d_fused_step

    grid = Grid(shape=(ny, nz, nx), h=(25.0,) * 3, pml=pml, order=order)
    c_max, f0 = 6000.0, 8.0
    dt = grid.cfl_dt(c_max, safety=0.7)
    rng = np.random.default_rng(0)
    NY, NZ, NX = grid.padded_shape
    vp = (3000.0 + 100.0 * rng.standard_normal((NY, NZ, NX))).astype(np.float32)
    c2 = extend_yz(jnp.asarray((vp * dt) ** 2), grid, by=by, bz=bz)
    cells = c2.size

    step, zero_state = make_acoustic3d_fused_step(
        grid, dt, f0, c_max, by=by, bz=bz
    )
    leap = make_leapfrog3d_zsplit(grid, by=by, bz=bz)

    from ..kernels.acoustic3d_fused2 import make_acoustic3d_fused_step2

    step2, zero_state2 = make_acoustic3d_fused_step2(
        grid, dt, f0, c_max, by=by2, bz=bz2
    )
    c2_b = extend_yz(jnp.asarray((vp * dt) ** 2), grid, by=by2, bz=bz2)

    def make_full(nt):
        @jax.jit
        def prog(c2_):
            def body(s, _):
                return step(s, c2_), None

            s0 = zero_state()
            s0 = (s0[0], s0[1].at[NY // 2, NZ // 2, NX // 2].set(1.0), s0[2])
            (_, p, _), _ = lax.scan(body, s0, None, length=nt)
            return jnp.sum(p * p)

        return prog

    def make_leap(nt):
        @jax.jit
        def prog(c2_):
            def body(carry, _):
                pp, p = carry
                return (p, leap(pp, p, c2_)), None

            z = jnp.zeros_like(c2_)
            p0 = z.at[NY // 2, NZ // 2, NX // 2].set(1.0)
            (_, p), _ = lax.scan(body, (z, p0), None, length=nt)
            return jnp.sum(p * p)

        return prog

    def make_full2(nt):
        @jax.jit
        def prog(c2_):
            def body(s, _):
                return step2(s, c2_), None

            s0 = zero_state2()
            s0 = (s0[0], s0[1].at[NY // 2, NZ // 2, NX // 2].set(1.0), s0[2])
            (_, p, _), _ = lax.scan(body, s0, None, length=nt)
            return jnp.sum(p * p)

        return prog

    makers = {"leapfrog": (make_leap, c2), "full_step": (make_full, c2),
              "full_step2": (make_full2, c2_b)}
    out = {}
    for name in which:
        mk, c2_in = makers[name]
        times = {}
        for nt in nts:
            prog = mk(nt)
            float(prog(c2_in * 1.01))
            ts = []
            for i in range(reps):
                t0 = time.perf_counter()
                float(prog(c2_in * (1.01 + 1e-4 * i)))
                ts.append(time.perf_counter() - t0)
            times[nt] = sorted(ts)[len(ts) // 2]
        per_step = (times[nts[1]] - times[nts[0]]) / (nts[1] - nts[0])
        out[name] = {
            "ms_per_step": per_step * 1e3,
            "gcups": cells / per_step / 1e9,
        }
        print(f"{name}: {per_step*1e3:.2f} ms/step = "
              f"{out[name]['gcups']:.1f} Gcu/s ({cells/1e6:.0f}M cells)",
              flush=True)
    return out


if __name__ == "__main__":
    import sys

    args = [int(a) for a in sys.argv[1:4]] or [801, 187, 801]
    bench_3d_step(*args)
