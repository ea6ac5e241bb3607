"""Stencil roofline (spec P2: fused stencil >= 70% of HBM speed-of-light).

Speed-of-light model (SURVEY.md §6): a fused fp32 leapfrog+CPML step moves
>= ~16 B/cell through HBM (read p_prev, p, c2dt2; write p_next; CPML state
only on strips), so SoL = BW_HBM / 16 cell-updates/s.

Timing methodology (hard-won, see BASELINE.md): wall-clock through this
sandbox's TPU relay is only trustworthy as the nt-SLOPE of scalar-output
programs — full-array fetches and block_until_ready are dominated by relay
transfers, and identical (program, inputs) executions can be served from a
relay cache. Every benchmark here varies inputs per repetition and fits
T(nt_hi) - T(nt_lo).
"""

from __future__ import annotations

import time

import numpy as np

HBM_BW_V5E = 819e9  # bytes/s, TPU v5e (verify per hardware generation)
BYTES_PER_CELL = 16.0


def speed_of_light_cu_per_s(hbm_bw: float = HBM_BW_V5E) -> float:
    return hbm_bw / BYTES_PER_CELL


def _slope_seconds(make_run, nt_lo=250, nt_hi=1250, reps=5):
    """Seconds per step via the nt-slope of scalar-output jitted programs.

    Min over reps per nt point, not mean (same estimator as
    bench_fwi.bench_fwd_adjoint since late round 2): every relay noise
    source (RTT jitter, queueing) is additive latency, so the minimum is
    the least-biased estimate of true execution time; the per-call
    constant cancels in the slope."""
    times = {}
    for nt in (nt_lo, nt_hi):
        run, args_list = make_run(nt, reps + 1)
        float(run(*args_list[0]))  # compile + warm
        samples = []
        for a in args_list[1:]:
            t0 = time.perf_counter()
            float(run(*a))
            samples.append(time.perf_counter() - t0)
        times[nt] = min(samples)
    return (times[nt_hi] - times[nt_lo]) / (nt_hi - nt_lo), times


def bench_stencil(nz=351, nx=1701, order=8, pml=20, impl="pallas"):
    """Returns dict with us_per_step, gcell_per_s, pct_sol for the fused
    forward step on an (nz, nx) grid (Marmousi2-at-10m scale by default)."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    from ..grid import Grid

    grid = Grid(shape=(nz, nx), h=(10.0, 10.0), pml=pml, order=order)
    dt = grid.cfl_dt(4700.0, safety=0.7)
    cells = int(np.prod(grid.padded_shape))
    NZ, NX = grid.padded_shape
    c2 = jnp.full((NZ, NX), (2000.0 * dt) ** 2, jnp.float32)

    if impl == "pallas":
        from ..kernels.acoustic2d_pallas import (
            ext_shape,
            make_fused_forward_step,
            strip_profiles,
            to_ext,
            zero_strip_state,
        )

        step = make_fused_forward_step(grid)
        profiles = strip_profiles(grid, dt, 4700.0, 12.0)
        c2e = to_ext(c2, "edge")
        EZ, EX = ext_shape(grid)

        def make_run(nt, n_args):
            @jax.jit
            def run(c2_, p0):
                s0 = zero_strip_state(grid, jnp.float32)._replace(
                    p=p0, p_prev=p0 * 0.99
                )

                def body(s, _):
                    return step(s, c2_, profiles), None

                s, _ = lax.scan(body, s0, None, length=nt)
                return jnp.sum(s.p * s.p)

            def mk_p(k):
                z = jnp.zeros((EZ, EX), jnp.float32)
                v = jax.random.normal(k, (NZ, NX), jnp.float32) * 1e-3
                from ..kernels.acoustic2d_pallas import PX, PZ
                return z.at[PZ : PZ + NZ, PX : PX + NX].set(v)

            keys = [jax.random.PRNGKey(i) for i in range(n_args)]
            args = [(c2e, mk_p(k)) for k in keys]
            return run, args

    else:  # jnp twin
        from ..cpml import build_profiles
        from ..kernels.acoustic2d_jnp import (
            AcousticParams,
            make_acoustic_step,
            zero_state,
        )

        profs = build_profiles(grid, dt, 4700.0, 12.0, dtype=np.float64)
        a_ax = tuple(jnp.asarray(p[0], jnp.float32) for p in profs)
        b_ax = tuple(jnp.asarray(p[1], jnp.float32) for p in profs)
        jstep = make_acoustic_step(grid)
        idx = jnp.array([[30, 30]])

        def make_run(nt, n_args):
            @jax.jit
            def run(c2_, p0):
                params = AcousticParams(
                    c2dt2=c2_, a=a_ax, b=b_ax, src_idx=idx, rcv_idx=idx
                )
                s0 = zero_state(grid.padded_shape, 2, jnp.float32)._replace(
                    p=p0, p_prev=p0 * 0.99
                )

                def body(s, _):
                    s, _rec = jstep(s, params, 0.0)
                    return s, None

                s, _ = lax.scan(body, s0, None, length=nt)
                return jnp.sum(s.p * s.p)

            keys = [jax.random.PRNGKey(i) for i in range(n_args)]
            args = [
                (c2, jax.random.normal(k, (NZ, NX), jnp.float32) * 1e-3)
                for k in keys
            ]
            return run, args

    per_step, _ = _slope_seconds(make_run)
    gcu = cells / per_step / 1e9
    return {
        "impl": impl,
        "us_per_step": per_step * 1e6,
        "gcell_per_s": gcu,
        "pct_of_16B_sol": 100.0 * gcu * 1e9 / speed_of_light_cu_per_s(),
        "cells": cells,
    }
