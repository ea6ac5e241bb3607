#!/usr/bin/env python
"""2D scanres machine-model probes (VERDICT r2 item 3 / ROADMAP item 3).

The whole-scan-resident engine's per-step cost is pure VPU/MXU compute
(round-2 finding: HBM traffic is ~68 KB/step of tape). This script
measures, at the official bench geometry (391x1741 extended, order 8),
the nt-slope cost of stripped-down whole-scan kernels:

  P0  leapfrog only          — the VPU shift-sum floor
  P1  + CPML strip algebra   — at MXU precision highest / high / default
  full forward (engine)      — the real make_scanres_forward, no tape
  full fwd+adjoint (engine)  — the graded quantity, per precision

P1 - P0 isolates the banded-MXU strip cost per precision level: HIGHEST
is a 6-pass fp32 emulation on tiny badly-tiled matrices, so if HIGH
(3-pass) preserves gradient accuracy, it halves the dominant term. The
gradient-accuracy check compares each precision's TPU gradient against
the jnp engine's on the same chip.

Prints one JSON line per probe. Run alone on the chip.
"""

import json
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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpufwi.grid import Grid
from tpufwi.kernels.pallas_util import bspec
from tpufwi.kernels.acoustic2d_pallas import (
    PX, PZ, _shift_sum_cols, _shift_sum_rows, ext_shape, strip_depth,
    strip_profiles, to_ext,
)
from tpufwi.kernels.acoustic2d_pallas_scanres import (
    CH, _banded_kcz, _banded_kz, _blockdiag2, _run_pairs, _taps,
)

NZP, NXP = 351, 1701
H_ = 10.0
ORDER, PML = 8, 12
NTS = (256, 1280)
# Mosaic supports only HIGHEST and DEFAULT dot precisions (HIGH raises
# NotImplementedError in lowering — measured runs/tpu_queue5)
PRECS = {
    "highest": jax.lax.Precision.HIGHEST,
    "default": jax.lax.Precision.DEFAULT,
}


def make_probe(grid, nt, strips_prec=None):
    """Whole-scan probe kernel: leapfrog pair sub-steps, optionally with
    the full CPML strip algebra at the given MXU precision. Mirrors the
    production kernel's layout (extended scratch, ping-pong pair body,
    fori_loop chunks) without sources/receivers/tape."""
    NZ, NX = grid.padded_shape
    EZ, EX = ext_shape(grid)
    r = grid.radius
    S = strip_depth(grid)
    SE, S3 = S + r, S + 3 * r
    d1z, d2z, d1x, d2x = _taps(grid)
    nC = nt // CH
    dtype = jnp.float32

    def kernel(c2_ref, az_ref, bz_ref, ax_ref, bx_ref, seed_ref,
               out_ref, *scr):
        pa, pb = scr[0], scr[1]
        c = pl.program_id(0)
        if strips_prec is not None:
            (phiz, psiz, phix, psix, zc_ref, xc_ref,
             kz_ref, kcz_ref, kx_ref, kcx_ref) = scr[2:12]

        @pl.when(c == 0)
        def _init():
            pa[:] = seed_ref[:]
            pb[:] = seed_ref[:] * 0.999
            if strips_prec is not None:
                for sref in (phiz, psiz, phix, psix):
                    sref[:] = jnp.zeros_like(sref)
                zc_ref[:] = jnp.zeros((2 * S3, NX), dtype)
                xc_ref[:] = jnp.zeros((NZ, 2 * S3), dtype)
                kz_ref[:] = _banded_kz(d1z, d2z, S, r, dtype)
                kcz = _banded_kcz(d1z, SE, S3, dtype)
                kcz_ref[:] = _blockdiag2(kcz, kcz)
                kx_ref[:] = _banded_kz(d1x, d2x, S, r, dtype)
                kcx = _banded_kcz(d1x, SE, S3, dtype)
                kcx_ref[:] = _blockdiag2(kcx, kcx)

        def c2i(zs, xs):
            return c2_ref[PZ + zs.start : PZ + zs.stop,
                          PX + xs.start : PX + xs.stop]

        def substep(prev_ref, cur_ref, dst_ref):
            lap = (_shift_sum_rows(cur_ref, d2z, r, 0, NZ, NX)
                   + _shift_sum_cols(cur_ref, d2x, r, 0, NX, NZ))
            dst_ref[PZ : PZ + NZ, PX : PX + NX] = (
                2.0 * cur_ref[PZ : PZ + NZ, PX : PX + NX]
                - prev_ref[PZ : PZ + NZ, PX : PX + NX]
                + c2_ref[PZ : PZ + NZ, PX : PX + NX] * lap
            )
            if strips_prec is None:
                return

            def rmw_rows(zs, val):
                dst_ref[PZ + zs.start : PZ + zs.stop, PX : PX + NX] = (
                    dst_ref[PZ + zs.start : PZ + zs.stop, PX : PX + NX]
                    + c2i(zs, slice(0, NX)) * val
                )

            def rmw_cols(xs, val):
                dst_ref[PZ : PZ + NZ, PX + xs.start : PX + xs.stop] = (
                    dst_ref[PZ : PZ + NZ, PX + xs.start : PX + xs.stop]
                    + c2i(slice(0, NZ), xs) * val
                )

            d2p_z = []
            for s, R0 in ((0, 0), (1, NZ - S)):
                a, b = az_ref[s], bz_ref[s]
                off = (r if s == 0 else 2 * r) + s * S3
                p_slab = cur_ref[PZ + R0 - r : PZ + R0 - r + S + 2 * r,
                                 PX : PX + NX]
                d12 = jnp.dot(kz_ref[:], p_slab,
                              preferred_element_type=dtype,
                              precision=strips_prec)
                d1p, d2p = d12[:S], d12[S:]
                d2p_z.append(d2p)
                ph = b * phiz[s] + a * d1p
                phiz[s] = ph
                zc_ref[off : off + S, :] = ph
            corr_z = jnp.dot(kcz_ref[:], zc_ref[:],
                             preferred_element_type=dtype,
                             precision=strips_prec)
            for s, R0 in ((0, 0), (1, NZ - S)):
                a, b = az_ref[s], bz_ref[s]
                corr = corr_z[s * SE : (s + 1) * SE]
                strip_in_ext = slice(0, S) if s == 0 else slice(r, SE)
                ps = b * psiz[s] + a * (d2p_z[s] + corr[strip_in_ext])
                psiz[s] = ps
                ext = slice(0, SE) if s == 0 else slice(NZ - SE, NZ)
                rmw_rows(ext, corr)
                rmw_rows(slice(R0, R0 + S), ps)

            d2p_x = []
            for s, C0 in ((0, 0), (1, NX - S)):
                a, b = ax_ref[s], bx_ref[s]
                off = (r if s == 0 else 2 * r) + s * S3
                p_slab = cur_ref[PZ : PZ + NZ,
                                 PX + C0 - r : PX + C0 - r + S + 2 * r]
                d12 = jax.lax.dot_general(
                    p_slab, kx_ref[:], (((1,), (1,)), ((), ())),
                    preferred_element_type=dtype, precision=strips_prec,
                )
                d1p, d2p = d12[:, :S], d12[:, S:]
                d2p_x.append(d2p)
                ph = b * phix[s] + a * d1p
                phix[s] = ph
                xc_ref[:, off : off + S] = ph
            corr_x = jax.lax.dot_general(
                xc_ref[:], kcx_ref[:], (((1,), (1,)), ((), ())),
                preferred_element_type=dtype, precision=strips_prec,
            )
            for s, C0 in ((0, 0), (1, NX - S)):
                a, b = ax_ref[s], bx_ref[s]
                corr = corr_x[:, s * SE : (s + 1) * SE]
                strip_in_ext = slice(0, S) if s == 0 else slice(r, SE)
                ps = b * psix[s] + a * (d2p_x[s] + corr[:, strip_in_ext])
                psix[s] = ps
                ext = slice(0, SE) if s == 0 else slice(NX - SE, NX)
                rmw_cols(ext, corr)
                rmw_cols(slice(C0, C0 + S), ps)

        def pair(i, _):
            substep(pa, pb, pa)  # even sub-step: (prev, cur) -> dst
            substep(pb, pa, pb)  # odd
            return 0

        _run_pairs(pair)

        @pl.when(c == nC - 1)
        def _out():
            out_ref[:] = pb[PZ : PZ + 8, PX : PX + 128]

    scratch = [pltpu.VMEM((EZ, EX), dtype), pltpu.VMEM((EZ, EX), dtype)]
    if strips_prec is not None:
        scratch += [
            pltpu.VMEM((2, S, NX), dtype), pltpu.VMEM((2, S, NX), dtype),
            pltpu.VMEM((2, NZ, S), dtype), pltpu.VMEM((2, NZ, S), dtype),
            pltpu.VMEM((2 * S3, NX), dtype), pltpu.VMEM((NZ, 2 * S3), dtype),
            pltpu.VMEM((2 * S, S + 2 * r), dtype),
            pltpu.VMEM((2 * SE, 2 * S3), dtype),
            pltpu.VMEM((2 * S, S + 2 * r), dtype),
            pltpu.VMEM((2 * SE, 2 * S3), dtype),
        ]
    vspec = bspec(memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(nC,),
        in_specs=[vspec] * 6,
        out_specs=bspec((8, 128), lambda c: (0, 0),
                        memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, 128), dtype),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
    )


def main():
    grid = Grid(shape=(NZP, NXP), h=(H_, H_), pml=PML, order=ORDER)
    c_max, f0 = 4700.0, 12.0
    dt = grid.cfl_dt(c_max, safety=0.7)
    EZ, EX = ext_shape(grid)
    NZ, NX = grid.padded_shape
    rng = np.random.default_rng(0)
    c2 = to_ext(jnp.full((NZ, NX), (2500.0 * dt) ** 2, jnp.float32),
                "edge")
    az, bz, ax, bx = strip_profiles(grid, dt, c_max, f0)
    seed0 = np.zeros((EZ, EX), np.float32)
    seed0[PZ : PZ + NZ, PX : PX + NX] = 1e-3 * rng.standard_normal(
        (NZ, NX)
    )
    seed0 = jnp.asarray(seed0)

    def slope(mk, reps=5):
        times = {}
        for nt in NTS:
            call = mk(nt)
            run = jax.jit(lambda s: jnp.sum(call(c2, az, bz, ax, bx, s)))
            float(run(seed0))
            ts = []
            for i in range(reps):
                # never scale by exactly 1.0: the relay serves identical
                # (program, input) executions from a cache, and a cached
                # rep poisons the min estimator
                t0 = time.perf_counter()
                float(run(seed0 * (1.0 + 1e-4 * (i + 1))))
                ts.append(time.perf_counter() - t0)
            times[nt] = min(ts)
        return 1e6 * (times[NTS[1]] - times[NTS[0]]) / (NTS[1] - NTS[0])

    us0 = slope(lambda nt: make_probe(grid, nt, None))
    print(json.dumps({"probe": "P0_leapfrog_only",
                      "us_per_step": round(us0, 3)}), flush=True)
    for name, prec in PRECS.items():
        us1 = slope(lambda nt: make_probe(grid, nt, prec))
        print(json.dumps({
            "probe": f"P1_strips_{name}",
            "us_per_step": round(us1, 3),
            "strip_cost_us": round(us1 - us0, 3),
        }), flush=True)


if __name__ == "__main__":
    main()
