"""Is the merged 3D kernel VMEM-tap-bound?

The merged kernel runs at ~34% of its 5.25-field HBM bound
(runs/tpu_queue2/attrib_3d.log). Hypothesis: the 25 shifted full-block
reads of the 8th-order laplacian saturate VMEM bandwidth (~87 MB VMEM
tap reads per 3.5 MB block), so HBM streaming is not the binding
constraint. Test: the same merged-only kernel at order=4 reads 13 taps
instead of 25 — if ms/step drops ~2x, the kernel is tap-read-bound and
an MXU offload of one axis is the right lever; if it barely moves, the
cost is elsewhere (pipeline, scratch copies, margins).

Also: by8_bz256 makes z fully block-resident (nzb=1, no z-halo streams,
no z-slab sticky maps) as a structural simplification probe.

Run: python scripts/exp_3d_lap.py   (one TPU process at a time)
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

from tpufwi.cpml import CpmlProfile
from tpufwi.grid import Grid
from tpufwi.kernels.acoustic3d_fused2 import (
    _face_span,
    make_acoustic3d_fused_step2,
    make_leapfrog3d_merged,
    z_window,
)
from tpufwi.kernels.acoustic3d_pallas import extend_yz, y_extended, z_extended

ny, nz, nx = 801, 187, 801
pml = 20
c_max, f0 = 6000.0, 8.0


def slope(prog, arg, nts=(8, 40), reps=3):
    times = {}
    for nt in nts:
        p = prog(nt)
        float(p(arg * 1.01))
        ts = []
        for i in range(reps):
            t0 = time.perf_counter()
            float(p(arg * (1.01 + 1e-4 * i)))
            ts.append(time.perf_counter() - t0)
        times[nt] = sorted(ts)[len(ts) // 2]
    return (times[nts[1]] - times[nts[0]]) / (nts[1] - nts[0])


def profs3(grid, dt):
    S = grid.pml + grid.radius
    out = []
    for ax in range(3):
        prof = CpmlProfile.build(
            n=grid.shape[ax], pml=grid.pml, radius=grid.radius,
            h=grid.h[ax], dt=dt, c_max=c_max, f0=f0,
        )
        n_pad = grid.padded_shape[ax]
        shp = [(S, 1, 1), (1, S, 1), (1, 1, S)][ax]
        lo = (jnp.asarray(prof.a[:S], jnp.float32).reshape(shp),
              jnp.asarray(prof.b[:S], jnp.float32).reshape(shp))
        hi = (jnp.asarray(prof.a[n_pad - S:], jnp.float32).reshape(shp),
              jnp.asarray(prof.b[n_pad - S:], jnp.float32).reshape(shp))
        out.append((lo, hi))
    return out


def run_merged_only(order, by, bz, tag="", x_face="mxu"):
    for attempt in range(3):
        try:
            grid = Grid(shape=(ny, nz, nx), h=(25.0,) * 3, pml=pml,
                        order=order)
            dt = grid.cfl_dt(c_max, safety=0.7)
            NY, NZ, NX = grid.padded_shape
            S = grid.pml + grid.radius
            W = S + 2 * grid.radius
            NYe, NZe = y_extended(grid, by), z_extended(grid, bz)
            rng = np.random.default_rng(0)
            vp = (3000.0 + 100.0 * rng.standard_normal(
                (NY, NZ, NX))).astype(np.float32)
            c2 = extend_yz(jnp.asarray((vp * dt) ** 2), grid, by=by, bz=bz)
            merged = make_leapfrog3d_merged(grid, by=by, bz=bz,
                                            x_face=x_face)
            (axl, bxl), (axh, bxh) = profs3(grid, dt)[2]
            WPyl = (_face_span(0, W, by)[1] + 1) * by
            h0, h1, _ = _face_span(NY - W, W, by)
            uyl = jnp.zeros((WPyl, NZe, NX), jnp.float32)
            uyh = jnp.zeros(((h1 - h0 + 1) * by, NZe, NX), jnp.float32)
            uzl = jnp.zeros((NYe, z_window(grid, 0)[1], NX), jnp.float32)
            uzh = jnp.zeros((NYe, z_window(grid, 1)[1], NX), jnp.float32)
            zS = jnp.zeros((NYe, NZe, 4 * S), jnp.float32)

            def prog(nt):
                @jax.jit
                def f(c2_, uyl_, uyh_, uzl_, uzh_, zS_):
                    def body(carry, _):
                        pp, p, xst = carry
                        pn, xst2 = merged(
                            pp, p, c2_, xst,
                            axl, bxl, axh, bxh, (uyl_, uyh_), (uzl_, uzh_),
                        )
                        return (p, pn, xst2), None

                    z = jnp.zeros_like(c2_)
                    p0 = z.at[NY // 2, NZ // 2, NX // 2].set(1.0)
                    (_, p, *_), _ = lax.scan(
                        body, (z, p0, zS_), None, length=nt
                    )
                    return jnp.sum(p * p)

                return lambda c2_: f(c2_, uyl, uyh, uzl, uzh, zS)

            per = slope(prog, c2)
            cells = NYe * NZe * NX
            print(f"merged-only order={order} by={by} bz={bz}{tag}: "
                  f"{per*1e3:8.2f} ms/step  {cells/per*1e-9:6.2f} Gcu/s",
                  flush=True)
            return
        except Exception as e:  # noqa: BLE001
            if "remote_compile: HTTP 500" in repr(e) and attempt < 2:
                print("transient compile-helper 500, retrying", flush=True)
                continue
            print(f"merged-only order={order} by={by} bz={bz}{tag}: "
                  f"FAILED {repr(e)[:200]}", flush=True)
            return


def run_full(by, bz, bz_y=16, x_face=None):
    for attempt in range(3):
        try:
            grid = Grid(shape=(ny, nz, nx), h=(25.0,) * 3, pml=pml, order=8)
            dt = grid.cfl_dt(c_max, safety=0.7)
            NY, NZ, NX = grid.padded_shape
            rng = np.random.default_rng(0)
            vp = (3000.0 + 100.0 * rng.standard_normal(
                (NY, NZ, NX))).astype(np.float32)
            c2 = extend_yz(jnp.asarray((vp * dt) ** 2), grid, by=by, bz=bz)
            step2, zs = make_acoustic3d_fused_step2(
                grid, dt, f0, c_max, by=by, bz=bz, bz_y=bz_y, x_face=x_face)

            def prog(nt):
                @jax.jit
                def f(c2_):
                    def body(s, _):
                        return step2(s, c2_), None

                    s0 = zs()
                    s0 = (s0[0],
                          s0[1].at[NY // 2, NZ // 2, NX // 2].set(1.0),
                          s0[2])
                    (_, p, _), _ = lax.scan(body, s0, None, length=nt)
                    return jnp.sum(p * p)

                return f

            per = slope(prog, c2)
            cells = y_extended(grid, by) * z_extended(grid, bz) * NX
            print(f"full2 by={by} bz={bz} bz_y={bz_y} xf={x_face}: "
                  f"{per*1e3:8.2f} ms/step"
                  f"  {cells/per*1e-9:6.2f} Gcu/s", flush=True)
            return
        except Exception as e:  # noqa: BLE001
            if "remote_compile: HTTP 500" in repr(e) and attempt < 2:
                print("transient compile-helper 500, retrying", flush=True)
                continue
            print(f"full2 by={by} bz={bz}: FAILED {repr(e)[:200]}", flush=True)
            return


def run_vmem_tap_bw():
    """Effective VMEM shifted-read throughput: a kernel whose block lives
    in VMEM scratch and is read K times at mixed (sublane, lane) offsets,
    like a stencil's taps. The K-slope of ms/invocation isolates the
    per-tap cost; bytes/tap / slope = effective VMEM read bandwidth. If
    this lands near the merged kernel's implied ~1.5 TB/s, the 3D (and
    2D) lap kernels are at the machine's effective VMEM ceiling and only
    fewer/narrower taps can speed them up."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from tpufwi.kernels.pallas_util import bspec as bspec_local

    BY, BZ, NX = 16, 64, 849
    r, H8 = 4, 8  # same margin alignment as the real merged kernel
    dtype = jnp.float32

    def make(K):
        def kernel(p_ref, o_ref, scr):
            scr[r : r + BY, H8 : H8 + BZ, 128 : 128 + NX] = p_ref[:]
            acc = None
            for k in range(K):
                # cycle through y / z / x offsets like the real lap
                dy, dz, dx = 0, 0, 0
                if k % 3 == 0:
                    dy = k % (2 * r + 1)
                elif k % 3 == 1:
                    dz = k % (2 * r + 1)
                else:
                    dx = k % (2 * r + 1)
                t = (0.1 + 0.01 * k) * scr[
                    dy : dy + BY,
                    H8 + dz - r : H8 + dz - r + BZ,
                    128 + dx - r : 128 + dx - r + NX,
                ]
                acc = t if acc is None else acc + t
            o_ref[:] = acc

        NYb, NZb = 864, 256
        blk = bspec_local((BY, BZ, NX), lambda gz, gy: (gy, gz, 0),
                          memory_space=pltpu.VMEM)
        return pl.pallas_call(
            kernel,
            grid=(NZb // BZ, NYb // BY),
            in_specs=[blk],
            out_specs=blk,
            out_shape=jax.ShapeDtypeStruct((NYb, NZb, NX), dtype),
            scratch_shapes=[
                pltpu.VMEM((BY + 2 * r, BZ + 2 * H8, NX + 256), dtype)
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=128 * 1024 * 1024
            ),
        )

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((864, 256, NX)).astype(np.float32))
    res = {}
    for K in (5, 25):
        for attempt in range(3):
            try:
                call = make(K)

                def prog(nt):
                    @jax.jit
                    def f(x_):
                        def body(v, _):
                            return call(v), None

                        v, _ = lax.scan(body, x_, None, length=nt)
                        return jnp.sum(v[0, 0])

                    return f

                per = slope(prog, x)
                res[K] = per
                print(f"vmem-tap K={K}: {per*1e3:8.2f} ms/invocation",
                      flush=True)
                break
            except Exception as e:  # noqa: BLE001
                if "remote_compile: HTTP 500" in repr(e) and attempt < 2:
                    continue
                print(f"vmem-tap K={K}: FAILED {repr(e)[:200]}", flush=True)
                return
    if 5 in res and 25 in res:
        per_tap = (res[25] - res[5]) / 20.0
        nbytes = 864 * 256 * NX * 4
        print(f"per-tap {per_tap*1e3:.3f} ms -> effective VMEM read BW "
              f"{nbytes/per_tap/1e12:.2f} TB/s", flush=True)


def run_stream_bw():
    """Pure-DMA roofline for the merged kernel's exact pipeline shape.

    Three kernels over the same (16, 64, NX) block grid as the merged
    leapfrog, identical index maps, but no stencil:
      copy1   — one input block, one output (peak streaming through this
                block pipeline: the machine's ceiling for ANY step kernel
                with this block shape).
      step5   — pp + p + c2 + the four y/z halo slabs, out = sum
                (the merged kernel's 5.25-field HBM traffic with trivial
                compute). If this lands near the merged 14.7 ms/step, the
                kernel is DMA-pipeline-bound and the lever is LESS
                TRAFFIC (K=2 time steps per call); if it is much faster,
                the cost is in the kernel body (scratch staging).
      step5s  — step5 plus the whole-block scratch round-trip the real
                kernel does (stage p into the margined scratch, read it
                back once): isolates the staging cost.
    """
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from tpufwi.kernels.pallas_util import bspec as bspec_local

    grid = Grid(shape=(ny, nz, nx), h=(25.0,) * 3, pml=pml, order=8)
    BY, BZ = 16, 64
    r, H = 4, 8
    NY = y_extended(grid, BY)
    NZ = z_extended(grid, BZ)
    NX = grid.padded_shape[2]
    nyb, nzb = NY // BY, NZ // BZ
    dtype = jnp.float32
    YB8, ZB8 = BY // 8, BZ // 8

    blk = bspec_local((BY, BZ, NX), lambda gz, gy: (gy, gz, 0),
                      memory_space=pltpu.VMEM)
    ylo = bspec_local((H, BZ, NX),
                      lambda gz, gy: (jnp.maximum(gy * YB8 - 1, 0), gz, 0),
                      memory_space=pltpu.VMEM)
    yhi = bspec_local(
        (H, BZ, NX),
        lambda gz, gy: (jnp.minimum((gy + 1) * YB8, nyb * YB8 - 1), gz, 0),
        memory_space=pltpu.VMEM)
    zlo = bspec_local((BY, H, NX),
                      lambda gz, gy: (gy, jnp.maximum(gz * ZB8 - 1, 0), 0),
                      memory_space=pltpu.VMEM)
    zhi = bspec_local(
        (BY, H, NX),
        lambda gz, gy: (gy, jnp.minimum((gz + 1) * ZB8, nzb * ZB8 - 1), 0),
        memory_space=pltpu.VMEM)

    def k_copy1(p_ref, o_ref):
        o_ref[:] = p_ref[:] + 1.0

    def k_step5(pp_ref, p_ref, ylo_ref, yhi_ref, zlo_ref, zhi_ref, c2_ref,
                o_ref):
        o_ref[:] = pp_ref[:] + p_ref[:] + c2_ref[:]
        o_ref[0:H, :, :] = o_ref[0:H, :, :] + ylo_ref[:]
        o_ref[BY - H : BY, :, :] = o_ref[BY - H : BY, :, :] + yhi_ref[:]
        o_ref[:, 0:H, :] = o_ref[:, 0:H, :] + zlo_ref[:]
        o_ref[:, BZ - H : BZ, :] = o_ref[:, BZ - H : BZ, :] + zhi_ref[:]

    def k_step5s(pp_ref, p_ref, ylo_ref, yhi_ref, zlo_ref, zhi_ref, c2_ref,
                 o_ref, scr):
        scr[r : r + BY, H : H + BZ, 128 : 128 + NX] = p_ref[:]
        o_ref[:] = (pp_ref[:] + c2_ref[:]
                    + scr[r : r + BY, H : H + BZ, 128 : 128 + NX])
        o_ref[0:H, :, :] = o_ref[0:H, :, :] + ylo_ref[:]
        o_ref[BY - H : BY, :, :] = o_ref[BY - H : BY, :, :] + yhi_ref[:]
        o_ref[:, 0:H, :] = o_ref[:, 0:H, :] + zlo_ref[:]
        o_ref[:, BZ - H : BZ, :] = o_ref[:, BZ - H : BZ, :] + zhi_ref[:]

    def make(name):
        cp = pltpu.CompilerParams(vmem_limit_bytes=128 * 1024 * 1024)
        if name == "copy1":
            return pl.pallas_call(
                k_copy1, grid=(nzb, nyb), in_specs=[blk], out_specs=blk,
                out_shape=jax.ShapeDtypeStruct((NY, NZ, NX), dtype),
                compiler_params=cp), 2.0
        specs = [blk, blk, ylo, yhi, zlo, zhi, blk]
        fields = 5.25 + 1.0  # 5.25 read + 1 write
        if name == "step5":
            return pl.pallas_call(
                k_step5, grid=(nzb, nyb), in_specs=specs, out_specs=blk,
                out_shape=jax.ShapeDtypeStruct((NY, NZ, NX), dtype),
                compiler_params=cp), fields
        return pl.pallas_call(
            k_step5s, grid=(nzb, nyb), in_specs=specs, out_specs=blk,
            out_shape=jax.ShapeDtypeStruct((NY, NZ, NX), dtype),
            scratch_shapes=[
                pltpu.VMEM((BY + 2 * r, BZ + 2 * H, NX + 256), dtype)],
            compiler_params=cp), fields

    # block-shape sensitivity of the pure copy: (16,64) = 16 contiguous
    # 217KB runs per block; (8,128) = 8x434KB; (4,256) = one contiguous
    # 3.47MB run (z fully resident). If copy BW rises with contiguity,
    # the 308 GB/s floor is DMA-descriptor-bound, not HBM-bound.
    rng0 = np.random.default_rng(0)
    x0 = jnp.asarray(rng0.standard_normal((NY, NZ, NX)).astype(np.float32))
    for byv, bzv in ((8, 128), (4, 256)):
        if NZ % bzv or NY % byv:
            continue
        blkv = bspec_local((byv, bzv, NX), lambda gz, gy: (gy, gz, 0),
                           memory_space=pltpu.VMEM)
        for attempt in range(3):
            try:
                callv = pl.pallas_call(
                    k_copy1, grid=(NZ // bzv, NY // byv), in_specs=[blkv],
                    out_specs=blkv,
                    out_shape=jax.ShapeDtypeStruct((NY, NZ, NX), dtype),
                    compiler_params=pltpu.CompilerParams(
                        vmem_limit_bytes=128 * 1024 * 1024))

                def progv(nt, callv=callv):
                    @jax.jit
                    def f(x_):
                        def body(v, _):
                            return callv(v), None
                        v, _ = lax.scan(body, x_, None, length=nt)
                        return jnp.sum(v[0, 0])
                    return f

                per = slope(progv, x0)
                gb = NY * NZ * NX * 4 * 2 / 1e9
                print(f"stream copy1 ({byv},{bzv}): {per*1e3:8.2f} ms/step  "
                      f"{gb/per:6.0f} GB/s effective", flush=True)
                break
            except Exception as e:  # noqa: BLE001
                if "remote_compile: HTTP 500" in repr(e) and attempt < 2:
                    continue
                print(f"stream copy1 ({byv},{bzv}): FAILED {repr(e)[:160]}",
                      flush=True)
                break

    # step5x: step5 plus 8 small (BY,BZ,S) input streams and 4 small
    # output streams mimicking the merged kernel's x-state traffic.
    # If ms/step jumps far beyond the added ~0.84 fields of traffic, the
    # merged kernel's gap over step5s is PER-STREAM overhead, and packing
    # the x-state into one array is the lever.
    SS = 24

    def k_step5x(pp_ref, p_ref, ylo_ref, yhi_ref, zlo_ref, zhi_ref, c2_ref,
                 *rest):
        s1, s2, s3, s4, s5, s6, s7, s8, o_ref, o1, o2, o3, o4 = rest
        o_ref[:] = pp_ref[:] + p_ref[:] + c2_ref[:]
        o_ref[0:H, :, :] = o_ref[0:H, :, :] + ylo_ref[:]
        o_ref[BY - H : BY, :, :] = o_ref[BY - H : BY, :, :] + yhi_ref[:]
        o_ref[:, 0:H, :] = o_ref[:, 0:H, :] + zlo_ref[:]
        o_ref[:, BZ - H : BZ, :] = o_ref[:, BZ - H : BZ, :] + zhi_ref[:]
        o1[:] = s1[:] + s5[:]
        o2[:] = s2[:] + s6[:]
        o3[:] = s3[:] + s7[:]
        o4[:] = s4[:] + s8[:]

    def make_step5x():
        blkS = bspec_local((BY, BZ, SS), lambda gz, gy: (gy, gz, 0),
                           memory_space=pltpu.VMEM)
        specs = [blk, blk, ylo, yhi, zlo, zhi, blk] + [blkS] * 8
        outs = (blk, blkS, blkS, blkS, blkS)
        oshape = (jax.ShapeDtypeStruct((NY, NZ, NX), dtype),) + tuple(
            jax.ShapeDtypeStruct((NY, NZ, SS), dtype) for _ in range(4))
        return pl.pallas_call(
            k_step5x, grid=(nzb, nyb), in_specs=specs, out_specs=outs,
            out_shape=oshape,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=128 * 1024 * 1024))

    for attempt in range(3):
        try:
            callx = make_step5x()
            xs = jnp.asarray(np.random.default_rng(1).standard_normal(
                (NY, NZ, SS)).astype(np.float32))

            def progx(nt, callx=callx):
                @jax.jit
                def f(x_):
                    def body(carry, _):
                        pp, p = carry
                        o, a1, a2, a3, a4 = callx(
                            pp, p, p, p, p, p, p,
                            xs, xs, xs, xs, xs, xs, xs, xs)
                        return (p, o), None
                    (pp, p), _ = lax.scan(
                        body, (x_, x_ * 0.5), None, length=nt)
                    return jnp.sum(p[0, 0])
                return f

            x1 = jnp.asarray(np.random.default_rng(0).standard_normal(
                (NY, NZ, NX)).astype(np.float32))
            per = slope(progx, x1)
            gb = (NY * NZ * NX * 4 * 6.25 + NY * NZ * SS * 4 * 12) / 1e9
            print(f"stream step5x: {per*1e3:8.2f} ms/step  "
                  f"{gb/per:6.0f} GB/s effective (22 streams)", flush=True)
            break
        except Exception as e:  # noqa: BLE001
            if "remote_compile: HTTP 500" in repr(e) and attempt < 2:
                continue
            print(f"stream step5x: FAILED {repr(e)[:160]}", flush=True)
            break

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((NY, NZ, NX)).astype(np.float32))
    for name in ("copy1", "step5", "step5s"):
        for attempt in range(3):
            try:
                call, fields = make(name)
                if name == "copy1":
                    def prog(nt, call=call):
                        @jax.jit
                        def f(x_):
                            def body(v, _):
                                return call(v), None
                            v, _ = lax.scan(body, x_, None, length=nt)
                            return jnp.sum(v[0, 0])
                        return f
                else:
                    def prog(nt, call=call):
                        @jax.jit
                        def f(x_):
                            def body(carry, _):
                                pp, p = carry
                                o = call(pp, p, p, p, p, p, p)
                                return (p, o), None
                            (pp, p), _ = lax.scan(
                                body, (x_, x_ * 0.5), None, length=nt)
                            return jnp.sum(p[0, 0])
                        return f
                per = slope(prog, x)
                gb = NY * NZ * NX * 4 * fields / 1e9
                print(f"stream {name}: {per*1e3:8.2f} ms/step  "
                      f"{gb/per:6.0f} GB/s effective", flush=True)
                break
            except Exception as e:  # noqa: BLE001
                if "remote_compile: HTTP 500" in repr(e) and attempt < 2:
                    continue
                print(f"stream {name}: FAILED {repr(e)[:200]}", flush=True)
                break


if __name__ == "__main__":
    which = set(sys.argv[1:]) or {"all"}
    prec = os.environ.get("TPUFWI_3D_MXU_PRECISION", "highest")
    if which & {"all", "merged"}:
        run_merged_only(8, 16, 64, f"  (prec={prec})")
    if which & {"all"}:
        run_merged_only(4, 16, 64, "  (13 taps vs 25)")
        run_merged_only(2, 16, 64, "  (7 taps)")
        run_full(8, 256)  # z fully block-resident: no z-halo streams
        run_vmem_tap_bw()
    if which & {"full"}:
        run_full(16, 64, bz_y=16)
    if which & {"xface"}:
        # x-face CPML implementation A/B (ROADMAP: the 4 banded MXU
        # products at HIGHEST are the suspected serialized cost)
        run_merged_only(8, 16, 64, "  (xf=mxu)", x_face="mxu")
        run_merged_only(8, 16, 64, "  (xf=vpu)", x_face="vpu")
        run_merged_only(8, 16, 64, "  (xf=off)", x_face="off")
        run_full(16, 64, bz_y=16, x_face="vpu")
    if which & {"stream"}:
        run_stream_bw()
    print("done", flush=True)
