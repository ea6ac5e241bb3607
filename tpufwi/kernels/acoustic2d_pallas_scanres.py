"""Whole-scan-resident Pallas engine: the ENTIRE time loop inside ONE
pallas_call, wavefield state persistent in VMEM scratch across grid steps.

Why (round-2 measurement): per-time-step pallas_calls are bound by the
serialized DMA-in -> compute -> DMA-out phases of each call, not by HBM
bandwidth — batching K steps per call (acoustic2d_pallas_kstep) cut the
traffic ~4x but bought almost nothing (fwd 42.5 -> 30.1 us/step, reverse
53.5 -> 62.6). This engine removes the scan carry entirely:

  grid = (nt/CH,) time chunks; the wavefields, CPML strips and gradient
  accumulator live in scratch buffers, which Mosaic persists across
  sequential grid iterations (the standard TPU accumulator pattern). The
  per-chunk pipelined blocks are only the small streams: source-wavelet
  chunk (SMEM), seismogram rows out, boundary-ring tape out (forward) / in
  (reverse), receiver-cotangent rows in, adjoint-at-source rows out. Mosaic
  double-buffers those automatically, so per-step HBM traffic falls from
  ~25 MB (carry round trips) to ~65 KB (tape rings) and the step cost is
  pure VPU compute.

Sub-step semantics match the proven fused kernels (acoustic2d_pallas.py)
to fp32 reassociation (the CPML strip algebra runs as banded MXU matmuls
here — see make_scanres_forward — so the op order differs); parity is
pinned against the jnp engine in tests/test_scanres.py and against CPU
truth on hardware (1.7e-6 relative gradients). The tape this engine
writes is ALREADY time-shifted (row t holds rings(P_{t-2}), realized with
a 2-deep in-VMEM ring-delay), which is exactly what the reverse recursion
consumes — no O(nt * perimeter) host-side shift.

Composition contract: compiled, this engine neither batches under vmap
(its scalar-prefetch inputs don't) nor tolerates lax.map while-body
fusion of its streamed outputs (XLA scoped-vmem overflow) — multi-shot
callers loop shots from the host (FwiProblem.shot_loop='python') or use
shard_map for data parallelism.

Receiver contract: same row-slab window as the K-step engine (rows
[r0, r0+RH), r0 8-aligned); the in-kernel gather is a slab one-hot MXU
product. fp32, 2D. Spec: BASELINE.json:5 (P2), :8 (C2).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_util import bspec

from ..grid import D1_COEFFS, D2_COEFFS, Grid
from .acoustic2d_pallas import (
    PX,
    PZ,
    _shift_sum_cols,
    _shift_sum_rows,
    ext_shape,
    strip_depth,
)

# Default time sub-steps per grid iteration. The kernel body is a
# fori_loop over SUBSTEP PAIRS (the buffer ping-pong is pair-invariant,
# so the traced body covers exactly 2 sub-steps regardless of CH) —
# Mosaic compile time is therefore ~CH-independent, unlike the round-2
# unrolled body where CH=8 pushed a single compile past 30 minutes.
# Larger CH cuts per-grid-step pipeline overhead 1/CH; the streamed
# chunk sizes (tape/seis rows) grow with CH but per-step HBM traffic is
# unchanged. Dynamic in-chunk indexing this requires: SMEM scalar reads
# at traced offsets (fine), one-hot MXU reads of the cotangent row, and
# one-hot accumulator scratch for the seis/lam_src row stores (dynamic
# sublane-offset stores do not lower).
#
# Escape hatches (until the pair body is validated on every toolchain):
# TPUFWI_SCANRES_CH overrides CH; TPUFWI_SCANRES_UNROLL=1 unrolls the
# pair loop with python ints (all dynamic indices become static — the
# proven round-2 lowering, at CH-proportional compile cost).
import os as _os

CH = int(_os.environ.get("TPUFWI_SCANRES_CH", "16"))
UNROLL = _os.environ.get("TPUFWI_SCANRES_UNROLL", "0") == "1"


def _run_pairs(pair):
    if UNROLL:
        for i in range(CH // 2):
            pair(i, 0)
    else:
        # i32-pinned bounds/carry: python ints canonicalize to i64 under
        # jax_enable_x64 (the test harness), and any i64-tainted value
        # that later converts to f32 sends Mosaic's _convert_helper into
        # infinite mutual recursion (RecursionError at lowering —
        # runs/tpu_queue7/tpu_ci.log)
        jax.lax.fori_loop(
            jnp.int32(0), jnp.int32(CH // 2), pair, jnp.int32(0)
        )

# MXU precision for the banded strip products and gathers. The MXU f32
# default path rounds through bf16 (~2e-3 relative), unacceptable for
# physics values; Mosaic lowers only HIGHEST and DEFAULT dot precisions
# (Precision.HIGH raises NotImplementedError — measured round 3,
# BASELINE.md "2D machine model"). The default mode "high3" is a MANUAL
# 3-pass emulation built from bf16 splits + DEFAULT dots (classic HIGH
# algorithm: a=ah+al, b=bh+bl, keep ah·bh + ah·bl + al·bh — ~2^-18
# relative vs DEFAULT's 2^-9; one-hot operands are bf16-exact, so their
# dots split only the value side into THREE terms for full fp32).
# Hardware A/B (runs/tpu_queue8/prec_high3.log, official bench config):
#   highest 4.111 shots/s, grad_rel 4.0e-6 | high3 4.668 shots/s (+13.5%),
#   grad_rel 3.1e-6 — faster at equal-or-better accuracy, hence default.
# TPUFWI_SCANRES_MXU_PRECISION=highest restores the 6-pass XLA emulation.
_PREC = {
    "highest": jax.lax.Precision.HIGHEST,
    "high": jax.lax.Precision.HIGH,
    "default": jax.lax.Precision.DEFAULT,
}
_MXU_MODE = _os.environ.get("TPUFWI_SCANRES_MXU_PRECISION", "high3").lower()
HIGHEST = _PREC[_MXU_MODE] if _MXU_MODE in _PREC else jax.lax.Precision.HIGHEST

_DOT01 = (((1,), (0,)), ((), ()))  # jnp.dot(a, b) dimension numbers
_DOT11 = (((1,), (1,)), ((), ()))  # contract both on axis 1


def _split2(x, dtype):
    """bf16 hi/lo pair: xh + xl carries ~17 mantissa bits of x."""
    xh = x.astype(jnp.bfloat16)
    xl = (x - xh.astype(dtype)).astype(jnp.bfloat16)
    return xh, xl


def _split3(x, dtype):
    """bf16 hi/mid/lo triple: carries the full fp32 mantissa (24 bits)."""
    xh = x.astype(jnp.bfloat16)
    r1 = x - xh.astype(dtype)
    xm = r1.astype(jnp.bfloat16)
    xl = (r1 - xm.astype(dtype)).astype(jnp.bfloat16)
    return xh, xm, xl


def _pdot(a, b, dims=_DOT01, a_exact=False, b_exact=False,
          dtype=jnp.float32):
    """MXU dot at the configured precision mode.

    ``a_exact``/``b_exact`` mark operands whose values are exactly
    representable in bf16 (one-hot factors, iota masks): in high3 mode
    they are cast once and only the other side is split — three terms
    (full fp32) since the passes are tiny there anyway."""
    if _MXU_MODE != "high3":
        return jax.lax.dot_general(a, b, dims,
                                   preferred_element_type=dtype,
                                   precision=HIGHEST)

    def D(x, y):
        return jax.lax.dot_general(x, y, dims,
                                   preferred_element_type=dtype,
                                   precision=jax.lax.Precision.DEFAULT)

    if a_exact and b_exact:
        return D(a.astype(jnp.bfloat16), b.astype(jnp.bfloat16))
    if a_exact:
        ae = a.astype(jnp.bfloat16)
        bh, bm, bl = _split3(b, dtype)
        return D(ae, bh) + D(ae, bm) + D(ae, bl)
    if b_exact:
        be = b.astype(jnp.bfloat16)
        ah, am, al = _split3(a, dtype)
        return D(ah, be) + D(am, be) + D(al, be)
    ah, al = _split2(a, dtype)
    bh, bl = _split2(b, dtype)
    return D(ah, bh) + D(ah, bl) + D(al, bh)


def _banded_kz(d1, d2, S, r, dtype):
    """(2S, S+2r) stacked-band matrix: rows [0,S) apply d1, rows [S,2S)
    apply d2 — out = K @ p_slab gives [d1p; d2p] in one MXU product."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (2 * S, S + 2 * r), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (2 * S, S + 2 * r), 1)
    out = jnp.zeros((2 * S, S + 2 * r), dtype)
    for k in range(2 * r + 1):
        m1 = (rows < S) & (cols - rows == k)
        m2 = (rows >= S) & (cols - (rows - S) == k)
        out = out + d1[k] * m1.astype(dtype) + d2[k] * m2.astype(dtype)
    return out


def _banded_kcz(d1, SE, S3, dtype):
    """(SE, S3) band: corr = K @ zbuf, corr[i] = sum_k d1[k] zbuf[i+k]."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (SE, S3), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (SE, S3), 1)
    out = jnp.zeros((SE, S3), dtype)
    for k in range(len(d1)):
        out = out + d1[k] * ((cols - rows) == k).astype(dtype)
    return out


def _blockdiag2(A, B):
    """[[A, 0], [0, B]]: one MXU product applies A and B to the stacked
    ring buffers of BOTH strip sides (the per-side dots are tiny and
    dispatch-bound; the zero blocks cost nothing at these sizes — packed
    contraction dim 2*S3 <= 128 stays a single MXU pass)."""
    za = jnp.zeros((A.shape[0], B.shape[1]), A.dtype)
    zb = jnp.zeros((B.shape[0], A.shape[1]), B.dtype)
    return jnp.concatenate(
        [jnp.concatenate([A, za], 1), jnp.concatenate([zb, B], 1)], 0
    )


def _taps(grid):
    return (
        tuple(float(c) / grid.h[0] for c in D1_COEFFS[grid.order]),
        tuple(float(c) / grid.h[0] ** 2 for c in D2_COEFFS[grid.order]),
        tuple(float(c) / grid.h[1] for c in D1_COEFFS[grid.order]),
        tuple(float(c) / grid.h[1] ** 2 for c in D2_COEFFS[grid.order]),
    )


def _transposed_strips(u_ref, qoth, az_ref, bz_ref, ax_ref, bx_ref,
                       pbz, psz, pbx, psx, zw_ref, zy_ref, xw_ref, xy_ref,
                       kz_ref, kwz_ref, kyz_ref, kx_ref, kwx_ref, kyx_ref,
                       NZ, NX, S, SE, S3, r, dtype):
    """Exact transposed CPML strip step, shared by the rings and snapshot
    reverse kernels. z then x strips, both sides, three phases each: fill
    the stacked w ring + per-side d1u dots; ONE packed d1w/d2w product;
    fill the stacked y ring; ONE packed d1y product; RMW into qoth."""
    d1u_z = []
    for s, R0 in ((0, 0), (1, NZ - S)):
        a, b = az_ref[s], bz_ref[s]
        off = (r if s == 0 else 2 * r) + s * S3
        u_strip = u_ref[PZ + R0 : PZ + R0 + S, PX : PX + NX]
        ps_tot = psz[s] + u_strip
        psz[s] = b * ps_tot
        zw_ref[off : off + S, :] = a * ps_tot
        u_slab = u_ref[PZ + R0 - r : PZ + R0 - r + S + 2 * r,
                       PX : PX + NX]
        d1u_z.append(
            _pdot(kz_ref[0:S], u_slab, dtype=dtype)
        )
    dw_z = _pdot(kwz_ref[:], zw_ref[:], dtype=dtype)
    d2w_z = []
    for s in range(2):
        a, b = az_ref[s], bz_ref[s]
        off = (r if s == 0 else 2 * r) + s * S3
        d1w = dw_z[2 * SE * s : 2 * SE * s + SE]
        d2w_z.append(dw_z[2 * SE * s + SE : 2 * SE * (s + 1)])
        strip_in_ext = slice(0, S) if s == 0 else slice(r, SE)
        pb_tot = pbz[s] - d1u_z[s] - d1w[strip_in_ext]
        pbz[s] = b * pb_tot
        zy_ref[off : off + S, :] = a * pb_tot
    dy_z = _pdot(kyz_ref[:], zy_ref[:], dtype=dtype)
    for s in range(2):
        ext = slice(0, SE) if s == 0 else slice(NZ - SE, NZ)
        qoth[ext, :] = (
            qoth[ext, :] + d2w_z[s] - dy_z[s * SE : (s + 1) * SE]
        )

    d1u_x = []
    for s, C0 in ((0, 0), (1, NX - S)):
        a, b = ax_ref[s], bx_ref[s]
        off = (r if s == 0 else 2 * r) + s * S3
        u_strip = u_ref[PZ : PZ + NZ, PX + C0 : PX + C0 + S]
        ps_tot = psx[s] + u_strip
        psx[s] = b * ps_tot
        xw_ref[:, off : off + S] = a * ps_tot
        u_slab = u_ref[PZ : PZ + NZ,
                       PX + C0 - r : PX + C0 - r + S + 2 * r]
        d1u_x.append(
            _pdot(u_slab, kx_ref[0:S], _DOT11, dtype=dtype)
        )
    dw_x = _pdot(xw_ref[:], kwx_ref[:], _DOT11, dtype=dtype)
    d2w_x = []
    for s in range(2):
        a, b = ax_ref[s], bx_ref[s]
        off = (r if s == 0 else 2 * r) + s * S3
        d1w = dw_x[:, 2 * SE * s : 2 * SE * s + SE]
        d2w_x.append(dw_x[:, 2 * SE * s + SE : 2 * SE * (s + 1)])
        strip_in_ext = slice(0, S) if s == 0 else slice(r, SE)
        pb_tot = pbx[s] - d1u_x[s] - d1w[:, strip_in_ext]
        pbx[s] = b * pb_tot
        xy_ref[:, off : off + S] = a * pb_tot
    dy_x = _pdot(xy_ref[:], kyx_ref[:], _DOT11, dtype=dtype)
    for s in range(2):
        ext = slice(0, SE) if s == 0 else slice(NX - SE, NX)
        qoth[:, ext] = (
            qoth[:, ext] + d2w_x[s] - dy_x[:, s * SE : (s + 1) * SE]
        )


def make_scanres_forward(grid: Grid, nt: int, nsrc: int, nrec: int,
                         rcv_rows: int, with_tape: bool = False,
                         snap_tape: bool = False,
                         interpret: bool = False):
    """Build the whole-scan forward.

    fwd(c2_ext, profiles(4), w (nt,), c2src (nsrc,), sz, sx (nsrc,),
        rxr (1,nrec), rzr (1,nrec), r0 (1,))
      -> (seis3 (nC,CH,nrec), [tape_tm1 rings x4 (nt,h,w)],
          [lap snapshots (nt,NZ,NX) bf16], p_penult, p_last)

    ``snap_tape`` additionally streams out the interior leapfrog
    laplacian of every sub-step as bf16 — the full-field tape of the
    snapshot gradient engine (make_scanres_reverse_snap), which replaces
    the reverse-pass reconstruction entirely: the imaging condition is
    gacc += lam_t * lap(P_{t-1}) and lap(P_{t-1}) is exactly the ``lap``
    this kernel already computes at sub-step t, so the forward pays only
    a bf16 cast + an out-stream (~1.4 MB/step at Marmousi scale, well
    under the measured ~460 GB/s effective HBM bandwidth).

    nt must be a multiple of CH (caller zero-pads the wavelet). rzr is the
    receiver row relative to the slab start r0 (grid-padded minus r0).
    seis3 is chunk-streamed (Mosaic requires the minormost block dim to be
    the full array dim or a multiple of 128, hence the (1,CH,nrec) chunk
    blocks); the wrapper reshapes to (nt, nrec) once at the end.

    Performance design (round-2 measurements): per-sub-step cost is VPU
    compute, not HBM — and the CPML strip algebra dominated it when done
    as many small shifted-slice ops (the x-strips especially: lane dim
    S~24, unaligned offsets). All strip derivative work therefore runs as
    tiny banded MXU matmuls (e.g. (NZ,S+2r)@(S+2r,2S) for the x-side
    d1+d2 in one product, ~1e7 MACs per sub-step even at
    precision=HIGHEST). The seismogram gather is slab@one-hot^T on the MXU
    followed by an RH-sublane masked reduce — no 128-lane-wide reduction.
    HIGHEST everywhere: the MXU default f32 path rounds through bf16
    (~2e-3 relative), unacceptable for physics values.
    """
    if nt % CH != 0:
        raise ValueError(f"nt must be a multiple of {CH}")
    if grid.ndim != 2:
        raise ValueError("scanres kernel is 2D")
    NZ, NX = grid.padded_shape
    EZ, EX = ext_shape(grid)
    r = grid.radius
    S = strip_depth(grid)
    SE = S + r
    S3 = S + 3 * r
    RH = rcv_rows
    d1z, d2z, d1x, d2x = _taps(grid)
    fs = grid.pad if grid.free_surface else None
    nC = nt // CH

    from ..propagators.boundary import RingSpec

    ring_slices = RingSpec.build(grid).slices if with_tape else ()
    NRING = len(ring_slices)
    ring_dims = tuple(
        tuple(sl.stop - sl.start for sl in s_) for s_ in ring_slices
    )
    dtype = jnp.float32

    def kernel(*refs):
        (c2_ref, az_ref, bz_ref, ax_ref, bx_ref,
         w_ref, c2src_ref, sz_ref, sx_ref, rxr_ref, rzr_ref,
         r0_ref) = refs[:12]
        refs = refs[12:]
        seis_ref = refs[0]
        ring_o = refs[1 : 1 + NRING]
        off = 1 + NRING
        snap_ref = refs[off] if snap_tape else None
        off += 1 if snap_tape else 0
        ppen_ref, plast_ref = refs[off], refs[off + 1]
        scr = refs[off + 2 :]
        pa, pb = scr[0], scr[1]
        phiz, psiz, phix, psix = scr[2:6]
        zc_ref, xc_ref = scr[6], scr[7]  # both sides stacked: (2*S3,NX)/(NZ,2*S3)
        ohzT_ref, ohxT_ref = scr[8], scr[9]
        kz_ref, kcz_ref, kx_ref, kcx_ref = scr[10:14]
        sacc_ref = scr[14]  # (CH, nrec) seis-row accumulator
        ring_delay = scr[15 : 15 + 2 * NRING]  # [slab][delay slot]

        c = pl.program_id(0)
        tb = c * CH  # first time index of this chunk (w is whole in SMEM)
        r0 = pl.multiple_of(r0_ref[0], 8)

        @pl.when(c == 0)
        def _init():
            pa[:] = jnp.zeros((EZ, EX), dtype)
            pb[:] = jnp.zeros((EZ, EX), dtype)
            for sref in (phiz, psiz, phix, psix):
                sref[:] = jnp.zeros_like(sref)
            zc_ref[:] = jnp.zeros((2 * S3, NX), dtype)
            xc_ref[:] = jnp.zeros((NZ, 2 * S3), dtype)
            # receiver one-hot factors, receivers on lanes
            ohzT_ref[:] = (
                jax.lax.broadcasted_iota(jnp.int32, (RH, nrec), 0)
                == rzr_ref[:]
            ).astype(dtype)
            ohxT_ref[:] = (
                jax.lax.broadcasted_iota(jnp.int32, (NX, nrec), 0)
                == rxr_ref[:]
            ).astype(dtype)
            # banded strip-derivative matrices (z: left product, x: right);
            # the corr bands are block-diagonal over the two strip sides
            kz_ref[:] = _banded_kz(d1z, d2z, S, r, dtype)
            kcz = _banded_kcz(d1z, SE, S3, dtype)
            kcz_ref[:] = _blockdiag2(kcz, kcz)
            kx_ref[:] = _banded_kz(d1x, d2x, S, r, dtype)
            kcx = _banded_kcz(d1x, SE, S3, dtype)
            kcx_ref[:] = _blockdiag2(kcx, kcx)
            for dref in ring_delay:
                dref[:] = jnp.zeros_like(dref)

        def c2i(zs, xs):
            return c2_ref[PZ + zs.start : PZ + zs.stop, PX + xs.start : PX + xs.stop]

        def substep(jl, par, prev_ref, cur_ref, dst_ref):
            # jl: traced in-chunk time index; par = jl % 2 as a STATIC int
            # (the fori_loop body covers one even+odd pair)
            lap = _shift_sum_rows(cur_ref, d2z, r, 0, NZ, NX) + _shift_sum_cols(
                cur_ref, d2x, r, 0, NX, NZ
            )
            if snap_tape:  # row t = lap(P_{t-1}): what the reverse images
                snap_ref[pl.ds(jl, 1)] = lap.astype(jnp.bfloat16)[None]
            interior = (
                2.0 * cur_ref[PZ : PZ + NZ, PX : PX + NX]
                - prev_ref[PZ : PZ + NZ, PX : PX + NX]
                + c2_ref[PZ : PZ + NZ, PX : PX + NX] * lap
            )
            dst_ref[PZ : PZ + NZ, PX : PX + NX] = interior
            # point source: 8-row slab iota-mask fma (not a full-grid mask)
            i8 = jax.lax.broadcasted_iota(jnp.int32, (8, NX), 0)
            x8 = jax.lax.broadcasted_iota(jnp.int32, (8, NX), 1)
            for i in range(nsrc):
                amp = c2src_ref[i] * w_ref[tb + jl]
                sz8 = pl.multiple_of(
                    (sz_ref[i] // jnp.int32(8)) * jnp.int32(8), 8
                )  # i32-pinned: weak-int 8 goes i64 under x64
                mask = (i8 == sz_ref[i] - sz8) & (x8 == sx_ref[i])
                dst_ref[pl.ds(PZ + sz8, 8), PX : PX + NX] = (
                    dst_ref[pl.ds(PZ + sz8, 8), PX : PX + NX]
                    + amp * mask.astype(dtype)
                )

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

            # z strips, both sides: per-side d12 dots + phi update fill the
            # stacked ring buffer, then ONE block-diagonal corr product
            d2p_z = []
            for s, R0 in ((0, 0), (1, NZ - S)):
                a, b = az_ref[s], bz_ref[s]
                off = (r if s == 0 else 2 * r) + s * S3
                p_slab = cur_ref[PZ + R0 - r : PZ + R0 - r + S + 2 * r,
                                 PX : PX + NX]
                d12 = _pdot(kz_ref[:], p_slab, dtype=dtype)
                d1p, d2p = d12[:S], d12[S:]
                d2p_z.append(d2p)
                ph = b * phiz[s] + a * d1p
                phiz[s] = ph
                zc_ref[off : off + S, :] = ph
            corr_z = _pdot(kcz_ref[:], zc_ref[:], dtype=dtype)
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
                d12 = _pdot(p_slab, kx_ref[:], _DOT11, dtype=dtype)
                d1p, d2p = d12[:, :S], d12[:, S:]
                d2p_x.append(d2p)
                ph = b * phix[s] + a * d1p
                phix[s] = ph
                xc_ref[:, off : off + S] = ph
            corr_x = _pdot(xc_ref[:], kcx_ref[:], _DOT11, dtype=dtype)
            for s, C0 in ((0, 0), (1, NX - S)):
                a, b = ax_ref[s], bx_ref[s]
                corr = corr_x[:, s * SE : (s + 1) * SE]
                strip_in_ext = slice(0, S) if s == 0 else slice(r, SE)
                ps = b * psix[s] + a * (d2p_x[s] + corr[:, strip_in_ext])
                psix[s] = ps
                ext = slice(0, SE) if s == 0 else slice(NX - SE, NX)
                rmw_cols(ext, corr)
                rmw_cols(slice(C0, C0 + S), ps)

            if fs is not None:  # pressure-release surface: pin the row last
                dst_ref[PZ + fs : PZ + fs + 1, PX : PX + NX] = jnp.zeros(
                    (1, NX), dtype
                )

            # tape row t <- rings(P_{t-2}) from the 2-deep delay, then save
            # rings(P_t) into the freed slot (delay slot = t mod 2 = par)
            if with_tape:
                for m, sl in enumerate(ring_slices):
                    dref = ring_delay[2 * m + par]
                    ring_o[m][pl.ds(jl, 1)] = dref[:][None]
                    dref[:] = dst_ref[
                        PZ + sl[0].start : PZ + sl[0].stop,
                        PX + sl[1].start : PX + sl[1].stop,
                    ]

            # seismogram row: slab @ one-hot^T on the MXU, then a masked
            # RH-sublane reduce; the row lands in the (CH, nrec)
            # accumulator via a one-hot sublane mask (dynamic sublane
            # stores don't lower), flushed once per chunk
            slab = dst_ref[pl.ds(PZ + r0, RH), PX : PX + NX]
            M = _pdot(slab, ohxT_ref[:], b_exact=True,
                      dtype=dtype)  # (RH, nrec)
            row = jnp.sum(M * ohzT_ref[:], axis=0, keepdims=True)
            jmask = (
                jax.lax.broadcasted_iota(jnp.int32, (CH, 1), 0) == jl
            ).astype(dtype)
            sacc_ref[:] = sacc_ref[:] + jmask * row

        sacc_ref[:] = jnp.zeros((CH, nrec), dtype)

        def pair(i, carry):
            substep(2 * i, 0, pa, pb, pa)
            substep(2 * i + 1, 1, pb, pa, pb)
            return carry

        _run_pairs(pair)
        seis_ref[0] = sacc_ref[:]

        @pl.when(c == nC - 1)
        def _final():
            ppen_ref[:] = pa[:]
            plast_ref[:] = pb[:]

    out_specs = [
        bspec((1, CH, nrec), lambda c: (c, 0, 0), memory_space=pltpu.VMEM)
    ]
    out_shape = [jax.ShapeDtypeStruct((nC, CH, nrec), dtype)]
    for dims in ring_dims:
        out_specs.append(
            bspec((CH,) + dims, lambda c: (c, 0, 0), memory_space=pltpu.VMEM)
        )
        out_shape.append(jax.ShapeDtypeStruct((nt,) + dims, dtype))
    if snap_tape:
        out_specs.append(
            bspec((CH, NZ, NX), lambda c: (c, 0, 0), memory_space=pltpu.VMEM)
        )
        out_shape.append(jax.ShapeDtypeStruct((nt, NZ, NX), jnp.bfloat16))
    for _ in range(2):  # p_penult, p_last
        out_specs.append(
            bspec((EZ, EX), lambda c: (0, 0), memory_space=pltpu.VMEM)
        )
        out_shape.append(jax.ShapeDtypeStruct((EZ, EX), dtype))

    const2 = lambda c: (0, 0)  # noqa: E731
    const3 = lambda c: (0, 0, 0)  # noqa: E731
    in_specs = [
        bspec((EZ, EX), const2, memory_space=pltpu.VMEM),  # c2
        bspec((2, S, 1), const3, memory_space=pltpu.VMEM),  # az
        bspec((2, S, 1), const3, memory_space=pltpu.VMEM),  # bz
        bspec((2, 1, S), const3, memory_space=pltpu.VMEM),  # ax
        bspec((2, 1, S), const3, memory_space=pltpu.VMEM),  # bx
        bspec((nt,), lambda c: (0,), memory_space=pltpu.SMEM),  # w (whole)
        bspec((nsrc,), lambda c: (0,), memory_space=pltpu.SMEM),  # c2src
        bspec((nsrc,), lambda c: (0,), memory_space=pltpu.SMEM),  # sz
        bspec((nsrc,), lambda c: (0,), memory_space=pltpu.SMEM),  # sx
        bspec((1, nrec), const2, memory_space=pltpu.VMEM),  # rxr
        bspec((1, nrec), const2, memory_space=pltpu.VMEM),  # rzr
        bspec((1,), lambda c: (0,), memory_space=pltpu.SMEM),  # r0
    ]
    scratch = [
        pltpu.VMEM((EZ, EX), dtype),  # pa
        pltpu.VMEM((EZ, EX), dtype),  # pb
        pltpu.VMEM((2, S, NX), dtype),  # phiz
        pltpu.VMEM((2, S, NX), dtype),  # psiz
        pltpu.VMEM((2, NZ, S), dtype),  # phix
        pltpu.VMEM((2, NZ, S), dtype),  # psix
        pltpu.VMEM((2 * S3, NX), dtype),  # zc (both sides stacked)
        pltpu.VMEM((NZ, 2 * S3), dtype),  # xc (both sides stacked)
        pltpu.VMEM((RH, nrec), dtype),  # ohzT
        pltpu.VMEM((NX, nrec), dtype),  # ohxT
        pltpu.VMEM((2 * S, S + 2 * r), dtype),  # kz (d1;d2 stacked)
        pltpu.VMEM((2 * SE, 2 * S3), dtype),  # kcz (block-diag both sides)
        pltpu.VMEM((2 * S, S + 2 * r), dtype),  # kx (d1;d2 stacked)
        pltpu.VMEM((2 * SE, 2 * S3), dtype),  # kcx (block-diag both sides)
        pltpu.VMEM((CH, nrec), dtype),  # sacc (seis-row accumulator)
    ] + [pltpu.VMEM(dims, dtype) for dims in ring_dims for _ in range(2)]

    return pl.pallas_call(
        kernel,
        grid=(nC,),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        scratch_shapes=scratch,
        compiler_params=None
        if interpret
        else pltpu.CompilerParams(vmem_limit_bytes=120 * 1024 * 1024),
        interpret=interpret,
    )


def make_scanres_reverse(grid: Grid, nt: int, nsrc: int, nrec: int,
                         rcv_rows: int, interpret: bool = False,
                         _debug_parts: str = "all"):
    """Build the whole-scan reverse (reconstruction + exact transposed CPML
    step + imaging), grid iterations walking time chunks DESCENDING.

    rev(c2 (NZ,NX), profiles(4), w (nt,), c2src, sz, sx, rxr (1,nrec),
        rzr (1,nrec), r0 (1,), ybar3 (nC,CH,nrec),
        tape_tm1 rings x4 (nt,h,w), p_penult, p_last)
      -> (gbar (NZ,NX), lam_src3 (nC,CH,nsrc))

    Same MXU-banded strip treatment as the forward (see its docstring):
    the transposed-step strip convolutions (d1u, d1w/d2w, d1y per side)
    run as banded matmuls, the receiver-cotangent injection is a one-hot
    MXU product, and the adjoint-at-source gather is a one-hot column
    product + sublane reduce. All at precision=HIGHEST.
    """
    if nt % CH != 0:
        raise ValueError(f"nt must be a multiple of {CH}")
    if CH % 2 != 0:
        raise ValueError("CH must be even (q ping-pong across chunks)")
    NZ, NX = grid.padded_shape
    EZ, EX = ext_shape(grid)
    r = grid.radius
    S = strip_depth(grid)
    SE = S + r
    S3 = S + 3 * r
    RH = rcv_rows
    d1z, d2z, d1x, d2x = _taps(grid)
    fs = grid.pad if grid.free_surface else None
    nC = nt // CH

    from ..propagators.boundary import RingSpec

    ring_slices = RingSpec.build(grid).slices
    NRING = len(ring_slices)
    ring_dims = tuple(
        tuple(sl.stop - sl.start for sl in s_) for s_ in ring_slices
    )
    dtype = jnp.float32

    def kernel(*refs):
        (c2_ref, az_ref, bz_ref, ax_ref, bx_ref,
         w_ref, c2src_ref, sz_ref, sx_ref, rxr_ref, rzr_ref,
         r0_ref, yb_ref) = refs[:13]
        ring_i = refs[13 : 13 + NRING]
        ppen_ref, plast_ref = refs[13 + NRING], refs[14 + NRING]
        gbar_ref, lam_src_ref = refs[15 + NRING], refs[16 + NRING]
        scr = refs[17 + NRING :]
        pa, pb, u_ref = scr[0], scr[1], scr[2]
        q0, q1, gacc_ref = scr[3], scr[4], scr[5]
        pbz, psz, pbx, psx = scr[6:10]
        zw_ref, zy_ref, xw_ref, xy_ref = scr[10:14]  # both sides stacked
        ohzT_ref, ohx_ref = scr[14], scr[15]
        (kz_ref, kwz_ref, kyz_ref, kx_ref, kwx_ref, kyx_ref) = scr[16:22]
        szT_ref, sxT_ref = scr[22], scr[23]
        lsacc_ref = scr[24]  # (CH, nsrc) lam-at-src accumulator

        c = pl.program_id(0)
        tb = (nC - 1 - c) * CH  # first time index of this (descending) chunk
        r0 = pl.multiple_of(r0_ref[0], 8)

        @pl.when(c == 0)
        def _init():
            pa[:] = plast_ref[:]  # p_tp1 = P_{nt-1}
            pb[:] = ppen_ref[:]  # p_t   = P_{nt-2}
            u_ref[:] = jnp.zeros((EZ, EX), dtype)
            q0[:] = jnp.zeros((NZ, NX), dtype)
            q1[:] = jnp.zeros((NZ, NX), dtype)
            gacc_ref[:] = jnp.zeros((NZ, NX), dtype)
            for sref in (pbz, psz, pbx, psx):
                sref[:] = jnp.zeros_like(sref)
            for zbuf in (zw_ref, zy_ref):
                zbuf[:] = jnp.zeros((2 * S3, NX), dtype)
            for xbuf in (xw_ref, xy_ref):
                xbuf[:] = jnp.zeros((NZ, 2 * S3), dtype)
            ohzT_ref[:] = (
                jax.lax.broadcasted_iota(jnp.int32, (RH, nrec), 0)
                == rzr_ref[:]
            ).astype(dtype)
            ohx_ref[:] = (
                jax.lax.broadcasted_iota(jnp.int32, (nrec, NX), 1)
                == jnp.reshape(rxr_ref[:], (nrec, 1))
            ).astype(dtype)
            kz_ref[:] = _banded_kz(d1z, d2z, S, r, dtype)
            kcz2 = jnp.concatenate(
                [_banded_kcz(d1z, SE, S3, dtype), _banded_kcz(d2z, SE, S3, dtype)], 0
            )
            kwz_ref[:] = _blockdiag2(kcz2, kcz2)
            kcz1 = _banded_kcz(d1z, SE, S3, dtype)
            kyz_ref[:] = _blockdiag2(kcz1, kcz1)
            kx_ref[:] = _banded_kz(d1x, d2x, S, r, dtype)
            kcx2 = jnp.concatenate(
                [_banded_kcz(d1x, SE, S3, dtype), _banded_kcz(d2x, SE, S3, dtype)], 0
            )
            kwx_ref[:] = _blockdiag2(kcx2, kcx2)
            kcx1 = _banded_kcz(d1x, SE, S3, dtype)
            kyx_ref[:] = _blockdiag2(kcx1, kcx1)
            # source one-hots from SMEM scalars (no SMEM vector reads)
            zr = jax.lax.broadcasted_iota(jnp.int32, (NZ, nsrc), 0)
            zc = jax.lax.broadcasted_iota(jnp.int32, (NZ, nsrc), 1)
            xr = jax.lax.broadcasted_iota(jnp.int32, (NX, nsrc), 0)
            xc = jax.lax.broadcasted_iota(jnp.int32, (NX, nsrc), 1)
            szT = jnp.zeros((NZ, nsrc), dtype)
            sxT = jnp.zeros((NX, nsrc), dtype)
            for i in range(nsrc):
                szT = szT + ((zr == sz_ref[i]) & (zc == i)).astype(dtype)
                sxT = sxT + ((xr == sx_ref[i]) & (xc == i)).astype(dtype)
            szT_ref[:] = szT
            sxT_ref[:] = sxT

        # chunk processes times descending: j = CH-1 .. 0.
        # q ping-pong: `qcur` is the buffer whose (masked) value is lam_t;
        # `qoth` still holds the post-injection buffer of step t+1, so the
        # old `qa = -lam_{t+1}` term is read from it inside the q-update
        # expression — no full-grid negate-copy per step. CH must be even
        # so buffer roles line up across grid iterations AND so the
        # fori_loop pair body (one even + one odd sub-step) is
        # role-invariant — Mosaic traces 2 sub-steps regardless of CH.
        i8 = jax.lax.broadcasted_iota(jnp.int32, (8, NX), 0)
        x8 = jax.lax.broadcasted_iota(jnp.int32, (8, NX), 1)

        def substep(step_i, par):
            j = CH - 1 - step_i  # traced in-chunk time index
            p_tp1, p_t = (pa, pb) if par == 0 else (pb, pa)
            dst = pa if par == 0 else pb
            qcur = q0 if par == 0 else q1
            qoth = q1 if par == 0 else q0

            # ---- reconstruction ----
            lapw = _shift_sum_rows(p_t, d2z, r, 0, NZ, NX) + _shift_sum_cols(
                p_t, d2x, r, 0, NX, NZ
            )
            dst[PZ : PZ + NZ, PX : PX + NX] = (
                2.0 * p_t[PZ : PZ + NZ, PX : PX + NX]
                - p_tp1[PZ : PZ + NZ, PX : PX + NX]
                + c2_ref[:] * lapw
            )
            for i in range(nsrc):
                amp = c2src_ref[i] * w_ref[tb + j]
                sz8 = pl.multiple_of(
                    (sz_ref[i] // jnp.int32(8)) * jnp.int32(8), 8
                )  # i32-pinned: weak-int 8 goes i64 under x64
                mask = (i8 == sz_ref[i] - sz8) & (x8 == sx_ref[i])
                dst[pl.ds(PZ + sz8, 8), PX : PX + NX] = (
                    dst[pl.ds(PZ + sz8, 8), PX : PX + NX]
                    + amp * mask.astype(dtype)
                )
            for m, sl in enumerate(ring_slices):
                dst[PZ + sl[0].start : PZ + sl[0].stop,
                    PX + sl[1].start : PX + sl[1].stop] = (
                    ring_i[m][pl.ds(j, 1)][0]
                )

            if _debug_parts == "recon":
                return  # lam_src accumulator stays zero for this row

            # ---- transposed step ----
            # receiver-cotangent injection: one-hot MXU product into the
            # RH-row slab; yb row j broadcasts over the RH sublanes
            ohj = (
                jax.lax.broadcasted_iota(jnp.int32, (1, CH), 1) == j
            ).astype(dtype)
            ybrow = _pdot(ohj, yb_ref[0], a_exact=True,
                          dtype=dtype)  # (1, nrec)
            u_rec = ohzT_ref[:] * ybrow  # (RH, nrec)
            inj = _pdot(u_rec, ohx_ref[:], b_exact=True,
                        dtype=dtype)  # (RH, NX)
            qcur[pl.ds(r0, RH), :] = qcur[pl.ds(r0, RH), :] + inj
            lam = qcur[:]
            lam_prev = qoth[:]
            if fs is not None:  # transpose of the pressure-release row pin
                fsmask = (
                    jax.lax.broadcasted_iota(jnp.int32, (NZ, 1), 0) != fs
                ).astype(dtype)
                lam = lam * fsmask
                lam_prev = lam_prev * fsmask
            # adjoint-at-source gather: one-hot column product + sublane sum
            col = _pdot(lam, sxT_ref[:], b_exact=True,
                        dtype=dtype)  # (NZ, nsrc)
            row_s = jnp.sum(col * szT_ref[:], axis=0, keepdims=True)
            jmask = (
                jax.lax.broadcasted_iota(jnp.int32, (CH, 1), 0) == j
            ).astype(dtype)
            lsacc_ref[:] = lsacc_ref[:] + jmask * row_s
            u_ref[PZ : PZ + NZ, PX : PX + NX] = c2_ref[:] * lam
            gacc_ref[:] = gacc_ref[:] + lam * lapw
            qoth[:] = (
                2.0 * lam
                - lam_prev
                + _shift_sum_rows(u_ref, d2z, r, 0, NZ, NX)
                + _shift_sum_cols(u_ref, d2x, r, 0, NX, NZ)
            )

            if _debug_parts == "nostrips":
                return

            _transposed_strips(
                u_ref, qoth, az_ref, bz_ref, ax_ref, bx_ref,
                pbz, psz, pbx, psx, zw_ref, zy_ref, xw_ref, xy_ref,
                kz_ref, kwz_ref, kyz_ref, kx_ref, kwx_ref, kyx_ref,
                NZ, NX, S, SE, S3, r, dtype,
            )

        lsacc_ref[:] = jnp.zeros((CH, nsrc), dtype)

        def pair(i, carry):
            substep(2 * i, 0)
            substep(2 * i + 1, 1)
            return carry

        _run_pairs(pair)
        lam_src_ref[0] = lsacc_ref[:]

        @pl.when(c == nC - 1)
        def _final():
            gbar_ref[:] = gacc_ref[:]

    rev_idx3 = lambda c: (nC - 1 - c, 0, 0)  # noqa: E731
    const2 = lambda c: (0, 0)  # noqa: E731
    const3 = lambda c: (0, 0, 0)  # noqa: E731

    in_specs = [
        bspec((NZ, NX), const2, memory_space=pltpu.VMEM),  # c2
        bspec((2, S, 1), const3, memory_space=pltpu.VMEM),
        bspec((2, S, 1), const3, memory_space=pltpu.VMEM),
        bspec((2, 1, S), const3, memory_space=pltpu.VMEM),
        bspec((2, 1, S), const3, memory_space=pltpu.VMEM),
        bspec((nt,), lambda c: (0,), memory_space=pltpu.SMEM),  # w (whole)
        bspec((nsrc,), lambda c: (0,), memory_space=pltpu.SMEM),
        bspec((nsrc,), lambda c: (0,), memory_space=pltpu.SMEM),
        bspec((nsrc,), lambda c: (0,), memory_space=pltpu.SMEM),
        bspec((1, nrec), const2, memory_space=pltpu.VMEM),  # rxr
        bspec((1, nrec), const2, memory_space=pltpu.VMEM),  # rzr
        bspec((1,), lambda c: (0,), memory_space=pltpu.SMEM),  # r0
        bspec((1, CH, nrec), rev_idx3, memory_space=pltpu.VMEM),  # ybar3
    ] + [
        bspec((CH,) + dims, rev_idx3, memory_space=pltpu.VMEM)
        for dims in ring_dims
    ] + [
        bspec((EZ, EX), const2, memory_space=pltpu.VMEM),  # p_penult
        bspec((EZ, EX), const2, memory_space=pltpu.VMEM),  # p_last
    ]
    out_specs = (
        bspec((NZ, NX), const2, memory_space=pltpu.VMEM),  # gbar
        bspec((1, CH, nsrc), rev_idx3, memory_space=pltpu.VMEM),  # lam_src
    )
    out_shape = (
        jax.ShapeDtypeStruct((NZ, NX), dtype),
        jax.ShapeDtypeStruct((nC, CH, nsrc), dtype),
    )
    scratch = [
        pltpu.VMEM((EZ, EX), dtype),  # pa
        pltpu.VMEM((EZ, EX), dtype),  # pb
        pltpu.VMEM((EZ, EX), dtype),  # u
        pltpu.VMEM((NZ, NX), dtype),  # q0 (lam ping)
        pltpu.VMEM((NZ, NX), dtype),  # q1 (lam pong)
        pltpu.VMEM((NZ, NX), dtype),  # gacc
        pltpu.VMEM((2, S, NX), dtype),  # pbz
        pltpu.VMEM((2, S, NX), dtype),  # psz
        pltpu.VMEM((2, NZ, S), dtype),  # pbx
        pltpu.VMEM((2, NZ, S), dtype),  # psx
        pltpu.VMEM((2 * S3, NX), dtype),  # zw (both sides stacked)
        pltpu.VMEM((2 * S3, NX), dtype),  # zy
        pltpu.VMEM((NZ, 2 * S3), dtype),  # xw
        pltpu.VMEM((NZ, 2 * S3), dtype),  # xy
        pltpu.VMEM((RH, nrec), dtype),  # ohzT
        pltpu.VMEM((nrec, NX), dtype),  # ohx
        pltpu.VMEM((2 * S, S + 2 * r), dtype),  # kz
        pltpu.VMEM((4 * SE, 2 * S3), dtype),  # kwz (block-diag d1;d2 x sides)
        pltpu.VMEM((2 * SE, 2 * S3), dtype),  # kyz (block-diag d1 x sides)
        pltpu.VMEM((2 * S, S + 2 * r), dtype),  # kx
        pltpu.VMEM((4 * SE, 2 * S3), dtype),  # kwx
        pltpu.VMEM((2 * SE, 2 * S3), dtype),  # kyx
        pltpu.VMEM((NZ, nsrc), dtype),  # szT
        pltpu.VMEM((NX, nsrc), dtype),  # sxT
        pltpu.VMEM((CH, nsrc), dtype),  # lsacc (lam-at-src accumulator)
    ]

    return pl.pallas_call(
        kernel,
        grid=(nC,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        compiler_params=None
        if interpret
        else pltpu.CompilerParams(vmem_limit_bytes=120 * 1024 * 1024),
        interpret=interpret,
    )


def make_scanres_reverse_snap(grid: Grid, nt: int, nsrc: int, nrec: int,
                              rcv_rows: int, interpret: bool = False):
    """Whole-scan reverse on the LAP-SNAPSHOT tape: NO reconstruction.

    rev(c2 (NZ,NX), profiles(4), sz, sx (nsrc,), rxr (1,nrec),
        rzr (1,nrec), r0 (1,), ybar3 (nC,CH,nrec), snap (nt,NZ,NX) bf16)
      -> (gbar (NZ,NX), lam_src3 (nC,CH,nsrc))

    The rings reverse spends roughly a third of its sub-step cost
    re-running the forward recursion backwards (a second 17-tap lap +
    leapfrog fma + ring imposition) just to recover lap(P_{t-1}) for the
    imaging condition. Here the forward already streamed that laplacian
    out as bf16 (make_scanres_forward(snap_tape=True)); each reverse
    sub-step reads one row back, so the body is exactly one adjoint
    propagation: cotangent injection, imaging gacc += lam * lap_row, and
    the exact transposed CPML step. Gradient identity holds up to the
    bf16 tape rounding (per-row relative ~2^-8; the nt-sum averages it
    down — measured level recorded in tests/test_scanres.py).

    Tape HBM is nt * NZ * NX * 2 bytes (6.6 GB at the official bench
    config) — the engine trades the rings engine's ~68 KB/step tape for
    ~1.4 MB/step of streaming at the measured ~460 GB/s effective
    bandwidth to delete a full propagation sweep of VPU compute.
    """
    if nt % CH != 0:
        raise ValueError(f"nt must be a multiple of {CH}")
    if CH % 2 != 0:
        raise ValueError("CH must be even (q ping-pong across chunks)")
    NZ, NX = grid.padded_shape
    EZ, EX = ext_shape(grid)
    r = grid.radius
    S = strip_depth(grid)
    SE = S + r
    S3 = S + 3 * r
    RH = rcv_rows
    d1z, d2z, d1x, d2x = _taps(grid)
    fs = grid.pad if grid.free_surface else None
    nC = nt // CH
    dtype = jnp.float32

    def kernel(*refs):
        (c2_ref, az_ref, bz_ref, ax_ref, bx_ref,
         sz_ref, sx_ref, rxr_ref, rzr_ref, r0_ref,
         yb_ref, snap_ref) = refs[:12]
        gbar_ref, lam_src_ref = refs[12], refs[13]
        scr = refs[14:]
        u_ref = scr[0]
        q0, q1, gacc_ref = scr[1], scr[2], scr[3]
        pbz, psz, pbx, psx = scr[4:8]
        zw_ref, zy_ref, xw_ref, xy_ref = scr[8:12]  # both sides stacked
        ohzT_ref, ohx_ref = scr[12], scr[13]
        (kz_ref, kwz_ref, kyz_ref, kx_ref, kwx_ref, kyx_ref) = scr[14:20]
        szT_ref, sxT_ref = scr[20], scr[21]
        lsacc_ref = scr[22]  # (CH, nsrc) lam-at-src accumulator

        c = pl.program_id(0)
        r0 = pl.multiple_of(r0_ref[0], 8)

        @pl.when(c == 0)
        def _init():
            u_ref[:] = jnp.zeros((EZ, EX), dtype)
            q0[:] = jnp.zeros((NZ, NX), dtype)
            q1[:] = jnp.zeros((NZ, NX), dtype)
            gacc_ref[:] = jnp.zeros((NZ, NX), dtype)
            for sref in (pbz, psz, pbx, psx):
                sref[:] = jnp.zeros_like(sref)
            for zbuf in (zw_ref, zy_ref):
                zbuf[:] = jnp.zeros((2 * S3, NX), dtype)
            for xbuf in (xw_ref, xy_ref):
                xbuf[:] = jnp.zeros((NZ, 2 * S3), dtype)
            ohzT_ref[:] = (
                jax.lax.broadcasted_iota(jnp.int32, (RH, nrec), 0)
                == rzr_ref[:]
            ).astype(dtype)
            ohx_ref[:] = (
                jax.lax.broadcasted_iota(jnp.int32, (nrec, NX), 1)
                == jnp.reshape(rxr_ref[:], (nrec, 1))
            ).astype(dtype)
            kz_ref[:] = _banded_kz(d1z, d2z, S, r, dtype)
            kcz2 = jnp.concatenate(
                [_banded_kcz(d1z, SE, S3, dtype), _banded_kcz(d2z, SE, S3, dtype)], 0
            )
            kwz_ref[:] = _blockdiag2(kcz2, kcz2)
            kcz1 = _banded_kcz(d1z, SE, S3, dtype)
            kyz_ref[:] = _blockdiag2(kcz1, kcz1)
            kx_ref[:] = _banded_kz(d1x, d2x, S, r, dtype)
            kcx2 = jnp.concatenate(
                [_banded_kcz(d1x, SE, S3, dtype), _banded_kcz(d2x, SE, S3, dtype)], 0
            )
            kwx_ref[:] = _blockdiag2(kcx2, kcx2)
            kcx1 = _banded_kcz(d1x, SE, S3, dtype)
            kyx_ref[:] = _blockdiag2(kcx1, kcx1)
            zr = jax.lax.broadcasted_iota(jnp.int32, (NZ, nsrc), 0)
            zc = jax.lax.broadcasted_iota(jnp.int32, (NZ, nsrc), 1)
            xr = jax.lax.broadcasted_iota(jnp.int32, (NX, nsrc), 0)
            xc = jax.lax.broadcasted_iota(jnp.int32, (NX, nsrc), 1)
            szT = jnp.zeros((NZ, nsrc), dtype)
            sxT = jnp.zeros((NX, nsrc), dtype)
            for i in range(nsrc):
                szT = szT + ((zr == sz_ref[i]) & (zc == i)).astype(dtype)
                sxT = sxT + ((xr == sx_ref[i]) & (xc == i)).astype(dtype)
            szT_ref[:] = szT
            sxT_ref[:] = sxT

        def substep(step_i, par):
            j = CH - 1 - step_i  # traced in-chunk time index
            qcur = q0 if par == 0 else q1
            qoth = q1 if par == 0 else q0

            # imaging laplacian: streamed back from the forward's tape
            lapw = snap_ref[pl.ds(j, 1)][0].astype(dtype)

            # ---- transposed step (identical to the rings reverse) ----
            ohj = (
                jax.lax.broadcasted_iota(jnp.int32, (1, CH), 1) == j
            ).astype(dtype)
            ybrow = _pdot(ohj, yb_ref[0], a_exact=True,
                          dtype=dtype)  # (1, nrec)
            u_rec = ohzT_ref[:] * ybrow  # (RH, nrec)
            inj = _pdot(u_rec, ohx_ref[:], b_exact=True,
                        dtype=dtype)  # (RH, NX)
            qcur[pl.ds(r0, RH), :] = qcur[pl.ds(r0, RH), :] + inj
            lam = qcur[:]
            lam_prev = qoth[:]
            if fs is not None:  # transpose of the pressure-release row pin
                fsmask = (
                    jax.lax.broadcasted_iota(jnp.int32, (NZ, 1), 0) != fs
                ).astype(dtype)
                lam = lam * fsmask
                lam_prev = lam_prev * fsmask
            col = _pdot(lam, sxT_ref[:], b_exact=True,
                        dtype=dtype)  # (NZ, nsrc)
            row_s = jnp.sum(col * szT_ref[:], axis=0, keepdims=True)
            jmask = (
                jax.lax.broadcasted_iota(jnp.int32, (CH, 1), 0) == j
            ).astype(dtype)
            lsacc_ref[:] = lsacc_ref[:] + jmask * row_s
            u_ref[PZ : PZ + NZ, PX : PX + NX] = c2_ref[:] * lam
            gacc_ref[:] = gacc_ref[:] + lam * lapw
            qoth[:] = (
                2.0 * lam
                - lam_prev
                + _shift_sum_rows(u_ref, d2z, r, 0, NZ, NX)
                + _shift_sum_cols(u_ref, d2x, r, 0, NX, NZ)
            )

            _transposed_strips(
                u_ref, qoth, az_ref, bz_ref, ax_ref, bx_ref,
                pbz, psz, pbx, psx, zw_ref, zy_ref, xw_ref, xy_ref,
                kz_ref, kwz_ref, kyz_ref, kx_ref, kwx_ref, kyx_ref,
                NZ, NX, S, SE, S3, r, dtype,
            )

        lsacc_ref[:] = jnp.zeros((CH, nsrc), dtype)

        def pair(i, carry):
            substep(2 * i, 0)
            substep(2 * i + 1, 1)
            return carry

        _run_pairs(pair)
        lam_src_ref[0] = lsacc_ref[:]

        @pl.when(c == nC - 1)
        def _final():
            gbar_ref[:] = gacc_ref[:]

    rev_idx3 = lambda c: (nC - 1 - c, 0, 0)  # noqa: E731
    const2 = lambda c: (0, 0)  # noqa: E731
    const3 = lambda c: (0, 0, 0)  # noqa: E731

    in_specs = [
        bspec((NZ, NX), const2, memory_space=pltpu.VMEM),  # c2
        bspec((2, S, 1), const3, memory_space=pltpu.VMEM),
        bspec((2, S, 1), const3, memory_space=pltpu.VMEM),
        bspec((2, 1, S), const3, memory_space=pltpu.VMEM),
        bspec((2, 1, S), const3, memory_space=pltpu.VMEM),
        bspec((nsrc,), lambda c: (0,), memory_space=pltpu.SMEM),  # sz
        bspec((nsrc,), lambda c: (0,), memory_space=pltpu.SMEM),  # sx
        bspec((1, nrec), const2, memory_space=pltpu.VMEM),  # rxr
        bspec((1, nrec), const2, memory_space=pltpu.VMEM),  # rzr
        bspec((1,), lambda c: (0,), memory_space=pltpu.SMEM),  # r0
        bspec((1, CH, nrec), rev_idx3, memory_space=pltpu.VMEM),  # ybar3
        bspec((CH, NZ, NX), rev_idx3, memory_space=pltpu.VMEM),  # snap
    ]
    out_specs = (
        bspec((NZ, NX), const2, memory_space=pltpu.VMEM),  # gbar
        bspec((1, CH, nsrc), rev_idx3, memory_space=pltpu.VMEM),  # lam_src
    )
    out_shape = (
        jax.ShapeDtypeStruct((NZ, NX), dtype),
        jax.ShapeDtypeStruct((nC, CH, nsrc), dtype),
    )
    scratch = [
        pltpu.VMEM((EZ, EX), dtype),  # u
        pltpu.VMEM((NZ, NX), dtype),  # q0 (lam ping)
        pltpu.VMEM((NZ, NX), dtype),  # q1 (lam pong)
        pltpu.VMEM((NZ, NX), dtype),  # gacc
        pltpu.VMEM((2, S, NX), dtype),  # pbz
        pltpu.VMEM((2, S, NX), dtype),  # psz
        pltpu.VMEM((2, NZ, S), dtype),  # pbx
        pltpu.VMEM((2, NZ, S), dtype),  # psx
        pltpu.VMEM((2 * S3, NX), dtype),  # zw (both sides stacked)
        pltpu.VMEM((2 * S3, NX), dtype),  # zy
        pltpu.VMEM((NZ, 2 * S3), dtype),  # xw
        pltpu.VMEM((NZ, 2 * S3), dtype),  # xy
        pltpu.VMEM((RH, nrec), dtype),  # ohzT
        pltpu.VMEM((nrec, NX), dtype),  # ohx
        pltpu.VMEM((2 * S, S + 2 * r), dtype),  # kz
        pltpu.VMEM((4 * SE, 2 * S3), dtype),  # kwz
        pltpu.VMEM((2 * SE, 2 * S3), dtype),  # kyz
        pltpu.VMEM((2 * S, S + 2 * r), dtype),  # kx
        pltpu.VMEM((4 * SE, 2 * S3), dtype),  # kwx
        pltpu.VMEM((2 * SE, 2 * S3), dtype),  # kyx
        pltpu.VMEM((NZ, nsrc), dtype),  # szT
        pltpu.VMEM((NX, nsrc), dtype),  # sxT
        pltpu.VMEM((CH, nsrc), dtype),  # lsacc
    ]

    return pl.pallas_call(
        kernel,
        grid=(nC,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        compiler_params=None
        if interpret
        else pltpu.CompilerParams(vmem_limit_bytes=120 * 1024 * 1024),
        interpret=interpret,
    )
