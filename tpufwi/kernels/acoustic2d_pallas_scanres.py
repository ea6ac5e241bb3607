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

Sub-step semantics are IDENTICAL (same op order) to the proven fused
kernels (acoustic2d_pallas.py / _kstep.py); parity is pinned against the
jnp engine in tests/test_scanres.py. The tape this engine writes is
ALREADY time-shifted (row t holds rings(P_{t-2}), realized with a 2-deep
in-VMEM ring-delay), which is exactly what the reverse recursion consumes
— no O(nt * perimeter) host-side shift.

Receiver contract: same row-slab window as the K-step engine (rows
[r0, r0+RH), r0 8-aligned); the in-kernel gather is a slab one-hot MXU
product. fp32, 2D. Spec: BASELINE.json:5 (P2), :8 (C2).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..grid import D1_COEFFS, D2_COEFFS, Grid
from .acoustic2d_pallas import (
    PX,
    PZ,
    _shift_sum_cols,
    _shift_sum_rows,
    ext_shape,
    strip_depth,
)

# Default time sub-steps per grid iteration. The kernel body unrolls CH
# sub-steps, so Mosaic compile time scales ~linearly with it; at Marmousi
# scale (~800 native tiles per full-grid op) CH=8 pushed a single kernel
# compile past 30 minutes while CH=2 compiles in minutes. Streaming
# granularity (tape/seis chunk size) also equals CH; the HBM traffic per
# step is CH-independent, so small CH costs only per-grid-step overhead.
CH = 2


def _taps(grid):
    return (
        tuple(float(c) / grid.h[0] for c in D1_COEFFS[grid.order]),
        tuple(float(c) / grid.h[0] ** 2 for c in D2_COEFFS[grid.order]),
        tuple(float(c) / grid.h[1] for c in D1_COEFFS[grid.order]),
        tuple(float(c) / grid.h[1] ** 2 for c in D2_COEFFS[grid.order]),
    )


def make_scanres_forward(grid: Grid, nt: int, nsrc: int, nrec: int,
                         rcv_rows: int, with_tape: bool = False,
                         interpret: bool = False):
    """Build the whole-scan forward.

    fwd(c2_ext, profiles(4), w (nt,), c2src (nsrc,), sz, sx (nsrc,),
        rz (1,nrec), rxc (nrec,1), rzr (nrec,1), r0 (1,))
      -> (seis3 (nC,nrec,CH), [tape_tm1 rings x4 (nt,h,w)], p_penult, p_last)

    nt must be a multiple of CH (caller zero-pads the wavelet). rzr is the
    receiver row relative to the slab start r0 (grid-padded minus r0).
    seis3 is chunk-streamed and TRANSPOSED (receivers on sublanes, time on
    lanes): the in-kernel row-wise gather reduction lands on sublanes
    naturally, so a (nrec, 1) column store avoids a per-step
    lane<->sublane relayout; and Mosaic requires the minormost block dim
    to be the full array dim or a multiple of 128, hence the (1,nrec,CH)
    chunk blocks. The wrapper reassembles (nt, nrec) once at the end.
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
         w_ref, c2src_ref, sz_ref, sx_ref, rz_ref, rxc_ref, rzr_ref,
         r0_ref) = refs[:13]
        refs = refs[13:]
        seis_ref = refs[0]
        ring_o = refs[1 : 1 + NRING]
        ppen_ref, plast_ref = refs[1 + NRING], refs[2 + NRING]
        scr = refs[3 + NRING :]
        pa, pb = scr[0], scr[1]
        phiz, psiz, phix, psix = scr[2:6]
        zc0, zc1, xc0, xc1 = scr[6:10]
        ohz_ref, ohx_ref = scr[10], scr[11]
        ring_delay = scr[12 : 12 + 2 * NRING]  # [slab][delay slot]

        c = pl.program_id(0)
        tb = c * CH  # first time index of this chunk (w is whole in SMEM)
        r0 = pl.multiple_of(r0_ref[0], 8)

        @pl.when(c == 0)
        def _init():
            pa[:] = jnp.zeros((EZ, EX), dtype)
            pb[:] = jnp.zeros((EZ, EX), dtype)
            for sref in (phiz, psiz, phix, psix):
                sref[:] = jnp.zeros_like(sref)
            for s, (zbuf, xbuf) in enumerate(((zc0, xc0), (zc1, xc1))):
                off = r if s == 0 else 2 * r
                zbuf[0:off, :] = jnp.zeros((off, NX), dtype)
                zbuf[off + S :, :] = jnp.zeros((3 * r - off, NX), dtype)
                xbuf[:, 0:off] = jnp.zeros((NZ, off), dtype)
                xbuf[:, off + S :] = jnp.zeros((NZ, 3 * r - off), dtype)
            # receiver one-hot factors (slab-relative rows)
            ohz_ref[:] = (
                jax.lax.broadcasted_iota(jnp.int32, (nrec, RH), 1)
                == rzr_ref[:]
            ).astype(dtype)
            ohx_ref[:] = (
                jax.lax.broadcasted_iota(jnp.int32, (nrec, NX), 1)
                == rxc_ref[:]
            ).astype(dtype)
            for dref in ring_delay:
                dref[:] = jnp.zeros_like(dref)

        ziota = jax.lax.broadcasted_iota(jnp.int32, (NZ, NX), 0)
        xiota = jax.lax.broadcasted_iota(jnp.int32, (NZ, NX), 1)

        def c2i(zs, xs):
            return c2_ref[PZ + zs.start : PZ + zs.stop, PX + xs.start : PX + xs.stop]

        def substep(j, prev_ref, cur_ref, dst_ref):
            lap = _shift_sum_rows(cur_ref, d2z, r, 0, NZ, NX) + _shift_sum_cols(
                cur_ref, d2x, r, 0, NX, NZ
            )
            interior = (
                2.0 * cur_ref[PZ : PZ + NZ, PX : PX + NX]
                - prev_ref[PZ : PZ + NZ, PX : PX + NX]
                + c2_ref[PZ : PZ + NZ, PX : PX + NX] * lap
            )
            for i in range(nsrc):
                amp = c2src_ref[i] * w_ref[tb + j]
                mask = (ziota == sz_ref[i]) & (xiota == sx_ref[i])
                interior = interior + amp * mask.astype(dtype)
            dst_ref[PZ : PZ + NZ, PX : PX + NX] = interior

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

            for s, R0 in ((0, 0), (1, NZ - S)):
                a, b = az_ref[s], bz_ref[s]
                zbuf = zc0 if s == 0 else zc1
                off = r if s == 0 else 2 * r
                d1p = _shift_sum_rows(cur_ref, d1z, r, R0, S, NX)
                ph = b * phiz[s] + a * d1p
                phiz[s] = ph
                zbuf[off : off + S, :] = ph
                corr = None
                for k, cc in enumerate(d1z):
                    if cc == 0.0:
                        continue
                    t = cc * zbuf[k : k + SE, :]
                    corr = t if corr is None else corr + t
                d2p_strip = _shift_sum_rows(cur_ref, d2z, r, R0, S, NX)
                strip_in_ext = slice(0, S) if s == 0 else slice(r, SE)
                ps = b * psiz[s] + a * (d2p_strip + corr[strip_in_ext])
                psiz[s] = ps
                ext = slice(0, SE) if s == 0 else slice(NZ - SE, NZ)
                rmw_rows(ext, corr)
                rmw_rows(slice(R0, R0 + S), ps)

            for s, C0 in ((0, 0), (1, NX - S)):
                a, b = ax_ref[s], bx_ref[s]
                xbuf = xc0 if s == 0 else xc1
                off = r if s == 0 else 2 * r
                d1p = _shift_sum_cols(cur_ref, d1x, r, C0, S, NZ)
                ph = b * phix[s] + a * d1p
                phix[s] = ph
                xbuf[:, off : off + S] = ph
                corr = None
                for k, cc in enumerate(d1x):
                    if cc == 0.0:
                        continue
                    t = cc * xbuf[:, k : k + SE]
                    corr = t if corr is None else corr + t
                d2p_strip = _shift_sum_cols(cur_ref, d2x, r, C0, S, NZ)
                strip_in_ext = slice(0, S) if s == 0 else slice(r, SE)
                ps = b * psix[s] + a * (d2p_strip + corr[:, strip_in_ext])
                psix[s] = ps
                ext = slice(0, SE) if s == 0 else slice(NX - SE, NX)
                rmw_cols(ext, corr)
                rmw_cols(slice(C0, C0 + S), ps)

            if fs is not None:  # pressure-release surface: pin the row last
                dst_ref[PZ + fs : PZ + fs + 1, PX : PX + NX] = jnp.zeros(
                    (1, NX), dtype
                )

            # tape row t <- rings(P_{t-2}) from the 2-deep delay, then save
            # rings(P_t) into the freed slot (delay slot = t mod 2 = j mod 2)
            if with_tape:
                for m, sl in enumerate(ring_slices):
                    dref = ring_delay[2 * m + (j % 2)]
                    ring_o[m][j] = dref[:]
                    dref[:] = dst_ref[
                        PZ + sl[0].start : PZ + sl[0].stop,
                        PX + sl[1].start : PX + sl[1].stop,
                    ]

            # seismogram column (transposed layout): slab one-hot MXU gather.
            # precision=HIGHEST: the MXU's default f32 path rounds through
            # bf16, which would put ~2e-3 relative error on every recorded
            # sample; 3-pass fp32 on this tiny product is free.
            slab = dst_ref[pl.ds(PZ + r0, RH), PX : PX + NX]
            G = jnp.dot(
                ohz_ref[:], slab, preferred_element_type=dtype,
                precision=jax.lax.Precision.HIGHEST,
            )
            seis_ref[0, :, j : j + 1] = jnp.sum(
                G * ohx_ref[:], axis=1, keepdims=True
            )

        prev_ref, cur_ref = pa, pb
        for j in range(CH):
            dst = prev_ref
            substep(j, prev_ref, cur_ref, dst)
            prev_ref, cur_ref = cur_ref, dst

        @pl.when(c == nC - 1)
        def _final():
            ppen_ref[:] = prev_ref[:]
            plast_ref[:] = cur_ref[:]

    # seismogram streams as (nC, nrec, CH) chunks: Mosaic requires the
    # minormost block dim to be a multiple of 128 or the full array dim,
    # so the lane dim is the CH sub-steps of ONE chunk (full) and the
    # chunk index is a leading grid-mapped dim. Wrapper reassembles time.
    out_specs = [
        pl.BlockSpec((1, nrec, CH), lambda c: (c, 0, 0), memory_space=pltpu.VMEM)
    ]
    out_shape = [jax.ShapeDtypeStruct((nC, nrec, CH), dtype)]
    for dims in ring_dims:
        out_specs.append(
            pl.BlockSpec((CH,) + dims, lambda c: (c, 0, 0), memory_space=pltpu.VMEM)
        )
        out_shape.append(jax.ShapeDtypeStruct((nt,) + dims, dtype))
    for _ in range(2):  # p_penult, p_last
        out_specs.append(
            pl.BlockSpec((EZ, EX), lambda c: (0, 0), memory_space=pltpu.VMEM)
        )
        out_shape.append(jax.ShapeDtypeStruct((EZ, EX), dtype))

    const2 = lambda c: (0, 0)  # noqa: E731
    const3 = lambda c: (0, 0, 0)  # noqa: E731
    in_specs = [
        pl.BlockSpec((EZ, EX), const2, memory_space=pltpu.VMEM),  # c2
        pl.BlockSpec((2, S, 1), const3, memory_space=pltpu.VMEM),  # az
        pl.BlockSpec((2, S, 1), const3, memory_space=pltpu.VMEM),  # bz
        pl.BlockSpec((2, 1, S), const3, memory_space=pltpu.VMEM),  # ax
        pl.BlockSpec((2, 1, S), const3, memory_space=pltpu.VMEM),  # bx
        pl.BlockSpec((nt,), lambda c: (0,), memory_space=pltpu.SMEM),  # w (whole)
        pl.BlockSpec((nsrc,), lambda c: (0,), memory_space=pltpu.SMEM),  # c2src
        pl.BlockSpec((nsrc,), lambda c: (0,), memory_space=pltpu.SMEM),  # sz
        pl.BlockSpec((nsrc,), lambda c: (0,), memory_space=pltpu.SMEM),  # sx
        pl.BlockSpec((1, nrec), const2, memory_space=pltpu.VMEM),  # rz
        pl.BlockSpec((nrec, 1), const2, memory_space=pltpu.VMEM),  # rxc
        pl.BlockSpec((nrec, 1), const2, memory_space=pltpu.VMEM),  # rzr
        pl.BlockSpec((1,), lambda c: (0,), memory_space=pltpu.SMEM),  # r0
    ]
    scratch = [
        pltpu.VMEM((EZ, EX), dtype),  # pa
        pltpu.VMEM((EZ, EX), dtype),  # pb
        pltpu.VMEM((2, S, NX), dtype),  # phiz
        pltpu.VMEM((2, S, NX), dtype),  # psiz
        pltpu.VMEM((2, NZ, S), dtype),  # phix
        pltpu.VMEM((2, NZ, S), dtype),  # psix
        pltpu.VMEM((S + 3 * r, NX), dtype),  # zc0
        pltpu.VMEM((S + 3 * r, NX), dtype),  # zc1
        pltpu.VMEM((NZ, S + 3 * r), dtype),  # xc0
        pltpu.VMEM((NZ, S + 3 * r), dtype),  # xc1
        pltpu.VMEM((nrec, RH), dtype),  # ohz
        pltpu.VMEM((nrec, NX), dtype),  # ohx
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
                         rcv_rows: int, interpret: bool = False):
    """Build the whole-scan reverse (reconstruction + exact transposed CPML
    step + imaging), grid iterations walking time chunks DESCENDING.

    rev(c2 (NZ,NX), profiles(4), w (nt,), c2src, sz, sx, rz (1,nrec),
        rxc (nrec,1), rzr (nrec,1), r0 (1,), ybar3 (nC,nrec,CH),
        tape_tm1 rings x4 (nt,h,w), p_penult, p_last)
      -> (gbar (NZ,NX), lam_src3 (nC,nsrc,CH))

    ybar3 / lam_src3 are chunk-streamed and transposed (time on lanes) for
    the same relayout-free column access as the forward's seis3.
    """
    if nt % CH != 0:
        raise ValueError(f"nt must be a multiple of {CH}")
    NZ, NX = grid.padded_shape
    EZ, EX = ext_shape(grid)
    r = grid.radius
    S = strip_depth(grid)
    SE = S + r
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
         w_ref, c2src_ref, sz_ref, sx_ref, rz_ref, rxc_ref, rzr_ref,
         r0_ref, yb_ref) = refs[:14]
        ring_i = refs[14 : 14 + NRING]
        ppen_ref, plast_ref = refs[14 + NRING], refs[15 + NRING]
        gbar_ref, lam_src_ref = refs[16 + NRING], refs[17 + NRING]
        scr = refs[18 + NRING :]
        pa, pb, u_ref = scr[0], scr[1], scr[2]
        qa, qb, gacc_ref = scr[3], scr[4], scr[5]
        pbz, psz, pbx, psx = scr[6:10]
        zw0, zw1, zy0, zy1, xw0, xw1, xy0, xy1 = scr[10:18]
        ohz_ref, ohx_ref = scr[18], scr[19]

        c = pl.program_id(0)
        tb = (nC - 1 - c) * CH  # first time index of this (descending) chunk
        r0 = pl.multiple_of(r0_ref[0], 8)

        @pl.when(c == 0)
        def _init():
            pa[:] = plast_ref[:]  # p_tp1 = P_{nt-1}
            pb[:] = ppen_ref[:]  # p_t   = P_{nt-2}
            u_ref[:] = jnp.zeros((EZ, EX), dtype)
            qa[:] = jnp.zeros((NZ, NX), dtype)
            qb[:] = jnp.zeros((NZ, NX), dtype)
            gacc_ref[:] = jnp.zeros((NZ, NX), dtype)
            for sref in (pbz, psz, pbx, psx):
                sref[:] = jnp.zeros_like(sref)
            for s, bufs in enumerate(((zw0, zy0, xw0, xy0), (zw1, zy1, xw1, xy1))):
                zw, zy, xw, xy = bufs
                off = r if s == 0 else 2 * r
                for zbuf in (zw, zy):
                    zbuf[0:off, :] = jnp.zeros((off, NX), dtype)
                    zbuf[off + S :, :] = jnp.zeros((3 * r - off, NX), dtype)
                for xbuf in (xw, xy):
                    xbuf[:, 0:off] = jnp.zeros((NZ, off), dtype)
                    xbuf[:, off + S :] = jnp.zeros((NZ, 3 * r - off), dtype)
            ohz_ref[:] = (
                jax.lax.broadcasted_iota(jnp.int32, (RH, nrec), 0)
                == (rz_ref[:] - r0)
            ).astype(dtype)
            ohx_ref[:] = (
                jax.lax.broadcasted_iota(jnp.int32, (nrec, NX), 1)
                == rxc_ref[:]
            ).astype(dtype)

        ziota = jax.lax.broadcasted_iota(jnp.int32, (NZ, NX), 0)
        xiota = jax.lax.broadcasted_iota(jnp.int32, (NZ, NX), 1)

        # chunk processes times descending: j = CH-1 .. 0
        p_tp1, p_t = pa, pb
        for step_i in range(CH):
            j = CH - 1 - step_i
            dst = pa if step_i % 2 == 0 else pb

            # ---- reconstruction ----
            lapw = _shift_sum_rows(p_t, d2z, r, 0, NZ, NX) + _shift_sum_cols(
                p_t, d2x, r, 0, NX, NZ
            )
            body = (
                2.0 * p_t[PZ : PZ + NZ, PX : PX + NX]
                - p_tp1[PZ : PZ + NZ, PX : PX + NX]
                + c2_ref[:] * lapw
            )
            for i in range(nsrc):
                amp = c2src_ref[i] * w_ref[tb + j]
                mask = (ziota == sz_ref[i]) & (xiota == sx_ref[i])
                body = body + amp * mask.astype(dtype)
            dst[PZ : PZ + NZ, PX : PX + NX] = body
            for m, sl in enumerate(ring_slices):
                dst[PZ + sl[0].start : PZ + sl[0].stop,
                    PX + sl[1].start : PX + sl[1].stop] = ring_i[m][j]

            # ---- transposed step ----
            u_rec = ohx_ref[:] * yb_ref[0, :, j : j + 1]  # (nrec, NX)
            inj = jnp.dot(
                ohz_ref[:], u_rec, preferred_element_type=dtype,
                precision=jax.lax.Precision.HIGHEST,
            )
            qb[pl.ds(r0, RH), :] = qb[pl.ds(r0, RH), :] + inj
            lam = qb[:]
            if fs is not None:  # transpose of the pressure-release row pin
                lam = lam * (
                    jax.lax.broadcasted_iota(jnp.int32, (NZ, 1), 0) != fs
                ).astype(dtype)
            lam_cells = []
            for i in range(nsrc):
                mask = (ziota == sz_ref[i]) & (xiota == sx_ref[i])
                lam_cells.append(jnp.sum(lam * mask.astype(dtype)).reshape(1, 1))
            lam_src_ref[0, :, j : j + 1] = (
                lam_cells[0]
                if nsrc == 1
                else jnp.concatenate(lam_cells, axis=0)
            )
            u_ref[PZ : PZ + NZ, PX : PX + NX] = c2_ref[:] * lam
            gacc_ref[:] = gacc_ref[:] + lam * lapw
            qb[:] = (
                qa[:]
                + 2.0 * lam
                + _shift_sum_rows(u_ref, d2z, r, 0, NZ, NX)
                + _shift_sum_cols(u_ref, d2x, r, 0, NX, NZ)
            )

            for s, R0 in ((0, 0), (1, NZ - S)):
                a, b = az_ref[s], bz_ref[s]
                zw = zw0 if s == 0 else zw1
                zy = zy0 if s == 0 else zy1
                off = r if s == 0 else 2 * r
                u_strip = u_ref[PZ + R0 : PZ + R0 + S, PX : PX + NX]
                ps_tot = psz[s] + u_strip
                psz[s] = b * ps_tot
                w_s = a * ps_tot
                d1u = _shift_sum_rows(u_ref, d1z, r, R0, S, NX)
                zw[off : off + S, :] = w_s
                d1w = None
                d2w = None
                for k, cc in enumerate(d1z):
                    if cc != 0.0:
                        t = cc * zw[k : k + SE, :]
                        d1w = t if d1w is None else d1w + t
                for k, cc in enumerate(d2z):
                    if cc != 0.0:
                        t = cc * zw[k : k + SE, :]
                        d2w = t if d2w is None else d2w + t
                strip_in_ext = slice(0, S) if s == 0 else slice(r, SE)
                pb_tot = pbz[s] - d1u - d1w[strip_in_ext]
                pbz[s] = b * pb_tot
                y_s = a * pb_tot
                zy[off : off + S, :] = y_s
                d1y = None
                for k, cc in enumerate(d1z):
                    if cc != 0.0:
                        t = cc * zy[k : k + SE, :]
                        d1y = t if d1y is None else d1y + t
                ext = slice(0, SE) if s == 0 else slice(NZ - SE, NZ)
                qb[ext, :] = qb[ext, :] + d2w - d1y

            for s, C0 in ((0, 0), (1, NX - S)):
                a, b = ax_ref[s], bx_ref[s]
                xw = xw0 if s == 0 else xw1
                xy = xy0 if s == 0 else xy1
                off = r if s == 0 else 2 * r
                u_strip = u_ref[PZ : PZ + NZ, PX + C0 : PX + C0 + S]
                ps_tot = psx[s] + u_strip
                psx[s] = b * ps_tot
                w_s = a * ps_tot
                d1u = _shift_sum_cols(u_ref, d1x, r, C0, S, NZ)
                xw[:, off : off + S] = w_s
                d1w = None
                d2w = None
                for k, cc in enumerate(d1x):
                    if cc != 0.0:
                        t = cc * xw[:, k : k + SE]
                        d1w = t if d1w is None else d1w + t
                for k, cc in enumerate(d2x):
                    if cc != 0.0:
                        t = cc * xw[:, k : k + SE]
                        d2w = t if d2w is None else d2w + t
                strip_in_ext = slice(0, S) if s == 0 else slice(r, SE)
                pb_tot = pbx[s] - d1u - d1w[:, strip_in_ext]
                pbx[s] = b * pb_tot
                y_s = a * pb_tot
                xy[:, off : off + S] = y_s
                d1y = None
                for k, cc in enumerate(d1x):
                    if cc != 0.0:
                        t = cc * xy[:, k : k + SE]
                        d1y = t if d1y is None else d1y + t
                ext = slice(0, SE) if s == 0 else slice(NX - SE, NX)
                qb[:, ext] = qb[:, ext] + d2w - d1y

            qa[:] = -lam
            p_tp1, p_t = p_t, dst

        @pl.when(c == nC - 1)
        def _final():
            gbar_ref[:] = gacc_ref[:]

    rev_idx3 = lambda c: (nC - 1 - c, 0, 0)  # noqa: E731
    const2 = lambda c: (0, 0)  # noqa: E731
    const3 = lambda c: (0, 0, 0)  # noqa: E731

    in_specs = [
        pl.BlockSpec((NZ, NX), const2, memory_space=pltpu.VMEM),  # c2
        pl.BlockSpec((2, S, 1), const3, memory_space=pltpu.VMEM),
        pl.BlockSpec((2, S, 1), const3, memory_space=pltpu.VMEM),
        pl.BlockSpec((2, 1, S), const3, memory_space=pltpu.VMEM),
        pl.BlockSpec((2, 1, S), const3, memory_space=pltpu.VMEM),
        pl.BlockSpec((nt,), lambda c: (0,), memory_space=pltpu.SMEM),  # w (whole)
        pl.BlockSpec((nsrc,), lambda c: (0,), memory_space=pltpu.SMEM),
        pl.BlockSpec((nsrc,), lambda c: (0,), memory_space=pltpu.SMEM),
        pl.BlockSpec((nsrc,), lambda c: (0,), memory_space=pltpu.SMEM),
        pl.BlockSpec((1, nrec), const2, memory_space=pltpu.VMEM),  # rz
        pl.BlockSpec((nrec, 1), const2, memory_space=pltpu.VMEM),  # rxc
        pl.BlockSpec((nrec, 1), const2, memory_space=pltpu.VMEM),  # rzr
        pl.BlockSpec((1,), lambda c: (0,), memory_space=pltpu.SMEM),  # r0
        pl.BlockSpec((1, nrec, CH), rev_idx3, memory_space=pltpu.VMEM),  # ybarT
    ] + [
        pl.BlockSpec((CH,) + dims, rev_idx3, memory_space=pltpu.VMEM)
        for dims in ring_dims
    ] + [
        pl.BlockSpec((EZ, EX), const2, memory_space=pltpu.VMEM),  # p_penult
        pl.BlockSpec((EZ, EX), const2, memory_space=pltpu.VMEM),  # p_last
    ]
    out_specs = (
        pl.BlockSpec((NZ, NX), const2, memory_space=pltpu.VMEM),  # gbar
        pl.BlockSpec((1, nsrc, CH), rev_idx3, memory_space=pltpu.VMEM),  # lam_src
    )
    out_shape = (
        jax.ShapeDtypeStruct((NZ, NX), dtype),
        jax.ShapeDtypeStruct((nC, nsrc, CH), dtype),
    )
    scratch = [
        pltpu.VMEM((EZ, EX), dtype),  # pa
        pltpu.VMEM((EZ, EX), dtype),  # pb
        pltpu.VMEM((EZ, EX), dtype),  # u
        pltpu.VMEM((NZ, NX), dtype),  # qa
        pltpu.VMEM((NZ, NX), dtype),  # qb
        pltpu.VMEM((NZ, NX), dtype),  # gacc
        pltpu.VMEM((2, S, NX), dtype),  # pbz
        pltpu.VMEM((2, S, NX), dtype),  # psz
        pltpu.VMEM((2, NZ, S), dtype),  # pbx
        pltpu.VMEM((2, NZ, S), dtype),  # psx
    ] + [pltpu.VMEM((S + 3 * r, NX), dtype) for _ in range(4)] + [
        pltpu.VMEM((NZ, S + 3 * r), dtype) for _ in range(4)
    ] + [
        pltpu.VMEM((RH, nrec), dtype),  # ohz (slab-transposed)
        pltpu.VMEM((nrec, NX), dtype),  # ohx
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
