"""K-step fused Pallas kernels: K leapfrog+CPML time steps per pallas_call.

Round-2 performance lever (ROADMAP item 1 generalized): the single-step
kernels are HBM-bound on the scan-carry round trip (read p_prev, p, c2;
write p_next = ~4.3 fields/step forward, ~13 fields/step backward across
recon + transposed-step kernels). Running K sub-steps inside one kernel
keeps the intermediate wavefields in VMEM:

  forward per K steps:  read p_prev, p, c2 (3 ext fields) + strips;
                        write p_{K-1}, p_K (2 ext fields) + strips
                        + rings (K x perimeter) + receiver rows (K x RH x NX)
                        => ~5/K fields/step instead of ~4.3.
  reverse per K steps:  read p_tp1, p_t, c2, q_pm, q_p, gbar (6 fields)
                        + rings in; write 5 fields
                        => ~11/K fields/step instead of ~13, and the
                        reconstruction->transpose Lap(p_t) handoff never
                        leaves VMEM.

Buffer discipline (why the in-place rotation is safe): every sub-step
output is written either to a dedicated scratch or to an output ref that
`input_output_aliases` ties to an input whose remaining reads are
POINTWISE (same index in, same index out). Shifted (stencil) reads only
ever target buffers written in an *earlier* sub-step. This holds whether
Mosaic shares the VMEM block between an aliased in/out pair or
materializes the output separately — the pattern the round-1 single-step
kernels already rely on. The r-wide zero frames that shifted reads touch
are zeroed once at kernel start.

Receiver sampling: intermediate wavefields never reach HBM, so receivers
are sampled in-kernel by emitting an RH-row slab (rows [r0, r0+RH) of the
padded grid, r0 a runtime scalar) per sub-step; the (K, nrec) gather from
the slab happens at the scan level. Standard surveys (surface line, OBN,
streamer) fit in a slab of a few rows; geometries that don't fall back to
the single-step engine (adjoint_pallas).

Semantics are identical (same op order per sub-step) to
acoustic2d_pallas.make_fused_forward_step and
acoustic2d_pallas_bwd.make_fused_adjoint_step / make_recon_kernel;
parity is enforced by tests/test_kstep.py in interpret mode and on TPU.
fp32 only. Spec: BASELINE.json:5 (P2 fused stencil), :8 (boundary-saving
adjoint with in-kernel imaging condition).
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


def _zero_frame(ref, r, NZ, NX, dtype):
    """Zero the r-wide frame just outside the interior of an extended-layout
    (EZ, EX) ref — the only border cells stencil shifts can reach."""
    EX = NX + 2 * PX
    EZ = NZ + 2 * PZ
    ref[PZ - r : PZ, :] = jnp.zeros((r, EX), dtype)
    ref[PZ + NZ : PZ + NZ + r, :] = jnp.zeros((r, EX), dtype)
    ref[:, PX - r : PX] = jnp.zeros((EZ, r), dtype)
    ref[:, PX + NX : PX + NX + r] = jnp.zeros((EZ, r), dtype)


def make_kstep_forward(grid: Grid, K: int, nsrc: int, rcv_rows: int,
                       with_tape: bool = False, interpret: bool = False):
    """Build the K-step fused forward kernel.

    step(state: StripState, c2_ext, profiles, sz, sx, amps, r0)
      -> (state', rings_chunk (if with_tape), rows)

    amps: (K, 1, nsrc) = c2dt2[src] * w_t per sub-step;
    r0:   (1, 1) int32 — first padded-grid row of the receiver slab;
    rows: (K, rcv_rows, NX) — post-step wavefield rows [r0, r0+rcv_rows).
    """
    if K < 2:
        raise ValueError("K-step kernel needs K >= 2 (use the single-step kernel)")
    if grid.ndim != 2:
        raise ValueError("kstep kernel is 2D")
    NZ, NX = grid.padded_shape
    EZ, EX = ext_shape(grid)
    r = grid.radius
    S = strip_depth(grid)
    SE = S + r
    RH = rcv_rows
    d1z = tuple(float(c) / grid.h[0] for c in D1_COEFFS[grid.order])
    d2z = tuple(float(c) / grid.h[0] ** 2 for c in D2_COEFFS[grid.order])
    d1x = tuple(float(c) / grid.h[1] for c in D1_COEFFS[grid.order])
    d2x = tuple(float(c) / grid.h[1] ** 2 for c in D2_COEFFS[grid.order])

    from ..propagators.boundary import RingSpec

    ring_slices = RingSpec.build(grid).slices if with_tape else ()
    NRING = len(ring_slices)
    dtype = jnp.float32
    fs = grid.pad if grid.free_surface else None  # pressure-release row

    def kernel(*refs):
        (p_prev_ref, p_ref, c2_ref, phiz_ref, psiz_ref, phix_ref, psix_ref,
         az_ref, bz_ref, ax_ref, bx_ref, sz_ref, sx_ref, amps_ref,
         r0_ref) = refs[:15]
        refs = refs[15:]
        outA_ref, outB_ref = refs[0], refs[1]
        phiz_o, psiz_o, phix_o, psix_o = refs[2:6]
        pos = 6
        ring_refs = refs[pos : pos + NRING]
        pos += NRING
        rows_ref = refs[pos]
        pos += 1
        scr = refs[pos:]
        if K > 2:
            wa_ref, wb_ref = scr[0], scr[1]
            zc0, zc1, xc0, xc1 = scr[2:6]
            work = [wa_ref, wb_ref]
            for w in (wa_ref, wb_ref):
                _zero_frame(w, r, NZ, NX, dtype)
        else:
            zc0, zc1, xc0, xc1 = scr[0:4]
            work = []
        for o in (outA_ref, outB_ref):
            _zero_frame(o, r, NZ, NX, dtype)
        # strip-correction scratches: zero the never-written zones once
        for s, (zbuf, xbuf) in enumerate(((zc0, xc0), (zc1, xc1))):
            off = r if s == 0 else 2 * r
            zbuf[0:off, :] = jnp.zeros((off, NX), dtype)
            zbuf[off + S :, :] = jnp.zeros((S + 3 * r - off - S, NX), dtype)
            xbuf[:, 0:off] = jnp.zeros((NZ, off), dtype)
            xbuf[:, off + S :] = jnp.zeros((NZ, S + 3 * r - off - S), dtype)

        strips = {
            ("phiz", 0): phiz_ref[0], ("phiz", 1): phiz_ref[1],
            ("psiz", 0): psiz_ref[0], ("psiz", 1): psiz_ref[1],
            ("phix", 0): phix_ref[0], ("phix", 1): phix_ref[1],
            ("psix", 0): psix_ref[0], ("psix", 1): psix_ref[1],
        }
        ziota = jax.lax.broadcasted_iota(jnp.int32, (NZ, NX), 0)
        xiota = jax.lax.broadcasted_iota(jnp.int32, (NZ, NX), 1)
        # r0 is 8-aligned by the caller (Mosaic needs provably sublane-
        # aligned dynamic starts); PZ = 8 keeps PZ + r0 aligned too
        r0 = pl.multiple_of(r0_ref[0, 0], 8)

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
                mask = (ziota == sz_ref[0, i]) & (xiota == sx_ref[0, i])
                interior = interior + amps_ref[j, 0, i] * mask.astype(dtype)
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
                ph = b * strips[("phiz", s)] + a * d1p
                strips[("phiz", s)] = ph
                zbuf[off : off + S, :] = ph
                corr = None
                for k, c in enumerate(d1z):
                    if c == 0.0:
                        continue
                    t = c * zbuf[k : k + SE, :]
                    corr = t if corr is None else corr + t
                d2p_strip = _shift_sum_rows(cur_ref, d2z, r, R0, S, NX)
                strip_in_ext = slice(0, S) if s == 0 else slice(r, SE)
                ps = b * strips[("psiz", s)] + a * (d2p_strip + corr[strip_in_ext])
                strips[("psiz", s)] = ps
                ext = slice(0, SE) if s == 0 else slice(NZ - SE, NZ)
                rmw_rows(ext, corr)
                rmw_rows(slice(R0, R0 + S), ps)

            for s, C0 in ((0, 0), (1, NX - S)):
                a, b = ax_ref[s], bx_ref[s]
                xbuf = xc0 if s == 0 else xc1
                off = r if s == 0 else 2 * r
                d1p = _shift_sum_cols(cur_ref, d1x, r, C0, S, NZ)
                ph = b * strips[("phix", s)] + a * d1p
                strips[("phix", s)] = ph
                xbuf[:, off : off + S] = ph
                corr = None
                for k, c in enumerate(d1x):
                    if c == 0.0:
                        continue
                    t = c * xbuf[:, k : k + SE]
                    corr = t if corr is None else corr + t
                d2p_strip = _shift_sum_cols(cur_ref, d2x, r, C0, S, NZ)
                strip_in_ext = slice(0, S) if s == 0 else slice(r, SE)
                ps = b * strips[("psix", s)] + a * (d2p_strip + corr[:, strip_in_ext])
                strips[("psix", s)] = ps
                ext = slice(0, SE) if s == 0 else slice(NX - SE, NX)
                rmw_cols(ext, corr)
                rmw_cols(slice(C0, C0 + S), ps)

            if fs is not None:  # pressure-release surface: pin the row last
                dst_ref[PZ + fs : PZ + fs + 1, PX : PX + NX] = jnp.zeros(
                    (1, NX), dtype
                )

            for sl, ring_ref in zip(ring_slices, ring_refs):
                ring_ref[j] = dst_ref[
                    PZ + sl[0].start : PZ + sl[0].stop,
                    PX + sl[1].start : PX + sl[1].stop,
                ]
            rows_ref[j] = dst_ref[pl.ds(PZ + r0, RH), PX : PX + NX]

        # schedule: u_j for j in 1..K-2 ping-pongs across the two scratch
        # buffers; u_{K-1} -> outA (aliases p_prev, dead after j=1);
        # u_K -> outB (aliases p, dead after j=2)
        def dst_for(j):  # 1-indexed
            if j == K - 1:
                return outA_ref
            if j == K:
                return outB_ref
            return work[(j - 1) % 2]

        prev, cur = p_prev_ref, p_ref
        for j in range(1, K + 1):
            dst = dst_for(j)
            substep(j - 1, prev, cur, dst)
            prev, cur = cur, dst

        phiz_o[0], phiz_o[1] = strips[("phiz", 0)], strips[("phiz", 1)]
        psiz_o[0], psiz_o[1] = strips[("psiz", 0)], strips[("psiz", 1)]
        phix_o[0], phix_o[1] = strips[("phix", 0)], strips[("phix", 1)]
        psix_o[0], psix_o[1] = strips[("psix", 0)], strips[("psix", 1)]

    vspec = bspec(memory_space=pltpu.VMEM)
    sspec = bspec(memory_space=pltpu.SMEM)
    out_shape = (
        jax.ShapeDtypeStruct((EZ, EX), dtype),  # outA = p_{K-1}
        jax.ShapeDtypeStruct((EZ, EX), dtype),  # outB = p_K
        jax.ShapeDtypeStruct((2, S, NX), dtype),
        jax.ShapeDtypeStruct((2, S, NX), dtype),
        jax.ShapeDtypeStruct((2, NZ, S), dtype),
        jax.ShapeDtypeStruct((2, NZ, S), dtype),
    ) + tuple(
        jax.ShapeDtypeStruct((K,) + tuple(sl.stop - sl.start for sl in s_), dtype)
        for s_ in ring_slices
    ) + (jax.ShapeDtypeStruct((K, RH, NX), dtype),)

    scratch = []
    if K > 2:
        scratch += [pltpu.VMEM((EZ, EX), dtype), pltpu.VMEM((EZ, EX), dtype)]
    scratch += [
        pltpu.VMEM((S + 3 * r, NX), dtype),
        pltpu.VMEM((S + 3 * r, NX), dtype),
        pltpu.VMEM((NZ, S + 3 * r), dtype),
        pltpu.VMEM((NZ, S + 3 * r), dtype),
    ]

    call = pl.pallas_call(
        kernel,
        out_shape=out_shape,
        in_specs=[vspec] * 14 + [sspec],
        out_specs=(vspec,) * len(out_shape),
        scratch_shapes=scratch,
        input_output_aliases={0: 0, 1: 1, 3: 2, 4: 3, 5: 4, 6: 5},
        compiler_params=None
        if interpret
        else pltpu.CompilerParams(vmem_limit_bytes=110 * 1024 * 1024),
        interpret=interpret,
    )

    from .acoustic2d_pallas import StripState

    def step(state: StripState, c2_ext, profiles, sz, sx, amps, r0):
        az, bz, ax, bx = profiles
        outs = call(
            state.p_prev, state.p, c2_ext,
            state.phiz, state.psiz, state.phix, state.psix,
            az, bz, ax, bx, sz, sx, amps, r0,
        )
        pA, pB, phiz, psiz, phix, psix = outs[:6]
        rest = outs[6:]
        new = StripState(p_prev=pA, p=pB, phiz=phiz, psiz=psiz, phix=phix, psix=psix)
        if with_tape:
            return new, tuple(rest[:NRING]), rest[NRING]
        return new, rest[0]

    return step


def make_kstep_reverse(grid: Grid, K: int, nsrc: int, nrec: int,
                       rcv_rows: int, interpret: bool = False):
    """Build the K-step fused reverse kernel: K x (reverse reconstruction
    with ring imposition + exact transposed CPML step with receiver MXU
    injection + imaging condition), Lap(p_t) handed over in VMEM.

    rev(p_tp1, p_t, c2, q_pm, q_p, gbar, strips, profiles, sz, sx,
        amps (K,1,nsrc), rz (1,nrec), rx (nrec,1), ybars (K,nrec,1), r0,
        rings_chunk)
      -> (p_t_final, p_tp1_final, q_pm', q_p', gbar', strips', lam_src)

    Time order: sub-step j = K-1 .. 0 processes chunk entries in DESCENDING
    time, so chunk arrays are in ascending time order (chunk[j] = step
    base+j). lam_src (K, 1, nsrc) is the adjoint field at the source cells
    per sub-step (for the wavelet gradient at the scan level).

    Receiver cotangents are injected into the rows [r0, r0+rcv_rows) slab
    via a (rcv_rows, nrec) x (nrec, NX) one-hot MXU matmul — the full-grid
    (NZ, nrec) variant costs NZ/rcv_rows times more MXU work per sub-step.
    Receivers outside the slab are dropped; the forward pass poisons their
    traces with NaN, so a mismatched slab cannot fail silently end-to-end.
    """
    if K < 2:
        raise ValueError("K-step kernel needs K >= 2")
    NZ, NX = grid.padded_shape
    EZ, EX = ext_shape(grid)
    r = grid.radius
    S = strip_depth(grid)
    SE = S + r
    RH = rcv_rows
    d1z = tuple(float(c) / grid.h[0] for c in D1_COEFFS[grid.order])
    d2z = tuple(float(c) / grid.h[0] ** 2 for c in D2_COEFFS[grid.order])
    d1x = tuple(float(c) / grid.h[1] for c in D1_COEFFS[grid.order])
    d2x = tuple(float(c) / grid.h[1] ** 2 for c in D2_COEFFS[grid.order])

    from ..propagators.boundary import RingSpec

    ring_slices = RingSpec.build(grid).slices
    NRING = len(ring_slices)
    dtype = jnp.float32
    fs = grid.pad if grid.free_surface else None  # pressure-release row

    def kernel(*refs):
        (p_tp1_ref, p_t_ref, c2_ref, q_pm_ref, q_p_ref, gbar_ref,
         pbz_ref, psz_ref, pbx_ref, psx_ref,
         az_ref, bz_ref, ax_ref, bx_ref,
         sz_ref, sx_ref, amps_ref, rz_ref, rx_ref, yb_ref, r0_ref) = refs[:21]
        ring_refs = refs[21 : 21 + NRING]
        (pA_ref, pB_ref, q_pm_o, q_p_o, gbar_o,
         pbz_o, psz_o, pbx_o, psx_o, lam_src_ref) = refs[21 + NRING : 31 + NRING]
        scr = refs[31 + NRING :]
        u_ref, qa_ref, qb_ref = scr[0], scr[1], scr[2]
        zw0, zw1, zy0, zy1, xw0, xw1, xy0, xy1 = scr[3:11]

        for o in (pA_ref, pB_ref):
            _zero_frame(o, r, NZ, NX, dtype)
        _zero_frame(u_ref, r, NZ, NX, dtype)
        for s, (zw, zy, xw, xy) in enumerate(((zw0, zy0, xw0, xy0),
                                              (zw1, zy1, xw1, xy1))):
            off = r if s == 0 else 2 * r
            for zbuf in (zw, zy):
                zbuf[0:off, :] = jnp.zeros((off, NX), dtype)
                zbuf[off + S :, :] = jnp.zeros((S + 3 * r - off - S, NX), dtype)
            for xbuf in (xw, xy):
                xbuf[:, 0:off] = jnp.zeros((NZ, off), dtype)
                xbuf[:, off + S :] = jnp.zeros((NZ, S + 3 * r - off - S), dtype)

        # q fields live in dedicated scratch (in-place across sub-steps: all
        # same-buffer reads are pointwise); imaging accumulates as a value
        qa_ref[:] = q_pm_ref[:]
        qb_ref[:] = q_p_ref[:]
        gacc = gbar_ref[:]
        strips = {
            ("pbz", 0): pbz_ref[0], ("pbz", 1): pbz_ref[1],
            ("psz", 0): psz_ref[0], ("psz", 1): psz_ref[1],
            ("pbx", 0): pbx_ref[0], ("pbx", 1): pbx_ref[1],
            ("psx", 0): psx_ref[0], ("psx", 1): psx_ref[1],
        }
        ziota = jax.lax.broadcasted_iota(jnp.int32, (NZ, NX), 0)
        xiota = jax.lax.broadcasted_iota(jnp.int32, (NZ, NX), 1)
        r0 = pl.multiple_of(r0_ref[0, 0], 8)  # 8-aligned by the caller
        # one-hot factors over the receiver row slab only
        mzt = (
            jax.lax.broadcasted_iota(jnp.int32, (RH, nrec), 0)
            == (rz_ref[:] - r0)
        ).astype(dtype)
        oh_x = (
            jax.lax.broadcasted_iota(jnp.int32, (nrec, NX), 1) == rx_ref[:]
        ).astype(dtype)

        p_tp1, p_t = p_tp1_ref, p_t_ref
        for step_i in range(K):
            j = K - 1 - step_i  # descending time within the chunk
            dst = pA_ref if step_i % 2 == 0 else pB_ref

            # ---- reconstruction: p_tm1 into dst, Lap(p_t) kept in VMEM ----
            lapw = _shift_sum_rows(p_t, d2z, r, 0, NZ, NX) + _shift_sum_cols(
                p_t, d2x, r, 0, NX, NZ
            )
            body = (
                2.0 * p_t[PZ : PZ + NZ, PX : PX + NX]
                - p_tp1[PZ : PZ + NZ, PX : PX + NX]
                + c2_ref[:] * lapw
            )
            for i in range(nsrc):
                mask = (ziota == sz_ref[0, i]) & (xiota == sx_ref[0, i])
                body = body + amps_ref[j, 0, i] * mask.astype(dtype)
            dst[PZ : PZ + NZ, PX : PX + NX] = body
            for sl, ring_ref in zip(ring_slices, ring_refs):
                dst[PZ + sl[0].start : PZ + sl[0].stop,
                    PX + sl[1].start : PX + sl[1].stop] = ring_ref[j]

            # ---- transposed step ----
            u_rec = oh_x * yb_ref[j]  # (nrec, NX)
            inj = jnp.dot(mzt, u_rec, preferred_element_type=dtype)  # (RH, NX)
            # qb is dead after lam below; RMW the slab rows in place
            qb_ref[pl.ds(r0, RH), :] = qb_ref[pl.ds(r0, RH), :] + inj
            lam = qb_ref[:]
            if fs is not None:  # transpose of the pressure-release row pin
                lam = lam * (
                    jax.lax.broadcasted_iota(jnp.int32, (NZ, 1), 0) != fs
                ).astype(dtype)
            lam_cells = []
            for i in range(nsrc):
                mask = (ziota == sz_ref[0, i]) & (xiota == sx_ref[0, i])
                lam_cells.append(jnp.sum(lam * mask.astype(dtype)).reshape(1, 1))
            lam_src_ref[j] = (
                lam_cells[0] if nsrc == 1 else jnp.concatenate(lam_cells, axis=1)
            )
            u_ref[PZ : PZ + NZ, PX : PX + NX] = c2_ref[:] * lam
            gacc = gacc + lam * lapw
            # q_p' base into qb (old q_p is dead once lam is materialized);
            # strip corrections RMW its rows/columns below
            qb_ref[:] = (
                qa_ref[:]
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
                ps_tot = strips[("psz", s)] + u_strip
                strips[("psz", s)] = b * ps_tot
                w_s = a * ps_tot
                d1u = _shift_sum_rows(u_ref, d1z, r, R0, S, NX)
                zw[off : off + S, :] = w_s
                d1w = None
                d2w = None
                for k, c in enumerate(d1z):
                    if c != 0.0:
                        t = c * zw[k : k + SE, :]
                        d1w = t if d1w is None else d1w + t
                for k, c in enumerate(d2z):
                    if c != 0.0:
                        t = c * zw[k : k + SE, :]
                        d2w = t if d2w is None else d2w + t
                strip_in_ext = slice(0, S) if s == 0 else slice(r, SE)
                pb_tot = strips[("pbz", s)] - d1u - d1w[strip_in_ext]
                strips[("pbz", s)] = b * pb_tot
                y_s = a * pb_tot
                zy[off : off + S, :] = y_s
                d1y = None
                for k, c in enumerate(d1z):
                    if c != 0.0:
                        t = c * zy[k : k + SE, :]
                        d1y = t if d1y is None else d1y + t
                ext = slice(0, SE) if s == 0 else slice(NZ - SE, NZ)
                qb_ref[ext, :] = qb_ref[ext, :] + d2w - d1y

            for s, C0 in ((0, 0), (1, NX - S)):
                a, b = ax_ref[s], bx_ref[s]
                xw = xw0 if s == 0 else xw1
                xy = xy0 if s == 0 else xy1
                off = r if s == 0 else 2 * r
                u_strip = u_ref[PZ : PZ + NZ, PX + C0 : PX + C0 + S]
                ps_tot = strips[("psx", s)] + u_strip
                strips[("psx", s)] = b * ps_tot
                w_s = a * ps_tot
                d1u = _shift_sum_cols(u_ref, d1x, r, C0, S, NZ)
                xw[:, off : off + S] = w_s
                d1w = None
                d2w = None
                for k, c in enumerate(d1x):
                    if c != 0.0:
                        t = c * xw[:, k : k + SE]
                        d1w = t if d1w is None else d1w + t
                for k, c in enumerate(d2x):
                    if c != 0.0:
                        t = c * xw[:, k : k + SE]
                        d2w = t if d2w is None else d2w + t
                strip_in_ext = slice(0, S) if s == 0 else slice(r, SE)
                pb_tot = strips[("pbx", s)] - d1u - d1w[:, strip_in_ext]
                strips[("pbx", s)] = b * pb_tot
                y_s = a * pb_tot
                xy[:, off : off + S] = y_s
                d1y = None
                for k, c in enumerate(d1x):
                    if c != 0.0:
                        t = c * xy[:, k : k + SE]
                        d1y = t if d1y is None else d1y + t
                ext = slice(0, SE) if s == 0 else slice(NX - SE, NX)
                qb_ref[:, ext] = qb_ref[:, ext] + d2w - d1y

            qa_ref[:] = -lam
            p_tp1, p_t = p_t, dst

        q_pm_o[:] = qa_ref[:]
        q_p_o[:] = qb_ref[:]
        gbar_o[:] = gacc
        pbz_o[0], pbz_o[1] = strips[("pbz", 0)], strips[("pbz", 1)]
        psz_o[0], psz_o[1] = strips[("psz", 0)], strips[("psz", 1)]
        pbx_o[0], pbx_o[1] = strips[("pbx", 0)], strips[("pbx", 1)]
        psx_o[0], psx_o[1] = strips[("psx", 0)], strips[("psx", 1)]

    vspec = bspec(memory_space=pltpu.VMEM)
    out_shape = (
        jax.ShapeDtypeStruct((EZ, EX), dtype),  # pA
        jax.ShapeDtypeStruct((EZ, EX), dtype),  # pB
        jax.ShapeDtypeStruct((NZ, NX), dtype),  # q_pm'
        jax.ShapeDtypeStruct((NZ, NX), dtype),  # q_p'
        jax.ShapeDtypeStruct((NZ, NX), dtype),  # gbar'
        jax.ShapeDtypeStruct((2, S, NX), dtype),
        jax.ShapeDtypeStruct((2, S, NX), dtype),
        jax.ShapeDtypeStruct((2, NZ, S), dtype),
        jax.ShapeDtypeStruct((2, NZ, S), dtype),
        jax.ShapeDtypeStruct((K, 1, nsrc), dtype),
    )
    scratch = [
        pltpu.VMEM((EZ, EX), dtype),  # u = c2 * lam (zero ext frame)
        pltpu.VMEM((NZ, NX), dtype),  # qa: q_pm working buffer
        pltpu.VMEM((NZ, NX), dtype),  # qb: q_p working buffer
    ] + [
        pltpu.VMEM((S + 3 * r, NX), dtype) for _ in range(4)
    ] + [pltpu.VMEM((NZ, S + 3 * r), dtype) for _ in range(4)]

    sspec = bspec(memory_space=pltpu.SMEM)
    call = pl.pallas_call(
        kernel,
        out_shape=out_shape,
        in_specs=[vspec] * 20 + [sspec] + [vspec] * NRING,
        out_specs=(vspec,) * len(out_shape),
        scratch_shapes=scratch,
        # pA <- p_tp1, pB <- p_t: their zero ext borders persist and the
        # remaining reads of the aliased inputs are pointwise (the proven
        # round-1 pattern). q/gbar/strip outputs are NOT aliased: they are
        # read at kernel start and written at kernel end via scratch/values.
        input_output_aliases={0: 0, 1: 1},
        compiler_params=None
        if interpret
        else pltpu.CompilerParams(vmem_limit_bytes=110 * 1024 * 1024),
        interpret=interpret,
    )

    def rev(p_tp1, p_t, c2dt2, q_pm, q_p, gbar, strips_in, profiles,
            sz, sx, amps, rz, rx, ybars, r0, rings_chunk):
        pbz, psz, pbx, psx = strips_in
        az, bz, ax, bx = profiles
        outs = call(
            p_tp1, p_t, c2dt2, q_pm, q_p, gbar, pbz, psz, pbx, psx,
            az, bz, ax, bx, sz, sx, amps, rz, rx, ybars, r0, *rings_chunk,
        )
        pA, pB = outs[0], outs[1]
        # sub-step K lands in pA when K is odd, pB when K is even
        p_t_fin, p_tp1_fin = (pA, pB) if K % 2 == 1 else (pB, pA)
        return (p_t_fin, p_tp1_fin) + outs[2:]

    return rev
