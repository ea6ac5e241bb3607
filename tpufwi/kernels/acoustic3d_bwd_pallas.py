"""Fused 3D backward kernels: boundary-saving reconstruction + exact
transposed CPML step + cross-correlation imaging (spec north star: the
imaging condition fused into the backward stencil; BASELINE.json:5,8 for
the 3D path C5).

Why: the dimension-agnostic XLA adjoint engine (adjoint.py, jax.vjp of the
jnp step) measured ~0.3 Gcu/s on the 3D gradient at the overthrust_demo
scale — ~25x slower than the fused forward. This module mirrors the 2D
whole-scan reverse algebra (acoustic2d_pallas_scanres.make_scanres_reverse)
on the forward v2 blocked layout (acoustic3d_fused2):

Per reverse step (forward index t descending):
  R kernel  : p_tm1 = 2 p_t - p_tp1 + c2 lap(p_t)        [pure leapfrog —
              exact in the interior; CPML region is garbage and masked],
              ring slabs from the tape re-imposed in-block,
              imaging  gacc += lam * lap(p_t)  (reuses the recon lap).
  T kernel  : lam' = 2 lam - lam_prev + lap(u),  u = c2*lam (XLA-
              materialized), plus the TRANSPOSED x-face algebra in-block
              and whole-block application of the y/z transposed-face
              update slabs (sticky index maps, as in the forward v2).
  tcorr y/z : transposed face kernels updating the dual strip states
              (pb = phi-bar accumulator, ps = psi-bar accumulator):
                ps_tot = ps + u|strip ; ps' = b ps_tot ; w = a ps_tot
                d1u    = D1(u)|strip          (forward-tap band; the slab
                                               geometry restricts reads to
                                               the ext region + zero)
                pb_tot = pb - d1u - D1e(w)|strip ; pb' = b pb_tot
                y      = a pb_tot
                upd|ext = D2e(w) - D1e(y)
              The bands are the FORWARD d1/d2 taps: D1^T = -D1 for the
              antisymmetric taps (the minus signs above), D2^T = D2; the
              zero-extension of the forward operators becomes band
              truncation of the transposes. Derivation pinned by parity
              with the XLA engine's exact gradient (tests).

Tape layout (Tape3D): six FULL-EXTENT aligned slabs per step, extracted
from p_next by cheap XLA slices in the forward (~0.2 fields/step):
y-faces (8|16, NZe, NX) at an 8-aligned row window containing
[pad, pad+r) resp. [pad+ny-r, pad+ny); z-faces (NYe, 8|16, NX) likewise;
x-faces (NYe, NZe, r) lane slabs. Full-extent slabs are a SUPERSET of the
RingSpec onion rings — imposing extra true values in the CPML region only
extends the recon's exactness outward; the gradient mask (rings.
mask_valid) is unchanged. fp32.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_util import bspec

from ..grid import D2_COEFFS, Grid
from .acoustic3d_pallas import y_extended, z_extended
from .acoustic3d_strips_pallas import _band, _taps_axis
from .acoustic3d_fused2 import _face_span

HIGHEST = jax.lax.Precision.HIGHEST


def ring_windows(grid: Grid):
    """Aligned tape-slab windows: dict axis -> ((lo_o, lo_w), (hi_o, hi_w))
    in padded-array coordinates; x uses exact r-lane slabs (rank-3 last
    dim is alignment-exempt)."""
    pad, r = grid.pad, grid.radius
    out = {}
    for ax in range(2):
        n = grid.shape[ax]
        wins = []
        for a in (pad, pad + n - r):
            o = (a // 8) * 8
            w = -(-(a + r - o) // 8) * 8
            wins.append((o, w))
        out[ax] = tuple(wins)
    nx = grid.shape[2]
    out[2] = ((pad, r), (pad + nx - r, r))
    return out


def extract_tape3d(grid: Grid, p):
    """Slice the six aligned ring slabs out of an extended-field p."""
    wins = ring_windows(grid)
    slabs = []
    for ax in range(3):
        for o, w in wins[ax]:
            slabs.append(jax.lax.slice_in_dim(p, o, o + w, axis=ax))
    return tuple(slabs)


def tape_slab_shapes(grid: Grid, ext_shape):
    """Shapes of extract_tape3d's slabs for an ``ext_shape`` field.

    Used by the tape pack/unpack pair: slabs are stored FLATTENED to 1D
    (stacked-over-nt tape rows are (nt, L) — always a clean T(8,128)
    tiling). The round-3 moveaxis transpose of the x-face slabs is NOT
    layout-safe: XLA's layout assignment can (and at the 20.7M-cell
    Overthrust shape DID) pick the transposed-back layout with the
    size-r axis as lanes, a 32x lane-padding expansion that turned the
    476 MB x-slab tape into 2 x 14.87 GB of HBM and crashed the chip
    (runs/tpu_queue10/diag2.log). A 1D buffer leaves layout assignment
    no such freedom."""
    wins = ring_windows(grid)
    shapes = []
    for ax in range(3):
        for o, w in wins[ax]:
            s = list(ext_shape)
            s[ax] = w
            shapes.append(tuple(s))
    return tuple(shapes)


def make_recon3d_kernel(grid: Grid, by: int = 16, bz: int = 64,
                        interpret: bool = False, y_halo: bool = False,
                        z_halo: bool = False):
    """R kernel: blocked reverse leapfrog + ring imposition + imaging.

    call(p_tp1, p_t, c2, lam, gacc, ry_lo, ry_hi, rz_lo, rz_hi,
         rx_lo, rx_hi[, hylo, hyhi]) -> (p_tm1, gacc')
    [p_tp1 aliased to p_tm1; gacc aliased in place]

    The caller adds the source term (c2[src]*w_t scatter) and consumes
    lam from the SAME reverse step (imaging pairs lam_t with lap(p_t),
    exactly as the 2D reverse kernel does).

    ``y_halo``: domain-sharded composition (adjoint3d_pallas_sharded) —
    the slab's y edges are interior cuts; (H, NZe, NX) halo slabs of p_t
    (exchanged by the caller) replace the zero extension at gy==0 /
    gy==nyb-1 (rows [H-r, H) of hylo, [0, r) of hyhi). ``z_halo`` is the
    same mechanism on z ((NYe, H, NX) slabs, appended after the y pair).
    """
    NYe = y_extended(grid, by)
    NZe = z_extended(grid, bz)
    NY, NZ, NX = grid.padded_shape
    r = grid.radius
    BY, BZ = by, bz
    nyb, nzb = NYe // BY, NZe // BZ
    YB8, ZB8 = BY // 8, BZ // 8
    d2y = tuple(float(c) / grid.h[0] ** 2 for c in D2_COEFFS[grid.order])
    d2z = tuple(float(c) / grid.h[1] ** 2 for c in D2_COEFFS[grid.order])
    d2x = tuple(float(c) / grid.h[2] ** 2 for c in D2_COEFFS[grid.order])
    PX = 128
    H = 8
    dtype = jnp.float32
    wins = ring_windows(grid)

    # static apply sites for the y/z ring sets: (block, dst range, src range)
    def sites_1d(o, w, blk):
        out = []
        b0, b1 = o // blk, (o + w - 1) // blk
        for b in range(b0, b1 + 1):
            lo = max(o, b * blk)
            hi = min(o + w, (b + 1) * blk)
            out.append((b, lo - b * blk, hi - b * blk, lo - o, hi - o))
        return out

    # impose only the true ring rows [a, a+r), not the aligned padding
    pad = grid.pad
    # ny = NY - 2*pad; hi ring rows start at pad + ny - r = NY - pad - r
    ysites = {0: sites_1d(pad, r, BY), 1: sites_1d(NY - pad - r, r, BY)}
    zsites = {0: sites_1d(pad, r, BZ), 1: sites_1d(NZ - pad - r, r, BZ)}
    (oyl, wyl), (oyh, wyh) = wins[0]
    (ozl, wzl), (ozh, wzh) = wins[1]
    (oxl, _), (oxh, _) = wins[2]

    def kernel2(*refs):
        (p_tp1_ref, p_ref, ylo_ref, yhi_ref, zlo_ref, zhi_ref,
         c2_ref, lam_ref, gacc_ref,
         ryl_ref, ryh_ref, rzl_ref, rzh_ref, rxl_ref, rxh_ref) = refs[:15]
        i = 15
        if y_halo:
            hylo_ref, hyhi_ref = refs[i : i + 2]
            i += 2
        if z_halo:
            hzlo_ref, hzhi_ref = refs[i : i + 2]
            i += 2
        out_ref, gacc_o, scr_ref = refs[i : i + 3]
        gz = pl.program_id(0)
        gy = pl.program_id(1)
        zcol = jnp.zeros((BY + 2 * r, BZ + 2 * H, r), dtype)
        scr_ref[:, :, PX - r : PX] = zcol
        scr_ref[:, :, PX + NX : PX + NX + r] = zcol
        scr_ref[r : r + BY, H : H + BZ, PX : PX + NX] = p_ref[:]

        zy = jnp.zeros((r, BZ, NX), dtype)
        scr_ref[0:r, H : H + BZ, PX : PX + NX] = zy
        scr_ref[r + BY : 2 * r + BY, H : H + BZ, PX : PX + NX] = zy

        @pl.when(gy > 0)
        def _():
            scr_ref[0:r, H : H + BZ, PX : PX + NX] = ylo_ref[H - r : H]

        @pl.when(gy < nyb - 1)
        def _():
            scr_ref[r + BY : 2 * r + BY, H : H + BZ, PX : PX + NX] = (
                yhi_ref[0:r]
            )

        if y_halo:
            @pl.when(gy == 0)
            def _():
                scr_ref[0:r, H : H + BZ, PX : PX + NX] = hylo_ref[H - r : H]

            @pl.when(gy == nyb - 1)
            def _():
                scr_ref[r + BY : 2 * r + BY, H : H + BZ, PX : PX + NX] = (
                    hyhi_ref[0:r]
                )

        zz = jnp.zeros((BY, H, NX), dtype)
        scr_ref[r : r + BY, 0:H, PX : PX + NX] = zz
        scr_ref[r : r + BY, H + BZ : H + BZ + H, PX : PX + NX] = zz

        @pl.when(gz > 0)
        def _():
            scr_ref[r : r + BY, 0:H, PX : PX + NX] = zlo_ref[:]

        @pl.when(gz < nzb - 1)
        def _():
            scr_ref[r : r + BY, H + BZ : H + BZ + H, PX : PX + NX] = zhi_ref[:]

        if z_halo:
            @pl.when(gz == 0)
            def _():
                scr_ref[r : r + BY, 0:H, PX : PX + NX] = hzlo_ref[:]

            @pl.when(gz == nzb - 1)
            def _():
                scr_ref[r : r + BY, H + BZ : H + BZ + H, PX : PX + NX] = (
                    hzhi_ref[:]
                )

        lap = None
        for k, c in enumerate(d2y):
            if c == 0.0:
                continue
            t = c * scr_ref[k : k + BY, H : H + BZ, PX : PX + NX]
            lap = t if lap is None else lap + t
        for k, c in enumerate(d2z):
            if c == 0.0:
                continue
            z0 = H + k - r
            lap = lap + c * scr_ref[r : r + BY, z0 : z0 + BZ, PX : PX + NX]
        for k, c in enumerate(d2x):
            if c == 0.0:
                continue
            x0 = PX + k - r
            lap = lap + c * scr_ref[r : r + BY, H : H + BZ, x0 : x0 + NX]
        out_ref[:] = 2.0 * p_ref[:] - p_tp1_ref[:] + c2_ref[:] * lap
        gacc_o[:] = gacc_ref[:] + lam_ref[:] * lap

        out_ref[:, :, oxl : oxl + r] = rxl_ref[:]
        out_ref[:, :, oxh : oxh + r] = rxh_ref[:]
        for sites, rref, o_win, is_y in (
            (ysites[0], ryl_ref, oyl, True),
            (ysites[1], ryh_ref, oyh, True),
            (zsites[0], rzl_ref, ozl, False),
            (zsites[1], rzh_ref, ozh, False),
        ):
            for b, dlo, dhi, _, _ in sites:
                abs0 = b * (BY if is_y else BZ) + dlo
                abs1 = b * (BY if is_y else BZ) + dhi
                s0, s1 = abs0 - o_win, abs1 - o_win
                if is_y:
                    @pl.when(gy == b)
                    def _(rref=rref, dlo=dlo, dhi=dhi, s0=s0, s1=s1):
                        out_ref[dlo:dhi, :, :] = rref[s0:s1, :, :]
                else:
                    @pl.when(gz == b)
                    def _(rref=rref, dlo=dlo, dhi=dhi, s0=s0, s1=s1):
                        out_ref[:, dlo:dhi, :] = rref[:, s0:s1, :]

    blk = bspec((BY, BZ, NX), lambda gz, gy: (gy, gz, 0),
                       memory_space=pltpu.VMEM)
    ylo = bspec(
        (H, BZ, NX),
        lambda gz, gy: (jnp.maximum(gy * YB8 - 1, 0), gz, 0),
        memory_space=pltpu.VMEM,
    )
    yhi = bspec(
        (H, BZ, NX),
        lambda gz, gy: (jnp.minimum((gy + 1) * YB8, nyb * YB8 - 1), gz, 0),
        memory_space=pltpu.VMEM,
    )
    zlo = bspec(
        (BY, H, NX),
        lambda gz, gy: (gy, jnp.maximum(gz * ZB8 - 1, 0), 0),
        memory_space=pltpu.VMEM,
    )
    zhi = bspec(
        (BY, H, NX),
        lambda gz, gy: (gy, jnp.minimum((gz + 1) * ZB8, nzb * ZB8 - 1), 0),
        memory_space=pltpu.VMEM,
    )
    # ring slab specs: y slabs whole-rows x z-blocked; z slabs y-blocked x
    # whole-window; x slabs fully blocked
    ry = bspec((wyl, BZ, NX), lambda gz, gy: (0, gz, 0),
                      memory_space=pltpu.VMEM)
    ryh_s = bspec((wyh, BZ, NX), lambda gz, gy: (0, gz, 0),
                         memory_space=pltpu.VMEM)
    rz = bspec((BY, wzl, NX), lambda gz, gy: (gy, 0, 0),
                      memory_space=pltpu.VMEM)
    rzh_s = bspec((BY, wzh, NX), lambda gz, gy: (gy, 0, 0),
                         memory_space=pltpu.VMEM)
    rx = bspec((BY, BZ, r), lambda gz, gy: (gy, gz, 0),
                      memory_space=pltpu.VMEM)

    in_specs = [blk, blk, ylo, yhi, zlo, zhi, blk, blk, blk,
                ry, ryh_s, rz, rzh_s, rx, rx]
    if y_halo:
        hspec = bspec((H, BZ, NX), lambda gz, gy: (0, gz, 0),
                      memory_space=pltpu.VMEM)
        in_specs += [hspec, hspec]
    if z_halo:
        hzspec = bspec((BY, H, NX), lambda gz, gy: (gy, 0, 0),
                       memory_space=pltpu.VMEM)
        in_specs += [hzspec, hzspec]

    call = pl.pallas_call(
        kernel2,
        grid=(nzb, nyb),
        out_shape=(
            jax.ShapeDtypeStruct((NYe, NZe, NX), dtype),
            jax.ShapeDtypeStruct((NYe, NZe, NX), dtype),
        ),
        in_specs=in_specs,
        out_specs=(blk, blk),
        scratch_shapes=[
            pltpu.VMEM((BY + 2 * r, BZ + 2 * H, NX + 2 * PX), dtype)
        ],
        input_output_aliases={0: 0, 8: 1},
        compiler_params=None
        if interpret
        else pltpu.CompilerParams(vmem_limit_bytes=120 * 1024 * 1024),
        interpret=interpret,
    )

    def recon(p_tp1, p_t, c2, lam, gacc, tape_slabs, halos=()):
        ryl, ryh, rzl, rzh, rxl, rxh = tape_slabs
        return call(p_tp1, p_t, p_t, p_t, p_t, p_t, c2, lam, gacc,
                    ryl, ryh, rzl, rzh, rxl, rxh, *halos)

    return recon


def make_tcorr3d_y(grid: Grid, side: int, bz: int, NZe: int, by: int,
                   interpret: bool = False):
    """Transposed y-face kernel (dual states pb/ps; shifts on the untiled
    leading dim).

    call(u_slab, pb, ps, a, b) -> (upd, pb', ps')
    u_slab (W, NZe, NX) = u rows [0,W) low / [NY-W, NY) high, u = c2*lam;
    upd is the additive lam' update on a BY-aligned padded window.
    """
    r = grid.radius
    S = grid.pml + r
    W = S + 2 * r
    NY, _, NX = grid.padded_shape
    BZ = bz
    nzb = NZe // BZ
    C0 = 0 if side == 0 else W - S
    E0 = 0 if side == 0 else r
    face0 = 0 if side == 0 else NY - W
    b0, b1, pad_lo = _face_span(face0, W, by)
    WP = (b1 - b0 + 1) * by
    d1, d2 = _taps_axis(grid, 0)
    dtype = jnp.float32

    def kernel(u_ref, pb_ref, ps_ref, a_ref, b_ref,
               upd_o, pb_o, ps_o, scr):
        def shift_sum(taps, row0, nrows, base):
            out = None
            for k, cc in enumerate(taps):
                if cc == 0.0:
                    continue
                t = cc * base[row0 + k : row0 + k + nrows, :, :]
                out = t if out is None else out + t
            return out

        a = a_ref[:]
        b = b_ref[:]
        # psi-bar chain
        u_strip = u_ref[C0 : C0 + S]
        ps_tot = ps_ref[:] + u_strip
        ps_o[:] = b * ps_tot
        w = a * ps_tot
        # d1u over the strip (u slab holds strip +- r context; reads
        # outside the ext region are excluded by the slab geometry)
        scr[0:r] = jnp.zeros((r, BZ, NX), dtype)
        scr[r : r + W] = u_ref[:]
        scr[r + W :] = jnp.zeros((r, BZ, NX), dtype)
        d1u = shift_sum(d1, C0, S, scr)
        # D1e(w), D2e(w) over the ext region [E0, E0+S+r)
        scr[0 : C0 + r] = jnp.zeros((C0 + r, BZ, NX), dtype)
        scr[C0 + r : C0 + r + S] = w
        scr[C0 + r + S :] = jnp.zeros((W + 2 * r - C0 - r - S, BZ, NX), dtype)
        d1w = shift_sum(d1, E0, S + r, scr)
        d2w = shift_sum(d2, E0, S + r, scr)
        # phi-bar chain
        pb_tot = pb_ref[:] - d1u - d1w[C0 - E0 : C0 - E0 + S]
        pb_o[:] = b * pb_tot
        y = a * pb_tot
        scr[0 : C0 + r] = jnp.zeros((C0 + r, BZ, NX), dtype)
        scr[C0 + r : C0 + r + S] = y
        scr[C0 + r + S :] = jnp.zeros((W + 2 * r - C0 - r - S, BZ, NX), dtype)
        d1y = shift_sum(d1, E0, S + r, scr)
        upd_o[:] = jnp.zeros((WP, BZ, NX), dtype)
        upd_o[pad_lo + E0 : pad_lo + E0 + S + r] = d2w - d1y

    vspec = bspec(memory_space=pltpu.VMEM)
    blkW = bspec((W, BZ, NX), lambda i: (0, i, 0),
                        memory_space=pltpu.VMEM)
    blkS = bspec((S, BZ, NX), lambda i: (0, i, 0),
                        memory_space=pltpu.VMEM)
    blkU = bspec((WP, BZ, NX), lambda i: (0, i, 0),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(nzb,),
        in_specs=[blkW, blkS, blkS, vspec, vspec],
        out_specs=(blkU, blkS, blkS),
        out_shape=(
            jax.ShapeDtypeStruct((WP, NZe, NX), dtype),
            jax.ShapeDtypeStruct((S, NZe, NX), dtype),
            jax.ShapeDtypeStruct((S, NZe, NX), dtype),
        ),
        input_output_aliases={1: 1, 2: 2},
        scratch_shapes=[pltpu.VMEM((W + 2 * r, BZ, NX), dtype)],
        compiler_params=None
        if interpret
        else pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )


def make_tcorr3d_z(grid: Grid, side: int, by: int, NYe: int,
                   interpret: bool = False):
    """Transposed z-face kernel (banded MXU left-products, BY-batched).

    call(u_slab, pb, ps, a, b) -> (upd, pb', ps')
    u_slab (NYe, W, NX); upd on the z_window aligned padded window.
    """
    from .acoustic3d_fused2 import z_window

    r = grid.radius
    S = grid.pml + r
    W = S + 2 * r
    _, NZ, NX = grid.padded_shape
    BY = by
    nyb = NYe // BY
    C0 = 0 if side == 0 else W - S
    E0 = 0 if side == 0 else r
    o, WZP = z_window(grid, side)
    face0 = 0 if side == 0 else NZ - W
    pad_lo = face0 - o
    d1, d2 = _taps_axis(grid, 1)
    # d1 over the strip from the W slab (same band as the forward k12's
    # d1 half)
    k1_np = _band([d1], S, W, [C0], r)
    # D1e/D2e mapping the S-row strip buffer -> the (S+r)-row ext region
    ke_np = np.zeros((2 * (S + r), S), np.float32)
    for i in range(S + r):
        for k in range(len(d1)):
            m = (E0 + i + k - r) - C0
            if 0 <= m < S:
                ke_np[i, m] = d1[k]
                ke_np[S + r + i, m] = d2[k]
    eye = np.eye(BY, dtype=np.float32)
    k1_np = np.kron(eye, k1_np)
    ke_np = np.kron(eye, ke_np)
    # D1e alone for the y chain
    ky1 = np.zeros((S + r, S), np.float32)
    for i in range(S + r):
        for k in range(len(d1)):
            m = (E0 + i + k - r) - C0
            if 0 <= m < S:
                ky1[i, m] = d1[k]
    ky_np = np.kron(eye, ky1)
    dtype = jnp.float32

    def kernel(u_ref, pb_ref, ps_ref, a_ref, b_ref,
               k1_ref, ke_ref, ky_ref, upd_o, pb_o, ps_o):
        a = a_ref[0]  # (S, 1)
        b = b_ref[0]
        u_strip = u_ref[:, C0 : C0 + S, :]
        ps_tot = ps_ref[:] + u_strip
        ps_o[:] = b * ps_tot
        w = a * ps_tot
        slab = jnp.reshape(u_ref[:], (BY * W, NX))
        d1u = jnp.reshape(
            jnp.dot(k1_ref[:], slab, preferred_element_type=dtype,
                    precision=HIGHEST),
            (BY, S, NX),
        )
        dw = jnp.reshape(
            jnp.dot(ke_ref[:], jnp.reshape(w, (BY * S, NX)),
                    preferred_element_type=dtype, precision=HIGHEST),
            (BY, 2 * (S + r), NX),
        )
        d1w, d2w = dw[:, : S + r], dw[:, S + r :]
        pb_tot = pb_ref[:] - d1u - d1w[:, C0 - E0 : C0 - E0 + S]
        pb_o[:] = b * pb_tot
        y = a * pb_tot
        d1y = jnp.reshape(
            jnp.dot(ky_ref[:], jnp.reshape(y, (BY * S, NX)),
                    preferred_element_type=dtype, precision=HIGHEST),
            (BY, S + r, NX),
        )
        upd_o[:] = jnp.zeros((BY, WZP, NX), dtype)
        upd_o[:, pad_lo + E0 : pad_lo + E0 + S + r, :] = d2w - d1y

    vspec = bspec(memory_space=pltpu.VMEM)
    blkW = bspec((BY, W, NX), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    blkS = bspec((BY, S, NX), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    blkU = bspec((BY, WZP, NX), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    call = pl.pallas_call(
        kernel,
        grid=(nyb,),
        in_specs=[blkW, blkS, blkS, vspec, vspec, vspec, vspec, vspec],
        out_specs=(blkU, blkS, blkS),
        out_shape=(
            jax.ShapeDtypeStruct((NYe, WZP, NX), dtype),
            jax.ShapeDtypeStruct((NYe, S, NX), dtype),
            jax.ShapeDtypeStruct((NYe, S, NX), dtype),
        ),
        input_output_aliases={1: 1, 2: 2},
        compiler_params=None
        if interpret
        else pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )
    k1 = np.asarray(k1_np)
    ke = np.asarray(ke_np)
    ky = np.asarray(ky_np)

    def tcorr(u_slab, pb, ps, a, b):
        return call(u_slab, pb, ps, a, b, k1, ke, ky)

    return tcorr


def make_transpose3d_kernel(grid: Grid, by: int = 16, bz: int = 64,
                            interpret: bool = False, y_halo: bool = False,
                            z_halo: bool = False):
    """T kernel: lam' = 2 lam - lam_prev + lap(u) + transposed x-face
    in-block + y/z upd slab application (sticky maps, as forward v2).

    call(lam_prev, lam, u, pbx_lo, psx_lo, pbx_hi, psx_hi,
         ax_lo, bx_lo, ax_hi, bx_hi, uyl, uyh, uzl, uzh[, hylo, hyhi])
      -> (lam_next, pbx_lo', psx_lo', pbx_hi', psx_hi')
    [lam_prev aliased to lam_next; x dual states aliased]

    ``y_halo``: sharded composition — the (H, NZe, NX) halo slabs carry
    the neighbor devices' edge rows of U (= c2*lam; the transposed
    stencil is itself a stencil over u, so exchanging u's halos makes
    the local transpose equal the global one on owned rows). ``z_halo``:
    same mechanism on z ((NYe, H, NX) slabs, appended after the y pair).
    """
    from .acoustic3d_fused2 import z_window

    NYe = y_extended(grid, by)
    NZe = z_extended(grid, bz)
    NY, NZ, NX = grid.padded_shape
    r = grid.radius
    S = grid.pml + r
    W = S + 2 * r
    BY, BZ = by, bz
    nyb, nzb = NYe // BY, NZe // BZ
    YB8, ZB8 = BY // 8, BZ // 8
    d2y = tuple(float(c) / grid.h[0] ** 2 for c in D2_COEFFS[grid.order])
    d2z = tuple(float(c) / grid.h[1] ** 2 for c in D2_COEFFS[grid.order])
    d2x = tuple(float(c) / grid.h[2] ** 2 for c in D2_COEFFS[grid.order])
    d1x, d2x1 = _taps_axis(grid, 2)
    PX = 128
    H = 8
    dtype = jnp.float32

    # x-face bands on the (S+2r)-lane window (transposed algebra)
    k1x_np = _band([d1x], S, S + 2 * r, [r], r)  # d1u: window -> strip
    kex = {}
    kyx = {}
    for side in (0, 1):
        C0x = 0 if side == 0 else NX - S
        E0x = 0 if side == 0 else NX - S - r
        ke_np = np.zeros((S, 2 * (S + r)), np.float32)  # right-product
        ky_np = np.zeros((S, S + r), np.float32)
        for i in range(S + r):
            for k in range(len(d1x)):
                m = (E0x + i + k - r) - C0x
                if 0 <= m < S:
                    ke_np[m, i] = d1x[k]
                    ky_np[m, i] = d1x[k]
            for k in range(len(d2x1)):
                m = (E0x + i + k - r) - C0x
                if 0 <= m < S:
                    ke_np[m, S + r + i] = d2x1[k]
        kex[side] = ke_np
        kyx[side] = ky_np
    k1x = np.asarray(k1x_np)
    kex_lo, kex_hi = np.asarray(kex[0]), np.asarray(kex[1])
    kyx_lo, kyx_hi = np.asarray(kyx[0]), np.asarray(kyx[1])

    yspan = {s: _face_span(0 if s == 0 else NY - W, W, BY) for s in (0, 1)}
    zapply = {}
    for s in (0, 1):
        o, WZP = z_window(grid, s)
        sites = []
        jb0, jb1 = o // BZ, (o + WZP - 1) // BZ
        for jb in range(jb0, jb1 + 1):
            lo = max(o, jb * BZ)
            hi = min(o + WZP, (jb + 1) * BZ)
            sites.append((jb, lo - jb * BZ, hi - jb * BZ, lo - o, hi - o))
        zapply[s] = (o, WZP, sites)

    def kernel(*refs):
        (lp_ref, lam_ref, ylo_ref, yhi_ref, zlo_ref, zhi_ref, u_ref,
         pbxl_ref, psxl_ref, pbxh_ref, psxh_ref,
         axl_ref, bxl_ref, axh_ref, bxh_ref,
         k1x_ref, kexl_ref, kexh_ref, kyxl_ref, kyxh_ref,
         uyl_ref, uyh_ref, uzl_ref, uzh_ref) = refs[:24]
        i = 24
        if y_halo:
            hylo_ref, hyhi_ref = refs[i : i + 2]
            i += 2
        if z_halo:
            hzlo_ref, hzhi_ref = refs[i : i + 2]
            i += 2
        out_ref, pbxl_o, psxl_o, pbxh_o, psxh_o, scr_ref = refs[i : i + 6]
        gz = pl.program_id(0)
        gy = pl.program_id(1)
        # scratch holds u (for lap and the x-face algebra)
        zcol = jnp.zeros((BY + 2 * r, BZ + 2 * H, r), dtype)
        scr_ref[:, :, PX - r : PX] = zcol
        scr_ref[:, :, PX + NX : PX + NX + r] = zcol
        scr_ref[r : r + BY, H : H + BZ, PX : PX + NX] = u_ref[:]

        zy = jnp.zeros((r, BZ, NX), dtype)
        scr_ref[0:r, H : H + BZ, PX : PX + NX] = zy
        scr_ref[r + BY : 2 * r + BY, H : H + BZ, PX : PX + NX] = zy

        @pl.when(gy > 0)
        def _():
            scr_ref[0:r, H : H + BZ, PX : PX + NX] = ylo_ref[H - r : H]

        @pl.when(gy < nyb - 1)
        def _():
            scr_ref[r + BY : 2 * r + BY, H : H + BZ, PX : PX + NX] = (
                yhi_ref[0:r]
            )

        if y_halo:
            @pl.when(gy == 0)
            def _():
                scr_ref[0:r, H : H + BZ, PX : PX + NX] = hylo_ref[H - r : H]

            @pl.when(gy == nyb - 1)
            def _():
                scr_ref[r + BY : 2 * r + BY, H : H + BZ, PX : PX + NX] = (
                    hyhi_ref[0:r]
                )

        zz = jnp.zeros((BY, H, NX), dtype)
        scr_ref[r : r + BY, 0:H, PX : PX + NX] = zz
        scr_ref[r : r + BY, H + BZ : H + BZ + H, PX : PX + NX] = zz

        @pl.when(gz > 0)
        def _():
            scr_ref[r : r + BY, 0:H, PX : PX + NX] = zlo_ref[:]

        @pl.when(gz < nzb - 1)
        def _():
            scr_ref[r : r + BY, H + BZ : H + BZ + H, PX : PX + NX] = zhi_ref[:]

        if z_halo:
            @pl.when(gz == 0)
            def _():
                scr_ref[r : r + BY, 0:H, PX : PX + NX] = hzlo_ref[:]

            @pl.when(gz == nzb - 1)
            def _():
                scr_ref[r : r + BY, H + BZ : H + BZ + H, PX : PX + NX] = (
                    hzhi_ref[:]
                )

        lap = None
        for k, c in enumerate(d2y):
            if c == 0.0:
                continue
            t = c * scr_ref[k : k + BY, H : H + BZ, PX : PX + NX]
            lap = t if lap is None else lap + t
        for k, c in enumerate(d2z):
            if c == 0.0:
                continue
            z0 = H + k - r
            lap = lap + c * scr_ref[r : r + BY, z0 : z0 + BZ, PX : PX + NX]
        for k, c in enumerate(d2x):
            if c == 0.0:
                continue
            x0 = PX + k - r
            lap = lap + c * scr_ref[r : r + BY, H : H + BZ, x0 : x0 + NX]
        out_ref[:] = 2.0 * lam_ref[:] - lp_ref[:] + lap

        # ---- transposed x faces, in-block ----
        for side, pbr, psr, pbo, pso, ar, br, ker, kyr in (
            (0, pbxl_ref, psxl_ref, pbxl_o, psxl_o, axl_ref, bxl_ref,
             kexl_ref, kyxl_ref),
            (1, pbxh_ref, psxh_ref, pbxh_o, psxh_o, axh_ref, bxh_ref,
             kexh_ref, kyxh_ref),
        ):
            C0x = 0 if side == 0 else NX - S
            E0x = 0 if side == 0 else NX - S - r
            w0 = PX + C0x - r
            a = ar[0]
            b = br[0]
            u_strip = scr_ref[r : r + BY, H : H + BZ,
                              PX + C0x : PX + C0x + S]
            ps_tot = psr[:] + u_strip
            pso[:] = b * ps_tot
            w = a * ps_tot
            slab = scr_ref[r : r + BY, H : H + BZ, w0 : w0 + S + 2 * r]
            d1u = jax.lax.dot_general(
                slab, k1x_ref[:], (((2,), (1,)), ((), ())),
                preferred_element_type=dtype, precision=HIGHEST,
            )  # (BY, BZ, S)
            dw = jax.lax.dot_general(
                w, ker[:], (((2,), (0,)), ((), ())),
                preferred_element_type=dtype, precision=HIGHEST,
            )  # (BY, BZ, 2(S+r))
            d1w, d2w = dw[..., : S + r], dw[..., S + r :]
            pb_tot = pbr[:] - d1u - d1w[..., C0x - E0x : C0x - E0x + S]
            pbo[:] = b * pb_tot
            y = a * pb_tot
            d1y = jax.lax.dot_general(
                y, kyr[:], (((2,), (0,)), ((), ())),
                preferred_element_type=dtype, precision=HIGHEST,
            )  # (BY, BZ, S+r)
            out_ref[:, :, E0x : E0x + S + r] = (
                out_ref[:, :, E0x : E0x + S + r] + d2w - d1y
            )

        # ---- y/z upd slab application ----
        yl1 = yspan[0][1]
        yh0, yh1 = yspan[1][0], yspan[1][1]

        @pl.when(gy <= yl1)
        def _():
            out_ref[:] = out_ref[:] + uyl_ref[:]

        @pl.when((gy >= yh0) & (gy <= yh1))
        def _():
            out_ref[:] = out_ref[:] + uyh_ref[:]

        for s, uref in ((0, uzl_ref), (1, uzh_ref)):
            for jb, blo, bhi, wlo, whi in zapply[s][2]:
                @pl.when(gz == jb)
                def _(uref=uref, blo=blo, bhi=bhi, wlo=wlo, whi=whi):
                    out_ref[:, blo:bhi, :] = (
                        out_ref[:, blo:bhi, :] + uref[:, wlo:whi, :]
                    )

        # ---- free-surface pin: the forward applies a diagonal mask M
        # (zero z-row grid.pad) LAST, so its transpose masks the cotangent
        # FIRST; masking lam' here (and the injected residuals upstream)
        # keeps the carried cotangent == M lam everywhere, which is what
        # the transposed operator and the imaging condition consume. ----
        if grid.free_surface:
            jb_fs, fs_row = grid.pad // BZ, grid.pad % BZ

            @pl.when(gz == jb_fs)
            def _():
                out_ref[:, fs_row : fs_row + 1, :] = jnp.zeros(
                    (BY, 1, NX), dtype
                )

    blk = bspec((BY, BZ, NX), lambda gz, gy: (gy, gz, 0),
                       memory_space=pltpu.VMEM)
    blkS = bspec((BY, BZ, S), lambda gz, gy: (gy, gz, 0),
                        memory_space=pltpu.VMEM)
    ylo = bspec(
        (H, BZ, NX),
        lambda gz, gy: (jnp.maximum(gy * YB8 - 1, 0), gz, 0),
        memory_space=pltpu.VMEM,
    )
    yhi = bspec(
        (H, BZ, NX),
        lambda gz, gy: (jnp.minimum((gy + 1) * YB8, nyb * YB8 - 1), gz, 0),
        memory_space=pltpu.VMEM,
    )
    zlo = bspec(
        (BY, H, NX),
        lambda gz, gy: (gy, jnp.maximum(gz * ZB8 - 1, 0), 0),
        memory_space=pltpu.VMEM,
    )
    zhi = bspec(
        (BY, H, NX),
        lambda gz, gy: (gy, jnp.minimum((gz + 1) * ZB8, nzb * ZB8 - 1), 0),
        memory_space=pltpu.VMEM,
    )
    vspec = bspec(memory_space=pltpu.VMEM)
    yl1 = yspan[0][1]
    yh0, yh1 = yspan[1][0], yspan[1][1]
    uyl = bspec(
        (BY, BZ, NX),
        lambda gz, gy: (jnp.minimum(gy, yl1), gz, 0),
        memory_space=pltpu.VMEM,
    )
    uyh = bspec(
        (BY, BZ, NX),
        # minimum/maximum, not clip: jnp.clip's inner jit materializes
        # i64 bound constants under x64 whose i64->i32 convert sends
        # Mosaic lowering into infinite recursion (tpu_ci run 2)
        lambda gz, gy: (
            jnp.minimum(jnp.maximum(gy - yh0, 0), yh1 - yh0), gz, 0
        ),
        memory_space=pltpu.VMEM,
    )

    def _uz_spec(s):
        _, WZP, sites = zapply[s]
        jbs = tuple(site[0] for site in sites)

        def idx(gz, gy):
            used = jnp.zeros((), jnp.bool_)
            for jb in jbs:
                used = used | (gz == jb)
            # i32 branch literal: a weak python 0 becomes an i64 arg of
            # where's inner jit under x64 -> Mosaic convert recursion
            return (jnp.where(used, gy, jnp.int32(0)), 0, 0)

        return bspec((BY, WZP, NX), idx, memory_space=pltpu.VMEM)

    in_specs = [blk, blk, ylo, yhi, zlo, zhi, blk,
                blkS, blkS, blkS, blkS,
                vspec, vspec, vspec, vspec,
                vspec, vspec, vspec, vspec, vspec,
                uyl, uyh, _uz_spec(0), _uz_spec(1)]
    if y_halo:
        hspec = bspec((H, BZ, NX), lambda gz, gy: (0, gz, 0),
                      memory_space=pltpu.VMEM)
        in_specs += [hspec, hspec]
    if z_halo:
        hzspec = bspec((BY, H, NX), lambda gz, gy: (gy, 0, 0),
                       memory_space=pltpu.VMEM)
        in_specs += [hzspec, hzspec]

    call = pl.pallas_call(
        kernel,
        grid=(nzb, nyb),
        out_shape=(
            jax.ShapeDtypeStruct((NYe, NZe, NX), dtype),
            jax.ShapeDtypeStruct((NYe, NZe, S), dtype),
            jax.ShapeDtypeStruct((NYe, NZe, S), dtype),
            jax.ShapeDtypeStruct((NYe, NZe, S), dtype),
            jax.ShapeDtypeStruct((NYe, NZe, S), dtype),
        ),
        in_specs=in_specs,
        out_specs=(blk, blkS, blkS, blkS, blkS),
        scratch_shapes=[
            pltpu.VMEM((BY + 2 * r, BZ + 2 * H, NX + 2 * PX), dtype)
        ],
        input_output_aliases={0: 0, 7: 1, 8: 2, 9: 3, 10: 4},
        compiler_params=None
        if interpret
        else pltpu.CompilerParams(vmem_limit_bytes=120 * 1024 * 1024),
        interpret=interpret,
    )

    def transpose(lam_prev, lam, u, pbxl, psxl, pbxh, psxh,
                  ax_lo, bx_lo, ax_hi, bx_hi, uyl_, uyh_, uzl_, uzh_,
                  halos=()):
        return call(lam_prev, lam, u, u, u, u, u,
                    pbxl, psxl, pbxh, psxh,
                    ax_lo, bx_lo, ax_hi, bx_hi,
                    k1x, kex_lo, kex_hi, kyx_lo, kyx_hi,
                    uyl_, uyh_, uzl_, uzh_, *halos)

    return transpose
