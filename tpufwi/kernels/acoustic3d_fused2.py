"""Single-pass fused 3D acoustic step, round-2 rework (spec C5 / P2).

Round-2 measurement on the v1 composition (acoustic3d_strips_pallas.
make_acoustic3d_fused_step): the full step cost 26.8 ms at Overthrust
scale, of which ~12.8 ms was XLA slab slice / dynamic_update_slice
traffic around the six CPML slab kernels (each face RMW'd its slab of
p_next, and every dynamic_update_slice re-copied the full p_next array),
and the z-split leapfrog itself ran at 34% of its DMA bound. This module
removes the copies structurally:

  1. CPML face kernels no longer touch p_next. Each face kernel emits a
     compact ADDITIVE update slab  upd = c2 * (corr + psi')  (plus its
     phi/psi state updates, aliased in place). No dynamic_update_slice
     anywhere in the step.
  2. The x-faces move INSIDE the leapfrog kernel: every block spans the
     full x extent, so the banded lane products and the phi_x/psi_x
     updates run in-block on the scratch's zero x-margins (the per-block
     state slabs are (BY, BZ, S) side inputs/outputs, fetched exactly
     once per sweep).
  3. The y/z face update slabs are zero-padded to BLOCK-ALIGNED windows
     and added to the output block with `pl.when` guards. Their BlockSpec
     index maps are "sticky" (clamped to a constant off the involved
     rows), so Mosaic's revisiting logic fetches each slab exactly once
     per sweep instead of once per grid step.
  4. The grid is (nzb, nyb) with the y-block index FASTEST, which is what
     makes the y-slab sticky maps (and the z-slab `g0==jb` guards) fetch
     minimally.

Step composition v2: 4 small slab kernels (y-lo/hi, z-lo/hi corr) + 1
merged leapfrog+x-face+apply kernel, vs v1's 7 kernels + 12 slices + 6
full-array dynamic_update_slices.

v3 (round-2 continuation, fold_y/fold_z): ALL SIX CPML faces move inside
the merged kernel — ONE pallas_call per time step. Motivation (measured,
runs/tpu_queue4): the in-block x-face algebra costs nothing (x_face
mxu/vpu/off all 14.6-14.7 ms/step at Overthrust scale), while the four
y/z corr-slab kernel launches + their XLA slab slices cost 4-6 ms/step —
~10x their HBM traffic bound — i.e. pure per-call pipeline overhead. The
y/z face phi/psi state stays in HBM (pltpu.HBM refs) and face blocks
stage (S x BZ x NXP) / (BY x S x NXP) slabs through VMEM scratch with
explicit blocking DMAs (manual-DMA slices need a 128-aligned minor dim
and 8-aligned second-minor, hence the NXP padding and the S % 8 gates in
can_fold_y/can_fold_z). The y faces span up to three y-blocks; each
spanning block recomputes up to r neighbour phi' rows locally from a
widened 2r scratch y-halo instead of depending on another block's
output. Falls back to the v2 slab kernels per axis when the fold
conditions fail (tiny grids). Hardware parity: fold vs slab bit-exact
(2.8e-25, scripts/check_foldz_hw.py).

Per-step HBM traffic (v3) ~6.4 fields: p_prev, p, c2 reads + p_next
write + halo slabs + x-state streams + staged y/z face state.

Semantics are pinned against make_acoustic3d_strip_step (the XLA strip
path) in tests/test_acoustic3d_fused2.py. fp32.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_util import bspec

from ..grid import D1_COEFFS, D2_COEFFS, Grid
from .acoustic3d_pallas import y_extended, z_extended
from .acoustic3d_strips_pallas import _band, _taps_axis

# MXU precision for the banded face products. HIGHEST (6-pass fp32
# emulation) is the correctness default; the experiment knob exists
# because the banded matrices are tiny and badly tiled on the MXU, so
# the pass count multiplies a poorly-utilized operation (suspected
# order-independent ~half of the merged kernel's 14.6 ms/step —
# runs/tpu_queue3/exp_3d_lap.log shows tap count doesn't matter).
import os as _os

_PREC = {
    "highest": jax.lax.Precision.HIGHEST,
    "high": jax.lax.Precision.HIGH,
    "default": jax.lax.Precision.DEFAULT,
}
HIGHEST = _PREC[_os.environ.get("TPUFWI_3D_MXU_PRECISION", "highest").lower()]


def _face_span(n_face0: int, W: int, blk: int):
    """Block-aligned window [b0*blk, (b1+1)*blk) covering face rows
    [n_face0, n_face0+W). Returns (b0, b1, pad_lo) with pad_lo the face
    offset inside the window."""
    b0 = n_face0 // blk
    b1 = (n_face0 + W - 1) // blk
    return b0, b1, n_face0 - b0 * blk


def make_corr3d_y(grid: Grid, side: int, bz: int, NZe: int, by: int,
                  interpret: bool = False):
    """y-face CPML correction kernel (no p_next access).

    call(p_slab, phi, psi, a, b, c2_slab) -> (upd, phi', psi')

    p_slab/c2_slab are (W, NZe, NX) slices (rows [0,W) low / [NY-W, NY)
    high); phi/psi (S, NZe, NX) aliased in place. ``upd`` is the additive
    p_next update on a BY-BLOCK-ALIGNED padded window (rows outside the
    face region are zero), ready for whole-block adds in the merged
    kernel. Derivatives are free static shifts over a zero-margined
    scratch (y is the untiled leading dim).
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
    WP = (b1 - b0 + 1) * by  # padded window height
    d1, d2 = _taps_axis(grid, 0)
    dtype = jnp.float32

    def kernel(p_ref, phi_ref, psi_ref, a_ref, b_ref, c2_ref,
               upd_o, phi_o, psi_o, scr):
        scr[0:r] = jnp.zeros((r, BZ, NX), dtype)
        scr[r : r + W] = p_ref[:]
        scr[r + W : W + 2 * r] = jnp.zeros((r, BZ, NX), dtype)

        def shift_sum(taps, row0, nrows, base):
            out = None
            for k, cc in enumerate(taps):
                if cc == 0.0:
                    continue
                t = cc * base[row0 + k : row0 + k + nrows, :, :]
                out = t if out is None else out + t
            return out

        d1p = shift_sum(d1, C0, S, scr)
        d2p = shift_sum(d2, C0, S, scr)
        a = a_ref[:]
        b = b_ref[:]
        ph = b * phi_ref[:] + a * d1p
        phi_o[:] = ph
        scr[0 : C0 + r] = jnp.zeros((C0 + r, BZ, NX), dtype)
        scr[C0 + r : C0 + r + S] = ph
        scr[C0 + r + S :] = jnp.zeros((W + 2 * r - C0 - r - S, BZ, NX), dtype)
        corr = shift_sum(d1, E0, S + r, scr)
        v = d2p + corr[C0 - E0 : C0 - E0 + S]
        ps = b * psi_ref[:] + a * v
        psi_o[:] = ps
        upd_o[:] = jnp.zeros((WP, BZ, NX), dtype)
        upd_o[pad_lo + E0 : pad_lo + E0 + S + r] = (
            c2_ref[E0 : E0 + S + r] * corr
        )
        upd_o[pad_lo + C0 : pad_lo + C0 + S] = (
            upd_o[pad_lo + C0 : pad_lo + C0 + S]
            + c2_ref[C0 : C0 + S] * ps
        )

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
        in_specs=[blkW, blkS, blkS, vspec, vspec, blkW],
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


def make_corr3d_z(grid: Grid, side: int, by: int, NYe: int,
                  interpret: bool = False):
    """z-face CPML correction kernel (banded MXU, no p_next access).

    call(p_slab, phi, psi, a, b, c2_slab, k12, kc) -> (upd, phi', psi')

    p_slab/c2_slab are (NYe, W, NX) slices; phi/psi (NYe, S, NX) aliased.
    ``upd`` is the additive p_next update on an 8-SUBLANE-ALIGNED padded
    window (NYe, WZP, NX) whose z origin is returned by z_window(grid):
    rows outside the face region are zero; the merged kernel adds it with
    static in-block offsets.
    """
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
    k12_np = _band([d1, d2], S, W, [C0, C0], r)
    kc_np = np.zeros((S + r, S), np.float32)
    for i in range(S + r):
        for k in range(len(d1)):
            m = (E0 + i + k - r) - C0
            if 0 <= m < S:
                kc_np[i, m] = d1[k]
    eye = np.eye(BY, dtype=np.float32)
    k12_np = np.kron(eye, k12_np)
    kc_np = np.kron(eye, kc_np)
    dtype = jnp.float32

    def kernel(p_ref, phi_ref, psi_ref, a_ref, b_ref, c2_ref,
               k12_ref, kc_ref, upd_o, phi_o, psi_o):
        a = a_ref[0]  # (S, 1)
        b = b_ref[0]
        slab = jnp.reshape(p_ref[:], (BY * W, NX))
        d12 = jnp.reshape(
            jnp.dot(k12_ref[:], slab, preferred_element_type=dtype,
                    precision=HIGHEST),
            (BY, 2 * S, NX),
        )
        d1p, d2p = d12[:, :S], d12[:, S:]
        ph = b * phi_ref[:] + a * d1p
        phi_o[:] = ph
        corr = jnp.reshape(
            jnp.dot(kc_ref[:], jnp.reshape(ph, (BY * S, NX)),
                    preferred_element_type=dtype, precision=HIGHEST),
            (BY, S + r, NX),
        )
        v = d2p + corr[:, C0 - E0 : C0 - E0 + S]
        ps = b * psi_ref[:] + a * v
        psi_o[:] = ps
        upd_o[:] = jnp.zeros((BY, WZP, NX), dtype)
        upd_o[:, pad_lo + E0 : pad_lo + E0 + S + r, :] = (
            c2_ref[:, E0 : E0 + S + r, :] * corr
        )
        upd_o[:, pad_lo + C0 : pad_lo + C0 + S, :] = (
            upd_o[:, pad_lo + C0 : pad_lo + C0 + S, :]
            + c2_ref[:, C0 : C0 + S, :] * ps
        )

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
        in_specs=[blkW, blkS, blkS, vspec, vspec, blkW, vspec, vspec],
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
    k12 = np.asarray(k12_np)
    kc = np.asarray(kc_np)

    def corr_z(p_slab, phi, psi, a, b, c2_slab):
        return call(p_slab, phi, psi, a, b, c2_slab, k12, kc)

    return corr_z


def z_window(grid: Grid, side: int):
    """8-aligned z window (origin, width) containing the side's face
    region [face0, face0+W); width rounded to a multiple of 8."""
    r = grid.radius
    W = grid.pml + 3 * r
    NZ = grid.padded_shape[1]
    face0 = 0 if side == 0 else NZ - W
    o = (face0 // 8) * 8
    WZP = -(-(face0 + W - o) // 8) * 8
    return o, WZP


def can_fold_z(grid: Grid, bz: int) -> bool:
    """True when both z faces fit inside single z-blocks so the merged
    kernel can compute their CPML correction in-block (fold_z):
      * z-lo: correction rows [0, S+r) inside block 0, taps within the
        H-halo,
      * z-hi: the W-row window [NZ-W, NZ) inside the LAST z block
        (base >= 0) with its correction rows within the block.
    Production (bz=64, pml=20, order 8) satisfies this; tiny test grids
    with bz=16 do not and fall back to the corr-slab kernels."""
    r = grid.radius
    S = grid.pml + r
    W = S + 2 * r
    NZ = grid.padded_shape[1]
    NZe = z_extended(grid, bz)
    nzb = NZe // bz
    H = 8
    base_hi = NZ - W - (nzb - 1) * bz
    return (
        S % 8 == 0  # DMA slab second-minor dim must be 8-tile aligned
        and bz >= S + r
        and S + 2 * r <= bz + H
        and 0 <= base_hi
        and base_hi + W <= bz
        and nzb >= 2
    )


def can_fold_y(grid: Grid, by: int) -> bool:
    """True when the merged kernel can compute the y-face CPML in-block
    (fold_y): the lo and hi face block spans must be disjoint (they share
    staging scratch), and the p reach of recomputed neighbour phi rows
    (2r) must fit the widened scratch halo (H = 8 rows)."""
    r = grid.radius
    S = grid.pml + r
    NY = grid.padded_shape[0]
    lo_last = (S + r - 1) // by
    hi_first = (NY - S - r) // by
    return S % 8 == 0 and 2 * r <= 8 and lo_last < hi_first


def make_leapfrog3d_merged(grid: Grid, by: int = 16, bz: int = 64,
                           interpret: bool = False,
                           dimension_semantics=None,
                           vmem_limit_mb: int = 120,
                           x_face: str = "mxu",
                           fold_z: bool = False,
                           fold_y: bool = False,
                           y_halo: bool = False,
                           z_halo: bool = False):
    """Merged kernel: blocked leapfrog + in-block x-face CPML + whole-block
    application of the y/z face update slabs.

    call(p_prev, p, c2, phix_lo, psix_lo, phix_hi, psix_hi,
         ax_lo, bx_lo, ax_hi, bx_hi,
         updy_lo, updy_hi, updz_lo, updz_hi)
      -> (p_next, phix_lo', psix_lo', phix_hi', psix_hi')
    [p_prev and the x states aliased in place]

    Fields are (NYe, NZe, NX) (extend_yz layout); phix/psix (NYe, NZe, S);
    updy_* from make_corr3d_y, updz_* from make_corr3d_z. Grid (nzb, nyb),
    y FASTEST — see module docstring for why.

    With ``grid.free_surface`` the z-row ``grid.pad`` of p_next is pinned
    to zero at the end of the kernel (pressure-release plane, matching the
    jnp engine's _pin_surface); the z-lo CPML is disabled upstream by the
    profile builder (free_lo => a = b = 0, so the z-lo corr slab is a
    structural no-op).

    ``x_face`` selects the x-face CPML implementation:
      * "mxu"  — banded MXU lane products at precision=HIGHEST (v2 default;
        6-pass fp32 emulation on tiny badly-tiled matrices).
      * "vpu"  — the same algebra as shift-sums over static lane offsets
        (exp_3d_lap measured effective VMEM read BW at 7.5 TB/s with taps
        nearly free, so 9 shifted S-lane reads per derivative should beat
        4 small serialized MXU products per block).
      * "off"  — skip the x faces entirely (attribution probe only; the
        phi/psi x-state passes through unchanged).

    ``fold_z`` computes BOTH z-face CPML corrections in-block too (the
    z-face window lives inside a single z-block at production shapes —
    see can_fold_z), taking the per-side phi/psi (NYe, S, NX) state as
    additional aliased in/outs with sticky index maps (fetched only on
    the face z-row of blocks). This removes the two corr_z slab kernels,
    their four XLA slab slices and the uz update-slab streams — measured
    at ~10x their HBM traffic bound in per-call pipeline overhead
    (runs/tpu_queue4). The merged signature then takes
    (..., uyl, uyh, phzl, pszl, phzh, pszh, azl, bzl, azh, bzh) and
    returns 4 extra state outputs.
    """
    if grid.ndim != 3:
        raise ValueError("3D kernel needs a 3D grid")
    if fold_z and not can_fold_z(grid, bz):
        raise ValueError("fold_z requires the z faces inside single "
                         "z-blocks (see can_fold_z)")
    if fold_y and not can_fold_y(grid, by):
        raise ValueError("fold_y requires disjoint y-face block spans "
                         "(see can_fold_y)")
    if bz % 8 != 0 or by % 8 != 0:
        raise ValueError("by and bz must be multiples of 8")
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
    d1zf, d2zf = _taps_axis(grid, 1)  # z-face CPML taps (fold_z)
    d1yf, d2yf = _taps_axis(grid, 0)  # y-face CPML taps (fold_y)
    NXP = -(-NX // 128) * 128  # face-state minor dim (manual DMA slices
    # must be 128-tile aligned; the state arrays pad x with dead columns)
    PX = 128
    H = 8
    dtype = jnp.float32
    # z-face geometry (fold_z): window [face0, face0+W) sits inside block
    # jb at in-block row offset `base`
    zface = {}
    for s in (0, 1):
        face0 = 0 if s == 0 else NZ - W
        jb = 0 if s == 0 else nzb - 1
        zface[s] = (jb, face0 - jb * BZ)
    # y-face geometry (fold_y): per side, the static per-block row
    # assignment. phi/psi live on global rows [p0, p0+S); the corr
    # output covers [c0, c0+S+r). Each spanning block computes phi' for
    # the rows its OWN corr/psi rows reach (recomputing up to r neighbour
    # rows locally from the p halo instead of a cross-block dependency),
    # writes its own phi/psi rows to the side's slab scratch, and adds
    # its own corr/psi terms to out. Every row range below is static.
    yfold = {}
    for s in (0, 1):
        p0 = 0 if s == 0 else NY - S
        c0 = 0 if s == 0 else NY - S - r
        g0b = min(p0, c0) // BY
        g1b = (max(p0 + S, c0 + S + r) - 1) // BY
        sites = []
        for g in range(g0b, g1b + 1):
            b0, b1 = g * BY, g * BY + BY
            oa, ob = max(p0, b0) - p0, min(p0 + S, b1) - p0  # phi/psi own
            ca, cb = max(c0, b0) - c0, min(c0 + S + r, b1) - c0  # corr own
            ca, cb = max(ca, 0), max(cb, 0)
            oa, ob = max(oa, 0), max(ob, 0)
            # corr rows this block evaluates: its out rows + its psi rows
            ea = min(ca, (p0 + oa) - c0) if ob > oa else ca
            eb = max(cb, (p0 + ob) - c0) if ob > oa else cb
            # phi rows needed for those corr rows (clipped to [0, S))
            na = max(0, (c0 + ea) - r - p0)
            nb = min(S, (c0 + eb - 1) + r + 1 - p0)
            if eb <= ea and ob <= oa:
                continue
            sites.append(dict(g=g, p0=p0, c0=c0, oa=oa, ob=ob, ca=ca,
                              cb=cb, ea=ea, eb=eb, na=na, nb=nb))
        yfold[s] = (g0b, g1b, sites)

    # x-face banded matrices on the (S+2r)-lane window (strip +- r; the
    # window's outer r lanes are the scratch's zero x-margin = physical
    # zero extension, its inner r lanes are real interior data)
    kx12_np = _band([d1x, d2x1], S, S + 2 * r, [r, r], r)
    kcx = {}
    for side in (0, 1):
        C0x = 0 if side == 0 else NX - S
        E0x = 0 if side == 0 else NX - S - r
        kc_np = np.zeros((S, S + r), np.float32)  # transposed right-product
        for i in range(S + r):
            for k in range(len(d1x)):
                m = (E0x + i + k - r) - C0x
                if 0 <= m < S:
                    kc_np[m, i] = d1x[k]
        kcx[side] = kc_np
    kx12 = np.asarray(kx12_np)
    kcx_lo = np.asarray(kcx[0])
    kcx_hi = np.asarray(kcx[1])

    # y-face application sites: window blocks [yb0, yb1] per side
    yspan = {s: _face_span(0 if s == 0 else NY - W, W, BY) for s in (0, 1)}
    # z-face: window [o, o+WZP) per side; apply sites (z-block, in-block
    # row range, window row range) — statically split over blocks
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

    if x_face not in ("mxu", "vpu", "off"):
        raise ValueError(f"unknown x_face mode {x_face!r}")
    if (y_halo or z_halo) and (fold_y or fold_z):
        # the sharded composition (adjoint3d_pallas_sharded) targets the
        # production v2 slab-kernel configuration only
        raise ValueError("halo modes require fold_y=fold_z=False")

    YOFF = 2 * r if fold_y else r  # scratch y-halo width

    def kernel(*refs):
        (pp_ref, p_ref, ylo_ref, yhi_ref, zlo_ref, zhi_ref, c2_ref,
         xst_ref,
         axl_ref, bxl_ref, axh_ref, bxh_ref,
         kx12_ref, kcxl_ref, kcxh_ref) = refs[:15]
        i = 15
        if fold_y:
            (phyl_ref, psyl_ref, phyh_ref, psyh_ref,
             ayl_ref, byl_ref, ayh_ref, byh_ref) = refs[i : i + 8]
            i += 8
        else:
            uyl_ref, uyh_ref = refs[i : i + 2]
            i += 2
        if fold_z:
            (phzl_ref, pszl_ref, phzh_ref, pszh_ref,
             azl_ref, bzl_ref, azh_ref, bzh_ref) = refs[i : i + 8]
            i += 8
        else:
            uzl_ref, uzh_ref = refs[i : i + 2]
            i += 2
        if y_halo:
            hylo_ref, hyhi_ref = refs[i : i + 2]
            i += 2
        if z_halo:
            hzlo_ref, hzhi_ref = refs[i : i + 2]
            i += 2
        out_ref, xst_o = refs[i : i + 2]
        i += 2
        if fold_z:
            phzl_o, pszl_o, phzh_o, pszh_o = refs[i : i + 4]
            i += 4
        if fold_y:
            phyl_o, psyl_o, phyh_o, psyh_o = refs[i : i + 4]
            i += 4
        scr_ref = refs[i]
        i += 1
        if fold_z:
            zscr_ref, zphi_s, zpsi_s, zsem_in, zsem_out = refs[i : i + 5]
            i += 5
        if fold_y:
            (yscr_ref, yphi_in_s, yphi_out_s, ypsi_s, ysem) = refs[i : i + 5]
            i += 5
        xscr = refs[i:]
        gz = pl.program_id(0)
        gy = pl.program_id(1)  # fastest
        zcol = jnp.zeros((BY + 2 * YOFF, BZ + 2 * H, r), dtype)
        scr_ref[:, :, PX - r : PX] = zcol
        scr_ref[:, :, PX + NX : PX + NX + r] = zcol
        scr_ref[YOFF : YOFF + BY, H : H + BZ, PX : PX + NX] = p_ref[:]

        zy = jnp.zeros((YOFF, BZ, NX), dtype)
        scr_ref[0:YOFF, H : H + BZ, PX : PX + NX] = zy
        scr_ref[YOFF + BY : 2 * YOFF + BY, H : H + BZ, PX : PX + NX] = zy

        @pl.when(gy > 0)
        def _():
            scr_ref[0:YOFF, H : H + BZ, PX : PX + NX] = ylo_ref[H - YOFF : H]

        @pl.when(gy < nyb - 1)
        def _():
            scr_ref[YOFF + BY : 2 * YOFF + BY, H : H + BZ, PX : PX + NX] = (
                yhi_ref[0:YOFF]
            )

        if y_halo:
            # domain-sharded composition: the slab edges are INTERIOR cuts
            # whose neighbor rows live on other devices — the caller halo-
            # exchanges them (ppermute) and passes (H, NZe, NX) slabs;
            # global edges still get zeros (the caller's ppermute fills
            # uncovered destinations with zeros, matching the unsharded
            # kernel's zero extension).
            @pl.when(gy == 0)
            def _():
                scr_ref[0:YOFF, H : H + BZ, PX : PX + NX] = (
                    hylo_ref[H - YOFF : H]
                )

            @pl.when(gy == nyb - 1)
            def _():
                scr_ref[YOFF + BY : 2 * YOFF + BY, H : H + BZ,
                        PX : PX + NX] = hyhi_ref[0:YOFF]

        zz = jnp.zeros((BY, H, NX), dtype)
        scr_ref[YOFF : YOFF + BY, 0:H, PX : PX + NX] = zz
        scr_ref[YOFF : YOFF + BY, H + BZ : H + BZ + H, PX : PX + NX] = zz

        @pl.when(gz > 0)
        def _():
            scr_ref[YOFF : YOFF + BY, 0:H, PX : PX + NX] = zlo_ref[:]

        @pl.when(gz < nzb - 1)
        def _():
            scr_ref[YOFF : YOFF + BY, H + BZ : H + BZ + H, PX : PX + NX] = (
                zhi_ref[:]
            )

        if z_halo:
            # z-sharded composition: the slab's z edges are interior cuts
            # — the caller ppermute-exchanges the neighbor edge rows and
            # passes (NYe, H, NX) slabs (rows [H-r, H) of hzlo / [0, r)
            # of hzhi are real); global z edges still get zeros.
            @pl.when(gz == 0)
            def _():
                scr_ref[YOFF : YOFF + BY, 0:H, PX : PX + NX] = hzlo_ref[:]

            @pl.when(gz == nzb - 1)
            def _():
                scr_ref[YOFF : YOFF + BY, H + BZ : H + BZ + H,
                        PX : PX + NX] = hzhi_ref[:]

        lap = None
        for k, c in enumerate(d2y):
            if c == 0.0:
                continue
            y0 = YOFF - r + k
            t = c * scr_ref[y0 : y0 + BY, H : H + BZ, PX : PX + NX]
            lap = t if lap is None else lap + t
        for k, c in enumerate(d2z):
            if c == 0.0:
                continue
            z0 = H + k - r
            lap = lap + c * scr_ref[YOFF : YOFF + BY, z0 : z0 + BZ,
                                    PX : PX + NX]
        for k, c in enumerate(d2x):
            if c == 0.0:
                continue
            x0 = PX + k - r
            lap = lap + c * scr_ref[YOFF : YOFF + BY, H : H + BZ,
                                    x0 : x0 + NX]
        out_ref[:] = 2.0 * p_ref[:] - pp_ref[:] + c2_ref[:] * lap

        # ---- x faces, in-block (phi/psi lo/hi PACKED into one
        # (BY, BZ, 4S) stream: lanes [0:S)=phi_lo, [S:2S)=psi_lo,
        # [2S:3S)=phi_hi, [3S:4S)=psi_hi — measured ~0.23 us per stream
        # per block of pure pipeline overhead, so 2 streams beat 8) ----
        for side, ar, br, kcr in (
            (0, axl_ref, bxl_ref, kcxl_ref),
            (1, axh_ref, bxh_ref, kcxh_ref),
        ):
            xo = side * 2 * S
            if x_face == "off":
                xst_o[:, :, xo : xo + 2 * S] = xst_ref[:, :, xo : xo + 2 * S]
                continue
            C0x = 0 if side == 0 else NX - S
            E0x = 0 if side == 0 else NX - S - r
            w0 = PX + C0x - r
            if x_face == "mxu":
                # banded MXU lane products on the (S+2r)-lane window
                slab = scr_ref[YOFF : YOFF + BY, H : H + BZ, w0 : w0 + S + 2 * r]
                d12 = jax.lax.dot_general(
                    slab, kx12_ref[:], (((2,), (1,)), ((), ())),
                    preferred_element_type=dtype, precision=HIGHEST,
                )  # (BY, BZ, 2S)
                d1p, d2p = d12[..., :S], d12[..., S:]
            else:
                # VPU shift-sums: 2r+1 shifted S-lane reads per derivative
                # (static lane offsets; the window's outer r lanes are the
                # scratch's zero x-margin — same zero-extension semantics
                # as the band matrices)
                d1p = d2p = None
                for k in range(len(d1x)):
                    sl = scr_ref[YOFF : YOFF + BY, H : H + BZ, w0 + k : w0 + k + S]
                    if d1x[k] != 0.0:
                        t = d1x[k] * sl
                        d1p = t if d1p is None else d1p + t
                    if d2x1[k] != 0.0:
                        t2 = d2x1[k] * sl
                        d2p = t2 if d2p is None else d2p + t2
            a = ar[0]  # (1, S)
            b = br[0]
            ph = b * xst_ref[:, :, xo : xo + S] + a * d1p
            xst_o[:, :, xo : xo + S] = ph
            if x_face == "mxu":
                corr = jax.lax.dot_general(
                    ph, kcr[:], (((2,), (0,)), ((), ())),
                    preferred_element_type=dtype, precision=HIGHEST,
                )  # (BY, BZ, S+r)
            else:
                # corr[i] = sum_k d1[k] * ph_ext[E0x + i + k - r]: write ph
                # into a zero-margined lane scratch and shift-sum
                xs = xscr[0]
                off = (C0x - E0x) + r
                xs[:, :, 0:off] = jnp.zeros((BY, BZ, off), dtype)
                xs[:, :, off : off + S] = ph
                xs[:, :, off + S :] = jnp.zeros(
                    (BY, BZ, S + 3 * r - off - S), dtype
                )
                corr = None
                for k in range(len(d1x)):
                    if d1x[k] == 0.0:
                        continue
                    t = d1x[k] * xs[:, :, k : k + S + r]
                    corr = t if corr is None else corr + t
            v = d2p + corr[..., C0x - E0x : C0x - E0x + S]
            ps = b * xst_ref[:, :, xo + S : xo + 2 * S] + a * v
            xst_o[:, :, xo + S : xo + 2 * S] = ps
            out_ref[:, :, E0x : E0x + S + r] = (
                out_ref[:, :, E0x : E0x + S + r]
                + c2_ref[:, :, E0x : E0x + S + r] * corr
            )
            out_ref[:, :, C0x : C0x + S] = (
                out_ref[:, :, C0x : C0x + S]
                + c2_ref[:, :, C0x : C0x + S] * ps
            )

        if fold_y:
            # ---- y faces, in-block (fold_y). Same algebra as
            # make_corr3d_y, decomposed over the spanning blocks: each
            # block recomputes up to r neighbour phi' rows locally from
            # the widened (2r) p halo, so there is no cross-block data
            # dependency. The (S, NZe, NX) phi/psi state lives in HBM
            # (ANY space); its per-gz (S, BZ, NX) slab is staged through
            # VMEM scratch by explicit blocking DMAs at the first/last
            # spanning block of each gz row. phi reads come from the
            # staged IN slab, phi'/psi' writes go to separate OUT slabs
            # (psi has no cross-block reads but shares the out-DMA
            # pattern), so a later block never sees an updated row.
            for side, sides_refs in ((0, (phyl_ref, psyl_ref, phyl_o,
                                          psyl_o, ayl_ref, byl_ref)),
                                     (1, (phyh_ref, psyh_ref, phyh_o,
                                          psyh_o, ayh_ref, byh_ref))):
                phi_hbm, psi_hbm, phi_hbm_o, psi_hbm_o, ar, br = sides_refs
                g0b, g1b, sites = yfold[side]

                for site in sites:
                    g = site["g"]
                    p0, c0 = site["p0"], site["c0"]
                    oa, ob = site["oa"], site["ob"]
                    ca, cb = site["ca"], site["cb"]
                    ea, eb = site["ea"], site["eb"]
                    na, nb = site["na"], site["nb"]
                    b0 = g * BY

                    @pl.when(gy == g)
                    def _(g=g, p0=p0, c0=c0, oa=oa, ob=ob, ca=ca, cb=cb,
                          ea=ea, eb=eb, na=na, nb=nb, b0=b0, ar=ar, br=br,
                          phi_hbm=phi_hbm, psi_hbm=psi_hbm,
                          phi_hbm_o=phi_hbm_o, psi_hbm_o=psi_hbm_o,
                          g0b=g0b, g1b=g1b):
                        if g == g0b:
                            cp = pltpu.make_async_copy(
                                phi_hbm.at[:, pl.ds(gz * BZ, BZ), :],
                                yphi_in_s, ysem.at[0])
                            cq = pltpu.make_async_copy(
                                psi_hbm.at[:, pl.ds(gz * BZ, BZ), :],
                                ypsi_s, ysem.at[1])
                            cp.start()
                            cq.start()
                            cp.wait()
                            cq.wait()
                        # phi' on rows [na, nb) (rel p0); p taps via the
                        # widened scratch halo
                        yb = (p0 + na) - b0 + YOFF  # scr row of phi row na
                        nn = nb - na
                        d1p = d2p = None
                        for k in range(len(d1yf)):
                            y0k = yb - r + k
                            sl = scr_ref[y0k : y0k + nn, H : H + BZ,
                                         PX : PX + NX]
                            if d1yf[k] != 0.0:
                                t = d1yf[k] * sl
                                d1p = t if d1p is None else d1p + t
                            if d2yf[k] != 0.0:
                                t2 = d2yf[k] * sl
                                d2p = t2 if d2p is None else d2p + t2
                        a_sl = ar[na:nb]
                        b_sl = br[na:nb]
                        ph = (b_sl * yphi_in_s[na:nb, :, 0:NX]
                              + a_sl * d1p)
                        if ob > oa:
                            yphi_out_s[oa:ob, :, 0:NX] = (
                                ph[oa - na : ob - na])
                        # corr rows [ea, eb) via the zero-margined yscr:
                        # phi row j sits at yscr row j + r - (c0 - p0),
                        # so corr(m) = sum_k d1[k] * yscr[m + k]
                        off = r - (c0 - p0)
                        # corr reads yscr rows [ea, eb + 2r); zero only
                        # the parts of that range not covered by ph
                        z1a, z1b = ea, min(off + na, eb + 2 * r)
                        z2a, z2b = max(off + nb, ea), eb + 2 * r
                        if z1b > z1a:
                            yscr_ref[z1a:z1b] = jnp.zeros(
                                (z1b - z1a, BZ, NX), dtype)
                        if z2b > z2a:
                            yscr_ref[z2a:z2b] = jnp.zeros(
                                (z2b - z2a, BZ, NX), dtype)
                        yscr_ref[off + na : off + nb] = ph
                        ne = eb - ea
                        corr = None
                        for k in range(len(d1yf)):
                            if d1yf[k] == 0.0:
                                continue
                            t = d1yf[k] * yscr_ref[ea + k : ea + k + ne]
                            corr = t if corr is None else corr + t
                        if ob > oa:
                            # psi' on own rows; corr at psi row j is
                            # corr[(p0 - c0) + j - ea]
                            va = (p0 - c0) + oa - ea
                            v = (d2p[oa - na : ob - na]
                                 + corr[va : va + (ob - oa)])
                            ps = (b_sl[oa - na : ob - na]
                                  * ypsi_s[oa:ob, :, 0:NX]
                                  + a_sl[oa - na : ob - na] * v)
                            ypsi_s[oa:ob, :, 0:NX] = ps
                            j0 = (p0 + oa) - b0
                            out_ref[j0 : j0 + (ob - oa)] = (
                                out_ref[j0 : j0 + (ob - oa)]
                                + c2_ref[j0 : j0 + (ob - oa)] * ps
                            )
                        if cb > ca:
                            m0 = (c0 + ca) - b0
                            out_ref[m0 : m0 + (cb - ca)] = (
                                out_ref[m0 : m0 + (cb - ca)]
                                + c2_ref[m0 : m0 + (cb - ca)]
                                * corr[ca - ea : cb - ea]
                            )
                        if g == g1b:
                            cp = pltpu.make_async_copy(
                                yphi_out_s,
                                phi_hbm_o.at[:, pl.ds(gz * BZ, BZ), :],
                                ysem.at[0])
                            cq = pltpu.make_async_copy(
                                ypsi_s,
                                psi_hbm_o.at[:, pl.ds(gz * BZ, BZ), :],
                                ysem.at[1])
                            cp.start()
                            cq.start()
                            cp.wait()
                            cq.wait()
        else:
            # ---- y-face slab application (whole-block adds) ----
            yl0, yl1, _ = yspan[0]
            yh0, yh1, _ = yspan[1]

            @pl.when(gy <= yl1)
            def _():
                out_ref[:] = out_ref[:] + uyl_ref[:]

            @pl.when((gy >= yh0) & (gy <= yh1))
            def _():
                out_ref[:] = out_ref[:] + uyh_ref[:]

        if fold_z:
            # ---- z faces, in-block (fold_z; same algebra as
            # make_corr3d_z). The (NYe, S, NX) phi/psi state lives in HBM
            # (pltpu.HBM refs); each face block stages its (BY, S, NXP)
            # slab through DOUBLE-BUFFERED VMEM scratch: the slab for
            # gy+1 is prefetched during gy's compute and the out-DMA is
            # waited one invocation later (blocking DMAs measured
            # cost-neutral vs the slab kernels — the stalls ate the
            # launch savings). z faces have no cross-block phi reads, so
            # the staging is in-place per slab. ----
            for side, phir, psir, pho, pso, ar, br in (
                (0, phzl_ref, pszl_ref, phzl_o, pszl_o, azl_ref, bzl_ref),
                (1, phzh_ref, pszh_ref, phzh_o, pszh_o, azh_ref, bzh_ref),
            ):
                jb, base = zface[side]
                C0 = 0 if side == 0 else W - S
                E0 = 0 if side == 0 else r

                @pl.when(gz == jb)
                def _(side=side, phir=phir, psir=psir, pho=pho, pso=pso,
                      ar=ar, br=br, base=base, C0=C0, E0=E0):
                    bi = gy % 2

                    def in_dma(g, buf):
                        return (
                            pltpu.make_async_copy(
                                phir.at[pl.ds(g * BY, BY), :, :],
                                zphi_s.at[buf], zsem_in.at[0, buf]),
                            pltpu.make_async_copy(
                                psir.at[pl.ds(g * BY, BY), :, :],
                                zpsi_s.at[buf], zsem_in.at[1, buf]),
                        )

                    @pl.when(gy == 0)
                    def _():
                        c0_, c1_ = in_dma(gy, bi)
                        c0_.start()
                        c1_.start()

                    @pl.when(gy < nyb - 1)
                    def _():
                        # buf (gy+1)%2 was last used by gy-1: its out-DMA
                        # must land before the prefetch overwrites it
                        @pl.when(gy > 0)
                        def _():
                            pltpu.make_async_copy(
                                zphi_s.at[1 - bi],
                                pho.at[pl.ds((gy - 1) * BY, BY), :, :],
                                zsem_out.at[0, 1 - bi]).wait()
                            pltpu.make_async_copy(
                                zpsi_s.at[1 - bi],
                                pso.at[pl.ds((gy - 1) * BY, BY), :, :],
                                zsem_out.at[1, 1 - bi]).wait()
                        c0_, c1_ = in_dma(gy + 1, 1 - bi)
                        c0_.start()
                        c1_.start()

                    cp, cq = in_dma(gy, bi)
                    cp.wait()
                    cq.wait()
                    a = ar[0]  # (S, 1): broadcasts over (BY, S, NX)
                    b = br[0]
                    d1p = d2p = None
                    for k in range(len(d1zf)):
                        z0 = H + base + C0 - r + k
                        sl = scr_ref[YOFF : YOFF + BY, z0 : z0 + S,
                                     PX : PX + NX]
                        if d1zf[k] != 0.0:
                            t = d1zf[k] * sl
                            d1p = t if d1p is None else d1p + t
                        if d2zf[k] != 0.0:
                            t2 = d2zf[k] * sl
                            d2p = t2 if d2p is None else d2p + t2
                    ph = b * zphi_s[bi, :, :, 0:NX] + a * d1p
                    zphi_s[bi, :, :, 0:NX] = ph
                    # corr[i] = sum_k d1[k] * ph_ext[E0+i+k-r-C0] over a
                    # zero-margined z scratch (ph at rows [C0+r, C0+r+S))
                    zscr_ref[:, 0 : C0 + r, :] = jnp.zeros(
                        (BY, C0 + r, NX), dtype)
                    zscr_ref[:, C0 + r : C0 + r + S, :] = ph
                    zscr_ref[:, C0 + r + S :, :] = jnp.zeros(
                        (BY, W + 2 * r - C0 - r - S, NX), dtype)
                    corr = None
                    for k in range(len(d1zf)):
                        if d1zf[k] == 0.0:
                            continue
                        t = d1zf[k] * zscr_ref[:, E0 + k : E0 + k + S + r, :]
                        corr = t if corr is None else corr + t
                    v = d2p + corr[:, C0 - E0 : C0 - E0 + S, :]
                    ps = b * zpsi_s[bi, :, :, 0:NX] + a * v
                    zpsi_s[bi, :, :, 0:NX] = ps
                    o0 = base + E0
                    out_ref[:, o0 : o0 + S + r, :] = (
                        out_ref[:, o0 : o0 + S + r, :]
                        + c2_ref[:, o0 : o0 + S + r, :] * corr
                    )
                    o1 = base + C0
                    out_ref[:, o1 : o1 + S, :] = (
                        out_ref[:, o1 : o1 + S, :]
                        + c2_ref[:, o1 : o1 + S, :] * ps
                    )
                    co = pltpu.make_async_copy(
                        zphi_s.at[bi], pho.at[pl.ds(gy * BY, BY), :, :],
                        zsem_out.at[0, bi])
                    cr = pltpu.make_async_copy(
                        zpsi_s.at[bi], pso.at[pl.ds(gy * BY, BY), :, :],
                        zsem_out.at[1, bi])
                    co.start()
                    cr.start()

                    @pl.when(gy == nyb - 1)
                    def _():
                        # drain: own out + the gy-1 out still in flight
                        co2, cr2 = (
                            pltpu.make_async_copy(
                                zphi_s.at[bi],
                                pho.at[pl.ds(gy * BY, BY), :, :],
                                zsem_out.at[0, bi]),
                            pltpu.make_async_copy(
                                zpsi_s.at[bi],
                                pso.at[pl.ds(gy * BY, BY), :, :],
                                zsem_out.at[1, bi]),
                        )
                        co2.wait()
                        cr2.wait()
                        pltpu.make_async_copy(
                            zphi_s.at[1 - bi],
                            pho.at[pl.ds((gy - 1) * BY, BY), :, :],
                            zsem_out.at[0, 1 - bi]).wait()
                        pltpu.make_async_copy(
                            zpsi_s.at[1 - bi],
                            pso.at[pl.ds((gy - 1) * BY, BY), :, :],
                            zsem_out.at[1, 1 - bi]).wait()
        else:
            # ---- z-face slab application (static sub-ranges per site) ----
            for s, uref in ((0, uzl_ref), (1, uzh_ref)):
                for jb, blo, bhi, wlo, whi in zapply[s][2]:
                    @pl.when(gz == jb)
                    def _(uref=uref, blo=blo, bhi=bhi, wlo=wlo, whi=whi):
                        out_ref[:, blo:bhi, :] = (
                            out_ref[:, blo:bhi, :] + uref[:, wlo:whi, :]
                        )

        # ---- pressure-release surface pin (after every update) ----
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
    # sticky maps: fetch the face slabs only on the rows/steps that use
    # them; clamp to a constant elsewhere so revisiting skips the DMA
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

    blk4S = bspec((BY, BZ, 4 * S), lambda gz, gy: (gy, gz, 0),
                  memory_space=pltpu.VMEM)
    out_shape = [
        jax.ShapeDtypeStruct((NYe, NZe, NX), dtype),
        jax.ShapeDtypeStruct((NYe, NZe, 4 * S), dtype),
    ]
    in_specs = [blk, blk, ylo, yhi, zlo, zhi, blk,
                blk4S,
                vspec, vspec, vspec, vspec,
                vspec, vspec, vspec]
    out_specs = [blk, blk4S]
    aliases = {0: 0, 7: 1}
    scratch = [pltpu.VMEM((BY + 2 * YOFF, BZ + 2 * H, NX + 2 * PX), dtype)]
    n_out = 2
    if fold_y:
        # (S, NZe, NX) state stays in HBM (ANY space); the kernel stages
        # per-gz slabs via explicit DMAs
        anyspec = bspec(memory_space=pltpu.HBM)
        in_specs += [anyspec] * 4 + [vspec] * 4
        iy = len(in_specs) - 8  # first y-state input index
    else:
        in_specs += [uyl, uyh]
    if fold_z:
        # (NYe, S, NX) state stays in HBM (ANY space); the kernel stages
        # per-block (BY, S, NX) slabs via explicit DMAs
        anyspec = bspec(memory_space=pltpu.HBM)
        iz = len(in_specs)
        in_specs += [anyspec] * 4 + [vspec] * 4
        out_specs += [anyspec] * 4
        out_shape += [jax.ShapeDtypeStruct((NYe, S, NXP), dtype)] * 4
        aliases.update({iz + k: n_out + k for k in range(4)})
        n_out += 4
        scratch += [
            pltpu.VMEM((BY, W + 2 * r, NX), dtype),  # zscr (corr margin)
            pltpu.VMEM((2, BY, S, NXP), dtype),      # staged phi (2 bufs)
            pltpu.VMEM((2, BY, S, NXP), dtype),      # staged psi (2 bufs)
            pltpu.SemaphoreType.DMA((2, 2)),         # in sems
            pltpu.SemaphoreType.DMA((2, 2)),         # out sems
        ]
    else:
        in_specs += [_uz_spec(0), _uz_spec(1)]
    if y_halo:
        hspec = bspec((H, BZ, NX), lambda gz, gy: (0, gz, 0),
                      memory_space=pltpu.VMEM)
        in_specs += [hspec, hspec]
    if z_halo:
        hzspec = bspec((BY, H, NX), lambda gz, gy: (gy, 0, 0),
                       memory_space=pltpu.VMEM)
        in_specs += [hzspec, hzspec]
    if fold_y:
        anyspec = bspec(memory_space=pltpu.HBM)
        out_specs += [anyspec] * 4
        out_shape += [jax.ShapeDtypeStruct((S, NZe, NXP), dtype)] * 4
        aliases.update({iy + k: n_out + k for k in range(4)})
        n_out += 4
        scratch += [
            pltpu.VMEM((S + 3 * r, BZ, NX), dtype),  # yscr (corr margin)
            pltpu.VMEM((S, BZ, NXP), dtype),         # staged phi in
            pltpu.VMEM((S, BZ, NXP), dtype),         # staged phi out
            pltpu.VMEM((S, BZ, NXP), dtype),         # staged psi (in place)
            pltpu.SemaphoreType.DMA((2,)),
        ]
    if x_face == "vpu":
        scratch.append(pltpu.VMEM((BY, BZ, S + 3 * r), dtype))

    call = pl.pallas_call(
        kernel,
        grid=(nzb, nyb),
        out_shape=tuple(out_shape),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        scratch_shapes=scratch,
        input_output_aliases=aliases,
        compiler_params=None
        if interpret
        else pltpu.CompilerParams(
            vmem_limit_bytes=vmem_limit_mb * 1024 * 1024,
            dimension_semantics=dimension_semantics,
        ),
        interpret=interpret,
    )

    def merged(p_prev, p, c2, xst,
               ax_lo, bx_lo, ax_hi, bx_hi, ygroup, zgroup, halos=()):
        """xst: packed (NYe, NZe, 4S) x-face state. ygroup / zgroup:
        (uyl, uyh) / (uzl, uzh) slab tuples, or the (phi_lo, psi_lo,
        phi_hi, psi_hi, a_lo, b_lo, a_hi, b_hi) state tuples when the
        corresponding fold flag is set. ``halos``: with y_halo=True,
        (hylo, hyhi) (H, NZe, NX) slabs — rows [H-r, H) of hylo / [0, r)
        of hyhi hold the neighbor devices' edge rows of p."""
        return call(p_prev, p, p, p, p, p, c2,
                    xst,
                    ax_lo, bx_lo, ax_hi, bx_hi,
                    kx12, kcx_lo, kcx_hi,
                    *ygroup, *zgroup, *halos)

    return merged


def make_acoustic3d_fused_step2(grid: Grid, dt: float, f0: float,
                                c_max: float, by: int = 16, bz: int = 64,
                                bz_y: int = 16, interpret: bool = False,
                                dimension_semantics=None,
                                vmem_limit_mb: int = 120,
                                x_face: str | None = None,
                                fold_z: bool | None = None,
                                fold_y: bool | None = None,
                                y_halo: bool = False,
                                z_halo: bool = False,
                                y_profiles=None,
                                z_profiles=None):
    """Production fused 3D step v2 (see module docstring): 4 corr slab
    kernels + 1 merged kernel, no dynamic_update_slice.

    Returns (step, zero_state); step((p_prev, p, strips), c2dt2) -> state'
    with the SAME state pytree structure as make_acoustic3d_strip_step /
    make_acoustic3d_fused_step (strip-resident phi/psi per axis/side), so
    propagators and tests can swap implementations freely.

    Domain-sharded composition (adjoint3d_pallas_sharded): ``y_halo=True``
    makes the step signature ``step(state, c2dt2, halos)`` with halos the
    ppermute-exchanged (H, NZe, NX) neighbor-edge slabs of p, and
    ``y_profiles=((a_lo, b_lo), (a_hi, b_hi))`` overrides the y-face CPML
    profiles with per-device data (zeros on interior devices null the face
    kernels exactly — every term in corr/upd is proportional to a or b).
    ``z_halo`` / ``z_profiles`` are the same mechanism on the z axis (the
    two compose for a 2-axis (y, z) domain decomposition); with z_halo the
    ``halos`` tuple is (hylo, hyhi, hzlo, hzhi) with the z slabs
    (NYe, H, NX).
    """
    from jax import lax as jlax

    from ..cpml import CpmlProfile

    r = grid.radius
    S = grid.pml + r
    W = S + 2 * r
    NY, NZ, NX = grid.padded_shape
    NYe = y_extended(grid, by)
    NZe = z_extended(grid, bz)
    dtype = jnp.float32

    if x_face is None:
        x_face = _os.environ.get("TPUFWI_3D_XFACE", "mxu").lower()
    if fold_z is None:
        # fold_z auto-defaults on only in interpret mode: on hardware the
        # same-session A/B at Overthrust scale measured the in-kernel z
        # faces cost-neutral at best (slab kernels 19.44 ms/step vs
        # folded 19.94 async / 20.68 blocking — the eliminated launches
        # return as in-kernel face compute + DMA on half the blocks).
        # Opt in with TPUFWI_3D_FOLDZ=1; hardware parity is bit-exact
        # either way (scripts/check_foldz_hw.py).
        fz_env = _os.environ.get("TPUFWI_3D_FOLDZ", "")
        fold_z = (can_fold_z(grid, bz)
                  and not (y_halo or z_halo)
                  and (fz_env == "1" or (interpret and fz_env != "0")))
    if fold_y is None:
        # fold_y auto-defaults on only in interpret mode: the compiled
        # fold_y kernel deterministically crashes the relay's AOT
        # compile helper at Overthrust scale (small production grids
        # compile and are bit-exact — scripts/check_foldz_hw.py); opt in
        # on hardware with TPUFWI_3D_FOLDY=1.
        fy_env = _os.environ.get("TPUFWI_3D_FOLDY", "")
        fold_y = (fold_z and can_fold_y(grid, by)
                  and (fy_env == "1" or (interpret and fy_env != "0")))
    if (y_halo or z_halo) and (fold_y or fold_z):
        raise ValueError("halo modes require fold_y=fold_z=False")
    merged = make_leapfrog3d_merged(
        grid, by=by, bz=bz, interpret=interpret,
        dimension_semantics=dimension_semantics,
        vmem_limit_mb=vmem_limit_mb, x_face=x_face, fold_z=fold_z,
        fold_y=fold_y, y_halo=y_halo, z_halo=z_halo,
    )
    corr_y = (None if fold_y else
              {s: make_corr3d_y(grid, s, bz_y, NZe, by, interpret)
               for s in (0, 1)})
    corr_z = (None if fold_z else
              {s: make_corr3d_z(grid, s, by, NYe, interpret)
               for s in (0, 1)})

    profs = []
    for ax in range(3):
        prof = CpmlProfile.build(
            n=grid.shape[ax], pml=grid.pml, radius=grid.radius,
            h=grid.h[ax], dt=dt, c_max=c_max, f0=f0,
            free_lo=(grid.free_surface and ax == 1),
        )
        n_pad = grid.padded_shape[ax]
        if ax == 0:
            shp = (S, 1, 1)
        elif ax == 1:
            shp = (1, S, 1)
        else:
            shp = (1, 1, S)
        lo = (np.asarray(prof.a[:S], dtype).reshape(shp),
              np.asarray(prof.b[:S], dtype).reshape(shp))
        hi = (np.asarray(prof.a[n_pad - S:], dtype).reshape(shp),
              np.asarray(prof.b[n_pad - S:], dtype).reshape(shp))
        profs.append((lo, hi))
    if y_profiles is not None:
        profs[0] = y_profiles
    if z_profiles is not None:
        profs[1] = z_profiles

    NXP = -(-NX // 128) * 128

    def _slab_shape(ax):
        # folded axes carry 128-aligned dead x columns (manual-DMA tiling)
        if ax == 0:
            return (S, NZe, NXP if fold_y else NX)
        if ax == 1:
            return (NYe, S, NXP if fold_z else NX)
        return (NYe, NZe, 4 * S)  # packed x-face state (one stream)

    def zero_state(dtype=jnp.float32):
        z = jnp.zeros((NYe, NZe, NX), dtype)
        strips = tuple(
            tuple(jnp.zeros(_slab_shape(ax), dtype)
                  for _ in range(1 if ax == 2 else 4))
            for ax in range(3)
        )
        return (z, z, strips)

    offs = {0: (0, NY - W), 1: (0, NZ - W)}

    def _slice(f, ax, side):
        return jlax.slice_in_dim(f, offs[ax][side], offs[ax][side] + W,
                                 axis=ax)

    def step(state, c2dt2, halos=(), y_profiles_override=None,
             z_profiles_override=None):
        p_prev, p, strips = state
        profs_eff = list(profs)
        if y_profiles_override is not None:
            # per-device (traced) y/z-face profiles — the domain-sharded
            # composition selects real/zero profiles by device index
            profs_eff[0] = y_profiles_override
        if z_profiles_override is not None:
            profs_eff[1] = z_profiles_override
        uy, uz = [], []
        new_y, new_z = [], []
        axes = []
        if not fold_y:
            axes.append((0, (uy, new_y, corr_y)))
        if not fold_z:
            axes.append((1, (uz, new_z, corr_z)))
        for ax, (ulist, nlist, corr) in axes:
            phi_lo, psi_lo, phi_hi, psi_hi = strips[ax]
            for side in (0, 1):
                phi, psi = (phi_lo, psi_lo) if side == 0 else (phi_hi, psi_hi)
                a, b = profs_eff[ax][side]
                upd, phi2, psi2 = corr[side](
                    _slice(p, ax, side), phi, psi, a, b,
                    _slice(c2dt2, ax, side),
                )
                ulist.append(upd)
                nlist += [phi2, psi2]
        (xst,) = strips[2]
        (ax_lo, bx_lo), (ax_hi, bx_hi) = profs_eff[2]
        if fold_y:
            (ayl, byl), (ayh, byh) = profs_eff[0]
            ygroup = tuple(strips[0]) + (ayl, byl, ayh, byh)
        else:
            ygroup = (uy[0], uy[1])
        if fold_z:
            (azl, bzl), (azh, bzh) = profs_eff[1]
            zgroup = tuple(strips[1]) + (azl, bzl, azh, bzh)
        else:
            zgroup = (uz[0], uz[1])
        res = merged(p_prev, p, c2dt2, xst,
                     ax_lo, bx_lo, ax_hi, bx_hi, ygroup, zgroup,
                     halos=halos)
        p_next, xst2 = res[:2]
        k = 2
        if fold_z:
            new_z = list(res[k : k + 4])
            k += 4
        if fold_y:
            new_y = list(res[k : k + 4])
            k += 4
        new_strips = (
            (new_y[0], new_y[1], new_y[2], new_y[3]),
            (new_z[0], new_z[1], new_z[2], new_z[3]),
            (xst2,),
        )
        return (p, p_next, new_strips)

    return step, zero_state
