"""Fused Pallas CPML strip kernels for the 3D acoustic step (spec C5).

Round-1 measurement: the blocked leapfrog ran at 11.1 Gcu/s but the full
step sank to 3.8-4.6 Gcu/s because the CPML slab algebra ran on XLA —
~10 intermediate slab arrays through HBM plus dynamic_update_slice round
trips per side per step. These kernels fuse each absorbing slab's whole
update (d1/d2 stencils, phi/psi memory recursions, the corr convolution
of phi, and the RMW of p_next) into ONE pallas_call per side:

  * z-axis slabs: per-y-block programs; the z-derivative algebra runs as
    banded MXU left-products per y-row (the slab depth S+2r = 32 rows is
    one band matrix wide).
  * x-axis slabs: per-y-block programs on lane-aligned 128-wide slabs;
    the x-derivative algebra is banded MXU right-products (contraction on
    the lane dim) — no unaligned lane slicing at all.
  * y-axis slabs: per-z-block programs; y is the leading (untiled) dim,
    so derivatives are free static shifts over a zero-margined scratch.

Boundary semantics (zero exterior, r-deep inward coupling region) are
encoded in the band matrices themselves: taps that would read outside the
slab are simply absent, which IS zero-extension. Band matrices are built
with NumPy in the factory and passed as tiny inputs. All MXU products run
at precision=HIGHEST (the f32 MXU default rounds through bf16).

Semantics are pinned against make_acoustic3d_strip_step (the XLA strip
path) in tests/test_acoustic3d_pallas.py. Spec: BASELINE.json:11 (C5),
:5 (P2 fused-stencil design). fp32.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_util import bspec

from ..grid import D1_COEFFS, D2_COEFFS, Grid

HIGHEST = jax.lax.Precision.HIGHEST


def _band(taps_list, n_out, n_in, offsets, r):
    """Stacked band matrix (len(taps_list)*n_out, n_in):
    block b row i, col m = taps_list[b][m - offsets[b] - i + r] when the
    tap index is in range — absent taps encode zero-extension."""
    nb = len(taps_list)
    K = np.zeros((nb * n_out, n_in), np.float32)
    for b, taps in enumerate(taps_list):
        for i in range(n_out):
            for k in range(len(taps)):
                m = offsets[b] + i + k - r
                if 0 <= m < n_in:
                    K[b * n_out + i, m] = taps[k]
    return K


def _taps_axis(grid: Grid, ax: int):
    d1 = tuple(float(c) / grid.h[ax] for c in D1_COEFFS[grid.order])
    d2 = tuple(float(c) / grid.h[ax] ** 2 for c in D2_COEFFS[grid.order])
    return d1, d2


def make_strip3d_z(grid: Grid, side: int, by: int, NYe: int, NZe: int,
                   interpret: bool = False):
    """z-axis CPML slab kernel (side 0 = low, 1 = high).

    call(p_slab, pn_slab, phi, psi, a, b, c2_slab, Kz12, Kc)
      -> (pn_slab', phi', psi')   [pn_slab/phi/psi aliased]

    Slabs are (NYe, W, NX) with W = S+2r (pre-sliced by the caller: rows
    [0, W) for low, [NZ-W, NZ) for high); phi/psi are (NYe, S, NX); a/b
    are (1, S, 1) profile slabs; the p_next RMW covers the strip plus its
    r-deep inward margin.
    """
    r = grid.radius
    S = grid.pml + r
    W = S + 2 * r
    NX = grid.padded_shape[2]
    BY = by
    nyb = NYe // BY
    C0 = 0 if side == 0 else W - S  # strip start within the slab
    E0 = 0 if side == 0 else r  # correction-region start within the slab
    dtype = jnp.float32

    def kernel(p_ref, pn_ref, phi_ref, psi_ref, a_ref, b_ref, c2_ref,
               k12_ref, kc_ref, pn_o, phi_o, psi_o):
        # all BY y-rows in ONE block-diagonal MXU product each (sequential
        # per-row dots were MXU-latency-bound): K12 is (BY*2S, BY*W)
        # block-diagonal, operating on the (BY*W, NX) leading-dim-merged
        # slab; Kc likewise (BY*(S+r), BY*S) on the merged phi.
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
        pn_o[:, E0 : E0 + S + r, :] = (
            pn_ref[:, E0 : E0 + S + r, :]
            + c2_ref[:, E0 : E0 + S + r, :] * corr
        )
        pn_o[:, C0 : C0 + S, :] = (
            pn_o[:, C0 : C0 + S, :] + c2_ref[:, C0 : C0 + S, :] * ps
        )

    vspec = bspec(memory_space=pltpu.VMEM)
    blkW = bspec((BY, W, NX), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    blkS = bspec((BY, S, NX), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(nyb,),
        in_specs=[blkW, blkW, blkS, blkS, vspec, vspec, blkW, vspec, vspec],
        out_specs=(blkW, blkS, blkS),
        out_shape=(
            jax.ShapeDtypeStruct((NYe, W, NX), dtype),
            jax.ShapeDtypeStruct((NYe, S, NX), dtype),
            jax.ShapeDtypeStruct((NYe, S, NX), dtype),
        ),
        input_output_aliases={1: 0, 2: 1, 3: 2},
        compiler_params=None
        if interpret
        else pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )


def make_strip3d_x(grid: Grid, side: int, by: int, NYe: int, NZe: int,
                   interpret: bool = False):
    """x-axis CPML slab kernel on a lane-aligned 128-wide slab.

    call(p_slab, pn_slab, phi, psi, a, b, c2_slab, Kz12T, KcT)
      -> (pn_slab', phi', psi')

    Slabs are (NYe, NZe, 128) (cols [0,128) low / [NX-128, NX) high);
    phi/psi (NYe, NZe, S); a/b (1, 1, S). Derivatives are banded MXU
    right-products contracting the lane dim.
    """
    r = grid.radius
    S = grid.pml + r
    NX = grid.padded_shape[2]
    WL = NX if NX < 128 else 128  # full-dim blocks are lane-rule exempt
    BY = by
    nyb = NYe // BY
    C0 = 0 if side == 0 else WL - S
    E0 = 0 if side == 0 else WL - S - r
    dtype = jnp.float32

    def kernel(p_ref, pn_ref, phi_ref, psi_ref, a_ref, b_ref, c2_ref,
               k12_ref, kc_ref, pn_o, phi_o, psi_o):
        a = a_ref[0]  # (1, S)
        b = b_ref[0]
        d12 = jax.lax.dot_general(
            p_ref[:], k12_ref[:], (((2,), (1,)), ((), ())),
            preferred_element_type=dtype, precision=HIGHEST,
        )  # (BY, NZe, 2S)
        d1p, d2p = d12[..., :S], d12[..., S:]
        ph = b * phi_ref[:] + a * d1p
        phi_o[:] = ph
        corr = jax.lax.dot_general(
            ph, kc_ref[:], (((2,), (1,)), ((), ())),
            preferred_element_type=dtype, precision=HIGHEST,
        )  # (BY, NZe, S+r)
        v = d2p + corr[..., C0 - E0 : C0 - E0 + S]
        ps = b * psi_ref[:] + a * v
        psi_o[:] = ps
        pn_o[:, :, E0 : E0 + S + r] = (
            pn_ref[:, :, E0 : E0 + S + r]
            + c2_ref[:, :, E0 : E0 + S + r] * corr
        )
        pn_o[:, :, C0 : C0 + S] = (
            pn_o[:, :, C0 : C0 + S] + c2_ref[:, :, C0 : C0 + S] * ps
        )

    vspec = bspec(memory_space=pltpu.VMEM)
    blkW = bspec((BY, NZe, WL), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    blkS = bspec((BY, NZe, S), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(nyb,),
        in_specs=[blkW, blkW, blkS, blkS, vspec, vspec, blkW, vspec, vspec],
        out_specs=(blkW, blkS, blkS),
        out_shape=(
            jax.ShapeDtypeStruct((NYe, NZe, WL), dtype),
            jax.ShapeDtypeStruct((NYe, NZe, S), dtype),
            jax.ShapeDtypeStruct((NYe, NZe, S), dtype),
        ),
        input_output_aliases={1: 0, 2: 1, 3: 2},
        compiler_params=None
        if interpret
        else pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )


def make_strip3d_y(grid: Grid, side: int, bz: int, NZe: int,
                   interpret: bool = False):
    """y-axis CPML slab kernel; y is the leading dim so derivatives are
    free static shifts over a zero-margined scratch.

    call(p_slab, pn_slab, phi, psi, a, b, c2_slab)
      -> (pn_slab', phi', psi')

    Slabs are (W, NZe, NX) with W = S+2r (rows [0,W) low / [NY-W, NY)
    high); phi/psi (S, NZe, NX); a/b (S, 1, 1). ``bz`` here is this
    kernel's own z-chunk: the windows are (W, bz, NX) and double-buffered,
    and the body holds several (S, bz, NX) live values, so bz must be
    small (16 fits the 128 MB VMEM at Overthrust widths; the leapfrog's
    z-split block size is independent).
    """
    r = grid.radius
    S = grid.pml + r
    W = S + 2 * r
    NX = grid.padded_shape[2]
    BZ = bz
    nzb = NZe // BZ
    C0 = 0 if side == 0 else W - S
    E0 = 0 if side == 0 else r
    d1, d2 = _taps_axis(grid, 0)
    dtype = jnp.float32

    def kernel(p_ref, pn_ref, phi_ref, psi_ref, a_ref, b_ref, c2_ref,
               pn_o, phi_o, psi_o, scr):
        # zero-margined copy of the slab: scr rows [r, r+W)
        scr[0:r] = jnp.zeros((r, BZ, NX), dtype)
        scr[r : r + W] = p_ref[:]
        scr[r + W : W + 2 * r] = jnp.zeros((r, BZ, NX), dtype)

        def shift_sum(taps, row0, nrows, base):
            # slab row m sits at scr row m + r (the zero margin)
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
        # corr over the correction region [E0, E0+S+r) from ph (zero
        # extension outside the strip): reuse scr rows as a ph buffer
        scr[0 : C0 + r] = jnp.zeros((C0 + r, BZ, NX), dtype)
        scr[C0 + r : C0 + r + S] = ph
        scr[C0 + r + S :] = jnp.zeros((W + 2 * r - C0 - r - S, BZ, NX), dtype)
        corr = shift_sum(d1, E0, S + r, scr)
        v = d2p + corr[C0 - E0 : C0 - E0 + S]
        ps = b * psi_ref[:] + a * v
        psi_o[:] = ps
        pn_o[E0 : E0 + S + r] = (
            pn_ref[E0 : E0 + S + r] + c2_ref[E0 : E0 + S + r] * corr
        )
        pn_o[C0 : C0 + S] = pn_o[C0 : C0 + S] + c2_ref[C0 : C0 + S] * ps

    vspec = bspec(memory_space=pltpu.VMEM)
    blkW = bspec((W, BZ, NX), lambda i: (0, i, 0),
                        memory_space=pltpu.VMEM)
    blkS = bspec((S, BZ, NX), lambda i: (0, i, 0),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(nzb,),
        in_specs=[blkW, blkW, blkS, blkS, vspec, vspec, blkW],
        out_specs=(blkW, blkS, blkS),
        out_shape=(
            jax.ShapeDtypeStruct((W, NZe, NX), dtype),
            jax.ShapeDtypeStruct((S, NZe, NX), dtype),
            jax.ShapeDtypeStruct((S, NZe, NX), dtype),
        ),
        input_output_aliases={1: 0, 2: 1, 3: 2},
        scratch_shapes=[pltpu.VMEM((W + 2 * r, BZ, NX), dtype)],
        compiler_params=None
        if interpret
        else pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )


def make_acoustic3d_fused_step(grid: Grid, dt: float, f0: float,
                               c_max: float, by: int = 8, bz: int = 64,
                               interpret: bool = False):
    """Production fused 3D step: z-split blocked interior leapfrog plus six
    single-call CPML slab kernels (one per absorbing face), all RMW-ing
    p_next in place through buffer aliasing. State layout matches
    make_acoustic3d_strip_step (strip-resident memory variables), fields on
    the (y_extended, z_extended, NX) layout of extend_yz.

    Returns (step, zero_state). step((p_prev, p, strips), c2dt2) -> state'.
    """
    from jax import lax as jlax

    from ..cpml import CpmlProfile
    from .acoustic3d_pallas import (
        make_leapfrog3d_zsplit,
        y_extended,
        z_extended,
    )

    r = grid.radius
    S = grid.pml + r
    W = S + 2 * r
    NY, NZ, NX = grid.padded_shape
    NYe = y_extended(grid, by)
    NZe = z_extended(grid, bz)
    shape_e = (NYe, NZe, NX)
    dtype = jnp.float32

    leap3d = make_leapfrog3d_zsplit(grid, by=by, bz=bz, interpret=interpret)

    # profile slabs per axis/side, shaped to broadcast inside the kernels
    profs = []
    for ax in range(3):
        prof = CpmlProfile.build(
            n=grid.shape[ax], pml=grid.pml, radius=grid.radius,
            h=grid.h[ax], dt=dt, c_max=c_max, f0=f0,
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

    # band matrices (NumPy constants -> device inputs)
    d1z, d2z = _taps_axis(grid, 1)
    d1x, d2x = _taps_axis(grid, 2)
    bands = {}
    WLX = NX if NX < 128 else 128
    for ax, (d1, d2) in ((1, (d1z, d2z)), (2, (d1x, d2x))):
        WL = W if ax == 1 else WLX
        for side in (0, 1):
            C0 = 0 if side == 0 else WL - S
            E0 = (0 if side == 0 else r) if ax == 1 else (
                0 if side == 0 else WL - S - r
            )
            k12 = _band([d1, d2], S, WL, [C0, C0], r)
            # corr: input is ph (S rows at strip offset 0 in its own
            # buffer); output over the S+r correction region whose origin
            # is E0; ph row m sits at absolute C0+m
            kc = np.zeros((S + r, S), np.float32)
            for i in range(S + r):
                for k in range(len(d1)):
                    m = (E0 + i + k - r) - C0
                    if 0 <= m < S:
                        kc[i, m] = d1[k]
            if ax == 1:
                # z-slab kernel batches all BY y-rows in one product:
                # block-diagonal bands over the leading-dim-merged slab
                eye = np.eye(by, dtype=np.float32)
                k12 = np.kron(eye, k12)
                kc = np.kron(eye, kc)
            bands[(ax, side)] = (np.asarray(k12), np.asarray(kc))

    bz_y = min(16, bz)  # y-slab kernel's own z-chunk (VMEM budget)
    calls = {}
    for side in (0, 1):
        calls[(0, side)] = make_strip3d_y(grid, side, bz_y, NZe, interpret)
        calls[(1, side)] = make_strip3d_z(grid, side, by, NYe, NZe, interpret)
        calls[(2, side)] = make_strip3d_x(grid, side, by, NYe, NZe, interpret)

    def _slab_shape(ax):
        if ax == 0:
            return (S, NZe, NX)
        if ax == 1:
            return (NYe, S, NX)
        return (NYe, NZe, S)

    def zero_state(dtype=jnp.float32):
        z = jnp.zeros(shape_e, dtype)
        strips = tuple(
            tuple(jnp.zeros(_slab_shape(ax), dtype) for _ in range(4))
            for ax in range(3)
        )
        return (z, z, strips)

    # slab element offsets (lo, hi) per axis on the extended arrays
    offs = {0: (0, NY - W), 1: (0, NZ - W), 2: (0, NX - WLX)}
    widths = {0: W, 1: W, 2: WLX}

    def _slice(f, ax, side):
        return jlax.slice_in_dim(f, offs[ax][side], offs[ax][side] + widths[ax],
                                 axis=ax)

    def _update(f, seg, ax, side):
        idx = [0, 0, 0]
        idx[ax] = offs[ax][side]
        return jlax.dynamic_update_slice(f, seg, tuple(idx))

    def step(state, c2dt2):
        p_prev, p, strips = state
        p_next = leap3d(p_prev, p, c2dt2)
        new_strips = []
        for ax in range(3):
            phi_lo, psi_lo, phi_hi, psi_hi = strips[ax]
            out4 = []
            for side in (0, 1):
                phi, psi = (phi_lo, psi_lo) if side == 0 else (phi_hi, psi_hi)
                a, b = profs[ax][side]
                p_slab = _slice(p, ax, side)
                pn_slab = _slice(p_next, ax, side)
                c2_slab = _slice(c2dt2, ax, side)
                if ax == 0:
                    pn_slab, phi, psi = calls[(0, side)](
                        p_slab, pn_slab, phi, psi, a, b, c2_slab
                    )
                else:
                    k12, kc = bands[(ax, side)]
                    pn_slab, phi, psi = calls[(ax, side)](
                        p_slab, pn_slab, phi, psi, a, b, c2_slab, k12, kc
                    )
                p_next = _update(p_next, pn_slab, ax, side)
                out4 += [phi, psi]
            new_strips.append((out4[0], out4[1], out4[2], out4[3]))
        return (p, p_next, tuple(new_strips))

    return step, zero_state
