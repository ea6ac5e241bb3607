"""Grid-blocked Pallas kernel for the 3D acoustic leapfrog stencil
(SURVEY.md §2 `kernels/acoustic3d_pallas.py`, spec C5).

Design: 3D wavefields do not fit VMEM, so the kernel runs on a 1-D grid of
y-slabs (grid=(n_blocks,)). Each program receives its (BY, NZ, NX) block
plus two width-`radius` halo slabs — the halos are materialized OUTSIDE the
kernel by cheap XLA block-shifts (~1% extra HBM traffic), which makes every
block self-contained: the same decomposition works under `shard_map` domain
sharding (the halo build then rides the ppermute exchange). y is the
leading (non-tiled) dimension, so y-shifts cost no relayout; z rides
sublanes, x rides lanes behind an aligned scratch border, exactly like the
2D kernel.

CPML strip corrections are applied at the XLA level on the thin absorbing
slabs after the kernel (they are strip-local and additive; the interior
update — all the bandwidth — stays in the fused kernel). The step
composes as:

    p_next = pallas_leapfrog3d(p_prev, p, c2)          # this module
    p_next += c2 * cpml_corrections(p, state_strips)   # propagator, XLA

fp32, forward modeling; gradients run on the jnp engine (adjoint.py), which
is dimension-agnostic.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_util import bspec

from ..grid import D2_COEFFS, Grid


def y_extended(grid: Grid, by: int = 8) -> int:
    """NY rounded up to the y-block size. The extension planes carry c2 = 0
    and zero fields, so they stay identically zero (an extra ghost zone —
    p_next = 2p - p_prev there) and never pollute the halos."""
    NY = grid.padded_shape[0]
    return -(-NY // by) * by


def x_extended(grid: Grid, xs: int = 1, lane: int = 128) -> int:
    """NX rounded up so each of the xs block columns is a lane multiple
    (Pallas requires last-dim blocks % 128). Extension columns carry
    c2 = 0 and zero fields — an extra ghost zone, like y_extended."""
    NX = grid.padded_shape[2]
    if xs == 1:
        return NX  # full-dimension block: Pallas exempts it from lane rules
    bx = -(-NX // (lane * xs)) * lane
    return bx * xs


def extend_y(x, grid: Grid, by: int = 8, xs: int = 1):
    """Zero-pad dim 0 to y_extended and dim 2 to x_extended."""
    NYe = y_extended(grid, by)
    NXe = x_extended(grid, xs)
    NY = grid.padded_shape[0]
    NX = grid.padded_shape[2]
    if NYe == NY and NXe == NX:
        return x
    return jnp.pad(x, ((0, NYe - NY), (0, 0), (0, NXe - NX)))


def crop_y(x, grid: Grid):
    return x[: grid.padded_shape[0], :, : grid.padded_shape[2]]


def make_leapfrog3d_kernel(grid: Grid, by: int = 8, xs: int = 1,
                           interpret: bool = False):
    """Build ``leap3d(p_prev, p, c2) -> p_next`` on y-extended
    (y_extended(grid, by), NZ, NX) arrays:
    p_next = 2 p - p_prev + c2 * Lap3d(p), zero Dirichlet borders.
    The caller supplies zero-extended fields and a zero-extended c2
    (see y_extended/extend_y).

    ``xs`` splits the x extent into that many block columns (2-D block
    grid): the axis-aligned Laplacian needs no corner halos, so each
    program reads its (by, NZ, NX/xs) block plus y-halo slabs and x-halo
    strips. Larger by amortizes the y-halo re-reads; xs keeps the VMEM
    footprint under the 128 MB physical budget at production widths.
    """
    if grid.ndim != 3:
        raise ValueError("3D kernel needs a 3D grid")
    _, NZ, _ = grid.padded_shape
    NY = y_extended(grid, by)
    NX = x_extended(grid, xs)
    r = grid.radius
    BY = by
    if BY < grid.radius:
        raise ValueError(f"y-block {BY} must be >= radius {grid.radius}")
    BX = NX // xs
    n_blocks = NY // BY
    d2y = tuple(float(c) / grid.h[0] ** 2 for c in D2_COEFFS[grid.order])
    d2z = tuple(float(c) / grid.h[1] ** 2 for c in D2_COEFFS[grid.order])
    d2x = tuple(float(c) / grid.h[2] ** 2 for c in D2_COEFFS[grid.order])
    PZ, PX = 8, 128
    dtype = jnp.float32

    def kernel(p_prev_ref, p_ref, ylo_ref, yhi_ref, xlo_ref, xhi_ref,
               c2_ref, out_ref, scr_ref):
        # scratch slab (BY+2r, NZ+2PZ, BX+2PX): zero the frames actually
        # read, fill the centre with the block and the margins with halos
        zrow = jnp.zeros((BY + 2 * r, r, BX + 2 * PX), dtype)
        scr_ref[:, PZ - r : PZ, :] = zrow
        scr_ref[:, PZ + NZ : PZ + NZ + r, :] = zrow
        zcol = jnp.zeros((BY + 2 * r, NZ + 2 * PZ, r), dtype)
        scr_ref[:, :, PX - r : PX] = zcol
        scr_ref[:, :, PX + BX : PX + BX + r] = zcol
        scr_ref[0:r, PZ : PZ + NZ, PX : PX + BX] = ylo_ref[:]
        scr_ref[r : r + BY, PZ : PZ + NZ, PX : PX + BX] = p_ref[:]
        scr_ref[r + BY : 2 * r + BY, PZ : PZ + NZ, PX : PX + BX] = yhi_ref[:]
        if xs > 1:
            # x halos come from the neighbour blocks (clamped index maps;
            # Mosaic cannot load at dynamic non-128-multiple lane offsets,
            # so the whole neighbour block is read and its edge sliced
            # statically). Outer columns keep zero halos via pl.when.
            j = pl.program_id(1)
            zedge = jnp.zeros((BY, NZ, r), dtype)
            scr_ref[r : r + BY, PZ : PZ + NZ, PX - r : PX] = zedge
            scr_ref[r : r + BY, PZ : PZ + NZ, PX + BX : PX + BX + r] = zedge

            @pl.when(j > 0)
            def _():
                scr_ref[r : r + BY, PZ : PZ + NZ, PX - r : PX] = xlo_ref[
                    :, :, BX - r : BX
                ]

            @pl.when(j < xs - 1)
            def _():
                scr_ref[r : r + BY, PZ : PZ + NZ, PX + BX : PX + BX + r] = xhi_ref[
                    :, :, 0:r
                ]

        lap = None
        for k, c in enumerate(d2y):
            if c == 0.0:
                continue
            t = c * scr_ref[k : k + BY, PZ : PZ + NZ, PX : PX + BX]
            lap = t if lap is None else lap + t
        for k, c in enumerate(d2z):
            if c == 0.0:
                continue
            z0 = PZ + k - r
            lap = lap + c * scr_ref[r : r + BY, z0 : z0 + NZ, PX : PX + BX]
        for k, c in enumerate(d2x):
            if c == 0.0:
                continue
            x0 = PX + k - r
            lap = lap + c * scr_ref[r : r + BY, PZ : PZ + NZ, x0 : x0 + BX]
        out_ref[:] = 2.0 * p_ref[:] - p_prev_ref[:] + c2_ref[:] * lap

    blk = lambda: bspec(
        (BY, NZ, BX), lambda i, j: (i, 0, j), memory_space=pltpu.VMEM
    )
    yhalo = lambda: bspec(
        (r, NZ, BX), lambda i, j: (i, 0, j), memory_space=pltpu.VMEM
    )
    # neighbour blocks with clamped column index (edges read themselves;
    # the kernel masks those out)
    xprev = lambda: bspec(
        (BY, NZ, BX),
        lambda i, j: (i, 0, jnp.maximum(j - 1, 0)),
        memory_space=pltpu.VMEM,
    )
    xnext = lambda: bspec(
        (BY, NZ, BX),
        lambda i, j: (i, 0, jnp.minimum(j + 1, xs - 1)),
        memory_space=pltpu.VMEM,
    )
    call = pl.pallas_call(
        kernel,
        grid=(n_blocks, xs),
        out_shape=jax.ShapeDtypeStruct((NY, NZ, NX), dtype),
        in_specs=[blk(), blk(), yhalo(), yhalo(), xprev(), xnext(), blk()],
        out_specs=blk(),
        scratch_shapes=[pltpu.VMEM((BY + 2 * r, NZ + 2 * PZ, BX + 2 * PX), dtype)],
        input_output_aliases={0: 0},
        compiler_params=None
        if interpret
        else pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )

    def leap3d(p_prev, p, c2):
        # y-halo slabs per y-block: lo[i] = last r planes of block i-1
        # (zeros for i=0), hi[i] = first r planes of block i+1
        pb = p.reshape(n_blocks, BY, NZ, NX)
        zero = jnp.zeros((1, r, NZ, NX), p.dtype)
        ylo = jnp.concatenate([zero, pb[:-1, BY - r :]], axis=0)
        yhi = jnp.concatenate([pb[1:, :r], zero], axis=0)
        ylo = ylo.reshape(n_blocks * r, NZ, NX)
        yhi = yhi.reshape(n_blocks * r, NZ, NX)
        # x halos are read as neighbour blocks of p itself
        return call(p_prev, p, ylo, yhi, p, p, c2)

    return leap3d


def z_extended(grid: Grid, bz: int) -> int:
    """NZ rounded up to the z-block size (ghost rows carry c2 = 0)."""
    NZ = grid.padded_shape[1]
    return -(-NZ // bz) * bz


def extend_yz(x, grid: Grid, by: int = 8, bz: int = 64):
    """Zero-pad dim 0 to y_extended and dim 1 to z_extended."""
    NYe = y_extended(grid, by)
    NZe = z_extended(grid, bz)
    NY, NZ = grid.padded_shape[0], grid.padded_shape[1]
    if NYe == NY and NZe == NZ:
        return x
    return jnp.pad(x, ((0, NYe - NY), (0, NZe - NZ), (0, 0)))


def crop_yz(x, grid: Grid):
    return x[: grid.padded_shape[0], : grid.padded_shape[1], :]


def make_leapfrog3d_zsplit(grid: Grid, by: int = 16, bz: int = 64,
                           interpret: bool = False):
    """z-split blocked 3D leapfrog: ``leap3d(p_prev, p, c2) -> p_next`` on
    (y_extended, z_extended, NX) arrays.

    Replaces the x-split variant's whole-neighbour-block x-halo reads
    (the 3x read tax, BASELINE round 1) with 8-packed halo SLABS READ
    DIRECTLY FROM ``p`` via extra block specs whose index maps address
    8-row sub-blocks of the neighbouring blocks (y is the untiled leading
    dim, z's 8-row granularity matches the sublane tile) — no XLA-side
    halo materialization at all (which measured as ~2.5 extra fields of
    HBM traffic per step in the materialized variant). Edge blocks clamp
    the index map and zero the margin with pl.when. Extra HBM read =
    2*8/by (y) + 2*8/bz (z) of one field.
    """
    if grid.ndim != 3:
        raise ValueError("3D kernel needs a 3D grid")
    if bz % 8 != 0 or by % 8 != 0:
        raise ValueError("by and bz must be multiples of 8")
    NY = y_extended(grid, by)
    NZ = z_extended(grid, bz)
    NX = grid.padded_shape[2]
    r = grid.radius
    BY, BZ = by, bz
    nyb, nzb = NY // BY, NZ // BZ
    YB8, ZB8 = BY // 8, BZ // 8  # block sizes in 8-row units
    d2y = tuple(float(c) / grid.h[0] ** 2 for c in D2_COEFFS[grid.order])
    d2z = tuple(float(c) / grid.h[1] ** 2 for c in D2_COEFFS[grid.order])
    d2x = tuple(float(c) / grid.h[2] ** 2 for c in D2_COEFFS[grid.order])
    PX = 128
    H = 8  # packed halo slab depth (r=4 live rows inside)
    dtype = jnp.float32

    def kernel(p_prev_ref, p_ref, ylo_ref, yhi_ref, zlo_ref, zhi_ref,
               c2_ref, out_ref, scr_ref):
        i = pl.program_id(0)
        j = pl.program_id(1)
        # scratch (BY+2r, BZ+2H, NX+2PX): zero x frame; halo margins from
        # the packed slabs (live rows are the r nearest the block)
        zcol = jnp.zeros((BY + 2 * r, BZ + 2 * H, r), dtype)
        scr_ref[:, :, PX - r : PX] = zcol
        scr_ref[:, :, PX + NX : PX + NX + r] = zcol
        scr_ref[r : r + BY, H : H + BZ, PX : PX + NX] = p_ref[:]

        zy = jnp.zeros((r, BZ, NX), dtype)
        scr_ref[0:r, H : H + BZ, PX : PX + NX] = zy
        scr_ref[r + BY : 2 * r + BY, H : H + BZ, PX : PX + NX] = zy

        @pl.when(i > 0)
        def _():
            scr_ref[0:r, H : H + BZ, PX : PX + NX] = ylo_ref[H - r : H]

        @pl.when(i < nyb - 1)
        def _():
            scr_ref[r + BY : 2 * r + BY, H : H + BZ, PX : PX + NX] = (
                yhi_ref[0:r]
            )

        zz = jnp.zeros((BY, H, NX), dtype)
        scr_ref[r : r + BY, 0:H, PX : PX + NX] = zz
        scr_ref[r : r + BY, H + BZ : H + BZ + H, PX : PX + NX] = zz

        @pl.when(j > 0)
        def _():
            scr_ref[r : r + BY, 0:H, PX : PX + NX] = zlo_ref[:]

        @pl.when(j < nzb - 1)
        def _():
            scr_ref[r : r + BY, H + BZ : H + BZ + H, PX : PX + NX] = zhi_ref[:]

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
        out_ref[:] = 2.0 * p_ref[:] - p_prev_ref[:] + c2_ref[:] * lap

    blk = bspec((BY, BZ, NX), lambda i, j: (i, j, 0),
                       memory_space=pltpu.VMEM)
    # packed halo slabs addressed in 8-row block units of p itself;
    # clamped at the edges (the kernel zeroes those margins instead)
    ylo = bspec(
        (H, BZ, NX),
        lambda i, j: (jnp.maximum(i * YB8 - 1, 0), j, 0),
        memory_space=pltpu.VMEM,
    )
    yhi = bspec(
        (H, BZ, NX),
        lambda i, j: (jnp.minimum((i + 1) * YB8, nyb * YB8 - 1), j, 0),
        memory_space=pltpu.VMEM,
    )
    zlo = bspec(
        (BY, H, NX),
        lambda i, j: (i, jnp.maximum(j * ZB8 - 1, 0), 0),
        memory_space=pltpu.VMEM,
    )
    zhi = bspec(
        (BY, H, NX),
        lambda i, j: (i, jnp.minimum((j + 1) * ZB8, nzb * ZB8 - 1), 0),
        memory_space=pltpu.VMEM,
    )
    call = pl.pallas_call(
        kernel,
        grid=(nyb, nzb),
        out_shape=jax.ShapeDtypeStruct((NY, NZ, NX), dtype),
        in_specs=[blk, blk, ylo, yhi, zlo, zhi, blk],
        out_specs=blk,
        scratch_shapes=[
            pltpu.VMEM((BY + 2 * r, BZ + 2 * H, NX + 2 * PX), dtype)
        ],
        input_output_aliases={0: 0},
        compiler_params=None
        if interpret
        else pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )

    def leap3d(p_prev, p, c2):
        return call(p_prev, p, p, p, p, p, c2)

    return leap3d


def make_acoustic3d_step(grid: Grid, dt: float, f0: float, c_max: float,
                         by: int = 8, interpret: bool = False):
    """Full fused-interior 3D step with XLA-level CPML strip corrections.

    Returns (step, zero_state) with
    step((p_prev, p, phi(3), psi(3)), c2dt2, profiles) -> new state tuple,
    semantics identical to the dim-agnostic jnp step (acoustic2d_jnp.py) —
    parity tested in tests/test_acoustic3d_pallas.py. phi/psi are kept as
    full arrays here for simplicity (they are zero outside the strips; the
    strip-resident variant follows the 2D kernel's pattern in a later
    round).
    """
    from .stencils import apply_stencil, scaled_taps
    from ..grid import D1_COEFFS

    leap3d = make_leapfrog3d_kernel(grid, by=by, interpret=interpret)

    d1 = [scaled_taps(D1_COEFFS[grid.order], h, 1) for h in grid.h]
    d2 = [scaled_taps(D2_COEFFS[grid.order], h, 2) for h in grid.h]
    NYe = y_extended(grid, by)

    def _extend_prof(p3):
        # y-axis profile (NY,1,1): zero-extend (a=b=0 on the ghost planes)
        if p3.shape[0] == grid.padded_shape[0] and p3.shape[0] != NYe:
            return jnp.pad(p3, ((0, NYe - p3.shape[0]), (0, 0), (0, 0)))
        return p3

    def step(state, c2dt2, a3, b3):
        """State/c2dt2 on the y-extended layout (extend_y); a3/b3 per-axis
        broadcastable CPML profile arrays on the natural grid (the y
        profile is zero-extended internally)."""
        a3 = tuple(_extend_prof(a) for a in a3)
        b3 = tuple(_extend_prof(b) for b in b3)
        p_prev, p, phi, psi = state
        p_next = leap3d(p_prev, p, c2dt2)
        # CPML corrections (zero in the interior; XLA keeps them strip-local
        # through the a/b masks)
        phi_new, psi_new = [], []
        corr = None
        for ax in range(3):
            a, b = a3[ax], b3[ax]
            ph = b * phi[ax] + a * apply_stencil(p, d1[ax], ax)
            v_corr = apply_stencil(ph, d1[ax], ax)
            ps = b * psi[ax] + a * (apply_stencil(p, d2[ax], ax) + v_corr)
            term = v_corr + ps
            corr = term if corr is None else corr + term
            phi_new.append(ph)
            psi_new.append(ps)
        p_next = p_next + c2dt2 * corr
        return (p, p_next, tuple(phi_new), tuple(psi_new))

    return step


def make_acoustic3d_strip_step(grid: Grid, dt: float, f0: float, c_max: float,
                               by: int = 8, xs: int = 1, interpret: bool = False):
    """Production 3D step: blocked-Pallas interior leapfrog + CPML memory
    variables resident ONLY on the six absorbing slabs (depth pml+radius),
    mirroring the 2D strip design. Full-grid phi/psi would add six 3D
    arrays of HBM churn per step — measured 1.4 Gcu/s at Overthrust scale
    vs the strip version's slab-local slice algebra.

    Returns (step, zero_state_fn). State = (p_prev, p, strips) with strips
    a tuple of (phi_lo, psi_lo, phi_hi, psi_hi) triples per axis; all field
    arrays on the y-extended layout (extend_y). Semantics identical to the
    jnp twin — tests/test_acoustic3d_pallas.py.
    """
    from jax import lax as jlax

    from ..cpml import CpmlProfile

    leap3d = make_leapfrog3d_kernel(grid, by=by, xs=xs, interpret=interpret)
    NYe = y_extended(grid, by)
    shape_e = (NYe, grid.padded_shape[1], x_extended(grid, xs))
    r = grid.radius
    S = grid.pml + r
    from .stencils import apply_stencil, scaled_taps
    from ..grid import D1_COEFFS

    d1 = [scaled_taps(D1_COEFFS[grid.order], h, 1) for h in grid.h]
    d2 = [scaled_taps(D2_COEFFS[grid.order], h, 2) for h in grid.h]

    # per-axis strip profile slices (a, b) as broadcastable slab arrays
    profs = []
    for ax in range(3):
        prof = CpmlProfile.build(
            n=grid.shape[ax], pml=grid.pml, radius=grid.radius,
            h=grid.h[ax], dt=dt, c_max=c_max, f0=f0,
        )
        n_pad = grid.padded_shape[ax]
        shp = [1, 1, 1]
        shp[ax] = S
        lo = (np.asarray(prof.a[:S], jnp.float32).reshape(shp),
              np.asarray(prof.b[:S], jnp.float32).reshape(shp))
        hi = (np.asarray(prof.a[n_pad - S:], jnp.float32).reshape(shp),
              np.asarray(prof.b[n_pad - S:], jnp.float32).reshape(shp))
        profs.append((lo, hi))

    def _slab_shape(ax):
        shp = list(shape_e)
        shp[ax] = S
        return tuple(shp)

    def zero_state(dtype=jnp.float32):
        z = jnp.zeros(shape_e, dtype)
        strips = tuple(
            (jnp.zeros(_slab_shape(ax), dtype), jnp.zeros(_slab_shape(ax), dtype),
             jnp.zeros(_slab_shape(ax), dtype), jnp.zeros(_slab_shape(ax), dtype))
            for ax in range(3)
        )
        return (z, z, strips)

    n_ax = [grid.padded_shape[0], grid.padded_shape[1], grid.padded_shape[2]]

    def step(state, c2dt2):
        p_prev, p, strips = state
        p_next = leap3d(p_prev, p, c2dt2)
        new_strips = []
        for ax in range(3):
            phi_lo, psi_lo, phi_hi, psi_hi = strips[ax]
            out_pair = []
            for side in (0, 1):
                a, b = profs[ax][side]
                phi_s, psi_s = (phi_lo, psi_lo) if side == 0 else (phi_hi, psi_hi)
                # p slice of depth S+r covering the slab plus its inward
                # margin (stencils on slab cells only read inside it)
                if side == 0:
                    pseg = jlax.slice_in_dim(p, 0, S + r, axis=ax)
                else:
                    pseg = jlax.slice_in_dim(p, n_ax[ax] - S - r, n_ax[ax], axis=ax)
                d1p = apply_stencil(pseg, d1[ax], ax)
                d2p = apply_stencil(pseg, d2[ax], ax)
                # keep the slab part (the inner-margin rows of the segment
                # stencil are polluted by the segment's artificial edge)
                if side == 0:
                    d1p = jlax.slice_in_dim(d1p, 0, S, axis=ax)
                    d2p = jlax.slice_in_dim(d2p, 0, S, axis=ax)
                else:
                    d1p = jlax.slice_in_dim(d1p, r, S + r, axis=ax)
                    d2p = jlax.slice_in_dim(d2p, r, S + r, axis=ax)
                ph = b * phi_s + a * d1p
                # extended correction region: slab + r cells inward
                pad_cfg = [(0, 0)] * 3
                pad_cfg[ax] = (0, r) if side == 0 else (r, 0)
                ph_ext = jnp.pad(ph, pad_cfg)
                corr_ext = apply_stencil(ph_ext, d1[ax], ax)
                if side == 0:
                    v = d2p + jlax.slice_in_dim(corr_ext, 0, S, axis=ax)
                else:
                    v = d2p + jlax.slice_in_dim(corr_ext, r, S + r, axis=ax)
                ps = b * psi_s + a * v
                ps_pad = jnp.pad(ps, pad_cfg)
                total_ext = corr_ext + ps_pad
                # add c2 * correction on the extended slab of p_next
                if side == 0:
                    lo0 = 0
                else:
                    lo0 = n_ax[ax] - S - r
                c2seg = jlax.slice_in_dim(c2dt2, lo0, lo0 + S + r, axis=ax)
                seg = jlax.slice_in_dim(p_next, lo0, lo0 + S + r, axis=ax)
                seg = seg + c2seg * total_ext
                idx = [0, 0, 0]
                idx[ax] = lo0
                p_next = jlax.dynamic_update_slice(p_next, seg, tuple(idx))
                out_pair += [ph, ps]
            new_strips.append(tuple(out_pair[:2] + out_pair[2:]))
        return (p, p_next, tuple(new_strips))

    return step, zero_state
