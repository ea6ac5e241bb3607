"""Fused Pallas/Mosaic TPU kernels for the 2D acoustic leapfrog+CPML step.

This is the production hot loop (SURVEY.md §2 `kernels/acoustic2d_pallas.py`,
spec P2: fused stencil >= 70% of HBM speed-of-light).

Design (TPU-first, not a port):
  * **Padded-carry layout**: the wavefield is carried through the scan in an
    extended (NZ+2*PZ, NX+2*PX) buffer with PZ=8 (sublane-aligned) and
    PX=128 (lane-aligned) zero borders. The kernel reads shifted stencil
    slices DIRECTLY from the carry — no per-step scratch fill, no border
    zeroing, and the unshifted read plus every z-tap stays lane-aligned.
    Border zeros persist because the output aliases the consumed p_prev
    buffer and the kernel only writes the interior. This took the pure
    leapfrog from 25.6 to 14.5 us/step on a Marmousi2-size grid — ~94% of
    the 16 B/cell HBM speed-of-light.
  * One `pallas_call` per time step with grid=(): the whole padded
    wavefield lives in VMEM for the duration of the step; HBM traffic is
    the scan-carry round trip only.
  * CPML memory variables (phi, psi per axis) are stored ONLY on the
    absorbing strips (depth pml+radius per side) — they are identically
    zero elsewhere (cpml.py builds a=b=0 interior). Strip corrections are
    computed on small slices and added to the affected rows/columns, so
    the full-grid work stays branch-free.

The jnp twin (acoustic2d_jnp.py) defines the reference semantics; parity is
enforced by tests/test_pallas_kernels.py in interpret mode (CPU) and on TPU.
fp32 only.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_util import bspec

from ..grid import D1_COEFFS, D2_COEFFS, Grid

# Aligned border widths of the padded-carry layout (see module docstring).
PZ, PX = 8, 128


def ext_shape(grid: Grid) -> Tuple[int, int]:
    NZ, NX = grid.padded_shape
    return NZ + 2 * PZ, NX + 2 * PX


def to_ext(x: jax.Array, mode: str = "constant") -> jax.Array:
    """Lift a (NZ, NX) grid-padded array into the extended carry layout."""
    return jnp.pad(x, ((PZ, PZ), (PX, PX)), mode=mode)


def from_ext(x: jax.Array, grid: Grid) -> jax.Array:
    NZ, NX = grid.padded_shape
    return x[PZ : PZ + NZ, PX : PX + NX]


class StripState(NamedTuple):
    """Scan carry for the Pallas path.

    p_prev/p: extended-layout (NZ+2PZ, NX+2PX) wavefields with zero
    borders. CPML memory on strips only: phiz/psiz (2, S, NX) top/bottom;
    phix/psix (2, NZ, S) left/right, S = pml + radius.
    """

    p_prev: jax.Array
    p: jax.Array
    phiz: jax.Array
    psiz: jax.Array
    phix: jax.Array
    psix: jax.Array


def strip_depth(grid: Grid) -> int:
    return grid.pml + grid.radius


def zero_strip_state(grid: Grid, dtype=jnp.float32) -> StripState:
    NZ, NX = grid.padded_shape
    EZ, EX = ext_shape(grid)
    S = strip_depth(grid)
    z = functools.partial(jnp.zeros, dtype=dtype)
    return StripState(
        p_prev=z((EZ, EX)),
        p=z((EZ, EX)),
        phiz=z((2, S, NX)),
        psiz=z((2, S, NX)),
        phix=z((2, NZ, S)),
        psix=z((2, NZ, S)),
    )


def strip_profiles(grid: Grid, dt: float, c_max: float, f0: float, dtype=np.float32):
    """(az, bz, ax, bx) sliced to the strips: az/bz (2,S,1), ax/bx (2,1,S).
    With ``grid.free_surface`` the top z strip is disabled (a = b = 0), same
    as cpml.build_profiles for the jnp engine."""
    from ..cpml import CpmlProfile

    S = strip_depth(grid)
    out = []
    for ax_i in range(2):
        prof = CpmlProfile.build(
            n=grid.shape[ax_i], pml=grid.pml, radius=grid.radius,
            h=grid.h[ax_i], dt=dt, c_max=c_max, f0=f0,
            free_lo=(grid.free_surface and ax_i == 0),
        )
        n_pad = grid.padded_shape[ax_i]
        a_lo, a_hi = prof.a[:S], prof.a[n_pad - S:]
        b_lo, b_hi = prof.b[:S], prof.b[n_pad - S:]
        a2 = np.stack([a_lo, a_hi]).astype(dtype)
        b2 = np.stack([b_lo, b_hi]).astype(dtype)
        if ax_i == 0:
            out += [a2[:, :, None], b2[:, :, None]]  # (2,S,1)
        else:
            out += [a2[:, None, :], b2[:, None, :]]  # (2,1,S)
    return tuple(np.asarray(x) for x in out)


def _shift_sum_rows(p_ref, taps, r, row0, nrows, NX, pz=PZ, px=PX):
    """sum_k taps[k] * (rows shifted by k-r), full interior columns, read
    directly from an extended-layout ref. All offsets static; the column
    window stays lane-aligned (px multiple of 128)."""
    out = None
    for k, c in enumerate(taps):
        if c == 0.0:
            continue
        z0 = pz + row0 + k - r
        term = c * p_ref[z0 : z0 + nrows, px : px + NX]
        out = term if out is None else out + term
    return out


def _shift_sum_cols(p_ref, taps, r, col0, ncols, NZ, pz=PZ, px=PX):
    out = None
    for k, c in enumerate(taps):
        if c == 0.0:
            continue
        x0 = px + col0 + k - r
        term = c * p_ref[pz : pz + NZ, x0 : x0 + ncols]
        out = term if out is None else out + term
    return out


def make_fused_forward_step(grid: Grid, interpret: bool = False,
                            nsrc: int | None = None, with_tape: bool = False):
    """Build the fused step over extended-layout carries:
    (StripState fields..., c2dt2_ext, profiles[, src_z, src_x, amp]) ->
    (p_next_ext, strips').

    With ``nsrc`` set, source injection happens in-kernel as an iota-mask
    add (src_z/src_x: (1, nsrc) int32 grid-padded indices; amp: (1, nsrc)
    = c2dt2[src] * w_t): an XLA scatter after the kernel costs a full-array
    copy per step. With ``with_tape``, the four boundary-ring slabs of the
    post-source p_next are extra outputs (read back after the strip
    corrections, which do touch the ring rows), removing the per-step XLA
    slab gathers from the taped forward pass."""
    if grid.ndim != 2:
        raise ValueError("pallas fused kernel is 2D; use the jnp path for 3D")
    NZ, NX = grid.padded_shape
    EZ, EX = ext_shape(grid)
    r = grid.radius
    S = strip_depth(grid)
    SE = S + r
    fs = grid.pad if grid.free_surface else None  # pressure-release row
    d1 = tuple(float(c) / grid.h[0] for c in D1_COEFFS[grid.order])
    d2z = tuple(float(c) / grid.h[0] ** 2 for c in D2_COEFFS[grid.order])
    d1x = tuple(float(c) / grid.h[1] for c in D1_COEFFS[grid.order])
    d2x = tuple(float(c) / grid.h[1] ** 2 for c in D2_COEFFS[grid.order])

    from ..propagators.boundary import RingSpec

    ring_slices = RingSpec.build(grid).slices if with_tape else ()
    NRING = len(ring_slices)

    def kernel(*refs):
        ring_o_refs = ()
        if with_tape:
            ring_o_refs = refs[-2 - NRING : -2]
            refs = refs[: -2 - NRING] + refs[-2:]
        if nsrc is not None:
            (p_prev_ref, p_ref, c2_ref, phiz_ref, psiz_ref, phix_ref,
             psix_ref, az_ref, bz_ref, ax_ref, bx_ref,
             sz_ref, sx_ref, amp_ref,
             p_next_ref, phiz_o_ref, psiz_o_ref, phix_o_ref, psix_o_ref,
             zstrip_ref, xstrip_ref) = refs
        else:
            (p_prev_ref, p_ref, c2_ref, phiz_ref, psiz_ref, phix_ref,
             psix_ref, az_ref, bz_ref, ax_ref, bx_ref,
             p_next_ref, phiz_o_ref, psiz_o_ref, phix_o_ref, psix_o_ref,
             zstrip_ref, xstrip_ref) = refs

        def c2i(zs, xs):
            return c2_ref[PZ + zs.start : PZ + zs.stop, PX + xs.start : PX + xs.stop]

        # base Laplacian + leapfrog on the interior; borders persist from
        # the aliased p_prev buffer (zeros)
        lap = _shift_sum_rows(p_ref, d2z, r, 0, NZ, NX) + _shift_sum_cols(
            p_ref, d2x, r, 0, NX, NZ
        )
        interior = (
            2.0 * p_ref[PZ : PZ + NZ, PX : PX + NX]
            - p_prev_ref[PZ : PZ + NZ, PX : PX + NX]
            + c2_ref[PZ : PZ + NZ, PX : PX + NX] * lap
        )
        if nsrc is not None:
            # in-kernel source injection: one iota-mask fma per source
            ziota = jax.lax.broadcasted_iota(jnp.int32, (NZ, NX), 0)
            xiota = jax.lax.broadcasted_iota(jnp.int32, (NZ, NX), 1)
            for j in range(nsrc):
                mask = (ziota == sz_ref[0, j]) & (xiota == sx_ref[0, j])
                interior = interior + amp_ref[0, j] * mask.astype(interior.dtype)
        p_next_ref[PZ : PZ + NZ, PX : PX + NX] = interior

        def rmw_rows(zs, val):
            p_next_ref[PZ + zs.start : PZ + zs.stop, PX : PX + NX] = (
                p_next_ref[PZ + zs.start : PZ + zs.stop, PX : PX + NX]
                + c2i(zs, slice(0, NX)) * val
            )

        def rmw_cols(xs, val):
            p_next_ref[PZ : PZ + NZ, PX + xs.start : PX + xs.stop] = (
                p_next_ref[PZ : PZ + NZ, PX + xs.start : PX + xs.stop]
                + c2i(slice(0, NZ), xs) * val
            )

        # ---- z-axis CPML strips (top s=0, bottom s=1) ----
        for s, R0 in ((0, 0), (1, NZ - S)):
            a = az_ref[s]  # (S,1)
            b = bz_ref[s]
            d1p = _shift_sum_rows(p_ref, d1, r, R0, S, NX)
            ph = b * phiz_ref[s] + a * d1p
            phiz_o_ref[s] = ph
            # D1z(ph) over the extended region (S + r rows toward interior)
            zstrip_ref[:] = jnp.zeros_like(zstrip_ref)
            off = r if s == 0 else 2 * r
            zstrip_ref[off : off + S, :] = ph
            corr = None
            for k, c in enumerate(d1):
                if c == 0.0:
                    continue
                t = c * zstrip_ref[k : k + SE, :]
                corr = t if corr is None else corr + t
            d2p_strip = _shift_sum_rows(p_ref, d2z, r, R0, S, NX)
            strip_in_ext = slice(0, S) if s == 0 else slice(r, SE)
            ps = b * psiz_ref[s] + a * (d2p_strip + corr[strip_in_ext])
            psiz_o_ref[s] = ps
            ext = slice(0, SE) if s == 0 else slice(NZ - SE, NZ)
            rmw_rows(ext, corr)
            rmw_rows(slice(R0, R0 + S), ps)

        # ---- x-axis CPML strips (left s=0, right s=1) ----
        for s, C0 in ((0, 0), (1, NX - S)):
            a = ax_ref[s]  # (1,S)
            b = bx_ref[s]
            d1p = _shift_sum_cols(p_ref, d1x, r, C0, S, NZ)
            ph = b * phix_ref[s] + a * d1p
            phix_o_ref[s] = ph
            xstrip_ref[:] = jnp.zeros_like(xstrip_ref)
            off = r if s == 0 else 2 * r
            xstrip_ref[:, off : off + S] = ph
            corr = None
            for k, c in enumerate(d1x):
                if c == 0.0:
                    continue
                t = c * xstrip_ref[:, k : k + SE]
                corr = t if corr is None else corr + t
            d2p_strip = _shift_sum_cols(p_ref, d2x, r, C0, S, NZ)
            strip_in_ext = slice(0, S) if s == 0 else slice(r, SE)
            ps = b * psix_ref[s] + a * (d2p_strip + corr[:, strip_in_ext])
            psix_o_ref[s] = ps
            ext = slice(0, SE) if s == 0 else slice(NX - SE, NX)
            rmw_cols(ext, corr)
            rmw_cols(slice(C0, C0 + S), ps)

        if fs is not None:  # pressure-release surface: pin the row last
            p_next_ref[PZ + fs : PZ + fs + 1, PX : PX + NX] = jnp.zeros(
                (1, NX), jnp.float32
            )

        # boundary-ring tape: read back AFTER the strip corrections (the
        # extended correction regions cover the ring rows/cols)
        for sl, ring_ref in zip(ring_slices, ring_o_refs):
            ring_ref[:] = p_next_ref[
                PZ + sl[0].start : PZ + sl[0].stop,
                PX + sl[1].start : PX + sl[1].stop,
            ]

    dtype = jnp.float32
    vspec = bspec(memory_space=pltpu.VMEM)
    out_shape = (
        jax.ShapeDtypeStruct((EZ, EX), dtype),  # p_next (extended)
        jax.ShapeDtypeStruct((2, S, NX), dtype),
        jax.ShapeDtypeStruct((2, S, NX), dtype),
        jax.ShapeDtypeStruct((2, NZ, S), dtype),
        jax.ShapeDtypeStruct((2, NZ, S), dtype),
    ) + tuple(
        jax.ShapeDtypeStruct(
            tuple(sl.stop - sl.start for sl in s_), dtype
        )
        for s_ in ring_slices
    )

    call = pl.pallas_call(
        kernel,
        out_shape=out_shape,
        in_specs=[vspec] * (11 if nsrc is None else 14),
        out_specs=(vspec,) * (5 + NRING),
        scratch_shapes=[
            pltpu.VMEM((S + 3 * r, NX), dtype),
            pltpu.VMEM((NZ, S + 3 * r), dtype),
        ],
        # consumed carries alias their successors; p_prev's zero borders
        # become p_next's borders (the kernel never writes them)
        input_output_aliases={0: 0, 3: 1, 4: 2, 5: 3, 6: 4},
        compiler_params=None
        if interpret
        else pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )

    if nsrc is None:

        def step(state: StripState, c2dt2_ext, profiles):
            az, bz, ax, bx = profiles
            p_next, phiz, psiz, phix, psix = call(
                state.p_prev, state.p, c2dt2_ext,
                state.phiz, state.psiz, state.phix, state.psix,
                az, bz, ax, bx,
            )
            return StripState(
                p_prev=state.p, p=p_next, phiz=phiz, psiz=psiz, phix=phix, psix=psix
            )

    else:

        def step(state: StripState, c2dt2_ext, profiles, sz, sx, amp):
            az, bz, ax, bx = profiles
            p_next, phiz, psiz, phix, psix, *rings_out = call(
                state.p_prev, state.p, c2dt2_ext,
                state.phiz, state.psiz, state.phix, state.psix,
                az, bz, ax, bx, sz, sx, amp,
            )
            new = StripState(
                p_prev=state.p, p=p_next, phiz=phiz, psiz=psiz, phix=phix, psix=psix
            )
            return (new, tuple(rings_out)) if with_tape else new

    return step


def make_leapfrog_kernel(grid: Grid, interpret: bool = False, with_lap: bool = False):
    """Pure-interior leapfrog on extended-layout arrays:
    p_out = 2 p - p_other + c2 * Lap(p) (interior; borders persist via the
    p_other alias). ``with_lap=True`` additionally returns Lap(p) on the
    (NZ, NX) grid (the imaging-condition factor)."""
    NZ, NX = grid.padded_shape
    EZ, EX = ext_shape(grid)
    r = grid.radius
    d2z = tuple(float(c) / grid.h[0] ** 2 for c in D2_COEFFS[grid.order])
    d2x = tuple(float(c) / grid.h[1] ** 2 for c in D2_COEFFS[grid.order])

    def kernel(p_other_ref, p_ref, c2_ref, out_ref, *rest):
        lap_ref = rest[0] if with_lap else None
        lap = _shift_sum_rows(p_ref, d2z, r, 0, NZ, NX) + _shift_sum_cols(
            p_ref, d2x, r, 0, NX, NZ
        )
        if with_lap:
            lap_ref[:] = lap
        out_ref[PZ : PZ + NZ, PX : PX + NX] = (
            2.0 * p_ref[PZ : PZ + NZ, PX : PX + NX]
            - p_other_ref[PZ : PZ + NZ, PX : PX + NX]
            + c2_ref[PZ : PZ + NZ, PX : PX + NX] * lap
        )

    dtype = jnp.float32
    vspec = bspec(memory_space=pltpu.VMEM)
    outs = [jax.ShapeDtypeStruct((EZ, EX), dtype)]
    if with_lap:
        outs.append(jax.ShapeDtypeStruct((NZ, NX), dtype))
    return pl.pallas_call(
        kernel,
        out_shape=tuple(outs) if with_lap else outs[0],
        in_specs=[vspec] * 3,
        out_specs=(vspec,) * 2 if with_lap else vspec,
        input_output_aliases={0: 0},
        compiler_params=None
        if interpret
        else pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )


def make_pallas_forward(grid: Grid, dt: float, f0: float, c_max: float,
                        interpret: bool = False):
    """simulate_fwd(c2dt2, wavelet, src_idx, rcv_idx) -> seis using the
    fused kernel inside lax.scan. Takes grid-padded (NZ, NX) c2dt2 and
    grid-padded indices; the extended carry layout is internal."""
    from jax import lax

    profiles = strip_profiles(grid, dt, c_max, f0)
    cache = {}

    def simulate(c2dt2, wavelet, src_idx, rcv_idx):
        nsrc = src_idx.shape[-2]
        if nsrc not in cache:
            cache[nsrc] = make_fused_forward_step(
                grid, interpret=interpret, nsrc=nsrc
            )
        step = cache[nsrc]
        c2e = to_ext(c2dt2, mode="edge")
        sz = src_idx[..., 0].reshape(1, nsrc).astype(jnp.int32)
        sx = src_idx[..., 1].reshape(1, nsrc).astype(jnp.int32)
        c2src = c2dt2[(src_idx[..., 0], src_idx[..., 1])].reshape(1, nsrc)
        rcv = (rcv_idx[..., 0] + PZ, rcv_idx[..., 1] + PX)

        def body(s, w_t):
            s = step(s, c2e, profiles, sz, sx, c2src * w_t)
            return s, s.p[rcv]

        _, seis = lax.scan(body, zero_strip_state(grid, c2dt2.dtype), wavelet)
        return seis

    return simulate
