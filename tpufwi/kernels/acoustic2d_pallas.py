"""Fused Pallas/Mosaic TPU kernels for the 2D acoustic leapfrog+CPML step.

This is the production hot loop (SURVEY.md §2 `kernels/acoustic2d_pallas.py`,
spec P2: fused stencil >= 70% of HBM speed-of-light).

Design (TPU-first, not a port):
  * One `pallas_call` per time step with grid=() — the whole padded
    wavefield lives in VMEM for the duration of the step; HBM traffic is
    the scan-carry round trip only (~16 B/cell/step, the SoL model of
    SURVEY.md §6).
  * CPML memory variables (phi, psi per axis) are stored ONLY on the
    absorbing strips (depth pml+radius per side), not the full grid —
    they are identically zero elsewhere (cpml.py builds a=b=0 interior).
    This removes ~4 full-grid arrays from the carry and from HBM traffic.
  * The interior update is a pure 4th/8th-order Laplacian leapfrog; strip
    corrections (D1(phi), psi) are computed on small slices and added to
    the affected rows/columns, so the full-grid work stays branch-free.
  * `input_output_aliases` reuses the p_prev buffer for p_next (the
    leapfrog consumes p_prev exactly once, before the store).
  * Shapes are static per-grid; taps are compile-time constants.

The jnp twin (acoustic2d_jnp.py) defines the reference semantics; parity is
enforced by tests/test_pallas_kernels.py in interpret mode (CPU) and on TPU.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..grid import D1_COEFFS, D2_COEFFS, Grid


class StripState(NamedTuple):
    """Scan carry for the Pallas path: CPML memory on strips only.

    phiz/psiz: (2, S, NX) top/bottom strips; phix/psix: (2, NZ, S)
    left/right strips, S = pml + radius.
    """

    p_prev: jax.Array
    p: jax.Array
    phiz: jax.Array
    psiz: jax.Array
    phix: jax.Array
    psix: jax.Array


def strip_depth(grid: Grid) -> int:
    return grid.pml + grid.radius


def zero_strip_state(grid: Grid, dtype) -> StripState:
    NZ, NX = grid.padded_shape
    S = strip_depth(grid)
    z = functools.partial(jnp.zeros, dtype=dtype)
    return StripState(
        p_prev=z((NZ, NX)),
        p=z((NZ, NX)),
        phiz=z((2, S, NX)),
        psiz=z((2, S, NX)),
        phix=z((2, NZ, S)),
        psix=z((2, NZ, S)),
    )


def strip_profiles(grid: Grid, dt: float, c_max: float, f0: float, dtype=np.float32):
    """(az, bz, ax, bx) sliced to the strips: az/bz (2,S,1), ax/bx (2,1,S)."""
    from ..cpml import CpmlProfile

    S = strip_depth(grid)
    out = []
    for ax_i in range(2):
        prof = CpmlProfile.build(
            n=grid.shape[ax_i], pml=grid.pml, radius=grid.radius,
            h=grid.h[ax_i], dt=dt, c_max=c_max, f0=f0,
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
    return tuple(jnp.asarray(x) for x in out)


def _shift_sum_rows(scr_ref, taps, r, row0, nrows, NX, pz, px):
    """sum_k taps[k] * (rows shifted by k-r), full columns.

    scr_ref is the zero-padded scratch ref (border widths pz/px); row0 is
    relative to the unpadded array. All slice offsets are static, which is
    what the Mosaic lowering requires (no dynamic_slice on values); the
    column window stays lane-aligned (px is a multiple of 128).
    """
    out = None
    for k, c in enumerate(taps):
        if c == 0.0:
            continue
        z0 = pz + row0 + k - r
        term = c * scr_ref[z0 : z0 + nrows, px : px + NX]
        out = term if out is None else out + term
    return out


def _shift_sum_cols(scr_ref, taps, r, col0, ncols, NZ, pz, px):
    out = None
    for k, c in enumerate(taps):
        if c == 0.0:
            continue
        x0 = px + col0 + k - r
        term = c * scr_ref[pz : pz + NZ, x0 : x0 + ncols]
        out = term if out is None else out + term
    return out


def make_fused_forward_step(grid: Grid, interpret: bool = False):
    """Build the fused step: (StripState fields..., c2dt2, profiles) ->
    (p_next, phiz', psiz', phix', psix')."""
    if grid.ndim != 2:
        raise ValueError("pallas fused kernel is 2D; use the jnp path for 3D")
    NZ, NX = grid.padded_shape
    r = grid.radius
    S = strip_depth(grid)
    SE = S + r
    d1 = tuple(float(c) / grid.h[0] for c in D1_COEFFS[grid.order])
    d2z = tuple(float(c) / grid.h[0] ** 2 for c in D2_COEFFS[grid.order])
    d1x = tuple(float(c) / grid.h[1] for c in D1_COEFFS[grid.order])
    d2x = tuple(float(c) / grid.h[1] ** 2 for c in D2_COEFFS[grid.order])

    # Aligned scratch borders: z-border 8 (sublane multiple), x-border 128
    # (lane multiple), so the unshifted read and all z-taps are lane-aligned
    # and only x-taps pay a lane rotation.
    PZ, PX = 8, 128

    def kernel(
        p_prev_ref, p_ref, c2_ref, phiz_ref, psiz_ref, phix_ref, psix_ref,
        az_ref, bz_ref, ax_ref, bx_ref,
        p_next_ref, phiz_o_ref, psiz_o_ref, phix_o_ref, psix_o_ref,
        scr_ref, zstrip_ref, xstrip_ref,
    ):
        # zero only the r-frame adjacent to the interior (all taps reach at
        # most r cells beyond it; cells further out are never read)
        scr_ref[PZ - r : PZ, :] = jnp.zeros((r, NX + 2 * PX), scr_ref.dtype)
        scr_ref[PZ + NZ : PZ + NZ + r, :] = jnp.zeros((r, NX + 2 * PX), scr_ref.dtype)
        scr_ref[:, PX - r : PX] = jnp.zeros((NZ + 2 * PZ, r), scr_ref.dtype)
        scr_ref[:, PX + NX : PX + NX + r] = jnp.zeros((NZ + 2 * PZ, r), scr_ref.dtype)
        scr_ref[PZ : PZ + NZ, PX : PX + NX] = p_ref[:]

        # base Laplacian, full grid
        lap = _shift_sum_rows(scr_ref, d2z, r, 0, NZ, NX, PZ, PX) + _shift_sum_cols(
            scr_ref, d2x, r, 0, NX, NZ, PZ, PX
        )
        c2 = c2_ref[:]
        p_next_ref[:] = 2.0 * p_ref[:] - p_prev_ref[:] + c2 * lap

        # ---- z-axis CPML strips (top s=0, bottom s=1) ----
        for s, R0 in ((0, 0), (1, NZ - S)):
            a = az_ref[s]  # (S,1)
            b = bz_ref[s]
            d1p = _shift_sum_rows(scr_ref, d1, r, R0, S, NX, PZ, PX)
            ph = b * phiz_ref[s] + a * d1p
            phiz_o_ref[s] = ph
            # D1z(ph) over the extended region (S + r rows toward interior)
            zstrip_ref[:] = jnp.zeros_like(zstrip_ref)
            if s == 0:
                zstrip_ref[r : r + S, :] = ph
                corr = None
                for k, c in enumerate(d1):
                    if c == 0.0:
                        continue
                    t = c * zstrip_ref[k : k + SE, :]
                    corr = t if corr is None else corr + t
                d2p_strip = _shift_sum_rows(scr_ref, d2z, r, R0, S, NX, PZ, PX)
                ps = b * psiz_ref[s] + a * (d2p_strip + corr[:S])
                psiz_o_ref[s] = ps
                p_next_ref[0:SE, :] = p_next_ref[0:SE, :] + c2_ref[0:SE, :] * corr
                p_next_ref[0:S, :] = p_next_ref[0:S, :] + c2_ref[0:S, :] * ps
            else:
                # bottom: extended region is the r rows ABOVE the strip
                zstrip_ref[:] = jnp.zeros_like(zstrip_ref)
                zstrip_ref[2 * r : 2 * r + S, :] = ph
                corr = None
                for k, c in enumerate(d1):
                    if c == 0.0:
                        continue
                    t = c * zstrip_ref[k : k + SE, :]
                    corr = t if corr is None else corr + t
                d2p_strip = _shift_sum_rows(scr_ref, d2z, r, R0, S, NX, PZ, PX)
                ps = b * psiz_ref[s] + a * (d2p_strip + corr[r:])
                psiz_o_ref[s] = ps
                p_next_ref[NZ - SE : NZ, :] = (
                    p_next_ref[NZ - SE : NZ, :] + c2_ref[NZ - SE : NZ, :] * corr
                )
                p_next_ref[NZ - S : NZ, :] = (
                    p_next_ref[NZ - S : NZ, :] + c2_ref[NZ - S : NZ, :] * ps
                )

        # ---- x-axis CPML strips (left s=0, right s=1) ----
        for s, C0 in ((0, 0), (1, NX - S)):
            a = ax_ref[s]  # (1,S)
            b = bx_ref[s]
            d1p = _shift_sum_cols(scr_ref, d1x, r, C0, S, NZ, PZ, PX)
            ph = b * phix_ref[s] + a * d1p
            phix_o_ref[s] = ph
            xstrip_ref[:] = jnp.zeros_like(xstrip_ref)
            if s == 0:
                xstrip_ref[:, r : r + S] = ph
                corr = None
                for k, c in enumerate(d1x):
                    if c == 0.0:
                        continue
                    t = c * xstrip_ref[:, k : k + SE]
                    corr = t if corr is None else corr + t
                d2p_strip = _shift_sum_cols(scr_ref, d2x, r, C0, S, NZ, PZ, PX)
                ps = b * psix_ref[s] + a * (d2p_strip + corr[:, :S])
                psix_o_ref[s] = ps
                p_next_ref[:, 0:SE] = p_next_ref[:, 0:SE] + c2_ref[:, 0:SE] * corr
                p_next_ref[:, 0:S] = p_next_ref[:, 0:S] + c2_ref[:, 0:S] * ps
            else:
                xstrip_ref[:] = jnp.zeros_like(xstrip_ref)
                xstrip_ref[:, 2 * r : 2 * r + S] = ph
                corr = None
                for k, c in enumerate(d1x):
                    if c == 0.0:
                        continue
                    t = c * xstrip_ref[:, k : k + SE]
                    corr = t if corr is None else corr + t
                d2p_strip = _shift_sum_cols(scr_ref, d2x, r, C0, S, NZ, PZ, PX)
                ps = b * psix_ref[s] + a * (d2p_strip + corr[:, r:])
                psix_o_ref[s] = ps
                p_next_ref[:, NX - SE : NX] = (
                    p_next_ref[:, NX - SE : NX] + c2_ref[:, NX - SE : NX] * corr
                )
                p_next_ref[:, NX - S : NX] = (
                    p_next_ref[:, NX - S : NX] + c2_ref[:, NX - S : NX] * ps
                )

    dtype = jnp.float32
    vspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    out_shape = (
        jax.ShapeDtypeStruct((NZ, NX), dtype),  # p_next
        jax.ShapeDtypeStruct((2, S, NX), dtype),
        jax.ShapeDtypeStruct((2, S, NX), dtype),
        jax.ShapeDtypeStruct((2, NZ, S), dtype),
        jax.ShapeDtypeStruct((2, NZ, S), dtype),
    )

    call = pl.pallas_call(
        kernel,
        out_shape=out_shape,
        in_specs=[vspec] * 11,
        out_specs=(vspec,) * 5,
        scratch_shapes=[
            pltpu.VMEM((NZ + 16, NX + 256), dtype),  # PZ=8/PX=128 aligned borders
            pltpu.VMEM((S + 3 * r, NX), dtype),
            pltpu.VMEM((NZ, S + 3 * r), dtype),
        ],
        # alias the consumed carries onto their successors: p_prev -> p_next
        # and each CPML strip state -> its update (read-once before store)
        input_output_aliases={0: 0, 3: 1, 4: 2, 5: 3, 6: 4},
        compiler_params=None
        if interpret
        else pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )

    def step(state: StripState, c2dt2, profiles):
        az, bz, ax, bx = profiles
        p_next, phiz, psiz, phix, psix = call(
            state.p_prev, state.p, c2dt2,
            state.phiz, state.psiz, state.phix, state.psix,
            az, bz, ax, bx,
        )
        return StripState(
            p_prev=state.p, p=p_next, phiz=phiz, psiz=psiz, phix=phix, psix=psix
        )

    return step


def make_leapfrog_kernel(grid: Grid, interpret: bool = False, with_lap: bool = False):
    """Pure-interior leapfrog: p_out = 2 p - p_other + c2 * Lap(p).

    Used (a) as the reverse-time reconstruction kernel of the adjoint pass
    (SURVEY.md §3.2 — run backward, p_other = p_{t+1}) and (b) as the
    no-CPML performance floor. ``with_lap=True`` additionally returns
    Lap(p) (the imaging-condition factor, SURVEY.md §3.2).
    """
    NZ, NX = grid.padded_shape
    r = grid.radius
    d2z = tuple(float(c) / grid.h[0] ** 2 for c in D2_COEFFS[grid.order])
    d2x = tuple(float(c) / grid.h[1] ** 2 for c in D2_COEFFS[grid.order])
    PZ, PX = 8, 128

    def kernel(p_other_ref, p_ref, c2_ref, out_ref, *rest):
        if with_lap:
            lap_ref, scr_ref = rest
        else:
            (scr_ref,) = rest
        scr_ref[PZ - r : PZ, :] = jnp.zeros((r, NX + 2 * PX), scr_ref.dtype)
        scr_ref[PZ + NZ : PZ + NZ + r, :] = jnp.zeros((r, NX + 2 * PX), scr_ref.dtype)
        scr_ref[:, PX - r : PX] = jnp.zeros((NZ + 2 * PZ, r), scr_ref.dtype)
        scr_ref[:, PX + NX : PX + NX + r] = jnp.zeros((NZ + 2 * PZ, r), scr_ref.dtype)
        scr_ref[PZ : PZ + NZ, PX : PX + NX] = p_ref[:]
        lap = _shift_sum_rows(scr_ref, d2z, r, 0, NZ, NX, PZ, PX) + _shift_sum_cols(
            scr_ref, d2x, r, 0, NX, NZ, PZ, PX
        )
        if with_lap:
            lap_ref[:] = lap
        out_ref[:] = 2.0 * p_ref[:] - p_other_ref[:] + c2_ref[:] * lap

    dtype = jnp.float32
    vspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    outs = [jax.ShapeDtypeStruct((NZ, NX), dtype)]
    if with_lap:
        outs.append(jax.ShapeDtypeStruct((NZ, NX), dtype))
    return pl.pallas_call(
        kernel,
        out_shape=tuple(outs) if with_lap else outs[0],
        in_specs=[vspec] * 3,
        out_specs=(vspec,) * 2 if with_lap else vspec,
        scratch_shapes=[pltpu.VMEM((NZ + 16, NX + 256), dtype)],
        input_output_aliases={0: 0},
        compiler_params=None
        if interpret
        else pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )


def make_pallas_forward(grid: Grid, dt: float, f0: float, c_max: float,
                        interpret: bool = False):
    """simulate_fwd(c2dt2, wavelet, src_idx, rcv_idx) -> seis using the
    fused kernel inside lax.scan (source/receiver scatter-gather and tape
    extraction stay in XLA — they are O(nrec) ops)."""
    from jax import lax

    step = make_fused_forward_step(grid, interpret=interpret)
    profiles = strip_profiles(grid, dt, c_max, f0)

    def simulate(c2dt2, wavelet, src_idx, rcv_idx):
        src = (src_idx[..., 0], src_idx[..., 1])
        rcv = (rcv_idx[..., 0], rcv_idx[..., 1])

        def body(s, w_t):
            s = step(s, c2dt2, profiles)
            p_inj = s.p.at[src].add(c2dt2[src] * w_t, mode="drop")
            s = s._replace(p=p_inj)
            return s, p_inj[rcv]

        _, seis = lax.scan(body, zero_strip_state(grid, c2dt2.dtype), wavelet)
        return seis

    return simulate
