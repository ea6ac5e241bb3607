"""Fused backward (adjoint) Pallas kernels: reverse reconstruction +
transposed CPML step + imaging condition (spec C2: "cross-correlation
imaging condition fused into the backward stencil kernel").

Math: the forward step (acoustic2d_pallas.py / acoustic2d_jnp.py) is, per
axis d (kappa = 1):

    phi' = b phi + a D1 p
    v    = D2 p + D1 phi'
    psi' = b psi + a v
    lap += v + psi'
    p+   = 2 p - p_prev + C lap (+ C w at src),   C = (c dt)^2

Hand-transposing this affine map (D2^T = D2, D1^T = -D1 under the zero
Dirichlet border) gives, for incoming cotangents (q_pm, q_p, phib, psib)
and receiver cotangent ybar:

    lambda       = q_p + one_hot(rz).T @ (ybar * one_hot(rx))   [MXU]
    q_pm_out     = -lambda
    u            = C * lambda
    psib_tot     = psib_in + u|strip
    psib_out     = b * psib_tot;      w_s = a * psib_tot        (strip)
    phib_tot     = phib_in - (D1 u)|strip - (D1 pad(w_s))|strip
    phib_out     = b * phib_tot;      y_s = a * phib_tot        (strip)
    q_p_out      = q_pm_in + 2 lambda + D2z u + D2x u
                   + sum_strips [ D2 pad(w_s) - D1 pad(y_s) ]
    gbar_out     = gbar_in + lambda * lapw          (imaging; lapw = Lap p_t)

The adjoint field thus propagates through the *exact* transposed CPML
recursion (absorbing for the adjoint too), and the model cotangent is the
zero-lag cross-correlation of lambda with Lap(p_t), with p_t recovered by
the reverse leapfrog + ring re-imposition (make_recon_kernel). Wavefield
cotangents ride the same extended padded-carry layout as the forward
kernels (acoustic2d_pallas.PZ/PX borders, persisted through aliasing).
Correctness is pinned against jax.vjp of the jnp twin step
(tests/test_pallas_adjoint.py).
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


def make_recon_kernel(grid: Grid, interpret: bool = False, nsrc: int | None = None):
    """Reverse reconstruction with fused ring imposition:

      p_tm1 = rings_impose(2 p_t - p_tp1 + C * Lap(p_t) [+ src], ring_tm1)
      lapw  = Lap(p_t)

    With ``nsrc`` set, the source term (amp = C[src] * w_t at grid-padded
    indices src_z/src_x, each (1, nsrc)) is added in-kernel as an iota-mask
    fma BEFORE the ring imposition — which also makes in-ring sources exact
    for free (the tape overwrite wins). Without it the caller must scatter
    afterwards and mask in-ring sources.
    """
    from .acoustic2d_pallas import make_leapfrog_kernel  # noqa: F401 (doc ref)
    from ..propagators.boundary import RingSpec

    NZ, NX = grid.padded_shape
    r = grid.radius
    d2z = tuple(float(c) / grid.h[0] ** 2 for c in D2_COEFFS[grid.order])
    d2x = tuple(float(c) / grid.h[1] ** 2 for c in D2_COEFFS[grid.order])
    PZ, PX = 8, 128
    fs = grid.pad if grid.free_surface else None
    ring_slices = RingSpec.build(grid).slices

    def kernel(p_tp1_ref, p_t_ref, c2_ref, *rest):
        if nsrc is not None:
            sz_ref, sx_ref, amp_ref = rest[:3]
            rest = rest[3:]
        ring_refs = rest[: len(ring_slices)]
        out_ref, lapw_ref, scr_ref = rest[len(ring_slices) :]
        scr_ref[PZ - r : PZ, :] = jnp.zeros((r, NX + 2 * PX), scr_ref.dtype)
        scr_ref[PZ + NZ : PZ + NZ + r, :] = jnp.zeros((r, NX + 2 * PX), scr_ref.dtype)
        scr_ref[:, PX - r : PX] = jnp.zeros((NZ + 2 * PZ, r), scr_ref.dtype)
        scr_ref[:, PX + NX : PX + NX + r] = jnp.zeros((NZ + 2 * PZ, r), scr_ref.dtype)
        scr_ref[PZ : PZ + NZ, PX : PX + NX] = p_t_ref[:]
        lap = _shift_sum_rows(scr_ref, d2z, r, 0, NZ, NX, PZ, PX) + _shift_sum_cols(
            scr_ref, d2x, r, 0, NX, NZ, PZ, PX
        )
        lapw_ref[:] = lap
        body = 2.0 * p_t_ref[:] - p_tp1_ref[:] + c2_ref[:] * lap
        if nsrc is not None:
            ziota = jax.lax.broadcasted_iota(jnp.int32, (NZ, NX), 0)
            xiota = jax.lax.broadcasted_iota(jnp.int32, (NZ, NX), 1)
            for j in range(nsrc):
                mask = (ziota == sz_ref[0, j]) & (xiota == sx_ref[0, j])
                body = body + amp_ref[0, j] * mask.astype(body.dtype)
        out_ref[:] = body
        for sl, ring_ref in zip(ring_slices, ring_refs):
            out_ref[sl[0], sl[1]] = ring_ref[:]

    dtype = jnp.float32
    vspec = bspec(memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((NZ, NX), dtype),
            jax.ShapeDtypeStruct((NZ, NX), dtype),
        ),
        in_specs=[vspec] * ((3 if nsrc is None else 6) + len(ring_slices)),
        out_specs=(vspec, vspec),
        scratch_shapes=[pltpu.VMEM((NZ + 16, NX + 256), dtype)],
        input_output_aliases={0: 0},  # p_tp1 buffer -> p_tm1
        compiler_params=None
        if interpret
        else pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )


def make_fused_adjoint_step(grid: Grid, interpret: bool = False, nrec: int | None = None):
    """Build the transposed step kernel.

    step_T(q_pm, q_p, C, lapw, gbar, strips, profiles[, Mzt, U]) ->
    (q_pm', q_p', gbar', phib_z', psib_z', phib_x', psib_x')

    With ``nrec`` set, the receiver-cotangent injection is fused into the
    kernel as an MXU one-hot matmul: lambda = q_p + Mzt @ U, where
    Mzt = one_hot(rcv_z, NZ).T (NZ, nrec) and U = ybar_t[:, None] *
    one_hot(rcv_x, NX) (nrec, NX). A many-index scatter costs ~57 us/step
    on TPU; the dense rank-nrec MXU update is ~2 us. Without ``nrec``,
    q_p must already include the receiver cotangent.
    """
    NZ, NX = grid.padded_shape
    r = grid.radius
    S = strip_depth(grid)
    SE = S + r
    d1z = tuple(float(c) / grid.h[0] for c in D1_COEFFS[grid.order])
    d2z = tuple(float(c) / grid.h[0] ** 2 for c in D2_COEFFS[grid.order])
    d1x = tuple(float(c) / grid.h[1] for c in D1_COEFFS[grid.order])
    d2x = tuple(float(c) / grid.h[1] ** 2 for c in D2_COEFFS[grid.order])
    PZ, PX = 8, 128
    fs = grid.pad if grid.free_surface else None

    def kernel(*refs):
        if nrec is not None:
            (q_pm_ref, q_p_ref, c2_ref, lapw_ref, gbar_ref,
             pbz_ref, psz_ref, pbx_ref, psx_ref,
             az_ref, bz_ref, ax_ref, bx_ref, rz_ref, rx_ref, yb_ref,
             q_pm_o_ref, q_p_o_ref, gbar_o_ref,
             pbz_o_ref, psz_o_ref, pbx_o_ref, psx_o_ref,
             scr_ref, zs_ref, zs2_ref, xs_ref, xs2_ref) = refs
            # receiver injection: build the one-hot factors IN KERNEL from
            # the raw index vectors (3 KB of inputs) instead of shipping a
            # ~6 MB dense product through HBM every step
            mzt = (
                jax.lax.broadcasted_iota(jnp.int32, (NZ, nrec), 0)
                == rz_ref[:]  # (1, nrec)
            ).astype(jnp.float32)
            u = (
                jax.lax.broadcasted_iota(jnp.int32, (nrec, NX), 1)
                == rx_ref[:]  # (nrec, 1)
            ).astype(jnp.float32) * yb_ref[:]  # (nrec, 1)
            lam = q_p_ref[:] + jnp.dot(
                mzt, u, preferred_element_type=jnp.float32
            )
        else:
            (q_pm_ref, q_p_ref, c2_ref, lapw_ref, gbar_ref,
             pbz_ref, psz_ref, pbx_ref, psx_ref,
             az_ref, bz_ref, ax_ref, bx_ref,
             q_pm_o_ref, q_p_o_ref, gbar_o_ref,
             pbz_o_ref, psz_o_ref, pbx_o_ref, psx_o_ref,
             scr_ref, zs_ref, zs2_ref, xs_ref, xs2_ref) = refs
            lam = q_p_ref[:]
        if fs is not None:  # transpose of the pressure-release row pin
            lam = lam * (
                jax.lax.broadcasted_iota(jnp.int32, (NZ, 1), 0) != fs
            ).astype(jnp.float32)
        # u = C * lambda into the zero-bordered aligned scratch
        scr_ref[PZ - r : PZ, :] = jnp.zeros((r, NX + 2 * PX), scr_ref.dtype)
        scr_ref[PZ + NZ : PZ + NZ + r, :] = jnp.zeros((r, NX + 2 * PX), scr_ref.dtype)
        scr_ref[:, PX - r : PX] = jnp.zeros((NZ + 2 * PZ, r), scr_ref.dtype)
        scr_ref[:, PX + NX : PX + NX + r] = jnp.zeros((NZ + 2 * PZ, r), scr_ref.dtype)
        scr_ref[PZ : PZ + NZ, PX : PX + NX] = c2_ref[:] * lam

        # full-grid transposed leapfrog + imaging
        q_pm_o_ref[:] = -lam
        gbar_o_ref[:] = gbar_ref[:] + lam * lapw_ref[:]
        q_p_o_ref[:] = (
            q_pm_ref[:]
            + 2.0 * lam
            + _shift_sum_rows(scr_ref, d2z, r, 0, NZ, NX, PZ, PX)
            + _shift_sum_cols(scr_ref, d2x, r, 0, NX, NZ, PZ, PX)
        )

        # ---- z strips ----
        for s, R0 in ((0, 0), (1, NZ - S)):
            a = az_ref[s]  # (S,1)
            b = bz_ref[s]
            u_strip = scr_ref[PZ + R0 : PZ + R0 + S, PX : PX + NX]
            ps_tot = psz_ref[s] + u_strip
            psz_o_ref[s] = b * ps_tot
            w_s = a * ps_tot
            # D1(u)|strip
            d1u = _shift_sum_rows(scr_ref, d1z, r, R0, S, NX, PZ, PX)
            # D1(pad(w_s))|strip: strip-buffer trick (same as forward corr)
            off = r if s == 0 else 2 * r
            zs_ref[:] = jnp.zeros_like(zs_ref)
            zs_ref[off : off + S, :] = w_s
            d1w = None
            d2w = None
            for k, c in enumerate(d1z):
                if c != 0.0:
                    t = c * zs_ref[k : k + SE, :]
                    d1w = t if d1w is None else d1w + t
            for k, c in enumerate(d2z):
                if c != 0.0:
                    t = c * zs_ref[k : k + SE, :]
                    d2w = t if d2w is None else d2w + t
            # strip rows within the extended window
            strip_in_ext = slice(0, S) if s == 0 else slice(r, SE)
            pb_tot = pbz_ref[s] - d1u - d1w[strip_in_ext]
            pbz_o_ref[s] = b * pb_tot
            y_s = a * pb_tot
            zs2_ref[:] = jnp.zeros_like(zs2_ref)
            zs2_ref[off : off + S, :] = y_s
            d1y = None
            for k, c in enumerate(d1z):
                if c != 0.0:
                    t = c * zs2_ref[k : k + SE, :]
                    d1y = t if d1y is None else d1y + t
            ext = slice(0, SE) if s == 0 else slice(NZ - SE, NZ)
            q_p_o_ref[ext, :] = q_p_o_ref[ext, :] + d2w - d1y

        # ---- x strips ----
        for s, C0 in ((0, 0), (1, NX - S)):
            a = ax_ref[s]  # (1,S)
            b = bx_ref[s]
            u_strip = scr_ref[PZ : PZ + NZ, PX + C0 : PX + C0 + S]
            ps_tot = psx_ref[s] + u_strip
            psx_o_ref[s] = b * ps_tot
            w_s = a * ps_tot
            d1u = _shift_sum_cols(scr_ref, d1x, r, C0, S, NZ, PZ, PX)
            off = r if s == 0 else 2 * r
            xs_ref[:] = jnp.zeros_like(xs_ref)
            xs_ref[:, off : off + S] = w_s
            d1w = None
            d2w = None
            for k, c in enumerate(d1x):
                if c != 0.0:
                    t = c * xs_ref[:, k : k + SE]
                    d1w = t if d1w is None else d1w + t
            for k, c in enumerate(d2x):
                if c != 0.0:
                    t = c * xs_ref[:, k : k + SE]
                    d2w = t if d2w is None else d2w + t
            strip_in_ext = slice(0, S) if s == 0 else slice(r, SE)
            pb_tot = pbx_ref[s] - d1u - d1w[:, strip_in_ext]
            pbx_o_ref[s] = b * pb_tot
            y_s = a * pb_tot
            xs2_ref[:] = jnp.zeros_like(xs2_ref)
            xs2_ref[:, off : off + S] = y_s
            d1y = None
            for k, c in enumerate(d1x):
                if c != 0.0:
                    t = c * xs2_ref[:, k : k + SE]
                    d1y = t if d1y is None else d1y + t
            ext = slice(0, SE) if s == 0 else slice(NX - SE, NX)
            q_p_o_ref[:, ext] = q_p_o_ref[:, ext] + d2w - d1y

    dtype = jnp.float32
    vspec = bspec(memory_space=pltpu.VMEM)
    out_shape = (
        jax.ShapeDtypeStruct((NZ, NX), dtype),  # q_pm'
        jax.ShapeDtypeStruct((NZ, NX), dtype),  # q_p'
        jax.ShapeDtypeStruct((NZ, NX), dtype),  # gbar'
        jax.ShapeDtypeStruct((2, S, NX), dtype),
        jax.ShapeDtypeStruct((2, S, NX), dtype),
        jax.ShapeDtypeStruct((2, NZ, S), dtype),
        jax.ShapeDtypeStruct((2, NZ, S), dtype),
    )
    n_in = 13 if nrec is None else 16
    call = pl.pallas_call(
        kernel,
        out_shape=out_shape,
        in_specs=[vspec] * n_in,
        out_specs=(vspec,) * 7,
        scratch_shapes=[
            pltpu.VMEM((NZ + 16, NX + 256), dtype),
            pltpu.VMEM((S + 3 * r, NX), dtype),
            pltpu.VMEM((S + 3 * r, NX), dtype),
            pltpu.VMEM((NZ, S + 3 * r), dtype),
            pltpu.VMEM((NZ, S + 3 * r), dtype),
        ],
        # q_p -> q_pm' (=-lambda), q_pm -> q_p', gbar -> gbar', strips onto
        # their updates (HBM buffer reuse; VMEM blocks are distinct anyway)
        input_output_aliases={1: 0, 0: 1, 4: 2, 5: 3, 6: 4, 7: 5, 8: 6},
        compiler_params=None
        if interpret
        else pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )

    if nrec is None:

        def step_T(q_pm, q_p, c2dt2, lapw, gbar, strips, profiles):
            pbz, psz, pbx, psx = strips
            az, bz, ax, bx = profiles
            return call(
                q_pm, q_p, c2dt2, lapw, gbar, pbz, psz, pbx, psx, az, bz, ax, bx
            )

    else:

        def step_T(q_pm, q_p, c2dt2, lapw, gbar, strips, profiles, rz, rx, yb):
            """rz: (1, nrec) int32; rx: (nrec, 1) int32; yb: (nrec, 1) f32."""
            pbz, psz, pbx, psx = strips
            az, bz, ax, bx = profiles
            return call(
                q_pm, q_p, c2dt2, lapw, gbar, pbz, psz, pbx, psx,
                az, bz, ax, bx, rz, rx, yb,
            )

    return step_T


def make_fused_reverse_step(grid: Grid, nsrc: int, nrec: int,
                            interpret: bool = False):
    """One kernel per reverse step: reconstruction (+in-kernel source and
    ring imposition) AND the transposed CPML step (+receiver MXU injection
    and imaging), with Lap(p_t) kept as an in-VMEM value — merging
    make_recon_kernel and make_fused_adjoint_step saves the lapw HBM
    round-trip and a dispatch per step.

    rev(p_tp1, p_t, c2, sz, sx, amp, rings(4), q_pm, q_p, gbar, strips(4),
        profiles(4), rz, rx, yb)
      -> (p_tm1, q_pm', q_p', gbar', strips'(4))
    """
    from ..propagators.boundary import RingSpec

    NZ, NX = grid.padded_shape
    r = grid.radius
    S = strip_depth(grid)
    SE = S + r
    d1z = tuple(float(c) / grid.h[0] for c in D1_COEFFS[grid.order])
    d2z = tuple(float(c) / grid.h[0] ** 2 for c in D2_COEFFS[grid.order])
    d1x = tuple(float(c) / grid.h[1] for c in D1_COEFFS[grid.order])
    d2x = tuple(float(c) / grid.h[1] ** 2 for c in D2_COEFFS[grid.order])
    PZ, PX = 8, 128
    fs = grid.pad if grid.free_surface else None
    ring_slices = RingSpec.build(grid).slices
    NR = len(ring_slices)

    def kernel(*refs):
        (p_tp1_ref, p_t_ref, c2_ref, sz_ref, sx_ref, amp_ref) = refs[:6]
        ring_refs = refs[6 : 6 + NR]
        (q_pm_ref, q_p_ref, gbar_ref,
         pbz_ref, psz_ref, pbx_ref, psx_ref,
         az_ref, bz_ref, ax_ref, bx_ref, rz_ref, rx_ref, yb_ref,
         p_tm1_ref, q_pm_o_ref, q_p_o_ref, gbar_o_ref,
         pbz_o_ref, psz_o_ref, pbx_o_ref, psx_o_ref,
         scr_ref, zs_ref, zs2_ref, xs_ref, xs2_ref) = refs[6 + NR :]

        def zero_frame():
            scr_ref[PZ - r : PZ, :] = jnp.zeros((r, NX + 2 * PX), scr_ref.dtype)
            scr_ref[PZ + NZ : PZ + NZ + r, :] = jnp.zeros(
                (r, NX + 2 * PX), scr_ref.dtype
            )
            scr_ref[:, PX - r : PX] = jnp.zeros((NZ + 2 * PZ, r), scr_ref.dtype)
            scr_ref[:, PX + NX : PX + NX + r] = jnp.zeros(
                (NZ + 2 * PZ, r), scr_ref.dtype
            )

        # ---- reconstruction: p_tm1 + lapw (in VMEM) ----
        zero_frame()
        scr_ref[PZ : PZ + NZ, PX : PX + NX] = p_t_ref[:]
        lapw = _shift_sum_rows(scr_ref, d2z, r, 0, NZ, NX, PZ, PX) + _shift_sum_cols(
            scr_ref, d2x, r, 0, NX, NZ, PZ, PX
        )
        body = 2.0 * p_t_ref[:] - p_tp1_ref[:] + c2_ref[:] * lapw
        ziota = jax.lax.broadcasted_iota(jnp.int32, (NZ, NX), 0)
        xiota = jax.lax.broadcasted_iota(jnp.int32, (NZ, NX), 1)
        for j in range(nsrc):
            mask = (ziota == sz_ref[0, j]) & (xiota == sx_ref[0, j])
            body = body + amp_ref[0, j] * mask.astype(body.dtype)
        p_tm1_ref[:] = body
        for sl, ring_ref in zip(ring_slices, ring_refs):
            p_tm1_ref[sl[0], sl[1]] = ring_ref[:]

        # ---- transposed step (lambda = q_p + receiver MXU injection) ----
        mzt = (
            jax.lax.broadcasted_iota(jnp.int32, (NZ, nrec), 0) == rz_ref[:]
        ).astype(jnp.float32)
        u_rec = (
            jax.lax.broadcasted_iota(jnp.int32, (nrec, NX), 1) == rx_ref[:]
        ).astype(jnp.float32) * yb_ref[:]
        lam = q_p_ref[:] + jnp.dot(mzt, u_rec, preferred_element_type=jnp.float32)
        if fs is not None:  # transpose of the pressure-release row pin
            lam = lam * (
                jax.lax.broadcasted_iota(jnp.int32, (NZ, 1), 0) != fs
            ).astype(jnp.float32)

        scr_ref[PZ : PZ + NZ, PX : PX + NX] = c2_ref[:] * lam
        q_pm_o_ref[:] = -lam
        gbar_o_ref[:] = gbar_ref[:] + lam * lapw
        q_p_o_ref[:] = (
            q_pm_ref[:]
            + 2.0 * lam
            + _shift_sum_rows(scr_ref, d2z, r, 0, NZ, NX, PZ, PX)
            + _shift_sum_cols(scr_ref, d2x, r, 0, NX, NZ, PZ, PX)
        )

        for s, R0 in ((0, 0), (1, NZ - S)):
            a = az_ref[s]
            b = bz_ref[s]
            u_strip = scr_ref[PZ + R0 : PZ + R0 + S, PX : PX + NX]
            ps_tot = psz_ref[s] + u_strip
            psz_o_ref[s] = b * ps_tot
            w_s = a * ps_tot
            d1u = _shift_sum_rows(scr_ref, d1z, r, R0, S, NX, PZ, PX)
            off = r if s == 0 else 2 * r
            zs_ref[:] = jnp.zeros_like(zs_ref)
            zs_ref[off : off + S, :] = w_s
            d1w = None
            d2w = None
            for k, c in enumerate(d1z):
                if c != 0.0:
                    t = c * zs_ref[k : k + SE, :]
                    d1w = t if d1w is None else d1w + t
            for k, c in enumerate(d2z):
                if c != 0.0:
                    t = c * zs_ref[k : k + SE, :]
                    d2w = t if d2w is None else d2w + t
            strip_in_ext = slice(0, S) if s == 0 else slice(r, SE)
            pb_tot = pbz_ref[s] - d1u - d1w[strip_in_ext]
            pbz_o_ref[s] = b * pb_tot
            y_s = a * pb_tot
            zs2_ref[:] = jnp.zeros_like(zs2_ref)
            zs2_ref[off : off + S, :] = y_s
            d1y = None
            for k, c in enumerate(d1z):
                if c != 0.0:
                    t = c * zs2_ref[k : k + SE, :]
                    d1y = t if d1y is None else d1y + t
            ext = slice(0, SE) if s == 0 else slice(NZ - SE, NZ)
            q_p_o_ref[ext, :] = q_p_o_ref[ext, :] + d2w - d1y

        for s, C0 in ((0, 0), (1, NX - S)):
            a = ax_ref[s]
            b = bx_ref[s]
            u_strip = scr_ref[PZ : PZ + NZ, PX + C0 : PX + C0 + S]
            ps_tot = psx_ref[s] + u_strip
            psx_o_ref[s] = b * ps_tot
            w_s = a * ps_tot
            d1u = _shift_sum_cols(scr_ref, d1x, r, C0, S, NZ, PZ, PX)
            off = r if s == 0 else 2 * r
            xs_ref[:] = jnp.zeros_like(xs_ref)
            xs_ref[:, off : off + S] = w_s
            d1w = None
            d2w = None
            for k, c in enumerate(d1x):
                if c != 0.0:
                    t = c * xs_ref[:, k : k + SE]
                    d1w = t if d1w is None else d1w + t
            for k, c in enumerate(d2x):
                if c != 0.0:
                    t = c * xs_ref[:, k : k + SE]
                    d2w = t if d2w is None else d2w + t
            strip_in_ext = slice(0, S) if s == 0 else slice(r, SE)
            pb_tot = pbx_ref[s] - d1u - d1w[:, strip_in_ext]
            pbx_o_ref[s] = b * pb_tot
            y_s = a * pb_tot
            xs2_ref[:] = jnp.zeros_like(xs2_ref)
            xs2_ref[:, off : off + S] = y_s
            d1y = None
            for k, c in enumerate(d1x):
                if c != 0.0:
                    t = c * xs2_ref[:, k : k + SE]
                    d1y = t if d1y is None else d1y + t
            ext = slice(0, SE) if s == 0 else slice(NX - SE, NX)
            q_p_o_ref[:, ext] = q_p_o_ref[:, ext] + d2w - d1y

    dtype = jnp.float32
    vspec = bspec(memory_space=pltpu.VMEM)
    out_shape = (
        jax.ShapeDtypeStruct((NZ, NX), dtype),  # p_tm1
        jax.ShapeDtypeStruct((NZ, NX), dtype),  # q_pm'
        jax.ShapeDtypeStruct((NZ, NX), dtype),  # q_p'
        jax.ShapeDtypeStruct((NZ, NX), dtype),  # gbar'
        jax.ShapeDtypeStruct((2, S, NX), dtype),
        jax.ShapeDtypeStruct((2, S, NX), dtype),
        jax.ShapeDtypeStruct((2, NZ, S), dtype),
        jax.ShapeDtypeStruct((2, NZ, S), dtype),
    )
    n_in = 6 + NR + 14
    call = pl.pallas_call(
        kernel,
        out_shape=out_shape,
        in_specs=[vspec] * n_in,
        out_specs=(vspec,) * 8,
        scratch_shapes=[
            pltpu.VMEM((NZ + 16, NX + 256), dtype),
            pltpu.VMEM((S + 3 * r, NX), dtype),
            pltpu.VMEM((S + 3 * r, NX), dtype),
            pltpu.VMEM((NZ, S + 3 * r), dtype),
            pltpu.VMEM((NZ, S + 3 * r), dtype),
        ],
        # p_tp1 -> p_tm1; q_p -> q_pm'; q_pm -> q_p'; gbar -> gbar'; strips
        input_output_aliases={
            0: 0,
            6 + NR + 1: 1,
            6 + NR + 0: 2,
            6 + NR + 2: 3,
            6 + NR + 3: 4,
            6 + NR + 4: 5,
            6 + NR + 5: 6,
            6 + NR + 6: 7,
        },
        compiler_params=None
        if interpret
        else pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )

    def rev(p_tp1, p_t, c2dt2, sz, sx, amp, rings, q_pm, q_p, gbar, strips,
            profiles, rz, rx, yb):
        pbz, psz, pbx, psx = strips
        az, bz, ax, bx = profiles
        return call(
            p_tp1, p_t, c2dt2, sz, sx, amp, *rings,
            q_pm, q_p, gbar, pbz, psz, pbx, psx,
            az, bz, ax, bx, rz, rx, yb,
        )

    return rev
