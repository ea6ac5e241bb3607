"""Fused Pallas backward kernels for the elastic P-SV adjoint (spec C4;
north star: imaging condition fused into the backward stencil kernel).

Two single-step kernels mirror the forward V/S stage split
(elastic2d_pallas.py) in reverse order, each fusing three jobs:

  R-S (reverse stage S):
    * reconstruct sigma_t from (v^{t+1/2}, sigma^{t+1}) by the interior
      staggered-leapfrog inverse, undo the source, re-impose the saved
      stress boundary rings (tape),
    * exact transpose of the affine stage-S update driving the stress
      cotangents into velocity cotangents (transpose identities on the
      zero-bordered layout: (D+)^T = -D-, (D-)^T = -D+; CPML memory
      transposes are pointwise on the strips),
    * imaging: accumulate dJ/d{lam, lam2mu, mu_xz} = dt * (primal strain x
      stress cotangent), with the same zero-memory linearization as the
      XLA engine (propagators/elastic2d.py pullS at zmem4 — strains carry
      the (1+a) CPML factor on the strips; the true memory primal is
      unreconstructible and the difference dies under rings.mask_valid).

  R-V (reverse stage V): same three jobs for the velocity stage —
    reconstruct v^{t-1/2} from sigma_t, re-impose velocity rings, transpose
    stage V into stress cotangents, accumulate dJ/d{buoy_x, buoy_z}.

Receiver cotangent scatter and the wavelet cotangent gather stay in the
XLA wrapper (propagators/elastic2d.py fused path): both are O(nrec)/O(1)
next to the O(NZ*NX) kernels. Both source types are supported: a pressure
source is undone on (sxx, szz) in R-S; a vertical FORCE source lands on vz
AFTER stage S consumed it, so BOTH reverse kernels locally undo it on
their vz copy (iota mask x dt*buoy_z[src]*w, the buoy_z-at-source values
arriving as a tiny SMEM vector) before using vz — R-S for the primal
strains, R-V for the velocity reconstruction. The source's buoy_z and
wavelet cotangent chains are O(nsrc) gathers in the wrapper. Semantics are
pinned against the XLA-engine gradient in tests/test_elastic_pallas.py.
fp32.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_util import bspec

from ..grid import D1_STAGGERED_COEFFS, Grid
from .acoustic2d_pallas import strip_depth
from .elastic2d_pallas import _stag_cols, _stag_rows

PZ, PX = 8, 128


def make_elastic_bwd_kernels(grid: Grid, dt: float, source_type: str = "pressure",
                             interpret: bool = False):
    """Build (rev_stage_s, rev_stage_v) single-step reverse pallas_calls.

    Argument orders are documented by the kernel signatures below; boundary
    rings are passed flattened (4 slabs per field, RingSpec order). All
    state-like inputs alias their outputs (donated carry)."""
    NZ, NX = grid.padded_shape
    r = grid.radius
    S = strip_depth(grid)
    cs = D1_STAGGERED_COEFFS[grid.order]
    tz = tuple(float(c) / grid.h[0] for c in cs)
    tx = tuple(float(c) / grid.h[1] for c in cs)
    ntz = tuple(-c for c in tz)
    ntx = tuple(-c for c in tx)
    dtf = float(dt)
    rr = r + 1
    dtype = jnp.float32

    from ..propagators.boundary import RingSpec

    ring_slices = RingSpec.build(grid).slices
    NRING = len(ring_slices)

    def load_padded(scr_ref, val):
        scr_ref[PZ - rr : PZ, :] = jnp.zeros((rr, NX + 2 * PX), dtype)
        scr_ref[PZ + NZ : PZ + NZ + rr, :] = jnp.zeros((rr, NX + 2 * PX), dtype)
        scr_ref[:, PX - rr : PX] = jnp.zeros((NZ + 2 * PZ, rr), dtype)
        scr_ref[:, PX + NX : PX + NX + rr] = jnp.zeros((NZ + 2 * PZ, rr), dtype)
        scr_ref[PZ : PZ + NZ, PX : PX + NX] = val

    def impose(dst_ref, ring_refs):
        for (zs, xs), ring in zip(ring_slices, ring_refs):
            dst_ref[zs, xs] = ring[:]

    # ------------------------------------------------------------------
    # reverse stage S
    # ------------------------------------------------------------------
    def kernel_rs(*refs):
        (vxp_ref, vzp_ref, sxx1_ref, szz1_ref, sxz1_ref) = refs[:5]
        rg_sxx = refs[5 : 5 + NRING]
        rg_szz = refs[5 + NRING : 5 + 2 * NRING]
        rg_sxz = refs[5 + 2 * NRING : 5 + 3 * NRING]
        k = 5 + 3 * NRING
        (w_ref, lam_ref, l2m_ref, muxz_ref,
         sxxb_ref, szzb_ref, sxzb_ref, vxb_ref, vzb_ref,
         m_vx_x_ref, m_vz_z_ref, m_vx_z_ref, m_vz_x_ref,
         glam_ref, gl2m_ref, gmuxz_ref,
         az_ref, bz_ref, ax_ref, bx_ref, sz_ref, sx_ref,
         bsrc_ref) = refs[k : k + 23]
        k += 23
        (sxx_o, szz_o, sxz_o, vxb_o, vzb_o,
         m_vx_x_o, m_vz_z_o, m_vx_z_o, m_vz_x_o,
         glam_o, gl2m_o, gmuxz_o) = refs[k : k + 12]
        scr1, scr2 = refs[k + 12 :]

        ziota = jax.lax.broadcasted_iota(jnp.int32, (NZ, NX), 0)
        xiota = jax.lax.broadcasted_iota(jnp.int32, (NZ, NX), 1)

        # ---- primal strains of v^{t+1/2} (force: stage S consumed the
        # PRE-source vz, so undo the source on the local copy first) ----
        load_padded(scr1, vxp_ref[:])
        if source_type == "pressure":
            load_padded(scr2, vzp_ref[:])
        else:
            vzc = vzp_ref[:]
            for i in range(sz_ref.shape[0]):
                mask = ((ziota == sz_ref[i]) & (xiota == sx_ref[i])).astype(dtype)
                vzc = vzc - (dtf * w_ref[0] * bsrc_ref[i]) * mask
            load_padded(scr2, vzc)
        exx = _stag_cols(scr1, tx, 0, NX, NZ, PZ, PX, False)  # D-x vx
        ezz = _stag_rows(scr2, tz, 0, NZ, NX, PZ, PX, False)  # D-z vz
        dvxz = _stag_rows(scr1, tz, 0, NZ, NX, PZ, PX, True)  # D+z vx
        dvzx = _stag_cols(scr2, tx, 0, NX, NZ, PZ, PX, True)  # D+x vz

        # ---- reconstruct sigma_t, undo source, impose rings ----
        sxx_t = sxx1_ref[:] - dtf * (l2m_ref[:] * exx + lam_ref[:] * ezz)
        szz_t = szz1_ref[:] - dtf * (l2m_ref[:] * ezz + lam_ref[:] * exx)
        if source_type == "pressure":
            for i in range(sz_ref.shape[0]):
                mask = ((ziota == sz_ref[i]) & (xiota == sx_ref[i])).astype(dtype)
                sxx_t = sxx_t - (dtf * w_ref[0]) * mask
                szz_t = szz_t - (dtf * w_ref[0]) * mask
        sxx_o[:] = sxx_t
        szz_o[:] = szz_t
        sxz_o[:] = sxz1_ref[:] - dtf * muxz_ref[:] * (dvxz + dvzx)
        impose(sxx_o, rg_sxx)
        impose(szz_o, rg_szz)
        impose(sxz_o, rg_sxz)

        # ---- imaging (zero-memory linearization; strip (1+a) factors) ----
        sxxb = sxxb_ref[:]
        szzb = szzb_ref[:]
        sxzb = sxzb_ref[:]
        gl2m_o[:] = gl2m_ref[:] + dtf * (exx * sxxb + ezz * szzb)
        glam_o[:] = glam_ref[:] + dtf * (ezz * sxxb + exx * szzb)
        gmuxz_o[:] = gmuxz_ref[:] + dtf * ((dvxz + dvzx) * sxzb)
        for s, C0 in ((0, 0), (1, NX - S)):
            a = ax_ref[s]
            sl = slice(C0, C0 + S)
            gl2m_o[:, sl] = gl2m_o[:, sl] + dtf * a * exx[:, sl] * sxxb[:, sl]
            glam_o[:, sl] = glam_o[:, sl] + dtf * a * exx[:, sl] * szzb[:, sl]
            gmuxz_o[:, sl] = gmuxz_o[:, sl] + dtf * a * dvzx[:, sl] * sxzb[:, sl]
        for s, R0 in ((0, 0), (1, NZ - S)):
            a = az_ref[s]
            sl = slice(R0, R0 + S)
            gl2m_o[sl, :] = gl2m_o[sl, :] + dtf * a * ezz[sl, :] * szzb[sl, :]
            glam_o[sl, :] = glam_o[sl, :] + dtf * a * ezz[sl, :] * sxxb[sl, :]
            gmuxz_o[sl, :] = gmuxz_o[sl, :] + dtf * a * dvxz[sl, :] * sxzb[sl, :]

        # ---- transpose: stress cotangents -> velocity cotangents ----
        exxb = dtf * (l2m_ref[:] * sxxb + lam_ref[:] * szzb)
        ezzb = dtf * (l2m_ref[:] * szzb + lam_ref[:] * sxxb)
        shb = dtf * muxz_ref[:] * sxzb

        def fill_dbar_x(scr, base, mref, mout, aref, bref):
            """scr <- padded(d^ = base + strips a*(base+m^)); m^out = b*(...)."""
            load_padded(scr, base)
            for s, C0 in ((0, 0), (1, NX - S)):
                tot = base[:, C0 : C0 + S] + mref[s]
                mout[s] = bref[s] * tot
                scr[PZ : PZ + NZ, PX + C0 : PX + C0 + S] = (
                    base[:, C0 : C0 + S] + aref[s] * tot
                )

        def fill_dbar_z(scr, base, mref, mout, aref, bref):
            load_padded(scr, base)
            for s, R0 in ((0, 0), (1, NZ - S)):
                tot = base[R0 : R0 + S, :] + mref[s]
                mout[s] = bref[s] * tot
                scr[PZ + R0 : PZ + R0 + S, PX : PX + NX] = (
                    base[R0 : R0 + S, :] + aref[s] * tot
                )

        # vx^ += (D-x)^T d_vx_x^ + (D+z)^T d_vx_z^ = -D+x(.) - D-z(.)
        fill_dbar_x(scr1, exxb, m_vx_x_ref, m_vx_x_o, ax_ref, bx_ref)
        fill_dbar_z(scr2, shb, m_vx_z_ref, m_vx_z_o, az_ref, bz_ref)
        vxb_o[:] = (
            vxb_ref[:]
            + _stag_cols(scr1, ntx, 0, NX, NZ, PZ, PX, True)
            + _stag_rows(scr2, ntz, 0, NZ, NX, PZ, PX, False)
        )
        # vz^ += (D-z)^T d_vz_z^ + (D+x)^T d_vz_x^ = -D+z(.) - D-x(.)
        fill_dbar_z(scr1, ezzb, m_vz_z_ref, m_vz_z_o, az_ref, bz_ref)
        fill_dbar_x(scr2, shb, m_vz_x_ref, m_vz_x_o, ax_ref, bx_ref)
        vzb_o[:] = (
            vzb_ref[:]
            + _stag_rows(scr1, ntz, 0, NZ, NX, PZ, PX, True)
            + _stag_cols(scr2, ntx, 0, NX, NZ, PZ, PX, False)
        )

    # ------------------------------------------------------------------
    # reverse stage V
    # ------------------------------------------------------------------
    def kernel_rv(*refs):
        (sxx_ref, szz_ref, sxz_ref, vxp_ref, vzp_ref) = refs[:5]
        rg_vx = refs[5 : 5 + NRING]
        rg_vz = refs[5 + NRING : 5 + 2 * NRING]
        k = 5 + 2 * NRING
        (bxm_ref, bzm_ref,
         vxb_ref, vzb_ref, sxxb_ref, szzb_ref, sxzb_ref,
         m_sxx_x_ref, m_sxz_z_ref, m_sxz_x_ref, m_szz_z_ref,
         gbx_ref, gbz_ref,
         az_ref, bz_ref, ax_ref, bx_ref,
         w_ref, sz_ref, sx_ref, bsrc_ref) = refs[k : k + 21]
        k += 21
        (vx_o, vz_o, sxxb_o, szzb_o, sxzb_o,
         m_sxx_x_o, m_sxz_z_o, m_sxz_x_o, m_szz_z_o,
         gbx_o, gbz_o) = refs[k : k + 11]
        scr1, scr2, scr3 = refs[k + 11 :]

        # ---- primal stress derivatives of sigma_t ----
        load_padded(scr1, sxx_ref[:])
        load_padded(scr2, sxz_ref[:])
        load_padded(scr3, szz_ref[:])
        d_sxx_x = _stag_cols(scr1, tx, 0, NX, NZ, PZ, PX, True)  # D+x sxx
        d_sxz_z = _stag_rows(scr2, tz, 0, NZ, NX, PZ, PX, False)  # D-z sxz
        d_sxz_x = _stag_cols(scr2, tx, 0, NX, NZ, PZ, PX, False)  # D-x sxz
        d_szz_z = _stag_rows(scr3, tz, 0, NZ, NX, PZ, PX, True)  # D+z szz

        # ---- reconstruct v^{t-1/2}, impose rings (force: undo the
        # source on vz first — it landed after stage V of this step) ----
        vzp = vzp_ref[:]
        if source_type != "pressure":
            zi = jax.lax.broadcasted_iota(jnp.int32, (NZ, NX), 0)
            xi = jax.lax.broadcasted_iota(jnp.int32, (NZ, NX), 1)
            for i in range(sz_ref.shape[0]):
                mask = ((zi == sz_ref[i]) & (xi == sx_ref[i])).astype(dtype)
                vzp = vzp - (dtf * w_ref[0] * bsrc_ref[i]) * mask
        vx_o[:] = vxp_ref[:] - dtf * bxm_ref[:] * (d_sxx_x + d_sxz_z)
        vz_o[:] = vzp - dtf * bzm_ref[:] * (d_sxz_x + d_szz_z)
        impose(vx_o, rg_vx)
        impose(vz_o, rg_vz)

        # ---- imaging: dJ/dbuoy = dt * (D sigma with strip (1+a)) * v'^ ----
        vxb = vxb_ref[:]
        vzb = vzb_ref[:]
        gbx_o[:] = gbx_ref[:] + dtf * (d_sxx_x + d_sxz_z) * vxb
        gbz_o[:] = gbz_ref[:] + dtf * (d_sxz_x + d_szz_z) * vzb
        for s, C0 in ((0, 0), (1, NX - S)):
            a = ax_ref[s]
            sl = slice(C0, C0 + S)
            gbx_o[:, sl] = gbx_o[:, sl] + dtf * a * d_sxx_x[:, sl] * vxb[:, sl]
            gbz_o[:, sl] = gbz_o[:, sl] + dtf * a * d_sxz_x[:, sl] * vzb[:, sl]
        for s, R0 in ((0, 0), (1, NZ - S)):
            a = az_ref[s]
            sl = slice(R0, R0 + S)
            gbx_o[sl, :] = gbx_o[sl, :] + dtf * a * d_sxz_z[sl, :] * vxb[sl, :]
            gbz_o[sl, :] = gbz_o[sl, :] + dtf * a * d_szz_z[sl, :] * vzb[sl, :]

        # ---- transpose: velocity cotangents -> stress cotangents ----
        ux = dtf * bxm_ref[:] * vxb
        uz = dtf * bzm_ref[:] * vzb

        def fill_dbar_x(scr, base, mref, mout, aref, bref):
            load_padded(scr, base)
            for s, C0 in ((0, 0), (1, NX - S)):
                tot = base[:, C0 : C0 + S] + mref[s]
                mout[s] = bref[s] * tot
                scr[PZ : PZ + NZ, PX + C0 : PX + C0 + S] = (
                    base[:, C0 : C0 + S] + aref[s] * tot
                )

        def fill_dbar_z(scr, base, mref, mout, aref, bref):
            load_padded(scr, base)
            for s, R0 in ((0, 0), (1, NZ - S)):
                tot = base[R0 : R0 + S, :] + mref[s]
                mout[s] = bref[s] * tot
                scr[PZ + R0 : PZ + R0 + S, PX : PX + NX] = (
                    base[R0 : R0 + S, :] + aref[s] * tot
                )

        # sxx^ += (D+x)^T d_sxx_x^ = -D-x(.)
        fill_dbar_x(scr1, ux, m_sxx_x_ref, m_sxx_x_o, ax_ref, bx_ref)
        sxxb_o[:] = sxxb_ref[:] + _stag_cols(scr1, ntx, 0, NX, NZ, PZ, PX, False)
        # szz^ += (D+z)^T d_szz_z^ = -D-z(.)
        fill_dbar_z(scr1, uz, m_szz_z_ref, m_szz_z_o, az_ref, bz_ref)
        szzb_o[:] = szzb_ref[:] + _stag_rows(scr1, ntz, 0, NZ, NX, PZ, PX, False)
        # sxz^ += (D-z)^T d_sxz_z^ + (D-x)^T d_sxz_x^ = -D+z(.) - D+x(.)
        fill_dbar_z(scr1, ux, m_sxz_z_ref, m_sxz_z_o, az_ref, bz_ref)
        fill_dbar_x(scr2, uz, m_sxz_x_ref, m_sxz_x_o, ax_ref, bx_ref)
        sxzb_o[:] = (
            sxzb_ref[:]
            + _stag_rows(scr1, ntz, 0, NZ, NX, PZ, PX, True)
            + _stag_cols(scr2, ntx, 0, NX, NZ, PZ, PX, True)
        )

    # ------------------------------------------------------------------
    full = jax.ShapeDtypeStruct((NZ, NX), dtype)
    xstrip = jax.ShapeDtypeStruct((2, NZ, S), dtype)
    zstrip = jax.ShapeDtypeStruct((2, S, NX), dtype)
    scr = pltpu.VMEM((NZ + 2 * PZ, NX + 2 * PX), dtype)
    vspec = bspec(memory_space=pltpu.VMEM)
    sspec = bspec(memory_space=pltpu.SMEM)
    params = (
        None
        if interpret
        else pltpu.CompilerParams(vmem_limit_bytes=110 * 1024 * 1024)
    )

    # Input positions (rings flattened, NRING=4 per field):
    # R-S: 0 vxp, 1 vzp, 2 sxx1, 3 szz1, 4 sxz1, 5-16 rings(sxx,szz,sxz),
    #      17 w(1,), 18 lam, 19 l2m, 20 muxz, 21 sxxb, 22 szzb, 23 sxzb,
    #      24 vxb, 25 vzb, 26-29 memS^, 30 glam, 31 gl2m, 32 gmuxz,
    #      33-36 profiles, 37 sz, 38 sx.
    rs_aliases = {
        2: 0, 3: 1, 4: 2,
        24: 3, 25: 4,
        26: 5, 27: 6, 28: 7, 29: 8,
        30: 9, 31: 10, 32: 11,
    }
    rs_in_specs = (
        [vspec] * 17 + [sspec] + [vspec] * 19 + [sspec, sspec, sspec]
    )
    call_rs = pl.pallas_call(
        kernel_rs,
        out_shape=(
            full, full, full, full, full,
            xstrip, zstrip, zstrip, xstrip,  # m_vx_x, m_vz_z, m_vx_z, m_vz_x
            full, full, full,
        ),
        in_specs=rs_in_specs,
        out_specs=(vspec,) * 12,
        scratch_shapes=[scr, scr],
        input_output_aliases=rs_aliases,
        compiler_params=params,
        interpret=interpret,
    )

    # R-V: 0 sxx_t, 1 szz_t, 2 sxz_t, 3 vxp, 4 vzp, 5-12 rings(vx,vz),
    #      13 bxm, 14 bzm, 15 vxb, 16 vzb, 17 sxxb, 18 szzb, 19 sxzb,
    #      20-23 memV^, 24 gbx, 25 gbz, 26-29 profiles.
    rv_aliases = {
        3: 0, 4: 1,
        17: 2, 18: 3, 19: 4,
        20: 5, 21: 6, 22: 7, 23: 8,
        24: 9, 25: 10,
    }
    call_rv = pl.pallas_call(
        kernel_rv,
        out_shape=(
            full, full, full, full, full,
            xstrip, zstrip, xstrip, zstrip,  # m_sxx_x, m_sxz_z, m_sxz_x, m_szz_z
            full, full,
        ),
        in_specs=[vspec] * 30 + [sspec] * 4,
        out_specs=(vspec,) * 11,
        scratch_shapes=[scr, scr, scr],
        input_output_aliases=rv_aliases,
        compiler_params=params,
        interpret=interpret,
    )

    return call_rs, call_rv
