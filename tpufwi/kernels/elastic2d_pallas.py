"""Fused Pallas/Mosaic kernels for the elastic P-SV staggered step
(SURVEY.md §2 `kernels/elastic2d_pallas.py`, spec C4).

Two single-program kernels per time step, mirroring the V/S stage split of
the jnp twin (elastic2d_jnp.py):

  * stage V: velocity update from stress divergence + CPML strip memory
  * stage S: stress update from velocity strains + CPML strip memory

Unlike the acoustic second-order form, first-order CPML memory terms are
*pointwise* (m' = b m + a D f, added locally), so strip corrections never
extend beyond the strips — they are applied as read-modify-write slices of
the output refs. Memory variables are stored on strips only:

  x-axis memories (m_sxx_x, m_sxz_x, m_vx_x, m_vz_x): (2, NZ, S)
  z-axis memories (m_sxz_z, m_szz_z, m_vx_z, m_vz_z): (2, S, NX)

Semantics are pinned against the jnp twin in tests/test_elastic_pallas.py
(interpret mode and hardware). fp32 only; forward modeling (the adjoint
path runs on the jnp engine, propagators/elastic2d.py).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_util import bspec

from ..grid import D1_STAGGERED_COEFFS, Grid
from .acoustic2d_pallas import strip_depth


class ElasticStripState(NamedTuple):
    vx: jax.Array
    vz: jax.Array
    sxx: jax.Array
    szz: jax.Array
    sxz: jax.Array
    # x-strips (2, NZ, S): m_sxx_x, m_sxz_x, m_vx_x, m_vz_x
    memx: Tuple[jax.Array, ...]
    # z-strips (2, S, NX): m_sxz_z, m_szz_z, m_vx_z, m_vz_z
    memz: Tuple[jax.Array, ...]


def zero_elastic_strip_state(grid: Grid, dtype=jnp.float32) -> ElasticStripState:
    NZ, NX = grid.padded_shape
    S = strip_depth(grid)
    z = functools.partial(jnp.zeros, dtype=dtype)
    return ElasticStripState(
        vx=z((NZ, NX)), vz=z((NZ, NX)), sxx=z((NZ, NX)), szz=z((NZ, NX)),
        sxz=z((NZ, NX)),
        memx=tuple(z((2, NZ, S)) for _ in range(4)),
        memz=tuple(z((2, S, NX)) for _ in range(4)),
    )


def _stag_rows(scr_ref, taps, row0, nrows, NX, pz, px, plus):
    """Staggered z-difference on rows [row0, row0+nrows):
    D+ f[i+1/2] = sum c_k (f[i+1+k] - f[i-k]);
    D- f[i]     = sum c_k (f[i+k] - f[i-1-k])."""
    out = None
    for k, c in enumerate(taps):
        hi, lo = (k + 1, -k) if plus else (k, -1 - k)
        zh = pz + row0 + hi
        zl = pz + row0 + lo
        term = c * (
            scr_ref[zh : zh + nrows, px : px + NX]
            - scr_ref[zl : zl + nrows, px : px + NX]
        )
        out = term if out is None else out + term
    return out


def _stag_cols(scr_ref, taps, col0, ncols, NZ, pz, px, plus):
    out = None
    for k, c in enumerate(taps):
        hi, lo = (k + 1, -k) if plus else (k, -1 - k)
        xh = px + col0 + hi
        xl = px + col0 + lo
        term = c * (
            scr_ref[pz : pz + NZ, xh : xh + ncols]
            - scr_ref[pz : pz + NZ, xl : xl + ncols]
        )
        out = term if out is None else out + term
    return out


def make_elastic_fused_step(grid: Grid, dt: float, interpret: bool = False):
    """Build step(state, mats, profiles) -> state'.

    mats = (lam, lam2mu, mu_xz, buoy_x, buoy_z) on the padded grid;
    profiles = acoustic2d_pallas.strip_profiles(grid, ...). Source and
    receiver scatter/gather stay in the caller (XLA ops)."""
    NZ, NX = grid.padded_shape
    r = grid.radius
    S = strip_depth(grid)
    cs = D1_STAGGERED_COEFFS[grid.order]
    tz = tuple(float(c) / grid.h[0] for c in cs)
    tx = tuple(float(c) / grid.h[1] for c in cs)
    dt = float(dt)
    PZ, PX = 8, 128
    dtype = jnp.float32
    vspec = bspec(memory_space=pltpu.VMEM)
    rr = r + 1  # staggered taps reach r one way, r+1 the other

    def _load_padded(scr_ref, f_ref):
        scr_ref[PZ - rr : PZ, :] = jnp.zeros((rr, NX + 2 * PX), scr_ref.dtype)
        scr_ref[PZ + NZ : PZ + NZ + rr, :] = jnp.zeros((rr, NX + 2 * PX), scr_ref.dtype)
        scr_ref[:, PX - rr : PX] = jnp.zeros((NZ + 2 * PZ, rr), scr_ref.dtype)
        scr_ref[:, PX + NX : PX + NX + rr] = jnp.zeros((NZ + 2 * PZ, rr), scr_ref.dtype)
        scr_ref[PZ : PZ + NZ, PX : PX + NX] = f_ref[:]

    # ---------------- stage V kernel ----------------
    def kernel_v(
        vx_ref, vz_ref, sxx_ref, szz_ref, sxz_ref,
        bx_mat_ref, bz_mat_ref,
        m_sxx_x_ref, m_sxz_x_ref, m_sxz_z_ref, m_szz_z_ref,
        az_ref, bzp_ref, ax_ref, bxp_ref,
        vx_o_ref, vz_o_ref,
        m_sxx_x_o, m_sxz_x_o, m_sxz_z_o, m_szz_z_o,
        scr1_ref, scr2_ref, scr3_ref,
    ):
        _load_padded(scr1_ref, sxx_ref)
        _load_padded(scr2_ref, sxz_ref)
        _load_padded(scr3_ref, szz_ref)

        d_sxx_x = _stag_cols(scr1_ref, tx, 0, NX, NZ, PZ, PX, True)
        d_sxz_z = _stag_rows(scr2_ref, tz, 0, NZ, NX, PZ, PX, False)
        vx_o_ref[:] = vx_ref[:] + dt * bx_mat_ref[:] * (d_sxx_x + d_sxz_z)

        d_sxz_x = _stag_cols(scr2_ref, tx, 0, NX, NZ, PZ, PX, False)
        d_szz_z = _stag_rows(scr3_ref, tz, 0, NZ, NX, PZ, PX, True)
        vz_o_ref[:] = vz_ref[:] + dt * bz_mat_ref[:] * (d_sxz_x + d_szz_z)

        # x-strips: m_sxx_x feeds vx, m_sxz_x feeds vz (pointwise)
        for s, C0 in ((0, 0), (1, NX - S)):
            a, b = ax_ref[s], bxp_ref[s]  # (1, S)
            sl = slice(C0, C0 + S)
            m1 = b * m_sxx_x_ref[s] + a * _stag_cols(scr1_ref, tx, C0, S, NZ, PZ, PX, True)
            m_sxx_x_o[s] = m1
            vx_o_ref[:, sl] = vx_o_ref[:, sl] + dt * bx_mat_ref[:, sl] * m1
            m2 = b * m_sxz_x_ref[s] + a * _stag_cols(scr2_ref, tx, C0, S, NZ, PZ, PX, False)
            m_sxz_x_o[s] = m2
            vz_o_ref[:, sl] = vz_o_ref[:, sl] + dt * bz_mat_ref[:, sl] * m2
        # z-strips: m_sxz_z feeds vx, m_szz_z feeds vz
        for s, R0 in ((0, 0), (1, NZ - S)):
            a, b = az_ref[s], bzp_ref[s]  # (S, 1)
            sl = slice(R0, R0 + S)
            m3 = b * m_sxz_z_ref[s] + a * _stag_rows(scr2_ref, tz, R0, S, NX, PZ, PX, False)
            m_sxz_z_o[s] = m3
            vx_o_ref[sl, :] = vx_o_ref[sl, :] + dt * bx_mat_ref[sl, :] * m3
            m4 = b * m_szz_z_ref[s] + a * _stag_rows(scr3_ref, tz, R0, S, NX, PZ, PX, True)
            m_szz_z_o[s] = m4
            vz_o_ref[sl, :] = vz_o_ref[sl, :] + dt * bz_mat_ref[sl, :] * m4

    # ---------------- stage S kernel ----------------
    def kernel_s(
        vx_ref, vz_ref, sxx_ref, szz_ref, sxz_ref,
        lam_ref, lam2mu_ref, muxz_ref,
        m_vx_x_ref, m_vz_z_ref, m_vx_z_ref, m_vz_x_ref,
        az_ref, bzp_ref, ax_ref, bxp_ref,
        sxx_o_ref, szz_o_ref, sxz_o_ref,
        m_vx_x_o, m_vz_z_o, m_vx_z_o, m_vz_x_o,
        scr1_ref, scr2_ref,
    ):
        _load_padded(scr1_ref, vx_ref)
        _load_padded(scr2_ref, vz_ref)

        exx = _stag_cols(scr1_ref, tx, 0, NX, NZ, PZ, PX, False)
        ezz = _stag_rows(scr2_ref, tz, 0, NZ, NX, PZ, PX, False)
        sxx_o_ref[:] = sxx_ref[:] + dt * (lam2mu_ref[:] * exx + lam_ref[:] * ezz)
        szz_o_ref[:] = szz_ref[:] + dt * (lam2mu_ref[:] * ezz + lam_ref[:] * exx)

        shear = _stag_rows(scr1_ref, tz, 0, NZ, NX, PZ, PX, True) + _stag_cols(
            scr2_ref, tx, 0, NX, NZ, PZ, PX, True
        )
        sxz_o_ref[:] = sxz_ref[:] + dt * muxz_ref[:] * shear

        # x-strips: m_vx_x corrects exx (-> sxx, szz); m_vz_x corrects shear
        for s, C0 in ((0, 0), (1, NX - S)):
            a, b = ax_ref[s], bxp_ref[s]
            sl = slice(C0, C0 + S)
            m = b * m_vx_x_ref[s] + a * exx[:, sl]
            m_vx_x_o[s] = m
            sxx_o_ref[:, sl] = sxx_o_ref[:, sl] + dt * lam2mu_ref[:, sl] * m
            szz_o_ref[:, sl] = szz_o_ref[:, sl] + dt * lam_ref[:, sl] * m
            m2 = b * m_vz_x_ref[s] + a * _stag_cols(scr2_ref, tx, C0, S, NZ, PZ, PX, True)
            m_vz_x_o[s] = m2
            sxz_o_ref[:, sl] = sxz_o_ref[:, sl] + dt * muxz_ref[:, sl] * m2
        # z-strips: m_vz_z corrects ezz (-> sxx, szz); m_vx_z corrects shear
        for s, R0 in ((0, 0), (1, NZ - S)):
            a, b = az_ref[s], bzp_ref[s]
            sl = slice(R0, R0 + S)
            m = b * m_vz_z_ref[s] + a * ezz[sl, :]
            m_vz_z_o[s] = m
            sxx_o_ref[sl, :] = sxx_o_ref[sl, :] + dt * lam_ref[sl, :] * m
            szz_o_ref[sl, :] = szz_o_ref[sl, :] + dt * lam2mu_ref[sl, :] * m
            m2 = b * m_vx_z_ref[s] + a * _stag_rows(scr1_ref, tz, R0, S, NX, PZ, PX, True)
            m_vx_z_o[s] = m2
            sxz_o_ref[sl, :] = sxz_o_ref[sl, :] + dt * muxz_ref[sl, :] * m2

    full = jax.ShapeDtypeStruct((NZ, NX), dtype)
    xstrip = jax.ShapeDtypeStruct((2, NZ, S), dtype)
    zstrip = jax.ShapeDtypeStruct((2, S, NX), dtype)
    scr = pltpu.VMEM((NZ + 16, NX + 256), dtype)
    params = (
        None
        if interpret
        else pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)
    )

    call_v = pl.pallas_call(
        kernel_v,
        out_shape=(full, full, xstrip, xstrip, zstrip, zstrip),
        in_specs=[vspec] * 15,
        out_specs=(vspec,) * 6,
        scratch_shapes=[scr, scr, scr],
        input_output_aliases={0: 0, 1: 1, 7: 2, 8: 3, 9: 4, 10: 5},
        compiler_params=params,
        interpret=interpret,
    )
    call_s = pl.pallas_call(
        kernel_s,
        out_shape=(full, full, full, xstrip, zstrip, zstrip, xstrip),
        in_specs=[vspec] * 16,
        out_specs=(vspec,) * 7,
        input_output_aliases={2: 0, 3: 1, 4: 2, 8: 3, 9: 4, 10: 5, 11: 6},
        scratch_shapes=[scr, scr],
        compiler_params=params,
        interpret=interpret,
    )

    from .elastic2d_jnp import make_free_surface_image

    image = make_free_surface_image(grid)

    def step(state: ElasticStripState, mats, profiles):
        lam, lam2mu, mu_xz, buoy_x, buoy_z = mats
        az, bzp, ax, bxp = profiles
        m_sxx_x, m_sxz_x, m_vx_x, m_vz_x = state.memx
        m_sxz_z, m_szz_z, m_vx_z, m_vz_z = state.memz
        vx, vz, m_sxx_x, m_sxz_x, m_sxz_z, m_szz_z = call_v(
            state.vx, state.vz, state.sxx, state.szz, state.sxz,
            buoy_x, buoy_z,
            m_sxx_x, m_sxz_x, m_sxz_z, m_szz_z,
            az, bzp, ax, bxp,
        )
        if image is not None:  # even ghost-velocity image, MID-step (an
            # O(radius)-row XLA op between the two pallas calls; stability
            # analysis in elastic2d_jnp.FreeSurfaceImage)
            vx, vz = image.v(vx, vz)
        sxx, szz, sxz, m_vx_x, m_vz_z, m_vx_z, m_vz_x = call_s(
            vx, vz, state.sxx, state.szz, state.sxz,
            lam, lam2mu, mu_xz,
            m_vx_x, m_vz_z, m_vx_z, m_vz_x,
            az, bzp, ax, bxp,
        )
        return ElasticStripState(
            vx=vx, vz=vz, sxx=sxx, szz=szz, sxz=sxz,
            memx=(m_sxx_x, m_sxz_x, m_vx_x, m_vz_x),
            memz=(m_sxz_z, m_szz_z, m_vx_z, m_vz_z),
        )

    return step


def make_pallas_elastic_forward(
    grid: Grid,
    dt: float,
    f0: float,
    c_max: float,
    source_type: str = "pressure",
    record: str = "v",
    interpret: bool = False,
):
    """Forward elastic modeling on the fused kernels:
    simulate(mats, wavelet, src_idx, rcv_idx) -> seis.

    mats as produced by ElasticPropagator.material_fields(). Not
    differentiable (use the jnp engine for gradients)."""
    from jax import lax

    from .acoustic2d_pallas import strip_profiles

    step = make_elastic_fused_step(grid, dt, interpret=interpret)
    profiles = strip_profiles(grid, dt, c_max, f0)
    dtf = float(dt)
    from .elastic2d_jnp import make_free_surface_image

    image = make_free_surface_image(grid)

    def simulate(mats, wavelet, src_idx, rcv_idx):
        src = (src_idx[..., 0], src_idx[..., 1])
        rcv = (rcv_idx[..., 0], rcv_idx[..., 1])
        buoy_z = mats[4]

        def body(s, w_t):
            s = step(s, mats, profiles)
            if source_type == "pressure":
                s = s._replace(
                    sxx=s.sxx.at[src].add(dtf * w_t, mode="drop"),
                    szz=s.szz.at[src].add(dtf * w_t, mode="drop"),
                )
            else:
                s = s._replace(
                    vz=s.vz.at[src].add(dtf * buoy_z[src] * w_t, mode="drop")
                )
            if image is not None:
                szz_i, sxz_i = image.s(s.szz, s.sxz)
                s = s._replace(szz=szz_i, sxz=sxz_i)
            if record == "v":
                rec = jnp.stack([s.vz[rcv], s.vx[rcv]], axis=-1)
            else:
                rec = -(s.sxx[rcv] + s.szz[rcv]) / 2.0
            return s, rec

        _, seis = lax.scan(body, zero_elastic_strip_state(grid), wavelet)
        return seis

    return simulate
