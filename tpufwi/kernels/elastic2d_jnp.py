"""2D elastic P-SV staggered-grid velocity-stress step (spec C4,
BASELINE.json:10) — differentiable jnp kernel.

Scheme: Virieux (1986) / Levander (1988) [GENRE] with split-field CPML
memory variables on all 8 spatial derivative terms (Komatitsch & Martin
2007). Staggering (z = axis 0, x = axis 1):

    sxx, szz at (i, j);   sxz at (i+1/2, j+1/2)
    vx at (i, j+1/2);     vz at (i+1/2, j)

Identical discrete semantics to kernels/oracle_numpy.oracle_elastic_2d
(tests/test_elastic.py). Like the acoustic step, the update is **affine in
the fields**, so the adjoint engine (propagators/elastic2d.py) gets the
exact transpose from jax.vjp of this step, with primal fields recovered by
reverse time-stepping of the staggered leapfrog.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..grid import D1_STAGGERED_COEFFS, Grid
from .stencils import staggered_diff


class ElasticState(NamedTuple):
    vx: jax.Array
    vz: jax.Array
    sxx: jax.Array
    szz: jax.Array
    sxz: jax.Array
    # CPML memory: (sxx_x, sxz_z, sxz_x, szz_z, vx_x, vz_z, vx_z, vz_x)
    mem: Tuple[jax.Array, ...]


class ElasticParams(NamedTuple):
    """Traced step inputs; material fields live on the padded grid.

    lam2mu = lam + 2 mu at (i,j); lam at (i,j); mu_xz averaged to
    (i+1/2, j+1/2); bx/bz = buoyancy averaged to the velocity positions.
    az/bz_/ax/bx_ are broadcastable CPML profile arrays per axis.
    """

    lam: jax.Array
    lam2mu: jax.Array
    mu_xz: jax.Array
    buoy_x: jax.Array
    buoy_z: jax.Array
    az: jax.Array
    bz: jax.Array
    ax: jax.Array
    bx: jax.Array
    src_idx: jax.Array
    rcv_idx: jax.Array


def zero_elastic_state(shape, dtype) -> ElasticState:
    z = jnp.zeros(shape, dtype)
    return ElasticState(vx=z, vz=z, sxx=z, szz=z, sxz=z, mem=(z,) * 8)


class FreeSurfaceImage(NamedTuple):
    """Free-surface image operators [GENRE: Levander 1988 / Graves 1996]
    for the P-SV staggered grid — LINEAR maps on ghost rows:

      s(szz, sxz):  traction image, END OF THE STRESS STAGE:
              szz(fs) = 0;  szz(fs-k) = -szz(fs+k)        k = 1..radius
              sxz(fs-k) = -sxz(fs+k-1)                    (sxz at half
              nodes: index i is depth i+1/2, so the mirror of ghost depth
              -(k-1/2) is index fs+k-1)
      v(vx, vz):    even velocity image, END OF THE VELOCITY STAGE:
              vx(fs-k) = vx(fs+k);  vz(fs-k) = vz(fs+k-1)
      s_t / v_t:    exact transposes (used by the fused engine whose
              backward kernels are hand-written; the jnp engine gets the
              transposes from jax.vjp automatically).

    STABILITY (measured, order 4, homogeneous half-space, 3000 steps):
    the stress image alone is exponentially unstable (~e^{0.13/step}: the
    un-imaged ghost velocities feed interior strains and are pumped back
    through the mirrored stresses); imaging the velocities at the END of
    the full step still leaks (tail ~20% of the source peak and growing);
    imaging them BETWEEN the V and S stages decays to ~1e-5 of peak. The
    v image therefore MUST run mid-step, which both engines honour (jnp:
    end of stage_v; fused: XLA op between the V and S pallas calls).

    The imaged rows sit inside/above the boundary-ring band (z-lo ring =
    rows [pad, pad+radius)), so boundary-saving reverse reconstruction
    stays exact in the valid region exactly as for the acoustic
    pressure-release pin (propagators/boundary.py docstring).
    """

    v: object
    s: object
    v_t: object
    s_t: object


def make_free_surface_image(grid: Grid):
    """Build the FreeSurfaceImage for ``grid`` (None when free_surface off)."""
    if not grid.free_surface:
        return None
    fs = grid.pad
    K = grid.radius

    def image_s(szz, sxz):
        szz = szz.at[fs].set(0.0)
        szz = szz.at[fs - K : fs].set(-szz[fs + 1 : fs + K + 1][::-1])
        sxz = sxz.at[fs - K : fs].set(-sxz[fs : fs + K][::-1])
        return szz, sxz

    def image_s_t(szzb, sxzb):
        szzb = szzb.at[fs + 1 : fs + K + 1].add(-szzb[fs - K : fs][::-1])
        szzb = szzb.at[fs - K : fs + 1].set(0.0)
        sxzb = sxzb.at[fs : fs + K].add(-sxzb[fs - K : fs][::-1])
        sxzb = sxzb.at[fs - K : fs].set(0.0)
        return szzb, sxzb

    def image_v(vx, vz):
        vx = vx.at[fs - K : fs].set(vx[fs + 1 : fs + K + 1][::-1])
        vz = vz.at[fs - K : fs].set(vz[fs : fs + K][::-1])
        return vx, vz

    def image_v_t(vxb, vzb):
        vxb = vxb.at[fs + 1 : fs + K + 1].add(vxb[fs - K : fs][::-1])
        vxb = vxb.at[fs - K : fs].set(0.0)
        vzb = vzb.at[fs : fs + K].add(vzb[fs - K : fs][::-1])
        vzb = vzb.at[fs - K : fs].set(0.0)
        return vxb, vzb

    return FreeSurfaceImage(v=image_v, s=image_s, v_t=image_v_t, s_t=image_s_t)


def make_elastic_step(
    grid: Grid, dt: float, source_type: str = "pressure", record: str = "v"
):
    """Build ``step(state, params, w_t) -> (state', rec)``.

    rec is (nrec, 2) stacked (vz, vx) when record == 'v', else (nrec,)
    pressure -(sxx+szz)/2. When ``grid.free_surface`` the stress-image
    operator (make_free_surface_image) is applied at the end of the stress
    stage, and build_profiles disables the z-lo CPML (free_lo).
    """
    if grid.ndim != 2:
        raise ValueError("elastic P-SV kernel is 2D")
    image = make_free_surface_image(grid)
    cs = D1_STAGGERED_COEFFS[grid.order]
    hz, hx = grid.h
    tz = tuple(float(c) / hz for c in cs)
    tx = tuple(float(c) / hx for c in cs)
    dt = float(dt)

    def dplus_z(f):
        return staggered_diff(f, tz, 0, True)

    def dminus_z(f):
        return staggered_diff(f, tz, 0, False)

    def dplus_x(f):
        return staggered_diff(f, tx, 1, True)

    def dminus_x(f):
        return staggered_diff(f, tx, 1, False)

    def stage_v(vx, vz, sxx, szz, sxz, memV, p: ElasticParams, w_t):
        """Velocity half-step. memV = (m_sxx_x, m_sxz_z, m_sxz_x, m_szz_z).
        Applies the force source (it lands on vz after the derivative work,
        mirroring the oracle ordering where stresses consume pre-source vz
        only in the NEXT stage)."""
        m_sxx_x, m_sxz_z, m_sxz_x, m_szz_z = memV
        d_sxx_x = dplus_x(sxx)  # at (i, j+1/2)
        d_sxz_z = dminus_z(sxz)
        m_sxx_x = p.bx * m_sxx_x + p.ax * d_sxx_x
        m_sxz_z = p.bz * m_sxz_z + p.az * d_sxz_z
        vx = vx + dt * p.buoy_x * (d_sxx_x + m_sxx_x + d_sxz_z + m_sxz_z)

        d_sxz_x = dminus_x(sxz)  # at (i+1/2, j)
        d_szz_z = dplus_z(szz)
        m_sxz_x = p.bx * m_sxz_x + p.ax * d_sxz_x
        m_szz_z = p.bz * m_szz_z + p.az * d_szz_z
        vz = vz + dt * p.buoy_z * (d_sxz_x + m_sxz_x + d_szz_z + m_szz_z)
        if image is not None:  # even ghost-velocity image, MID-step
            vx, vz = image.v(vx, vz)
        return vx, vz, (m_sxx_x, m_sxz_z, m_sxz_x, m_szz_z)

    def stage_s(vx, vz, sxx, szz, sxz, memS, p: ElasticParams, w_t):
        """Stress half-step + sources + receivers.
        memS = (m_vx_x, m_vz_z, m_vx_z, m_vz_x)."""
        m_vx_x, m_vz_z, m_vx_z, m_vz_x = memS
        d_vx_x = dminus_x(vx)  # at (i, j)
        d_vz_z = dminus_z(vz)
        m_vx_x = p.bx * m_vx_x + p.ax * d_vx_x
        m_vz_z = p.bz * m_vz_z + p.az * d_vz_z
        exx = d_vx_x + m_vx_x
        ezz = d_vz_z + m_vz_z
        sxx = sxx + dt * (p.lam2mu * exx + p.lam * ezz)
        szz = szz + dt * (p.lam2mu * ezz + p.lam * exx)

        d_vx_z = dplus_z(vx)  # at (i+1/2, j+1/2)
        d_vz_x = dplus_x(vz)
        m_vx_z = p.bz * m_vx_z + p.az * d_vx_z
        m_vz_x = p.bx * m_vz_x + p.ax * d_vz_x
        sxz = sxz + dt * p.mu_xz * ((d_vx_z + m_vx_z) + (d_vz_x + m_vz_x))

        src = tuple(p.src_idx[..., d] for d in range(2))
        if source_type == "pressure":
            sxx = sxx.at[src].add(dt * w_t, mode="drop")
            szz = szz.at[src].add(dt * w_t, mode="drop")
        vz_out = vz
        if source_type != "pressure":  # vertical force lands on vz here
            vz_out = vz.at[src].add(dt * p.buoy_z[src] * w_t, mode="drop")

        if image is not None:  # free-surface stress image, after sources
            szz, sxz = image.s(szz, sxz)

        rcv = tuple(p.rcv_idx[..., d] for d in range(2))
        if record == "v":
            rec = jnp.stack([vz_out[rcv], vx[rcv]], axis=-1)
        else:
            rec = -(sxx[rcv] + szz[rcv]) / 2.0
        return vz_out, sxx, szz, sxz, (m_vx_x, m_vz_z, m_vx_z, m_vz_x), rec

    def step(state: ElasticState, p: ElasticParams, w_t):
        memV = state.mem[:4]
        memS = state.mem[4:]
        vx, vz, memV = stage_v(
            state.vx, state.vz, state.sxx, state.szz, state.sxz, memV, p, w_t
        )
        vz, sxx, szz, sxz, memS, rec = stage_s(
            vx, vz, state.sxx, state.szz, state.sxz, memS, p, w_t
        )
        new = ElasticState(
            vx=vx, vz=vz, sxx=sxx, szz=szz, sxz=sxz, mem=memV + memS
        )
        return new, rec

    step.stage_v = stage_v
    step.stage_s = stage_s
    return step


def make_elastic_reverse_reconstruct(grid: Grid, dt: float, source_type: str = "pressure"):
    """Invert the interior staggered leapfrog (no CPML), in two stages:

      stage S: sxx_t = sxx_{t+1} - dt (lam2mu exx + lam ezz) - src_t  (etc.)
      stage V: v_{t-1/2} = v_{t+1/2} - dt buoy (D sigma_t)

    Returned as (recon_stress, recon_velocity) because the caller MUST
    re-impose the stress boundary rings between the stages: stage V reads
    sigma_t within one stencil radius of the ring, where the raw stage-S
    values are inexact (the forward update there had CPML terms).
    """
    cs = D1_STAGGERED_COEFFS[grid.order]
    hz, hx = grid.h
    tz = tuple(float(c) / hz for c in cs)
    tx = tuple(float(c) / hx for c in cs)
    dt = float(dt)

    def recon_stress(vx, vz, sxx, szz, sxz, p: ElasticParams, w_t):
        # undo the sources first (mirror of the forward ordering: the force
        # source lands on vz AFTER the stress update consumed vz)
        src = tuple(p.src_idx[..., d] for d in range(2))
        if source_type == "pressure":
            sxx = sxx.at[src].add(-dt * w_t, mode="drop")
            szz = szz.at[src].add(-dt * w_t, mode="drop")
        else:
            vz = vz.at[src].add(-dt * p.buoy_z[src] * w_t, mode="drop")
        exx = staggered_diff(vx, tx, 1, False)
        ezz = staggered_diff(vz, tz, 0, False)
        sxx_t = sxx - dt * (p.lam2mu * exx + p.lam * ezz)
        szz_t = szz - dt * (p.lam2mu * ezz + p.lam * exx)
        sxz_t = sxz - dt * p.mu_xz * (
            staggered_diff(vx, tz, 0, True) + staggered_diff(vz, tx, 1, True)
        )
        return vx, vz, sxx_t, szz_t, sxz_t

    def recon_velocity(vx, vz, sxx_t, szz_t, sxz_t, p: ElasticParams):
        vx_t = vx - dt * p.buoy_x * (
            staggered_diff(sxx_t, tx, 1, True) + staggered_diff(sxz_t, tz, 0, False)
        )
        vz_t = vz - dt * p.buoy_z * (
            staggered_diff(sxz_t, tx, 1, False) + staggered_diff(szz_t, tz, 0, True)
        )
        return vx_t, vz_t

    return recon_stress, recon_velocity
