"""3D isotropic elastic velocity-stress step (staggered grid), plain
jnp. Spec C4's physics family extended to 3D (beyond-spec; the 2D P-SV
engine is kernels/elastic2d_jnp.py and this module follows its staggering
conventions axis-by-axis).

Layout (y, z, x) like the acoustic 3D engines. Staggering [GENRE:
Virieux 1986 / Graves 1996], D+ = forward staggered difference to
half-points, D- = backward to nodes:

    vx (x+1/2):        dt buoy_x ( D+x sxx + D-y sxy + D-z sxz )
    vy (y+1/2):        dt buoy_y ( D-x sxy + D+y syy + D-z syz )
    vz (z+1/2):        dt buoy_z ( D-x sxz + D-y syz + D+z szz )
    sxx/syy/szz (node): lam2mu e_ii + lam (e_jj + e_kk),
                        e_ii = D-i v_i
    sxy (x+1/2,y+1/2): dt mu_xy ( D+y vx + D+x vy )
    sxz (x+1/2,z+1/2): dt mu_xz ( D+z vx + D+x vz )
    syz (y+1/2,z+1/2): dt mu_yz ( D+z vy + D+y vz )

CPML memory variables, one per derivative term: 9 on the velocity stage
+ 3 node strains + 6 shear strains = 18 full-grid arrays. This is the
correctness/differentiability engine — at production scale the state
belongs in fused kernels (ROADMAP); gradients run through the
checkpointed scan (27-array carry; boundary-saving for 3D elastic is a
later promotion, same argument as 2D).

Sources: "pressure" (explosive moment — added to the three normal
stresses) or "force_z". record: "v" -> (nrec, 3) stacked (vz, vy, vx),
or "p" -> -(sxx+syy+szz)/3.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..grid import D1_STAGGERED_COEFFS, Grid
from .stencils import scaled_taps, staggered_diff


class Elastic3dState(NamedTuple):
    v: Tuple[jax.Array, ...]  # (vx, vy, vz)
    s: Tuple[jax.Array, ...]  # (sxx, syy, szz, sxy, sxz, syz)
    memV: Tuple[jax.Array, ...]  # 9: per velocity, per axis term
    memS: Tuple[jax.Array, ...]  # 9: exx, eyy, ezz + 6 shear terms


class Elastic3dParams(NamedTuple):
    lam: jax.Array
    lam2mu: jax.Array
    mu_xy: jax.Array
    mu_xz: jax.Array
    mu_yz: jax.Array
    buoy_x: jax.Array
    buoy_y: jax.Array
    buoy_z: jax.Array
    a_n: Tuple[jax.Array, ...]  # node-profile CPML per axis (y, z, x)
    b_n: Tuple[jax.Array, ...]
    a_h: Tuple[jax.Array, ...]  # half-point profiles per axis
    b_h: Tuple[jax.Array, ...]
    src_idx: jax.Array
    rcv_idx: jax.Array


def zero_elastic3d_state(shape, dtype) -> Elastic3dState:
    z = jnp.zeros(shape, dtype)
    return Elastic3dState(
        v=(z,) * 3, s=(z,) * 6, memV=(z,) * 9, memS=(z,) * 9
    )


# axis indices in the (y, z, x) layout
AX_Y, AX_Z, AX_X = 0, 1, 2


def make_free_surface_image_3d(grid: Grid):
    """Levander/Graves stress-image free surface at z = pad (axis AX_Z),
    the straight 3D extension of the 2D pair
    (elastic2d_jnp.make_free_surface_image — see its docstring for the
    ghost-index bookkeeping and the measured requirement that the
    velocity image run MID-step):

      image_s (end of stress stage): szz(fs) = 0, szz ghost rows odd;
        sxz, syz (z at half nodes) odd about the surface.
      image_v (between the V and S stages): vx, vy (z at nodes) even;
        vz (z at half nodes) even about the surface.

    sxx, syy, sxy carry no z-traction and are not imaged. Returns None
    when grid.free_surface is off."""
    if not grid.free_surface:
        return None
    fs = grid.pad
    K = grid.radius

    def image_v(vx, vy, vz):
        vx = vx.at[:, fs - K : fs].set(vx[:, fs + 1 : fs + K + 1][:, ::-1])
        vy = vy.at[:, fs - K : fs].set(vy[:, fs + 1 : fs + K + 1][:, ::-1])
        vz = vz.at[:, fs - K : fs].set(vz[:, fs : fs + K][:, ::-1])
        return vx, vy, vz

    def image_s(szz, sxz, syz):
        szz = szz.at[:, fs].set(0.0)
        szz = szz.at[:, fs - K : fs].set(
            -szz[:, fs + 1 : fs + K + 1][:, ::-1])
        sxz = sxz.at[:, fs - K : fs].set(-sxz[:, fs : fs + K][:, ::-1])
        syz = syz.at[:, fs - K : fs].set(-syz[:, fs : fs + K][:, ::-1])
        return szz, sxz, syz

    return image_v, image_s


def make_elastic3d_step(
    grid: Grid, dt: float, source_type: str = "pressure", record: str = "v"
):
    """Build ``step(state, params, w_t) -> (state', rec)`` (affine in the
    state for fixed materials)."""
    if grid.ndim != 3:
        raise ValueError("elastic3d kernel needs a 3D grid")
    taps = [scaled_taps(D1_STAGGERED_COEFFS[grid.order], h, 1) for h in grid.h]
    image = make_free_surface_image_3d(grid)

    def dp(f, ax):  # D+ to half-points
        return staggered_diff(f, taps[ax], ax, plus=True)

    def dm(f, ax):  # D- back to nodes
        return staggered_diff(f, taps[ax], ax, plus=False)

    def cpml(m_old, d, a, b):
        m = b * m_old + a * d
        return m, d + m

    def stage_v(v3, s6, memV, p: Elastic3dParams, w_t):
        """Velocity half-step (9 CPML'd derivative terms) + MID-step
        ghost-velocity image."""
        vx, vy, vz = v3
        sxx, syy, szz, sxy, sxz, syz = s6
        an, bn, ah, bh = p.a_n, p.b_n, p.a_h, p.b_h
        mV = list(memV)
        # vx: D+x sxx (half-x), D-y sxy (node-y), D-z sxz (node-z)
        mV[0], t0 = cpml(mV[0], dp(sxx, AX_X), ah[AX_X], bh[AX_X])
        mV[1], t1 = cpml(mV[1], dm(sxy, AX_Y), an[AX_Y], bn[AX_Y])
        mV[2], t2 = cpml(mV[2], dm(sxz, AX_Z), an[AX_Z], bn[AX_Z])
        vx = vx + dt * p.buoy_x * (t0 + t1 + t2)
        # vy: D-x sxy, D+y syy, D-z syz
        mV[3], t0 = cpml(mV[3], dm(sxy, AX_X), an[AX_X], bn[AX_X])
        mV[4], t1 = cpml(mV[4], dp(syy, AX_Y), ah[AX_Y], bh[AX_Y])
        mV[5], t2 = cpml(mV[5], dm(syz, AX_Z), an[AX_Z], bn[AX_Z])
        vy = vy + dt * p.buoy_y * (t0 + t1 + t2)
        # vz: D-x sxz, D-y syz, D+z szz
        mV[6], t0 = cpml(mV[6], dm(sxz, AX_X), an[AX_X], bn[AX_X])
        mV[7], t1 = cpml(mV[7], dm(syz, AX_Y), an[AX_Y], bn[AX_Y])
        mV[8], t2 = cpml(mV[8], dp(szz, AX_Z), ah[AX_Z], bh[AX_Z])
        vz = vz + dt * p.buoy_z * (t0 + t1 + t2)
        if image is not None:  # even ghost-velocity image, MID-step
            vx, vy, vz = image[0](vx, vy, vz)
        return (vx, vy, vz), tuple(mV)

    def stage_s(v3, s6, memS, p: Elastic3dParams, w_t):
        """Stress half-step + sources + stress image + receivers."""
        vx, vy, vz = v3
        sxx, syy, szz, sxy, sxz, syz = s6
        an, bn, ah, bh = p.a_n, p.b_n, p.a_h, p.b_h
        mS = list(memS)
        mS[0], exx = cpml(mS[0], dm(vx, AX_X), an[AX_X], bn[AX_X])
        mS[1], eyy = cpml(mS[1], dm(vy, AX_Y), an[AX_Y], bn[AX_Y])
        mS[2], ezz = cpml(mS[2], dm(vz, AX_Z), an[AX_Z], bn[AX_Z])
        tr = exx + eyy + ezz
        two_mu = p.lam2mu - p.lam  # = 2 mu, from the two stored node fields
        sxx = sxx + dt * (p.lam * tr + two_mu * exx)
        syy = syy + dt * (p.lam * tr + two_mu * eyy)
        szz = szz + dt * (p.lam * tr + two_mu * ezz)

        mS[3], g0 = cpml(mS[3], dp(vx, AX_Y), ah[AX_Y], bh[AX_Y])
        mS[4], g1 = cpml(mS[4], dp(vy, AX_X), ah[AX_X], bh[AX_X])
        sxy = sxy + dt * p.mu_xy * (g0 + g1)
        mS[5], g0 = cpml(mS[5], dp(vx, AX_Z), ah[AX_Z], bh[AX_Z])
        mS[6], g1 = cpml(mS[6], dp(vz, AX_X), ah[AX_X], bh[AX_X])
        sxz = sxz + dt * p.mu_xz * (g0 + g1)
        mS[7], g0 = cpml(mS[7], dp(vy, AX_Z), ah[AX_Z], bh[AX_Z])
        mS[8], g1 = cpml(mS[8], dp(vz, AX_Y), ah[AX_Y], bh[AX_Y])
        syz = syz + dt * p.mu_yz * (g0 + g1)

        # ---- sources ----
        src = tuple(p.src_idx[..., d] for d in range(3))
        if source_type == "pressure":
            sxx = sxx.at[src].add(dt * w_t, mode="drop")
            syy = syy.at[src].add(dt * w_t, mode="drop")
            szz = szz.at[src].add(dt * w_t, mode="drop")
        else:  # vertical force on vz
            vz = vz.at[src].add(dt * p.buoy_z[src] * w_t, mode="drop")

        if image is not None:  # free-surface stress image, after sources
            szz, sxz, syz = image[1](szz, sxz, syz)

        rcv = tuple(p.rcv_idx[..., d] for d in range(3))
        if record == "v":
            rec = jnp.stack([vz[rcv], vy[rcv], vx[rcv]], axis=-1)
        else:
            rec = -(sxx[rcv] + syy[rcv] + szz[rcv]) / 3.0
        return ((vx, vy, vz), (sxx, syy, szz, sxy, sxz, syz),
                tuple(mS), rec)

    def step(state: Elastic3dState, p: Elastic3dParams, w_t):
        v3, memV = stage_v(state.v, state.s, state.memV, p, w_t)
        v3, s6, memS, rec = stage_s(v3, state.s, state.memS, p, w_t)
        return Elastic3dState(v=v3, s=s6, memV=memV, memS=memS), rec

    step.stage_v = stage_v
    step.stage_s = stage_s
    return step


def make_elastic3d_reverse_reconstruct(grid: Grid, dt: float,
                                       source_type: str = "pressure"):
    """Invert the interior staggered leapfrog (no CPML), in two stages —
    the straight 3D extension of elastic2d_jnp.make_elastic_reverse_
    reconstruct (see its docstring for why the caller must re-impose the
    stress rings between the stages):

      stage S: sigma_t = sigma_{t+1} - dt C(e(v_{t+1/2})) - src_t
      stage V: v_{t-1/2} = v_{t+1/2} - dt buoy (D sigma_t)
    """
    if grid.ndim != 3:
        raise ValueError("elastic3d reconstruct needs a 3D grid")
    taps = [scaled_taps(D1_STAGGERED_COEFFS[grid.order], h, 1)
            for h in grid.h]
    dt = float(dt)

    def dp(f, ax):
        return staggered_diff(f, taps[ax], ax, plus=True)

    def dm(f, ax):
        return staggered_diff(f, taps[ax], ax, plus=False)

    def recon_stress(v3, s6, p: Elastic3dParams, w_t):
        vx, vy, vz = v3
        sxx, syy, szz, sxy, sxz, syz = s6
        src = tuple(p.src_idx[..., d] for d in range(3))
        # undo the sources first (the force source landed on vz AFTER the
        # stress update consumed vz, so the strains below need pre-source vz)
        if source_type == "pressure":
            sxx = sxx.at[src].add(-dt * w_t, mode="drop")
            syy = syy.at[src].add(-dt * w_t, mode="drop")
            szz = szz.at[src].add(-dt * w_t, mode="drop")
        else:
            vz = vz.at[src].add(-dt * p.buoy_z[src] * w_t, mode="drop")
        exx = dm(vx, AX_X)
        eyy = dm(vy, AX_Y)
        ezz = dm(vz, AX_Z)
        tr = exx + eyy + ezz
        two_mu = p.lam2mu - p.lam
        sxx_t = sxx - dt * (p.lam * tr + two_mu * exx)
        syy_t = syy - dt * (p.lam * tr + two_mu * eyy)
        szz_t = szz - dt * (p.lam * tr + two_mu * ezz)
        sxy_t = sxy - dt * p.mu_xy * (dp(vx, AX_Y) + dp(vy, AX_X))
        sxz_t = sxz - dt * p.mu_xz * (dp(vx, AX_Z) + dp(vz, AX_X))
        syz_t = syz - dt * p.mu_yz * (dp(vy, AX_Z) + dp(vz, AX_Y))
        return ((vx, vy, vz),
                (sxx_t, syy_t, szz_t, sxy_t, sxz_t, syz_t))

    def recon_velocity(v3, s6_t, p: Elastic3dParams):
        vx, vy, vz = v3
        sxx, syy, szz, sxy, sxz, syz = s6_t
        vx_t = vx - dt * p.buoy_x * (
            dp(sxx, AX_X) + dm(sxy, AX_Y) + dm(sxz, AX_Z))
        vy_t = vy - dt * p.buoy_y * (
            dm(sxy, AX_X) + dp(syy, AX_Y) + dm(syz, AX_Z))
        vz_t = vz - dt * p.buoy_z * (
            dm(sxz, AX_X) + dm(syz, AX_Y) + dp(szz, AX_Z))
        return (vx_t, vy_t, vz_t)

    return recon_stress, recon_velocity
