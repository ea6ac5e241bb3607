"""TTI pseudo-acoustic step (Thomsen eps/delta + tilt theta), plain jnp,
dimension-agnostic (2D, and 3D with the symmetry axis tilted in the
z-x plane).

Rotated coupled second-order system [GENRE: Alkhalifah 2000 VTI; tilt
rotation after Fletcher, Du & Fowler 2009 / Zhou et al. 2006]:

    p_tt = vpz^2 (1+2 eps)   H1 p + vpz^2 H2 q      (recorded wavefield)
    q_tt = vpz^2 (1+2 delta) H1 p + vpz^2 H2 q      (auxiliary)

where H2 is the second derivative ALONG the tilted symmetry axis and H1
the Laplacian PERPENDICULAR to it. With tilt theta measured from the
z axis in the z-x plane (theta = 0 -> VTI):

    H2 f = sin^2(th) Dxx f + cos^2(th) Dzz f + sin(2 th) Dxz f
    H1 f = cos^2(th) Dxx f + sin^2(th) Dzz f - sin(2 th) Dxz f  [+ Dyy f in 3D]

Both H1 and H2 are formed as explicit trig combinations (NOT as
lap - H2), so at theta = 0 every rotated term carries an exact 0.0/1.0
factor and the scheme reduces BITWISE to the VTI engine
(kernels/vti_jnp.py) — tests/test_tti.py asserts this.

CPML: every pure second derivative uses the same split D2 + (phi, psi)
memory recursion as the isotropic/VTI engines; the mixed derivative is
the composition of two stretched first derivatives,

    Dxz~ f = D1z(g) + phi_mix,   g = D1x f + phi_x,

reusing the xx-term's D1x memory (phi_x) and adding ONE extra memory
array per field for the z application. Axis-wise coordinate stretching
of rotated operators is the standard published treatment; it is known
to admit slow long-time instabilities for strong tilts at the corner
regions [GENRE], which is acceptable for FWI-length simulations and is
why theta fields should be smooth (the pseudo-acoustic TTI system
itself is unstable under rough theta — Fletcher-Du-Fowler's sigma fix
trades that for SV noise; we require smooth theta instead).

Unlike VTI (where p only needs horizontal memory and q only vertical),
the rotation couples every axis to both fields: state carries per-field
per-axis (phi, psi) plus one mixed-memory array per field.

Gradients (vp, eps, delta, theta) default to the VTI-style boundary-
saving custom VJP (make_tti_recon below inverts the coupled time-
symmetric interior step; landed in commit 56fcfc2) with remat AD kept
as the ground-truth fallback (adjoint.make_simulator_tti).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..grid import D1_COEFFS, D2_COEFFS, Grid
from .stencils import apply_stencil, scaled_taps


class TtiState(NamedTuple):
    p_prev: jax.Array
    p: jax.Array
    q_prev: jax.Array
    q: jax.Array
    phi_p: Tuple[jax.Array, ...]  # per axis: memory on D1 of p
    psi_p: Tuple[jax.Array, ...]  # per axis: memory on D2-chain of p
    phi_q: Tuple[jax.Array, ...]
    psi_q: Tuple[jax.Array, ...]
    mix_p: jax.Array  # memory on the z application of Dxz~ p
    mix_q: jax.Array


class TtiParams(NamedTuple):
    vpz2dt2: jax.Array  # vp^2 dt^2 (symmetry-axis velocity), padded grid
    f_eps: jax.Array  # 1 + 2 eps, padded
    f_del: jax.Array  # 1 + 2 delta, padded
    cos2t: jax.Array  # cos^2 theta, padded
    sin2t: jax.Array  # sin^2 theta, padded
    s2t: jax.Array  # sin(2 theta), padded
    a: Tuple[jax.Array, ...]
    b: Tuple[jax.Array, ...]
    src_idx: jax.Array
    rcv_idx: jax.Array


def zero_tti_state(shape, ndim: int, dtype) -> TtiState:
    z = jnp.zeros(shape, dtype)
    zs = tuple(z for _ in range(ndim))
    return TtiState(p_prev=z, p=z, q_prev=z, q=z,
                    phi_p=zs, psi_p=zs, phi_q=zs, psi_q=zs,
                    mix_p=z, mix_q=z)


def make_tti_recon(grid: Grid):
    """Reverse reconstruction for the boundary-saving TTI adjoint: invert
    the interior (CPML-free) coupled leapfrog —

        p[t-1] = 2 p[t] - p[t+1] + vz2 (f_eps H1 p[t] + H2 q[t]) + src
        q[t-1] = 2 q[t] - q[t+1] + vz2 (f_del H1 p[t] + H2 q[t]) + src

    with H1/H2 the PURE (unstretched) rotated operators: in the interior
    every CPML memory is identically zero (a = 0 there), so the forward
    update reduces to the plain trig combination of Dxx/Dzz[/Dyy] and the
    composed mixed derivative Dxz = D1z(D1x f). Exact wherever the
    forward update had no CPML contribution; the adjoint engine
    re-imposes saved rings of BOTH fields (width = radius covers the
    composed corner reach — the frame is a full rectangle, module
    docstring)."""
    d1 = [scaled_taps(D1_COEFFS[grid.order], h, 1) for h in grid.h]
    d2 = [scaled_taps(D2_COEFFS[grid.order], h, 2) for h in grid.h]
    ndim = grid.ndim
    z_axis = 0 if ndim == 2 else 1
    x_axis = ndim - 1
    fs_row = grid.pad if grid.free_surface else None

    def recon(p_t, q_t, p_tp1, q_tp1, vz2, fe, fd, c2, s2, s2t,
              src_idx, w_t):
        def h12(f):
            dxx = apply_stencil(f, d2[x_axis], x_axis)
            dzz = apply_stencil(f, d2[z_axis], z_axis)
            dxz = apply_stencil(
                apply_stencil(f, d1[x_axis], x_axis), d1[z_axis], z_axis
            )
            h1 = c2 * dxx + s2 * dzz - s2t * dxz
            h2 = s2 * dxx + c2 * dzz + s2t * dxz
            if ndim == 3:
                h1 = h1 + apply_stencil(f, d2[0], 0)
            return h1, h2

        h1p, _ = h12(p_t)
        _, h2q = h12(q_t)
        common = vz2 * h2q
        p_tm1 = 2.0 * p_t - p_tp1 + vz2 * fe * h1p + common
        q_tm1 = 2.0 * q_t - q_tp1 + vz2 * fd * h1p + common
        src = tuple(src_idx[..., d] for d in range(ndim))
        s_amp = vz2[src] * w_t
        p_tm1 = p_tm1.at[src].add(s_amp, mode="drop")
        q_tm1 = q_tm1.at[src].add(s_amp, mode="drop")
        if fs_row is not None:
            idx = [slice(None)] * ndim
            idx[z_axis] = slice(fs_row, fs_row + 1)
            p_tm1 = p_tm1.at[tuple(idx)].set(0.0)
            q_tm1 = q_tm1.at[tuple(idx)].set(0.0)
        return p_tm1, q_tm1

    return recon


def make_tti_step(grid: Grid):
    """Build ``step(state, params, w_t) -> (state', rec)`` (affine in the
    state for fixed model fields). Axis layout matches the other
    collocated engines: 2D (z, x); 3D (y, z, x) with z_axis = 1 and the
    tilt confined to the z-x plane."""
    d1 = [scaled_taps(D1_COEFFS[grid.order], h, 1) for h in grid.h]
    d2 = [scaled_taps(D2_COEFFS[grid.order], h, 2) for h in grid.h]
    ndim = grid.ndim
    z_axis = 0 if ndim == 2 else 1
    x_axis = ndim - 1
    fs_row = grid.pad if grid.free_surface else None

    def _pin(f):
        if fs_row is None:
            return f
        idx = [slice(None)] * ndim
        idx[z_axis] = slice(fs_row, fs_row + 1)
        return f.at[tuple(idx)].set(0.0)

    def step(state: TtiState, params: TtiParams, w_t):
        def stretched(f, phi, psi):
            """Per-axis stretched D2 contributions + updated memories.
            Returns (contribs[ndim], g_x, phi', psi') where g_x is the
            stretched D1x of f (input to the mixed derivative)."""
            contribs, phi_new, psi_new = [], [], []
            g_x = None
            for ax in range(ndim):
                a, b = params.a[ax], params.b[ax]
                dff = apply_stencil(f, d1[ax], ax)
                ph = b * phi[ax] + a * dff
                v = apply_stencil(f, d2[ax], ax) + apply_stencil(ph, d1[ax], ax)
                ps = b * psi[ax] + a * v
                contribs.append(v + ps)
                phi_new.append(ph)
                psi_new.append(ps)
                if ax == x_axis:
                    g_x = dff + ph
            return contribs, g_x, tuple(phi_new), tuple(psi_new)

        def mixed(g_x, mix):
            """Stretched Dz of the stretched Dx (memory ``mix``)."""
            a, b = params.a[z_axis], params.b[z_axis]
            dzg = apply_stencil(g_x, d1[z_axis], z_axis)
            mx = b * mix + a * dzg
            return dzg + mx, mx

        cp, gx_p, phi_p, psi_p = stretched(state.p, state.phi_p, state.psi_p)
        cq, gx_q, phi_q, psi_q = stretched(state.q, state.phi_q, state.psi_q)
        dxz_p, mix_p = mixed(gx_p, state.mix_p)
        dxz_q, mix_q = mixed(gx_q, state.mix_q)

        c2, s2, s2t = params.cos2t, params.sin2t, params.s2t
        h1p = c2 * cp[x_axis] + s2 * cp[z_axis] - s2t * dxz_p
        h2q = s2 * cq[x_axis] + c2 * cq[z_axis] + s2t * dxz_q
        if ndim == 3:  # y is perpendicular to the (tilted) symmetry axis
            h1p = h1p + cp[0]

        vz2 = params.vpz2dt2
        common = vz2 * h2q
        p_next = 2.0 * state.p - state.p_prev + vz2 * params.f_eps * h1p + common
        q_next = 2.0 * state.q - state.q_prev + vz2 * params.f_del * h1p + common
        src = tuple(params.src_idx[..., d] for d in range(ndim))
        s_amp = vz2[src] * w_t
        p_next = p_next.at[src].add(s_amp, mode="drop")
        q_next = q_next.at[src].add(s_amp, mode="drop")
        p_next = _pin(p_next)
        q_next = _pin(q_next)
        rcv = tuple(params.rcv_idx[..., d] for d in range(ndim))
        rec = p_next[rcv]
        return (
            TtiState(state.p, p_next, state.q, q_next,
                     phi_p, psi_p, phi_q, psi_q, mix_p, mix_q),
            rec,
        )

    return step
