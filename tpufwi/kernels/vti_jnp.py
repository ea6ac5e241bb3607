"""VTI pseudo-acoustic step (Thomsen epsilon/delta), plain jnp,
dimension-agnostic (2D/3D).

Coupled second-order system [GENRE: Alkhalifah 2000 / Zhou et al. 2006
pseudo-acoustic VTI; z the symmetry axis]:

    p_tt = vp^2 (1+2 eps)   LH p + vp^2 LZ q      (recorded wavefield)
    q_tt = vp^2 (1+2 delta) LH p + vp^2 LZ q      (auxiliary)

with LH the sum of CPML'd horizontal second derivatives and LZ the
CPML'd vertical one — the SAME D2 + (phi, psi) memory scheme as the
isotropic collocated engine (acoustic2d_jnp docstring), so
eps = delta = 0 makes p == q and the system reduces IDENTICALLY to that
engine. Sources go into both fields (an isotropic stress source);
receivers read p.

Stability [GENRE]: requires eps >= delta pointwise (else the SV
artifact's phase velocity turns imaginary along diagonals); enforce in
the caller (clip delta <= eps). The well-known diamond-shaped SV
artifact radiating from the source is a property of the pseudo-acoustic
approximation itself, not of this discretization.

Gradients (vp, eps, delta) run through plain AD over the checkpointed
scan (adjoint.make_simulator_vti) — the two-field system is reversible
in the interior so a boundary-saving VJP is possible, but the remat path
is exact and engine-agnostic; promote later if VTI becomes a hot path.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..grid import D1_COEFFS, D2_COEFFS, Grid
from .stencils import apply_stencil, scaled_taps


class VtiState(NamedTuple):
    p_prev: jax.Array
    p: jax.Array
    q_prev: jax.Array
    q: jax.Array
    phi: Tuple[jax.Array, ...]  # per axis: memory on D1 of (p|q)
    psi: Tuple[jax.Array, ...]


class VtiParams(NamedTuple):
    vpz2dt2: jax.Array  # vp^2 dt^2 (vertical velocity), padded grid
    f_eps: jax.Array  # 1 + 2 eps
    f_del: jax.Array  # 1 + 2 delta
    a: Tuple[jax.Array, ...]
    b: Tuple[jax.Array, ...]
    src_idx: jax.Array
    rcv_idx: jax.Array


def zero_vti_state(shape, ndim: int, dtype) -> VtiState:
    z = jnp.zeros(shape, dtype)
    return VtiState(
        p_prev=z, p=z, q_prev=z, q=z,
        phi=tuple(z for _ in range(ndim)),
        psi=tuple(z for _ in range(ndim)),
    )


def make_vti_recon(grid: Grid):
    """Reverse reconstruction for the boundary-saving VTI adjoint: invert
    the interior (CPML-free) coupled leapfrog —

        p[t-1] = 2 p[t] - p[t+1] + vz2 (f_eps LH p[t] + LZ q[t]) + src
        q[t-1] = 2 q[t] - q[t+1] + vz2 (f_del LH p[t] + LZ q[t]) + src

    exact wherever the forward update had no CPML contribution; the
    adjoint engine re-imposes saved rings of BOTH fields."""
    d2 = [scaled_taps(D2_COEFFS[grid.order], h, 2) for h in grid.h]
    ndim = grid.ndim
    z_axis = 0 if ndim == 2 else 1
    fs_row = grid.pad if grid.free_surface else None

    def recon(p_t, q_t, p_tp1, q_tp1, vz2, f_eps, f_del, src_idx, w_t):
        lh = None
        for ax in range(ndim):
            if ax == z_axis:
                continue
            v = apply_stencil(p_t, d2[ax], ax)
            lh = v if lh is None else lh + v
        lz = apply_stencil(q_t, d2[z_axis], z_axis)
        common_z = vz2 * lz
        p_tm1 = 2.0 * p_t - p_tp1 + vz2 * f_eps * lh + common_z
        q_tm1 = 2.0 * q_t - q_tp1 + vz2 * f_del * lh + common_z
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


def make_vti_step(grid: Grid):
    """Build ``step(state, params, w_t) -> (state', rec)`` (affine in the
    state for fixed model fields)."""
    d1 = [scaled_taps(D1_COEFFS[grid.order], h, 1) for h in grid.h]
    d2 = [scaled_taps(D2_COEFFS[grid.order], h, 2) for h in grid.h]
    ndim = grid.ndim
    z_axis = 0 if ndim == 2 else 1
    fs_row = grid.pad if grid.free_surface else None

    def _pin(f):
        if fs_row is None:
            return f
        idx = [slice(None)] * ndim
        idx[z_axis] = slice(fs_row, fs_row + 1)
        return f.at[tuple(idx)].set(0.0)

    def step(state: VtiState, params: VtiParams, w_t):
        lh = None  # CPML'd horizontal laplacian of p
        lz = None  # CPML'd vertical second derivative of q
        phi_new, psi_new = [], []
        for ax in range(ndim):
            f = state.q if ax == z_axis else state.p
            a, b = params.a[ax], params.b[ax]
            ph = b * state.phi[ax] + a * apply_stencil(f, d1[ax], ax)
            v = apply_stencil(f, d2[ax], ax) + apply_stencil(ph, d1[ax], ax)
            ps = b * state.psi[ax] + a * v
            contrib = v + ps
            if ax == z_axis:
                lz = contrib
            else:
                lh = contrib if lh is None else lh + contrib
            phi_new.append(ph)
            psi_new.append(ps)
        vz2 = params.vpz2dt2
        common_z = vz2 * lz
        p_next = 2.0 * state.p - state.p_prev + vz2 * params.f_eps * lh + common_z
        q_next = 2.0 * state.q - state.q_prev + vz2 * params.f_del * lh + common_z
        src = tuple(params.src_idx[..., d] for d in range(ndim))
        s_amp = vz2[src] * w_t
        p_next = p_next.at[src].add(s_amp, mode="drop")
        q_next = q_next.at[src].add(s_amp, mode="drop")
        p_next = _pin(p_next)
        q_next = _pin(q_next)
        rcv = tuple(params.rcv_idx[..., d] for d in range(ndim))
        rec = p_next[rcv]
        return (
            VtiState(state.p, p_next, state.q, q_next,
                     tuple(phi_new), tuple(psi_new)),
            rec,
        )

    return step
