"""Variable-density acoustic step (first-order-in-space staggered flux
form of the second-order pressure equation), plain jnp, dimension-
agnostic (2D/3D).

Physics:  p_tt = rho c^2 div( (1/rho) grad p ) + s
Scheme (per axis d, CPML kappa = 1):

    dp_d   = D+_d(p)                      [staggered fwd, at i+1/2]
    phi_d' = bh_d phi_d + ah_d dp_d       [CPML memory at half-points]
    q_d    = buoy_half_d * (dp_d + phi_d')
    dq_d   = D-_d(q_d)                    [staggered bwd, back to nodes]
    psi_d' = bn_d psi_d + an_d dq_d
    lap   += dq_d + psi_d'
    p+ = 2 p - p_prev + kdt2 * lap ;  p+[src] += kdt2[src] w[t]

with kdt2 = rho c^2 dt^2 (incompressibility x dt^2) and buoy_half the
buoyancy 1/rho averaged to the axis-d half-points. For constant rho the
scheme reduces to the classic staggered D-(D+) Laplacian (a valid
discretization DIFFERENT from the collocated D2 engine — parity is
pinned against the independent NumPy oracle, not acoustic2d_jnp).

The step is AFFINE in the state (p_prev, p, phi, psi) for fixed model
fields, so the boundary-saving adjoint engine (adjoint.make_simulator_vd)
gets the exact transposed operator from jax.vjp — including cotangents
for BOTH kdt2 and the per-axis buoyancies, which chain-rule to (vp, rho)
gradients in the caller. Spec: SURVEY §2 roadmap "variable-density
acoustic forward + rho gradient".
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..grid import D1_STAGGERED_COEFFS, Grid
from .stencils import scaled_taps, staggered_diff


class VdState(NamedTuple):
    p_prev: jax.Array
    p: jax.Array
    phi: Tuple[jax.Array, ...]  # per axis, at half-points
    psi: Tuple[jax.Array, ...]  # per axis, at nodes


class VdParams(NamedTuple):
    """Model fields (differentiable) + profiles + geometry."""

    kdt2: jax.Array  # rho c^2 dt^2, padded grid
    buoy_half: Tuple[jax.Array, ...]  # 1/rho at axis half-points
    an: Tuple[jax.Array, ...]  # node CPML a per axis
    bn: Tuple[jax.Array, ...]
    ah: Tuple[jax.Array, ...]  # half-point CPML a per axis
    bh: Tuple[jax.Array, ...]
    src_idx: jax.Array
    rcv_idx: jax.Array


def zero_vd_state(shape, ndim: int, dtype) -> VdState:
    z = jnp.zeros(shape, dtype)
    return VdState(
        p_prev=z, p=z,
        phi=tuple(z for _ in range(ndim)),
        psi=tuple(z for _ in range(ndim)),
    )


def buoy_to_half(buoy: jax.Array, axis: int) -> jax.Array:
    """Arithmetic average of buoyancy to the axis half-points (value at
    i belongs to the i+1/2 flux; the last half-point reuses the edge)."""
    ndim = buoy.ndim
    idx_hi = [slice(None)] * ndim
    idx_hi[axis] = slice(1, None)
    idx_lo = [slice(None)] * ndim
    idx_lo[axis] = slice(0, -1)
    avg = 0.5 * (buoy[tuple(idx_hi)] + buoy[tuple(idx_lo)])
    pad = [(0, 0)] * ndim
    pad[axis] = (0, 1)
    return jnp.pad(avg, pad, mode="edge")


def make_vd_step(grid: Grid):
    """Build ``step(state, params, w_t) -> (state', rec)``."""
    taps = [scaled_taps(D1_STAGGERED_COEFFS[grid.order], h, 1) for h in grid.h]
    ndim = grid.ndim
    fs_row = grid.pad if grid.free_surface else None
    z_axis = 0 if ndim == 2 else 1

    def _pin_surface(p):
        if fs_row is None:
            return p
        idx = [slice(None)] * ndim
        idx[z_axis] = slice(fs_row, fs_row + 1)
        return p.at[tuple(idx)].set(0.0)

    def step(state: VdState, params: VdParams, w_t):
        p = state.p
        lap = None
        phi_new, psi_new = [], []
        for ax in range(ndim):
            dp = staggered_diff(p, taps[ax], ax, plus=True)
            ph = params.bh[ax] * state.phi[ax] + params.ah[ax] * dp
            q = params.buoy_half[ax] * (dp + ph)
            dq = staggered_diff(q, taps[ax], ax, plus=False)
            ps = params.bn[ax] * state.psi[ax] + params.an[ax] * dq
            contrib = dq + ps
            lap = contrib if lap is None else lap + contrib
            phi_new.append(ph)
            psi_new.append(ps)
        p_next = 2.0 * p - state.p_prev + params.kdt2 * lap
        src = tuple(params.src_idx[..., d] for d in range(ndim))
        p_next = p_next.at[src].add(params.kdt2[src] * w_t, mode="drop")
        p_next = _pin_surface(p_next)
        rcv = tuple(params.rcv_idx[..., d] for d in range(ndim))
        rec = p_next[rcv]
        return VdState(p, p_next, tuple(phi_new), tuple(psi_new)), rec

    return step


def make_vd_recon(grid: Grid):
    """Reverse reconstruction: invert the interior (CPML-free) update
    p[t-1] = 2 p[t] - p[t+1] + kdt2 div(buoy grad p[t]) + src."""
    taps = [scaled_taps(D1_STAGGERED_COEFFS[grid.order], h, 1) for h in grid.h]
    ndim = grid.ndim
    fs_row = grid.pad if grid.free_surface else None
    z_axis = 0 if ndim == 2 else 1

    def recon(p_t, p_tp1, kdt2, buoy_half, src_idx, w_t):
        lap = None
        for ax in range(ndim):
            dp = staggered_diff(p_t, taps[ax], ax, plus=True)
            dq = staggered_diff(buoy_half[ax] * dp, taps[ax], ax, plus=False)
            lap = dq if lap is None else lap + dq
        p_tm1 = 2.0 * p_t - p_tp1 + kdt2 * lap
        src = tuple(src_idx[..., d] for d in range(ndim))
        p_tm1 = p_tm1.at[src].add(kdt2[src] * w_t, mode="drop")
        if fs_row is not None:
            idx = [slice(None)] * ndim
            idx[z_axis] = slice(fs_row, fs_row + 1)
            p_tm1 = p_tm1.at[tuple(idx)].set(0.0)
        return p_tm1

    return recon
