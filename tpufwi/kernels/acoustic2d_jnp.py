"""Acoustic leapfrog + CPML time-step: plain-jnp twin kernel.

Dimension-agnostic (2D and 3D share this code; `acoustic3d_jnp` re-exports).
This is the differentiable correctness twin of the fused Pallas kernel
(SURVEY.md §2 `kernels/acoustic2d_jnp.py`): identical step semantics to
`kernels/oracle_numpy.oracle_forward`, CPU-runnable, and — crucially —
**affine in the wavefield state**, which the adjoint engine exploits
(see tpufwi/adjoint.py).

Discrete scheme (kappa = 1 CPML, second-order form; spec C1):

    per axis d:  phi_d' = b_d phi_d + a_d D1_d(p)
                 v_d    = D2_d(p) + D1_d(phi_d')
                 psi_d' = b_d psi_d + a_d v_d
                 lap   += v_d + psi_d'
    p+ = 2 p - p_prev + (c dt)^2 lap ;  p+[src] += (c dt)^2[src] w[t]
    rec = p+[rcv]
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..grid import D1_COEFFS, D2_COEFFS, Grid
from .stencils import apply_stencil, scaled_taps


class AcousticState(NamedTuple):
    """Leapfrog + CPML carry. phi/psi are per-axis memory variables."""

    p_prev: jax.Array
    p: jax.Array
    phi: Tuple[jax.Array, ...]
    psi: Tuple[jax.Array, ...]


class AcousticParams(NamedTuple):
    """Dynamic (traced) step inputs. Profile arrays are broadcast-shaped."""

    c2dt2: jax.Array  # (c*dt)^2 on the padded grid
    a: Tuple[jax.Array, ...]  # CPML a per axis
    b: Tuple[jax.Array, ...]  # CPML b per axis
    src_idx: jax.Array  # (nsrc, ndim) padded indices
    rcv_idx: jax.Array  # (nrec, ndim) padded indices


def zero_state(shape, ndim: int, dtype) -> AcousticState:
    z = jnp.zeros(shape, dtype)
    return AcousticState(
        p_prev=z, p=z, phi=tuple(z for _ in range(ndim)), psi=tuple(z for _ in range(ndim))
    )


def make_acoustic_step(grid: Grid):
    """Build ``step(state, params, w_t) -> (state', rec)`` for this grid.

    The FD taps (static python floats) are closed over so XLA sees them as
    compile-time constants. With ``grid.free_surface`` the pressure is
    pinned to zero on the physical surface plane (pressure-release
    boundary; the CPML above it is already disabled by cpml.build_profiles)
    — a linear constraint, so the adjoint engine transposes it for free.
    """
    d1 = [scaled_taps(D1_COEFFS[grid.order], h, 1) for h in grid.h]
    d2 = [scaled_taps(D2_COEFFS[grid.order], h, 2) for h in grid.h]
    ndim = grid.ndim
    fs_row = grid.pad if grid.free_surface else None
    z_axis = 0 if ndim == 2 else 1

    def _pin_surface(p):
        if fs_row is None:
            return p
        idx = [slice(None)] * ndim
        idx[z_axis] = slice(fs_row, fs_row + 1)
        return p.at[tuple(idx)].set(0.0)

    def step(state: AcousticState, params: AcousticParams, w_t) -> tuple:
        p = state.p
        lap = None
        phi_new = []
        psi_new = []
        for ax in range(ndim):
            a, b = params.a[ax], params.b[ax]
            ph = b * state.phi[ax] + a * apply_stencil(p, d1[ax], ax)
            v = apply_stencil(p, d2[ax], ax) + apply_stencil(ph, d1[ax], ax)
            ps = b * state.psi[ax] + a * v
            contrib = v + ps
            lap = contrib if lap is None else lap + contrib
            phi_new.append(ph)
            psi_new.append(ps)
        p_next = 2.0 * p - state.p_prev + params.c2dt2 * lap
        src = tuple(params.src_idx[..., d] for d in range(ndim))
        p_next = p_next.at[src].add(params.c2dt2[src] * w_t, mode="drop")
        p_next = _pin_surface(p_next)
        rcv = tuple(params.rcv_idx[..., d] for d in range(ndim))
        rec = p_next[rcv]
        new_state = AcousticState(
            p_prev=p, p=p_next, phi=tuple(phi_new), psi=tuple(psi_new)
        )
        return new_state, rec

    return step


def make_reverse_reconstruct_step(grid: Grid):
    """Build the pure-leapfrog backward reconstruction step.

    ``recon(p_t, p_tp1, c2dt2, src_idx, w_t) -> p_tm1`` inverts the interior
    leapfrog:  p[t-1] = 2 p[t] - p[t+1] + (c dt)^2 (Lap p[t] + src_t).
    Exact wherever the forward update had no CPML contribution (interior
    cells at distance > radius from the layer); the adjoint engine re-imposes
    the saved boundary rings on the result (SURVEY.md §3.2).
    """
    d2 = [scaled_taps(D2_COEFFS[grid.order], h, 2) for h in grid.h]
    ndim = grid.ndim
    fs_row = grid.pad if grid.free_surface else None
    z_axis = 0 if ndim == 2 else 1

    def recon(p_t, p_tp1, c2dt2, src_idx, w_t):
        lap = None
        for ax in range(ndim):
            v = apply_stencil(p_t, d2[ax], ax)
            lap = v if lap is None else lap + v
        p_tm1 = 2.0 * p_t - p_tp1 + c2dt2 * lap
        src = tuple(src_idx[..., d] for d in range(ndim))
        p_tm1 = p_tm1.at[src].add(c2dt2[src] * w_t, mode="drop")
        if fs_row is not None:
            # the forward pinned the surface row; re-impose on reconstruction
            idx = [slice(None)] * ndim
            idx[z_axis] = slice(fs_row, fs_row + 1)
            p_tm1 = p_tm1.at[tuple(idx)].set(0.0)
        return p_tm1

    return recon
