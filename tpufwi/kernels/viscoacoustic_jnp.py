"""Viscoacoustic (constant-Q, single SLS) step on the staggered flux
form, plain jnp, dimension-agnostic (2D/3D).

Physics: one standard-linear-solid relaxation mechanism on the bulk
modulus [GENRE: Carcione / Blanch et al. 1995 tau-method]:

    p_tt = M (1 + tau) L p + r ,   r_t = -( r + M tau L p ) / tau_sigma

with L p = div(buoy grad p) the flux-form operator of acoustic_vd_jnp,
M = rho c^2, and the SLS pinned to the source band: tau_sigma = 1/omega0
(omega0 = 2 pi f0) and per-cell tau = 2/(Q - 1), which makes Q(omega0)
exactly the model Q (Q(w)^-1 = w tau_s tau / (1 + w^2 tau_s^2 (1+tau))).
Q -> inf gives tau -> 0 and the scheme reduces IDENTICALLY to the
variable-density engine.

Discretization: the memory ODE gets an exact exponential integrator over
dt with L p frozen (beta = exp(-dt/tau_sigma); steady state r* =
-M tau L p), and the leapfrog uses the midpoint memory value:

    R'  = beta R - (1 - beta) tau kdt2 lap        [R = r dt^2]
    p+  = 2 p - p_prev + (1 + tau) kdt2 lap + (R' + R)/2

ATTENUATION IS DISSIPATIVE IN THE INTERIOR, so the boundary-saving
reverse reconstruction that powers the acoustic/elastic adjoints does
NOT apply. Gradients use the two-level checkpointed scan
(propagators.remat.checkpointed_scan — O(sqrt(nt)) stored states,
O(2x) recompute) through plain AD; see adjoint.make_simulator_visco.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..grid import D1_STAGGERED_COEFFS, Grid
from .stencils import scaled_taps, staggered_diff


class ViscoState(NamedTuple):
    p_prev: jax.Array
    p: jax.Array
    r: jax.Array  # SLS memory, units of p (r_phys * dt^2)
    phi: Tuple[jax.Array, ...]
    psi: Tuple[jax.Array, ...]


class ViscoParams(NamedTuple):
    kdt2: jax.Array  # rho c^2 dt^2
    tau: jax.Array  # per-cell 2/(Q-1)
    buoy_half: Tuple[jax.Array, ...]
    an: Tuple[jax.Array, ...]
    bn: Tuple[jax.Array, ...]
    ah: Tuple[jax.Array, ...]
    bh: Tuple[jax.Array, ...]
    src_idx: jax.Array
    rcv_idx: jax.Array


def tau_of_q(q):
    """Per-cell SLS strength tau = 2/(Q-1) (exact Q at omega0 for the
    tau_sigma = 1/omega0 pinning used by make_visco_step)."""
    return 2.0 / (q - 1.0)


def zero_visco_state(shape, ndim: int, dtype) -> ViscoState:
    z = jnp.zeros(shape, dtype)
    return ViscoState(
        p_prev=z, p=z, r=z,
        phi=tuple(z for _ in range(ndim)),
        psi=tuple(z for _ in range(ndim)),
    )


def make_visco_step(grid: Grid, dt: float, f0: float):
    """Build ``step(state, params, w_t) -> (state', rec)`` (affine in the
    state for fixed model fields, like the vd step)."""
    taps = [scaled_taps(D1_STAGGERED_COEFFS[grid.order], h, 1) for h in grid.h]
    ndim = grid.ndim
    beta = float(np.exp(-dt * 2.0 * np.pi * f0))  # exp(-dt / tau_sigma)
    fs_row = grid.pad if grid.free_surface else None
    z_axis = 0 if ndim == 2 else 1

    def step(state: ViscoState, params: ViscoParams, w_t):
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
        mlap = params.kdt2 * lap
        r_new = beta * state.r - (1.0 - beta) * params.tau * mlap
        p_next = (
            2.0 * p - state.p_prev
            + (1.0 + params.tau) * mlap
            + 0.5 * (r_new + state.r)
        )
        src = tuple(params.src_idx[..., d] for d in range(ndim))
        p_next = p_next.at[src].add(params.kdt2[src] * w_t, mode="drop")
        if fs_row is not None:
            idx = [slice(None)] * ndim
            idx[z_axis] = slice(fs_row, fs_row + 1)
            p_next = p_next.at[tuple(idx)].set(0.0)
        rcv = tuple(params.rcv_idx[..., d] for d in range(ndim))
        rec = p_next[rcv]
        return (
            ViscoState(p, p_next, r_new, tuple(phi_new), tuple(psi_new)),
            rec,
        )

    return step
