"""Born modeling + least-squares RTM (CGLS) on the FWI machinery.

The Born (demigration) operator F = dR p / d vp at a smooth migration
velocity is obtained with FORWARD-mode AD (jax.jvp) through the plain
(non-custom-VJP) simulator — forward mode is tape-free through lax.scan,
so it costs ~2 forward propagations and O(grid) memory, unlike reverse
mode. Its exact transpose F^T is the boundary-saving gradient engine the
FWI stack already uses (adjoint.py; custom-VJP == full AD to 1e-10,
tests/test_adjoint.py), so CGLS on min ||F dm - d_lin||^2 converges
without an inner tape. [GENRE: LSRTM — Nemeth, Wu & Schuster 1999.]
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from .adjoint import make_simulator
from .filters import apply_response, lowpass, lowpass_response


def _per_shot(geoms, d_obs, i):
    return jax.tree.map(lambda x: x[i], geoms), d_obs[i]


def _born_kernels(problem, fmax: Optional[float]):
    """Jitted per-shot kernels with the linearization point as a call
    argument — cached on the problem per band so repeated calls (the
    Gauss-Newton outer loop) reuse one compile."""
    cache = problem.__dict__.setdefault("_born_cache", {})
    if fmax in cache:
        return cache[fmax]
    prop = problem.prop
    nt = int(problem.wavelet.shape[0])
    w = problem.wavelet
    if fmax is not None:
        h2 = jnp.asarray(lowpass_response(nt, problem.dt, fmax),
                         problem.d_obs.dtype)
        d_f = lowpass(problem.d_obs, problem.dt, fmax, axis=1)
    else:
        h2 = jnp.ones(nt + 1, problem.d_obs.dtype)
        d_f = problem.d_obs

    # jvp-capable plain forward (same discretization as prop's engine)
    sim_plain = make_simulator(
        prop.grid, prop.dt, prop.f0, prop.c_max, prop.dtype,
        use_custom_vjp=False,
    )

    def _syn_plain(v, geom):
        return apply_response(
            sim_plain(prop.c2dt2(v), w.astype(prop.dtype), geom.src_idx,
                      geom.rcv_idx),
            h2, axis=0,
        )

    def _syn_custom(v, geom):
        return apply_response(prop(v, geom, w), h2, axis=0)

    F1 = jax.jit(lambda vp, dm, geom: jax.jvp(
        lambda v: _syn_plain(v, geom), (vp,), (dm,))[1])
    Ft1 = jax.jit(lambda vp, dd, geom: jax.grad(
        lambda v: jnp.vdot(_syn_custom(v, geom), dd))(vp))
    syn1 = jax.jit(_syn_custom)
    cache[fmax] = (F1, Ft1, syn1, d_f)
    return cache[fmax]


def born_operators(problem, vp_mig: jnp.ndarray, fmax: Optional[float] = None):
    """(F, Ft, d_lin): the linearized-Born pair at ``vp_mig`` and the
    band-limited linearized data residual d_obs - R p(vp_mig).

    F(dm) -> (nshot, nt, nrec) Born data; Ft(dd) -> image. Both and the
    residual share the stage band limit ``fmax`` (in-misfit response,
    identical to an FWI stage)."""
    F1, Ft1, syn1, d_f = _born_kernels(problem, fmax)
    n_shots = int(jax.tree.leaves(problem.d_obs)[0].shape[0])

    def F(dm):
        return jnp.stack([
            F1(vp_mig, dm, _per_shot(problem.geoms, d_f, i)[0])
            for i in range(n_shots)
        ])

    def Ft(dd):
        out = None
        for i in range(n_shots):
            geom, _ = _per_shot(problem.geoms, d_f, i)
            g = Ft1(vp_mig, dd[i], geom)
            out = g if out is None else out + g
        return out

    d_lin = jnp.stack([
        d_f[i] - syn1(vp_mig, _per_shot(problem.geoms, d_f, i)[0])
        for i in range(n_shots)
    ])
    return F, Ft, d_lin


def lsrtm(
    problem,
    vp_mig: jnp.ndarray,
    n_iter: int = 8,
    fmax: Optional[float] = None,
):
    """Least-squares RTM: CGLS on min_dm ||F dm - d_lin||^2.

    Returns (dm, residual_norms) with residual_norms[0] the initial
    ||d_lin|| — the image dm is in velocity-perturbation units, free of
    the acquisition footprint that a single adjoint application (plain
    RTM) carries.

    The iteration lives on the valid-interior subspace (margin radius+1
    zeroed): that is where the boundary-saving gradient is the EXACT
    transpose of the forward-mode Born operator (adjoint dot-product
    2e-5 fp32, tests/test_lsrtm.py), which CGLS requires."""
    F, Ft, d_lin = born_operators(problem, vp_mig, fmax)
    m = problem.prop.grid.radius + 1
    mask = jnp.zeros(vp_mig.shape, vp_mig.dtype)
    mask = mask.at[tuple(slice(m, -m) for _ in vp_mig.shape)].set(1.0)
    x = jnp.zeros_like(vp_mig)
    r = d_lin  # residual d_lin - F x
    s = Ft(r) * mask
    p = s
    gamma = jnp.vdot(s, s)
    norms = [float(jnp.linalg.norm(r))]
    for _ in range(n_iter):
        q = F(p)
        alpha = gamma / jnp.vdot(q, q)
        x = x + alpha * p
        r = r - alpha * q
        norms.append(float(jnp.linalg.norm(r)))
        s = Ft(r) * mask
        gamma_new = jnp.vdot(s, s)
        p = s + (gamma_new / gamma) * p
        gamma = gamma_new
    return x, norms


def gauss_newton(
    problem,
    vp0: jnp.ndarray,
    outer: int = 5,
    n_cg: int = 5,
    fmax: Optional[float] = None,
    bounds=None,
    log_fn=None,
):
    """Truncated Gauss-Newton FWI: each outer iteration solves the
    linearized normal equations with ``n_cg`` CGLS steps (lsrtm) to get
    the model update, then Armijo line-searches the TRUE objective along
    it [GENRE: truncated-Newton FWI, Metivier & Brossier 2016]. The
    natural step is alpha ~ 1 (the update is in model units), which is
    where GN beats gradient descent's problem-scaled steps.

    Returns (vp, J_history). Cost per outer iteration ~ (2*n_cg + 3)
    propagations/shot — use small n_cg (3-8)."""
    from .optimize.linesearch import backtracking_line_search

    vg, loss = problem.stage_objectives(fmax)
    vp = vp0
    J, g = vg(vp)
    Js = [float(J)]
    for k in range(outer):
        dm, _ = lsrtm(problem, vp, n_iter=n_cg, fmax=fmax)
        res = backtracking_line_search(
            loss, vp, Js[-1], g, dm, alpha0=1.0, bounds=bounds
        )
        if not res.success:  # fall back to steepest descent
            res = backtracking_line_search(
                loss, vp, Js[-1], g, -g,
                alpha0=float(0.05 * jnp.max(jnp.abs(vp))
                             / (jnp.max(jnp.abs(g)) + 1e-30)),
                bounds=bounds,
            )
            if not res.success:
                break
        vp = res.x_new
        J, g = vg(vp)
        Js.append(float(J))
        if log_fn is not None:
            log_fn({"iter": k, "J": Js[-1], "alpha": res.alpha})
    return vp, Js
