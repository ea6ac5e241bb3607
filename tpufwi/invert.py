"""Multiscale FWI driver + CLI (SURVEY.md §3.3; spec C3, BASELINE.json:9).

Realizes the stack:
    for stage in freq_stages:            # Bunks-style continuation
        filter data + wavelet to stage.fmax
        for it in range(stage.iters):
            J, g = shot-sharded loss_and_grad(m)      # psum over ICI
            g <- precondition(g)
            d <- L-BFGS / NLCG direction; alpha <- line search
            m <- clip(m + alpha d); checkpoint; log

Checkpoint/resume (SURVEY.md §5 'failure detection'): every iteration writes
model + L-BFGS history + stage/iter + step length to <run_dir>/ckpt.npz;
`--resume` continues bit-identically (tests/test_resume.py).
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .acquisition import split_spread_survey
from .config import FwiConfig
from .filters import apply_response, lowpass, lowpass_response
from .grid import Grid
from .misfit import l2_misfit
from .optimize import LbfgsHistory, minimize
from .precondition import precondition
from .propagators.acoustic2d import AcousticPropagator
from .sharding import make_mesh, shard_shots, shot_parallel_loss
from .wavelets import ricker


@dataclasses.dataclass
class FwiProblem:
    """Propagator + survey + observed data, with stage-filtered objectives.

    ``mesh=None`` runs all shots sequentially on one device (lax.map);
    otherwise shots shard over the mesh's "shot" axis with psum reduction.
    """

    prop: AcousticPropagator
    geoms: object  # stacked Geometry (leading shot axis)
    d_obs: jax.Array  # (nshot, nt, nrec)
    wavelet: jax.Array  # (nt,)
    dt: float
    mesh: Optional[object] = None
    shot_loop: str = "map"  # "map" (lax.map) or "python" (per-shot jit)
    # optional misfit trace weights (window.py masks): (nt, nrec) shared
    # across shots, or (nshot, nt, nrec) per shot. Multiplies the residual
    # inside l2_misfit, so the adjoint source is automatically masked.
    trace_weights: Optional[jax.Array] = None

    def __post_init__(self):
        if self.mesh is not None:
            self.geoms = shard_shots(self.geoms, self.mesh)
            self.d_obs = shard_shots(self.d_obs, self.mesh)
            if self.trace_weights is not None and self.trace_weights.ndim == 3:
                self.trace_weights = shard_shots(self.trace_weights, self.mesh)

    def _build(self):
        """One jitted objective reused by every stage (filtered data and
        the stage's filter response are arguments, not baked-in constants
        — a single compile serves all frequency bands).

        Stage misfit: J = 0.5 ||H R p(w) - H d||^2 — the forward runs the
        FULL-BAND wavelet and the synthetics are band-limited in-graph
        (filters.apply_response), exactly matching the pre-filtered data.
        Band-limiting the wavelet instead is NOT equivalent (the filter's
        pre-ring clips at t=0 — see filters.lowpass docstring); with this
        formulation the stage objective vanishes at the true model and
        true source. The adjoint source is H^T r automatically via AD
        through the filter."""

        # weights: 2D (nt,nrec) masks close over the loss; per-shot 3D
        # masks ride inside the data pytree so every shot-loop flavour
        # (lax.map / python / shard_map) slices them alongside d_obs
        w2d = (
            self.trace_weights
            if self.trace_weights is not None and self.trace_weights.ndim == 2
            else None
        )

        def one_shot_loss(vp, geom, d, w, h2):
            if isinstance(d, tuple):
                d, wt = d
            else:
                wt = w2d
            seis = apply_response(self.prop(vp, geom, w), h2, axis=0)
            return l2_misfit(seis, d, weights=wt)

        if self.mesh is not None:
            total = shot_parallel_loss(one_shot_loss, self.mesh)
            self._vg = jax.jit(jax.value_and_grad(total))
            self._loss = jax.jit(total)
            return
        if self.shot_loop == "python":
            # per-shot jitted vg, accumulated on device from a host loop:
            # one dispatch per shot (~negligible vs the propagation), and
            # no while-loop wrapping of the whole-scan pallas calls (whose
            # fused output staging overflows XLA's scoped-vmem budget
            # inside lax.map bodies on this toolchain)
            vg1 = jax.jit(jax.value_and_grad(one_shot_loss))
            l1 = jax.jit(one_shot_loss)

            def _vg(vp, geoms, data, w, h2):
                J = 0.0
                g = None
                n = jax.tree.leaves(data)[0].shape[0]
                for i in range(n):
                    gm = jax.tree.map(lambda x: x[i], geoms)
                    di = jax.tree.map(lambda x: x[i], data)
                    Ji, gi = vg1(vp, gm, di, w, h2)
                    J = J + Ji
                    g = gi if g is None else g + gi
                return J, g

            def _loss(vp, geoms, data, w, h2):
                n = jax.tree.leaves(data)[0].shape[0]
                return sum(
                    l1(
                        vp,
                        jax.tree.map(lambda x: x[i], geoms),
                        jax.tree.map(lambda x: x[i], data),
                        w,
                        h2,
                    )
                    for i in range(n)
                )

            self._vg = _vg
            self._loss = _loss
            return

        def total(vp, geoms, data, w, h2):
            def one(args):
                g, d = args
                return one_shot_loss(vp, g, d, w, h2)

            return jnp.sum(jax.lax.map(one, (geoms, data)))

        self._vg = jax.jit(jax.value_and_grad(total))
        self._loss = jax.jit(total)

    def stage_objectives(self, fmax: Optional[float], wavelet=None):
        """Returns (value_and_grad(vp), loss(vp)) for one frequency stage.

        The forward always runs a full-band wavelet; the stage band limit
        is the in-misfit response H (see _build). ``wavelet`` overrides
        the (full-band) source — e.g. the estimate from stage_wavelet().
        """
        if not hasattr(self, "_vg"):
            self._build()
        nt = int(self.wavelet.shape[0])
        if fmax is not None:
            d_f = lowpass(self.d_obs, self.dt, fmax, axis=1)
            h2 = jnp.asarray(
                lowpass_response(nt, self.dt, fmax), self.d_obs.dtype
            )
        else:
            d_f = self.d_obs
            h2 = jnp.ones(nt + 1, self.d_obs.dtype)
        w_use = self.wavelet if wavelet is None else wavelet
        if self.trace_weights is not None and self.trace_weights.ndim == 3:
            d_f = (d_f, self.trace_weights)
        vg = lambda vp: self._vg(vp, self.geoms, d_f, w_use, h2)
        loss = lambda vp: self._loss(vp, self.geoms, d_f, w_use, h2)
        return vg, loss

    def forward_all(self, vp, w) -> jax.Array:
        """(nshot, nt, nrec) synthetics, forward only, host-looped (the
        scanres engine does not batch under vmap/lax.map — see module
        docstring of kernels/acoustic2d_pallas_scanres.py)."""
        geoms = self.geoms
        if self.mesh is not None:
            geoms = jax.tree.map(
                lambda x: jnp.asarray(jax.device_get(x)), geoms
            )
        if not hasattr(self, "_fwd1"):
            self._fwd1 = jax.jit(lambda v, g, w_: self.prop(v, g, w_))
        n = int(jax.tree.leaves(geoms)[0].shape[0])
        return jnp.stack([
            self._fwd1(vp, jax.tree.map(lambda x: x[i], geoms), w)
            for i in range(n)
        ])

    def stage_wavelet(self, vp, fmax: Optional[float],
                      eps_rel: float = 1e-4) -> jax.Array:
        """Source-estimated wavelet (StageCfg.source_est): one forward
        pass with the base wavelet on the current model, then the
        closed-form Wiener correction fitted between the band-limited
        synthetics and the band-limited data (source_estimation.py).
        Returns a FULL-BAND corrected wavelet (the correction spectrum is
        only constrained in-band, where the misfit looks) — feed it to
        stage_objectives(wavelet=...)."""
        from .source_estimation import estimate_wavelet

        d_f = self.d_obs
        seis = self.forward_all(vp, self.wavelet)
        if fmax is not None:
            d_f = lowpass(d_f, self.dt, fmax, axis=1)
            seis = lowpass(seis, self.dt, fmax, axis=1)
        if self.mesh is not None:
            d_f = jnp.asarray(jax.device_get(d_f))
        return estimate_wavelet(seis, d_f, self.wavelet, eps_rel=eps_rel)

    def stage_illumination(self, vp, fmax: Optional[float]):
        """Total source illumination over shots (for preconditioning)."""
        w_f = self.wavelet if fmax is None else lowpass(self.wavelet, self.dt, fmax)

        def one(geom):
            return self.prop.illumination(vp, geom, w_f)

        geoms = self.geoms
        if self.mesh is not None:
            geoms = jax.tree.map(lambda x: jax.device_get(x), geoms)
            geoms = jax.tree.map(jnp.asarray, geoms)
        return jnp.sum(jax.lax.map(one, geoms), axis=0)


def save_snapshots(run_dir: str, stage: int, vp, g=None):
    """QC plots per stage (SURVEY.md §5): model and (optionally) gradient
    PNGs under <run_dir>/figs. No-op if matplotlib is unavailable."""
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except Exception:  # pragma: no cover
        return
    figdir = os.path.join(run_dir, "figs")
    os.makedirs(figdir, exist_ok=True)
    arrs = [("vp", np.asarray(vp))] + ([("grad", np.asarray(g))] if g is not None else [])
    for name, a in arrs:
        if a.ndim != 2:
            continue
        fig, ax = plt.subplots(figsize=(10, 3))
        im = ax.imshow(a, aspect="auto", cmap="viridis" if name == "vp" else "seismic")
        fig.colorbar(im, ax=ax, shrink=0.8)
        ax.set_title(f"stage {stage}: {name}")
        fig.savefig(os.path.join(figdir, f"stage{stage:02d}_{name}.png"), dpi=110)
        plt.close(fig)


def invert(
    problem: FwiProblem,
    vp0: jax.Array,
    cfg: FwiConfig,
    resume: bool = False,
    log_fn: Optional[Callable[[dict], None]] = None,
) -> jax.Array:
    """Run the multiscale inversion described by ``cfg``. Returns vp*."""
    run_dir = cfg.run_dir
    os.makedirs(run_dir, exist_ok=True)
    ckpt_path = os.path.join(run_dir, "ckpt.npz")
    log_path = os.path.join(run_dir, "log.jsonl")

    start_stage, start_iter, init_alpha = 0, 0, None
    vp = vp0
    hist = LbfgsHistory(m=cfg.opt.lbfgs_m)
    if resume and os.path.exists(ckpt_path):
        ck = np.load(ckpt_path, allow_pickle=False)
        vp = jnp.asarray(ck["vp"], vp0.dtype)
        start_stage = int(ck["stage"])
        start_iter = int(ck["iter"]) + 1
        init_alpha = float(ck["alpha"]) if ck["alpha"] >= 0 else None
        hist = LbfgsHistory.from_arrays(ck["S"], ck["Y"], ck["SY"], m=cfg.opt.lbfgs_m)

    logf = open(log_path, "a")

    def log(rec: dict):
        logf.write(json.dumps(rec) + "\n")
        logf.flush()
        if log_fn is not None:
            log_fn(rec)

    try:
        return _invert_loop(problem, vp, cfg, hist, init_alpha, start_stage, start_iter, ckpt_path, log)
    finally:
        logf.close()


def _invert_loop(problem, vp, cfg, hist, init_alpha, start_stage, start_iter, ckpt_path, log):

    bounds = (cfg.opt.vmin, cfg.opt.vmax)
    n_cells = int(np.prod(problem.prop.grid.shape))
    nshots = int(problem.d_obs.shape[0])

    for si, stage in enumerate(cfg.stages):
        if si < start_stage:
            continue
        it0 = start_iter if si == start_stage else 0
        if it0 >= stage.iterations:
            continue
        w_est = (
            problem.stage_wavelet(vp, stage.fmax)
            if getattr(stage, "source_est", False)
            else None
        )
        vg, loss_only = problem.stage_objectives(stage.fmax, wavelet=w_est)

        pc = cfg.precond
        illum = (
            problem.stage_illumination(vp, stage.fmax) if pc.use_illumination else None
        )

        def pre(g):
            return precondition(
                g,
                illum=illum,
                illum_eps=pc.illum_eps,
                depth_power=pc.depth_power,
                dz=problem.prop.grid.h[0],
                mask_top=pc.mask_top,
                smooth_sigma=pc.smooth_sigma,
            )

        if si != start_stage or it0 == 0:
            hist.reset()  # fresh curvature at each new frequency band
            init_alpha = None

        def cb(x, info, _si=si, _it0=it0):
            it = _it0 + info.it
            if (it + 1) % cfg.checkpoint_every == 0 or it + 1 == stage.iterations:
                S, Y, SY = hist.to_arrays()
                tmp = ckpt_path + ".tmp.npz"
                np.savez(
                    tmp,
                    vp=np.asarray(x),
                    stage=_si,
                    iter=it,
                    alpha=info.alpha if info.alpha else -1.0,
                    S=S,
                    Y=Y,
                    SY=SY,
                )
                os.replace(tmp, ckpt_path)
            log(
                dict(
                    stage=_si,
                    fmax=stage.fmax,
                    iter=it,
                    J=info.f,
                    gnorm=info.gnorm,
                    alpha=info.alpha,
                    evals=info.n_evals,
                    seconds=round(info.seconds, 3),
                    shots_per_sec=round(nshots * info.n_evals / max(info.seconds, 1e-9), 2),
                    cells=n_cells,
                )
            )

        vp, infos = minimize(
            vg,
            vp,
            iterations=stage.iterations - it0,
            method=stage.method,
            bounds=bounds,
            precond=pre,
            lbfgs_m=cfg.opt.lbfgs_m,
            callback=cb,
            loss_only=loss_only,
            hist=hist,
            init_alpha=init_alpha,
            linesearch=stage.linesearch,
        )
        init_alpha = None
        start_iter = 0
        save_snapshots(os.path.dirname(ckpt_path), si, vp)

    return vp


@dataclasses.dataclass
class ElasticFwiProblem:
    """Multiparameter (Vp, Vs, rho) FWI on the elastic P-SV engine.

    Small-scale driver companion to FwiProblem (spec C4: Vp/Vs gradient):
    stage-filtered objectives over the (vp, vs, rho) pytree, consumed by
    optimize.minimize_pytree with per-field box bounds.
    """

    prop: object  # ElasticPropagator
    geoms: object
    d_obs: jax.Array  # (nshot, nt, nrec, 2) or (nshot, nt, nrec)
    wavelet: jax.Array
    dt: float

    def _build(self):
        from .misfit import l2_misfit

        def total(m, geoms, data, w, h2):
            vp_, vs_, rho_ = m

            def one(args):
                g, d = args
                seis = apply_response(
                    self.prop(vp_, vs_, rho_, g, w), h2, axis=0
                )
                return l2_misfit(seis, d)

            return jnp.sum(jax.lax.map(one, (geoms, data)))

        self._vg = jax.jit(jax.value_and_grad(total))
        self._loss = jax.jit(total)

    def stage_objectives(self, fmax: Optional[float]):
        """Full-band forward + in-misfit band limit (same formulation and
        rationale as FwiProblem._build)."""
        if not hasattr(self, "_vg"):
            self._build()
        nt = int(self.wavelet.shape[0])
        if fmax is not None:
            d_f = lowpass(self.d_obs, self.dt, fmax, axis=1)
            h2 = jnp.asarray(
                lowpass_response(nt, self.dt, fmax), self.wavelet.dtype
            )
        else:
            d_f = self.d_obs
            h2 = jnp.ones(nt + 1, self.wavelet.dtype)
        vg = lambda m: self._vg(m, self.geoms, d_f, self.wavelet, h2)
        loss = lambda m: self._loss(m, self.geoms, d_f, self.wavelet, h2)
        return vg, loss


@dataclasses.dataclass
class VdFwiProblem:
    """(vp, rho) FWI on the variable-density acoustic engine
    (adjoint.make_simulator_vd). Same stage_objectives contract as
    ElasticFwiProblem, so invert_multiparameter drives it unchanged.

    The model pytree is (vp, rho) on the PHYSICAL grid; the loss maps it
    to the engine's (kdt2, buoy_half) fields differentiably, so the
    (vp, rho) gradients arrive by chain rule through the boundary-saving
    custom VJP.
    """

    sim: object  # make_simulator_vd product
    grid: object
    dt: float
    geoms: object  # stacked Geometry (leading shot axis)
    d_obs: jax.Array  # (nshot, nt, nrec)
    wavelet: jax.Array

    def _fields(self, vp, rho):
        from .kernels.acoustic_vd_jnp import buoy_to_half

        pad = self.grid.pad
        pads = [(pad, pad)] * self.grid.ndim
        vpp = jnp.pad(vp, pads, mode="edge")
        rhp = jnp.pad(rho, pads, mode="edge")
        kdt2 = rhp * vpp**2 * (self.dt * self.dt)
        buoy = 1.0 / rhp
        bh = tuple(
            buoy_to_half(buoy, ax) for ax in range(self.grid.ndim)
        )
        return kdt2, bh

    def _build(self):
        def total(m, geoms, data, w, h2):
            vp_, rho_ = m
            kdt2, bh = self._fields(vp_, rho_)

            def one(args):
                g, d = args
                seis = apply_response(
                    self.sim(kdt2, bh, w, g.src_idx, g.rcv_idx), h2, axis=0
                )
                return l2_misfit(seis, d)

            return jnp.sum(jax.lax.map(one, (geoms, data)))

        self._vg = jax.jit(jax.value_and_grad(total))
        self._loss = jax.jit(total)

    def stage_objectives(self, fmax: Optional[float]):
        if not hasattr(self, "_vg"):
            self._build()
        nt = int(self.wavelet.shape[0])
        if fmax is not None:
            d_f = lowpass(self.d_obs, self.dt, fmax, axis=1)
            h2 = jnp.asarray(
                lowpass_response(nt, self.dt, fmax), self.wavelet.dtype
            )
        else:
            d_f = self.d_obs
            h2 = jnp.ones(nt + 1, self.wavelet.dtype)
        vg = lambda m: self._vg(m, self.geoms, d_f, self.wavelet, h2)
        loss = lambda m: self._loss(m, self.geoms, d_f, self.wavelet, h2)
        return vg, loss


def invert_elastic(
    problem,  # ElasticFwiProblem or VdFwiProblem (stage_objectives contract)
    m0,  # model pytree, e.g. (vp0, vs0, rho0) or (vp0, rho0)
    stages,  # iterable of StageCfg
    bounds,  # per-leaf (lo, hi) bounds matching m0's structure
    lbfgs_m: int = 10,
    log_fn: Optional[Callable[[dict], None]] = None,
):
    """Multiscale multiparameter inversion. Returns the final pytree."""
    from .optimize import minimize_pytree

    m = m0
    for si, stage in enumerate(stages):
        vg, loss = problem.stage_objectives(stage.fmax)

        def cb(x, info):
            if log_fn:
                log_fn(dict(stage=si, fmax=stage.fmax, iter=info.it, J=info.f,
                            gnorm=info.gnorm, alpha=info.alpha))

        m, infos, _ = minimize_pytree(
            vg, m, stage.iterations, bounds_tree=bounds,
            method=stage.method, lbfgs_m=lbfgs_m,
            loss_only=loss, callback=cb,
        )
    return m


# VdFwiProblem satisfies the same contract; the name reflects that
invert_multiparameter = invert_elastic


def build_synthetic_problem(cfg: FwiConfig, vp_true: np.ndarray, dx: float, mesh=None):
    """Assemble a Problem from a true model: survey + observed data.

    Returns (problem, vp0) with vp0 a heavily smoothed initial model.
    """
    from scipy.ndimage import gaussian_filter

    dtype = jnp.float32 if cfg.prop.dtype == "float32" else jnp.float64
    grid = Grid(shape=vp_true.shape, h=(dx,) * vp_true.ndim, pml=cfg.prop.pml, order=cfg.prop.order)
    c_max = float(cfg.opt.vmax)
    dt = grid.cfl_dt(c_max, safety=cfg.prop.cfl_safety)
    nt = int(cfg.acq.t_max / dt)
    w = ricker(cfg.acq.f0, dt, nt, dtype=dtype)
    prop = AcousticPropagator(
        grid, dt, cfg.acq.f0, c_max, dtype=dtype, impl=cfg.prop.impl
    )
    geoms = split_spread_survey(
        grid, cfg.acq.n_shots, src_z=cfg.acq.src_z, rcv_z=cfg.acq.rcv_z, rcv_dx=cfg.acq.rcv_dx
    )
    vp_t = jnp.asarray(vp_true, dtype)
    # host loop, not vmap/lax.map: per-shot kernels run sequentially on a
    # chip either way; compiled scanres neither batches under vmap nor
    # tolerates while-body fusion of its streamed outputs (scoped vmem)
    fwd1 = jax.jit(lambda g: prop(vp_t, g, w))
    d_obs = jnp.stack([
        fwd1(jax.tree.map(lambda x: x[i], geoms))
        for i in range(cfg.acq.n_shots)
    ])
    vp0_np = gaussian_filter(np.asarray(vp_true, np.float64), sigma=12.0)
    wd = int(np.sum(np.asarray(vp_true)[:, 0] <= 1500.0 + 1e-3)) if vp_true.ndim == 2 else 0
    if wd > 0:
        vp0_np[:wd] = np.asarray(vp_true)[:wd]
    vp0 = jnp.asarray(np.clip(vp0_np, cfg.opt.vmin, cfg.opt.vmax), dtype)
    problem = FwiProblem(prop=prop, geoms=geoms, d_obs=d_obs, wavelet=w, dt=dt, mesh=mesh)
    return problem, vp0


def main(argv=None):
    import argparse

    # persistent compilation cache (big win for short runs / resume)
    cache = os.environ.get("JAX_COMPILATION_CACHE_DIR") or os.path.join(
        os.getcwd(), ".jax_cache"
    )
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)

    ap = argparse.ArgumentParser(description="tpufwi multiscale FWI driver")
    ap.add_argument("--config", type=str, default=None, help="JSON config path")
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--mesh", type=int, default=0, help="shot-parallel devices (0=off)")
    ap.add_argument("overrides", nargs="*", help="dotted.key=value overrides")
    args = ap.parse_args(argv)

    cfg = FwiConfig()
    if args.config:
        with open(args.config) as f:
            cfg = FwiConfig.from_json(f.read())
    if args.overrides:
        cfg = cfg.with_overrides(args.overrides)

    from .io import marmousi_like

    vp_true, dx = marmousi_like(
        nz=cfg.model.nz, nx=cfg.model.nx, dx=cfg.model.dx
    )
    mesh = make_mesh({"shot": args.mesh}) if args.mesh else None
    problem, vp0 = build_synthetic_problem(cfg, vp_true, dx, mesh=mesh)

    def echo(rec):
        print(
            f"[stage {rec['stage']} f<{rec['fmax']}Hz it {rec['iter']:3d}] "
            f"J={rec['J']:.4e} |g|={rec['gnorm']:.3e} a={rec['alpha']:.3g} "
            f"{rec['seconds']}s {rec['shots_per_sec']} shots/s"
        )

    vp = invert(problem, vp0, cfg, resume=args.resume, log_fn=echo)
    np.save(os.path.join(cfg.run_dir, "vp_final.npy"), np.asarray(vp))
    print("final model saved to", os.path.join(cfg.run_dir, "vp_final.npy"))


if __name__ == "__main__":
    main()
