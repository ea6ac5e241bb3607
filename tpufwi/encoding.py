"""Source-encoded (simultaneous-source) FWI.

Random-polarity encoding [GENRE: Krebs et al. 2009; Schuster et al.
2011 review]: because the wave equation is linear in the source, a
"supershot" that fires every source simultaneously with polarity
c_s in {+1, -1} produces data sum_s c_s d_s. One simulation per
gradient evaluation replaces n_shots of them; the cross-talk terms
sum_{s != s'} c_s c_s' <...> have zero expectation under Rademacher
codes and are suppressed by re-drawing the codes every iteration.

Validity requires a FIXED SPREAD: every shot must share the same
receiver array, so the encoded observed gather is physically the
supershot's gather (enforced at problem construction).

Mechanics: the engines' injection `p.at[src].add(c2dt2[src] * w_t)`
broadcasts a per-source amplitude row, so a (nt, nsrc) wavelet —
`w[:, None] * codes[None, :]` — drives the supershot through the
UNCHANGED boundary-saving custom VJP (tpufwi/adjoint.py); exactness
is verified by tests/test_encoding.py (supershot == coded sum of
single shots to fp roundoff, gradient == full AD on the interior).

SURVEY.md §2 lists shot DP / gradient accumulation as the scaling
axes for many shots; encoding is the orthogonal axis — it shrinks
the *work per gradient* and composes with shot DP by sharding
independent supershot realizations (n_realizations >= n_devices).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .acquisition import Geometry
from .filters import apply_response, lowpass, lowpass_response
from .misfit import MISFITS


def rademacher_codes(key, n_shots: int, dtype=jnp.float32) -> jax.Array:
    """+-1 polarity codes, one per shot."""
    return (2.0 * jax.random.bernoulli(key, 0.5, (n_shots,)) - 1.0).astype(dtype)


def encode_gather(d_obs: jax.Array, codes: jax.Array) -> jax.Array:
    """sum_s c_s d_s over the leading shot axis -> one supergather."""
    return jnp.tensordot(codes.astype(d_obs.dtype), d_obs, axes=1)


def encode_wavelet(wavelet: jax.Array, codes: jax.Array) -> jax.Array:
    """(nt,) base wavelet -> (nt, n_src) per-source coded wavelets."""
    return wavelet[:, None] * codes.astype(wavelet.dtype)[None, :]


def merge_sources(geoms) -> Geometry:
    """Stacked single-source Geometry (n_shots, 1, ndim) -> one supershot
    Geometry with all n_shots sources and the (common) receiver array."""
    src = geoms.src_idx.reshape(-1, geoms.src_idx.shape[-1])
    rcv = geoms.rcv_idx[0] if geoms.rcv_idx.ndim == 3 else geoms.rcv_idx
    return Geometry(src_idx=src, rcv_idx=rcv)


@dataclasses.dataclass
class EncodedFwiProblem:
    """Random-polarity encoded FWI on an AcousticPropagator survey.

    Same construction inputs as FwiProblem (stacked single-source
    geometry, fixed-spread d_obs of shape (n_shots, nt, nrec)); the
    objective for a PRNG key is the mean over ``n_realizations``
    independently coded supershots of the stage-filtered misfit
    0.5 ||H R p(sum_s c_s w) - H sum_s c_s d_s||^2.

    n_realizations > 1 reduces cross-talk variance at proportional
    cost, and is the natural shot-DP batch when running on a mesh.
    """

    prop: object  # AcousticPropagator
    geoms: object  # stacked Geometry, src_idx (n_shots, 1, ndim)
    d_obs: jax.Array  # (n_shots, nt, nrec) — fixed spread
    wavelet: jax.Array  # (nt,)
    dt: float
    n_realizations: int = 1
    misfit: str = "l2"
    mesh: Optional[object] = None  # realizations shard over "shot" axis

    def __post_init__(self):
        if self.geoms.src_idx.ndim != 3 or self.geoms.src_idx.shape[1] != 1:
            raise ValueError(
                "EncodedFwiProblem needs stacked single-source shots; got "
                f"src_idx {self.geoms.src_idx.shape}"
            )
        rcv = np.asarray(self.geoms.rcv_idx)
        if rcv.ndim == 3 and not (rcv == rcv[:1]).all():
            raise ValueError(
                "source encoding requires a fixed spread (every shot the "
                "same receiver array); receiver arrays differ across shots"
            )
        self.n_shots = int(self.d_obs.shape[0])
        self._super = merge_sources(self.geoms)
        if self.mesh is not None:
            n_dev = self.mesh.devices.size
            if self.n_realizations % n_dev:
                raise ValueError(
                    f"n_realizations ({self.n_realizations}) must be a "
                    f"multiple of the mesh size ({n_dev})"
                )

    def _build(self):
        misfit_fn = MISFITS[self.misfit]
        prop, g_super = self.prop, self._super

        def one_realization(vp, w_multi, d_enc, h2):
            seis = apply_response(prop(vp, g_super, w_multi), h2, axis=0)
            return misfit_fn(seis, d_enc)

        n_real = self.n_realizations

        if self.mesh is not None:
            # realizations are the "shots" of the DP lifter: independent
            # supershots shard over the mesh, scalar losses psum over ICI
            from .sharding import shot_parallel_loss

            summed = shot_parallel_loss(one_realization, self.mesh)

            def total(vp, w_multis, d_encs, h2):
                return summed(vp, w_multis, d_encs, h2) / n_real

        else:

            def total(vp, w_multis, d_encs, h2):
                def one(args):
                    return one_realization(vp, args[0], args[1], h2)

                vals = jax.lax.map(one, (w_multis, d_encs))
                return jnp.mean(vals)

        self._vg = jax.jit(jax.value_and_grad(total))
        self._loss = jax.jit(total)

    def _stage_data(self, fmax):
        nt = int(self.wavelet.shape[0])
        if fmax is not None:
            d_f = lowpass(self.d_obs, self.dt, fmax, axis=1)
            h2 = jnp.asarray(lowpass_response(nt, self.dt, fmax),
                             self.d_obs.dtype)
        else:
            d_f = self.d_obs
            h2 = jnp.ones(nt + 1, self.d_obs.dtype)
        return d_f, h2

    def objectives(self, fmax: Optional[float], key):
        """(value_and_grad(vp), loss(vp)) for one stage and ONE draw of
        codes. Re-call with a fresh key every outer iteration; the jitted
        objective is reused (codes enter as data, not constants)."""
        if not hasattr(self, "_vg"):
            self._build()
        d_f, h2 = self._stage_data(fmax)
        keys = jax.random.split(key, self.n_realizations)
        codes = jnp.stack([
            rademacher_codes(k, self.n_shots, self.wavelet.dtype)
            for k in keys
        ])
        w_multis = jax.vmap(lambda c: encode_wavelet(self.wavelet, c))(codes)
        d_encs = jax.vmap(lambda c: encode_gather(d_f, c))(codes)
        if self.mesh is not None:
            from .sharding import shard_shots

            w_multis = shard_shots(w_multis, self.mesh)
            d_encs = shard_shots(d_encs, self.mesh)
        vg = lambda m: self._vg(m, w_multis, d_encs, h2)
        loss = lambda m: self._loss(m, w_multis, d_encs, h2)
        return vg, loss


def invert_encoded(
    problem: EncodedFwiProblem,
    vp0: jax.Array,
    stages,  # iterable of StageCfg
    bounds,  # (lo, hi) box for vp
    key,
    lbfgs_m: int = 10,
    precond: Optional[Callable] = None,
    log_fn: Optional[Callable[[dict], None]] = None,
):
    """Multiscale encoded FWI: codes are re-drawn EVERY outer iteration
    (the loss landscape changes between iterations — that is the point:
    cross-talk averages out across draws). Within one iteration the line
    search sees fixed codes, so descent logic is sound. L-BFGS curvature
    pairs mix draws; the curvature guard (optimize/lbfgs.py) drops the
    occasional inconsistent pair — standard practice for encoded FWI
    [GENRE: Krebs et al. 2009 use the same stochastic-objective trick].
    """
    from .optimize import minimize
    from .optimize.lbfgs import LbfgsHistory

    m = vp0
    it_global = 0
    for si, stage in enumerate(stages):
        hist = LbfgsHistory(m=lbfgs_m)
        alpha = None
        for it in range(stage.iterations):
            key, sub = jax.random.split(key)
            vg, loss = problem.objectives(stage.fmax, sub)
            m, infos = minimize(
                vg, m, 1, method=stage.method, bounds=bounds,
                precond=precond, loss_only=loss, hist=hist,
                init_alpha=alpha,
            )
            if infos:
                alpha = infos[-1].alpha or alpha
                if log_fn:
                    log_fn(dict(stage=si, fmax=stage.fmax, iter=it,
                                J=infos[-1].f, gnorm=infos[-1].gnorm,
                                alpha=infos[-1].alpha))
            it_global += 1
    return m
