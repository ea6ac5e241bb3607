"""Misfit functionals (spec north star: L2 trace residual; SURVEY.md §2).

All misfits are plain differentiable JAX: the adjoint source is generated
automatically by AD through the residual (the custom VJP in adjoint.py
receives the seismogram cotangent and injects it at the receivers).
"""

from __future__ import annotations

import jax.numpy as jnp


def l2_misfit(seis: jnp.ndarray, d_obs: jnp.ndarray, weights=None) -> jnp.ndarray:
    """0.5 * ||R p - d||^2, optionally trace-weighted."""
    r = seis - d_obs
    if weights is not None:
        r = r * weights
    return 0.5 * jnp.sum(r * r)


def l2_residual(seis: jnp.ndarray, d_obs: jnp.ndarray) -> jnp.ndarray:
    """The raw residual (adjoint source for the L2 misfit)."""
    return seis - d_obs


def normalized_l2_misfit(
    seis: jnp.ndarray, d_obs: jnp.ndarray, weights=None, eps: float = 1e-12
):
    """Trace-normalized L2 (robust to source amplitude errors): misfit on
    unit-energy traces [GENRE: Shen 2014-style global correlation —
    per unit-norm trace 0.5||sn-dn||^2 = 1 - <sn, dn>]."""
    sn = seis / (jnp.linalg.norm(seis, axis=0, keepdims=True) + eps)
    dn = d_obs / (jnp.linalg.norm(d_obs, axis=0, keepdims=True) + eps)
    r = sn - dn
    if weights is not None:
        r = r * weights
    return 0.5 * jnp.sum(r * r)


def envelope(x: jnp.ndarray, axis: int = 0, eps: float = 1e-12) -> jnp.ndarray:
    """Instantaneous-amplitude envelope |x + i H x| via the FFT analytic
    signal [GENRE: Taner 1979]. ``eps`` inside the sqrt keeps the misfit
    differentiable where the envelope vanishes. TPU-resident (fp32 FFT)."""
    n = x.shape[axis]
    X = jnp.fft.fft(x, axis=axis)
    h = jnp.zeros(n, X.real.dtype).at[0].set(1.0)
    if n % 2 == 0:
        h = h.at[n // 2].set(1.0).at[1 : n // 2].set(2.0)
    else:
        h = h.at[1 : (n + 1) // 2].set(2.0)
    shape = [1] * x.ndim
    shape[axis] = n
    a = jnp.fft.ifft(X * h.reshape(shape), axis=axis)
    return jnp.sqrt(a.real**2 + a.imag**2 + eps)


def envelope_misfit(
    seis: jnp.ndarray, d_obs: jnp.ndarray, weights=None, eps: float = 1e-12
):
    """0.5 * ||E(R p) - E(d)||^2 with E the envelope — insensitive to
    constant phase rotations and far less cycle-skip-prone than L2 at low
    frequencies [GENRE: Wu, Luo & Wu 2014]. The adjoint source comes from
    AD through the analytic-signal FFT."""
    r = envelope(seis, axis=0, eps=eps) - envelope(d_obs, axis=0, eps=eps)
    if weights is not None:
        r = r * weights
    return 0.5 * jnp.sum(r * r)


def w2_misfit(
    seis: jnp.ndarray, d_obs: jnp.ndarray, weights=None, eps: float = 1e-3
):
    """Trace-wise quadratic Wasserstein (W2^2) misfit [GENRE: Yang &
    Engquist 2018]. Each trace is made a probability density by a
    positive shift + unit-mass normalization; the 1-D optimal map is the
    CDF composition T = G^{-1} o F, so

        W2^2(f, g) = sum_i (t_i - G^{-1}(F(t_i)))^2 f_i

    per trace and sign part. Seismic traces are zero-mean, so a plain
    positive shift leaves no NET mass in the signal and the transport
    cost saturates once wavelets stop overlapping; the standard fix
    [GENRE: Engquist, Froese & Yang 2016] transports the positive and
    negative parts as separate measures: W2^2(f+, g+) + W2^2(f-, g-).
    That restores the convex-in-time-shift behavior that makes W2 the
    classic cycle-skipping mitigation. Everything is relu + cumsum +
    jnp.interp — differentiable, TPU-resident, no sort (time is already
    the ground coordinate).
    """
    import jax

    nt = seis.shape[0]
    t = jnp.arange(nt, dtype=seis.dtype)
    tcol = t.reshape((nt,) + (1,) * (seis.ndim - 1))
    # mass floor: keeps unit-mass normalization finite on dead traces and
    # the inverse-CDF interpolation strictly increasing. The default 1e-3
    # is fp32-driven: much smaller floors leave per-sample CDF increments
    # below fp32's epsilon in signal-free zones, the cumsum goes exactly
    # flat there, and interp lands off-breakpoint (measured: W2(d, d) = 34
    # with eps=1e-8 fp32, 0.0 with eps=1e-3; fp64 is exact either way)
    floor = eps * (jax.lax.stop_gradient(jnp.max(jnp.abs(d_obs))) + eps)

    def part(f, g):
        f = jax.nn.relu(f) + floor
        g = jax.nn.relu(g) + floor
        fn = f / jnp.sum(f, axis=0, keepdims=True)
        gn = g / jnp.sum(g, axis=0, keepdims=True)
        F = jnp.cumsum(fn, axis=0)
        G = jnp.cumsum(gn, axis=0)
        flat = lambda a: a.reshape(nt, -1)
        # T_i = G^{-1}(F_i) per trace; gn > 0 makes G strictly increasing
        Tinv = jax.vmap(
            lambda Fc, Gc: jnp.interp(Fc, Gc, t), in_axes=1, out_axes=1
        )(flat(F), flat(G)).reshape(F.shape)
        return (tcol - Tinv) ** 2 * fn

    per_sample = part(seis, d_obs) + part(-seis, -d_obs)
    if weights is not None:
        per_sample = per_sample * weights
    return 0.5 * jnp.sum(per_sample)


def traveltime_misfit(
    seis: jnp.ndarray,
    d_obs: jnp.ndarray,
    weights=None,
    beta: float = 100.0,
    max_lag: int = 0,
    eps: float = 1e-12,
):
    """Cross-correlation traveltime misfit, softened for AD [GENRE: Luo &
    Schuster 1991 wave-equation traveltime]. Per trace, the lag of the
    normalized cross-correlation peak is estimated by a softmax-weighted
    mean (soft-argmax, sharpness ``beta`` — the correlation is in [-1,1],
    so beta ~ 100 concentrates the weight on the main lobe), and

        J = 0.5 sum_traces w_tr * tau(s, d)^2   (tau in time samples).

    Kinematic-only: amplitude errors that do not move the correlation
    peak contribute nothing, and tau is linear in a time shift across the
    whole correlation window — the classic tomographic cycle-skip
    mitigation (compare L2, which oscillates once shifts exceed half a
    period; tests/test_misfit.py measures both behaviours). For s == d
    the autocorrelation is even in lag, the soft-argmax is exactly 0, and
    J(d, d) = 0 with a zero gradient.

    ``max_lag`` limits the search window (samples; 0 = nt - 1);
    ``weights`` (per-sample masks from window.py) reduce to per-trace
    weights by time-averaging."""
    import jax

    nt = seis.shape[0]
    L = int(max_lag) if max_lag else nt - 1
    flat = lambda a: a.reshape(nt, -1)
    s2, d2 = flat(seis), flat(d_obs)
    # full linear cross-correlation via zero-padded rFFT, lags -L..L
    nfft = 1
    while nfft < 2 * nt:
        nfft *= 2
    S = jnp.fft.rfft(s2, n=nfft, axis=0)
    D = jnp.fft.rfft(d2, n=nfft, axis=0)
    xc = jnp.fft.irfft(S * jnp.conj(D), n=nfft, axis=0)
    # xcorr(l) = sum_t s[t] d[t-l]: lag l >= 0 at xc[l], l < 0 at xc[nfft+l]
    lags = jnp.arange(-L, L + 1, dtype=seis.dtype)
    xc = jnp.concatenate([xc[nfft - L:], xc[: L + 1]], axis=0)
    norm = (jnp.linalg.norm(s2, axis=0) * jnp.linalg.norm(d2, axis=0) + eps)
    p = jax.nn.softmax(beta * xc / norm, axis=0)
    tau = jnp.sum(lags[:, None] * p, axis=0)  # samples, per trace
    if weights is not None:
        w_tr = jnp.mean(flat(jnp.broadcast_to(weights, d_obs.shape)), axis=0)
    else:
        w_tr = 1.0
    return 0.5 * jnp.sum(w_tr * tau**2)


#: Functional registry for config/driver selection (FwiProblem.misfit).
#: Signature: f(seis, d_obs, weights=None) -> scalar.
MISFITS = {
    "l2": l2_misfit,
    "normalized_l2": normalized_l2_misfit,
    "envelope": envelope_misfit,
    "w2": w2_misfit,
    "traveltime": traveltime_misfit,
}
