"""Independent slow NumPy oracle propagators (fp64).

This module is the in-repo "reference implementation" that discharges V1
(forward wavefields match to < 1e-6 RMS, BASELINE.json:5) given that the
external reference mount is empty (SURVEY.md §0). It is written deliberately
*apart* from the fast path: explicit Python time loops, scipy.ndimage
correlations for derivatives, float64 throughout. Only the FD coefficient
tables and the CPML profile formulas (pure math constants, trivially
auditable) are shared with the production code.

Discrete scheme (identical semantics to kernels/acoustic2d_jnp.py):

  leapfrog:  p+ = 2 p - p- + dt^2 c^2 (Lap_cpml p + src)
  CPML (kappa = 1, second-order form, Pasalic & McGarry 2010 [GENRE]),
  per axis:
      phi'  = b phi + a D1(p)
      v     = D2(p) + D1(phi')
      psi'  = b psi + a v
      lap_axis = v + psi'
  Lap_cpml p = sum_axes lap_axis
  source:    p+[src] += dt^2 c^2[src] w[t]
  record:    seis[t] = p+[rcv]
"""

from __future__ import annotations

import numpy as np
from scipy.ndimage import correlate1d

from ..cpml import CpmlProfile
from ..grid import D1_COEFFS, D2_COEFFS, D1_STAGGERED_COEFFS, Grid


def _d(f, coeffs, h, axis):
    return correlate1d(f, coeffs / h, axis=axis, mode="constant", cval=0.0)


def _build_axis_profiles(grid: Grid, dt: float, c_max: float, f0: float):
    """(a, b) broadcastable fp64 profile pairs per axis."""
    out = []
    z_axis = 0 if grid.ndim == 2 else 1
    for ax in range(grid.ndim):
        prof = CpmlProfile.build(
            n=grid.shape[ax],
            pml=grid.pml,
            radius=grid.radius,
            h=grid.h[ax],
            dt=dt,
            c_max=c_max,
            f0=f0,
            free_lo=(grid.free_surface and ax == z_axis),
        )
        shape = [1] * grid.ndim
        shape[ax] = prof.a.shape[0]
        out.append((prof.a.reshape(shape), prof.b.reshape(shape)))
    return out


def oracle_forward(
    vp: np.ndarray,
    grid: Grid,
    dt: float,
    wavelet: np.ndarray,
    src_idx: np.ndarray,
    rcv_idx: np.ndarray,
    f0: float,
    snapshot_stride: int = 0,
):
    """2D/3D acoustic forward, fp64, explicit time loop.

    Args:
      vp: physical-grid velocity, shape == grid.shape.
      dt: timestep (caller must respect CFL).
      wavelet: (nt,) source time function.
      src_idx / rcv_idx: (n, ndim) *physical-grid* integer indices.
      f0: dominant frequency for the CPML alpha profile.
      snapshot_stride: if > 0, also return interior wavefield snapshots
        every `snapshot_stride` steps.

    Returns:
      seis: (nt, nrec) float64 seismogram (sampled from p at t+dt).
      snaps: list of interior p arrays (possibly empty).
    """
    vp = np.asarray(vp, dtype=np.float64)
    nt = len(wavelet)
    pad = grid.pad
    c = np.pad(vp, [(pad, pad)] * grid.ndim, mode="edge")
    c2dt2 = (c * c) * (dt * dt)
    d1 = {ax: np.asarray(D1_COEFFS[grid.order]) for ax in range(grid.ndim)}
    d2 = {ax: np.asarray(D2_COEFFS[grid.order]) for ax in range(grid.ndim)}
    profs = _build_axis_profiles(grid, dt, vp.max(), f0)

    shape = grid.padded_shape
    p_prev = np.zeros(shape)
    p = np.zeros(shape)
    phi = [np.zeros(shape) for _ in range(grid.ndim)]
    psi = [np.zeros(shape) for _ in range(grid.ndim)]

    src = tuple(np.asarray(src_idx, dtype=np.int64).T + pad)
    rcv = tuple(np.asarray(rcv_idx, dtype=np.int64).T + pad)
    w = np.asarray(wavelet, dtype=np.float64)

    seis = np.zeros((nt, np.asarray(rcv_idx).shape[0]))
    snaps = []
    for t in range(nt):
        lap = np.zeros(shape)
        for ax in range(grid.ndim):
            a, b = profs[ax]
            h = grid.h[ax]
            phi[ax] = b * phi[ax] + a * _d(p, d1[ax], h, ax)
            v = _d(p, d2[ax], h * h, ax) + _d(phi[ax], d1[ax], h, ax)
            psi[ax] = b * psi[ax] + a * v
            lap += v + psi[ax]
        p_next = 2.0 * p - p_prev + c2dt2 * lap
        np.add.at(p_next, src, c2dt2[src] * w[t])
        if grid.free_surface:  # pressure-release plane at the surface
            z_axis = 0 if grid.ndim == 2 else 1
            sl = [slice(None)] * grid.ndim
            sl[z_axis] = pad
            p_next[tuple(sl)] = 0.0
        seis[t] = p_next[rcv]
        p_prev, p = p, p_next
        if snapshot_stride and (t + 1) % snapshot_stride == 0:
            snaps.append(p[grid.interior].copy())
    return seis, snaps


def oracle_forward_vd(
    vp: np.ndarray,
    rho: np.ndarray,
    grid: Grid,
    dt: float,
    wavelet: np.ndarray,
    src_idx: np.ndarray,
    rcv_idx: np.ndarray,
    f0: float,
    q: np.ndarray = None,
):
    """Variable-density acoustic forward (p_tt = rho c^2 div(grad p/rho)),
    fp64, staggered first-derivative flux form with CPML on both the
    half-point fluxes (phi) and the node divergence (psi). Written
    independently of kernels/acoustic_vd_jnp.py as its ground truth.

    ``q``: optional per-cell quality factor — adds the single-SLS
    constant-Q mechanism (tau_sigma = 1/(2 pi f0), tau = 2/(Q-1),
    exponential memory integrator + midpoint application), the ground
    truth for kernels/viscoacoustic_jnp.py.
    """
    from ..grid import D1_STAGGERED_COEFFS

    vp = np.asarray(vp, dtype=np.float64)
    rho = np.asarray(rho, dtype=np.float64)
    nt = len(wavelet)
    pad = grid.pad
    c = np.pad(vp, [(pad, pad)] * grid.ndim, mode="edge")
    rr = np.pad(rho, [(pad, pad)] * grid.ndim, mode="edge")
    kdt2 = rr * c * c * dt * dt
    buoy = 1.0 / rr
    taps = np.asarray(D1_STAGGERED_COEFFS[grid.order], dtype=np.float64)

    def dplus(f, axis, h):
        out = np.zeros_like(f)
        fp_ = np.pad(f, [(len(taps), len(taps)) if ax_ == axis else (0, 0)
                         for ax_ in range(f.ndim)])
        n = f.shape[axis]
        R = len(taps)
        for k, cco in enumerate(taps):
            hi = np.take(fp_, range(R + 1 + k, R + 1 + k + n), axis=axis)
            lo = np.take(fp_, range(R - k, R - k + n), axis=axis)
            out += cco * (hi - lo)
        return out / h

    def dminus(f, axis, h):
        out = np.zeros_like(f)
        fp_ = np.pad(f, [(len(taps), len(taps)) if ax_ == axis else (0, 0)
                         for ax_ in range(f.ndim)])
        n = f.shape[axis]
        R = len(taps)
        for k, cco in enumerate(taps):
            hi = np.take(fp_, range(R + k, R + k + n), axis=axis)
            lo = np.take(fp_, range(R - 1 - k, R - 1 - k + n), axis=axis)
            out += cco * (hi - lo)
        return out / h

    def to_half(b, axis):
        hi = np.take(b, range(1, b.shape[axis]), axis=axis)
        lo = np.take(b, range(0, b.shape[axis] - 1), axis=axis)
        avg = 0.5 * (hi + lo)
        padw = [(0, 1) if ax_ == axis else (0, 0) for ax_ in range(b.ndim)]
        return np.pad(avg, padw, mode="edge")

    z_axis = 0 if grid.ndim == 2 else 1
    prof_n, prof_h = [], []
    for ax in range(grid.ndim):
        shape = [1] * grid.ndim
        kw = dict(n=grid.shape[ax], pml=grid.pml, radius=grid.radius,
                  h=grid.h[ax], dt=dt, c_max=float(vp.max()), f0=f0,
                  free_lo=(grid.free_surface and ax == z_axis))
        pn = CpmlProfile.build(**kw)
        ph = CpmlProfile.build(stagger=0.5, **kw)
        shape[ax] = pn.a.shape[0]
        prof_n.append((pn.a.reshape(shape), pn.b.reshape(shape)))
        prof_h.append((ph.a.reshape(shape), ph.b.reshape(shape)))

    bh = [to_half(buoy, ax) for ax in range(grid.ndim)]
    shape = grid.padded_shape
    # NOTE: the flux variable inside the time loop is also named ``q``
    # (shadows the parameter) — latch the viscoacoustic config here.
    visco = q is not None
    if visco:
        tau = np.pad(2.0 / (np.asarray(q, np.float64) - 1.0),
                     [(pad, pad)] * grid.ndim, mode="edge")
        beta = np.exp(-dt * 2.0 * np.pi * f0)
        r_mem = np.zeros(shape)
    p_prev = np.zeros(shape)
    p = np.zeros(shape)
    phi = [np.zeros(shape) for _ in range(grid.ndim)]
    psi = [np.zeros(shape) for _ in range(grid.ndim)]
    src = tuple(np.asarray(src_idx, dtype=np.int64).T + pad)
    rcv = tuple(np.asarray(rcv_idx, dtype=np.int64).T + pad)
    w = np.asarray(wavelet, dtype=np.float64)
    seis = np.zeros((nt, np.asarray(rcv_idx).shape[0]))
    for t in range(nt):
        lap = np.zeros(shape)
        for ax in range(grid.ndim):
            an, bn = prof_n[ax]
            ah, bhp = prof_h[ax]
            h = grid.h[ax]
            dp = dplus(p, ax, h)
            phi[ax] = bhp * phi[ax] + ah * dp
            q = bh[ax] * (dp + phi[ax])
            dq = dminus(q, ax, h)
            psi[ax] = bn * psi[ax] + an * dq
            lap += dq + psi[ax]
        if not visco:
            p_next = 2.0 * p - p_prev + kdt2 * lap
        else:
            mlap = kdt2 * lap
            r_new = beta * r_mem - (1.0 - beta) * tau * mlap
            p_next = (2.0 * p - p_prev + (1.0 + tau) * mlap
                      + 0.5 * (r_new + r_mem))
            r_mem = r_new
        np.add.at(p_next, src, kdt2[src] * w[t])
        if grid.free_surface:
            sl = [slice(None)] * grid.ndim
            sl[z_axis] = pad
            p_next[tuple(sl)] = 0.0
        seis[t] = p_next[rcv]
        p_prev, p = p, p_next
    return seis


def oracle_elastic_2d(
    vp: np.ndarray,
    vs: np.ndarray,
    rho: np.ndarray,
    grid: Grid,
    dt: float,
    wavelet: np.ndarray,
    src_idx: np.ndarray,
    rcv_idx: np.ndarray,
    f0: float,
    source_type: str = "pressure",
    record_fields: str = "v",
):
    """2D P-SV staggered-grid velocity-stress forward (Virieux 1986 /
    Levander 1988 [GENRE]), fp64, with split-field CPML memory variables on
    every spatial derivative (Komatitsch & Martin 2007). Spec C4
    (BASELINE.json:10).

    Staggering (cell i,j at integer positions):
      sxx, szz at (i, j); sxz at (i+1/2, j+1/2); vx at (i, j+1/2);
      vz at (i+1/2, j)  — z is axis 0, x is axis 1.

    Returns (seis, snaps): seis is (nt, nrec, 2) with (vz, vx) samples when
    ``record_fields == 'v'``, else (nt, nrec) pressure -(sxx+szz)/2.
    """
    nt = len(wavelet)
    pad = grid.pad
    padw = [(pad, pad)] * 2
    vp = np.asarray(vp, np.float64)
    vs = np.asarray(vs, np.float64)
    rho = np.asarray(rho, np.float64)
    mu = np.pad(rho * vs**2, padw, mode="edge")
    lam = np.pad(rho * vp**2 - 2 * rho * vs**2, padw, mode="edge")
    buoy = 1.0 / np.pad(rho, padw, mode="edge")

    def shift(f, d, axis, mode="constant"):
        """f shifted so out[i] = f[i + d], zero- (or edge-) extended."""
        out = np.pad(
            f,
            [(max(-d, 0), max(d, 0)) if ax == axis else (0, 0) for ax in range(f.ndim)],
            mode=mode,
        )
        sl = [slice(None)] * f.ndim
        sl[axis] = slice(max(d, 0), max(d, 0) + f.shape[axis])
        return out[tuple(sl)]

    # Staggered averaging for material params at half positions [GENRE];
    # edge extension matches the edge-replicated padding of the materials.
    mu_xz = 0.25 * (
        mu
        + shift(mu, 1, 0, "edge")
        + shift(mu, 1, 1, "edge")
        + shift(shift(mu, 1, 0, "edge"), 1, 1, "edge")
    )
    bx = 0.5 * (buoy + shift(buoy, 1, 1, "edge"))  # at (i, j+1/2)
    bz = 0.5 * (buoy + shift(buoy, 1, 0, "edge"))  # at (i+1/2, j)

    cs = np.asarray(D1_STAGGERED_COEFFS[grid.order])

    def dplus(f, axis, h):
        """D+ f at half position i+1/2 from integer samples, zero-extended."""
        out = np.zeros_like(f)
        for k, ck in enumerate(cs):
            out += ck * (shift(f, k + 1, axis) - shift(f, -k, axis))
        return out / h

    def dminus(f, axis, h):
        """D- f at integer position i from half samples, zero-extended."""
        out = np.zeros_like(f)
        for k, ck in enumerate(cs):
            out += ck * (shift(f, k, axis) - shift(f, -(k + 1), axis))
        return out / h

    profs = _build_axis_profiles(grid, dt, vp.max(), f0)
    (az_, bz_), (ax_, bx_) = profs[0], profs[1]

    shape = grid.padded_shape
    vx = np.zeros(shape)
    vz = np.zeros(shape)
    sxx = np.zeros(shape)
    szz = np.zeros(shape)
    sxz = np.zeros(shape)
    # CPML memory variables, one per (field-derivative, axis) term.
    m_sxx_x = np.zeros(shape)
    m_sxz_z = np.zeros(shape)
    m_sxz_x = np.zeros(shape)
    m_szz_z = np.zeros(shape)
    m_vx_x = np.zeros(shape)
    m_vz_z = np.zeros(shape)
    m_vx_z = np.zeros(shape)
    m_vz_x = np.zeros(shape)

    src = tuple(np.asarray(src_idx, np.int64).T + pad)
    rcv = tuple(np.asarray(rcv_idx, np.int64).T + pad)
    w = np.asarray(wavelet, np.float64)
    hz, hx = grid.h

    nrec = np.asarray(rcv_idx).shape[0]
    seis = np.zeros((nt, nrec, 2)) if record_fields == "v" else np.zeros((nt, nrec))
    for t in range(nt):
        # velocity update (vx at (i, j+1/2), vz at (i+1/2, j))
        d_sxx_x = dplus(sxx, 1, hx)  # at (i, j+1/2)
        d_sxz_z = dminus(sxz, 0, hz)  # at (i, j+1/2)
        m_sxx_x = bx_ * m_sxx_x + ax_ * d_sxx_x
        m_sxz_z = bz_ * m_sxz_z + az_ * d_sxz_z
        vx = vx + dt * bx * (d_sxx_x + m_sxx_x + d_sxz_z + m_sxz_z)

        d_sxz_x = dminus(sxz, 1, hx)  # at (i+1/2, j)
        d_szz_z = dplus(szz, 0, hz)  # at (i+1/2, j)
        m_sxz_x = bx_ * m_sxz_x + ax_ * d_sxz_x
        m_szz_z = bz_ * m_szz_z + az_ * d_szz_z
        vz = vz + dt * bz * (d_sxz_x + m_sxz_x + d_szz_z + m_szz_z)

        if grid.free_surface:
            # even ghost-velocity image, MID-step (between the velocity and
            # stress stages — stability: elastic2d_jnp.FreeSurfaceImage)
            K = grid.radius
            for k in range(1, K + 1):
                vx[pad - k] = vx[pad + k]
                vz[pad - k] = vz[pad + k - 1]

        # stress update
        d_vx_x = dminus(vx, 1, hx)  # at (i, j)
        d_vz_z = dminus(vz, 0, hz)  # at (i, j)
        m_vx_x = bx_ * m_vx_x + ax_ * d_vx_x
        m_vz_z = bz_ * m_vz_z + az_ * d_vz_z
        exx = d_vx_x + m_vx_x
        ezz = d_vz_z + m_vz_z
        sxx = sxx + dt * ((lam + 2 * mu) * exx + lam * ezz)
        szz = szz + dt * ((lam + 2 * mu) * ezz + lam * exx)

        d_vx_z = dplus(vx, 0, hz)  # at (i+1/2, j+1/2)
        d_vz_x = dplus(vz, 1, hx)  # at (i+1/2, j+1/2)
        m_vx_z = bz_ * m_vx_z + az_ * d_vx_z
        m_vz_x = bx_ * m_vz_x + ax_ * d_vz_x
        sxz = sxz + dt * mu_xz * ((d_vx_z + m_vx_z) + (d_vz_x + m_vz_x))

        # explosive (pressure) source on the diagonal stresses
        if source_type == "pressure":
            np.add.at(sxx, src, dt * w[t])
            np.add.at(szz, src, dt * w[t])
        else:  # vertical force on vz
            np.add.at(vz, src, dt * bz[src] * w[t])

        if grid.free_surface:
            # stress-image free surface [GENRE: Levander 1988]: zero the
            # traction at the surface node row, mirror antisymmetrically
            # into the ghost rows (sxz half-node: ghost depth -(k-1/2)
            # mirrors index pad+k-1)
            K = grid.radius
            szz[pad] = 0.0
            for k in range(1, K + 1):
                szz[pad - k] = -szz[pad + k]
                sxz[pad - k] = -sxz[pad + k - 1]

        if record_fields == "v":
            seis[t, :, 0] = vz[rcv]
            seis[t, :, 1] = vx[rcv]
        else:
            seis[t] = -(sxx[rcv] + szz[rcv]) / 2.0
    return seis, []


def oracle_elastic_3d(
    vp: np.ndarray,
    vs: np.ndarray,
    rho: np.ndarray,
    grid: Grid,
    dt: float,
    wavelet: np.ndarray,
    src_idx: np.ndarray,
    rcv_idx: np.ndarray,
    f0: float,
    source_type: str = "pressure",
    record_fields: str = "v",
):
    """3D isotropic elastic velocity-stress forward, fp64, (y, z, x)
    layout — independent ground truth for kernels/elastic3d_jnp.py
    (same staggering conventions, written against the equations)."""
    from ..grid import D1_STAGGERED_COEFFS

    vp = np.asarray(vp, np.float64)
    vs = np.asarray(vs, np.float64)
    rho = np.asarray(rho, np.float64)
    nt = len(wavelet)
    pad = grid.pad
    pd = lambda f: np.pad(f, pad, mode="edge")
    vp_, vs_, rho_ = pd(vp), pd(vs), pd(rho)
    mu = rho_ * vs_**2
    lam = rho_ * vp_**2 - 2.0 * mu
    l2m = lam + 2.0 * mu
    taps = np.asarray(D1_STAGGERED_COEFFS[grid.order], np.float64)
    R = len(taps)

    def shiftax(f, k, axis):
        out = np.zeros_like(f)
        src_lo = max(0, -k)
        src_hi = f.shape[axis] - max(0, k)
        dst_lo = max(0, k)
        sl_src = [slice(None)] * 3
        sl_dst = [slice(None)] * 3
        sl_src[axis] = slice(src_lo, src_hi)
        sl_dst[axis] = slice(dst_lo, dst_lo + (src_hi - src_lo))
        out[tuple(sl_dst)] = f[tuple(sl_src)]
        return out

    def dplus(f, axis, h):
        out = np.zeros_like(f)
        for k, c in enumerate(taps):
            out += c * (shiftax(f, -(k + 1), axis) - shiftax(f, k, axis))
        return out / h

    def dminus(f, axis, h):
        out = np.zeros_like(f)
        for k, c in enumerate(taps):
            out += c * (shiftax(f, -k, axis) - shiftax(f, k + 1, axis))
        return out / h

    def edge4(m, ax1, ax2):
        m1 = np.concatenate(
            [np.take(m, range(1, m.shape[ax1]), axis=ax1),
             np.take(m, [-1], axis=ax1)], axis=ax1)
        m2 = np.concatenate(
            [np.take(m, range(1, m.shape[ax2]), axis=ax2),
             np.take(m, [-1], axis=ax2)], axis=ax2)
        m12 = np.concatenate(
            [np.take(m1, range(1, m1.shape[ax2]), axis=ax2),
             np.take(m1, [-1], axis=ax2)], axis=ax2)
        return 0.25 * (m + m1 + m2 + m12)

    def face2(b, ax):
        b1 = np.concatenate(
            [np.take(b, range(1, b.shape[ax]), axis=ax),
             np.take(b, [-1], axis=ax)], axis=ax)
        return 0.5 * (b + b1)

    mu_xy = edge4(mu, 2, 0)
    mu_xz = edge4(mu, 2, 1)
    mu_yz = edge4(mu, 0, 1)
    buoy = 1.0 / rho_
    bx, by, bz = face2(buoy, 2), face2(buoy, 0), face2(buoy, 1)

    prof_n, prof_h = [], []
    for ax in range(3):
        kw = dict(n=grid.shape[ax], pml=grid.pml, radius=grid.radius,
                  h=grid.h[ax], dt=dt, c_max=float(vp.max()), f0=f0,
                  free_lo=(grid.free_surface and ax == 1))
        pn = CpmlProfile.build(**kw)
        ph = CpmlProfile.build(stagger=0.5, **kw)
        shp = [1, 1, 1]
        shp[ax] = pn.a.shape[0]
        prof_n.append((pn.a.reshape(shp), pn.b.reshape(shp)))
        prof_h.append((ph.a.reshape(shp), ph.b.reshape(shp)))

    shape = grid.padded_shape
    vx = np.zeros(shape); vy = np.zeros(shape); vz = np.zeros(shape)
    sxx = np.zeros(shape); syy = np.zeros(shape); szz = np.zeros(shape)
    sxy = np.zeros(shape); sxz = np.zeros(shape); syz = np.zeros(shape)
    mV = [np.zeros(shape) for _ in range(9)]
    mS = [np.zeros(shape) for _ in range(9)]
    src = tuple(np.asarray(src_idx, np.int64).T + pad)
    rcv = tuple(np.asarray(rcv_idx, np.int64).T + pad)
    w = np.asarray(wavelet, np.float64)
    hy, hz, hx = grid.h
    AY, AZ, AX = 0, 1, 2
    nrec = np.asarray(rcv_idx).shape[0]
    seis = (np.zeros((nt, nrec, 3)) if record_fields == "v"
            else np.zeros((nt, nrec)))

    def cp(i, mem, d, prof):
        a, b = prof
        mem[i] = b * mem[i] + a * d
        return d + mem[i]

    for t in range(nt):
        vx += dt * bx * (
            cp(0, mV, dplus(sxx, AX, hx), prof_h[AX])
            + cp(1, mV, dminus(sxy, AY, hy), prof_n[AY])
            + cp(2, mV, dminus(sxz, AZ, hz), prof_n[AZ])
        )
        vy += dt * by * (
            cp(3, mV, dminus(sxy, AX, hx), prof_n[AX])
            + cp(4, mV, dplus(syy, AY, hy), prof_h[AY])
            + cp(5, mV, dminus(syz, AZ, hz), prof_n[AZ])
        )
        vz += dt * bz * (
            cp(6, mV, dminus(sxz, AX, hx), prof_n[AX])
            + cp(7, mV, dminus(syz, AY, hy), prof_n[AY])
            + cp(8, mV, dplus(szz, AZ, hz), prof_h[AZ])
        )
        if grid.free_surface:
            # even ghost-velocity image, MID-step (2D oracle convention)
            K = grid.radius
            for k in range(1, K + 1):
                vx[:, pad - k] = vx[:, pad + k]
                vy[:, pad - k] = vy[:, pad + k]
                vz[:, pad - k] = vz[:, pad + k - 1]
        exx = cp(0, mS, dminus(vx, AX, hx), prof_n[AX])
        eyy = cp(1, mS, dminus(vy, AY, hy), prof_n[AY])
        ezz = cp(2, mS, dminus(vz, AZ, hz), prof_n[AZ])
        tr = exx + eyy + ezz
        sxx += dt * (lam * tr + 2.0 * mu * exx)
        syy += dt * (lam * tr + 2.0 * mu * eyy)
        szz += dt * (lam * tr + 2.0 * mu * ezz)
        sxy += dt * mu_xy * (
            cp(3, mS, dplus(vx, AY, hy), prof_h[AY])
            + cp(4, mS, dplus(vy, AX, hx), prof_h[AX])
        )
        sxz += dt * mu_xz * (
            cp(5, mS, dplus(vx, AZ, hz), prof_h[AZ])
            + cp(6, mS, dplus(vz, AX, hx), prof_h[AX])
        )
        syz += dt * mu_yz * (
            cp(7, mS, dplus(vy, AZ, hz), prof_h[AZ])
            + cp(8, mS, dplus(vz, AY, hy), prof_h[AY])
        )
        if source_type == "pressure":
            np.add.at(sxx, src, dt * w[t])
            np.add.at(syy, src, dt * w[t])
            np.add.at(szz, src, dt * w[t])
        else:
            np.add.at(vz, src, dt * bz[src] * w[t])
        if grid.free_surface:
            # stress-image free surface [GENRE: Levander 1988], 3D:
            # zero surface traction, odd mirrors (sxz/syz at half nodes)
            K = grid.radius
            szz[:, pad] = 0.0
            for k in range(1, K + 1):
                szz[:, pad - k] = -szz[:, pad + k]
                sxz[:, pad - k] = -sxz[:, pad + k - 1]
                syz[:, pad - k] = -syz[:, pad + k - 1]
        if record_fields == "v":
            seis[t, :, 0] = vz[rcv]
            seis[t, :, 1] = vy[rcv]
            seis[t, :, 2] = vx[rcv]
        else:
            seis[t] = -(sxx[rcv] + syy[rcv] + szz[rcv]) / 3.0
    return seis
