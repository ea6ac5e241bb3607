"""3D elastic propagator: (vp, vs, rho) -> seismograms, differentiable.

Driver layer over kernels/elastic3d_jnp.py. Material staggering follows
the 2D elastic engine (propagators/elastic2d.py): mu averaged to the
three edge families with 4-point arithmetic means, buoyancy to the three
face families with 2-point means — all differentiable, so (vp, vs, rho)
gradients chain through automatically.

Gradients run through the checkpointed scan (propagators/remat.py):
exact plain AD with O(sqrt(nt)) stored 27-array states. The 2D engine's
boundary-saving reconstruction generalizes (the staggered leapfrog is
just as reversible in 3D) and is the promotion path if 3D elastic
becomes a throughput concern.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..cpml import CpmlProfile
from ..grid import Grid
from ..kernels.elastic3d_jnp import (
    Elastic3dParams,
    make_elastic3d_step,
    zero_elastic3d_state,
)
from .elastic2d import _shift_edge, elastic_cfl_dt
from .remat import checkpointed_scan


def elastic3d_material_fields(grid: Grid, vp, vs, rho, dtype=jnp.float32):
    """Differentiable map to the padded, staggered 3D material fields:
    (lam, lam2mu, mu_xy, mu_xz, mu_yz, buoy_x, buoy_y, buoy_z)."""
    pad = grid.pad
    pd = lambda f: jnp.pad(f.astype(dtype), pad, mode="edge")
    vp_, vs_, rho_ = pd(vp), pd(vs), pd(rho)
    mu = rho_ * vs_**2
    lam = rho_ * vp_**2 - 2.0 * mu
    lam2mu = lam + 2.0 * mu
    # edge-centred shear moduli: 4-point average over the two axes the
    # edge is offset in ((y,z,x) layout: axis 0=y, 1=z, 2=x)
    mu_y = _shift_edge(mu, 0)
    mu_z = _shift_edge(mu, 1)
    mu_x = _shift_edge(mu, 2)
    mu_xy = 0.25 * (mu + mu_x + mu_y + _shift_edge(mu_x, 0))
    mu_xz = 0.25 * (mu + mu_x + mu_z + _shift_edge(mu_x, 1))
    mu_yz = 0.25 * (mu + mu_y + mu_z + _shift_edge(mu_y, 1))
    buoy = 1.0 / rho_
    buoy_x = 0.5 * (buoy + _shift_edge(buoy, 2))
    buoy_y = 0.5 * (buoy + _shift_edge(buoy, 0))
    buoy_z = 0.5 * (buoy + _shift_edge(buoy, 1))
    return lam, lam2mu, mu_xy, mu_xz, mu_yz, buoy_x, buoy_y, buoy_z


def _elastic3d_profiles(grid: Grid, dt: float, c_max: float, f0: float,
                        dtype):
    """Per-axis node/half CPML (a, b) broadcast tuples; z-lo disabled
    under grid.free_surface."""
    prof_n, prof_h = [], []
    for ax in range(3):
        kw = dict(n=grid.shape[ax], pml=grid.pml, radius=grid.radius,
                  h=grid.h[ax], dt=dt, c_max=c_max, f0=f0,
                  free_lo=(grid.free_surface and ax == 1))
        pn = CpmlProfile.build(**kw)
        ph = CpmlProfile.build(stagger=0.5, **kw)
        shape_ = [1, 1, 1]
        shape_[ax] = pn.a.shape[0]
        prof_n.append((jnp.asarray(pn.a.reshape(shape_), dtype),
                       jnp.asarray(pn.b.reshape(shape_), dtype)))
        prof_h.append((jnp.asarray(ph.a.reshape(shape_), dtype),
                       jnp.asarray(ph.b.reshape(shape_), dtype)))
    return (tuple(p[0] for p in prof_n), tuple(p[1] for p in prof_n),
            tuple(p[0] for p in prof_h), tuple(p[1] for p in prof_h))


def make_elastic3d_simulator(
    grid: Grid,
    dt: float,
    f0: float,
    c_max: float,
    dtype=jnp.float32,
    source_type: str = "pressure",
    record: str = "v",
    chunk: int = 0,
):
    """``simulate(*mats, wavelet, src_idx, rcv_idx) -> seis`` with mats
    as produced by elastic3d_material_fields; differentiable in all
    eight material fields and the wavelet."""
    a_n, b_n, a_h, b_h = _elastic3d_profiles(grid, dt, c_max, f0, dtype)
    step = make_elastic3d_step(grid, dt, source_type, record)
    shape = grid.padded_shape

    def simulate(lam, lam2mu, mu_xy, mu_xz, mu_yz, bx, by, bz,
                 wavelet, src_idx, rcv_idx):
        params = Elastic3dParams(
            lam=lam, lam2mu=lam2mu, mu_xy=mu_xy, mu_xz=mu_xz, mu_yz=mu_yz,
            buoy_x=bx, buoy_y=by, buoy_z=bz,
            a_n=a_n, b_n=b_n, a_h=a_h, b_h=b_h,
            src_idx=src_idx, rcv_idx=rcv_idx,
        )

        def body(s, w_t):
            return step(s, params, w_t)

        nt = int(wavelet.shape[0])
        ck = chunk if chunk > 0 else max(8, int(np.sqrt(nt) + 0.5))
        _, seis = checkpointed_scan(
            body, zero_elastic3d_state(shape, lam.dtype), wavelet, ck
        )
        return seis

    return simulate


class Elastic3dPropagator:
    """User-facing 3D elastic propagator (pattern of ElasticPropagator)."""

    def __init__(self, grid: Grid, dt: float, f0: float, vp_max: float,
                 dtype=jnp.float32, source_type: str = "pressure",
                 record: str = "v", chunk: int = 0):
        limit = elastic_cfl_dt(grid.h, vp_max, grid.order, safety=1.0)
        if dt > limit:
            raise ValueError(
                f"dt={dt:.6g} exceeds elastic CFL limit {limit:.6g}"
            )
        self.grid = grid
        self.dt = float(dt)
        self.dtype = dtype
        self._f0 = float(f0)
        self._vp_max = float(vp_max)
        self._source_type = source_type
        self._record = record
        self._simulate = make_elastic3d_simulator(
            grid, dt, f0, vp_max, dtype, source_type, record, chunk
        )

    def material_fields(self, vp, vs, rho):
        return elastic3d_material_fields(self.grid, vp, vs, rho, self.dtype)

    def __call__(self, vp, vs, rho, geom, wavelet):
        mats = self.material_fields(vp, vs, rho)
        return self._simulate(
            *mats, wavelet.astype(self.dtype), geom.src_idx, geom.rcv_idx
        )

    def forward_snapshots(self, vp, vs, rho, geom, wavelet,
                          stride: int = 1, field: str = "vz"):
        """Non-differentiable forward that also returns interior snapshots
        of one component every ``stride`` steps (QC/movies). ``field``:
        vx, vy, vz, sxx, syy, szz, sxy, sxz, syz, or "p"
        (= -(sxx+syy+szz)/3)."""
        a_n, b_n, a_h, b_h = _elastic3d_profiles(
            self.grid, self.dt, self._vp_max, self._f0, self.dtype)
        step = make_elastic3d_step(self.grid, self.dt, self._source_type,
                                   self._record)
        mats = self.material_fields(vp, vs, rho)
        params = Elastic3dParams(
            lam=mats[0], lam2mu=mats[1], mu_xy=mats[2], mu_xz=mats[3],
            mu_yz=mats[4], buoy_x=mats[5], buoy_y=mats[6], buoy_z=mats[7],
            a_n=a_n, b_n=b_n, a_h=a_h, b_h=b_h,
            src_idx=geom.src_idx, rcv_idx=geom.rcv_idx,
        )
        interior = self.grid.interior
        v_names = ("vx", "vy", "vz")
        s_names = ("sxx", "syy", "szz", "sxy", "sxz", "syz")

        def grab(s):
            if field == "p":
                return (-(s.s[0] + s.s[1] + s.s[2]) / 3.0)[interior]
            if field in v_names:
                return s.v[v_names.index(field)][interior]
            return s.s[s_names.index(field)][interior]

        def body(s, w_t):
            s, rec = step(s, params, w_t)
            return s, (rec, grab(s))

        state0 = zero_elastic3d_state(self.grid.padded_shape, self.dtype)
        _, (seis, snaps) = jax.lax.scan(
            body, state0, wavelet.astype(self.dtype))
        return seis, snaps[::stride] if stride > 1 else snaps
