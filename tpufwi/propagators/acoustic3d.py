"""3D acoustic propagation with spatial domain decomposition (spec C5).

Two TPU-native shardings (SURVEY.md §2 "SP/CP" row):

1. **GSPMD path** (gradient-capable): `AcousticPropagator` with
   `wavefield_sharding=NamedSharding(mesh, P("y", None, "x"))` — the scan
   carry is constrained and XLA's SPMD partitioner keeps the stencil
   block-local, inserting collective-permute halo exchanges over ICI
   automatically. Works unchanged with the boundary-saving custom VJP.

2. **Explicit shard_map path** (this module): the scan runs inside
   `shard_map`; each device advances its ghost-extended block and trades
   width-`radius` halo rings with neighbours via `lax.ppermute` every step
   — the ring-attention-style neighbour exchange pattern, carrying PDE
   halos (SURVEY.md §5). Forward modeling; used for performance work and
   as the reference for the communication pattern.

Constraint of the explicit path: padded dims must divide the mesh axes and
each block must be at least `pml + 2*radius` deep so CPML memory variables
never straddle a cut (they are then identically zero at every cut, and only
the pressure field needs halos — see the analysis in this docstring's
source).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..cpml import build_profiles
from ..grid import Grid
from ..kernels.acoustic2d_jnp import AcousticParams, AcousticState, make_acoustic_step
from ..sharding import halo_exchange


def domain_sharding(mesh: Mesh, y_axis: str = "y", x_axis: str = "x"):
    """NamedSharding for (y, z, x) wavefields: y over dim 0, x over dim 2."""
    return NamedSharding(mesh, P(y_axis, None, x_axis))


class ShardedAcoustic3D:
    """Explicit shard_map + ppermute halo-exchange 3D forward propagator."""

    def __init__(
        self,
        grid: Grid,
        dt: float,
        f0: float,
        c_max: float,
        mesh: Mesh,
        y_axis: str = "y",
        x_axis: str = "x",
        dtype=jnp.float32,
    ):
        if grid.ndim != 3:
            raise ValueError("ShardedAcoustic3D is 3D only")
        grid.check_dt(dt, c_max)
        self.grid = grid
        self.dt = float(dt)
        self.dtype = dtype
        self.mesh = mesh
        self.y_axis, self.x_axis = y_axis, x_axis
        my = mesh.shape[y_axis]
        mx = mesh.shape[x_axis]
        NY, NZ, NX = grid.padded_shape
        r = grid.radius
        S = grid.pml + r
        if NY % my or NX % mx:
            raise ValueError(
                f"padded dims ({NY},{NX}) must divide mesh ({my},{mx})"
            )
        self.by, self.bx = NY // my, NX // mx
        if self.by < S + r or self.bx < S + r:
            raise ValueError(
                f"blocks ({self.by},{self.bx}) must be >= pml+2*radius={S+r} "
                "so CPML memory variables never straddle a cut"
            )
        self._step = make_acoustic_step(grid)
        profs = build_profiles(grid, dt, c_max, f0, dtype=np.float64)
        # full-length broadcastable (a, b) per axis; sharded/sliced in specs
        self._ay = np.asarray(profs[0][0], dtype)
        self._by_ = np.asarray(profs[0][1], dtype)
        self._az = np.asarray(profs[1][0], dtype)
        self._bz = np.asarray(profs[1][1], dtype)
        self._ax = np.asarray(profs[2][0], dtype)
        self._bx_ = np.asarray(profs[2][1], dtype)

    def c2dt2(self, vp: jax.Array) -> jax.Array:
        pad = self.grid.pad
        vpad = jnp.pad(vp.astype(self.dtype), [(pad, pad)] * 3, mode="edge")
        return (vpad * self.dt) ** 2

    def __call__(self, vp, geom, wavelet) -> jax.Array:
        """Seismogram (nt, nrec); forward only (use the GSPMD path for
        gradients)."""
        r = self.grid.radius
        by, bx = self.by, self.bx
        NY, NZ, NX = self.grid.padded_shape
        yax, xax = self.y_axis, self.x_axis
        step = self._step
        dtype = self.dtype

        def ghost_pad(c_loc):
            return jnp.pad(c_loc, ((r, r), (0, 0), (r, r)), mode="edge")

        def ghost_pad_y(prof):  # (by,1,1) broadcast profile: pad dim 0 only
            return jnp.pad(prof, ((r, r), (0, 0), (0, 0)), mode="edge")

        def ghost_pad_x(prof):  # (1,1,bx) broadcast profile: pad dim 2 only
            return jnp.pad(prof, ((0, 0), (0, 0), (r, r)), mode="edge")

        def zero_ghosts(p):
            z = 0.0
            p = p.at[0:r].set(z)
            p = p.at[-r:].set(z)
            p = p.at[:, :, 0:r].set(z)
            p = p.at[:, :, -r:].set(z)
            return p

        def local_run(c2_loc, ay, by_prof, az, bz, ax, bx_prof, w, src_idx, rcv_idx):
            iy = lax.axis_index(yax)
            ix = lax.axis_index(xax)
            y0 = iy * by
            x0 = ix * bx
            c2g = ghost_pad(c2_loc)
            params = AcousticParams(
                c2dt2=c2g,
                a=(ghost_pad_y(ay), az, ghost_pad_x(ax)),
                b=(ghost_pad_y(by_prof), bz, ghost_pad_x(bx_prof)),
                src_idx=src_idx,  # unused inside; scatter handled here
                rcv_idx=rcv_idx,
            )

            # local (ghosted) coordinates of sources/receivers + ownership
            def localize(idx):
                ly = idx[..., 0] - y0 + r
                lz = idx[..., 1]
                lx = idx[..., 2] - x0 + r
                own = (
                    (idx[..., 0] >= y0)
                    & (idx[..., 0] < y0 + by)
                    & (idx[..., 2] >= x0)
                    & (idx[..., 2] < x0 + bx)
                )
                shp = c2g.shape
                ly = jnp.clip(ly, 0, shp[0] - 1)
                lx = jnp.clip(lx, 0, shp[2] - 1)
                return (ly, lz, lx), own

            src, src_own = localize(src_idx)
            rcv, rcv_own = localize(rcv_idx)
            shape_loc = c2g.shape
            z = jnp.zeros(shape_loc, dtype)
            state = AcousticState(
                p_prev=z, p=z, phi=(z, z, z), psi=(z, z, z)
            )

            def body(s, w_t):
                p = halo_exchange(s.p, yax, 0, r)
                p = halo_exchange(p, xax, 2, r)
                s = s._replace(p=p)
                s, _ = step(s, params, w_t)
                p_new = zero_ghosts(s.p)
                p_new = p_new.at[src].add(
                    jnp.where(src_own, c2g[src] * w_t, 0.0)
                )
                s = s._replace(p=p_new)
                rec = jnp.where(rcv_own, p_new[rcv], 0.0)
                return s, rec

            _, seis = lax.scan(body, state, w)
            return lax.psum(lax.psum(seis, yax), xax)

        fn = jax.shard_map(
            local_run,
            mesh=self.mesh,
            in_specs=(
                P(yax, None, xax),  # c2
                P(yax, None, None),  # ay
                P(yax, None, None),  # by
                P(),  # az
                P(),  # bz
                P(None, None, xax),  # ax
                P(None, None, xax),  # bx
                P(),  # wavelet
                P(),  # src_idx
                P(),  # rcv_idx
            ),
            out_specs=P(),
            check_vma=False,
        )
        return fn(
            self.c2dt2(vp),
            self._ay,
            self._by_,
            self._az,
            self._bz,
            self._ax,
            self._bx_,
            wavelet.astype(dtype),
            geom.src_idx,
            geom.rcv_idx,
        )
