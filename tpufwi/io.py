"""Model I/O: binary loaders + synthetic generators (SURVEY.md §2 `io.py`).

No datasets ship with this sandbox and there is no network (SURVEY.md §0),
so the Marmousi2 / SEG-EAGE Overthrust configs run on committed *synthetic
analogues* with the same statistical character (layering, dips, faults,
lens anomalies; water layer on top for Marmousi-like). The loaders below
read the real models when files are supplied (plain float32 binaries, the
standard distribution format).
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import numpy as np

# Canonical dimensions of the public datasets (for the binary loaders).
MARMOUSI2_SHAPE = (2801, 13601)  # (nz, nx) at 1.25 m
MARMOUSI2_DX = 1.25
OVERTHRUST_SHAPE = (187, 801, 801)  # (nz, ny, nx) at 25 m
OVERTHRUST_DX = 25.0


def load_float32_bin(path: str, shape: Tuple[int, ...]) -> np.ndarray:
    """Load a raw little-endian float32 binary (standard model exchange)."""
    arr = np.fromfile(path, dtype="<f4")
    if arr.size != int(np.prod(shape)):
        raise ValueError(f"{path}: got {arr.size} floats, expected {np.prod(shape)}")
    return arr.reshape(shape).astype(np.float64)


def resample2d(m: np.ndarray, factor: int) -> np.ndarray:
    """Block-mean downsample by an integer factor (anti-aliased enough for
    velocity models)."""
    nz, nx = (m.shape[0] // factor) * factor, (m.shape[1] // factor) * factor
    m = m[:nz, :nx]
    return m.reshape(nz // factor, factor, nx // factor, factor).mean(axis=(1, 3))


def load_marmousi2(
    path: Optional[str] = None,
    dx_target: float = 10.0,
    shape: Optional[Tuple[int, int]] = None,
    dx_in: Optional[float] = None,
):
    """Real Marmousi2 P-velocity if ``path`` (or $MARMOUSI2_VP_BIN) exists,
    else the synthetic analogue. Returns (vp[nz,nx] m/s, dx m).

    ``shape``/``dx_in`` override the canonical file dimensions (used by the
    committed tiny fixture in tests/fixtures/, which exercises the
    load/unit-convert/resample path without the 152 MB dataset)."""
    path = path or os.environ.get("MARMOUSI2_VP_BIN", "")
    if path and os.path.exists(path):
        vp = load_float32_bin(path, shape or MARMOUSI2_SHAPE)
        if vp.max() < 10.0:  # km/s convention
            vp = vp * 1000.0
        dx0 = dx_in or MARMOUSI2_DX
        factor = max(1, int(round(dx_target / dx0)))
        return resample2d(vp, factor), dx0 * factor
    return marmousi_like(dx=dx_target)


def marmousi_like(
    nz: int = 176,
    nx: int = 851,
    dx: float = 10.0,
    seed: int = 2024,
    water_depth_m: float = 450.0,
):
    """Synthetic Marmousi2-scale 2D model: water layer, dipping folded
    layers, two fault systems, a low-velocity wedge and a high-velocity
    salt-like body. Deterministic given ``seed``.

    Defaults give a 1.76 km x 8.5 km model at 10 m — the same cell count
    scale as Marmousi2 resampled to 10 m (SURVEY.md §6 worked example).
    Returns (vp [m/s], dx).
    """
    from scipy.ndimage import gaussian_filter

    rng = np.random.default_rng(seed)
    z = np.arange(nz)[:, None] * dx
    x = np.arange(nx)[None, :] * dx

    # folded, dipping stratigraphy: depth coordinate warped by smooth folds
    fold = (
        120.0 * np.sin(2 * np.pi * x / (nx * dx / 3.0))
        + 80.0 * np.sin(2 * np.pi * x / (nx * dx / 7.0) + 1.3)
        + 0.06 * x
    )
    zw = z + fold

    # two normal faults: lateral shifts of the warped depth
    f1 = nx // 3
    f2 = (2 * nx) // 3
    throw1, throw2 = 180.0, -240.0
    zw = zw + throw1 * (x > f1 * dx) + throw2 * (x > f2 * dx)

    # layered velocity: compaction trend + layer sequence
    n_layers = 24
    bounds = np.sort(rng.uniform(0, nz * dx * 1.6, n_layers))
    dv = rng.uniform(-220.0, 420.0, n_layers)
    vp = 1600.0 + 0.55 * zw
    for b, d in zip(bounds, dv):
        vp = vp + d * (zw > b)

    # low-velocity gas wedge and a fast salt-like body
    cz, cx = 0.55 * nz * dx, 0.42 * nx * dx
    wedge = np.exp(-(((z - cz) / 260.0) ** 2 + ((x - cx) / 900.0) ** 2))
    vp = vp - 420.0 * (wedge > 0.45)
    sz, sx = 0.8 * nz * dx, 0.72 * nx * dx
    salt = ((z - sz) / 420.0) ** 2 + ((x - sx) / 1500.0) ** 2 < 1.0
    vp = np.where(salt, 4450.0 + 0.02 * zw, vp)

    vp = gaussian_filter(vp, 1.0)
    # water layer
    wd = int(water_depth_m / dx)
    vp[:wd] = 1500.0
    return np.clip(vp, 1480.0, 4700.0), dx


def overthrust_like(
    nz: int = 94,
    ny: int = 100,
    nx: int = 200,
    dx: float = 25.0,
    seed: int = 7,
):
    """Synthetic SEG/EAGE-Overthrust-scale 3D model: thrusted folded layers
    over a faulted basement, deterministic. Returns (vp [m/s], dx)."""
    from scipy.ndimage import gaussian_filter

    rng = np.random.default_rng(seed)
    z = np.arange(nz)[:, None, None] * dx
    y = np.arange(ny)[None, :, None] * dx
    x = np.arange(nx)[None, None, :] * dx

    fold = (
        150.0 * np.sin(2 * np.pi * x / (nx * dx / 2.5) + 0.7)
        + 120.0 * np.cos(2 * np.pi * y / (ny * dx / 2.0))
        + 0.1 * x
    )
    zw = z + fold
    zw = zw + 300.0 * ((x > 0.5 * nx * dx) & (y > 0.3 * ny * dx))

    n_layers = 16
    bounds = np.sort(rng.uniform(0, nz * dx * 1.8, n_layers))
    dv = rng.uniform(-250.0, 500.0, n_layers)
    vp = 2200.0 + 0.6 * zw
    for b, d in zip(bounds, dv):
        vp = vp + d * (zw > b)
    vp = gaussian_filter(vp, 1.0)
    return np.clip(vp, 2000.0, 6000.0), dx


def load_overthrust(path: Optional[str] = None, decimate: int = 1):
    """Real Overthrust if available, else the synthetic analogue.
    Returns (vp[nz,ny,nx] m/s, dx). Note tpufwi 3D layout is (y,z,x) —
    transpose with np.transpose(vp, (1,0,2)) before building a Model."""
    path = path or os.environ.get("OVERTHRUST_VP_BIN", "")
    if path and os.path.exists(path):
        vp = load_float32_bin(path, OVERTHRUST_SHAPE)
        if vp.max() < 10.0:
            vp = vp * 1000.0
        if decimate > 1:
            vp = vp[::decimate, ::decimate, ::decimate]
        return vp, OVERTHRUST_DX * decimate
    return overthrust_like()
