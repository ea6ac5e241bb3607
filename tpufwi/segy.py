"""Minimal SEG-Y (rev 1) reader/writer — pure NumPy, no dependencies.

Scope: post-stack/shot-gather style files with a uniform trace length —
what FWI workflows exchange. Supported sample formats: 1 (4-byte IBM
float, the classic), 5 (4-byte IEEE). Headers are big-endian per the
standard. Writing always emits format 5 (IEEE) with the few trace-header
words FWI cares about (ffid, channel, source/group coordinates in the
elevation-scalar convention, dt in microseconds).

This is an interchange layer, not a full toolkit: unusual extended
textual headers, varying trace lengths, and legacy formats 2/3/8 are
rejected loudly rather than guessed at.
"""

from __future__ import annotations

import struct
from typing import NamedTuple

import numpy as np

_BIN_DT = 3216  # binary header offsets (1-indexed byte positions - 3201)
_BIN_NS = 3220
_BIN_FMT = 3224


def _ibm_to_float(u32: np.ndarray) -> np.ndarray:
    """Vectorized IBM System/360 hexfloat -> float64."""
    u32 = u32.astype(np.uint32)
    sign = np.where(u32 >> 31, -1.0, 1.0)
    exponent = ((u32 >> 24) & 0x7F).astype(np.int64) - 64
    mantissa = (u32 & 0x00FFFFFF).astype(np.float64) / float(1 << 24)
    return sign * mantissa * np.power(16.0, exponent)


def _float_to_ibm(f: np.ndarray) -> np.ndarray:
    """Vectorized float -> IBM hexfloat (round-trips through the reader
    to ~1e-7 relative — IBM has a 24-bit mantissa)."""
    f = np.asarray(f, np.float64)
    sign = (f < 0).astype(np.uint32) << 31
    a = np.abs(f)
    with np.errstate(divide="ignore"):
        exponent = np.where(a > 0, np.ceil(np.log2(a) / 4.0), 0).astype(np.int64)
    # normalize mantissa into [1/16, 1)
    mant = np.where(a > 0, a / np.power(16.0, exponent), 0.0)
    adjust = mant >= 1.0
    exponent = exponent + adjust
    mant = np.where(adjust, mant / 16.0, mant)
    m24 = np.round(mant * (1 << 24)).astype(np.uint64)
    # rounding may carry into 1.0
    carry = m24 >= (1 << 24)
    exponent = exponent + carry
    m24 = np.where(carry, m24 >> 4, m24).astype(np.uint32)
    exp_biased = np.clip(exponent + 64, 0, 127).astype(np.uint32)
    out = sign | (exp_biased << 24) | (m24 & 0x00FFFFFF)
    return np.where(a == 0, sign, out).astype(np.uint32)


class SegyData(NamedTuple):
    data: np.ndarray  # (ntrace, ns) float
    dt: float  # seconds
    ffid: np.ndarray  # (ntrace,) field record numbers
    sx: np.ndarray  # source x (scalar-applied)
    gx: np.ndarray  # group x


def read_segy(path: str) -> SegyData:
    with open(path, "rb") as fh:
        raw = fh.read()
    if len(raw) < 3600:
        raise ValueError("not a SEG-Y file (shorter than the 3600-byte header)")
    ns = struct.unpack(">H", raw[_BIN_NS : _BIN_NS + 2])[0]
    dt_us = struct.unpack(">H", raw[_BIN_DT : _BIN_DT + 2])[0]
    fmt = struct.unpack(">H", raw[_BIN_FMT : _BIN_FMT + 2])[0]
    if fmt not in (1, 5):
        raise ValueError(f"unsupported SEG-Y sample format {fmt} (need 1 or 5)")
    if ns == 0:
        raise ValueError("binary header ns=0 (varying trace lengths unsupported)")
    tlen = 240 + 4 * ns
    body = raw[3600:]
    if len(body) % tlen:
        raise ValueError("trace block size does not divide the data section")
    ntr = len(body) // tlen
    blob = np.frombuffer(body, np.uint8).reshape(ntr, tlen)
    hdr = blob[:, :240]

    def h32(off):
        return hdr[:, off : off + 4].copy().view(">i4").reshape(ntr)

    def h16(off):
        return hdr[:, off : off + 2].copy().view(">i2").reshape(ntr)

    ffid = h32(8)
    scalco = h16(70).astype(np.float64)
    scale = np.where(scalco > 0, scalco, np.where(scalco < 0, -1.0 / scalco, 1.0))
    sx = h32(72).astype(np.float64) * scale
    gx = h32(80).astype(np.float64) * scale
    if fmt == 1:
        samples_u32 = blob[:, 240:].copy().view(">u4").reshape(ntr, ns)
        data = _ibm_to_float(np.asarray(samples_u32))
    else:
        data = blob[:, 240:].copy().view(">f4").reshape(ntr, ns).astype(np.float64)
    return SegyData(data=np.ascontiguousarray(data), dt=dt_us * 1e-6,
                    ffid=ffid, sx=sx, gx=gx)


def write_segy(path: str, data: np.ndarray, dt: float, ffid=None,
               sx=None, gx=None, ibm: bool = False) -> None:
    """Write (ntrace, ns) traces. ``ibm=True`` emits format 1 (IBM float,
    ~1e-7 round-trip); default format 5 (IEEE, exact for f32 inputs).

    NOTE: SEG-Y rev 1 stores dt as an integer MICROsecond count — a
    non-integral-microsecond dt (typical of CFL-derived steps) is rounded
    on write; resample or accept the <=0.5 us quantization."""
    data = np.asarray(data)
    if data.ndim != 2:
        raise ValueError("data must be (ntrace, ns)")
    ntr, ns = data.shape
    if ns > 65535:
        raise ValueError("ns > 65535 does not fit the rev-1 binary header")
    ffid = np.arange(1, ntr + 1) if ffid is None else np.asarray(ffid)
    sx = np.zeros(ntr) if sx is None else np.asarray(sx)
    gx = np.zeros(ntr) if gx is None else np.asarray(gx)
    text = ("C 1 tpufwi SEG-Y export" + " " * 80)[:80].ljust(3200)
    bin_hdr = bytearray(400)
    struct.pack_into(">H", bin_hdr, _BIN_DT - 3200, int(round(dt * 1e6)))
    struct.pack_into(">H", bin_hdr, _BIN_NS - 3200, ns)
    struct.pack_into(">H", bin_hdr, _BIN_FMT - 3200, 1 if ibm else 5)
    with open(path, "wb") as fh:
        fh.write(text.encode("ascii"))
        fh.write(bytes(bin_hdr))
        for i in range(ntr):
            th = bytearray(240)
            struct.pack_into(">i", th, 8, int(ffid[i]))
            struct.pack_into(">h", th, 70, 1)  # scalco = 1 (unscaled)
            struct.pack_into(">i", th, 72, int(round(sx[i])))
            struct.pack_into(">i", th, 80, int(round(gx[i])))
            struct.pack_into(">h", th, 114, ns)
            struct.pack_into(">h", th, 116, int(round(dt * 1e6)))
            fh.write(bytes(th))
            if ibm:
                fh.write(_float_to_ibm(data[i]).astype(">u4").tobytes())
            else:
                fh.write(data[i].astype(">f4").tobytes())
