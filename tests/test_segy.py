"""SEG-Y interchange layer (tpufwi/segy.py): IBM float codec against
reference values, IEEE and IBM write/read round-trips, header fields,
and loud rejection of unsupported layouts."""

import numpy as np
import pytest

from tpufwi.segy import (
    SegyData,
    _float_to_ibm,
    _ibm_to_float,
    read_segy,
    write_segy,
)


def test_ibm_codec_reference_values():
    # classic reference: 0x42640000 = 100.0, 0xC2640000 = -100.0,
    # 0x41100000 = 1.0 (IBM: 0.0625 * 16^1)
    ref = np.array([0x42640000, 0xC2640000, 0x41100000, 0x00000000],
                   np.uint32)
    vals = _ibm_to_float(ref)
    assert np.allclose(vals, [100.0, -100.0, 1.0, 0.0])


def test_ibm_codec_roundtrip():
    rng = np.random.default_rng(0)
    x = np.concatenate([
        rng.standard_normal(500) * np.exp(rng.uniform(-20, 20, 500)),
        [0.0, 1.0, -1.0, 1e-30, -1e30],
    ])
    back = _ibm_to_float(_float_to_ibm(x))
    rel = np.abs(back - x) / np.maximum(np.abs(x), 1e-300)
    # IBM wobble: a leading hex digit of 1 leaves 21 effective bits,
    # so the worst-case relative error is ~2^-21 ~ 5e-7
    assert rel[np.abs(x) > 0].max() < 1e-6
    assert back[x == 0].item() == 0.0


@pytest.mark.parametrize("ibm", [False, True])
def test_write_read_roundtrip(tmp_path, ibm):
    rng = np.random.default_rng(1)
    ntr, ns, dt = 12, 251, 0.002
    data = rng.standard_normal((ntr, ns)).astype(np.float32) * 1e3
    ffid = np.repeat([1, 2, 3], 4)
    sx = np.repeat([100.0, 500.0, 900.0], 4)
    gx = np.tile([200.0, 300.0, 400.0, 500.0], 3)
    p = str(tmp_path / f"t{int(ibm)}.segy")
    write_segy(p, data, dt, ffid=ffid, sx=sx, gx=gx, ibm=ibm)
    out = read_segy(p)
    assert isinstance(out, SegyData)
    assert out.data.shape == (ntr, ns)
    assert abs(out.dt - dt) < 1e-9
    assert (out.ffid == ffid).all()
    assert np.allclose(out.sx, sx) and np.allclose(out.gx, gx)
    tol = 1e-6 if ibm else 1e-12
    rel = np.abs(out.data - data).max() / np.abs(data).max()
    assert rel < tol, rel


def test_rejects_bad_files(tmp_path):
    p = str(tmp_path / "short.segy")
    with open(p, "wb") as f:
        f.write(b"x" * 100)
    with pytest.raises(ValueError, match="3600"):
        read_segy(p)
    # unsupported sample format
    import struct

    p2 = str(tmp_path / "fmt2.segy")
    hdr = bytearray(3600)
    struct.pack_into(">H", hdr, 3220, 10)
    struct.pack_into(">H", hdr, 3224, 2)  # format 2: 32-bit int
    with open(p2, "wb") as f:
        f.write(bytes(hdr))
    with pytest.raises(ValueError, match="format"):
        read_segy(p2)
