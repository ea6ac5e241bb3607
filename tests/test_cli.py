"""CLI lanes (python -m tpufwi.invert): every physics family must run
end-to-end from main() with dotted overrides and leave artifacts."""

import pytest
import json
import os

import numpy as np

from tpufwi.invert import main


def _common(run_dir, extra):
    return [
        f"run_dir={run_dir}",
        "prop.order=4", "prop.pml=8", "prop.dtype=float64", "prop.impl=jnp",
        "acq.n_shots=2", "acq.t_max=0.5", "acq.f0=11.0", "acq.rcv_dx=3",
        "model.nz=36", "model.nx=48",
        "opt.vmin=1400.0", "opt.vmax=2600.0",
        'stages=[{"fmax": 8.0, "iterations": 2}]',
        "precond.use_illumination=false",
    ] + extra


@pytest.mark.slow  # slow-lane: interpret-mode/demo-grade; fast lane keeps a representative
def test_cli_elastic(tmp_path):
    rd = str(tmp_path / "el")
    main(["--mesh", "0"] + _common(rd, ["physics=elastic"]))
    for f in ("vp_final.npy", "vs_final.npy", "ckpt_mp.npz", "log.jsonl"):
        assert os.path.exists(os.path.join(rd, f)), f
    recs = [json.loads(l) for l in open(os.path.join(rd, "log.jsonl"))]
    iters = [r for r in recs if "event" not in r]
    assert len(iters) == 2 and np.isfinite(iters[-1]["J"])
    assert iters[-1]["J"] <= iters[0]["J"]
    # round-5: the multiparameter lane names its engine per stage too
    eng = [r for r in recs if r.get("event") == "engine"]
    assert len(eng) == 1 and eng[0]["engine"] == "jnp"


def test_cli_encoded(tmp_path):
    rd = str(tmp_path / "enc")
    main(["--mesh", "0"] + _common(rd, ["physics=encoded",
                                        "enc_realizations=1"]))
    assert os.path.exists(os.path.join(rd, "vp_final.npy"))
    recs = [json.loads(l) for l in open(os.path.join(rd, "log.jsonl"))]
    assert len(recs) == 2 and np.isfinite(recs[-1]["J"])


def test_cli_unknown_physics(tmp_path):
    import pytest

    with pytest.raises(ValueError, match="unknown physics"):
        main(_common(str(tmp_path / "x"), ["physics=spooky"]))
