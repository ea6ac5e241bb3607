"""Regularization (regularize.py) + config round-trip regression.

Covers: FD gradient checks for both terms, TV-vs-Tikhonov edge behavior,
the driver wiring (regularized inversion runs and the objective
decreases), and the FwiConfig round-trip bug class where _from_dict
silently dropped top-level scalar fields (misfit= overrides were lost)."""

import jax
import jax.numpy as jnp
import numpy as np

from tpufwi.config import FwiConfig
from tpufwi.regularize import REGULARIZERS, tikhonov, total_variation


def test_gradients_match_finite_differences():
    rng = np.random.default_rng(0)
    m = jnp.asarray(rng.standard_normal((20, 24)) * 100 + 2000.0)
    v = jnp.asarray(rng.standard_normal((20, 24)))
    for name, fn in REGULARIZERS.items():
        g = jax.grad(fn)(m)
        h = 1e-4
        fd = (fn(m + h * v) - fn(m - h * v)) / (2 * h)
        got = float(jnp.vdot(g, v))
        assert abs(got - float(fd)) < 1e-6 * max(1.0, abs(float(fd))), name


def test_tv_prefers_edges_tikhonov_prefers_smooth():
    """Same total contrast: a sharp step vs a linear ramp. Tikhonov
    penalizes the step far more (sum of squares); TV is ~contrast-
    invariant so the two are comparable, making it edge-preserving."""
    n = 64
    step = jnp.asarray(np.where(np.arange(n) < n // 2, 0.0, 100.0))[:, None]
    ramp = jnp.asarray(np.linspace(0.0, 100.0, n))[:, None]
    tik_ratio = float(tikhonov(step) / tikhonov(ramp))
    tv_ratio = float(
        total_variation(step, eps=1e-3) / total_variation(ramp, eps=1e-3)
    )
    assert tik_ratio > 10.0, tik_ratio
    assert 0.5 < tv_ratio < 2.0, tv_ratio


def test_config_roundtrip_keeps_all_scalar_fields():
    """with_overrides round-trips through a dict; every top-level scalar
    (misfit, run_dir, checkpoint_every) and the reg block must survive."""
    cfg = FwiConfig().with_overrides([
        "misfit=envelope",
        "reg.type=tv",
        "reg.weight=0.5",
        "checkpoint_every=3",
        "run_dir=/tmp/x",
    ])
    assert cfg.misfit == "envelope"
    assert cfg.reg.type == "tv" and cfg.reg.weight == 0.5
    assert cfg.checkpoint_every == 3 and cfg.run_dir == "/tmp/x"
    # JSON round-trip too
    cfg2 = FwiConfig.from_json(cfg.to_json())
    assert cfg2 == cfg


def test_regularized_inversion_decreases_objective(tmp_path):
    """One Tikhonov-regularized stage on a tiny problem: runs through the
    driver and the (data + reg) objective decreases."""
    import json

    from tpufwi.invert import main

    run = str(tmp_path / "regrun")
    main(["--mesh", "0", f"run_dir={run}", "reg.type=tikhonov",
          "reg.weight=1e4", "acq.n_shots=2", "acq.t_max=0.7",
          "model.nz=50", "model.nx=90", "prop.pml=10", "prop.order=4",
          "prop.impl=jnp", "acq.f0=9.0",
          'stages=[{"fmax": 8.0, "iterations": 3}]'])
    log = [json.loads(l) for l in open(run + "/log.jsonl")]
    Js = [e["J"] for e in log if "J" in e]
    assert len(Js) == 3 and Js[-1] < Js[0], Js
