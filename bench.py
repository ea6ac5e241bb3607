#!/usr/bin/env python
"""Headline benchmark: Marmousi2-scale shots/sec/chip, forward + adjoint.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

The graded metric (BASELINE.json:2) is "Marmousi2 shots/sec/chip
(fwd+adjoint)". No published reference numbers exist (BASELINE.md), so
vs_baseline is measured against the spec-derived speed-of-light estimate of
~4 shots/s/chip at 70% HBM SoL on a 10 m Marmousi2 grid with nt=5000
(SURVEY.md §6 worked example). Timing uses the relay-safe nt-slope of
scalar-output programs (tpufwi/bench/bench_stencil.py docstring).
"""

import json

BASELINE_SHOTS_PER_SEC = 4.0  # SURVEY.md §6 70%-of-SoL estimate


def main():
    from tpufwi.bench import bench_fwd_adjoint

    res = bench_fwd_adjoint()
    print(
        json.dumps(
            {
                "metric": "marmousi2_shots_per_sec_per_chip_fwd_adjoint",
                "value": round(res["shots_per_sec_per_chip"], 4),
                "unit": "shots/s/chip",
                "vs_baseline": round(
                    res["shots_per_sec_per_chip"] / BASELINE_SHOTS_PER_SEC, 4
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
