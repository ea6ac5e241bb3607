"""The driver-facing entry points stay green under pytest.

``__graft_entry__.dryrun_multichip`` is the driver's only multi-chip
signal (VERDICT r1 item 1): it builds a ("shot",) 2D mesh and a
("shot","y","x") hybrid 3D mesh, jits the full training step over each,
and asserts sharded == unsharded numerics. Running it in-process here
(the suite already forces the 8-virtual-device CPU platform, so the
self-defense block is a no-op) pins that signal to the test suite —
a regression shows up locally before the driver sees it.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def test_dryrun_multichip_8():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)
