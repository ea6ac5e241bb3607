"""Compatibility alias for the `tpufwi` package.

The driver's round-1 instructions name the package
`full_waveform_inversion_tpu` with `models/ ops/ parallel/ utils/`
submodules; the implementation lives in `tpufwi/` under the layout of
SURVEY.md §2. This package re-exports everything under both namings.
"""

from tpufwi import *  # noqa: F401,F403
from tpufwi import __version__  # noqa: F401

from . import models, ops, parallel, utils  # noqa: F401
