"""Utilities: grids, wavelets, acquisition, config, optimizers (alias)."""

from tpufwi.grid import Grid, cfl_dt  # noqa: F401
from tpufwi.wavelets import ricker, gaussian_derivative  # noqa: F401
from tpufwi.acquisition import Geometry, line_geometry, split_spread_survey  # noqa: F401
from tpufwi.config import FwiConfig, StageCfg  # noqa: F401
from tpufwi.optimize import minimize, LbfgsHistory, backtracking_line_search  # noqa: F401
from tpufwi.invert import FwiProblem, invert, build_synthetic_problem  # noqa: F401
