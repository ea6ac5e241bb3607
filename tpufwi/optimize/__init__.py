"""Model-update optimizers: L-BFGS, NLCG, line searches (SURVEY.md §2).

All operate on a single JAX array (the model) with host-side iteration
control; the expensive calls (loss, gradient) are user-provided jitted
functions. Box constraints are handled by projection.
"""

from .linesearch import backtracking_line_search  # noqa: F401
from .lbfgs import LbfgsHistory, lbfgs_direction  # noqa: F401
from .nlcg import NlcgState, nlcg_direction  # noqa: F401
from .driver import minimize, minimize_pytree  # noqa: F401
