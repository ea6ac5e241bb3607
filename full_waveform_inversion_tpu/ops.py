"""Compute ops: kernels, stencils, adjoint engines (alias of tpufwi)."""

from tpufwi.kernels.acoustic2d_jnp import make_acoustic_step  # noqa: F401
from tpufwi.kernels.acoustic2d_pallas import (  # noqa: F401
    make_fused_forward_step,
    make_leapfrog_kernel,
)
from tpufwi.kernels.acoustic2d_pallas_bwd import (  # noqa: F401
    make_fused_adjoint_step,
    make_recon_kernel,
)
from tpufwi.kernels.elastic2d_jnp import make_elastic_step  # noqa: F401
from tpufwi.kernels.stencils import apply_stencil, staggered_diff  # noqa: F401
from tpufwi.adjoint import make_simulator  # noqa: F401
from tpufwi.adjoint_pallas import make_simulator_pallas  # noqa: F401
from tpufwi.filters import lowpass  # noqa: F401
from tpufwi.precondition import precondition, gaussian_smooth  # noqa: F401
