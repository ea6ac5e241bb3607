"""tpufwi — a TPU-native full-waveform inversion framework in JAX.

Capability set per BASELINE.json (see SURVEY.md for the blueprint):
  * 2D/3D acoustic + 2D elastic P-SV forward modeling (leapfrog / staggered
    velocity-stress, 4th/8th-order space, CPML fused into the update).
  * Adjoint-state gradients via boundary-saving reverse time-stepping with
    an exact discrete transpose (tpufwi/adjoint.py).
  * L2 misfit, preconditioning, L-BFGS / NLCG, multiscale frequency
    continuation (tpufwi/invert.py).
  * Shot data-parallelism + 3D domain decomposition over a TPU mesh with
    XLA collectives (tpufwi/sharding.py).
"""

from .grid import Grid, cfl_dt
from .models import Model
from .wavelets import ormsby, ricker
from .acquisition import (
    Geometry,
    OffGridGeometry,
    PointSet,
    line_geometry,
    split_spread_survey,
)
from .propagators.acoustic2d import AcousticPropagator
from .propagators.elastic2d import ElasticPropagator, elastic_cfl_dt
from .propagators.elastic3d import Elastic3dPropagator, make_elastic3d_simulator
from .propagators.acoustic3d import ShardedAcoustic3D, domain_sharding
from .adjoint import (
    make_simulator,
    make_simulator_offgrid,
    make_simulator_vd,
    make_simulator_visco,
    make_simulator_tti,
    make_simulator_vti,
)
from .adjoint3d_pallas import make_simulator3d_fused
from .rtm import migrate
from .resolution import hessian_diag_points, hessian_diag_probe, psf
from .eikonal import eikonal, first_breaks, traveltime_tomography
from .lsrtm import born_operators, gauss_newton, lsrtm
from .encoding import EncodedFwiProblem, invert_encoded
from .timelapse import double_difference_data, double_difference_problem

__version__ = "0.1.0"

__all__ = [
    "Grid",
    "cfl_dt",
    "Model",
    "ormsby",
    "ricker",
    "Geometry",
    "line_geometry",
    "split_spread_survey",
    "AcousticPropagator",
    "ElasticPropagator",
    "elastic_cfl_dt",
    "ShardedAcoustic3D",
    "domain_sharding",
    "make_simulator",
    "make_simulator_vd",
    "make_simulator3d_fused",
    "__version__",
]
