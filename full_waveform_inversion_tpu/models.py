"""Model families: earth models, propagators, misfits (alias of tpufwi)."""

from tpufwi.models import Model, from_lame  # noqa: F401
from tpufwi.propagators.acoustic2d import AcousticPropagator  # noqa: F401
from tpufwi.propagators.elastic2d import ElasticPropagator  # noqa: F401
from tpufwi.propagators.acoustic3d import ShardedAcoustic3D  # noqa: F401
from tpufwi.misfit import l2_misfit, normalized_l2_misfit  # noqa: F401
from tpufwi.io import marmousi_like, overthrust_like, load_marmousi2, load_overthrust  # noqa: F401
