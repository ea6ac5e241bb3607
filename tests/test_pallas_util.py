"""bspec (kernels/pallas_util.py): index-map int literals must stay i32
under jax_enable_x64, or the TPU Mosaic compiler refuses the transform
function ("failed to legalize operation 'func.return'" — observed on the
hardware CI lane, runs/tpu_queue/tpu_ci.log). The suite's conftest
enables x64 globally, so these assertions run in exactly the failing
configuration."""

import jax
import jax.numpy as jnp
import numpy as np

from tpufwi.kernels.pallas_util import bspec


def test_int_literals_coerced_to_i32():
    spec = bspec((8, 128), lambda i, j: (i, 0, j))
    out = spec.index_map(np.int32(1), np.int32(2))
    assert out[1].dtype == np.int32
    # traced/computed components pass through untouched
    assert out[0] == 1 and out[2] == 2


def test_traced_index_map_stays_i32_under_x64():
    assert jax.config.jax_enable_x64  # conftest guarantees this
    spec = bspec((8, 128), lambda i: (jnp.maximum(i - 1, 0), 0))

    def probe(i):
        a, b = spec.index_map(i)
        return a, b

    sh = jax.eval_shape(probe, jax.ShapeDtypeStruct((), jnp.int32))
    assert sh[0].dtype == jnp.int32
    assert np.asarray(spec.index_map(np.int32(3))[1]).dtype == np.int32


def test_kwarg_only_spec_roundtrip():
    from jax.experimental.pallas import tpu as pltpu

    spec = bspec(memory_space=pltpu.ANY)
    assert spec.index_map is None
