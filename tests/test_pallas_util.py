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
    from jax.experimental import pallas as pl

    spec = bspec(memory_space=pl.ANY)
    assert spec.index_map is None


def test_default_index_map_replaced_with_i32_zeros():
    """A no-index-map bspec must NOT fall through to jax's
    default_index_map, whose python-int zeros lower as i64 constants
    under x64 (func.return (i64,i64,i64) — runs/tpu_queue7/tpu_ci_d.log).
    The substitution happens in to_block_mapping, where the operand rank
    is first known."""
    from jax._src import core as jax_core
    from jax._src.pallas import core as pallas_core
    from jax.experimental.pallas import tpu as pltpu

    spec = bspec(memory_space=pltpu.VMEM)
    aval = jax_core.ShapedArray((4, 8, 128), jnp.float32)
    i32 = jax_core.ShapedArray((), jnp.int32)
    bm = spec.to_block_mapping(
        "input[0]",
        aval,
        index_map_avals=(i32, i32),
        index_map_tree=jax.tree.structure(((0, 0), {})),
        grid=(2, 3),
        vmapped_dims=(),
    )
    for atom in bm.index_map_jaxpr.jaxpr.outvars:
        assert isinstance(atom, jax_core.Literal) and atom.val == 0
        assert atom.aval.dtype == jnp.int32, atom.aval
    assert bm.has_trivial_window()
    # explicit block_shape with no map gets the same treatment
    spec2 = bspec((2, 8, 128), memory_space=pltpu.VMEM)
    bm2 = spec2.to_block_mapping(
        "input[1]",
        aval,
        index_map_avals=(i32, i32),
        index_map_tree=jax.tree.structure(((0, 0), {})),
        grid=(2, 3),
        vmapped_dims=(),
    )
    for atom in bm2.index_map_jaxpr.jaxpr.outvars:
        assert atom.aval.dtype == jnp.int32
