"""Time-step kernels: Pallas (TPU-native), jnp twins, and NumPy oracles.

Three implementations of identical step semantics (SURVEY.md §1):
  * ``*_pallas.py`` — fused Mosaic kernels, the production TPU path.
  * ``*_jnp.py``    — plain jax.numpy twins: differentiable, CPU-runnable,
                      the correctness reference for the Pallas kernels.
  * ``oracle_numpy.py`` — independent fp64 NumPy/SciPy implementation,
                      the ground truth for the <1e-6 RMS requirement (V1).
"""
