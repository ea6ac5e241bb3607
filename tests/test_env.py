"""Sanity: the test suite runs on CPU with 8 virtual devices (SURVEY §4.7)."""

import jax


def test_cpu_backend_with_8_devices():
    assert jax.default_backend() == "cpu"
    assert jax.device_count() == 8
