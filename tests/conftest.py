"""Test configuration: run everything on a virtual 8-device CPU mesh.

Standard JAX pattern for testing pjit/shard_map sharding without TPU pods
(SURVEY.md §4).

This environment ships an ``axon`` TPU PJRT plugin that a global
``sitecustomize`` registers (importing jax with JAX_PLATFORMS=axon) before
any conftest runs. Backend *initialization* is lazy, though, so overriding
``jax_platforms`` via jax.config here — before the first op runs — still
gives a pure-CPU test session without the ~30s TPU tunnel setup.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long-running executed-contract tests")
