"""Test configuration: run on the JAX CPU backend with 8 virtual devices.

CPU is the deterministic "fake backend" for TPU-less CI (SURVEY.md §4) and
the 8 virtual devices let the shard_map tests exercise real multi-device
meshes without hardware.

The environment's sitecustomize imports jax and registers a TPU plugin at
interpreter startup, so plain env vars are not enough — backends are still
uninitialized at conftest time, so ``jax.config`` wins.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
