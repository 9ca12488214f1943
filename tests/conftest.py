"""Test configuration: run everything on a virtual 8-device CPU platform so
sharding tests exercise real multi-device SPMD without TPU hardware.

The environment's sitecustomize registers an `axon` TPU backend and sets
jax_platforms programmatically, so the env var alone is not enough — we must
update the jax config before any backend is initialized."""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
