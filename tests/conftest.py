"""Test config: run all tests on a virtual 8-device CPU mesh so sharding
logic is exercised without TPU hardware.

The environment preloads jax (via /root/.axon_site/sitecustomize.py) with
JAX_PLATFORMS=axon — a tunneled single TPU whose per-op dispatch and remote
compile latency is seconds.  jax is thus already imported by the time this
conftest runs, so we must flip the platform via jax.config, not env vars.
"""
import os

# XLA_FLAGS is read at (lazy) backend creation, which hasn't happened yet.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402  (already imported by sitecustomize anyway)

jax.config.update("jax_platforms", "cpu")
