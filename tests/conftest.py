"""Test configuration: force JAX onto a virtual 8-device CPU mesh.

This image pre-registers an 'axon' TPU backend via sitecustomize and pins
JAX_PLATFORMS=axon, so plain env-var overrides are ignored; jax.config is the
reliable switch. XLA_FLAGS must carry the host-device count before the CPU
client initializes. The real-TPU paths (bench.py, __graft_entry__.py) run
outside pytest and keep the axon backend.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
