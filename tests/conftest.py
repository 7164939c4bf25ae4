"""Test configuration: force an 8-virtual-device CPU platform so sharded code
paths (mesh/pjit/collectives) run without TPU hardware.

Note: the environment's axon site hook pins ``JAX_PLATFORMS=axon`` at
interpreter startup, so the env var alone is not enough — we must also set the
config after importing jax.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402  (import after env setup)

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

assert jax.devices()[0].platform == "cpu"
