"""Test configuration: run everything on a virtual 8-device CPU mesh.

The outer environment pins JAX to the 'axon' remote-TPU plugin and that plugin
overrides the JAX_PLATFORMS env var, so we must force CPU through jax.config
(which wins) in addition to setting XLA_FLAGS before the first jax import.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"
# Keep matmuls at full f32 precision on CPU for parity tests.
os.environ.setdefault("JAX_DEFAULT_MATMUL_PRECISION", "highest")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

assert jax.default_backend() == "cpu", jax.default_backend()
assert len(jax.devices()) == 8, jax.devices()
