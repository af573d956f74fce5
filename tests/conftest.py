"""Test harness config: force CPU jax with an 8-device virtual mesh.

The environment pins JAX_PLATFORMS=axon (the tunneled TPU); tests must run on
CPU with 8 virtual devices, so we override through jax.config before any
backend initialization.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")
