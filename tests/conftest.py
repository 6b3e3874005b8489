"""Test environment: force an 8-device virtual CPU platform BEFORE any jax
use (SURVEY.md §4: the multi-device fake-backend analog the reference lacks).

Note: this image's sitecustomize registers a TPU ('axon') backend at
interpreter start, so the env var alone is not enough — we also update
jax.config after import.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert len(jax.devices()) == 8, jax.devices()
