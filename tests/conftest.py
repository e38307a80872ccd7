"""Test harness config: force an 8-device virtual CPU platform so sharding
tests exercise multi-chip code paths without TPU hardware (SURVEY.md §4).

Note: the axon TPU plugin in this image overrides the JAX_PLATFORMS env var
during ``import jax``, so we must force the platform via jax.config *after*
import (verified: env-var alone still selects the TPU)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

# persistent compilation cache: repeat suite runs skip recompiles
from icon_tpu.utils.jax_cache import enable as _enable_cache  # noqa: E402

_enable_cache()

assert jax.devices()[0].platform == "cpu"
