"""Test configuration: force the JAX CPU backend with 8 virtual devices so
sharding/mesh tests run without TPU hardware (reference test strategy:
SURVEY.md §4)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") +
                           " --xla_force_host_platform_device_count=8")
os.environ.setdefault("VLLM_TPU_TEST_MODE", "1")

# The environment ships a sitecustomize that imports jax (and pins
# JAX_PLATFORMS=axon) before conftest runs, so the env var alone is too
# late — override through the config API as well.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
