"""Test configuration: run JAX on a virtual 8-device CPU mesh.

The ambient environment pins a TPU platform (JAX_PLATFORMS=axon) and the
jaxtyping pytest plugin imports jax before this conftest runs, so setting the
env var alone is not enough — we also update jax.config directly (backends
have not been initialized yet at conftest import time).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

# NB: do NOT enable jax_compilation_cache_dir here — measured on this
# image, the XLA:CPU AOT serialization path it triggers makes the train
# step ~3.5x slower at runtime and ballooned compiles, dwarfing any reuse
# win (the cache also fails to persist across the machine-feature
# mismatch, so it never even gets hits).
