"""Test configuration: run JAX on a virtual 8-device CPU mesh — or, with
TEXT_ALIGNMENT_TPU_HW_TESTS=1, on the real TPU for the `-m tpu` hardware
parity lane (tests/test_tpu_hw.py).

Default (CPU) mode: the ambient environment pins a TPU platform
(JAX_PLATFORMS=axon) and the jaxtyping pytest plugin imports jax before this
conftest runs, so setting the env var alone is not enough — we also update
jax.config directly (backends have not been initialized yet at conftest
import time).

Hardware mode: `TEXT_ALIGNMENT_TPU_HW_TESTS=1 python -m pytest tests/ -m tpu
-q` leaves the platform alone (the axon TPU tunnel), runs only tests marked
``tpu``, and skips everything else — the tunnel is single-tenant and remote
compiles are slow, so the CPU suite must not run there.
"""

import os

import pytest

HW_MODE = os.environ.get("TEXT_ALIGNMENT_TPU_HW_TESTS") == "1"

if not HW_MODE:
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()

    import jax

    jax.config.update("jax_platforms", "cpu")

# NB: do NOT enable jax_compilation_cache_dir on the CPU path — measured on
# this image, the XLA:CPU AOT serialization path it triggers makes the train
# step ~3.5x slower at runtime and ballooned compiles, dwarfing any reuse
# win (the cache also fails to persist across the machine-feature
# mismatch, so it never even gets hits). utils/compile_cache.py gates this.


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "tpu: requires real TPU hardware "
        "(run with TEXT_ALIGNMENT_TPU_HW_TESTS=1 ... -m tpu)"
    )


def pytest_collection_modifyitems(config, items):
    if HW_MODE:
        skip = pytest.mark.skip(
            reason="CPU-suite test skipped in TPU hardware mode"
        )
        for item in items:
            if "tpu" not in item.keywords:
                item.add_marker(skip)
    else:
        skip = pytest.mark.skip(
            reason="needs real TPU (TEXT_ALIGNMENT_TPU_HW_TESTS=1)"
        )
        for item in items:
            if "tpu" in item.keywords:
                item.add_marker(skip)
