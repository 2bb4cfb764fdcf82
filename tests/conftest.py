"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Must set flags before jax initializes (hence top of conftest). The real-TPU
benchmark path is exercised by bench.py, not the unit tests.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
