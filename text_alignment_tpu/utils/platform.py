"""Platform-pin introspection shared by every host/device routing choice.

The batched pipeline routes stages (NW fill, device lineest, device skew,
grid alignment) to the accelerator only when one is actually pinned, and it
must decide WITHOUT initializing a JAX backend: on this runtime backend
initialization can block for tens of seconds (remote tunnel handshake), and
pure-host runs (``backend="host"``, existing-OCR injection) never pay it.

One helper, three former copies (pipeline.process, evaluate, ops.skew_device
each grew their own) — the pin semantics live here only.
"""

import os


def accel_platform() -> bool:
    """True when the pinned JAX platform is an accelerator.

    Reads the pin from ``jax.config.jax_platforms`` when jax is importable —
    that reflects BOTH pin styles this environment needs (the
    ``JAX_PLATFORMS`` env var alone is ignored by the installed out-of-tree
    TPU plugin, so tests/conftest.py additionally calls
    ``jax.config.update("jax_platforms", "cpu")``; reading the config sees
    either). Only when nothing is pinned does it fall back to
    ``jax.default_backend()``, which initializes the backend.
    """
    plat = ""
    try:
        import jax

        plat = jax.config.jax_platforms or ""
    except Exception:
        plat = os.environ.get("JAX_PLATFORMS") or ""
    plat = plat.split(",")[0].strip()
    if plat:
        return plat != "cpu"
    import jax

    return jax.default_backend() != "cpu"
