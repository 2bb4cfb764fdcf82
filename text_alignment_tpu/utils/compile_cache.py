"""Platform-gated persistent XLA compilation cache.

TPU compiles in this deployment go through a remote tunnel and cost
seconds-to-minutes, so a persistent on-disk cache makes every process after
the first start warm.  On XLA:CPU, however, the AOT serialization path the
cache triggers makes steps ~3.5x slower at runtime and the cache never gets
hits anyway (machine-feature mismatch across processes) — measured on this
image, see tests/conftest.py.  So the cache must only ever be enabled when
the effective backend is a real accelerator, which is only knowable once the
backend is initialized.  Hence this deferred hook instead of an import-time
config update: call :func:`ensure_compile_cache` right before the first jit
in any device-facing entry point (CLI, serve, bench, recognizer).

Opt out entirely with ``TEXT_ALIGNMENT_TPU_NO_COMPILE_CACHE=1``.
"""

import os

_done = False


def ensure_compile_cache() -> bool:
    """Enable the persistent XLA compile cache iff the backend is not CPU.

    Idempotent and cheap after the first call.  Returns True if the cache is
    (now) enabled, False if it was skipped (CPU backend, opt-out, or jax
    config API drift).  Initializes the JAX backend as a side effect, which
    is fine at every call site — they are all about to use devices anyway.
    """
    global _done
    if _done:
        return _enabled
    _done = True
    globals()["_enabled"] = False
    if os.environ.get("TEXT_ALIGNMENT_TPU_NO_COMPILE_CACHE"):
        return False
    try:
        import jax

        if jax.default_backend() == "cpu":
            return False
        cache_dir = os.environ.get(
            "JAX_COMPILATION_CACHE_DIR",
            os.path.join(os.path.expanduser("~"), ".cache",
                         "text_alignment_tpu_xla"),
        )
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        globals()["_enabled"] = True
        return True
    except Exception:  # jax config API drift must never break callers
        return False


_enabled = False
