"""Per-stage timing/tracing — first-class observability the reference lacked
(SURVEY.md §5: bare prints only). Wraps stages in context managers and can
emit a JAX profiler trace for TPU work.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict


class StageTimer:
    def __init__(self, enabled: bool = True, sync_jax: bool = False):
        self.enabled = enabled
        self.sync_jax = sync_jax
        self.totals: dict[str, float] = defaultdict(float)
        self.counts: dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def __call__(self, name: str):
        if not self.enabled:
            yield
            return
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if self.sync_jax:
                import jax

                jax.effects_barrier()
            dt = time.perf_counter() - t0
            self.totals[name] += dt
            self.counts[name] += 1

    def report(self) -> str:
        lines = []
        for k in self.totals:
            lines.append(
                f"{k:>16s}: {self.totals[k]*1e3:9.2f} ms  x{self.counts[k]}"
            )
        return "\n".join(lines)


def stage_timer(enabled: bool = True, sync_jax: bool = False) -> StageTimer:
    return StageTimer(enabled=enabled, sync_jax=sync_jax)


@contextlib.contextmanager
def jax_profile_trace(logdir: str):
    """Capture a JAX profiler trace (view with tensorboard/xprof)."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
