"""Pallas NW wavefront kernel parity (interpret mode).

Interpret-mode execution of the Mosaic kernel is slow (~1 min for even a
128-bucket problem), so this runs only when TEXT_ALIGNMENT_TPU_SLOW_TESTS=1
or on real TPU hardware; the kernel is also verified on-device by
tools and the bench harness (fused fill+traceback parity at 2500x2300).
"""

import os
import random

import pytest
import jax


_on_tpu = jax.default_backend() == "tpu"
pytestmark = pytest.mark.skipif(
    not (_on_tpu or os.environ.get("TEXT_ALIGNMENT_TPU_SLOW_TESTS")),
    reason="interpret-mode pallas is slow; set TEXT_ALIGNMENT_TPU_SLOW_TESTS=1",
)


def test_pallas_fill_matches_host():
    from text_alignment_tpu.align.scoring import resolve_scoring
    from text_alignment_tpu.align.nw_host import fill_host
    from text_alignment_tpu.align.nw_pallas import fill_pallas_packed
    from text_alignment_tpu.align.traceback import (
        DensePtrView,
        DiagPtrView,
        traceback,
    )

    rng = random.Random(0)
    t = [rng.choice("abcde ") for _ in range(40)] + [" "]
    o = [rng.choice("abcde ") for _ in range(55)] + [" "]
    sc = resolve_scoring(None)
    packed = fill_pallas_packed(t, o, sc, interpret=not _on_tpu)
    ta_p, oa_p = traceback(t, o, DiagPtrView(packed))
    ta_h, oa_h = traceback(t, o, DensePtrView(*fill_host(t, o, sc)))
    assert ta_p == ta_h and oa_p == oa_h
