"""Pallas NW wavefront kernel parity (interpret mode).

Interpret-mode execution of the Mosaic kernel is slow (~1 min for even a
128-bucket problem), so this runs only when TEXT_ALIGNMENT_TPU_SLOW_TESTS=1
or on real TPU hardware; the kernel is also verified on-device by
tools and the bench harness (fused fill+traceback parity at 2500x2300).
"""

import os
import random

import numpy as np
import pytest
import jax


_on_tpu = jax.default_backend() == "tpu"
_slow = pytest.mark.skipif(
    not (_on_tpu or os.environ.get("TEXT_ALIGNMENT_TPU_SLOW_TESTS")),
    reason="interpret-mode pallas is slow; set TEXT_ALIGNMENT_TPU_SLOW_TESTS=1",
)


def test_pallas_batched_kernel_interpret():
    """The batched (B, G)-grid kernel, in interpret mode, in the plain CPU
    suite: B > 1 mixed lengths sharing one bucket, a small chunk override
    forcing G > 1 (multi-chunk VMEM carry across grid steps for every
    pair), and o_feed lengths both shorter and longer than the kernel's
    G*CHUNK (the trim/extend edge in align_pairs_pallas)."""
    from text_alignment_tpu.align.scoring import resolve_scoring
    from text_alignment_tpu.align.nw_pallas import align_pairs_pallas, _prepare
    from text_alignment_tpu.align.nw_jax import replay_ops
    from text_alignment_tpu.align import perform_alignment

    sc = resolve_scoring(None)
    rng = random.Random(7)
    pairs = []
    for n, m in ((40, 55), (100, 90), (7, 120)):
        t = [rng.choice("abcde ") for _ in range(n)]
        o = [rng.choice("abcde ") for _ in range(m)]
        pairs.append((t, o))

    # chunk=13 -> G = ceil(255/13) = 20, G*CHUNK = 260
    group = []
    feeds = []
    for t, o in pairs:
        t2, o_feed, _, L, NoP = _prepare(t + [" "], o + [" "], sc, chunk=13)
        assert L == 128 and NoP == 128 and len(o_feed) == 260
        feeds.append(o_feed)
    # o_feed len 256 (< 260: extend path), 260 (exact), 300 (> 260: trim)
    feeds[0] = feeds[0][:256]
    feeds[2] = np.concatenate([feeds[2], np.zeros(40, np.int32)])
    for (t, o), f in zip(pairs, feeds):
        group.append((_prepare(t + [" "], o + [" "], sc)[0].reshape(-1),
                      f, len(t) + 1, len(o) + 1))

    ops, k, xpt, ypt = align_pairs_pallas(group, sc, 128, 128,
                                          interpret=not _on_tpu, chunk=13)
    for i, (t, o) in enumerate(pairs):
        got = replay_ops(list(t) + [" "], list(o) + [" "],
                         ops[i], int(k[i]), int(xpt[i]), int(ypt[i]))
        ref = perform_alignment(t, o, backend="host")
        assert got == ref, f"pair {i} diverged"


def test_pallas_grid_per_pair_scoring_interpret():
    """Per-pair scoring params in the pair-packed kernel (the grid-search
    path): one pair under several scoring systems, each packed pair
    reading its OWN params row — every alignment must equal the host fill
    under that scoring. Includes a small-chunk override (G > 1 carry) and
    a non-multiple-of-P row count (tail padding discarded)."""
    from text_alignment_tpu.align.nw_pallas import align_grid_pallas
    from text_alignment_tpu.align import perform_alignment

    rng = random.Random(3)
    t = [rng.choice("abcde ") for _ in range(60)]
    o = [rng.choice("abcde ") for _ in range(85)]
    params = [
        [5, -4, -2, -2, 0, 0],
        [8, -4, -7, -7, -3, 0],
        [11, -10, -7, -2, -5, 0],
        [5, -7, -2, -7, 0, -5],
        [8, -10, -5, -5, 0, -3],
    ]
    got = align_grid_pallas(t, o, params, interpret=not _on_tpu, chunk=13)
    assert len(got) == len(params)
    for i, p in enumerate(params):
        ref = perform_alignment(t, o, scoring_system=list(p),
                                backend="host")
        assert got[i] == ref, f"scoring row {i} diverged"


def test_pallas_singleton_multichunk_interpret():
    """G > 1 carry for the non-batched kernel via the chunk override."""
    from text_alignment_tpu.align.scoring import resolve_scoring
    from text_alignment_tpu.align.nw_host import fill_host
    from text_alignment_tpu.align.nw_pallas import fill_pallas_packed
    from text_alignment_tpu.align.traceback import (
        DensePtrView,
        DiagPtrView,
        traceback,
    )

    rng = random.Random(3)
    t = [rng.choice("abcde ") for _ in range(90)] + [" "]
    o = [rng.choice("abcde ") for _ in range(70)] + [" "]
    sc = resolve_scoring(None)
    packed = fill_pallas_packed(t, o, sc, interpret=not _on_tpu, chunk=32)
    ta_p, oa_p = traceback(t, o, DiagPtrView(packed))
    ta_h, oa_h = traceback(t, o, DensePtrView(*fill_host(t, o, sc)))
    assert ta_p == ta_h and oa_p == oa_h


@_slow
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


def test_pallas_hopping_traceback_interpret():
    """The tile-hopping traceback must replay the XLA while_loop walk
    exactly: multiple window hops, rectangular problems, and a cursor that
    terminates mid-window."""
    from text_alignment_tpu.align.scoring import resolve_scoring
    from text_alignment_tpu.align.nw_pallas import (
        _prepare,
        _fill_pallas,
        traceback_ops_pallas,
    )
    from text_alignment_tpu.align.nw_jax import _traceback_ops
    import jax.numpy as jnp

    sc = resolve_scoring(None)
    rng = random.Random(5)
    for n, m in ((40, 55), (100, 230), (230, 100), (7, 120)):
        t = [rng.choice("abcde ") for _ in range(n)] + [" "]
        o = [rng.choice("abcde ") for _ in range(m)] + [" "]
        t2, o_feed, params, L, NoP = _prepare(t, o, sc)
        packed = _fill_pallas(jnp.asarray(t2), jnp.asarray(o_feed),
                              jnp.asarray(params), L=L, NoP=NoP,
                              interpret=not _on_tpu)
        P = L + NoP
        a = _traceback_ops(packed, len(t), len(o), P)
        b = traceback_ops_pallas(packed, len(t), len(o), P, L=L,
                                 interpret=not _on_tpu)
        ka, kb = int(a[1]), int(b[1])
        assert ka == kb
        assert (int(a[2]), int(a[3])) == (int(b[2]), int(b[3]))
        np.testing.assert_array_equal(np.asarray(a[0])[:ka],
                                      np.asarray(b[0])[:kb])
