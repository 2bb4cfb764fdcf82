"""Pallas scan-line union-find CC kernel (ops.cc_pallas) vs the host
oracle — bit parity for all three filter modes over adversarial
geometries, the strict=False area mode, the 3-pass cleanup chain, and
the overflow certificate. Runs in interpret mode on the CPU suite; the
TPU lane (tests/test_tpu_hw.py pattern) exercises the real Mosaic
lowering."""

import numpy as np
import pytest

from text_alignment_tpu.ops import cc_pallas, oracle


def _cases():
    rng = np.random.default_rng(0)
    cases = {
        "random25": rng.random((100, 90)) < 0.25,
        "random60": rng.random((80, 130)) < 0.6,
        "empty": np.zeros((70, 64), bool),
        "full": np.ones((66, 95), bool),
        "W32": rng.random((40, 32)) < 0.3,
        "W33": rng.random((40, 33)) < 0.3,
        "fullrows": np.ones((40, 100), bool),
    }
    c = np.zeros((50, 50), bool)
    c[0, 0] = c[0, -1] = c[-1, 0] = c[-1, -1] = True
    cases["corners"] = c
    v = np.zeros((90, 70), bool)
    v[:, ::3] = True
    cases["bars"] = v
    s = np.zeros((64, 64), bool)
    for r in range(0, 30, 4):
        s[r, r:64 - r] = True
        s[63 - r, r:64 - r] = True
        s[r:64 - r, r] = True
        s[r:64 - r, 63 - r] = True
    cases["spiral"] = s  # rings with full-word runs + late merges
    return cases


@pytest.mark.parametrize("name,img", list(_cases().items()))
@pytest.mark.parametrize("k", [0, 3, 25, 175])
def test_filter_modes_match_oracle(name, img, k):
    g, ok = cc_pallas.despeckle(img, k, max_runs=16384)
    assert ok
    np.testing.assert_array_equal(g, oracle.despeckle(img, k))

    g, ok = cc_pallas.despeckle_white(img, k, max_runs=16384)
    assert ok
    np.testing.assert_array_equal(g, ~oracle.despeckle(~img, k))

    g, ok = cc_pallas.remove_tall_ccs(img, max(k, 1), max_runs=16384)
    assert ok
    np.testing.assert_array_equal(g, oracle.remove_tall_ccs(img, max(k, 1)))

    g, ok = cc_pallas.remove_tall_ccs(img, max(k, 1), by_area=True,
                                      max_runs=16384)
    assert ok
    np.testing.assert_array_equal(g, oracle.remove_big_ccs(img, max(k, 1)))


@pytest.mark.parametrize("name,img", list(_cases().items()))
def test_preproc_clean_chain(name, img):
    g, ok = cc_pallas.preproc_clean(img, 10, 20, max_runs=16384)
    assert ok
    want = oracle.remove_tall_ccs(
        ~oracle.despeckle(~oracle.despeckle(img, 10), 10), 20)
    np.testing.assert_array_equal(g, want)


def test_fuzz_parity():
    rng = np.random.default_rng(7)
    for _ in range(40):
        H = int(rng.integers(3, 80))
        W = int(rng.integers(3, 200))
        img = rng.random((H, W)) < float(rng.uniform(0.05, 0.8))
        k = int(rng.integers(0, 30))
        g, ok = cc_pallas.despeckle(img, k, max_runs=16384)
        assert ok
        np.testing.assert_array_equal(g, oracle.despeckle(img, k))
        g, ok = cc_pallas.despeckle_white(img, k, max_runs=16384)
        assert ok
        np.testing.assert_array_equal(g, ~oracle.despeckle(~img, k))


def test_overflow_certificate():
    """> max_runs runs must report ok=False (caller host-fallback),
    never a silently wrong page."""
    img = np.zeros((64, 64), bool)
    img[::2, ::2] = True  # 1024 single-pixel runs
    g, ok = cc_pallas.despeckle(img, 0, max_runs=512)
    assert not ok


def test_pack_roundtrip():
    rng = np.random.default_rng(3)
    for W in (31, 32, 33, 64, 90, 129):
        img = rng.random((17, W)) < 0.4
        pk = cc_pallas.pack_page(img)
        assert pk.shape == (17, -(-W // 32))
        np.testing.assert_array_equal(
            cc_pallas.unpack_page(pk, 17, W), img)


def test_strict_false_area_mode():
    """sat_by_area threads through preproc_clean (the strict=False
    corrected filter)."""
    ink = np.zeros((240, 260), bool)
    ink[10:13, 20:220] = True    # wide: nrows 3, area 600
    ink[30:230, 240:241] = True  # tall: nrows 200, area 200
    g, ok = cc_pallas.preproc_clean(ink, 0, 300, sat_by_area=True,
                                    max_runs=16384)
    assert ok
    want = oracle.remove_big_ccs(ink, 300)
    np.testing.assert_array_equal(g, want)
    assert not g[11, 100] and g[100, 240]  # area filter, not nrows


def test_cc_table_matches_cc_runs():
    """Program-B table kernel vs the XLA run-graph table — identical
    rows, counts, and scan order, incl. the noise filter."""
    import jax.numpy as jnp

    from text_alignment_tpu.ops import cc_runs

    rng = np.random.default_rng(5)
    for trial in range(6):
        img = rng.random((90 + trial * 13, 70 + trial * 29)) < 0.3
        for thr in (None, 2, 8):
            tab, count, ok = cc_pallas.cc_table_compact(
                img, min_area_keep=thr, max_ccs=2048, max_runs=8192)
            tw, cw, okw = cc_runs.cc_table_compact(
                jnp.asarray(img), min_area_keep=thr, max_ccs=2048,
                max_runs=1 << 13)
            assert bool(np.asarray(ok)) and bool(np.asarray(okw))
            count = int(np.asarray(count))
            assert count == int(np.asarray(cw))
            np.testing.assert_array_equal(np.asarray(tab)[:count],
                                          np.asarray(tw)[:count])


def test_cc_table_count_overflow():
    img = np.zeros((64, 64), bool)
    img[::2, ::2] = True  # 1024 components
    _, _, ok = cc_pallas.cc_table_compact(img, max_ccs=100, max_runs=8192)
    assert not bool(np.asarray(ok))
