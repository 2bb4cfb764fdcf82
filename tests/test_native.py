"""Native C++ raster engine parity vs the numpy oracle."""

import numpy as np
import pytest

from text_alignment_tpu.ops import oracle, host_native

pytestmark = pytest.mark.skipif(
    not host_native.available(), reason="native toolchain unavailable"
)


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(99)


def _page(rng, h=150, w=200, density=0.3):
    return rng.random((h, w)) < density


def test_cc_label_matches_oracle(rng):
    img = _page(rng)
    lab_n, n_n = host_native.cc_label(img)
    lab_o, n_o = oracle.label_ccs(img)
    assert n_n == n_o
    np.testing.assert_array_equal(lab_n, lab_o)


def test_cc_stats_matches_oracle(rng):
    img = _page(rng, density=0.2)
    t_n = host_native.cc_stats(img)
    _, t_o = oracle.cc_stats(img)
    np.testing.assert_array_equal(t_n, t_o)


@pytest.mark.parametrize("k", [1, 4, 12])
def test_despeckle(rng, k):
    img = _page(rng, density=0.15)
    np.testing.assert_array_equal(
        host_native.despeckle(img, k), oracle.despeckle(img, k)
    )


def test_remove_small_and_tall(rng):
    img = _page(rng, density=0.25)
    np.testing.assert_array_equal(
        host_native.remove_small_ccs(img, 10), oracle.remove_small_ccs(img, 10)
    )
    np.testing.assert_array_equal(
        host_native.remove_tall_ccs(img, 8), oracle.remove_tall_ccs(img, 8)
    )


@pytest.mark.parametrize("color", ["black", "white"])
@pytest.mark.parametrize("k", [2, 5])
def test_filter_runs(rng, color, k):
    img = _page(rng, density=0.5)
    np.testing.assert_array_equal(
        host_native.filter_short_runs(img, k, color),
        oracle.filter_short_runs(img, k, color),
    )
    np.testing.assert_array_equal(
        host_native.filter_narrow_runs(img, k, color),
        oracle.filter_narrow_runs(img, k, color),
    )


def test_projection_and_area(rng):
    img = _page(rng)
    np.testing.assert_array_equal(
        host_native.projection_rows(img), oracle.projection_rows(img)
    )
    assert host_native.black_area(img) == oracle.black_area(img)
