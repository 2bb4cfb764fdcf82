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


def test_shear_projections_and_skew(rng):
    from text_alignment_tpu.ops import fixedpoint as fxp

    img = _page(rng, h=120, w=160, density=0.2)
    cands = fxp.angle_grid(-6, 6, 1.0)
    shifts = np.stack([fxp.shear_shifts(a, img.shape[1]) for a in cands])
    native = host_native.shear_projections(img, shifts)
    ref = np.stack([oracle.shear_projection(img, s) for s in shifts])
    np.testing.assert_array_equal(native, ref)
    assert host_native.rotation_angle_projections(
        img, -6, 6
    ) == oracle.rotation_angle_projections(img, -6, 6)


def test_greyscale_onebit(rng):
    rgb = (rng.random((40, 50, 3)) * 255).astype(np.uint8)
    rgba = (rng.random((40, 50, 4)) * 255).astype(np.uint8)
    grey = (rng.random((40, 50)) * 255).astype(np.uint8)
    for img in (rgb, rgba, grey):
        np.testing.assert_array_equal(
            host_native.to_greyscale(img), oracle.to_greyscale(img)
        )
        np.testing.assert_array_equal(
            host_native.to_onebit(img), oracle.to_onebit(img)
        )


def test_rotate_onebit(rng):
    img = _page(rng, h=90, w=120, density=0.2)
    for ang in (0.0, 0.8, -2.3, 5.5):
        np.testing.assert_array_equal(
            host_native.rotate_onebit(img, ang),
            oracle.rotate_onebit(img, ang),
        )


def test_preproc_stage1_fused(rng):
    img = _page(rng, h=120, w=160, density=0.25)
    ref = oracle.despeckle(img, 8)
    ref = ~oracle.despeckle(~ref, 8)
    ref = oracle.remove_tall_ccs(ref, 10)
    np.testing.assert_array_equal(host_native.preproc_stage1(img, 8, 10), ref)


def test_skew_coords_matches_oracle(rng):
    img = _page(rng, h=150, w=220, density=0.15)
    assert host_native.rotation_angle_projections(
        img, -6, 6
    ) == oracle.rotation_angle_projections(img, -6, 6)
