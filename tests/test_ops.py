"""Parity tests: device (JAX) raster kernels vs the host numpy oracle, and
the vectorized prominence vs a literal reference port."""

import numpy as np
import pytest

from text_alignment_tpu.ops import oracle, device
from text_alignment_tpu.ops import fixedpoint as fxp
from text_alignment_tpu.ops.projections import (
    moving_avg_filter,
    calculate_peak_prominence,
    find_peak_locations,
    _prominences_vectorized,
)


def _random_page(rng, h=96, w=128, density=0.25):
    img = rng.random((h, w)) < density
    return img


def _blobby_page(rng, h=120, w=160):
    """Page with text-like blobs, speckles, and a tall ornament."""
    img = np.zeros((h, w), dtype=bool)
    for _ in range(12):
        y, x = rng.integers(10, h - 16), rng.integers(5, w - 20)
        img[y : y + rng.integers(3, 9), x : x + rng.integers(4, 16)] = True
    img[5:90, 3:7] = True  # tall component
    for _ in range(40):  # speckles
        y, x = rng.integers(0, h), rng.integers(0, w)
        img[y, x] = True
    return img


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(42)


def test_cc_label_matches_scipy_roots(rng):
    img = _blobby_page(rng)
    lbl_dev = np.asarray(device.cc_label(img))
    lbl_ref, n = oracle.label_ccs(img)
    # device labels are min-flat-index roots; scipy labels are scan-order.
    # both define the same partition.
    H, W = img.shape
    flat = np.arange(H * W).reshape(H, W)
    for k in range(1, n + 1):
        mask = lbl_ref == k
        roots = np.unique(lbl_dev[mask])
        assert len(roots) == 1
        assert roots[0] == flat[mask].min()
    assert np.all(lbl_dev[~img] == H * W)


def test_cc_stats_compact_matches_oracle(rng):
    img = _blobby_page(rng)
    table_dev, count = device.cc_stats_compact(img, max_ccs=256)
    table_dev = np.asarray(table_dev)
    _, table_ref = oracle.cc_stats(img)
    count = int(count)
    assert count == len(table_ref)
    np.testing.assert_array_equal(table_dev[:count], table_ref)


@pytest.mark.parametrize("k", [1, 3, 10])
def test_despeckle_parity(rng, k):
    img = _random_page(rng, density=0.18)
    ref = oracle.despeckle(img, k)
    dev = np.asarray(device.despeckle(img, k))
    np.testing.assert_array_equal(ref, dev)


def test_remove_tall_and_small_parity(rng):
    img = _blobby_page(rng)
    np.testing.assert_array_equal(
        oracle.remove_tall_ccs(img, 40), np.asarray(device.remove_tall_ccs(img, 40))
    )
    np.testing.assert_array_equal(
        oracle.remove_small_ccs(img, 12), np.asarray(device.remove_small_ccs(img, 12))
    )


@pytest.mark.parametrize("k", [2, 3, 5])
@pytest.mark.parametrize("color", ["black", "white"])
def test_run_filters_parity(rng, k, color):
    img = _random_page(rng, h=64, w=80, density=0.5)
    np.testing.assert_array_equal(
        oracle.filter_short_runs(img, k, color),
        np.asarray(device.filter_short_runs(img, k, color)),
    )
    np.testing.assert_array_equal(
        oracle.filter_narrow_runs(img, k, color),
        np.asarray(device.filter_narrow_runs(img, k, color)),
    )


def test_binarize_parity(rng):
    rgb = rng.integers(0, 256, size=(60, 70, 3), dtype=np.uint8)
    ref = oracle.to_onebit(rgb)
    dev = np.asarray(device.to_onebit(rgb))
    np.testing.assert_array_equal(ref, dev)
    # rgba path: alpha composited over white
    rgba = rng.integers(0, 256, size=(40, 50, 4), dtype=np.uint8)
    np.testing.assert_array_equal(
        oracle.to_onebit(rgba), np.asarray(device.to_onebit(rgba))
    )


def test_projection_rows_parity(rng):
    img = _blobby_page(rng)
    np.testing.assert_array_equal(
        oracle.projection_rows(img), np.asarray(device.projection_rows(img))
    )


@pytest.mark.parametrize("angle", [-5.37, -2.0, -0.01, 0.0, 0.73, 4.2])
def test_rotate_parity(rng, angle):
    img = _blobby_page(rng)
    ref = oracle.rotate_onebit(img, angle)
    dev = np.asarray(device.rotate_onebit(img, angle))
    assert ref.shape == dev.shape == fxp.rotated_canvas(*img.shape, angle)
    np.testing.assert_array_equal(ref, dev)


def test_rotate_zero_is_identity(rng):
    # dims on the canvas quantum: zero rotation is the exact identity
    img = _blobby_page(rng)[:96, :128]
    out = oracle.rotate_onebit(img, 0.0)
    np.testing.assert_array_equal(out, img)


def test_rotate_zero_quantized_canvas_centers(rng):
    # off-quantum dims: the canvas grows symmetrically; content is centered
    img = _blobby_page(rng)  # 120 x 160
    out = oracle.rotate_onebit(img, 0.0)
    H2, W2 = fxp.rotated_canvas(*img.shape, 0.0)
    assert out.shape == (H2, W2)
    oy, ox = (H2 - img.shape[0]) // 2, (W2 - img.shape[1]) // 2
    np.testing.assert_array_equal(
        out[oy : oy + img.shape[0], ox : ox + img.shape[1]], img
    )
    assert out.sum() == img.sum()


def test_skew_detection_recovers_angle(rng):
    # strong horizontal line structure, rotated by a known angle
    img = np.zeros((200, 300), dtype=bool)
    for y in range(30, 190, 25):
        img[y : y + 6, 20:280] = True
    rot = oracle.rotate_onebit(img, 2.0)
    est_host = oracle.rotation_angle_projections(rot)
    est_dev = device.rotation_angle_projections(rot)
    assert est_host == est_dev
    # the detected angle is corrective: rotate(est) levels the lines
    assert abs(est_host - (-2.0)) < 0.3
    releveled = oracle.rotate_onebit(rot, est_host)
    assert oracle.rotation_angle_projections(releveled) == pytest.approx(
        0.0, abs=0.35  # two nearest-neighbor resamples add edge jitter
    )


def test_shear_projection_parity(rng):
    img = _blobby_page(rng)
    shifts = np.stack([fxp.shear_shifts(a, img.shape[1]) for a in (-3.0, 0.0, 1.5)])
    ref = np.stack([oracle.shear_projection(img, s) for s in shifts])
    dev = np.asarray(device.shear_projections(img, shifts))
    np.testing.assert_array_equal(ref, dev)


# ---------------------------------------------------------------------------
# projection peak machinery vs literal reference semantics
# ---------------------------------------------------------------------------

def _reference_prominences(data):
    return np.array(
        [calculate_peak_prominence(data, i) for i in range(len(data))]
    )


def test_vectorized_prominence_matches_direct(rng):
    for _ in range(10):
        data = rng.integers(0, 50, size=200).astype(float)
        smoothed = moving_avg_filter(data, 5)
        direct = _reference_prominences(smoothed)
        vec = _prominences_vectorized(smoothed)
        np.testing.assert_array_equal(direct, vec)


def test_moving_avg_edges_zero():
    data = np.ones(100)
    sm = moving_avg_filter(data, 30)
    assert np.all(sm[:30] == 0) and np.all(sm[-30:] == 0)
    assert np.all(sm[30:70] == 1)


def test_find_peak_locations_simple():
    # three clean peaks over a flat floor. NB: heights must differ — the
    # reference's flat-top dedup removes list-adjacent peaks with *equal*
    # normalized prominence (textAlignPreprocessing.py:134-137), even when
    # they are far apart spatially.
    data = np.zeros(300)
    for c, h in ((60, 20), (150, 24), (240, 22)):
        ramp = np.concatenate([np.arange(h + 1), np.arange(h)[::-1]])
        data[c - h : c + h + 1] += ramp
    sm = moving_avg_filter(data, 10)
    peaks = find_peak_locations(sm)
    assert len(peaks) == 3
    for p, c in zip(peaks, (60, 150, 240)):
        assert abs(p - c) <= 2


def test_find_peak_locations_monotonic_returns_empty():
    assert find_peak_locations(np.arange(100, dtype=float)) == []


def test_erase_rows(rng):
    img = _blobby_page(rng)
    mask = np.zeros(img.shape[0], dtype=bool)
    mask[40:42] = True
    out = np.asarray(device.erase_rows(img, mask))
    ref = oracle.draw_hline_white(img, 40, 2)
    np.testing.assert_array_equal(out, ref)
