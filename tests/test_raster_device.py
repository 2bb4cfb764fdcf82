"""Fused device raster (ops.raster_device) vs the host oracle chain —
bit parity for program A (clean+skew+rotate+erode+project), program B
(separator-masked CC table) and program C (strip packing into the
recognizer wire layout)."""

import numpy as np
import pytest

import jax.numpy as jnp

from text_alignment_tpu.ops import oracle, raster_device
from text_alignment_tpu.synth import make_page


def _binarized(seed=11, n_lines=4, skew=None):
    page = make_page(np.random.default_rng(seed), n_lines=n_lines,
                     words_per_line=2)
    img = oracle.to_onebit(page.image)
    if skew:
        img = oracle.rotate_onebit(img, skew)
    return img


def _oracle_chain(img, damt=10, sat=60):
    img = oracle.despeckle(img, damt)
    img = ~oracle.despeckle(~img, damt)
    img = oracle.remove_tall_ccs(img, sat)
    angle = oracle.rotation_angle_projections(img, -6, 6)
    rot = oracle.rotate_onebit(img, angle)
    er = oracle.filter_short_runs(rot, 2, "black")
    er = oracle.filter_narrow_runs(er, 2, "black")
    return rot, er, oracle.projection_rows(er), angle


@pytest.mark.parametrize("skew", [None, 1.37, -2.6])
def test_program_a_parity(skew):
    img = _binarized(seed=12, skew=skew)
    damt, sat = 10, 60
    bin_rot, eroded, proj, angle, ok, (H2, W2) = raster_device.raster_page(
        img, damt, sat, max_runs=1 << 15)
    assert ok
    want_rot, want_er, want_proj, want_angle = _oracle_chain(img, damt, sat)
    assert angle == want_angle
    assert (H2, W2) == want_rot.shape
    got_rot = np.asarray(bin_rot)
    got_er = np.asarray(eroded)
    np.testing.assert_array_equal(got_rot[:H2, :W2], want_rot)
    np.testing.assert_array_equal(got_er[:H2, :W2], want_er)
    # beyond the exact canvas the max canvas is white
    assert not got_rot[H2:].any() and not got_rot[:, W2:].any()
    np.testing.assert_array_equal(np.asarray(proj)[:H2], want_proj)
    assert not np.asarray(proj)[H2:].any()


def test_program_a_sat_by_area_parity():
    """strict=False area filter threads through program A (advisor r4:
    device raster silently kept the parity nrows filter)."""
    img = _binarized(seed=14)
    damt, sat = 10, 190  # glyph CC areas straddle 190; nrows never does
    bin_rot, _, _, angle, ok, (H2, W2) = raster_device.raster_page(
        img, damt, sat, max_runs=1 << 15, sat_by_area=True)
    assert ok
    want = oracle.despeckle(img, damt)
    want = ~oracle.despeckle(~want, damt)
    want = oracle.remove_big_ccs(want, sat)
    want_angle = oracle.rotation_angle_projections(want, -6, 6)
    want_rot = oracle.rotate_onebit(want, want_angle)
    assert angle == want_angle
    np.testing.assert_array_equal(np.asarray(bin_rot)[:H2, :W2], want_rot)
    # area vs nrows filters must actually diverge on this page
    got_nrows = raster_device.raster_page(
        img, damt, sat, max_runs=1 << 15, sat_by_area=False)
    assert (np.asarray(got_nrows[0]).sum()
            != np.asarray(bin_rot).sum())


def test_program_b_parity():
    img = _binarized(seed=13)
    bin_rot, eroded, proj, angle, ok, (H2, W2) = raster_device.raster_page(
        img, 10, 60, max_runs=1 << 15)
    assert ok
    er_host = np.asarray(eroded)[:H2, :W2]
    sep_rows = [H2 // 3, 2 * H2 // 3]
    table, ok_b = raster_device.masked_cc_table(
        eroded, sep_rows, H2, noise_thresh=4, max_runs=1 << 15)
    assert ok_b
    cut = er_host.copy()
    for r in sep_rows:
        cut[r: r + 2] = False
    _, want = oracle.cc_stats(cut)
    want = want[want[:, 4] > 4]
    np.testing.assert_array_equal(table, want)


def test_program_c_matches_pack_strips():
    from text_alignment_tpu.models.recognizer import SeqRecognizer

    img = _binarized(seed=14)
    bin_rot, *_ = raster_device.raster_page(img, 10, 60, max_runs=1 << 15)
    page = np.asarray(bin_rot)
    H2max, W2max = page.shape
    rng = np.random.default_rng(3)
    bboxes = []
    crops = []
    for _ in range(5):
        h = int(rng.integers(9, 70))
        w = int(rng.integers(17, 300))
        y = int(rng.integers(0, H2max - h))
        x = int(rng.integers(0, W2max - w))
        bboxes.append((y, x, h, w))
        crops.append(page[y: y + h, x: x + w])
    # reuse the recognizer's host packer as the layout oracle
    want_meta, hs, ws, Wp = SeqRecognizer._pack_strips(
        SeqRecognizer.__new__(SeqRecognizer), crops)
    B, Hp1, _ = want_meta.shape
    Hp = Hp1 - 1
    bb = np.zeros((B, 4), np.int32)
    bb[: len(bboxes)] = np.asarray(bboxes, np.int32)
    got = np.asarray(raster_device.extract_strips_packed(
        jnp.asarray(raster_device.pack_page(page)), bb, Hp, Wp))
    np.testing.assert_array_equal(got, want_meta)


def test_empty_page_ok():
    img = np.zeros((96, 160), bool)
    bin_rot, eroded, proj, angle, ok, (H2, W2) = raster_device.raster_page(
        img, 10, 60, max_runs=1 << 12)
    assert ok
    assert not np.asarray(bin_rot).any()
    assert not np.asarray(proj).any()
