"""End-to-end pipeline tests on synthetic pages: host path correctness,
host/device parity, JSON contract, rotate_bbox, abbreviations."""

import numpy as np
import pytest

from text_alignment_tpu.charbox import CharBox
from text_alignment_tpu.pipeline import (
    preprocess_images,
    identify_text_lines,
    process,
    to_JSON_dict,
    rotate_bbox,
)
from text_alignment_tpu.pipeline.assemble import (
    expand_abbreviations,
    llocs_to_charboxes,
    to_processed_frame,
)
from text_alignment_tpu.pipeline.preprocess import LineStrip, PreprocParams

# synthetic glyphs are ~18 px tall; the default 61-wide smoothing window
# would flatten each line into an exactly-equal plateau pair (real ink is
# taller than the window). Use a window matched to the synthetic scale.
SYNTH_PARAMS = PreprocParams(filter_size=8)
from text_alignment_tpu.synth import make_page, corrupt_ocr, ocr_with_spaces


@pytest.fixture(scope="module")
def page():
    return make_page(np.random.default_rng(3), n_lines=5, words_per_line=3)


def test_preprocess_finds_lines(page):
    image, eroded, angle = preprocess_images(page.image, backend="host")
    assert abs(angle) < 0.5  # unrotated page
    strips, peaks, smoothed = identify_text_lines(image, eroded, backend="host", params=SYNTH_PARAMS)
    assert len(peaks) == 5
    # peak locations near the known baselines (+ the symmetric canvas pad)
    dy = (image.shape[0] - page.image.shape[0]) // 2
    for p, b in zip(peaks, page.line_baselines):
        assert abs(p - (b + dy)) < 8
    assert len(strips) == 5
    for s in strips:
        assert s.img.any()


def test_preprocess_host_device_parity(page):
    img_h, er_h, ang_h = preprocess_images(page.image, backend="host")
    img_d, er_d, ang_d = preprocess_images(page.image, backend="device")
    assert ang_h == ang_d
    np.testing.assert_array_equal(img_h, img_d)
    np.testing.assert_array_equal(er_h, er_d)
    s_h, p_h, sm_h = identify_text_lines(img_h, er_h, backend="host", params=SYNTH_PARAMS)
    s_d, p_d, sm_d = identify_text_lines(img_d, er_d, backend="device", params=SYNTH_PARAMS)
    assert p_h == p_d
    np.testing.assert_array_equal(sm_h, sm_d)
    assert len(s_h) == len(s_d)
    for a, b in zip(s_h, s_d):
        assert (a.offset_x, a.offset_y) == (b.offset_x, b.offset_y)
        np.testing.assert_array_equal(a.img, b.img)


def _inject(page, ocr_chars, backend="host"):
    """Injected OCR boxes are raw-frame ground truth; lift them into the
    processed frame the pipeline's char stream lives in."""
    image, eroded, angle = preprocess_images(page.image, backend=backend)
    lifted = [
        to_processed_frame(cb, angle, image.shape, page.image.shape)
        for cb in ocr_chars
    ]
    return lifted, (image, eroded, angle)


def test_process_with_injected_ocr_host(page):
    rng = np.random.default_rng(5)
    ocr_chars = ocr_with_spaces(corrupt_ocr(rng, page.char_boxes))
    lifted, preproc = _inject(page, ocr_chars)
    result = process(
        page.image,
        page.transcript,
        existing_ocr=lifted,
        existing_preproc_images=preproc,
        verbose=False,
        backend="host",
        preproc_params=SYNTH_PARAMS,
    )
    assert result is not None
    syl_boxes, image, peaks, all_chars = result
    assert len(peaks) == 5
    assert len(syl_boxes) > 10
    # syllable boxes must mostly land on their ground-truth characters
    gt_by_line = {}
    for cb in page.char_boxes:
        gt_by_line.setdefault(cb.uly, []).append(cb)
    hits = 0
    for sb in syl_boxes:
        # find ground truth chars overlapping the box
        overlap = [
            cb
            for cb in page.char_boxes
            if not (cb.lrx < sb.ulx or cb.ulx > sb.lrx)
            and not (cb.lry < sb.uly or cb.uly > sb.lry)
        ]
        text = "".join(c.char for c in overlap)
        if sb.char in text:
            hits += 1
    assert hits / len(syl_boxes) > 0.8

    d = to_JSON_dict(syl_boxes, peaks)
    assert set(d.keys()) == {"median_line_spacing", "syl_boxes"}
    for e in d["syl_boxes"]:
        assert set(e.keys()) == {"syl", "ul", "lr"}
        assert all(isinstance(v, int) for v in e["ul"] + e["lr"])


def test_process_host_device_identical_json(page):
    rng = np.random.default_rng(11)
    ocr_chars = ocr_with_spaces(corrupt_ocr(rng, page.char_boxes))
    lifted_h, pre_h = _inject(page, ocr_chars, backend="host")
    lifted_d, pre_d = _inject(page, ocr_chars, backend="device")
    assert [ (c.ul, c.lr) for c in lifted_h ] == [ (c.ul, c.lr) for c in lifted_d ]
    r_host = process(page.image, page.transcript, existing_ocr=lifted_h,
                     existing_preproc_images=pre_h,
                     verbose=False, backend="host", preproc_params=SYNTH_PARAMS)
    r_dev = process(page.image, page.transcript, existing_ocr=lifted_d,
                    existing_preproc_images=pre_d,
                    verbose=False, backend="device", preproc_params=SYNTH_PARAMS)
    j_host = to_JSON_dict(r_host[0], r_host[2])
    j_dev = to_JSON_dict(r_dev[0], r_dev[2])
    assert j_host == j_dev


def test_process_on_rotated_page():
    page = make_page(np.random.default_rng(9), n_lines=5, words_per_line=3,
                     angle=1.5)
    # inject OCR in the *processed* frame: run preprocessing to find strips,
    # then fabricate plausible chars from the strips themselves
    image, eroded, angle = preprocess_images(page.image, backend="host")
    assert abs(angle - (-1.5)) < 0.4  # detector recovers the corrective angle
    strips, peaks, _ = identify_text_lines(image, eroded, backend="host",
                                           params=SYNTH_PARAMS)
    assert len(strips) == 5
    # fabricated llocs: 10 evenly spaced chars per line
    rows = []
    for s in strips:
        w = s.img.shape[1]
        rows.append([("a", round(w * (i + 1) / 10, 1)) for i in range(10)])
    all_chars, other = llocs_to_charboxes(strips, rows)
    assert len(all_chars) == 50
    result = process(page.image, "aaaaaaaaaa " * 5, existing_ocr=all_chars,
                     verbose=False, backend="host", preproc_params=SYNTH_PARAMS)
    assert result is not None
    syl_boxes = result[0]
    # boxes are mapped back into the raw (rotated) page frame
    H, W = page.image.shape[:2]
    for sb in syl_boxes:
        assert -50 <= sb.ulx <= W + 50 and -50 <= sb.uly <= H + 50


def test_rotate_bbox_roundtrip():
    cb = CharBox("x", (100, 200), (150, 230))
    same = rotate_bbox(cb, 0.0, (500, 700), (500, 700))
    assert same.ul == (100, 200) and same.lr == (150, 230)
    rot = rotate_bbox(cb, 3.0, (520, 730), (500, 700))
    back = rotate_bbox(rot, -3.0, (520, 730), (540, 760))
    # not exactly inverse (the reference's padding compensation is lossy),
    # but must stay in the neighborhood
    assert abs(back.ulx - cb.ulx) < 40 and abs(back.uly - cb.uly) < 40


def test_rotate_bboxes_matches_scalar():
    """The vectorized batch rotate must be bit-identical to the scalar
    reference port across random boxes, angles, and padding offsets."""
    from text_alignment_tpu.pipeline.assemble import rotate_bboxes

    rng = np.random.default_rng(7)
    for _ in range(20):
        H, W = int(rng.integers(200, 3000)), int(rng.integers(200, 3000))
        dH, dW = int(rng.integers(0, 60)), int(rng.integers(0, 60))
        angle = float(rng.uniform(-6, 6))
        boxes = []
        for _ in range(int(rng.integers(1, 40))):
            x0, y0 = int(rng.integers(0, W)), int(rng.integers(0, H))
            boxes.append(CharBox("s", (x0, y0),
                                 (x0 + int(rng.integers(1, 80)),
                                  y0 + int(rng.integers(1, 80)))))
        vec = rotate_bboxes(boxes, angle, (H + dH, W + dW), (H, W))
        ref = [rotate_bbox(b, angle, (H + dH, W + dW), (H, W))
               for b in boxes]
        assert [(v.char, v.ul, v.lr) for v in vec] == \
               [(r.char, r.ul, r.lr) for r in ref]
    assert rotate_bboxes([], 1.0, (100, 100), (100, 100)) == []


def test_syllabify_memo_returns_fresh_lists():
    """syllabify_word is memoized; callers may mutate the returned list
    without corrupting the cache."""
    from text_alignment_tpu.lang.syllabify import syllabify_word

    a = syllabify_word("dominus")
    a.append("CORRUPT")
    b = syllabify_word("dominus")
    assert "CORRUPT" not in b and b == ["do", "mi", "nus"]


def test_expand_abbreviations():
    def boxes(s):
        return [CharBox(c, (i * 10, 0), (i * 10 + 10, 20)) for i, c in enumerate(s)]

    out = expand_abbreviations(boxes("x dns y"))
    assert "".join(b.char for b in out) == "x dominus y"
    # expansion segments inherit source-char boxes positionally
    d_idx = 2  # position of 'd' in input
    assert out[2].ul == (d_idx * 10, 0)

    out2 = expand_abbreviations(boxes("aā"))
    assert "".join(b.char for b in out2) == "aam"

    # repeated occurrences all expand
    out3 = expand_abbreviations(boxes("dns dns"))
    assert "".join(b.char for b in out3) == "dominus dominus"


def test_llocs_to_charboxes_contract():
    strip = LineStrip(np.ones((20, 100), bool), offset_x=7, offset_y=30)
    rows = [[("a", 10.0), ("~", 15.0), ("b", 20.5), ("", 25.0)]]
    chars, other = llocs_to_charboxes([strip], rows)
    assert [c.char for c in chars] == ["a", "b"]
    assert [c.char for c in other] == ["~", ""]
    # first char spans from x_min to its right edge
    assert chars[0].ul == (7, 30) and chars[0].lr == (17, 30 + 19)
    # '~' consumed horizontal space: 'b' starts at the '~' edge
    assert chars[1].ul == (22, 30)
    assert chars[1].lr == (int(np.round(20.5 + 7)), 49)


def test_process_requires_ocr_source(page):
    with pytest.raises(ValueError):
        process(page.image, page.transcript, verbose=False)


def test_hybrid_backend_matches_host(page):
    """The hybrid (native C++ raster) backend must produce bit-identical
    preprocessing, strips, and peaks to the pure-numpy host path."""
    from text_alignment_tpu.ops import host_native
    import pytest as _pytest

    if not host_native.available():
        _pytest.skip("native toolchain unavailable")
    import numpy as np
    from text_alignment_tpu.pipeline.preprocess import (
        preprocess_images,
        identify_text_lines,
    )

    ih, eh, ah = preprocess_images(page.image, backend="host")
    sh, ph, _ = identify_text_lines(ih, eh, backend="host", verbose=False)
    iy, ey, ay = preprocess_images(page.image, backend="hybrid")
    sy, py, _ = identify_text_lines(iy, ey, backend="hybrid", verbose=False)
    assert ah == ay
    np.testing.assert_array_equal(ih, iy)
    np.testing.assert_array_equal(eh, ey)
    assert list(ph) == list(py)
    assert len(sh) == len(sy)
    for a, b in zip(sh, sy):
        np.testing.assert_array_equal(a.img, b.img)
        assert (a.offset_x, a.offset_y) == (b.offset_x, b.offset_y)


def test_end_to_end_golden_json():
    """Full-pipeline golden snapshot: the exact syl_boxes JSON for a fixed
    synthetic page + injected OCR must never drift (any semantic change to
    preprocessing, segmentation, NW, assembly, or emission shows up here).
    Regenerate deliberately with tools/regen in the golden file header's
    recipe (tests/golden/)."""
    import json

    from text_alignment_tpu.synth import corrupt_ocr, ocr_with_spaces
    from text_alignment_tpu.pipeline import process, to_JSON_dict

    page = make_page(np.random.default_rng(31), n_lines=5, words_per_line=2,
                     H=900, W=800, char_h=50, char_w=30, gap=6, space_w=40,
                     line_spacing=150, speckles=25, margin_x=30, angle=0.7)
    ocr = ocr_with_spaces(corrupt_ocr(np.random.default_rng(9),
                                      page.char_boxes))
    res = process(page.image, page.transcript, existing_ocr=ocr,
                  backend="host", verbose=False)
    got = to_JSON_dict(res[0], res[2])
    import os
    golden_path = os.path.join(os.path.dirname(__file__), "golden",
                               "e2e_syn31.json")
    with open(golden_path) as f:
        want = json.load(f)
    assert got == want


def test_raster_stream_matches_sequential_composition():
    """raster_stream (the batched pipeline's fused stage-1 loop, incl. the
    hybrid run-domain fast path) == preprocess_images + identify_text_lines
    per folio, on every backend."""
    from text_alignment_tpu.pipeline.preprocess import (
        identify_text_lines,
        preprocess_images,
        raster_stream,
    )

    pages = [
        make_page(np.random.default_rng(40 + i), n_lines=3, words_per_line=2,
                  angle=(0.0, 0.6, -1.1)[i])
        for i in range(3)
    ]
    raws = [np.asarray(p.image) for p in pages]
    for backend in ("hybrid", "host"):
        got = list(raster_stream(raws, backend=backend))
        assert len(got) == len(raws)
        for raw, (ib2, ang2, strips2, peaks2) in zip(raws, got):
            ib, ie, ang = preprocess_images(raw, backend=backend)
            strips, peaks, _ = identify_text_lines(
                ib, ie, backend=backend, verbose=False)
            assert ang == ang2
            np.testing.assert_array_equal(np.asarray(ib), np.asarray(ib2))
            assert list(peaks) == list(peaks2)
            assert len(strips) == len(strips2)
            for a, b in zip(strips, strips2):
                assert (a.offset_x, a.offset_y) == (b.offset_x, b.offset_y)
                np.testing.assert_array_equal(a.img, b.img)
