"""Adversarial synthetic fixtures (VERDICT r1 #7): pages built to sit on the
pipeline's decision boundaries, each with a golden end-to-end JSON and
host == hybrid (native C++) engine parity — plus the all-XLA device engine
on the CC-threshold cases, where the three raster engines are most likely
to diverge.

Covered edges (reference semantics cited per case):
- skew at the ±6° search limits (textAlignPreprocessing.py:183);
- ink bridges between lines that force the separator-draw cut
  (textAlignPreprocessing.py:217-224);
- CCs straddling sat_area_thresh (nrows quirk, :174-178) and
  noise_area_thresh (strict >, :229-235);
- 0-line and 1-line pages (empty-OCR skip; <2-peak JSON guard);
- transcript >> OCR and OCR >> transcript.

Regenerate goldens deliberately: python tests/test_adversarial.py --regen
"""

import json
import os

import numpy as np
import pytest

from text_alignment_tpu.synth import make_page, corrupt_ocr, ocr_with_spaces
from text_alignment_tpu.pipeline import process, to_JSON_dict
from text_alignment_tpu.pipeline.preprocess import (
    PreprocParams,
    preprocess_images,
    identify_text_lines,
)

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")
PARAMS = PreprocParams(filter_size=8)


def _page_ocr(page, seed=9):
    return ocr_with_spaces(corrupt_ocr(np.random.default_rng(seed),
                                       page.char_boxes))


def _fixture_skew(sign):
    page = make_page(np.random.default_rng(41), n_lines=4, words_per_line=2,
                     H=900, W=800, char_h=40, char_w=24, gap=5, space_w=30,
                     line_spacing=170, speckles=15, margin_x=120,
                     angle=sign * 5.9)
    return page, page.transcript, _page_ocr(page)


def _fixture_touching_lines():
    """Adjacent lines joined by solid ink bridges: only the separator cut
    (white line at the inter-peak projection minimum) severs them into
    per-line components."""
    page = make_page(np.random.default_rng(43), n_lines=3, words_per_line=3,
                     H=400, W=800, char_h=30, char_w=18, gap=4, space_w=24,
                     line_spacing=60, speckles=10, margin_x=40, angle=0.0)
    img = page.image
    for li in range(2):  # bridge line li -> li+1 (area 3*60 >> thresholds)
        y0 = 50 + li * 60
        x = 300 + 150 * li
        img[y0 : y0 + 60 + 30, x : x + 3] = 0
    return page, page.transcript, _page_ocr(page)


def _fixture_one_line():
    page = make_page(np.random.default_rng(44), n_lines=1, words_per_line=3,
                     H=300, W=800, char_h=36, char_w=20, gap=4, space_w=28,
                     speckles=10, margin_x=40)
    return page, page.transcript, _page_ocr(page)


def _fixture_transcript_gg_ocr():
    page = make_page(np.random.default_rng(45), n_lines=5, words_per_line=3,
                     H=800, W=800, char_h=30, char_w=18, gap=4, space_w=24,
                     line_spacing=140, speckles=10, margin_x=40)
    first_line_y = min(cb.uly for cb in page.char_boxes)
    ocr = [cb for cb in _page_ocr(page) if cb.uly == first_line_y]
    return page, page.transcript, ocr


def _fixture_ocr_gg_transcript():
    page = make_page(np.random.default_rng(46), n_lines=5, words_per_line=3,
                     H=800, W=800, char_h=30, char_w=18, gap=4, space_w=24,
                     line_spacing=140, speckles=10, margin_x=40)
    short = " ".join(page.transcript.split()[:3])
    return page, short, _page_ocr(page)


FIXTURES = {
    "skew_pos_limit": lambda: _fixture_skew(+1),
    "skew_neg_limit": lambda: _fixture_skew(-1),
    "touching_lines": _fixture_touching_lines,
    "one_line": _fixture_one_line,
    "transcript_gg_ocr": _fixture_transcript_gg_ocr,
    "ocr_gg_transcript": _fixture_ocr_gg_transcript,
}


def _run(name, backend):
    page, transcript, ocr = FIXTURES[name]()
    res = process(page.image, transcript, existing_ocr=ocr, backend=backend,
                  verbose=False, preproc_params=PARAMS)
    if res is None:
        return None
    return to_JSON_dict(res[0], res[2])


@pytest.mark.parametrize("name", sorted(FIXTURES))
def test_adversarial_golden_and_engine_parity(name):
    got_host = _run(name, "host")
    got_hybrid = _run(name, "hybrid")
    assert got_host == got_hybrid, f"{name}: host vs hybrid diverged"
    with open(os.path.join(GOLDEN_DIR, f"adv_{name}.json")) as f:
        want = json.load(f)
    assert got_host == want, f"{name}: golden drift"
    if name not in ("transcript_gg_ocr",):
        assert got_host is not None and got_host["syl_boxes"], \
            f"{name}: vacuous fixture"


def test_skew_limit_detection():
    """The coarse-to-fine search recovers corrective angles at the ±6°
    search boundary (textAlignPreprocessing.py:183 range)."""
    for sign in (+1, -1):
        page, _, _ = _fixture_skew(sign)
        for backend in ("host", "hybrid"):
            _, _, angle = preprocess_images(page.image, backend=backend)
            assert abs(angle - (-sign * 5.9)) < 0.5, (sign, backend, angle)


def test_touching_lines_separator_cut():
    """Without the separator cut the bridged lines would be one CC; the
    pipeline must still emit one strip per text line."""
    page, _, _ = _fixture_touching_lines()
    for backend in ("host", "hybrid"):
        image, eroded, _ = preprocess_images(page.image, backend=backend)
        strips, peaks, _ = identify_text_lines(image, eroded,
                                               backend=backend, params=PARAMS)
        assert len(peaks) == 3 and len(strips) == 3, backend


def test_empty_page_skips_folio():
    """All-white page -> no lines -> empty OCR -> process returns None
    (the reference's skip-folio failure path, alignToOCR.py:241-243)."""
    blank = np.full((400, 600, 3), 255, np.uint8)
    for backend in ("host", "hybrid"):
        assert process(blank, "dominus deus", existing_ocr=[],
                       backend=backend, verbose=False,
                       preproc_params=PARAMS) is None


def _sat_boundary_page():
    """A text line plus two bars straddling sat_area_thresh=150: the filter
    removes CCs spanning MORE than 150 rows (the reference's nrows-as-area
    quirk — a 3px-wide, 151-row bar with area 453 << any sane area
    threshold still dies)."""
    page = make_page(np.random.default_rng(47), n_lines=2, words_per_line=2,
                     H=700, W=800, char_h=30, char_w=18, gap=4, space_w=24,
                     line_spacing=90, speckles=0, margin_x=40)
    img = page.image
    img[300:451, 100:103] = 0  # 151 rows: removed (151 > 150)
    img[300:450, 700:703] = 0  # 150 rows: kept
    return page


@pytest.mark.parametrize("backend", ["host", "hybrid", "device"])
def test_sat_area_nrows_boundary(backend):
    page = _sat_boundary_page()
    image, _, _ = preprocess_images(page.image, backend=backend,
                                    correct_rotation=False)
    image = np.asarray(image)
    assert not image[300:451, 100:103].any(), f"{backend}: 151-row bar kept"
    assert image[300:450, 700:703].all(), f"{backend}: 150-row bar removed"


def _noise_boundary_page():
    """One text line plus two solid rectangles vertically coinciding with
    it, with post-erosion areas 100 and 102: the line-stage noise filter
    keeps strictly-greater-than-100 only (textAlignPreprocessing.py:235)."""
    page = make_page(np.random.default_rng(48), n_lines=1, words_per_line=2,
                     H=300, W=800, char_h=30, char_w=18, gap=4, space_w=24,
                     speckles=0, margin_x=300)
    img = page.image
    y0 = 50  # the single line's top
    img[y0 : y0 + 2, 20:70] = 0    # 2x50 = 100: dropped (not > 100)
    img[y0 : y0 + 2, 730:781] = 0  # 2x51 = 102: kept
    return page


@pytest.mark.parametrize("backend", ["host", "hybrid", "device"])
def test_noise_area_boundary(backend):
    page = _noise_boundary_page()
    params = PreprocParams(filter_size=8, despeckle_amt=20)
    image, eroded, _ = preprocess_images(page.image, backend=backend,
                                         despeckle_amt=20,
                                         correct_rotation=False)
    strips, _, _ = identify_text_lines(image, eroded, backend=backend,
                                       params=params)
    assert len(strips) == 1, backend
    s = strips[0]
    assert s.offset_x + s.img.shape[1] - 1 >= 780, \
        f"{backend}: area-102 CC excluded from the strip"
    assert s.offset_x >= 100, \
        f"{backend}: area-100 CC should have been dropped"


if __name__ == "__main__":
    import sys

    if "--regen" in sys.argv:
        os.makedirs(GOLDEN_DIR, exist_ok=True)
        for name in sorted(FIXTURES):
            got = _run(name, "host")
            path = os.path.join(GOLDEN_DIR, f"adv_{name}.json")
            with open(path, "w") as f:
                json.dump(got, f, indent=1, sort_keys=True)
            n = "None" if got is None else len(got["syl_boxes"])
            print(f"wrote {path} (syl_boxes: {n})")


def test_large_page_end_to_end():
    """A 4000x3200 folio with 24 lines through the full hybrid pipeline:
    stresses the CC-table sizes, the recognizer's frame-bucket ladder, and
    host/hybrid identity at scale (the densest production page shape)."""
    from text_alignment_tpu.synth import make_page, corrupt_ocr, ocr_with_spaces
    from text_alignment_tpu.pipeline import process, to_JSON_dict

    page = make_page(
        np.random.default_rng(404), n_lines=24, words_per_line=4,
        H=4000, W=3200, char_h=70, char_w=40, gap=8, space_w=60,
        line_spacing=160, speckles=400, margin_x=80, angle=-1.1,
    )
    ocr = ocr_with_spaces(
        corrupt_ocr(np.random.default_rng(405), page.char_boxes)
    )
    out = {}
    for backend in ("host", "hybrid"):
        result = process(page.image, page.transcript, existing_ocr=ocr,
                         verbose=False, backend=backend)
        assert result is not None
        syl_boxes, _, peaks, _ = result
        assert len(syl_boxes) > 50
        out[backend] = json.dumps(to_JSON_dict(syl_boxes, peaks),
                                  sort_keys=True)
    assert out["host"] == out["hybrid"]
