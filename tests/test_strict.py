"""strict=False quirk-fix mode (SURVEY.md §7 "reference defects"): the
three semantically meaningful fixes — area-based saturated-CC filter,
scoring-system NW boundary extends, true-median line spacing — each
engine-consistent and each changing output ONLY in its documented way.
(The fourth documented defect, the accepted-but-unused median_line_mult,
has no recoverable intent: it stays accepted-and-inert in both modes.)"""

import numpy as np
import pytest

from text_alignment_tpu.align import perform_alignment, resolve_scoring
from text_alignment_tpu.align.nw_host import (
    fill_host_fast,
    fill_reference_slow,
)
from text_alignment_tpu.ops import oracle
from text_alignment_tpu.pipeline.preprocess import (
    PreprocParams,
    preprocess_images,
)
from text_alignment_tpu.pipeline.process import to_JSON_dict


def test_resolve_scoring_strict_fields():
    sc = resolve_scoring([8, -4, -7, -7, -3, 0])
    assert (sc.bge_row0, sc.bge_col0) == (-1, -1) and sc.default_boundary
    sc = resolve_scoring([8, -4, -7, -7, -3, 0], strict=False)
    # row 0 = leading unmatched OCR (horizontal / gap_extend_y direction),
    # col 0 = leading unmatched transcript (vertical / gap_extend_x)
    assert (sc.bge_row0, sc.bge_col0) == (0, -3)
    assert not sc.default_boundary


def _engines_agree(t, o, sc):
    ref = fill_reference_slow(t, o, sc)
    fast = fill_host_fast(t, o, sc)
    for a, b in zip(ref, fast):
        np.testing.assert_array_equal(a, b)
    from text_alignment_tpu.align.nw_jax import fill_jax_packed
    from text_alignment_tpu.align.traceback import DiagPtrView

    diag = DiagPtrView(fill_jax_packed(t, o, sc))
    for i in range(1, len(t)):
        for j in range(1, len(o)):
            assert diag.mat(i, j) == ref[0][i][j]
            assert diag.x(i, j) == ref[1][i][j]
            assert diag.y(i, j) == ref[2][i][j]


def test_nonstrict_fill_engine_parity():
    t = list("dominus vobiscum") + [" "]
    o = list("xxxxdommnus vbiscum") + [" "]
    _engines_agree(t, o, resolve_scoring(None, strict=False))


def test_nonstrict_changes_leading_gap_behavior():
    """Default scoring has gap_extend_y = 0, so strict=False makes a long
    unmatched OCR prefix free instead of costing -1/char — alignments with
    noisy leading OCR may differ; both modes stay valid alignments."""
    t = list("abc")
    o = list("zzzzzzzzzzzzzzzzabc")
    a_strict = perform_alignment(t, o, backend="host", strict=True)
    a_fixed = perform_alignment(t, o, backend="host", strict=False)
    for tra, ocr in (a_strict, a_fixed):
        assert len(tra) == len(ocr)
        # the appended sentinel pair is dropped by the [-1:0:-1] reversal
        assert [c for c in tra if c != "_"] == t
        assert [c for c in ocr if c != "_"] == o
    # engine parity holds in non-strict mode for this pair too
    _engines_agree(t + [" "], o + [" "],
                   resolve_scoring(None, strict=False))


def test_nonstrict_sat_filter_uses_area():
    """A wide, 3-row-tall bar: nrows (3) <= 180 so parity mode KEEPS it;
    its area (3*200=600) > 180 so strict=False removes it. The tall thin
    bar exceeds the threshold both ways (area >= nrows always, so the
    fixed mode can only remove MORE, never less)."""
    ink = np.zeros((260, 260), bool)
    ink[10:13, 20:220] = True      # wide bar: nrows 3, area 600
    ink[30:230, 240:241] = True    # tall bar: nrows 200, area 200
    img = np.where(ink, 0, 255).astype(np.uint8)  # ink black on white

    strict_p = PreprocParams(sat_area_thresh=180)
    fixed_p = PreprocParams(sat_area_thresh=180, sat_filter_area=True)
    for backend in ("host", "hybrid", "device"):
        bs, _, _ = preprocess_images(img, correct_rotation=False,
                                     backend=backend, params=strict_p,
                                     despeckle_amt=0)
        bf, _, _ = preprocess_images(img, correct_rotation=False,
                                     backend=backend, params=fixed_p,
                                     despeckle_amt=0)
        assert bs[11, 100] and not bs[100, 240], backend   # nrows filter
        assert not bf[11, 100] and not bf[100, 240], backend  # area filter
    # oracle's corrected op directly
    got = oracle.remove_big_ccs(ink, 180)
    np.testing.assert_array_equal(got, bf)


def test_cc_runs_area_mode_matches_oracle():
    import jax.numpy as jnp

    from text_alignment_tpu.ops import cc_runs

    rng = np.random.default_rng(5)
    img = rng.random((80, 120)) < 0.3
    got, ok = cc_runs.remove_tall_ccs(jnp.asarray(img), 17, 1 << 13,
                                      by_area=True)
    assert bool(np.asarray(ok))
    np.testing.assert_array_equal(np.asarray(got),
                                  oracle.remove_big_ccs(img, 17))


def test_json_median_line_spacing():
    peaks = [0, 10, 30, 60, 100]  # diffs 10, 20, 30, 40
    assert to_JSON_dict([], peaks)["median_line_spacing"] == \
        np.quantile([10, 20, 30, 40], 0.75)
    assert to_JSON_dict([], peaks, strict=False)["median_line_spacing"] \
        == 25.0


def test_cli_no_strict_flag(tmp_path):
    import csv as csv_mod
    import json
    import pickle

    from PIL import Image

    from text_alignment_tpu.cli import main
    from text_alignment_tpu.synth import (
        corrupt_ocr,
        make_page,
        ocr_with_spaces,
    )

    page = make_page(np.random.default_rng(21), n_lines=3, words_per_line=2)
    png_dir = tmp_path / "png"
    png_dir.mkdir()
    Image.fromarray(page.image).save(png_dir / "demo_1r_text.png")
    pik_dir = tmp_path / "pik"
    pik_dir.mkdir()
    chars = ocr_with_spaces(corrupt_ocr(np.random.default_rng(3),
                                        page.char_boxes))
    with open(pik_dir / "demo_1r_boxes.pickle", "wb") as f:
        pickle.dump(chars, f, -1)
    csv_path = tmp_path / "chants.csv"
    with open(csv_path, "w", newline="") as f:
        w = csv_mod.writer(f)
        w.writerow(["h"] * 15)
        row = [""] * 15
        row[2], row[3], row[10], row[14] = "1r", "1", "1", page.transcript
        w.writerow(row)

    for extra, out in ((["--no-strict"], "fixed"), ([], "strict")):
        rc = main([
            "align", "--csv", str(csv_path), "--manuscript", "demo",
            "--model", str(tmp_path / "never.pyrnn.gz"),
            "--png-dir", str(png_dir),
            "--out-json", str(tmp_path / out),
            "--pickle-dir", str(pik_dir), "--reuse-ocr",
            "--folios", "1r", "--backend", "host", *extra,
        ])
        assert rc == 0
    d_s = json.load(open(tmp_path / "strict" / "demo_1r.json"))
    d_f = json.load(open(tmp_path / "fixed" / "demo_1r.json"))
    assert d_s["syl_boxes"] and d_f["syl_boxes"]
    # three evenly-ish spaced lines: the quantile quirk vs true median
    assert d_f["median_line_spacing"] <= d_s["median_line_spacing"]
