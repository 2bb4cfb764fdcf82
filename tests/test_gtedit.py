"""gtedit round trip: line-crop extraction -> correction HTML -> ground
truth — the in-framework equivalent of the reference's manual
ocropus-gtedit training workflow (reference README.md:52-56)."""

import os

import numpy as np
import pytest

from text_alignment_tpu import gtedit
from text_alignment_tpu.synth import make_page


@pytest.fixture(scope="module")
def lines_dir(tmp_path_factory):
    from text_alignment_tpu.pipeline.preprocess import PreprocParams

    d = tmp_path_factory.mktemp("lines")
    page = make_page(np.random.default_rng(5), n_lines=3, words_per_line=2)
    paths = gtedit.extract_lines(
        page.image, str(d), "p001", backend="host",
        preproc_params=PreprocParams(filter_size=8),
    )
    assert len(paths) == 3
    return d


def test_extract_lines_polarity_round_trips_into_train(lines_dir):
    # crops are ink-black-on-white uint8 PNGs — the polarity
    # models.lineest.normalize_strip expects for grey images (so the same
    # files feed `train --lines-dir` unmodified)
    from PIL import Image

    from text_alignment_tpu.models.lineest import normalize_strip

    p = os.path.join(lines_dir, "p001_0000.png")
    img = np.asarray(Image.open(p))
    assert img.dtype == np.uint8
    assert img.max() == 255 and img.min() == 0  # background white, ink black
    # border rows are background (the strip bbox is tight on the ink)
    assert img[0].max() == 255 and img[-1].max() == 255
    norm = normalize_strip(img)
    assert norm is not None
    frames, raw_w = norm
    assert frames.shape[1] == 48 and raw_w == img.shape[1]


def test_html_prefills_gt_and_escapes(lines_dir, tmp_path):
    with open(os.path.join(lines_dir, "p001_0000.gt.txt"), "w") as f:
        f.write('do<mi>nus "a&b"\n')
    out = tmp_path / "correction.html"
    n = gtedit.make_html(str(lines_dir), str(out))
    assert n == 3
    content = out.read_text()
    assert content.count('<input class="gt"') == 3
    assert content.count("data:image/png;base64,") == 3
    # prefill is escaped in the attribute and parses back verbatim
    assert "do&lt;mi&gt;nus &quot;a&amp;b&quot;" in content
    rows = gtedit.parse_corrections(str(out))
    assert rows["p001_0000"] == 'do<mi>nus "a&b"'
    assert rows["p001_0001"] == ""  # no gt, no recognizer -> empty


def test_saved_html_edit_extracts_gt(lines_dir, tmp_path):
    out = tmp_path / "correction.html"
    gtedit.make_html(str(lines_dir), str(out))
    # simulate a browser edit + "Save page": the oninput mirror updates the
    # value attribute in the saved DOM
    content = out.read_text().replace(
        'name="p001_0001" value=""', 'name="p001_0001" value="alleluia"'
    )
    saved = tmp_path / "saved.html"
    saved.write_text(content)
    gt_dir = tmp_path / "gt"
    n = gtedit.extract(str(saved), str(gt_dir))
    # p001_0000 has a prefilled gt, p001_0001 was corrected in the browser;
    # the untouched empty p001_0002 row must NOT become an
    # empty-transcription CTC training pair
    assert n == 2
    assert (gt_dir / "p001_0001.gt.txt").read_text() == "alleluia\n"
    assert not (gt_dir / "p001_0002.gt.txt").exists()


def test_tsv_extract_and_traversal_guard(tmp_path):
    tsv = tmp_path / "corrections.tsv"
    tsv.write_text(
        "p001_0000\tdominus deus\n"
        "../evil\towned\n"          # path traversal: ignored
        "p001_0001\tin excelsis\n"
    )
    gt_dir = tmp_path / "gt"
    n = gtedit.extract(str(tsv), str(gt_dir))
    assert n == 2
    assert sorted(os.listdir(gt_dir)) == [
        "p001_0000.gt.txt", "p001_0001.gt.txt"
    ]
    assert (gt_dir / "p001_0000.gt.txt").read_text() == "dominus deus\n"


def test_cli_lines_and_gtedit(tmp_path):
    from PIL import Image

    from text_alignment_tpu.cli import main

    page = make_page(np.random.default_rng(6), n_lines=2, words_per_line=2)
    png = tmp_path / "folio.png"
    Image.fromarray(page.image).save(png)  # uint8 RGB, white bg / black ink
    out_dir = tmp_path / "lines"
    assert main(["lines", str(png), "--out-dir", str(out_dir),
                 "--filter-size", "8"]) == 0
    crops = sorted(os.listdir(out_dir))
    assert crops == ["folio_0000.png", "folio_0001.png"]

    html = tmp_path / "c.html"
    assert main(["gtedit", "html", "--lines-dir", str(out_dir),
                 "--out", str(html)]) == 0
    tsv = tmp_path / "c.tsv"
    tsv.write_text("folio_0000\tgloria\nfolio_0001\tkyrie\n")
    assert main(["gtedit", "extract", str(tsv),
                 "--out-dir", str(out_dir)]) == 0
    assert (out_dir / "folio_0000.gt.txt").read_text() == "gloria\n"
    # the pairs now feed `train --lines-dir` (pairing logic only — the
    # actual training loop is covered by test_train_quality)
    pairs = [fn for fn in os.listdir(out_dir) if fn.endswith(".png")
             and os.path.isfile(os.path.join(out_dir, fn[:-4] + ".gt.txt"))]
    assert len(pairs) == 2


def test_html_recognizer_prefill(lines_dir, tmp_path):
    # crops without .gt.txt get one batched recognizer pass as prefill;
    # existing gt wins over OCR. Untrained weights -> arbitrary (possibly
    # empty) text; the contract is that the pass runs and fills the field.
    import jax

    from text_alignment_tpu.models.codec import Codec
    from text_alignment_tpu.models.lstm_jax import init_bilstm
    from text_alignment_tpu.models.recognizer import SeqRecognizer

    with open(os.path.join(lines_dir, "p001_0000.gt.txt"), "w") as f:
        f.write('do<mi>nus "a&b"\n')
    codec = Codec(["", "~", " ", "a", "b", "c"])
    rec = SeqRecognizer(
        init_bilstm(jax.random.PRNGKey(1), 48, 12, len(codec)), codec
    )
    out = tmp_path / "c.html"
    n = gtedit.make_html(str(lines_dir), str(out), recognizer=rec)
    assert n == 3
    rows = gtedit.parse_corrections(str(out))
    assert set(rows) == {"p001_0000", "p001_0001", "p001_0002"}
    # an existing gt.txt wins over OCR
    assert rows["p001_0000"] == 'do<mi>nus "a&b"'
    for stem in ("p001_0001", "p001_0002"):
        assert set(rows[stem]) <= set(codec.charset)
