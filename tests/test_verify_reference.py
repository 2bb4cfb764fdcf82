"""Real-asset parity harness (verify_reference + cli verify-reference)
against a synthesized reference checkout — discovery of the reference
layout, exact-match reporting, mismatch detection, GT IoU wiring."""

import csv as csv_mod
import json
import os
import pickle
import xml.etree.ElementTree as ET

import numpy as np
import pytest
from PIL import Image

from text_alignment_tpu.synth import corrupt_ocr, make_page, ocr_with_spaces


@pytest.fixture()
def checkout(tmp_path):
    """A minimal salzinnes-shaped reference checkout: page + chant CSV +
    mapping + pik OCR cache + out_json written by the HOST pipeline (the
    stand-in for the reference's own output)."""
    for d in ("png", "csv", "pik", "out_json", "ground-truth-alignments"):
        (tmp_path / d).mkdir()
    page = make_page(np.random.default_rng(31), n_lines=3, words_per_line=2)
    Image.fromarray(page.image).save(tmp_path / "png" /
                                     "salzinnes_001r_text.png")
    chars = ocr_with_spaces(corrupt_ocr(np.random.default_rng(8),
                                        page.char_boxes))
    with open(tmp_path / "pik" / "salzinnes_001r_boxes.pickle", "wb") as f:
        pickle.dump(chars, f, -1)
    with open(tmp_path / "csv" / "123723_Salzinnes.csv", "w",
              newline="") as f:
        w = csv_mod.writer(f)
        w.writerow(["h"] * 15)
        row = [""] * 15
        row[2], row[3], row[10], row[14] = "001r", "1", "1", page.transcript
        w.writerow(row)
    with open(tmp_path / "csv" / "mapping.csv", "w", newline="") as f:
        w = csv_mod.writer(f)
        w.writerow(["seq", "folio", "filename"])
        w.writerow(["1", "001r", "CF-001r"])

    # the "reference output": our own host pipeline (bit-identical claim)
    from text_alignment_tpu.pipeline import process, to_JSON_dict

    syl_boxes, _, peaks, _ = process(page.image, page.transcript,
                                     existing_ocr=chars, verbose=False,
                                     backend="host")
    d = to_JSON_dict(syl_boxes, peaks)
    with open(tmp_path / "out_json" / "salzinnes_001r.json", "w") as f:
        json.dump(d, f)

    # GT XML from the emitted syl boxes (perfect-overlap fixture)
    root = ET.Element("annotation")
    for s in d["syl_boxes"][:5]:
        obj = ET.SubElement(root, "object")
        ET.SubElement(obj, "name").text = s["syl"]
        ET.SubElement(obj, "difficult").text = "0"
        bb = ET.SubElement(obj, "bndbox")
        ET.SubElement(bb, "xmin").text = str(s["ul"][0])
        ET.SubElement(bb, "ymin").text = str(s["ul"][1])
        ET.SubElement(bb, "xmax").text = str(s["lr"][0])
        ET.SubElement(bb, "ymax").text = str(s["lr"][1])
    ET.ElementTree(root).write(
        tmp_path / "ground-truth-alignments" / "salzinnes_001r_gt.xml")
    return tmp_path


def test_discovery(checkout):
    from text_alignment_tpu.verify_reference import discover

    pages, csvs, mapping = discover(str(checkout))
    assert pages == [("salzinnes", "001r",
                      str(checkout / "png" / "salzinnes_001r_text.png"))]
    assert "salzinnes" in csvs
    assert mapping and mapping.endswith("mapping.csv")


def test_verify_match_and_gt(checkout, capsys):
    from text_alignment_tpu.verify_reference import verify

    rep = verify(str(checkout), backend="host")
    assert rep.n_match == 1 and rep.n_mismatch == 0 and rep.n_error == 0
    fr = rep.folios[0]
    assert fr.status == "match" and fr.ocr_source == "pik"
    assert fr.bbox_iou == pytest.approx(1.0)  # GT copied from our boxes
    assert fr.ink_iou == pytest.approx(1.0)


def test_verify_detects_mismatch(checkout):
    from text_alignment_tpu.verify_reference import verify

    ref_path = checkout / "out_json" / "salzinnes_001r.json"
    d = json.load(open(ref_path))
    d["syl_boxes"][0]["ul"][0] += 3  # simulate a divergent reference box
    json.dump(d, open(ref_path, "w"))
    rep = verify(str(checkout), backend="host", verbose=False)
    assert rep.n_mismatch == 1
    assert "box" in rep.folios[0].detail


def test_cli_verify_reference(checkout, tmp_path, capsys):
    from text_alignment_tpu.cli import main

    out = tmp_path / "report.json"
    rc = main(["verify-reference", "--assets", str(checkout),
               "--backend", "host", "--out", str(out)])
    assert rc == 0
    rep = json.load(open(out))
    assert rep["summary"]["match"] == 1
    captured = capsys.readouterr().out
    assert "match 1" in captured

    # a missing transcript page is reported as skipped, not fatal
    Image.fromarray(
        make_page(np.random.default_rng(4), n_lines=2,
                  words_per_line=2).image
    ).save(checkout / "png" / "salzinnes_zzz_text.png")
    rc = main(["verify-reference", "--assets", str(checkout),
               "--backend", "host"])
    assert rc == 0
