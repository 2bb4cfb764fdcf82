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


@pytest.fixture()
def full_checkout(tmp_path):
    """A complete synthesized reference checkout in CI shape: all four
    manuscripts' naming (alignToOCR.py:387-405), one folio each, wired to
    exercise every report path — salzinnes=match (+GT), einsiedeln=
    MISMATCH (diverged out_json), stgall390=skipped (no OCR source),
    stmaurf=error (empty OCR stream)."""
    from text_alignment_tpu.pipeline import process, to_JSON_dict

    for d in ("png", "csv", "pik", "out_json", "ground-truth-alignments"):
        (tmp_path / d).mkdir()

    def add_csv(fname_csv, folio, transcript):
        with open(tmp_path / "csv" / fname_csv, "w", newline="") as f:
            w = csv_mod.writer(f)
            w.writerow(["h"] * 15)
            row = [""] * 15
            row[2], row[3], row[10], row[14] = folio, "1", "1", transcript
            w.writerow(row)

    def make_assets(man, folio, seed):
        page = make_page(np.random.default_rng(seed), n_lines=3,
                         words_per_line=2)
        Image.fromarray(page.image).save(
            tmp_path / "png" / f"{man}_{folio}_text.png")
        chars = ocr_with_spaces(corrupt_ocr(np.random.default_rng(seed + 1),
                                            page.char_boxes))
        return page, chars

    def run_host(page, chars):
        syl_boxes, _, peaks, _ = process(page.image, page.transcript,
                                         existing_ocr=chars, verbose=False,
                                         backend="host")
        return to_JSON_dict(syl_boxes, peaks)

    # --- salzinnes (mapping.csv path): exact match + GT XML
    page, chars = make_assets("salzinnes", "001r", 31)
    add_csv("123723_Salzinnes.csv", "001r", page.transcript)
    with open(tmp_path / "csv" / "mapping.csv", "w", newline="") as f:
        w = csv_mod.writer(f)
        w.writerow(["seq", "folio", "filename"])
        w.writerow(["1", "001r", "CF-001r"])
    with open(tmp_path / "pik" / "salzinnes_001r_boxes.pickle", "wb") as f:
        pickle.dump(chars, f, -1)
    d = run_host(page, chars)
    json.dump(d, open(tmp_path / "out_json" / "salzinnes_001r.json", "w"))
    root = ET.Element("annotation")
    for s in d["syl_boxes"][:5]:
        obj = ET.SubElement(root, "object")
        ET.SubElement(obj, "name").text = s["syl"]
        ET.SubElement(obj, "difficult").text = "0"
        bb = ET.SubElement(obj, "bndbox")
        for tag, v in (("xmin", s["ul"][0]), ("ymin", s["ul"][1]),
                       ("xmax", s["lr"][0]), ("ymax", s["lr"][1])):
            ET.SubElement(bb, tag).text = str(v)
    ET.ElementTree(root).write(
        tmp_path / "ground-truth-alignments" / "salzinnes_001r_gt.xml")

    # --- einsiedeln (no mapping): out_json diverges -> MISMATCH
    page, chars = make_assets("einsiedeln", "002v", 41)
    add_csv("einsiedeln_chants.csv", "002v", page.transcript)
    with open(tmp_path / "pik" / "einsiedeln_002v_boxes.pickle", "wb") as f:
        pickle.dump(chars, f, -1)
    d = run_host(page, chars)
    d["syl_boxes"][0]["ul"][0] += 3          # divergent box
    d["syl_boxes"] = d["syl_boxes"][:-1]     # divergent count
    json.dump(d, open(tmp_path / "out_json" / "einsiedeln_002v.json", "w"))

    # --- stgall390: page + transcript but no pik and no model -> skipped
    page, _ = make_assets("stgall390", "023", 51)
    add_csv("stgall390_chants.csv", "023", page.transcript)

    # --- stmaurf: empty OCR stream -> process returns None -> error
    page, _ = make_assets("stmaurf", "007r", 61)
    add_csv("stmaurf_chants.csv", "007r", page.transcript)
    with open(tmp_path / "pik" / "stmaurf_007r_boxes.pickle", "wb") as f:
        pickle.dump([], f, -1)

    return tmp_path


def test_cli_full_checkout_exit_semantics(full_checkout, tmp_path, capsys):
    """Day-one CI shape: the CLI over the complete four-manuscript
    checkout exercises match / MISMATCH / skipped / error in one run,
    exits 1 (mismatch+error present), and formats MISMATCH details; a
    clean-manuscript restriction exits 0."""
    from text_alignment_tpu.cli import main
    from text_alignment_tpu.verify_reference import discover

    pages, csvs, mapping = discover(str(full_checkout))
    assert [p[0] for p in pages] == ["einsiedeln", "salzinnes", "stgall390",
                                     "stmaurf"]
    assert set(csvs) == {"salzinnes", "einsiedeln", "stgall390", "stmaurf"}
    assert mapping and mapping.endswith("mapping.csv")

    out = tmp_path / "full_report.json"
    rc = main(["verify-reference", "--assets", str(full_checkout),
               "--backend", "host", "--out", str(out)])
    assert rc == 1  # mismatch + error present
    rep = json.load(open(out))
    assert rep["summary"] == {"match": 1, "mismatch": 1,
                              "no_reference": 0, "error": 1}
    by_name = {f["fname"]: f for f in rep["folios"]}
    assert by_name["salzinnes_001r"]["status"] == "match"
    assert by_name["salzinnes_001r"]["bbox_iou"] == pytest.approx(1.0)
    mm = by_name["einsiedeln_002v"]
    assert mm["status"] == "MISMATCH"
    assert "syl count" in mm["detail"] and "box" in mm["detail"]
    assert by_name["stgall390_023"]["status"] == "skipped"
    assert "no OCR source" in by_name["stgall390_023"]["detail"]
    assert by_name["stmaurf_007r"]["status"] == "error"
    captured = capsys.readouterr().out
    assert "match 1  mismatch 1" in captured

    # restricting to the clean manuscript exits 0
    rc = main(["verify-reference", "--assets", str(full_checkout),
               "--manuscript", "salzinnes", "--backend", "host"])
    assert rc == 0

    # --folios restriction reaches only the named folio
    rc = main(["verify-reference", "--assets", str(full_checkout),
               "--folios", "023", "--backend", "host"])
    assert rc == 0  # skipped folio is not an error


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
