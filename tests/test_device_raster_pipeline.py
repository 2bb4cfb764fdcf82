"""Device-raster batched pipeline (pipeline.device_raster + the
DevicePageStrips OCR feed) vs the host pipeline — JSON byte parity, the
CC-certificate host fallback, and the stream yields."""

import json

import numpy as np
import pytest

from text_alignment_tpu.parallel.batch import process_batch
from text_alignment_tpu.synth import make_page


def _pages(n=6):
    return [
        make_page(np.random.default_rng(70 + i), n_lines=2, words_per_line=2,
                  H=500, W=460, char_h=40, char_w=26, gap=5, space_w=30,
                  line_spacing=140, speckles=10, margin_x=25)
        for i in range(n)
    ]


def _recognizer():
    import jax
    from text_alignment_tpu.models.codec import Codec
    from text_alignment_tpu.models.lstm_jax import init_bilstm
    from text_alignment_tpu.models.recognizer import SeqRecognizer

    codec = Codec()
    params = init_bilstm(jax.random.PRNGKey(7), 48, 100, len(codec))
    return SeqRecognizer(params, codec, normalize_on_device=True)


def test_device_raster_batch_byte_identical(monkeypatch):
    monkeypatch.setenv("TEXT_ALIGNMENT_TPU_RASTER", "device")
    rec = _recognizer()
    folios = [(p.image, p.transcript) for p in _pages()]
    dev = process_batch(folios, rec, backend="hybrid")
    host = process_batch(folios, rec, backend="host")
    assert any(r is not None for r in host)
    for d, h in zip(dev, host):
        if h is None or d is None:
            assert h is None and d is None
            continue
        assert json.dumps(d.json_dict, sort_keys=True) == \
            json.dumps(h.json_dict, sort_keys=True)
        assert [(c.char, c.ul, c.lr) for c in d.all_chars] == \
            [(c.char, c.ul, c.lr) for c in h.all_chars]


def test_device_raster_stream_yields_device_pages(monkeypatch):
    from text_alignment_tpu.pipeline.device_raster import (
        DevicePage, StripRef, raster_stream_device)
    from text_alignment_tpu.pipeline.preprocess import (
        preprocess_images, identify_text_lines)

    pages = _pages(3)
    out = list(raster_stream_device([p.image for p in pages]))
    assert len(out) == 3
    for page, (image, angle, strips, peaks) in zip(pages, out):
        assert isinstance(image, DevicePage)
        # exact-canvas shape + strip metadata match the host raster
        want_bin, want_er, want_angle = preprocess_images(
            page.image, backend="host")
        assert angle == want_angle
        assert image.shape == want_bin.shape
        want_strips, want_peaks, _ = identify_text_lines(
            want_bin, want_er, backend="host")
        assert peaks == want_peaks
        assert len(strips) == len(want_strips)
        for s, w in zip(strips, want_strips):
            assert isinstance(s, StripRef)
            assert (s.offset_x, s.offset_y, s.height, s.width) == \
                (w.offset_x, w.offset_y, w.height, w.width)


def test_cc_failure_falls_back_to_host(monkeypatch):
    """A page whose run table overflows must flow through the host raster
    (mixed stream) and still produce identical output."""
    from text_alignment_tpu.ops import raster_device as rd

    monkeypatch.setenv("TEXT_ALIGNMENT_TPU_RASTER", "device")
    monkeypatch.setattr(rd.cc_runs, "MAX_RUNS", 256)  # every page overflows
    rec = _recognizer()
    folios = [(p.image, p.transcript) for p in _pages(3)]
    dev = process_batch(folios, rec, backend="hybrid")
    host = process_batch(folios, rec, backend="host")
    for d, h in zip(dev, host):
        if h is None or d is None:
            assert h is None and d is None
            continue
        assert json.dumps(d.json_dict, sort_keys=True) == \
            json.dumps(h.json_dict, sort_keys=True)


def test_packed_page_ocr_feed_byte_identical(monkeypatch):
    """The packed-page OCR feed (host raster + one bit-packed page upload
    + on-device strip cutting) produces JSON byte-identical to the
    host-strip feed."""
    monkeypatch.setenv("TEXT_ALIGNMENT_TPU_OCR_FEED", "page")
    rec = _recognizer()
    folios = [(p.image, p.transcript) for p in _pages()]
    page_feed = process_batch(folios, rec, backend="hybrid")
    monkeypatch.setenv("TEXT_ALIGNMENT_TPU_OCR_FEED", "strips")
    strips_feed = process_batch(folios, rec, backend="hybrid")
    assert any(r is not None for r in strips_feed)
    for a, b in zip(page_feed, strips_feed):
        if b is None or a is None:
            assert b is None and a is None
            continue
        assert json.dumps(a.json_dict, sort_keys=True) == \
            json.dumps(b.json_dict, sort_keys=True)
        assert [(c.char, c.ul, c.lr) for c in a.all_chars] == \
            [(c.char, c.ul, c.lr) for c in b.all_chars]
