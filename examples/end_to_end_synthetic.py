"""Full product-loop demo on synthetic data, no external assets needed:

1. render synthetic manuscript pages with a learnable per-character font;
2. train the BiLSTM+CTC recognizer on their line strips (the
   ocropus-rtrain equivalent, models/train.py);
3. save an iteration-stamped .pyrnn.gz checkpoint and RELOAD it through
   the ocropy-compatible loader (models/pyrnn.py);
4. run the real end-to-end pipeline on a held-out page — preprocess,
   line segmentation, the trained recognizer's OCR, affine-gap NW,
   syllable assembly;
5. score predicted syllable boxes against ground truth with the
   evaluation harness (evaluate.py: bbox IoU + ink IoU).

Run: python examples/end_to_end_synthetic.py [--iters N] [--backend hybrid]

The default "fast" recipe — clipped Adam over a training pool that includes
skewed+speckled pages (the held-out distribution) — converges in a few
hundred iterations (~8 min on the single-vCPU runtime, ~3 min on TPU) and
reaches held-out ink IoU ~0.59. `--recipe gradual` reproduces the original
slow recipe (unclipped on clean pages, ~2400 iterations / ~37 min CPU, ink
IoU ~0.54); see models/train.py for the measured story of why clipping used
to cost position quality and what actually fixed it.
Expected result: PASS with ink IoU >= 0.54.
"""

from __future__ import annotations

import argparse
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from text_alignment_tpu.synth import make_page
from text_alignment_tpu.pipeline.preprocess import (
    preprocess_images,
    identify_text_lines,
)
from text_alignment_tpu.pipeline import process
from text_alignment_tpu.models.codec import Codec
from text_alignment_tpu.models.train import Trainer, batch_lines
from text_alignment_tpu.models.lineest import normalize_strip
from text_alignment_tpu.lang.syllabify import syllabify_text
from text_alignment_tpu.evaluate import evaluate_alignment
from text_alignment_tpu.charbox import CharBox

PAGE_KW = dict(
    n_lines=8, words_per_line=3, H=1600, W=1300, char_h=60, char_w=34,
    gap=7, space_w=46, line_spacing=160, margin_x=40, glyphs="char",
)


def line_texts(page):
    """Per-line ground-truth text from the page's char boxes."""
    by_line: dict = {}
    for cb in page.char_boxes:
        by_line.setdefault(cb.ul[1] // PAGE_KW["line_spacing"], []).append(cb)
    out = []
    for _, v in sorted(by_line.items()):
        v = sorted(v, key=lambda c: c.ul[0])
        # words are separated by the synthetic space gap
        text = ""
        for a, b in zip(v, v[1:]):
            text += a.char
            if b.ul[0] - a.lr[0] > PAGE_KW["gap"] + 2:
                text += " "
        text += v[-1].char
        out.append(text)
    return out


def gt_syllable_boxes(page):
    """Ground-truth syllable boxes: syllabify the transcript and union the
    char boxes of each syllable (same grouping the pipeline outputs)."""
    chars = [cb for cb in page.char_boxes]
    syls = syllabify_text(page.transcript)
    flat = "".join(c.char for c in chars)
    joined = "".join(s.replace("-", "") for s in syls)
    assert flat == joined, "char stream must equal syllabified transcript"
    out = []
    i = 0
    for s in syls:
        body = s.replace("-", "")
        group = chars[i : i + len(body)]
        i += len(body)
        ul = (min(c.ul[0] for c in group), min(c.ul[1] for c in group))
        lr = (max(c.lr[0] for c in group), max(c.lr[1] for c in group))
        out.append({"syl": body, "difficult": 0, "ul": ul, "lr": lr})
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=2500)
    ap.add_argument("--train-pages", type=int, default=4)
    ap.add_argument("--backend", default="hybrid",
                    choices=["host", "hybrid", "device"])
    ap.add_argument("--lr", type=float, default=3e-3)
    ap.add_argument("--recipe", default="fast", choices=["fast", "gradual"],
                    help="fast: clipped Adam on a training pool that "
                    "includes skewed+speckled pages (converges in a few "
                    "hundred iterations with held-out ink IoU ~0.59). "
                    "gradual: the original unclipped clean-page crawl "
                    "(~2400 iterations, ink IoU ~0.54).")
    ap.add_argument("--ground-weight", type=float, default=0.0,
                    help="ink-grounding auxiliary loss weight (measured r3: "
                    "did not improve held-out box quality on this corpus; "
                    "kept as an experimentation knob)")
    ap.add_argument("--decode", default="region",
                    choices=["region", "bestpath"],
                    help="region: ocropy-parity llocs decode (precision-"
                    "biased peaks, well-localized boxes; the alignment "
                    "layer bridges dropped chars). bestpath: higher raw "
                    "char accuracy, positions less grounded on a "
                    "quick-trained model.")
    args = ap.parse_args()

    # persistent XLA compile cache on accelerator backends (remote-TPU
    # compiles are minutes; the cache makes reruns warm-start)
    from text_alignment_tpu import ensure_compile_cache

    ensure_compile_cache()

    t_start = time.time()
    codec = Codec()

    # 1. training data.
    # The fast recipe also renders SKEWED + SPECKLED training pages (the
    # held-out page's distribution): measured r3, clipped training on
    # clean-only pages generalizes its llocs positions poorly to noisy
    # held-out lines (ink IoU 0.34-0.38), while the same clipped training
    # on a representative pool reaches 0.59-0.60 — better than the slow
    # gradual recipe's 0.54, at ~1/6 the iterations. (The gradual crawl was
    # compensating for a train/test distribution gap, not a CTC property.)
    page_specs = [(100 + s, 0, 0.0) for s in range(args.train_pages)]
    if args.recipe == "fast":
        page_specs += [(104, 40, 0.6), (105, 40, -0.5),
                       (106, 30, 0.3), (107, 50, 0.8)]
    frames_list, texts = [], []
    for seed, speckles, angle in page_specs:
        page = make_page(np.random.default_rng(seed), speckles=speckles,
                         angle=angle, **PAGE_KW)
        image, eroded, _ = preprocess_images(page.image,
                                             backend=args.backend)
        strips, _, _ = identify_text_lines(image, eroded,
                                           backend=args.backend,
                                           verbose=False)
        lt = line_texts(page)
        assert len(strips) == len(lt), (len(strips), len(lt))
        for s, t in zip(strips, lt):
            n = normalize_strip(s.img)
            if n is None:
                continue
            frames_list.append(n[0])
            texts.append(t)
    print(f"[{time.time()-t_start:5.1f}s] {len(frames_list)} training lines")

    # 2. train
    T = ((max(f.shape[0] for f in frames_list) + 127) // 128) * 128
    S = max(len(t) for t in texts) + 8
    # fast recipe (default): clipped Adam escapes the CTC blank-collapse
    # plateau ~7x sooner; minibatches of 32 keep the step cost constant as
    # the pool grows. gradual: the original unclipped full-batch crawl
    # (~2400 iterations; see models/train.py for the measured story).
    if args.recipe == "fast":
        tr = Trainer(codec=codec, lr=args.lr, seed=1, clip_norm=1.0,
                     ground_weight=args.ground_weight)
        stop_loss = 0.15
    else:
        tr = Trainer(codec=codec, lr=args.lr, seed=1, clip_norm=None)
        stop_loss = 0.12
    # fast: 32-line minibatches keep the step cost constant as the pool
    # grows; gradual: ALWAYS the whole pool — it exists to reproduce the
    # original full-batch crawl, so it must not silently switch to
    # minibatch sampling when --train-pages makes the pool exceed 32
    B = min(32, len(frames_list)) if args.recipe == "fast" \
        else len(frames_list)
    rng = np.random.default_rng(0)
    idx = np.arange(len(frames_list))
    # whole-pool batch only when the pool fits one minibatch (built lazily:
    # the >B path resamples every iteration and never touches it)
    full = batch_lines(frames_list, texts, codec, T, S) if len(idx) <= B \
        else None
    for it in range(args.iters):
        if len(idx) > B:
            b = rng.choice(idx, size=B, replace=False)
            xs, xlens, labels, llens = batch_lines(
                [frames_list[i] for i in b], [texts[i] for i in b],
                codec, T, S)
        else:
            xs, xlens, labels, llens = full
        loss = tr.step(xs, xlens, labels, llens)
        if it % 50 == 0 or it == args.iters - 1:
            print(f"[{time.time()-t_start:5.1f}s] iter {it:4d} "
                  f"loss {loss:8.3f}")
        if loss < stop_loss:  # converged on the synthetic font
            print(f"[{time.time()-t_start:5.1f}s] early stop at iter {it} "
                  f"(loss {loss:.3f})")
            break

    # 3. checkpoint round-trip through the ocropy-compatible format
    ckpt_dir = tempfile.mkdtemp(prefix="ta_e2e_")
    model_path = tr.save(os.path.join(ckpt_dir, "synthetic"))
    print(f"[{time.time()-t_start:5.1f}s] checkpoint: {model_path}")

    # 4. held-out page through the real pipeline (skew + speckles on)
    page = make_page(np.random.default_rng(999), speckles=40, angle=0.6,
                     **PAGE_KW)
    from text_alignment_tpu.models.recognizer import SeqRecognizer
    from text_alignment_tpu.pipeline.process import _accel_platform

    rec = SeqRecognizer.from_pyrnn(model_path, decode=args.decode)
    # passing an instance bypasses _resolve_recognizer, so mirror its
    # normalize placement: device lineest on accelerator runtimes
    rec.normalize_on_device = (
        args.backend in ("device", "hybrid") and _accel_platform()
    )
    result = process(page.image, page.transcript, ocropus_model=rec,
                     backend=args.backend, verbose=False)
    assert result is not None, "pipeline produced no syllables"
    syl_boxes, image_bin, peaks, all_chars = result
    ocr_text = "".join(c.char for c in all_chars)
    print(f"[{time.time()-t_start:5.1f}s] OCR len={len(ocr_text)} "
          f"(truth {len(page.transcript)}); sample: {ocr_text[:48]!r}")
    print(f"              truth sample: {page.transcript[:48]!r}")

    # 5. score vs ground truth (reference metric, evaluate harness)
    gt = gt_syllable_boxes(page)
    # predictions in the un-rotated frame: evaluate against the raw page
    # like the reference (correct_rotation=False preprocessing)
    image_unrot, _, _ = preprocess_images(page.image, backend=args.backend,
                                          correct_rotation=False)
    align_boxes = [
        {"syl": cb.char, "ul": cb.ul, "lr": cb.lr} for cb in syl_boxes
    ]
    iou, ink_iou = evaluate_alignment(gt, align_boxes, image_unrot)
    n_pred = len(syl_boxes)
    print(f"[{time.time()-t_start:5.1f}s] syllables: {n_pred} predicted / "
          f"{len(gt)} truth;  mean bbox IoU {iou:.3f};  ink IoU {ink_iou:.3f}")

    # per-syllable failure breakdown (evaluate.diagnose_alignment): WHERE
    # did each missed syllable go — OCR gaps, wrong line, or boundary?
    # all_chars live in the rotated frame; rotate_back applies the
    # pipeline's own un-rotation before comparing against the raw-frame GT
    from text_alignment_tpu.evaluate import diagnose_alignment

    _, _, det_angle = preprocess_images(page.image, backend=args.backend)
    diag = diagnose_alignment(
        page.transcript, all_chars, gt,
        rotate_back=(det_angle, image_bin.shape, page.image.shape[:2]))
    print(f"              diagnosis: {diag['counts']}  "
          f"(OCR CER through alignment: {diag['ocr_cer']:.2f})")
    for si, (syl, cat, detail) in sorted(diag["categories"].items()):
        if cat not in ("ok", "no-gt"):
            print(f"                #{si:>3} {syl!r:<10} {cat}: {detail}")
    # success: most syllables located with solid ink overlap. (The OCR is a
    # small model on a tiny synthetic corpus — char accuracy ~75%, the same
    # regime as the reference's reported ~80% — and the alignment layer is
    # what turns that into usable boxes, exactly as on real manuscripts.)
    # Measured r3 (fast recipe): ink IoU 0.59-0.60 region/bestpath; the
    # gate keeps margin for held-out seed variance.
    ok = n_pred >= 0.8 * len(gt) and ink_iou > 0.50
    print(f"[{time.time()-t_start:5.1f}s] {'PASS' if ok else 'FAIL'}")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
