"""CTC best-path decoding with frame positions (llocs), host oracle + JAX.

Canonical semantics = ocropy's ``lstm.translate_back(outputs, pos=1)``
(SURVEY.md §2.10): label regions are maximal runs of frames where the blank
posterior is below threshold (0.7); each region emits the (frame, class) of
its maximum posterior over the whole frames x classes block (first
occurrence in row-major order on ties — which can be class 0, an ocropy
quirk preserved). ``ocropus-rpred --llocs`` then writes
``char \\t (frame - pad) * raw_width / (T - 2*pad)`` with one decimal
(alignToOCR.py:156-170 consumes that file format).

Also provides the CTC loss used by training (optax.ctc_loss, blank 0).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

THRESHOLD = 0.7


def translate_back_np(outputs: np.ndarray, threshold: float = THRESHOLD):
    """Oracle decode for one line. outputs: (T, C). Returns list of
    (frame, class)."""
    mask = outputs[:, 0] < threshold
    result = []
    t = 0
    T = len(outputs)
    while t < T:
        if not mask[t]:
            t += 1
            continue
        s = t
        while t < T and mask[t]:
            t += 1
        block = outputs[s:t]
        flat = int(np.argmax(block))
        r, c = divmod(flat, outputs.shape[1])
        result.append((s + r, c))
    return result


def region_end_np(outputs: np.ndarray, threshold: float = THRESHOLD):
    """Oracle for decode="region_end": ocropy's blank-threshold region
    segmentation and peak CLASS, but the reported frame is the region's
    LAST frame. The llocs contract treats each position as the char's
    RIGHTMOST edge (alignToOCR.py:164-182) while a CTC peak sits near the
    glyph's center — on boxes this costs ~half a glyph of systematic left
    bias. The region's end frame (where the blank reclaims the line) is
    the closest decode-level estimate of the right edge, measurably
    tightening box quality (examples/end_to_end_synthetic.py ladder).
    Opt-in (strict=False family): "region" stays the parity default."""
    mask = outputs[:, 0] < threshold
    result = []
    t = 0
    T = len(outputs)
    while t < T:
        if not mask[t]:
            t += 1
            continue
        s = t
        while t < T and mask[t]:
            t += 1
        block = outputs[s:t]
        flat = int(np.argmax(block))
        r, c = divmod(flat, outputs.shape[1])
        result.append((t - 1, c))
    return result


def bestpath_np(outputs: np.ndarray):
    """Best-path oracle decode for one line: maximal runs of a constant
    argmax class != blank each emit (peak frame, class). Robust on young
    models whose posteriors are not yet peaky (region decode needs the
    blank to clear the threshold BETWEEN adjacent different characters,
    which only long training on varied data produces); on a peaky model
    both decodes agree. ``translate_back_np`` remains the ocropy-parity
    default for loaded reference checkpoints."""
    path = outputs.argmax(axis=1)
    result = []
    t = 0
    T = len(outputs)
    while t < T:
        c = path[t]
        if c == 0:
            t += 1
            continue
        s = t
        while t < T and path[t] == c:
            t += 1
        result.append((s + int(np.argmax(outputs[s:t, c])), int(c)))
    return result


@functools.partial(jax.jit, static_argnames=("max_regions", "mode"))
def translate_back_batched(outputs, lengths, max_regions=256,
                           threshold=THRESHOLD, mode="region"):
    """Batched decode. outputs: (B, T, C); lengths: (B,).

    mode="region": ocropy translate_back semantics (blank-threshold
    regions); mode="bestpath": argmax-path runs (bestpath_np semantics);
    mode="region_end": region segmentation + peak class, but the frame is
    the region's LAST frame (region_end_np semantics — the right-edge
    estimate for the llocs box contract; opt-in, non-parity).
    Returns (frames (B, R) int32, classes (B, R) int32, counts (B,) int32);
    entries past counts[b] are padding (frame = T).
    """
    B, T, C = outputs.shape
    t_idx = jnp.arange(T, dtype=jnp.int32)[None, :]
    valid = t_idx < lengths[:, None]
    if mode in ("region", "region_end"):
        mask = (outputs[:, :, 0] < threshold) & valid
        # region ids: 1-based per run of consecutive masked frames
        prev = jnp.concatenate([jnp.zeros((B, 1), bool), mask[:, :-1]],
                               axis=1)
        starts = mask & ~prev
    else:  # bestpath: runs of a constant non-blank argmax class
        path = jnp.argmax(outputs, axis=2).astype(jnp.int32)
        path = jnp.where(valid, path, 0)
        mask = path != 0
        prev_path = jnp.concatenate(
            [jnp.zeros((B, 1), jnp.int32), path[:, :-1]], axis=1
        )
        starts = mask & (path != prev_path)
    rid = jnp.cumsum(starts.astype(jnp.int32), axis=1) * mask  # 0 = no region

    fb = jnp.max(outputs, axis=2)  # per-frame best posterior
    fc = jnp.argmax(outputs, axis=2).astype(jnp.int32)  # first-max class

    R = max_regions

    def per_line(rid_b, fb_b, fc_b, mask_b):
        # segment max over regions
        seg_max = jnp.full((R + 1,), -jnp.inf, jnp.float32).at[rid_b].max(
            jnp.where(mask_b, fb_b, -jnp.inf)
        )
        is_peak = mask_b & (fb_b == seg_max[rid_b])
        # first frame achieving the region max (row-major tie rule)
        frame_of = jnp.full((R + 1,), T, jnp.int32).at[rid_b].min(
            jnp.where(is_peak, t_idx[0], T)
        )
        peak_frames = frame_of[1 : R + 1]
        cls = jnp.where(peak_frames < T,
                        fc_b[jnp.clip(peak_frames, 0, T - 1)], 0)
        if mode == "region_end":
            # position = last frame of the region (class stays the peak's)
            end_of = jnp.full((R + 1,), -1, jnp.int32).at[rid_b].max(
                jnp.where(mask_b, t_idx[0], -1)
            )
            frames = jnp.where(peak_frames < T, end_of[1 : R + 1], T)
        else:
            frames = peak_frames
        # cap at R: a line with more regions than max_regions (plausible
        # for bestpath on a non-peaky model whose argmax flaps) must not
        # report a count larger than the frames/classes blocks it ships —
        # downstream slicing would read past the block boundary
        count = jnp.minimum(jnp.max(rid_b), R)
        return frames, cls, count

    frames, classes, counts = jax.vmap(per_line)(rid, fb, fc, mask)
    return frames, classes, counts


def llocs_positions(frames, raw_width: int, T_total: int, pad: int):
    """Frame indices -> llocs x positions, rounded to 1 decimal exactly as
    ocropus-rpred writes them ("%.1f")."""
    scale = raw_width * 1.0 / (T_total - 2 * pad)
    return [float("%.1f" % ((int(r) - pad) * scale)) for r in frames]


def ctc_loss(logits, logit_lengths, labels, label_lengths):
    """CTC loss (blank 0) for training, mean over batch.

    logits: (B, T, C) UN-normalized; labels: (B, S) int32 padded with 0.
    """
    import optax

    B, T, C = logits.shape
    logit_paddings = (
        jnp.arange(T)[None, :] >= logit_lengths[:, None]
    ).astype(jnp.float32)
    S = labels.shape[1]
    label_paddings = (
        jnp.arange(S)[None, :] >= label_lengths[:, None]
    ).astype(jnp.float32)
    per_seq = optax.ctc_loss(logits, logit_paddings, labels, label_paddings)
    return jnp.mean(per_seq)
