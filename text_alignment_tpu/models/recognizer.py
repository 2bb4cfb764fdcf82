"""Batched line recognizer: the in-process replacement for the
``ocropus-rpred`` subprocess (reference: alignToOCR.py:128-184).

Given a list of onebit line strips, produces per-line llocs rows
``(char, x)`` with x in line-local pixels rounded to one decimal — the same
contract the reference parses out of ``_i.llocs`` files. Strips are
normalized host-side (scipy), bucketed by frame count to avoid recompile
storms (fixed power-of-two ladder), and run through the batched JAX
BiLSTM+CTC in as few device dispatches as there are occupied buckets.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .codec import Codec
from .lineest import CenterNormalizer, normalize_strip, DEFAULT_PAD
from .lstm_jax import BiLSTMParams, bilstm_forward_batched, params_from_np
from .ctc import translate_back_batched, llocs_positions
from .pyrnn import load_pyrnn

_MAX_REGIONS = 512
_MIN_BUCKET = 128
_MAX_BUCKET = 8192


def _bucket_T(t: int) -> int:
    b = _MIN_BUCKET
    while b < t and b < _MAX_BUCKET:
        b *= 2
    return b


class SeqRecognizer:
    """BiLSTM+CTC line recognizer with ocropy-compatible input contract."""

    def __init__(self, params: BiLSTMParams, codec: Codec,
                 target_height: int = 48, pad: int = DEFAULT_PAD):
        self.params = params
        self.codec = codec
        self.target_height = target_height
        self.pad = pad

    @classmethod
    def from_pyrnn(cls, path: str) -> "SeqRecognizer":
        params_np, codec, target_height = load_pyrnn(path)
        return cls(params_from_np(params_np), codec, target_height)

    def normalize(self, strip: np.ndarray):
        lnorm = CenterNormalizer(self.target_height)
        return normalize_strip(strip, lnorm, self.pad)

    def recognize_batch(self, strips) -> list[list[tuple[str, float]]]:
        """strips: list of 2-D bool (True=ink) or grey arrays.
        Returns, per strip, the llocs rows [(char, x_one_decimal), ...]."""
        prepared = []  # (orig_index, frames, raw_width)
        results: list = [[] for _ in strips]
        for i, s in enumerate(strips):
            norm = self.normalize(np.asarray(s))
            if norm is None:
                continue  # blank line -> no llocs rows
            frames, raw_w = norm
            prepared.append((i, frames, raw_w))

        # group by bucketed frame count
        buckets: dict[int, list[int]] = {}
        for k, (_, frames, _) in enumerate(prepared):
            buckets.setdefault(_bucket_T(frames.shape[0]), []).append(k)

        for Tb, members in sorted(buckets.items()):
            # pad the batch dim to a power of two as well (blank lines decode
            # to zero regions) so repeated folios reuse one compilation
            B = max(8, 1 << (len(members) - 1).bit_length())
            xs = np.zeros((B, Tb, self.target_height), np.float32)
            lengths = np.zeros(B, np.int32)
            for bi, k in enumerate(members):
                _, frames, _ = prepared[k]
                T = frames.shape[0]
                if T > Tb:  # line longer than the ladder top: clip
                    frames = frames[:Tb]
                    T = Tb
                xs[bi, :T] = frames
                lengths[bi] = T

            outputs = bilstm_forward_batched(
                self.params, jnp.asarray(xs), jnp.asarray(lengths)
            )
            fr, cl, cnt = translate_back_batched(
                outputs, jnp.asarray(lengths), max_regions=_MAX_REGIONS
            )
            fr, cl, cnt = np.asarray(fr), np.asarray(cl), np.asarray(cnt)

            for bi, k in enumerate(members):
                orig_i, frames, raw_w = prepared[k]
                n = int(cnt[bi])
                line_frames = fr[bi, :n]
                line_classes = cl[bi, :n]
                xs_pos = llocs_positions(
                    line_frames, raw_w, int(lengths[bi]), self.pad
                )
                rows = [
                    (self.codec.charset[int(c)], x)
                    for c, x in zip(line_classes, xs_pos)
                ]
                results[orig_i] = rows

        return results
