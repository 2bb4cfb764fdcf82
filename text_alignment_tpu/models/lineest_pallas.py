"""Pallas fusion of the line-normalizer's center-finding tail.

normalize_batch_device (models.lineest_jax) is HBM-bandwidth-bound: the
uniform means, argmax, center smoothing and MAD stages each stream the
(B, Hp, Wp) ``sm`` tensor through HBM again (~50 GB/s effective on this
runtime — docs/DESIGN.md). This kernel fuses everything DOWNSTREAM of
the h-gauss output into one per-strip pass that keeps the strip in VMEM:

    sm ──▶ windowed mean (rows) ──▶ windowed mean (cols, w-wide window
    via mean-centred blocked-prefix + dynamic-shift rolls) ──▶
    sm + 0.001·u ──▶ first-max row argmax ──▶ reflect-extended
    σ=0.3h gaussian smoothing (static-shift MAC ladder over an SMEM tap
    bank) ──▶ int center ──▶ MAD ink sums

one strip per grid step, (1, Hp, Wp) VMEM blocks; outputs are the
(B, Wp) int32 center map and per-strip [dsum, dcnt] lanes. The
arithmetic mirrors lineest_jax's f32 formulations operation for
operation (same blocked-tril prefix structure, same clamp/select
edges, same truncation casts); the only drift vs the XLA path is float
summation order — gated, like every normalizer change, by the
decode-equality suite.

Mosaic constraints that shaped the shapes: no cumsum/flip primitives
(blocked-tril MXU prefix; 128x128 one-hot reversal matmuls), no
unaligned lane slices (every placement is a pltpu.roll, which DOES take
dynamic shifts), scalar broadcasts come from SMEM (the per-strip k2 tap
bank is a kernel input).

Engagement: accelerator backends, width buckets Wp >= 640 (the reflect
extension uses the single-wrap closed form, valid because the mult-256
pack ladder guarantees w > Wp - 256); TEXT_ALIGNMENT_TPU_TAIL=xla
restores the XLA tail. Contract: ocrolib lineest semantics baked into
trained weights, reference alignToOCR.py:142-147.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TRUNCATE = 4.0
_EXTRA = 0.3
_BS = 128


def _r2max(Hp: int) -> int:
    return int(_TRUNCATE * Hp * _EXTRA + 0.5)


def _make_tail_kernel(Hp: int, Wp: int):
    r2 = _r2max(Hp)
    K2 = 2 * r2 + 1
    bs = _BS
    nb = Wp // bs
    assert Wp % bs == 0 and r2 < bs, (Wp, r2)
    EXT = -(-(Wp + 2 * r2) // bs) * bs  # padded a_ext lanes

    def kernel(hw_ref, k2_ref, sm_ref, temp_ref, center_ref, stats_ref):
        NEG = jnp.float32(-1e30)
        b = pl.program_id(0)
        h = hw_ref[b, 0]
        w = hw_ref[b, 1]
        hf = h.astype(jnp.float32)
        sm = sm_ref[0]          # (Hp, Wp) f32
        temp = temp_ref[0]      # (Hp, Wp) u8 (ink mask 0/1)

        i_col = jax.lax.broadcasted_iota(jnp.int32, (Hp, Wp), 0)
        x_row = jax.lax.broadcasted_iota(jnp.int32, (Hp, Wp), 1)
        valid = (i_col < h) & (x_row < w)
        sm_z = jnp.where(valid, sm, 0.0)

        # ---- windowed mean over rows (uniform_filter1d axis 0) ----
        s_h = jnp.maximum((0.5 * hf).astype(jnp.int32), 1)
        ii = jax.lax.broadcasted_iota(jnp.int32, (Hp, Hp), 0)  # out row
        jj = jax.lax.broadcasted_iota(jnp.int32, (Hp, Hp), 1)  # in row
        lo = ii - s_h // 2
        band = ((jj >= lo) & (jj <= lo + s_h - 1)).astype(jnp.float32)
        u = jnp.dot(band, sm_z, preferred_element_type=jnp.float32)
        u = u / s_h.astype(jnp.float32)

        # ---- windowed mean over columns (window = strip width w) ----
        s_w = jnp.maximum(w, 1)
        mu = jnp.mean(u, axis=1, keepdims=True)            # over all Wp
        xc = u - mu
        # blocked lower-triangular prefix (same structure/order as
        # lineest_jax._windowed_mean_w)
        TRI = (jax.lax.broadcasted_iota(jnp.int32, (bs, bs), 0)
               <= jax.lax.broadcasted_iota(jnp.int32, (bs, bs), 1)
               ).astype(jnp.float32)  # TRI[j, i] = 1 for j <= i
        parts = []
        off = jnp.zeros((Hp, 1), jnp.float32)
        for k in range(nb):
            blk = xc[:, k * bs:(k + 1) * bs]
            intra = jnp.dot(blk, TRI, preferred_element_type=jnp.float32)
            parts.append(intra + off)
            off = off + intra[:, bs - 1:bs]
        S = jnp.concatenate(parts, axis=1)
        c1 = s_w - 1 - s_w // 2
        c2 = s_w // 2 + 1
        # clamps are to the TENSOR edge Wp-1 (lineest_jax clamps to
        # W-1 of the padded array; the zeros beyond the strip width come
        # from sm_z, not the window) — S[:, Wp-1] via masked lane reduce
        # (no unaligned slices in Mosaic)
        last = jnp.sum(jnp.where(x_row == Wp - 1, S, 0.0), axis=1,
                       keepdims=True)
        roll_hi = pltpu.roll(S, shift=(Wp - c1 % Wp) % Wp, axis=1)
        hi_v = jnp.where(x_row + c1 <= Wp - 1, roll_hi, last)
        roll_lo = pltpu.roll(S, shift=c2 % Wp, axis=1)
        lo_v = jnp.where(x_row >= c2, roll_lo, 0.0)
        n_in = (jnp.minimum(x_row + c1, Wp - 1)
                - jnp.maximum(x_row - s_w // 2, 0) + 1).astype(jnp.float32)
        u2 = (hi_v - lo_v + n_in * mu) / s_w.astype(jnp.float32)

        # ---- argmax over rows (first max), column-masked ----
        smc = sm + 0.001 * u2
        smc = jnp.where(i_col < h, smc, NEG)
        m = jnp.max(smc, axis=0, keepdims=True)
        first = jnp.min(jnp.where(smc == m, i_col, Hp), axis=0,
                        keepdims=True)                      # (1, Wp) i32
        xw = jax.lax.broadcasted_iota(jnp.int32, (1, Wp), 1)
        a = jnp.where(xw < w, first.astype(jnp.float32), 0.0)

        # ---- reflect-extend (scipy 'reflect', single-wrap form) ----
        # ext lane j holds index e = j - r2:
        #   e in [-r2, 0)   -> a[-1 - e]      (left mirror)
        #   e in [0, w)     -> a[e]
        #   e in [w, w+r2]  -> a[2w - 1 - e]  (right mirror about w-1)
        REV = ((jax.lax.broadcasted_iota(jnp.int32, (bs, bs), 0)
                + jax.lax.broadcasted_iota(jnp.int32, (bs, bs), 1))
               == bs - 1).astype(jnp.float32)
        ext_x = jax.lax.broadcasted_iota(jnp.int32, (1, EXT), 1)
        e_idx = ext_x - r2

        # middle: roll a (zero-padded to EXT) right by r2
        a_ext0 = jnp.concatenate(
            [a, jnp.zeros((1, EXT - Wp), jnp.float32)], axis=1)
        mid = pltpu.roll(a_ext0, shift=r2, axis=1)

        # left mirror: reverse a's first 128 lanes -> left_rev[p] =
        # a[bs-1-p]; ext lane j (j < r2) needs a[r2-1-j] =
        # left_rev[j + bs - r2] -> roll left by (bs - r2)
        first_blk = a[:, :bs]
        left_rev = jnp.dot(first_blk, REV,
                           preferred_element_type=jnp.float32)
        lpad = jnp.concatenate(
            [left_rev, jnp.zeros((1, EXT - bs), jnp.float32)], axis=1)
        lseg = pltpu.roll(lpad, shift=(EXT - (bs - r2)) % EXT, axis=1)

        # right mirror: roll a so a[w-1] lands at lane bs-1, reverse
        # that block -> right_rev[q] = a[w-1-q]; ext lane j needs
        # q = e - w -> roll right so right_rev[0] lands at lane r2 + w
        a_blk0 = pltpu.roll(a_ext0, shift=(bs - w) % EXT, axis=1)
        right_rev = jnp.dot(a_blk0[:, :bs], REV,
                            preferred_element_type=jnp.float32)
        # right_rev[q] = a_blk0[bs-1-q] = a[w-1-q] for q in [0, bs)
        rpad = jnp.concatenate(
            [right_rev, jnp.zeros((1, EXT - bs), jnp.float32)], axis=1)
        rseg = pltpu.roll(rpad, shift=(r2 + w) % EXT, axis=1)

        a_ext = jnp.where(e_idx < 0, lseg,
                          jnp.where(e_idx < w, mid, rseg))

        # ---- sigma = 0.3h gaussian: static-shift MAC ladder over the
        # SMEM tap bank (taps zero beyond each strip's radius) ----
        acc = jnp.zeros((1, EXT), jnp.float32)
        for t in range(K2):
            acc = acc + pltpu.roll(a_ext, shift=(EXT - t) % EXT,
                                   axis=1) * k2_ref[b, t]
        a_s = acc[:, :Wp]
        center = a_s.astype(jnp.int32)  # truncation (a_s >= 0)
        center_ref[0] = center

        # ---- MAD ink sums ----
        deltas = jnp.abs(i_col - jnp.broadcast_to(center, (Hp, Wp)))
        ink = (temp != 0) & valid
        dsum = jnp.sum(jnp.where(ink, deltas, 0), dtype=jnp.int32)
        dcnt = jnp.sum(ink.astype(jnp.int32), dtype=jnp.int32)
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
        stats_ref[0] = jnp.where(
            lane == 0, dsum, jnp.where(lane == 1, dcnt, 0))

    return kernel, K2


@functools.lru_cache(maxsize=None)
def _jit_tail(B: int, Hp: int, Wp: int, interpret: bool):
    kernel, K2 = _make_tail_kernel(Hp, Wp)

    def run(hw, k2, sm, temp):
        center, stats = pl.pallas_call(
            kernel,
            grid=(B,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((1, Hp, Wp), lambda b: (b, 0, 0)),
                pl.BlockSpec((1, Hp, Wp), lambda b: (b, 0, 0)),
            ],
            out_specs=(
                # (B, 1, Wp): block minor dims must equal the array's
                # (Mosaic requires block last-two dims divisible by
                # (8, 128) or equal to the array dims)
                pl.BlockSpec((1, 1, Wp), lambda b: (b, 0, 0)),
                pl.BlockSpec((1, 1, 128), lambda b: (b, 0, 0)),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((B, 1, Wp), jnp.int32),
                jax.ShapeDtypeStruct((B, 1, 128), jnp.int32),
            ),
            interpret=interpret,
        )(hw, k2, sm, temp)
        return center[:, 0], stats[:, 0]

    return jax.jit(run)


def tail_from_sm(sm, temp, hs, ws, interpret: bool | None = None):
    """(center (B, Wp) i32, dsum (B,) i32, dcnt (B,) i32) from the
    h-gauss output ``sm`` and the ink mask ``temp`` — the fused
    replacement for the means/argmax/k2/MAD stages of
    normalize_batch_device."""
    from .lineest_jax import _gauss_kernel_bank

    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    B, Hp, Wp = sm.shape
    K2 = 2 * _r2max(Hp) + 1
    hw = jnp.stack([jnp.asarray(hs, jnp.int32),
                    jnp.asarray(ws, jnp.int32)], axis=1)
    k2 = _gauss_kernel_bank(
        _EXTRA * jnp.asarray(hs, jnp.int32).astype(jnp.float32), K2)
    fn = _jit_tail(B, Hp, Wp, bool(interpret))
    center, stats = fn(hw, k2.astype(jnp.float32),
                       sm.astype(jnp.float32), temp.astype(jnp.uint8))
    return center, stats[:, 0], stats[:, 1]


def engaged(Wp: int, B: int = 128) -> bool:
    """Pallas tail engagement: accelerator backend + wide-enough bucket
    (the single-wrap reflect form needs w > (Wp + r2max)/2, guaranteed
    by the mult-256 width ladder only for Wp >= 640) + large-enough
    batch (measured v5e A/B on the fused recognizer, byte-identical
    decode wires: B=121 29.3 -> 26.0 ms/exec, but B=21 9.8 -> 15.1 —
    the per-launch grid overhead dominates small batches)."""
    import os

    if os.environ.get("TEXT_ALIGNMENT_TPU_TAIL", "pallas") != "pallas":
        return False
    return (jax.default_backend() != "cpu" and Wp >= 640
            and Wp % 128 == 0 and B >= 64)
