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


def _tail_body(sm, temp, h, w, tap, Hp, Wp, r2, K2, bs, nb, EXT):
    """Shared center-finding tail (means -> argmax -> reflect + k2
    smoothing -> center -> MAD) over one strip resident in VMEM. ``tap``
    maps a static tap index to the strip's SMEM k2 coefficient. Returns
    (center (1, Wp) i32, stats (1, 128) i32 = [dsum, dcnt, 0...])."""
    NEG = jnp.float32(-1e30)
    hf = h.astype(jnp.float32)

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
    REV = ((jax.lax.broadcasted_iota(jnp.int32, (bs, bs), 0)
            + jax.lax.broadcasted_iota(jnp.int32, (bs, bs), 1))
           == bs - 1).astype(jnp.float32)
    ext_x = jax.lax.broadcasted_iota(jnp.int32, (1, EXT), 1)
    e_idx = ext_x - r2

    a_ext0 = jnp.concatenate(
        [a, jnp.zeros((1, EXT - Wp), jnp.float32)], axis=1)
    mid = pltpu.roll(a_ext0, shift=r2, axis=1)

    first_blk = a[:, :bs]
    left_rev = jnp.dot(first_blk, REV,
                       preferred_element_type=jnp.float32)
    lpad = jnp.concatenate(
        [left_rev, jnp.zeros((1, EXT - bs), jnp.float32)], axis=1)
    lseg = pltpu.roll(lpad, shift=(EXT - (bs - r2)) % EXT, axis=1)

    a_blk0 = pltpu.roll(a_ext0, shift=(bs - w) % EXT, axis=1)
    right_rev = jnp.dot(a_blk0[:, :bs], REV,
                        preferred_element_type=jnp.float32)
    rpad = jnp.concatenate(
        [right_rev, jnp.zeros((1, EXT - bs), jnp.float32)], axis=1)
    rseg = pltpu.roll(rpad, shift=(r2 + w) % EXT, axis=1)

    a_ext = jnp.where(e_idx < 0, lseg,
                      jnp.where(e_idx < w, mid, rseg))

    # ---- sigma = 0.3h gaussian: static-shift MAC ladder ----
    acc = jnp.zeros((1, EXT), jnp.float32)
    for t in range(K2):
        acc = acc + pltpu.roll(a_ext, shift=(EXT - t) % EXT,
                               axis=1) * tap(t)
    a_s = acc[:, :Wp]
    center = a_s.astype(jnp.int32)  # truncation (a_s >= 0)

    # ---- MAD ink sums ----
    deltas = jnp.abs(i_col - jnp.broadcast_to(center, (Hp, Wp)))
    ink = (temp != 0) & valid
    dsum = jnp.sum(jnp.where(ink, deltas, 0), dtype=jnp.int32)
    dcnt = jnp.sum(ink.astype(jnp.int32), dtype=jnp.int32)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    stats = jnp.where(lane == 0, dsum, jnp.where(lane == 1, dcnt, 0))
    return center, stats


def _make_tail_kernel(Hp: int, Wp: int):
    r2 = _r2max(Hp)
    K2 = 2 * r2 + 1
    bs = _BS
    nb = Wp // bs
    assert Wp % bs == 0 and r2 < bs, (Wp, r2)
    EXT = -(-(Wp + 2 * r2) // bs) * bs  # padded a_ext lanes

    def kernel(hw_ref, k2_ref, sm_ref, temp_ref, center_ref, stats_ref):
        b = pl.program_id(0)
        h = hw_ref[b, 0]
        w = hw_ref[b, 1]
        center, stats = _tail_body(
            sm_ref[0], temp_ref[0], h, w, lambda t: k2_ref[b, t],
            Hp, Wp, r2, K2, bs, nb, EXT)
        center_ref[0] = center
        stats_ref[0] = stats

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


def engaged_full(Wp: int, B: int = 128) -> bool:
    """Full-chain kernel engagement: TEXT_ALIGNMENT_TPU_TAIL=full only
    (opt-in until the on-hardware decode-equality + speed gate passes),
    same shape constraints as the tail kernel."""
    import os

    if os.environ.get("TEXT_ALIGNMENT_TPU_TAIL") != "full":
        return False
    return (jax.default_backend() != "cpu" and Wp >= 640
            and Wp % 128 == 0 and B >= 64)


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


def _make_full_kernel(Hp: int, Wp: int, NO: int):
    """The WHOLE center-finding chain per strip: v-gauss (per-strip
    (Hp, Hp) matmul) + banked-Toeplitz h-gauss (NO offset tiles, MXU)
    + the shared tail — the ``sm`` tensor never exists in HBM. Inputs
    per grid step: ink mask (1, Hp, Wp) u8, v-gauss bank (1, Hp, Hp)
    f32, h-gauss Toeplitz tiles (1, NO, 128, 128) f32 (built by
    :func:`hgauss_tiles`, identical values to lineest_jax's
    _conv_rows_banded tiles), the SMEM k2 tap bank and (h, w) scalars."""
    r2 = _r2max(Hp)
    K2 = 2 * r2 + 1
    bs = _BS
    nb = Wp // bs
    no = (NO - 1) // 2
    assert Wp % bs == 0 and r2 < bs, (Wp, r2)
    EXT = -(-(Wp + 2 * r2) // bs) * bs

    def kernel(hw_ref, k2_ref, temp_ref, w0_ref, tiles_ref, center_ref,
               stats_ref):
        b = pl.program_id(0)
        h = hw_ref[b, 0]
        w = hw_ref[b, 1]
        temp = temp_ref[0]                      # (Hp, Wp) u8
        # Mosaic lacks a direct u8 -> f32 cast; go through int32
        x = temp.astype(jnp.int32).astype(jnp.float32)

        # v-gauss: per-strip (Hp, Hp) bank matmul
        sm1 = jnp.dot(w0_ref[0], x, preferred_element_type=jnp.float32)

        # h-gauss: banked Toeplitz — out_block[j] = sum_o
        # xp_block[j + o] @ T[o] (same tiles, same o-ascending
        # accumulation order as lineest_jax._conv_rows_banded)
        zpad = jnp.zeros((Hp, no * bs), jnp.float32)
        xp = jnp.concatenate([zpad, sm1, zpad], axis=1)
        out_blocks = []
        for j in range(nb):
            acc = jnp.zeros((Hp, bs), jnp.float32)
            for o in range(NO):
                acc = acc + jnp.dot(
                    xp[:, (j + o) * bs:(j + o + 1) * bs], tiles_ref[0, o],
                    preferred_element_type=jnp.float32)
            out_blocks.append(acc)
        sm = jnp.concatenate(out_blocks, axis=1)

        center, stats = _tail_body(
            sm, temp, h, w, lambda t: k2_ref[b, t],
            Hp, Wp, r2, K2, bs, nb, EXT)
        center_ref[0] = center
        stats_ref[0] = stats

    return kernel, K2


def hgauss_tiles(kernels, Wp: int):
    """(B, 2*no+1, 128, 128) Toeplitz offset tiles for the banked
    h-gauss — the exact tile build from lineest_jax._conv_rows_banded
    (values identical; computed in XLA, streamed to the kernel as
    blocked inputs)."""
    B, K = kernels.shape
    r = K // 2
    bs = _BS
    no = -(-r // bs)
    q = jnp.arange(bs, dtype=jnp.int32)
    d = (q[None, :, None] - q[None, None, :]
         + (jnp.arange(2 * no + 1, dtype=jnp.int32)[:, None, None] - no)
         * bs)
    idx = jnp.clip(d + r, 0, K - 1)
    T = jnp.take(kernels, idx.reshape(-1), axis=1).reshape(
        B, 2 * no + 1, bs, bs)
    return jnp.where((jnp.abs(d) <= r)[None], T, 0.0)


@functools.lru_cache(maxsize=None)
def _jit_full(B: int, Hp: int, Wp: int, NO: int, interpret: bool):
    kernel, K2 = _make_full_kernel(Hp, Wp, NO)

    def run(hw, k2, temp, w0, tiles):
        center, stats = pl.pallas_call(
            kernel,
            grid=(B,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((1, Hp, Wp), lambda b: (b, 0, 0)),
                pl.BlockSpec((1, Hp, Hp), lambda b: (b, 0, 0)),
                pl.BlockSpec((1, NO, _BS, _BS), lambda b: (b, 0, 0, 0)),
            ],
            out_specs=(
                pl.BlockSpec((1, 1, Wp), lambda b: (b, 0, 0)),
                pl.BlockSpec((1, 1, 128), lambda b: (b, 0, 0)),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((B, 1, Wp), jnp.int32),
                jax.ShapeDtypeStruct((B, 1, 128), jnp.int32),
            ),
            interpret=interpret,
        )(hw, k2, temp, w0, tiles)
        return center[:, 0], stats[:, 0]

    return jax.jit(run)


def center_from_temp(temp, w0, k1, hs, ws, interpret: bool | None = None):
    """(center, dsum, dcnt) from the ink mask alone: the v-gauss bank
    ``w0`` (B, Hp, Hp), the h-gauss tap bank ``k1`` (B, K1) and the
    strip dims — the full-chain replacement for the v-gauss/h-gauss/
    means/argmax/k2/MAD stages of normalize_batch_device."""
    from .lineest_jax import _gauss_kernel_bank

    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    B, Hp, Wp = temp.shape
    K2 = 2 * _r2max(Hp) + 1
    tiles = hgauss_tiles(k1, Wp)
    NO = int(tiles.shape[1])
    hw = jnp.stack([jnp.asarray(hs, jnp.int32),
                    jnp.asarray(ws, jnp.int32)], axis=1)
    k2 = _gauss_kernel_bank(
        _EXTRA * jnp.asarray(hs, jnp.int32).astype(jnp.float32), K2)
    fn = _jit_full(B, Hp, Wp, NO, bool(interpret))
    center, stats = fn(hw, k2.astype(jnp.float32),
                       temp.astype(jnp.uint8), w0.astype(jnp.float32),
                       tiles.astype(jnp.float32))
    return center, stats[:, 0], stats[:, 1]
