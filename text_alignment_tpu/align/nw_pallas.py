"""Pallas TPU kernel for the affine-gap NW wavefront fill.

Same recurrence, boundary quirks, and first-max tie-breaking as
:mod:`.nw_jax` (which itself mirrors the reference's pure-Python fill,
textSeqCompare.py:45-88), but written as a single Mosaic kernel:

- DP lanes live in VMEM as an ``(R, 128)`` int32 tile grid (row-major flat
  lane order), matched to the VPU's native (8, 128) vregs — not a (1, L)
  row vector that would waste 7/8 sublanes.
- The TPU grid iterates over chunks of ``CHUNK`` anti-diagonals; carry
  state persists across grid steps in VMEM scratch (the TPU grid is
  sequential), so the whole fill is ONE dispatch regardless of problem
  size, and pointers stream to HBM one ``(CHUNK, R, 128)`` block at a time.
- Per diagonal only three value shifts are needed: the shifted d-2 lanes
  equal the shift of the carried d-1 lanes computed on the *previous*
  step, so the kernel re-carries them instead of re-shifting (the
  ``lax.scan`` formulation shifts six arrays per step).
- OCR elements are injected one per diagonal from an SMEM-resident chunk
  of the feed; scoring is the match/mismatch lane-equality test (the
  reference's standard case — substitution-matrix scoring falls back to
  the XLA scan path).

Pointer packing and diagonal layout are identical to ``nw_jax``:
``packed[i + j, i] = mp | xp << 2 | yp << 4`` (uint8), so traceback and
``DiagPtrView`` consumers work unchanged.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .scoring import Scoring, BOUNDARY_GAP_EXTEND

_INT_NEG = -(2**30)
LANE = 128
_BLOCK_VMEM_BUDGET = 2 << 20  # bytes for the pointer output block


def _chunk_for(L: int) -> int:
    """Anti-diagonals per grid step: large enough to amortize grid-step
    overhead, small enough that the (CHUNK, L) uint8 output block stays
    within a VMEM budget at long-sequence sizes."""
    return max(32, min(256, _BLOCK_VMEM_BUDGET // max(L, 1)))


from .nw_jax import _bucket as _bucket_jax  # shared padding-bucket ladder


def _pack_P(R: int) -> int:
    """Pairs packed per tile: enough R-row blocks to fill the sublane row
    target (default 32 = 4 vregs per vector op — the fill body is
    dependency-latency-bound, so independent rows per instruction are
    nearly free). One definition so the batched fill and the grid-search
    chunker agree (TEXT_ALIGNMENT_TPU_NW_PACK_ROWS overrides for A/B)."""
    import os as _os

    pack_rows = int(_os.environ.get("TEXT_ALIGNMENT_TPU_NW_PACK_ROWS",
                                    "32"))
    return max(1, pack_rows // max(R, 1))


def _bucket(n: int) -> int:
    """The scan ladder, with large rungs rounded up to multiples of 1024
    so the Mosaic tiles keep R = L/128 a sublane multiple of 8 — an
    R = 20 tile (L = 2560) measured HALF the fill rate of the aligned
    R = 24 (L = 3072) form on v5e (misaligned vreg masking on every
    vector op of the dependent chain)."""
    b = _bucket_jax(n)
    if b <= 2048:
        return b
    return -(-b // 1024) * 1024


def _shift_down(v, row_ids, neg):
    """Row-major flat shift by one: out[f] = v[f-1], out[0] = NEG, where
    f = r*128 + c over an (R, 128) tile."""
    rolled = pltpu.roll(v, 1, axis=1)           # [r, 0] <- v[r, 127]
    wrap = pltpu.roll(rolled[:, :1], 1, axis=0)  # [r, 0] <- v[r-1, 127]
    head = jnp.where(row_ids[:, :1] == 0, neg, wrap)
    return jnp.concatenate([head, rolled[:, 1:]], axis=1)


def _first_max3(a, b, c, enc=(0, 1, 2)):
    """(max, argmax) over three lanes with first-max-wins tie-breaking
    (the reference's ``list.index(max(...))``, textSeqCompare.py:72-88).
    ``enc`` lets callers receive the argmax already shifted into its final
    bit position (packing is mp | xp << 2 | yp << 4 — encoding here turns
    the two pack shifts into free constants)."""
    e0, e1, e2 = (jnp.int32(e) for e in enc)
    v01 = jnp.maximum(a, b)
    p01 = jnp.where(a >= b, e0, e1)
    v = jnp.maximum(v01, c)
    p = jnp.where(v01 >= c, p01, e2)
    return v, p


def _unroll_for(chunk: int) -> int:
    """Largest power-of-two diagonal-retirement factor <= 32 dividing
    ``chunk`` (production chunks are multiples of 32; tests use odd ones).
    Measured raw fill @16k^2: 25.4 GCUPS at 8, 26.3 at 16, 26.9 at 32,
    27.1 at 64 — 32 is the knee before kernel code size doubles again."""
    u = 32
    while chunk % u:
        u //= 2
    return max(u, 1)


def _make_nw_kernel(chunk: int):
    def _nw_kernel(params_ref, o_ref, t_ref, out_ref, state):
        _nw_kernel_body(params_ref, o_ref, t_ref, out_ref, state, chunk)
    return _nw_kernel


def _nw_kernel_body(params_ref, o_ref, t_ref, out_ref, state, CHUNK):
    """One grid step: CHUNK diagonals.

    params_ref: SMEM (8,) int32 [match, mismatch, gox+gex, goy+gey, gex,
                gey, NoP, D]
    o_ref:      SMEM (CHUNK,) int32 — this chunk of the OCR feed
    t_ref:      VMEM (R, 128) int32 — extended transcript lanes
    out_ref:    VMEM (CHUNK, R, 128) uint8 — packed pointers block
    state:      VMEM (7, R, 128) int32 scratch carried across grid steps:
                [m2s, x2s, y2s, m1, x1, y1, o_lane]
    """
    g = pl.program_id(0)
    R = t_ref.shape[0]
    NEG = jnp.int32(_INT_NEG)
    BGE = jnp.int32(BOUNDARY_GAP_EXTEND)

    row_ids = jax.lax.broadcasted_iota(jnp.int32, (R, LANE), 0)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (R, LANE), 1)
    lane_i = row_ids * LANE + col_ids

    @pl.when(g == 0)
    def _init():
        state[...] = jnp.full((7, R, LANE), NEG, jnp.int32)
        state[6] = jnp.zeros((R, LANE), jnp.int32)

    match = params_ref[0]
    mismatch = params_ref[1]
    gox_gex = params_ref[2]
    goy_gey = params_ref[3]
    gex = params_ref[4]
    gey = params_ref[5]

    t_ext = t_ref[...]
    carry0 = (state[0], state[1], state[2], state[3], state[4], state[5],
              state[6])

    # loop-invariant boundary terms
    row0 = lane_i == 0
    bge_lane = BGE * lane_i

    def body(k, carry):
        m2s, x2s, y2s, m1, x1, y1, o_lane = carry
        d = g * CHUNK + k

        o_elem = o_ref[g, k]
        o_rolled = pltpu.roll(o_lane, 1, axis=1)
        o_wrap = pltpu.roll(o_rolled[:, :1], 1, axis=0)
        o_head = jnp.where(row_ids[:, :1] == 0, o_elem, o_wrap)
        o_lane = jnp.concatenate([o_head, o_rolled[:, 1:]], axis=1)

        s = jnp.where(t_ext == o_lane, match, mismatch)

        # shifted d-1 lanes; these become next step's shifted d-2 lanes
        m1s = _shift_down(m1, row_ids, NEG)
        x1s = _shift_down(x1, row_ids, NEG)
        y1s = _shift_down(y1, row_ids, NEG)

        m_int, mp = _first_max3(m2s, x2s, y2s)
        m_int = m_int + s
        y_int, yp = _first_max3(m1 + goy_gey, x1 + goy_gey, y1 + gey,
                                enc=(0, 1 << 4, 2 << 4))
        x_int, xp = _first_max3(m1s + gox_gex, x1s + gex, y1s + gox_gex,
                                enc=(0, 1 << 2, 2 << 2))

        # boundary conditions (textSeqCompare.py:53-60 overwrite order).
        # Out-of-band lanes (j < 0 or j >= NoP) are NOT masked: every value
        # a valid cell reads is either from a valid cell or overwritten by
        # the row0/col0 selects below, and out-of-band lanes start at NEG
        # (~-2^30) and drift by at most |params| per diagonal, so they can
        # never win a max against a valid lane (bounded by BGE*(L+NoP)).
        # Dropping the mask removes ~6 VPU ops from the per-diagonal body.
        # Row 0 sits at lane 0 where j == d, so its BGE * j boundary value
        # is the SCALAR BGE * d (broadcast); col0 (j == 0) is the single
        # lane lane_i == d, and lane 0 needn't be excluded from it because
        # the outer row0 select wins there.
        col0 = lane_i == d
        bge_j0 = BGE * d

        m_v = jnp.where(row0, bge_j0, jnp.where(col0, bge_lane, m_int))
        x_v = jnp.where(row0, bge_j0, jnp.where(col0, NEG, x_int))
        y_v = jnp.where(row0, NEG, jnp.where(col0, bge_lane, y_int))

        packed = (mp | xp | yp).astype(jnp.uint8)
        out_ref[k] = packed

        return m1s, x1s, y1s, m_v, x_v, y_v, o_lane

    # manual diagonal-retirement unroll (Mosaic's fori_loop only supports
    # unroll=1|all):
    # the per-diagonal body is issue/latency-bound (measured ~400 ns per
    # diagonal whether the tile is 8 or 16 vregs wide; 8k raw fill
    # 19.3 -> 24.7 GCUPS at 16k^2 from the unroll alone), so retiring
    # several diagonals per loop step amortizes the loop overhead.
    # _chunk_for returns multiples of 32; tests pass odd chunks, so fall
    # back to the largest power-of-two divisor.
    U = _unroll_for(CHUNK)

    def bodyU(k8, carry):
        for u in range(U):
            carry = body(k8 * U + u, carry)
        return carry

    carry = jax.lax.fori_loop(0, CHUNK // U, bodyU, carry0)
    for idx in range(7):
        state[idx] = carry[idx]


@functools.partial(jax.jit,
                   static_argnames=("L", "NoP", "interpret", "chunk",
                                    "keep_padding"))
def _fill_pallas(t_ext2d, o_feed, params, L, NoP, interpret=False,
                 chunk=None, keep_padding=False):
    """keep_padding=True returns all G*CHUNK rows (a multiple of 32) so the
    hopping traceback can window it without re-padding."""
    R = L // LANE
    D = L + NoP - 1
    CHUNK = chunk or _chunk_for(L)
    G = (D + CHUNK - 1) // CHUNK
    out = pl.pallas_call(
        _make_nw_kernel(CHUNK),
        grid=(G,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # params, whole array
            # o_feed (G, CHUNK) lives whole in SMEM (blocked SMEM operands
            # hit Mosaic layout-divisibility rules); the kernel reads one
            # scalar per diagonal: o_ref[g, k]
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((R, LANE), lambda g: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((CHUNK, R, LANE), lambda g: (g, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((G * CHUNK, R, LANE), jnp.uint8),
        scratch_shapes=[pltpu.VMEM((7, R, LANE), jnp.int32)],
        interpret=interpret,
    )(params, o_feed.reshape(G, CHUNK), t_ext2d)
    out = out.reshape(G * CHUNK, L)
    return out if keep_padding else out[:D]


def _make_nw_kernel_batched(chunk: int, R: int, P: int,
                            per_pair: bool = False,
                            shared_feed: bool = False):
    """Pair-PACKED variant: P pairs share one (P*R, 128) tile, filling in
    sublane-axis lockstep (small buckets have R = L/128 < 8 rows, so a
    lone pair wastes most of every (8, 128) vreg — packing restores full
    sublane occupancy and divides the sequential grid length by P). Grid
    (ceil(B/P), G): g iterates fastest, the scratch carry re-initializes
    at g == 0 for every new pair group. Per-pair semantics are identical
    to the singleton kernel: shifts and the OCR feed respect pair
    boundaries (head row per R-row block), and lane indices/boundary
    conditions are computed per pair.

    ``per_pair=True`` gives every packed pair its OWN scoring parameters
    (params_ref becomes SMEM (BG, P, 8)): the six scalars turn into
    (P*R, 1) per-sublane-block columns built once per grid row, so the
    recurrence's scalar adds become broadcast vector adds (same VPU op
    count). This is the 729-combination grid-search path — one pair
    replicated under many scorings (SURVEY.md §7 step 7). The boundary
    rows keep the scoring-INDEPENDENT module-global gap_extend = -1
    (reference textSeqCompare.py:53-60 quirk), so they need no per-pair
    form.

    ``shared_feed=True`` (grid-search path): every packed pair aligns the
    SAME ocr stream, so o_ref shrinks to SMEM (1, 1, G, CHUNK) — one feed
    for the whole batch instead of B copies. This removes the SMEM-size
    cap on the per-dispatch pair count (the cap that held the 2400^2
    sweep to 10 pairs/dispatch), and the P head-row selects collapse to
    one."""
    PR = P * R

    def _nw_kernel_b(params_ref, o_ref, t_ref, out_ref, state):
        bp = pl.program_id(0)
        g = pl.program_id(1)
        NEG = jnp.int32(_INT_NEG)
        BGE = jnp.int32(BOUNDARY_GAP_EXTEND)

        row_ids = jax.lax.broadcasted_iota(jnp.int32, (PR, LANE), 0)
        col_ids = jax.lax.broadcasted_iota(jnp.int32, (PR, LANE), 1)
        prow = row_ids % R  # row within the pair's R-row block
        lane_i = prow * LANE + col_ids
        head_row = prow[:, :1] == 0

        @pl.when(g == 0)
        def _init():
            state[...] = jnp.full((7, PR, LANE), NEG, jnp.int32)
            state[6] = jnp.zeros((PR, LANE), jnp.int32)

        if per_pair:
            def _pp(idx):
                v = jnp.full((PR, 1), params_ref[bp, 0, idx], jnp.int32)
                for p in range(1, P):  # static cascade over packed pairs
                    v = jnp.where(row_ids[:, :1] >= p * R,
                                  params_ref[bp, p, idx], v)
                return v

            match = _pp(0)
            mismatch = _pp(1)
            gox_gex = _pp(2)
            goy_gey = _pp(3)
            gex = _pp(4)
            gey = _pp(5)
        else:
            match = params_ref[0]
            mismatch = params_ref[1]
            gox_gex = params_ref[2]
            goy_gey = params_ref[3]
            gex = params_ref[4]
            gey = params_ref[5]

        t_ext = t_ref[0]
        carry0 = (state[0], state[1], state[2], state[3], state[4],
                  state[5], state[6])

        # loop-invariant boundary terms
        row0 = lane_i == 0
        bge_lane = BGE * lane_i

        def shift_down(v, neg):
            rolled = pltpu.roll(v, 1, axis=1)
            wrap = pltpu.roll(rolled[:, :1], 1, axis=0)
            head = jnp.where(head_row, neg, wrap)
            return jnp.concatenate([head, rolled[:, 1:]], axis=1)

        def body(k, carry):
            m2s, x2s, y2s, m1, x1, y1, o_lane = carry
            d = g * chunk + k

            o_rolled = pltpu.roll(o_lane, 1, axis=1)
            o_head = pltpu.roll(o_rolled[:, :1], 1, axis=0)
            if shared_feed:  # one feed for the whole batch: one select
                o_head = jnp.where(head_row, o_ref[0, 0, g, k], o_head)
            else:
                for p in range(P):  # static unroll: a select per pair
                    o_head = jnp.where(row_ids[:, :1] == p * R,
                                       o_ref[bp, p, g, k], o_head)
            o_lane = jnp.concatenate([o_head, o_rolled[:, 1:]], axis=1)

            s = jnp.where(t_ext == o_lane, match, mismatch)

            m1s = shift_down(m1, NEG)
            x1s = shift_down(x1, NEG)
            y1s = shift_down(y1, NEG)

            m_int, mp = _first_max3(m2s, x2s, y2s)
            m_int = m_int + s
            y_int, yp = _first_max3(m1 + goy_gey, x1 + goy_gey, y1 + gey,
                                    enc=(0, 1 << 4, 2 << 4))
            x_int, xp = _first_max3(m1s + gox_gex, x1s + gex, y1s + gox_gex,
                                    enc=(0, 1 << 2, 2 << 2))

            # out-of-band lanes unmasked; scalar BGE * d row-0 boundary and
            # single-lane col0 — same arguments as the singleton kernel
            col0 = lane_i == d
            bge_j0 = BGE * d

            m_v = jnp.where(row0, bge_j0,
                            jnp.where(col0, bge_lane, m_int))
            x_v = jnp.where(row0, bge_j0, jnp.where(col0, NEG, x_int))
            y_v = jnp.where(row0, NEG, jnp.where(col0, bge_lane, y_int))

            packed = (mp | xp | yp).astype(jnp.uint8)
            out_ref[0, k] = packed
            return m1s, x1s, y1s, m_v, x_v, y_v, o_lane

        # same manual unroll as the singleton kernel: the body is
        # issue/latency-bound, not VPU-throughput-bound
        U = _unroll_for(chunk)

        def bodyU(k8, carry):
            for u in range(U):
                carry = body(k8 * U + u, carry)
            return carry

        carry = jax.lax.fori_loop(0, chunk // U, bodyU, carry0)
        for idx in range(7):
            state[idx] = carry[idx]

    return _nw_kernel_b


@functools.partial(jax.jit,
                   static_argnames=("L", "NoP", "interpret", "chunk",
                                    "per_pair", "shared_feed"))
def _fill_pallas_batched(t_ext3d, o_feed3d, params, L, NoP,
                         interpret=False, chunk=None, per_pair=False,
                         shared_feed=False):
    """Fill B same-bucket pairs in ONE kernel invocation, P = 8 // R pairs
    packed per tile. t_ext3d: (B, R, LANE) int32; o_feed3d: (B, G, CHUNK)
    int32. Returns packed pointers (B, D, L) uint8.

    ``per_pair=True``: params is (B, 8) int32 — one scoring row per pair
    (the grid-search path); otherwise params is the shared (8,) row.
    ``shared_feed=True``: o_feed3d is (1, G, CHUNK) — ONE ocr stream
    shared by every pair (the grid-search path aligns one pair under many
    scorings), kept as a single SMEM copy."""
    B = t_ext3d.shape[0]
    R = L // LANE
    D = L + NoP - 1
    CHUNK = chunk or _chunk_for(L)
    G = (D + CHUNK - 1) // CHUNK
    # pack pairs to PR sublane rows, not just one vreg: the body is
    # dependency-latency-bound, so multiplying the independent lane work
    # per instruction is nearly free and divides the sequential grid
    # length by the same factor (measured on R=16 buckets: the P=1 fill
    # was ~65k sequential diagonals for a 16-pair batch). The row target
    # is tunable for experiments (TEXT_ALIGNMENT_TPU_NW_PACK_ROWS).
    P = _pack_P(R)
    Bp = ((B + P - 1) // P) * P
    if Bp != B:  # pad with copies of pair 0 (valid work, rows discarded)
        pad = Bp - B
        t_ext3d = jnp.concatenate(
            [t_ext3d, jnp.repeat(t_ext3d[:1], pad, axis=0)], axis=0)
        if not shared_feed:
            o_feed3d = jnp.concatenate(
                [o_feed3d, jnp.repeat(o_feed3d[:1], pad, axis=0)], axis=0)
        if per_pair:
            params = jnp.concatenate(
                [params, jnp.repeat(params[:1], pad, axis=0)], axis=0)
    BG = Bp // P
    t4 = t_ext3d.reshape(BG, P * R, LANE)
    o4 = (o_feed3d.reshape(1, 1, G, CHUNK) if shared_feed
          else o_feed3d.reshape(BG, P, G, CHUNK))
    p_arg = params.reshape(BG, P, 8) if per_pair else params
    out = pl.pallas_call(
        _make_nw_kernel_batched(CHUNK, R, P, per_pair=per_pair,
                                shared_feed=shared_feed),
        grid=(BG, G),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, P * R, LANE), lambda b, g: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, CHUNK, P * R, LANE),
                               lambda b, g: (b, g, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((BG, G * CHUNK, P * R, LANE),
                                       jnp.uint8),
        scratch_shapes=[pltpu.VMEM((7, P * R, LANE), jnp.int32)],
        interpret=interpret,
    )(p_arg, o4, t4)
    # (BG, GC, P, R, LANE) -> (Bp, GC, L): pair-major rows back to a
    # per-pair diagonal layout identical to the singleton kernel's
    out = (out.reshape(BG, G * CHUNK, P, R * LANE)
              .transpose(0, 2, 1, 3)
              .reshape(Bp, G * CHUNK, L))
    return out[:B, :D]


@functools.partial(jax.jit,
                   static_argnames=("L", "NoP", "interpret", "chunk",
                                    "per_pair", "shared_feed"))
def _align_fused_pairs_pallas(t_ext3d, o_feed3d, params, Nts, Nos, L, NoP,
                              interpret=False, chunk=None, per_pair=False,
                              shared_feed=False):
    packed = _fill_pallas_batched(t_ext3d, o_feed3d, params, L=L, NoP=NoP,
                                  interpret=interpret, chunk=chunk,
                                  per_pair=per_pair,
                                  shared_feed=shared_feed)

    # grid-batched Pallas hopping traceback: one kernel launch walks all
    # B pointer tensors (one grid instance each). The lock-step vmapped
    # XLA walk this replaces pays ~7 µs per path step (one gather each)
    # and dominated the 2400^2 grid sweep (~34 ms per 10-pair chunk); the
    # r3 finding that "hopping was slower at B = 16" was B SEQUENTIAL
    # dispatches — as grid instances the launch overhead is paid once.
    # TEXT_ALIGNMENT_TPU_TB=xla restores the old walk for A/B.
    import os as _os

    if _os.environ.get("TEXT_ALIGNMENT_TPU_TB") == "xla":
        from .nw_jax import _traceback_ops

        def one(p, Nt, No):
            return _traceback_ops(p, Nt, No, P=L + NoP)

        ops, k, xpt, ypt = jax.vmap(one)(packed, Nts, Nos)
    else:
        ops, k, xpt, ypt = traceback_ops_pallas_batched(
            packed, Nts, Nos, P=L + NoP, L=L, interpret=interpret)
    # ONE wire array per batch: downloads have a ~30 ms floor each on the
    # remote tunnel, so k/xpt/ypt ride in front of the 2-bit-packed op
    # streams (same scheme as the singleton _align_fused_pallas)
    B = ops.shape[0]
    P = L + NoP
    sh = 2 * jnp.arange(16, dtype=jnp.int32)
    ops16 = jnp.sum((ops.astype(jnp.int32) & 3).reshape(B, P // 16, 16) << sh,
                    axis=2, dtype=jnp.int32)
    hdr = jnp.stack([k, xpt, ypt], axis=1).astype(jnp.int32)
    return jnp.concatenate([hdr, ops16], axis=1)


def align_pairs_pallas(group_data, sc: Scoring, L: int, NoP: int,
                       interpret=False, chunk=None):
    """Batched same-bucket pair alignment on the Pallas kernel. group_data:
    list of (t_ext (L,), o_feed (steps,), Nt, No) already encoded by the
    caller (align_pairs_jax's bucketing). Returns (ops, k, xpt, ypt)
    numpy arrays with batch dim. ``chunk`` overrides the per-grid-step
    diagonal count (tests use a small chunk to exercise the G > 1
    multi-chunk carry on small problems)."""
    CHUNK = chunk or _chunk_for(L)
    D = L + NoP - 1
    G = (D + CHUNK - 1) // CHUNK
    B = len(group_data)
    t3 = np.zeros((B, L // LANE, LANE), np.int32)
    o3 = np.zeros((B, G * CHUNK), np.int32)
    Nts = np.zeros(B, np.int32)
    Nos = np.zeros(B, np.int32)
    for i, (t_ext, o_feed, Nt, No) in enumerate(group_data):
        t3[i] = t_ext.reshape(L // LANE, LANE)
        # caller pads o_feed to its own step multiple; entries past D are
        # never consumed, so trim/extend to this kernel's G*CHUNK
        n = min(len(o_feed), o3.shape[1])
        o3[i, :n] = o_feed[:n]
        Nts[i], Nos[i] = Nt, No
    match, mismatch = (int(v) for v in sc.match_mismatch)
    params = np.array(
        [match, mismatch,
         int(sc.gap_open_x) + int(sc.gap_extend_x),
         int(sc.gap_open_y) + int(sc.gap_extend_y),
         int(sc.gap_extend_x), int(sc.gap_extend_y), NoP, D], np.int32,
    )
    wire = np.asarray(_align_fused_pairs_pallas(
        jnp.asarray(t3), jnp.asarray(o3.reshape(B, G, CHUNK)),
        jnp.asarray(params), jnp.asarray(Nts), jnp.asarray(Nos),
        L=L, NoP=NoP, interpret=interpret, chunk=chunk,
    ))  # ONE download: (B, 3 + (L+NoP)/16) int32
    k, xpt, ypt = wire[:, 0], wire[:, 1], wire[:, 2]
    ops = (wire[:, 3:, None] >> (2 * np.arange(16, dtype=np.int32))) & 3
    return ops.reshape(B, -1), k, xpt, ypt


def _tb_statics(Dp: int, L: int):
    """Tile geometry for the hopping traceback: a (TH, TW) window of the
    diagonal-layout pointer tensor guarantees >= T_STEPS path steps before
    the cursor can leave it (d = i + j drops by at most 2 per step, i by at
    most 1). Window origins are chosen 8/128-aligned (Mosaic DMA tiling),
    which costs up to 8 rows / 128 lanes of look-back slack. (512, 384)
    balances DMA latency (~5 us/hop) against DMA bytes per path step
    (~780 B at this shape; the DMA path runs at ~50 GB/s effective) —
    a (1024, 512) tile measured no better (28% more bytes, half the
    hops)."""
    TH = min(512, Dp)          # Dp is a multiple of 32
    TW = min(L, 384)
    steps_d = (TH - 8) // 2
    steps_i = steps_d if TW >= L else min(steps_d, TW - LANE)
    return TH, TW, max(1, steps_i)


def _make_tb_kernel(Dp: int, L: int, P: int):
    TH, TW, T_STEPS = _tb_statics(Dp, L)

    def kernel(dims_ref, packed_hbm, ops_ref, fin_ref, tile, sem):
        """Tile-hopping pointer-walk (reference textSeqCompare.py:110-145,
        same op/count/final-cursor contract as nw_jax._traceback_ops),
        one grid instance per BATCH ROW — the batched paths (pair buckets,
        the per-pair-scoring grid search) walk B pointer tensors in one
        kernel launch instead of a ~7 µs/step lock-step XLA while_loop
        (which dominated the 2400^2 grid sweep) or B separate dispatches
        (which dominated the r3 sequential-hopping attempt).

        dims_ref:   SMEM (B, 2) int32 [Nt, No] per row
        packed_hbm: ANY (B, D, L) uint8 — stays in HBM; only (TH, TW)
                    windows around the cursor are DMA'd in
        ops_ref:    SMEM (B, P) int32 out, whole array (scalar stores;
                    the path positions are inherently sequential scalars
                    and Mosaic requires SMEM outputs unblocked)
        fin_ref:    SMEM (B, 4) int32 out [k, xpt, ypt, mpt] per row
        tile:       SMEM (TH, TW) uint8 scratch — the walk is a scalar
                    dependent chain, so the window lives in SCALAR memory
                    and each step is ONE scalar load (the earlier VMEM
                    tile paid a full (8, 128) masked vector
                    compare+select+reduce per step to extract one byte;
                    measured 3.9 -> 1.3 ms per 10-pair 2400^2 launch)
        sem:        DMA semaphore
        """
        bidx = pl.program_id(0)
        Nt = dims_ref[bidx, 0]
        No = dims_ref[bidx, 1]
        # no ops_ref zero-init: every consumer reads ops[:k] only
        # (replay_ops; the fused wire masks with & 3), and the init loop
        # cost P scalar stores per pair (~32k at the 16k^2 stress shape)

        def load_cell(r, c):
            # SMEM scalar load: dynamic scalar indices are native here
            # (VMEM requires 8/128-aligned dynamic slices, which forced a
            # masked vector extraction per step)
            return tile[r, c].astype(jnp.int32)

        def hop(st):
            xpt, ypt, mpt, k = st
            d = xpt + ypt
            # aligned window origin in (d - TH, d]: align-up from the
            # bottom keeps the cursor inside while satisfying DMA tiling
            d0 = jnp.minimum(jnp.maximum(((d - TH + 8) // 8) * 8, 0),
                             Dp - TH)
            i0 = jnp.minimum(
                jnp.maximum(((xpt - TW + LANE) // LANE) * LANE, 0), L - TW
            )
            d0 = pl.multiple_of(d0, 8)
            i0 = pl.multiple_of(i0, LANE)
            dma = pltpu.make_async_copy(
                packed_hbm.at[bidx, pl.ds(d0, TH), pl.ds(i0, TW)], tile,
                sem,
            )
            dma.start()
            dma.wait()

            def step(_, st2):
                xpt, ypt, mpt, k = st2
                d = xpt + ypt
                # no in_tile check: T_STEPS is derived so the cursor
                # CANNOT leave the window within the loop (d drops <= 2
                # and i <= 1 per step, and the origin slack bounds give
                # d - d0 >= TH - 8 - 2*T_STEPS >= 0, xpt - i0 >=
                # TW - LANE - T_STEPS >= 0); after termination the
                # cursor stops moving, so it stays in-window too
                active = (xpt > 0) & (ypt > 0)

                cell = load_cell(d - d0, xpt - i0)
                nxt = (cell >> (2 * mpt)) & 3

                # unconditional store: when inactive, k is frozen one
                # slot PAST the emitted ops, so this writes junk that
                # every consumer ignores (they read ops[:k]) — cheaper
                # than a predicated store on the scalar core
                ops_ref[bidx, k] = mpt

                dec_x = ((mpt != 2) & active).astype(jnp.int32)
                dec_y = ((mpt != 1) & active).astype(jnp.int32)
                xpt2 = xpt - dec_x
                ypt2 = ypt - dec_y
                mpt2 = jnp.where(active, nxt, mpt)
                k2 = k + active.astype(jnp.int32)
                return xpt2, ypt2, mpt2, k2

            # retire several path steps per loop iteration (same lever as
            # the fill's diagonal-retirement unroll: the walk is
            # loop-overhead-bound, not select-bound)
            U = 16

            def stepU(_, st2):
                for _u in range(U):
                    st2 = step(_u, st2)
                return st2

            return jax.lax.fori_loop(0, T_STEPS // U, stepU,
                                     (xpt, ypt, mpt, k))

        def cond(st):
            xpt, ypt, _, _ = st
            return (xpt > 0) & (ypt > 0)

        # first cell's mat pointer seeds the walk (aligned (8, 128) DMA)
        d_end = Nt - 1 + No - 1
        de = pl.multiple_of(
            jnp.minimum((d_end // 8) * 8, Dp - 8), 8
        )
        ie = pl.multiple_of(
            jnp.minimum(((Nt - 1) // LANE) * LANE, L - LANE), LANE
        )
        dma0 = pltpu.make_async_copy(
            packed_hbm.at[bidx, pl.ds(de, 8), pl.ds(ie, LANE)],
            tile.at[pl.ds(0, 8), pl.ds(0, LANE)], sem,
        )
        dma0.start()
        dma0.wait()
        mpt0 = load_cell(d_end - de, (Nt - 1) - ie) & 3

        xpt, ypt, mpt, k = jax.lax.while_loop(
            cond, hop, (Nt - 1, No - 1, mpt0, jnp.int32(0))
        )
        fin_ref[bidx, 0] = k
        fin_ref[bidx, 1] = xpt
        fin_ref[bidx, 2] = ypt
        fin_ref[bidx, 3] = mpt

    return kernel, TH, TW


def traceback_ops_pallas_batched(packed, Nts, Nos, P, L: int,
                                 interpret: bool = False):
    """Batched tile-hopping traceback: one grid instance per batch row of
    ``packed`` (B, D, L). Returns (ops int32 (B, P), k (B,), xpt (B,),
    ypt (B,)) — the same contract as a vmapped nw_jax._traceback_ops,
    which it replaces on the Pallas batched paths (the lock-step XLA
    walk pays ~7 µs per path step; the hopping walk amortizes one DMA
    over up to ~250 VMEM-local steps and retires 4 steps per loop
    iteration)."""
    B, D, _ = packed.shape
    # SMEM bound: the (B, P) int32 ops output lives whole in SMEM (scalar
    # stores) NEXT TO the (1024, 512) hop tile (512 KB), so cap each
    # launch at ~256 KB of ops and slice larger batches into consecutive
    # launches (the pointer tensors stay in HBM either way; only the
    # per-launch scalar outputs are bounded)
    TBB = max(1, (256 << 10) // (4 * P))
    if B > TBB:
        parts = [
            traceback_ops_pallas_batched(
                packed[b0 : b0 + TBB], Nts[b0 : b0 + TBB],
                Nos[b0 : b0 + TBB], P, L, interpret=interpret)
            for b0 in range(0, B, TBB)
        ]
        return tuple(jnp.concatenate([p[i] for p in parts], axis=0)
                     for i in range(4))
    Dp = ((D + 31) // 32) * 32
    if Dp != D:
        packed = jnp.concatenate(
            [packed, jnp.zeros((B, Dp - D, L), jnp.uint8)], axis=1
        )
    kernel, TH, TW = _make_tb_kernel(Dp, L, P)
    dims = jnp.stack([jnp.asarray(Nts, jnp.int32),
                      jnp.asarray(Nos, jnp.int32)], axis=1).reshape(B, 2)
    ops, fin = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, P), jnp.int32),
            jax.ShapeDtypeStruct((B, 4), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.SMEM((TH, TW), jnp.uint8),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(dims, packed)
    return ops, fin[:, 0], fin[:, 1], fin[:, 2]


def traceback_ops_pallas(packed, Nt, No, P, L: int,
                         interpret: bool = False):
    """Singleton tile-hopping traceback: same contract as
    nw_jax._traceback_ops (ops int32 (P,), k, xpt, ypt); the B = 1 case
    of :func:`traceback_ops_pallas_batched`."""
    ops, k, xpt, ypt = traceback_ops_pallas_batched(
        packed[None], jnp.asarray(Nt, jnp.int32)[None],
        jnp.asarray(No, jnp.int32)[None], P, L, interpret=interpret)
    return ops[0], k[0], xpt[0], ypt[0]


def supported(sc: Scoring) -> bool:
    """The Pallas fill covers the reference's standard scoring form:
    integer match/mismatch + affine gaps, with the parity boundary
    (strict=False boundary fixes route to the XLA scan engine)."""
    return (sc.match_mismatch is not None and sc.is_integral
            and sc.default_boundary)


def _token_ids(transcript, ocr):
    """Map token sequences to int32 ids. Only id EQUALITY feeds the fill
    (the match/mismatch test), so any injective mapping is exact; the
    all-single-char common case uses raw codepoints (one C-speed join
    instead of ~N dict lookups)."""
    if all(type(c) is str and len(c) == 1 for c in transcript) and all(
        type(c) is str and len(c) == 1 for c in ocr
    ):
        return (
            np.frombuffer("".join(transcript).encode("utf-32-le"),
                          np.uint32).astype(np.int32),
            np.frombuffer("".join(ocr).encode("utf-32-le"),
                          np.uint32).astype(np.int32),
        )
    vocab = sorted(set(transcript) | set(ocr))
    ids = {v: k for k, v in enumerate(vocab)}
    return (np.array([ids[c] for c in transcript], np.int32),
            np.array([ids[c] for c in ocr], np.int32))


def _prepare(transcript, ocr, sc: Scoring, chunk=None):
    Nt, No = len(transcript), len(ocr)
    t_ids, o_ids = _token_ids(transcript, ocr)

    L = _bucket(Nt)
    NoP = _bucket(No)
    D = L + NoP - 1
    CHUNK = chunk or _chunk_for(L)
    G = (D + CHUNK - 1) // CHUNK

    t_ext = np.zeros(L, np.int32)
    t_ext[1:Nt] = t_ids[: Nt - 1]
    o_feed = np.zeros(G * CHUNK, np.int32)
    o_feed[1:No] = o_ids[: No - 1]

    match, mismatch = (int(v) for v in sc.match_mismatch)
    params = np.array(
        [
            match,
            mismatch,
            int(sc.gap_open_x) + int(sc.gap_extend_x),
            int(sc.gap_open_y) + int(sc.gap_extend_y),
            int(sc.gap_extend_x),
            int(sc.gap_extend_y),
            NoP,
            D,
        ],
        np.int32,
    )
    return t_ext.reshape(L // LANE, LANE), o_feed, params, L, NoP


def fill_pallas_packed(transcript, ocr, sc: Scoring, interpret=False,
                       chunk=None):
    """Drop-in for nw_jax.fill_jax_packed on the Pallas path: returns packed
    pointers in diagonal layout (numpy uint8, (Nt + NoP buckets' D, L))."""
    t_ext2d, o_feed, params, L, NoP = _prepare(transcript, ocr, sc, chunk)
    packed = _fill_pallas(
        jnp.asarray(t_ext2d), jnp.asarray(o_feed), jnp.asarray(params),
        L=L, NoP=NoP, interpret=interpret, chunk=chunk,
    )
    return np.asarray(jax.device_get(packed))


@functools.partial(jax.jit, static_argnames=("L", "NoP", "interpret"))
def _align_fused_pallas(t_ext2d, o_feed, params, Nt, No, L, NoP,
                        interpret=False):
    packed = _fill_pallas(t_ext2d, o_feed, params, L=L, NoP=NoP,
                          interpret=interpret, keep_padding=True)
    P = L + NoP
    ops, k, xpt, ypt = traceback_ops_pallas(packed, Nt, No, P, L=L,
                                            interpret=interpret)
    # ONE wire transfer: downloads have a ~25 ms floor each on the remote
    # tunnel, so k/xpt/ypt ride in front of the op stream. Ops are 2-bit
    # codes — 16 of them ride per int32, so the 8k-pair wire is ~4 KB
    # instead of 64 KB (the download costs ~1 ms per 16 KB on top of the
    # floor).
    sh = 2 * jnp.arange(16, dtype=jnp.int32)
    # mask to 2 bits first: entries past the path length are uninitialized
    # scratch and must not bleed into neighbouring lanes
    ops16 = jnp.sum((ops & 3).reshape(P // 16, 16) << sh, axis=1,
                    dtype=jnp.int32)
    return jnp.concatenate(
        [jnp.stack([k, xpt, ypt]), ops16]
    )


def align_pallas_ops(transcript, ocr, sc: Scoring, interpret=False):
    """Fused Pallas fill + on-device traceback; same return contract as
    nw_jax.align_jax_ops (ops array, count, xpt, ypt)."""
    t_ext2d, o_feed, params, L, NoP = _prepare(transcript, ocr, sc)
    wire = np.asarray(_align_fused_pallas(
        jnp.asarray(t_ext2d), jnp.asarray(o_feed), jnp.asarray(params),
        jnp.asarray(len(transcript), jnp.int32),
        jnp.asarray(len(ocr), jnp.int32),
        L=L, NoP=NoP, interpret=interpret,
    ))
    ops = (wire[3:, None] >> (2 * np.arange(16, dtype=np.int32))) & 3
    return ops.reshape(-1), int(wire[0]), int(wire[1]), int(wire[2])


# pointer-tensor HBM budget for one grid-fill dispatch: each pair's packed
# pointers occupy G*CHUNK * L bytes on device until its traceback runs
_GRID_PTR_BUDGET = 768 << 20


def align_grid_pallas(transcript, ocr, params_list, interpret=False,
                      chunk=None):
    """Batched alignment of ONE (transcript, ocr) pair under MANY integer
    scoring systems on the pair-packed Pallas kernel (per-pair scoring
    params — the 729-combination grid search as lock-step wavefronts,
    SURVEY.md §7 step 7). Same contract as nw_jax.align_grid_jax: returns
    a list of (tra_align, ocr_align) per params row; sentinel appended
    here. Bit-identical to the host loop (tie-breaking shared with the
    singleton kernel; parity pinned in tests)."""
    from .nw_jax import replay_ops

    transcript = list(transcript) + [" "]
    ocr = list(ocr) + [" "]
    Nt, No = len(transcript), len(ocr)
    t_ids, o_ids = _token_ids(transcript, ocr)

    L = _bucket(Nt)
    NoP = _bucket(No)
    D = L + NoP - 1
    CHUNK = chunk or _chunk_for(L)
    G = (D + CHUNK - 1) // CHUNK

    t_ext = np.zeros(L, np.int32)
    t_ext[1:Nt] = t_ids[: Nt - 1]
    o_feed = np.zeros(G * CHUNK, np.int32)
    o_feed[1:No] = o_ids[: No - 1]

    p6 = np.asarray(params_list, np.int32)
    assert p6.shape[1] == 6
    B = len(p6)
    # 6-form [match, mismatch, gox, goy, gex, gey] -> kernel rows
    # [match, mismatch, gox+gex, goy+gey, gex, gey, NoP, D]
    rows = np.empty((B, 8), np.int32)
    rows[:, 0] = p6[:, 0]
    rows[:, 1] = p6[:, 1]
    rows[:, 2] = p6[:, 2] + p6[:, 4]
    rows[:, 3] = p6[:, 3] + p6[:, 5]
    rows[:, 4] = p6[:, 4]
    rows[:, 5] = p6[:, 5]
    rows[:, 6] = NoP
    rows[:, 7] = D

    # chunk the combination axis: the resident pointer tensors must stay
    # within the HBM budget. The ocr feed is passed ONCE (shared_feed=True
    # — every combination aligns the same pair), so the former SMEM cap on
    # the per-dispatch count (10 pairs at the 2400^2 stress size) is gone;
    # at that size the HBM budget now allows 40 pairs/dispatch (73 -> 19
    # dispatches for the 729-combination sweep). P-pair groups inside
    # _fill_pallas_batched pad the tail chunk with copies of row 0
    # (discarded).
    per_pair_bytes = G * CHUNK * L
    bc = max(1, min(128, _GRID_PTR_BUDGET // max(1, per_pair_bytes)))
    P = _pack_P(L // LANE)
    bc = max(P, (bc // P) * P)
    bc = min(bc, ((B + P - 1) // P) * P)  # don't pad past the grid size

    t3_c = np.broadcast_to(t_ext.reshape(1, L // LANE, LANE),
                           (bc, L // LANE, LANE))
    o3_c = o_feed.reshape(1, G, CHUNK)
    Nts = np.full(bc, Nt, np.int32)
    Nos = np.full(bc, No, np.int32)

    # dispatch every chunk before materializing any (async jax dispatch):
    # the per-dispatch round trip rides the tunnel while earlier chunks'
    # wires download / replay on host
    t3_j, o3_j = jnp.asarray(t3_c), jnp.asarray(o3_c)
    Nts_j, Nos_j = jnp.asarray(Nts), jnp.asarray(Nos)
    wires = []
    counts = []
    for c0 in range(0, B, bc):
        pr = rows[c0 : c0 + bc]
        n = len(pr)
        if n < bc:  # keep one compiled shape: pad the tail chunk
            pr = np.concatenate([pr, np.repeat(pr[:1], bc - n, axis=0)])
        wires.append(_align_fused_pairs_pallas(
            t3_j, o3_j, jnp.asarray(pr), Nts_j, Nos_j,
            L=L, NoP=NoP, interpret=interpret, chunk=chunk, per_pair=True,
            shared_feed=True,
        ))
        counts.append(n)
    results = []
    for wire_j, n in zip(wires, counts):
        wire = np.asarray(wire_j)
        k, xpt, ypt = wire[:, 0], wire[:, 1], wire[:, 2]
        ops = (wire[:, 3:, None] >> (2 * np.arange(16, dtype=np.int32))) & 3
        ops = ops.reshape(bc, -1)
        for b in range(n):
            results.append(
                replay_ops(transcript, ocr, ops[b], int(k[b]), int(xpt[b]),
                           int(ypt[b]))
            )
    return results
