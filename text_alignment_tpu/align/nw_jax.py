"""Anti-diagonal wavefront NW fill on the JAX default device (TPU).

The Gotoh recurrence only depends on diagonals d-1 and d-2, so the fill is a
``lax.scan`` over anti-diagonals with all lanes of a diagonal updated in one
vector step — the TPU-native replacement for the reference's O(N·M) Python
loop (textSeqCompare.py:62-88). Pointers for all three matrices are packed
2 bits each into one uint8 per cell, emitted in diagonal layout
``packed[i + j, i]``, and streamed back for the O(N+M) host traceback.

Exactness: integer scoring systems run in int32 and match the float64
reference bit-for-bit (all finite scores are small integers; the reference's
-1e100 boundary only ever loses comparisons, which -2^30 also does — it can
never accumulate because a finite candidate always exists). Float scoring
runs in float32.

Sequence elements are mapped to ids over the joint alphabet, and the scoring
callable is materialized into a substitution matrix — so even custom
``match_func`` scoring systems (textSeqCompare.py:27-29) run on device.

Shapes are bucketed to powers of two (min 128) so repeated calls hit the jit
cache; gap parameters and the substitution matrix are traced arguments, so a
729-combo grid search reuses one compilation.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from .scoring import Scoring, BOUNDARY_GAP_EXTEND

_INT_NEG = -(2**30)
_FLT_NEG = -1e30
_S_PAD = 32  # substitution-matrix dims padded to multiples of this


def _bucket(n: int) -> int:
    b = 128
    while b < n:
        b *= 2
    return b


@functools.partial(jax.jit, static_argnames=("L", "NoP", "is_int"))
def _fill_scan(t_ext, o_rev_ext, S, gox, goy, gex, gey, L, NoP, is_int):
    dtype = jnp.int32 if is_int else jnp.float32
    NEG = jnp.asarray(_INT_NEG if is_int else _FLT_NEG, dtype)
    BGE = jnp.asarray(BOUNDARY_GAP_EXTEND, dtype)

    D = L + NoP - 1
    lane_i = jnp.arange(L, dtype=jnp.int32)

    def shift(v):
        return jnp.concatenate([jnp.full((1,), NEG, dtype), v[:-1]])

    goy_gey = (goy + gey).astype(dtype)
    gox_gex = (gox + gex).astype(dtype)
    gex_ = gex.astype(dtype)
    gey_ = gey.astype(dtype)

    def body(carry, d):
        m2, x2, y2, m1, x1, y1 = carry
        j = d - lane_i

        o_lane = jax.lax.dynamic_slice(o_rev_ext, (NoP - 1 - d + L,), (L,))
        s = S[t_ext, o_lane].astype(dtype)

        m2s, x2s, y2s = shift(m2), shift(x2), shift(y2)
        m1s, x1s, y1s = shift(m1), shift(x1), shift(y1)

        # mat: predecessors at (i-1, j-1) on diagonal d-2
        mc = jnp.stack([m2s, x2s, y2s])
        m_int = jnp.max(mc, axis=0) + s
        mp = jnp.argmax(mc, axis=0).astype(jnp.uint8)

        # y (horizontal gap): predecessors at (i, j-1) on diagonal d-1
        yc = jnp.stack([m1 + goy_gey, x1 + goy_gey, y1 + gey_])
        y_int = jnp.max(yc, axis=0)
        yp = jnp.argmax(yc, axis=0).astype(jnp.uint8)

        # x (vertical gap): predecessors at (i-1, j) on diagonal d-1
        xc = jnp.stack([m1s + gox_gex, x1s + gex_, y1s + gox_gex])
        x_int = jnp.max(xc, axis=0)
        xp = jnp.argmax(xc, axis=0).astype(jnp.uint8)

        # boundary conditions (reference quirks preserved: global -1 gap
        # extend on row/col 0; y[0][j] = -inf including (0,0), x[0][j]
        # finite including (0,0) — textSeqCompare.py:53-60 overwrite order)
        row0 = lane_i == 0
        col0 = (j == 0) & (lane_i > 0)
        invalid = (j < 0) | (j >= NoP)

        jd = j.astype(dtype)
        idd = lane_i.astype(dtype)

        m_v = jnp.where(row0, BGE * jd, jnp.where(col0, BGE * idd, m_int))
        x_v = jnp.where(row0, BGE * jd, jnp.where(col0, NEG, x_int))
        y_v = jnp.where(row0, NEG, jnp.where(col0, BGE * idd, y_int))

        m_v = jnp.where(invalid, NEG, m_v)
        x_v = jnp.where(invalid, NEG, x_v)
        y_v = jnp.where(invalid, NEG, y_v)

        packed = mp | (xp << 2) | (yp << 4)
        return (m1, x1, y1, m_v, x_v, y_v), packed

    init = tuple(jnp.full((L,), NEG, dtype) for _ in range(6))
    _, packed = jax.lax.scan(body, init, jnp.arange(D, dtype=jnp.int32))
    return packed


def _encode(transcript, ocr, sc: Scoring):
    """Map elements to ids and materialize the substitution matrix."""
    vocab = sorted(set(transcript) | set(ocr))
    ids = {v: k for k, v in enumerate(vocab)}
    A = len(vocab)
    Ap = ((A + _S_PAD - 1) // _S_PAD) * _S_PAD

    is_int = sc.is_integral
    if sc.match_mismatch is not None:
        match, mismatch = sc.match_mismatch
        S = np.full((Ap, Ap), mismatch)
        np.fill_diagonal(S[:A, :A], match)
        if is_int:
            S = S.astype(np.int32)
    else:
        S = np.zeros((Ap, Ap))
        for a, va in enumerate(vocab):
            for b, vb in enumerate(vocab):
                S[a, b] = sc.score(va, vb)
        is_int = is_int and float(S.sum()) == int(S.sum()) and np.all(S == S.astype(np.int64))
        if is_int:
            S = S.astype(np.int32)
    S = S.astype(np.int32 if is_int else np.float32)

    t_ids = np.array([ids[c] for c in transcript], dtype=np.int32)
    o_ids = np.array([ids[c] for c in ocr], dtype=np.int32)
    return t_ids, o_ids, S, is_int


def fill_jax_packed(transcript, ocr, sc: Scoring):
    """Fill the DP matrices on device; return packed pointers in diagonal
    layout (numpy uint8, shape (L + NoP - 1, L)) for ``DiagPtrView``.

    ``transcript`` / ``ocr`` include the appended sentinel; matrix dims are
    (Nt, No) = (len(transcript), len(ocr)).
    """
    Nt, No = len(transcript), len(ocr)
    t_ids, o_ids, S, is_int = _encode(transcript, ocr, sc)

    L = _bucket(Nt)        # lanes cover i = 0..Nt-1 (t index i-1)
    NoP = _bucket(No)

    t_ext = np.zeros(L, dtype=np.int32)
    t_ext[1:Nt] = t_ids[: Nt - 1]

    o_pad = np.zeros(NoP - 1, dtype=np.int32)
    o_pad[: No - 1] = o_ids[: No - 1]
    o_rev_ext = np.concatenate(
        [np.zeros(L, np.int32), o_pad[::-1], np.zeros(L, np.int32)]
    )

    dt = jnp.int32 if is_int else jnp.float32
    packed = _fill_scan(
        jnp.asarray(t_ext),
        jnp.asarray(o_rev_ext),
        jnp.asarray(S),
        jnp.asarray(sc.gap_open_x, dt),
        jnp.asarray(sc.gap_open_y, dt),
        jnp.asarray(sc.gap_extend_x, dt),
        jnp.asarray(sc.gap_extend_y, dt),
        L=L,
        NoP=NoP,
        is_int=is_int,
    )
    return np.asarray(jax.device_get(packed))
