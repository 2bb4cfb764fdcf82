"""Scan-line union-find connected components as a Pallas TPU kernel.

The XLA run-graph CC (ops.cc_runs) is compile-tractable but execution-
bound on irregular memory ops: XLA lowers its gathers/scatters to
near-serial code (~404 ms per label_runs pass, ~1.57 s for the 3-pass
preproc_clean on a 2000x1600 bench page — docs/DESIGN.md "What the TPU
can't do fast"). This module is the recorded alternative (SURVEY §7 hard
part #1): a hand-written Mosaic kernel that keeps the run tables in SMEM
and walks them on the SCALAR UNIT, where a dependent load costs ~5 ns
and a union-find step ~17 ns (measured v5e, round 5) — the classic
single-pass scan-line CC algorithm, executed where branch-heavy pointer
chasing is actually fast:

  phase E (one sweep over the page): DMA row blocks into SMEM, decode
    maximal black (or, inverted, white) runs with a scalar cursor,
    append to the run table, and 8-connect each run against the previous
    row's runs with a two-pointer walk + union-by-min-index with path
    halving; per-component area and row-span accumulate at the roots
    during union (no separate stats pass).
  phase K: re-walk the table per row, evaluate the filter predicate at
    each run's root, and paint kept runs into an SMEM row-block buffer
    (word-masked RMW), DMA'd to the output page.

Exactness: scan-line union-find IS connected components — there is no
iteration budget and no convergence certificate to check (the XLA
kernel's fixpoint machinery exists because label propagation is
budgeted; this one is exact by construction). The only failure mode is
table overflow (> max_runs), reported via ok=False for the caller's
host fallback — never silently wrong.

Semantics match ops.cc_runs / ops.oracle bit-for-bit (tested):
despeckle (Gamera despeckle, textAlignPreprocessing.py:166-171),
despeckle_white, remove_tall_ccs (the nrows-as-area quirk,
textAlignPreprocessing.py:174-178; by_area=True = strict=False mode),
preproc_clean, and the separator-masked compact CC table of program B
(textAlignPreprocessing.py:217-235).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# default run-table capacity: 16 bytes/run of SMEM across the four
# tables; 45056 runs = 704 KB, inside the ~0.75 MB usable SMEM measured
# on v5e (a 2000x1600 text page has ~39k black / ~41k white runs)
MAX_RUNS = 45056
_BLK = 64  # rows per DMA block (SMEM buffer budget)

# filter modes (runtime scalar)
_MODE_BLACK = 0   # remove black CCs with area <= thresh (despeckle)
_MODE_WHITE = 1   # fill white CCs with area <= thresh (despeckle_white)
_MODE_TALL = 2    # remove black CCs with measure > thresh


def _u(x):
    return x.astype(jnp.uint32)


def _ctz32(w):
    """Count trailing zeros of a nonzero uint32 (5-step binary search —
    all scalar ALU, no lookup table)."""
    tz = jnp.uint32(0)
    for k in (16, 8, 4, 2, 1):
        m = (w & ((jnp.uint32(1) << k) - jnp.uint32(1))) == 0
        tz = tz + jnp.where(m, jnp.uint32(k), jnp.uint32(0))
        w = jnp.where(m, w >> k, w)
    return tz


def _ctz_f(v):
    """Count trailing zeros of a nonzero uint32 via the float-exponent
    trick (5 scalar ops vs the 15-op binary search): isolate the lowest
    set bit, convert to f32 (every isolated bit is a power of two, so
    the conversion is exact; Mosaic lacks u32->f32, so convert through
    i32 — bit 31 becomes -2^31 whose exponent field still reads 158),
    read the exponent."""
    lsb = (v & (jnp.uint32(0) - v)).astype(jnp.int32)
    f = lsb.astype(jnp.float32)
    bits = jax.lax.bitcast_convert_type(f, jnp.int32)
    return ((bits >> 23) & 0xFF) - 127


def _make_filter_kernel(Hp: int, Wq: int, WqP: int, R: int,
                        table: int = 0):
    """One filter pass: (combined start|end event masks) -> filtered page.

    The VPU prelude (:func:`_event_masks`, plain XLA in the same jit)
    computes per-word run START and END bit masks for the working
    polarity — concatenated into ONE (Hp, 2*WqP) array so each row block
    arrives in a single DMA (each DMA round trip measured ~100 us on
    this runtime; they dominate the fixed cost) — so the scalar decode
    is a pure EVENT walk: empty words skip in a couple of ops, and each
    event is one lowest-set-bit extract + clear. Runs never survive a
    row (the end mask closes at the last valid column), so the only
    decode state across words is (in_run, x0).

    meta (SMEM (8,) i32): [H, W, thresh, mode, by_area, dbg, 0, 0]
    cmask (ANY (Hp, 2*WqP) i32), out (ANY (Hp, WqP) i32; WqP = Wq padded
    to a 128 multiple — Mosaic DMA slices must be 128-lane aligned), ok
    (SMEM (2,) i32); scratch: x01, parent, area, yspan (SMEM (R,) i32),
    rowptr (SMEM (Hp + 1,) i32), cmbuf (SMEM (_BLK, 2*WqP) i32), outbuf
    (SMEM (_BLK, WqP) i32), 2 DMA sems. The kernel paints kept runs on a
    zero base; despeckle_white's OR with the input happens in the
    wrapper.

    ``table`` (static) > 0 switches the kernel to the program-B shape
    (textAlignPreprocessing.py:217-235): no painted page — instead a
    compact per-component stats table ((table, 5) i32 rows
    (rmin, rmax, cmin, cmax, area) in scan order of component roots,
    filtered by area > thresh) plus count in ok[1]; an extra xspan
    scratch accumulates cmin/cmax at the roots.
    """
    NBLK = Hp // _BLK

    def kernel(meta, cmask, out, ok, x01, parent,
               area, yspan, rowptr, cmbuf, outbuf, sem_in, sem_out,
               xspan=None):
        ALL1 = jnp.uint32(0xFFFFFFFF)
        H = meta[0]
        W = meta[1]
        thresh = meta[2]
        mode = meta[3]
        by_area = meta[4]
        dbg = meta[5]  # 1: skip phase K paint (phase-E profiling)

        def find(a, st):
            # path halving; parent entries only ever decrease
            def cond(s):
                a2, _ = s
                return parent[a2] != a2

            def body(s):
                a2, _ = s
                p = parent[a2]
                g = parent[p]
                parent[a2] = g
                return g, 0

            a2, _ = jax.lax.while_loop(cond, body, (a, 0))
            return a2

        def union(a, b):
            ra = find(a, None)
            rb = find(b, None)

            @pl.when(ra != rb)
            def _():
                lo = jnp.minimum(ra, rb)
                hi = jnp.maximum(ra, rb)
                parent[hi] = lo
                area[lo] = area[lo] + area[hi]
                ya = _u(yspan[lo])
                yb = _u(yspan[hi])
                ymin = jnp.minimum(ya >> 16, yb >> 16)
                ymax = jnp.maximum(ya & jnp.uint32(0xFFFF),
                                   yb & jnp.uint32(0xFFFF))
                yspan[lo] = ((ymin << 16) | ymax).astype(jnp.int32)
                if table:
                    xa = _u(xspan[lo])
                    xb = _u(xspan[hi])
                    xmin = jnp.minimum(xa >> 16, xb >> 16)
                    xmax = jnp.maximum(xa & jnp.uint32(0xFFFF),
                                       xb & jnp.uint32(0xFFFF))
                    xspan[lo] = ((xmin << 16) | xmax).astype(jnp.int32)

        # ---------------- phase E: decode + union ----------------
        ok[0] = 1

        def block_e(yb, carry):
            dma = pltpu.make_async_copy(
                cmask.at[pl.ds(yb * _BLK, _BLK), :], cmbuf, sem_in)
            dma.start()
            dma.wait()
            return jax.lax.fori_loop(
                0, _BLK, lambda dy, c: row_e(yb * _BLK + dy, dy, c), carry)

        def row_e(y, dy, rcarry):
            n1, pbeg_raw, pend_raw = rcarry
            # overflowed tables (ok=0, output discarded) must still
            # never index past R
            pbeg = jnp.minimum(pbeg_raw, R)
            pend = jnp.minimum(pend_raw, R)

            def close_run(x0, x1, n2, j):
                # append + two-pointer union vs previous row
                i = n2

                @pl.when(n2 < R)
                def _():
                    x01[i] = ((x0 << 16) | x1).astype(jnp.int32)
                    parent[i] = i
                    area[i] = x1 - x0 + 1
                    yspan[i] = ((_u(y) << 16) | _u(y)).astype(jnp.int32)
                    if table:
                        xspan[i] = ((x0 << 16) | x1).astype(jnp.int32)

                @pl.when(n2 >= R)
                def _():
                    ok[0] = 0

                # advance j past prev runs ending left of x0 - 1
                def jcond(jj):
                    return (jj < pend) & (
                        (_u(x01[jj]) & jnp.uint32(0xFFFF)).astype(
                            jnp.int32) < x0 - 1)

                j2 = jax.lax.while_loop(jcond, lambda jj: jj + 1, j)

                # link every prev run starting at or left of x1 + 1
                def lcond(jj):
                    return (jj < pend) & (
                        (_u(x01[jj]) >> 16).astype(jnp.int32) <= x1 + 1)

                def lbody(jj):
                    @pl.when(n2 < R)
                    def _():
                        union(i, jj)
                    return jj + 1

                jax.lax.while_loop(lcond, lbody, j2)
                return n2 + 1, j2

            def word_e(k, wcarry):
                in_run, x0, n2, j = wcarry
                sm = _u(cmbuf[dy, k])
                em = _u(cmbuf[dy, WqP + k])

                def events(_):
                    # alternate start/end events in ascending bit
                    # order; state (sm, em, in_run, x0, n, j)
                    def econd(st):
                        sm2, em2, ir, _x0, _n, _j = st
                        return jnp.where(ir == 1, em2 != 0, sm2 != 0)

                    def ebody(st):
                        sm2, em2, ir, x0b, nb, jb = st

                        def do_end(_):
                            b = _ctz32(em2).astype(jnp.int32)
                            n3, j3 = close_run(x0b, 32 * k + b, nb, jb)
                            return (sm2, em2 & (em2 - 1),
                                    jnp.int32(0), x0b, n3, j3)

                        def do_start(_):
                            b = _ctz32(sm2).astype(jnp.int32)
                            return (sm2 & (sm2 - 1), em2,
                                    jnp.int32(1), 32 * k + b, nb, jb)

                        return jax.lax.cond(ir == 1, do_end, do_start, 0)

                    return jax.lax.while_loop(
                        econd, ebody, (sm, em, in_run, x0, n2, j))[2:]

                def skip(_):
                    return in_run, x0, n2, j

                # fast path: no events in this word
                return jax.lax.cond((sm | em) != 0, events, skip, 0)

            _ir, _x0, n3, _j = jax.lax.fori_loop(
                0, Wq, word_e,
                (jnp.int32(0), jnp.int32(0), n1, pbeg))
            rowptr[y + 1] = n3
            return n3, n1, n3  # new prev row = [n1, n3)

        rowptr[0] = 0
        n_final, _, _ = jax.lax.fori_loop(
            0, NBLK, block_e, (jnp.int32(0), jnp.int32(0), jnp.int32(0)))
        ok[1] = n_final

        # ---------------- phase K: keep + paint ----------------
        def keep_of(i):
            r = find(i, None)
            a = area[r]
            ys = _u(yspan[r])
            nrows = ((ys & jnp.uint32(0xFFFF)) - (ys >> 16)).astype(
                jnp.int32) + 1
            meas = jnp.where(by_area == 1, a, nrows)
            return jnp.where(
                mode == _MODE_BLACK, a > thresh,
                jnp.where(mode == _MODE_WHITE, a <= thresh,
                          meas <= thresh))

        def paint_run(dy, x0, x1):
            k0 = x0 >> 5
            k1 = x1 >> 5
            m0 = ALL1 << _u(x0 & 31)
            m1 = ALL1 >> _u(31 - (x1 & 31))

            def one_word(_):
                outbuf[dy, k0] = (
                    _u(outbuf[dy, k0]) | (m0 & m1)).astype(jnp.int32)
                return 0

            def multi_word(_):
                outbuf[dy, k0] = (_u(outbuf[dy, k0]) | m0).astype(jnp.int32)

                def mid(kk):
                    outbuf[dy, kk] = jnp.int32(-1)
                    return kk + 1

                jax.lax.while_loop(lambda kk: kk < k1, mid, k0 + 1)
                outbuf[dy, k1] = (_u(outbuf[dy, k1]) | m1).astype(jnp.int32)
                return 0

            jax.lax.cond(k0 == k1, one_word, multi_word, 0)

        # the kernel paints KEPT runs onto a zero base; despeckle_white's
        # final OR with the input happens in the wrapper (one vector op —
        # scalar stores can't target VMEM, so the paint rides SMEM blocks
        # flushed by per-block DMAs)
        def block_k(yb, _):
            def zrow(dy, _a):
                def zw(k, _b):
                    outbuf[dy, k] = 0
                    return 0
                jax.lax.fori_loop(0, Wq, zw, 0)
                return 0

            jax.lax.fori_loop(0, _BLK, zrow, 0)

            def row_k(dy, _a):
                y = yb * _BLK + dy
                # clamp to R: on table overflow (ok=0, output discarded
                # by the caller) the loop must still never index past
                # the SMEM tables
                i0 = jnp.minimum(rowptr[y], R)      # rowptr[0] == 0
                i1 = jnp.minimum(rowptr[y + 1], R)  # rows >= H: i0 == i1

                def prun(i, _b):
                    @pl.when(keep_of(i))
                    def _():
                        v = _u(x01[i])
                        paint_run(dy, (v >> 16).astype(jnp.int32),
                                  (v & jnp.uint32(0xFFFF)).astype(jnp.int32))
                    return 0

                jax.lax.fori_loop(i0, i1, prun, 0)
                return 0

            jax.lax.fori_loop(0, _BLK, row_k, 0)
            dma_o = pltpu.make_async_copy(
                outbuf, out.at[pl.ds(yb * _BLK, _BLK), :], sem_out)
            dma_o.start()
            dma_o.wait()
            return 0

        if table:
            # ------- table emission (program-B shape, no paint) -------
            # scan-order roots (union-by-min-index keeps each root at
            # its component's minimum run index) with area > thresh
            # out is FLAT (table * 5,): a 2-D (table, 5) SMEM array
            # pads its minor dim to 128 lanes (measured: 1.05 MB for
            # 2048 rows — it alone blew the 1 MB SMEM budget)
            def emit(i, slot):
                def do(sl):
                    @pl.when(sl < table)
                    def _():
                        ys = _u(yspan[i])
                        xs = _u(xspan[i])
                        b = sl * 5
                        out[b + 0] = (ys >> 16).astype(jnp.int32)
                        out[b + 1] = (ys & jnp.uint32(0xFFFF)).astype(
                            jnp.int32)
                        out[b + 2] = (xs >> 16).astype(jnp.int32)
                        out[b + 3] = (xs & jnp.uint32(0xFFFF)).astype(
                            jnp.int32)
                        out[b + 4] = area[i]
                    return sl + 1

                return jax.lax.cond(
                    (parent[i] == i) & (area[i] > thresh), do,
                    lambda sl: sl, slot)

            nn = jnp.minimum(ok[1], R)
            count = jax.lax.fori_loop(0, nn, emit, jnp.int32(0))

            @pl.when(count > table)
            def _():
                ok[0] = 0

            ok[1] = jnp.minimum(count, table)
        else:
            # rows beyond H never had rowptr written in phase E if
            # H < Hp — phase E writes rowptr[y+1] for every y < Hp
            # (padded rows append nothing), so rowptr is total. Paint
            # only valid when ok.
            @pl.when(dbg != 1)
            def _():
                jax.lax.fori_loop(0, NBLK, block_k, 0)

    return kernel


def _event_masks(page, H, W, mode):
    """VPU prelude: per-word run START / END bit masks of the working
    polarity (black, or inverted for despeckle_white), with column- and
    row-validity applied so the scalar kernel never sees out-of-page
    bits. A run starts at bit b iff it is set and its left neighbor
    (crossing word boundaries) is not; ends symmetrically."""
    w = page.astype(jnp.uint32)
    Hp, WqP = w.shape
    ALL1 = jnp.uint32(0xFFFFFFFF)
    idx = jnp.arange(WqP, dtype=jnp.int32)
    rem = jnp.clip(W - 32 * idx, 0, 32)
    vm = jnp.where(
        rem >= 32, ALL1,
        (jnp.uint32(1) << _u(jnp.minimum(rem, 31))) - jnp.uint32(1))
    rowv = jnp.arange(Hp, dtype=jnp.int32)[:, None] < H
    wv = jnp.where(mode == _MODE_WHITE, ~w, w)
    wv = jnp.where(rowv, wv & vm[None, :], jnp.uint32(0))
    z = jnp.zeros((Hp, 1), jnp.uint32)
    prev_hi = jnp.concatenate([z, wv[:, :-1] >> 31], axis=1)
    left = (wv << 1) | prev_hi
    nxt_lo = jnp.concatenate([wv[:, 1:] << 31, z], axis=1)
    right = (wv >> 1) | nxt_lo
    s = wv & ~left
    e = wv & ~right
    # per-row event word span: the scalar word loop visits only
    # [kmin, kmax] (blank rows — margins, interline bands — skip
    # entirely: kmin = WqP, kmax = -1)
    # one combined array: [starts | ends] per row -> one DMA per block
    return jnp.concatenate([s, e], axis=1).astype(jnp.int32)


@jax.jit
def _or_pages(a, b):
    return a | b


@functools.lru_cache(maxsize=None)
def _jit_filter(Hp: int, Wq: int, WqP: int, R: int, interpret: bool):
    kernel = _make_filter_kernel(Hp, Wq, WqP, R)

    def run(meta, page):
        cm = _event_masks(page, meta[0], meta[1], meta[3])
        out, ok = pl.pallas_call(
            kernel,
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                # VMEM, explicitly: ANY/HBM let the compiler place a
                # ~1 MB mask array in SMEM on smaller pages, blowing its
                # 1 MB budget; VMEM block DMAs are also faster
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((Hp, WqP), jnp.int32),
                jax.ShapeDtypeStruct((2,), jnp.int32),
            ),
            scratch_shapes=[
                pltpu.SMEM((R,), jnp.int32),       # x01
                pltpu.SMEM((R,), jnp.int32),       # parent
                pltpu.SMEM((R,), jnp.int32),       # area
                pltpu.SMEM((R,), jnp.int32),       # yspan
                pltpu.SMEM((Hp + 1,), jnp.int32),  # rowptr
                pltpu.SMEM((_BLK, 2 * WqP), jnp.int32),  # cmbuf
                pltpu.SMEM((_BLK, WqP), jnp.int32),      # outbuf
                pltpu.SemaphoreType.DMA,
                pltpu.SemaphoreType.DMA,
            ],
            interpret=interpret,
        )(meta, cm)
        return out, ok

    return jax.jit(run)


def pack_page(img: np.ndarray) -> np.ndarray:
    """bool (H, W) -> (H, ceil(W/32)) int32, bit b = column 32k + b."""
    H, W = img.shape
    Wq = -(-W // 32)
    padded = np.zeros((H, Wq * 32), np.uint8)
    padded[:, :W] = img
    u = np.packbits(padded.reshape(H, Wq, 4, 8), axis=-1,
                    bitorder="little")
    return u.reshape(H, Wq * 4).view(np.uint32).astype(np.int32).reshape(
        H, Wq)


def unpack_page(packed: np.ndarray, H: int, W: int) -> np.ndarray:
    u = np.ascontiguousarray(
        np.asarray(packed).astype(np.uint32)).view(np.uint8)
    bits = np.unpackbits(u.reshape(H, -1), axis=1, bitorder="little")
    return bits[:H, :W] != 0


def _run_filter(page_packed, H: int, W: int, thresh, mode: int,
                by_area: bool = False, max_runs: int = MAX_RUNS,
                interpret: bool | None = None):
    """Device entry: packed (H, Wq) int32 page -> (filtered packed page,
    ok bool, n_runs). Pads rows to a _BLK multiple (padded rows decode to
    nothing in either polarity: the word transform zeroes y >= H)."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    Hq, Wq = page_packed.shape
    assert Hq == H
    assert W <= Wq * 32 and W < (1 << 15), (W, Wq)
    Hp = -(-H // _BLK) * _BLK
    WqP = -(-Wq // 128) * 128  # Mosaic DMA slices need 128-lane alignment
    if Hp != H or WqP != Wq:
        page_packed = jnp.pad(page_packed,
                              ((0, Hp - H), (0, WqP - Wq)))
    import os
    dbg = int(os.environ.get("TEXT_ALIGNMENT_TPU_CCP_DEBUG", "0"))
    # thresh may be a traced scalar (callers embedding this inside their
    # own jit, e.g. the device-raster program A)
    meta = jnp.stack([
        jnp.int32(H), jnp.int32(W), jnp.asarray(thresh, jnp.int32),
        jnp.int32(mode), jnp.int32(int(by_area)), jnp.int32(dbg),
        jnp.int32(0), jnp.int32(0)])
    fn = _jit_filter(Hp, Wq, WqP, int(max_runs), bool(interpret))
    out, ok = fn(meta, page_packed)
    if mode == _MODE_WHITE:
        # kernel painted the small white components on a zero base;
        # compose with the input (vector op — same jit cache via lambda)
        out = _or_pages(page_packed, out)
    return out[:H, :Wq], ok[0] == 1, ok[1]


@functools.lru_cache(maxsize=None)
def _jit_table(Hp: int, Wq: int, WqP: int, R: int, MAXC: int,
               interpret: bool):
    kernel = _make_filter_kernel(Hp, Wq, WqP, R, table=MAXC)

    def run(meta, page):
        cm = _event_masks(page, meta[0], meta[1], meta[3])
        tab, ok = pl.pallas_call(
            kernel,
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                # VMEM, explicitly: ANY/HBM let the compiler place a
                # ~1 MB mask array in SMEM on smaller pages, blowing its
                # 1 MB budget
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((MAXC * 5,), jnp.int32),
                jax.ShapeDtypeStruct((2,), jnp.int32),
            ),
            scratch_shapes=[
                pltpu.SMEM((R,), jnp.int32),       # x01
                pltpu.SMEM((R,), jnp.int32),       # parent
                pltpu.SMEM((R,), jnp.int32),       # area
                pltpu.SMEM((R,), jnp.int32),       # yspan
                pltpu.SMEM((Hp + 1,), jnp.int32),  # rowptr
                pltpu.SMEM((_BLK, 2 * WqP), jnp.int32),  # cmbuf
                pltpu.SMEM((8, WqP), jnp.int32),   # outbuf (unused)
                pltpu.SemaphoreType.DMA,
                pltpu.SemaphoreType.DMA,
                pltpu.SMEM((R,), jnp.int32),       # xspan
            ],
            interpret=interpret,
        )(meta, cm)
        return tab.reshape(MAXC, 5), ok

    return jax.jit(run)


# table-kernel run budget: five R-sized SMEM tables instead of four
TABLE_MAX_RUNS = 30720


def cc_table_packed(page_packed, H: int, W: int, min_area_keep=None,
                    max_ccs: int = 2048, max_runs: int = TABLE_MAX_RUNS,
                    interpret: bool | None = None):
    """Program-B stats table from a DEVICE-RESIDENT packed page (already
    separator-masked by the caller): (table (max_ccs, 5) i32 rows
    (rmin, rmax, cmin, cmax, area) in scan order, count, ok) — the
    cc_runs.cc_table_compact contract (textAlignPreprocessing.py:
    217-235). ok=False on run-table or component-count overflow."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    Hq, Wq = page_packed.shape
    assert Hq == H
    assert W <= Wq * 32 and W < (1 << 15), (W, Wq)
    Hp = -(-H // _BLK) * _BLK
    WqP = -(-Wq // 128) * 128
    if Hp != H or WqP != Wq:
        page_packed = jnp.pad(page_packed, ((0, Hp - H), (0, WqP - Wq)))
    thresh = -1 if min_area_keep is None else min_area_keep
    import os

    dbg = int(os.environ.get("TEXT_ALIGNMENT_TPU_CCP_DEBUG", "0"))
    meta = jnp.stack([
        jnp.int32(H), jnp.int32(W), jnp.asarray(thresh, jnp.int32),
        jnp.int32(_MODE_BLACK), jnp.int32(0), jnp.int32(dbg),
        jnp.int32(0), jnp.int32(0)])
    fn = _jit_table(Hp, Wq, WqP, int(max_runs), int(max_ccs),
                    bool(interpret))
    tab, ok = fn(meta, page_packed)
    return tab, ok[1], ok[0] == 1


def cc_table_compact(img, min_area_keep=None, max_ccs: int = 2048,
                     max_runs: int = TABLE_MAX_RUNS, interpret=None):
    """Host-convenience form of :func:`cc_table_packed` (bool page in)."""
    H, W = img.shape
    pk = jnp.asarray(pack_page(np.asarray(img)))
    return cc_table_packed(pk, H, W, min_area_keep, max_ccs, max_runs,
                           interpret)


# ---------------------------------------------------------------------------
# cc_runs-compatible wrappers (bool page in / bool page out, ok flag)
# ---------------------------------------------------------------------------

def despeckle(img, k, max_runs: int = MAX_RUNS, interpret=None):
    """Remove black CCs with area <= k. Returns (page bool, ok)."""
    H, W = img.shape
    pk = jnp.asarray(pack_page(np.asarray(img)))
    out, ok, _ = _run_filter(pk, H, W, k, _MODE_BLACK, max_runs=max_runs,
                             interpret=interpret)
    return unpack_page(np.asarray(out), H, W), bool(np.asarray(ok))


def despeckle_white(img, k, max_runs: int = MAX_RUNS, interpret=None):
    H, W = img.shape
    pk = jnp.asarray(pack_page(np.asarray(img)))
    out, ok, _ = _run_filter(pk, H, W, k, _MODE_WHITE, max_runs=max_runs,
                             interpret=interpret)
    return unpack_page(np.asarray(out), H, W), bool(np.asarray(ok))


def remove_tall_ccs(img, max_nrows, max_runs: int = MAX_RUNS,
                    by_area: bool = False, interpret=None):
    H, W = img.shape
    pk = jnp.asarray(pack_page(np.asarray(img)))
    out, ok, _ = _run_filter(pk, H, W, max_nrows, _MODE_TALL,
                             by_area=by_area, max_runs=max_runs,
                             interpret=interpret)
    return unpack_page(np.asarray(out), H, W), bool(np.asarray(ok))


@functools.lru_cache(maxsize=None)
def _jit_clean(Hp: int, Wq: int, WqP: int, R: int, interpret: bool):
    """The whole 3-pass cleanup chain traced as ONE program: three
    invocations of the same filter kernel with different meta, the
    despeckle_white OR, and the event-mask preludes all fuse into a
    single dispatch (the chained per-pass form paid ~7 extra eager
    dispatches for the pad/slice/or glue between passes)."""

    def call(meta, pg):
        cm = _event_masks(pg, meta[0], meta[1], meta[3])
        # a FRESH kernel instance per call site: jax's closed_call
        # lowering cache mis-keys three pallas_calls sharing one kernel
        # closure inside a single jit (KeyError in
        # cached_primitive_lowerings, jax 0.9.0)
        return pl.pallas_call(
            _make_filter_kernel(Hp, Wq, WqP, R),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((Hp, WqP), jnp.int32),
                jax.ShapeDtypeStruct((2,), jnp.int32),
            ),
            scratch_shapes=[
                pltpu.SMEM((R,), jnp.int32),       # x01
                pltpu.SMEM((R,), jnp.int32),       # parent
                pltpu.SMEM((R,), jnp.int32),       # area
                pltpu.SMEM((R,), jnp.int32),       # yspan
                pltpu.SMEM((Hp + 1,), jnp.int32),  # rowptr
                pltpu.SMEM((_BLK, 2 * WqP), jnp.int32),  # cmbuf
                pltpu.SMEM((_BLK, WqP), jnp.int32),      # outbuf
                pltpu.SemaphoreType.DMA,
                pltpu.SemaphoreType.DMA,
            ],
            interpret=interpret,
        )(meta, cm)

    def run(page, H, W, damt, sat, by_area, dbg):
        def meta_of(thresh, mode):
            return jnp.stack([
                H, W, jnp.asarray(thresh, jnp.int32), jnp.int32(mode),
                by_area, dbg, jnp.int32(0), jnp.int32(0)])

        p1, ok1 = call(meta_of(damt, _MODE_BLACK), page)
        fills, ok2 = call(meta_of(damt, _MODE_WHITE), p1)
        p2 = p1 | fills
        p3, ok3 = call(meta_of(sat, _MODE_TALL), p2)
        return p3, (ok1[0] == 1) & (ok2[0] == 1) & (ok3[0] == 1)

    return jax.jit(run)


def preproc_clean_packed(page_packed, H: int, W: int, despeckle_amt,
                         sat_area_thresh, sat_by_area: bool = False,
                         max_runs: int = MAX_RUNS, interpret=None):
    """The three-pass cleanup chain on a DEVICE-RESIDENT packed page
    (textAlignPreprocessing.py:166-178) as ONE dispatch. Returns
    (packed page, ok_all jax bool)."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    Hq, Wq = page_packed.shape
    assert Hq == H
    assert W <= Wq * 32 and W < (1 << 15), (W, Wq)
    Hp = -(-H // _BLK) * _BLK
    WqP = -(-Wq // 128) * 128
    if Hp != H or WqP != Wq:
        page_packed = jnp.pad(page_packed, ((0, Hp - H), (0, WqP - Wq)))
    import os

    dbg = int(os.environ.get("TEXT_ALIGNMENT_TPU_CCP_DEBUG", "0"))
    fn = _jit_clean(Hp, Wq, WqP, int(max_runs), bool(interpret))
    out, ok = fn(page_packed, jnp.int32(H), jnp.int32(W),
                 jnp.asarray(despeckle_amt, jnp.int32),
                 jnp.asarray(sat_area_thresh, jnp.int32),
                 jnp.int32(int(sat_by_area)), jnp.int32(dbg))
    return out[:H, :Wq], ok


def preproc_clean(img, despeckle_amt, sat_area_thresh,
                  sat_by_area: bool = False, max_runs: int = MAX_RUNS,
                  interpret=None):
    """Host-convenience form of :func:`preproc_clean_packed`."""
    H, W = img.shape
    pk = jnp.asarray(pack_page(np.asarray(img)))
    out, ok = preproc_clean_packed(pk, H, W, despeckle_amt, sat_area_thresh,
                                   sat_by_area, max_runs, interpret)
    return unpack_page(np.asarray(out), H, W), bool(np.asarray(ok))
