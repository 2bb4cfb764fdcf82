"""Pallas TPU kernel for the BiLSTM recurrence — the OCR FLOP hot spot.

The XLA ``lax.scan`` in :mod:`.lstm_jax` runs the per-step recurrence at
~30 us/step on a v5e: each step is a tiny (B, ns) x (ns, 4ns) matmul plus
a dozen elementwise ops, and the while-loop overhead dominates (the OCR
stage sits at single-digit MFU — reference analog: ocropus-rpred's
per-frame Python loop, alignToOCR.py:128-184, which this whole module
replaces). This kernel runs the same recurrence inside ONE Mosaic program:

- the input projection (the big, parallel-over-T matmul) stays in XLA on
  the MXU at full batch;
- the sequential part — gates = gx[t] + h_{t-1} @ Wh, then the LSTM
  elementwise block — runs here, with h/c carried in VMEM scratch across
  a sequential grid over T-blocks (the carry pattern of align/nw_pallas);
- both directions step together (the direction axis is unrolled in the
  kernel body), exactly like the direction-fused XLA scan.

Layout: ns pads to NSP = 128 lanes and each gate chunk pads to NSP, so
the fused gate tensor is G4 = 4 * NSP = 512 lanes and the four gate
slices land on exact vreg boundaries. Zero-padded lanes are
self-consistent: gx pad = 0 and Wh pad = 0 keep h/c pad lanes exactly 0
through sigmoid/tanh algebra (0.5 * 0 gates), so padding never leaks
into real lanes. Inputs arrive T-major (2, T, B, ·) so the per-step read
gx[d, t] is one contiguous (B, G4) tile.

Numerics: the matmuls run with HIGHEST precision like the XLA einsums;
outputs match the scan to float32 roundoff (tolerance-tested, plus CTC
decode equality on the recognizer path).

Semantics pinned by models/lstm_np.py (ocropy LSTM incl. the t=0
peephole skip quirk); used for inference only (models/train.py keeps the
differentiable scan).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NSP = 128           # padded hidden width (lanes)
G4 = 4 * NSP        # fused gate width: [gi | gf | go | ci] chunks


def _fuse_pad(W, ni: int, ns: int):
    """ocropy LSTMParams -> (Wx (G4, ni), bias (G4,), Wh (NSP, G4),
    peep (3, NSP)) with every ns-sized axis zero-padded to NSP. Gate
    order matches lstm_jax._bidir_scan.fuse: [WGI, WGF, WGO, WCI]."""
    Wg = jnp.concatenate([W.WGI, W.WGF, W.WGO, W.WCI], axis=0)  # (4ns, na)
    bias, Wx, Wh = Wg[:, 0], Wg[:, 1:1 + ni], Wg[:, 1 + ni:]

    def pad_gate_rows(a):  # (4ns, k) -> (G4, k): pad each ns-chunk to NSP
        a = a.reshape(4, ns, -1)
        a = jnp.pad(a, ((0, 0), (0, NSP - ns), (0, 0)))
        return a.reshape(G4, a.shape[-1])

    Wxp = pad_gate_rows(Wx)                           # (G4, ni)
    biasp = pad_gate_rows(bias[:, None])[:, 0]        # (G4,)
    WhT = pad_gate_rows(Wh).T                         # (ns, G4)
    Whp = jnp.pad(WhT, ((0, NSP - ns), (0, 0)))       # (NSP, G4)
    peep = jnp.stack([W.WIP, W.WFP, W.WOP])           # (3, ns)
    peepp = jnp.pad(peep, ((0, 0), (0, NSP - ns)))    # (3, NSP)
    return Wxp, biasp, Whp, peepp


def _make_kernel(TB: int, B: int):
    def kernel(gx_ref, wh_ref, peep_ref, out_ref, h_ref, c_ref):
        t0 = pl.program_id(0) * TB

        @pl.when(pl.program_id(0) == 0)
        def _():
            h_ref[...] = jnp.zeros_like(h_ref)
            c_ref[...] = jnp.zeros_like(c_ref)

        # loop-invariant reads hoisted out of the step loop
        wh = (wh_ref[0], wh_ref[1])
        peeps = [
            (peep_ref[3 * d + 0:3 * d + 1, :],   # WIP (1, NSP)
             peep_ref[3 * d + 1:3 * d + 2, :],   # WFP
             peep_ref[3 * d + 2:3 * d + 3, :])   # WOP
            for d in range(2)
        ]

        def step(k, _):
            t = t0 + k
            # ocropy t=0 quirk: WIP/WFP terms vanish at t=0 because the
            # zero-initialized carry makes wip*cp exactly 0 — no masking
            # needed there; only the OUTPUT peephole (wop * c, with c != 0
            # already at t=0) needs the explicit skip
            nf = jnp.where(t > 0, 1.0, 0.0)
            for d in range(2):  # direction axis unrolled
                hp = h_ref[d]   # (B, NSP)
                cp = c_ref[d]
                g = gx_ref[d, k] + jnp.dot(
                    hp, wh[d], preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST,
                )  # (B, G4); gate chunks at exact vreg boundaries
                wip, wfp, wop = peeps[d]
                gi = jax.nn.sigmoid(g[:, 0:NSP] + wip * cp)
                gf = jax.nn.sigmoid(g[:, NSP:2 * NSP] + wfp * cp)
                ci = jnp.tanh(g[:, 3 * NSP:4 * NSP])
                c = ci * gi + gf * cp
                go = jax.nn.sigmoid(g[:, 2 * NSP:3 * NSP] + wop * c * nf)
                h = jnp.tanh(c) * go
                h_ref[d] = h
                c_ref[d] = c
                out_ref[d, k] = h
            return 0

        # unroll must stay 1: Mosaic's for-loop lowering accepts only
        # unroll=1 or a full unroll (=num_steps), and a full unroll of a
        # 64-512-step body bloats the program (the tunnel's deferred
        # first-execution load scales with program size — docs/DESIGN.md
        # "Cold start"). CPU interpret-mode tests never lower via Mosaic,
        # so this constraint is only visible on real TPU.
        jax.lax.fori_loop(0, TB, step, 0, unroll=1)

    return kernel


def _block_T(T: int, B: int) -> int:
    """T-block length: budget TB*B <= 1024 rows so the double-buffered
    (2, TB, B, 512) f32 gx block stays well under VMEM (~4 MB/buffer at
    the cap); powers of two all around so TB | T."""
    return max(8, min(T, 1024 // max(1, B)))


def pallas_ok(B: int, T: int, ns: int) -> bool:
    """Shape gate for the kernel path (the caller falls back to the XLA
    scan otherwise): pow-2-friendly B and T from the recognizer's bucket
    ladder, hidden width within one padded lane tile. B caps at 128:
    beyond that _block_T's floor of 8 would blow the (2, TB, B, G4)
    VMEM block past the ~4 MB/buffer budget, and giant buckets amortize
    the scan's loop overhead anyway."""
    if ns > NSP:
        return False
    # B % 4 (not 8): the pack ladder ships mult-of-4 batches below 16 to
    # save upload bytes (B=12 is the typical 9-12 line folio), and the
    # caller pads to the next multiple of 8 on device before invoking the
    # kernel — so gate on the PADDED batch's budget
    if B < 8 or B % 4 != 0 or B > 128:
        return False
    TB = _block_T(T, -(-B // 8) * 8)
    return T % TB == 0


@functools.partial(jax.jit, static_argnames=("interpret",))
def bidir_scan_pallas(Wf, Wb, xs_f, xs_b, interpret=False):
    """Drop-in for lstm_jax._bidir_scan: (f, b_rev), each (B, T, ns)."""
    B, T, ni = xs_f.shape
    ns = Wf.WGI.shape[0]
    TB = _block_T(T, B)

    Wxf, bf, Whf, pf = _fuse_pad(Wf, ni, ns)
    Wxb, bb, Whb, pb = _fuse_pad(Wb, ni, ns)
    Wx = jnp.stack([Wxf, Wxb])          # (2, G4, ni)
    bias = jnp.stack([bf, bb])          # (2, G4)
    Wh = jnp.stack([Whf, Whb])          # (2, NSP, G4)
    peep = jnp.concatenate([pf, pb])    # (6, NSP)

    # input projection: one big MXU matmul over all frames, T-major so the
    # kernel's per-step read is a contiguous (B, G4) tile
    xs2 = jnp.stack([xs_f, xs_b])       # (2, B, T, ni)
    gx = (
        jnp.einsum("dbti,dgi->dtbg", xs2, Wx,
                   preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)
        + bias[:, None, None, :]
    )                                    # (2, T, B, G4)

    outs = pl.pallas_call(
        _make_kernel(TB, B),
        grid=(T // TB,),
        in_specs=[
            pl.BlockSpec((2, TB, B, G4), lambda t: (0, t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, NSP, G4), lambda t: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((6, NSP), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((2, TB, B, NSP), lambda t: (0, t, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((2, T, B, NSP), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, B, NSP), jnp.float32),  # h carry
            pltpu.VMEM((2, B, NSP), jnp.float32),  # c carry
        ],
        interpret=interpret,
    )(gx, Wh, peep)

    f = jnp.moveaxis(outs[0, :, :, :ns], 0, 1)      # (B, T, ns)
    b_rev = jnp.moveaxis(outs[1, :, :, :ns], 0, 1)
    return f, b_rev
