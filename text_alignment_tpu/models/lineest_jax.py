"""Batched on-device line normalization (the TPU version of lineest.py).

The scipy ``CenterNormalizer`` (lineest.py, mirroring ocrolib — the
normalization baked into every trained ``.pyrnn`` model) costs ~30 ms per
line on the single host core; at folio scale it dominates the OCR stage.
This module runs the whole batch on the TPU so normalized frames are
produced *on device* and flow straight into the BiLSTM without any
host round-trip:

- axis-0 Gaussian (sigma = h/2) as a per-strip masked kernel matrix
  (einsum over a (B, Hp, Hp) bank — Hp is small);
- axis-1 Gaussian (sigma = h) and the center-smoothing Gaussian
  (sigma = 0.3 h) as ONE grouped ``conv_general_dilated`` with a
  per-strip kernel row (zero padding == scipy's constant mode);
- uniform filters as banded matmuls (rows) and a blocked-matmul prefix
  sum with shift-based window edges (columns) — exact same windows as
  scipy's ``uniform_filter1d`` incl. the int() size cast and size//2
  left origin, no gathers;
- MAD as an exact integer sum (deltas are integers; float64 division
  happens once), matching scipy's float64 mean semantics;
- dewarp + bilinear zoom fused into a single gather from the padded
  strip: out[u, t] = bilerp(grey, center[x] - r + v(u), x(t)) with
  scipy zoom's (in-1)/(out-1) coordinate map and round() output width.

Numerics: float32 with HIGHEST matmul precision. Frames match the scipy
path to ~1e-5 (summation-order differences only); CTC decode output is
identical on all tested fixtures (decode is argmax-based). Strict
bit-for-scipy runs keep the host path (recognizer strict mode).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from .lineest import DEFAULT_TARGET_HEIGHT, DEFAULT_PAD

_RANGE = 4
_SMOOTHNESS = 1.0
_EXTRA = 0.3
_TRUNCATE = 4.0


def _precision_knob(name: str, default: str):
    import os

    v = os.environ.get(name, default).lower()
    return {"highest": jax.lax.Precision.HIGHEST,
            "high": jax.lax.Precision.HIGH,
            "default": jax.lax.Precision.DEFAULT}[v]


# Matmul precision knobs (diagnostic/experiment escape hatches):
# _HI guards the center-finding chain (v/h gaussians, uniform means, the
# center-smoothing conv) whose argmax + int casts are knife edges; _HI_POST
# guards the dewarp/zoom interp matmuls DOWNSTREAM of the integer
# center/r — their inputs are exact integers-as-floats and 2-sparse
# bilinear weights, so precision there only perturbs the output frames at
# the 1e-7 level, not the geometry.
#
# Measured A/B (real TPU, fused OCR sweep B=111/Wp=1536/t_max=640):
# POST=high keeps bit-identical decode wire + rows but is NOT faster
# (52.1 ms HIGHEST vs 53.4 ms HIGH — noise); the interp matmuls are not
# the fused program's bottleneck at engaged shapes. Default stays
# HIGHEST; the knobs remain for future shape regimes.
_HI = _precision_knob("TEXT_ALIGNMENT_TPU_LINEEST_PRECISION", "highest")
_HI_POST = _precision_knob("TEXT_ALIGNMENT_TPU_LINEEST_POST_PRECISION",
                           "highest")


def _smooth_dtype():
    """TEXT_ALIGNMENT_TPU_LINEEST_DTYPE=bf16 runs the center-finding
    smoothing chain's DATA (the (B, Hp, Wp) sm tensor through the h-gauss
    conv and uniform means) in bfloat16 — a bandwidth experiment, NOT a
    parity mode: bf16 rounding can move the smoothed-center argmax by a
    row at plateau columns, which shifts the dewarp window like the
    documented scipy-vs-f32 knife edges do. Gate any production use on
    the decode-equality A/B (bench prints it; default stays f32)."""
    import os

    return (jnp.bfloat16
            if os.environ.get("TEXT_ALIGNMENT_TPU_LINEEST_DTYPE") == "bf16"
            else jnp.float32)


def _gauss_kernel_bank(sigma, kmax: int):
    """(B, kmax) gaussian taps, zero beyond each strip's radius
    int(truncate*sigma + 0.5), normalized over the full kernel (scipy
    normalizes by the kernel sum, not the in-bounds sum)."""
    r = kmax // 2
    t = jnp.arange(-r, r + 1, dtype=jnp.float32)[None, :]  # (1, kmax)
    sigma = jnp.maximum(sigma[:, None], 1e-6)
    radius = jnp.floor(_TRUNCATE * sigma + 0.5).astype(jnp.int32)
    w = jnp.exp(-0.5 * (t / sigma) ** 2)
    w = jnp.where(jnp.abs(t) <= radius.astype(jnp.float32), w, 0.0)
    return w / jnp.sum(w, axis=1, keepdims=True)


def _conv_rows_banded(x, kernels):
    """Same contract as :func:`_conv_rows` as a blocked-Toeplitz banded
    matmul: the ~800-tap per-strip kernel becomes 2*ceil(r/128)+1 banks of
    per-strip (128, 128) Toeplitz tiles and the filter runs as that many
    batched matmuls — the MXU eats the taps and, unlike the grouped conv,
    the schedule is fusion-planner-proof (see the lottery note below).

    out[b, i, p] = sum_q x[b, i, q] * k[b, q - p + r]; blocking W by 128,
    output block j only sees input blocks j-no..j+no (no = ceil(r/128)),
    and each offset's tile T[b, o, ql, pl] = k[b, (o-no)*128 + ql - pl + r]
    is a static-index window into the kernel row."""
    B, R, W = x.shape
    K = kernels.shape[1]
    r = K // 2
    bs = 128
    nb = -(-W // bs)
    no = -(-r // bs)
    Wb = nb * bs
    xp = jnp.pad(x, ((0, 0), (0, 0), (no * bs, no * bs + Wb - W)))
    xb = xp.reshape(B, R, nb + 2 * no, bs)
    q = jnp.arange(bs, dtype=jnp.int32)
    d = (q[None, :, None] - q[None, None, :]
         + (jnp.arange(2 * no + 1, dtype=jnp.int32)[:, None, None] - no) * bs)
    idx = jnp.clip(d + r, 0, K - 1)                    # (2no+1, bs, bs) static
    T = jnp.take(kernels, idx.reshape(-1), axis=1).reshape(
        B, 2 * no + 1, bs, bs)
    T = jnp.where((jnp.abs(d) <= r)[None], T, 0.0)
    out = jnp.zeros((B, R, nb, bs), x.dtype)
    for o in range(2 * no + 1):
        out = out + jnp.einsum("brjq,bqp->brjp", xb[:, :, o:o + nb],
                               T[:, o], precision=_HI)
    return out.reshape(B, R, Wb)[..., :W]


def _conv_rows(x, kernels):
    """Per-strip 1-D filter along the last axis with zero padding.

    x: (B, R, W); kernels: (B, K) with K odd and SYMMETRIC (gaussian
    banks — both callers), so correlation == convolution. Returns
    (B, R, W) where out[b, i, p] = sum_t kernels[b, t] *
    x_padded[b, i, p + t - K//2].

    On accelerators the route is :func:`_conv_rows_banded` — measured on
    v5e it beats both legacy routes isolated (5.8 vs 9.5 ms at
    B=128/Hp=96/Wp=1536, 3.6 vs 8.1 FFT at B=32/K=1025) AND inside the
    whole fused OCR program (sweep shape 24.7 -> 20.7 ms/exec, per-folio
    8.1 -> 6.8), immune to the fusion lottery below. On CPU (tests, host
    deployments) the matmul route is slower, so the two legacy routes
    remain the CPU default and the diagnostic escape hatch
    (TEXT_ALIGNMENT_TPU_CONV_ROUTE=banded|fft|conv):

    - B < 128: FFT overlap product. The grouped conv this replaces made
      the surrounding fused OCR program's schedule a lottery — XLA's
      fusion planner around a ~800-tap feature_group_count=B conv picked
      catastrophic strategies at most small/mid shapes (measured on v5e,
      whole fused program: 124 ms at B=16/Hp=96, 170 ms at B=32/Hp=128,
      193 ms at B=64/Hp=128 vs 6-19 ms with the FFT route, same
      program otherwise). The FFT is also closer to the float64 oracle
      than the conv (3e-7 vs 1e-6 max abs at production shapes).
    - B >= 128: grouped conv + optimization_barrier. At the big
      cross-folio sweep shape the conv schedule is healthy and beats the
      FFT (24 vs 36 ms whole-program at B=128); the barrier stops the
      planner from duplicating the conv into its three consumer fusions
      (measured +27 ms without it).
    """
    import os
    B, R, W = x.shape
    K = kernels.shape[1]
    route = os.environ.get("TEXT_ALIGNMENT_TPU_CONV_ROUTE")
    if route is None:
        route = "banded" if jax.default_backend() != "cpu" else (
            "fft" if B < 128 else "conv")
    if route == "banded":
        return _conv_rows_banded(x, kernels)
    if route == "fft" or (route != "conv" and B < 128):
        L = W + K - 1
        Lp = 1 << (L - 1).bit_length()
        X = jnp.fft.rfft(x, n=Lp, axis=2)
        Kf = jnp.fft.rfft(kernels[:, ::-1], n=Lp, axis=1)
        y = jnp.fft.irfft(X * Kf[:, None, :], n=Lp, axis=2)
        return y[:, :, K - 1 - K // 2 : K - 1 - K // 2 + W]
    lhs = jnp.swapaxes(x, 0, 1)            # (R, B, W): N=R, C=B
    rhs = kernels[:, None, ::-1]            # (B, 1, K) flipped: conv==corr
    out = jax.lax.conv_general_dilated(
        lhs, rhs,
        window_strides=(1,),
        padding=[(K // 2, K // 2)],
        feature_group_count=B,
        dimension_numbers=("NCH", "OIH", "NCH"),
        precision=_HI,
    )
    return jax.lax.optimization_barrier(jnp.swapaxes(out, 0, 1))


def _windowed_mean_h(x, size):
    """scipy uniform_filter1d semantics along axis 1 (rows): window of
    ``size`` (traced int32 per strip) starting at i - size//2, zero padded
    (constant mode), divided by size. x: (B, H, W); size: (B,).

    H is small (the padded strip height), so the windowed sum is one
    banded per-strip (H, H) matmul — the MXU eats it; the cumsum+gather
    formulation this replaces cost ~15x more on TPU (gathers lower to
    serial select chains)."""
    B, H, W = x.shape
    idx = jnp.arange(H, dtype=jnp.int32)
    s = jnp.maximum(size, 1)                       # (B,)
    lo = idx[None, :] - s[:, None] // 2            # (B, H) first tap
    hi = lo + s[:, None] - 1                       # last tap
    j = idx[None, None, :]
    band = ((j >= lo[:, :, None]) & (j <= hi[:, :, None])).astype(jnp.float32)
    summed = jnp.einsum("bij,bjx->bix", band, x, precision=_HI)
    return summed / s[:, None, None].astype(jnp.float32)


def _windowed_mean_w(x, size):
    """scipy uniform_filter1d semantics along axis 2 (columns), same
    contract as :func:`_windowed_mean_h` for per-strip window ``size``.

    W is large, so the inclusive prefix sum runs as a blocked lower-
    triangular matmul (in-block on the MXU, tiny cross-block cumsum) and
    the two window-edge lookups — which sit at a constant per-strip offset
    from the output index — are batched ``dynamic_slice``s of the prefix
    array padded with its own boundary values (right end clamps to the
    row total, left end is the zero pad). A per-strip contiguous slice
    lowers to one dynamic DMA per strip; the masked log2(W) roll ladder
    this replaces rewrote the doubled tensor ten times (13.4 ms -> 5.0 ms
    at B=128, Hp=128, Wp=1024 on v5e).

    The input is centered per row before the prefix sum (mean subtracted,
    added back as n_in * mu with the exact in-range tap count): the
    difference-of-prefix-sums form otherwise cancels catastrophically in
    fp32 at large column positions, which flips the downstream center
    argmax at int-truncation knife edges (this term feeds sm + 0.001 * u)."""
    B, H, W = x.shape
    s = jnp.maximum(size, 1)                       # (B,)
    mu = jnp.mean(x, axis=2, keepdims=True)        # (B, H, 1)
    x = x - mu

    bs = 128
    nb = -(-W // bs)
    Wb = nb * bs
    xp = jnp.pad(x, ((0, 0), (0, 0), (0, Wb - W))) if Wb != W else x
    tri = jnp.tril(jnp.ones((bs, bs), jnp.float32))  # [i, j] = 1 for j <= i
    xb = xp.reshape(B, H, nb, bs)
    intra = jnp.einsum("bhnj,ij->bhni", xb, tri, precision=_HI)
    totals = intra[..., -1]                         # (B, H, nb)
    offs = jnp.cumsum(totals, axis=-1) - totals     # exclusive block offsets
    S = (intra + offs[..., None]).reshape(B, H, Wb)[..., :W]

    # window edges: sum[x] = S[min(x + c1, W-1)] - (x >= c2 ? S[x - c2] : 0).
    # Per-strip shifts of S — computed as traced-amount rolls whose wrapped
    # regions are overwritten by the clamp/zero selects (exact), instead of
    # materializing two (B, H, 2W) concat tensors for dynamic slices
    # (~300 MB of HBM traffic at the sweep shape)
    c1 = s - 1 - s // 2
    c2 = s // 2 + 1
    x_idx = jnp.arange(W, dtype=jnp.int32)[None, None, :]
    last = S[..., W - 1][..., None]
    roll_hi = jax.vmap(lambda row, c: jnp.roll(row, -c, axis=1))(S, c1)
    hi_v = jnp.where(x_idx + c1[:, None, None] <= W - 1, roll_hi, last)
    roll_lo = jax.vmap(lambda row, c: jnp.roll(row, c, axis=1))(S, c2)
    lo_v = jnp.where(x_idx >= c2[:, None, None], roll_lo, 0.0)
    # exact count of in-range taps for the centering correction: the window
    # [x - s//2, x + c1] clipped to [0, W-1] (zero pad contributes no mu)
    n_in = (jnp.minimum(x_idx + c1[:, None, None], W - 1)
            - jnp.maximum(x_idx - (s // 2)[:, None, None], 0) + 1
            ).astype(jnp.float32)
    return (hi_v - lo_v + n_in * mu) / s[:, None, None].astype(jnp.float32)


def _dewarp_zoom(grey, mx, center, r, hs, ws, blank, onebit,
                 target_height, pad, t_max):
    """Dewarp + bilinear zoom + prepare_line from a computed (center, r)
    — shared by the XLA tail and the Pallas fused tail
    (models.lineest_pallas)."""
    B, Hp, Wp = grey.shape
    i_idx = jnp.arange(Hp, dtype=jnp.int32)
    x_idx = jnp.arange(Wp, dtype=jnp.int32)
    NEG = jnp.float32(-1e30)

    # -- dewarp + zoom fused gather --
    # dewarped[v, x] = padded(grey)[center[x] - r + v, x], v in [0, 2r);
    # zoom scale 48 / 2r; out width t_raw = round(w * 48 / 2r)
    hd = (2 * r).astype(jnp.float32)
    scale = target_height / hd
    t_raw = jnp.round(ws.astype(jnp.float32) * scale).astype(jnp.int32)
    t_cap = t_max - 2 * pad
    t_raw = jnp.clip(t_raw, 0, t_cap)
    t_raw = jnp.where(blank, 0, t_raw)

    # The dewarp+zoom is gather-hostile on TPU (25M 2-D gathers lower to
    # select chains / slow scatter-gather). Reformulate as matmuls:
    #   1. circular-roll every column by s[x] = center[x] - r (7 masked
    #      rolls, elementwise) so the dewarp window starts at row 0;
    #   2. row interpolation = one-hot (B, 48, 2Hp) matmul against the
    #      masked/tiled aligned image (the MXU eats this);
    #   3. column interpolation = one-hot (B, Wp, t_cap) matmul, chunked
    #      over the batch to bound the one-hot matrix memory.
    # Bilinear weights factor exactly across the two matmuls; only float
    # summation order differs from the 4-corner gather formulation.
    J = 2 * Hp
    s = center - r[:, None]                      # (B, Wp) window start
    t_mod = jnp.mod(s, Hp)
    # the roll ladder + tile + mask chain is pure HBM traffic (log2(Hp)
    # full-tensor rewrites); on the onebit path every value is exactly
    # 0/1, so the whole chain runs in uint8 (4x less traffic) and the
    # convert back to f32 fuses into the row-interp matmul's operand
    # read — values identical
    aligned = grey.astype(jnp.uint8) if onebit else grey
    k = 1
    while k < Hp:
        bit = (t_mod & k) != 0
        aligned = jnp.where(bit[:, None, :], jnp.roll(aligned, -k, axis=1),
                            aligned)
        k *= 2
    # aligned[j, x] = grey[(j + s[x]) mod Hp, x]; tile to cover j < 2Hp
    tiled = jnp.concatenate([aligned, aligned], axis=1)  # (B, J, Wp)
    j_idx = jnp.arange(J, dtype=jnp.int32)
    true_row = j_idx[None, :, None] + s[:, None, :]      # (B, J, Wp)
    inb = (
        (true_row >= 0)
        & (true_row < hs[:, None, None])
        & (x_idx[None, None, :] < ws[:, None, None])
    )
    if onebit:
        masked = jnp.where(inb, tiled,
                           mx.astype(jnp.uint8)[:, None, None]
                           ).astype(jnp.float32)
    else:
        masked = jnp.where(inb, tiled, mx[:, None, None])

    # row-interp one-hot bank (scipy zoom coords: u * (in-1)/(out-1))
    u_idx = jnp.arange(target_height, dtype=jnp.float32)
    in_h = (2 * r).astype(jnp.float32)
    src_v = u_idx[None, :] * (in_h[:, None] - 1) / (target_height - 1)
    v0 = jnp.floor(src_v).astype(jnp.int32)
    fv = src_v - v0.astype(jnp.float32)
    Rv = (j_idx[None, None, :] == v0[..., None]) * (1 - fv[..., None]) + (
        j_idx[None, None, :] == (v0 + 1)[..., None]
    ) * fv[..., None]
    out1 = jnp.einsum("buj,bjx->bux", Rv.astype(jnp.float32), masked,
                      precision=_HI_POST)  # (B, 48, Wp)

    # column-interp one-hot bank, chunked over the batch
    t_idx = jnp.arange(t_cap, dtype=jnp.float32)
    denom = jnp.maximum(t_raw - 1, 1).astype(jnp.float32)
    src_x = t_idx[None, :] * (ws - 1).astype(jnp.float32)[:, None] / denom[:, None]
    x0 = jnp.floor(src_x).astype(jnp.int32)
    fx = src_x - x0.astype(jnp.float32)

    def col_chunk(args):
        o1, x0c, fxc = args
        xi = jnp.arange(Wp, dtype=jnp.int32)[None, :, None]
        Cx = (xi == x0c[:, None, :]) * (1 - fxc[:, None, :]) + (
            xi == (x0c + 1)[:, None, :]
        ) * fxc[:, None, :]
        return jnp.einsum("bux,bxt->but", o1, Cx.astype(jnp.float32),
                          precision=_HI_POST)

    CH = min(128, B)
    nch = (B + CH - 1) // CH
    Bp = nch * CH
    pad_b = Bp - B
    o1p = jnp.pad(out1, ((0, pad_b), (0, 0), (0, 0)))
    x0p = jnp.pad(x0, ((0, pad_b), (0, 0)))
    fxp_ = jnp.pad(fx, ((0, pad_b), (0, 0)))
    z = jax.lax.map(
        col_chunk,
        (
            o1p.reshape(nch, CH, target_height, Wp),
            x0p.reshape(nch, CH, t_cap),
            fxp_.reshape(nch, CH, t_cap),
        ),
    ).reshape(Bp, target_height, t_cap)[:B]

    tmask = jnp.arange(t_cap, dtype=jnp.int32)[None, None, :] < t_raw[:, None, None]
    z = jnp.where(tmask, z, 0.0)
    zmax = jnp.max(jnp.where(tmask, z, NEG), axis=(1, 2))
    zmax = jnp.where(t_raw > 0, zmax, 1.0)
    # prepare_line: scale to [0,1] then invert (amax of scaled == 1)
    frames_core = jnp.where(tmask, 1.0 - z / zmax[:, None, None], 0.0)
    frames_core = jnp.swapaxes(frames_core, 1, 2)  # (B, t_cap, 48)
    frames = jnp.zeros((B, t_max, target_height), jnp.float32)
    frames = jax.lax.dynamic_update_slice(
        frames, frames_core, (0, pad, 0)
    )
    lengths = jnp.where(blank | (t_raw == 0), 0, t_raw + 2 * pad)
    return frames, lengths.astype(jnp.int32), t_raw.astype(jnp.int32)


@functools.partial(
    jax.jit,
    static_argnames=("target_height", "pad", "t_max", "onebit"),
)
def normalize_batch_device(grey, hs, ws, target_height=DEFAULT_TARGET_HEIGHT,
                           pad=DEFAULT_PAD, t_max=4096, onebit=False):
    """Batched CenterNormalizer.measure + normalize + prepare_line.

    grey: (B, Hp, Wp) float32 — or uint8 {0,1} with ``onebit=True`` —
          ink-dark (1/1.0 background), garbage outside each strip's
          (hs[b], ws[b]) region (masked here).
    Returns (frames (B, t_max, target_height) f32, lengths (B,) i32,
    t_raws (B,) i32). lengths = t_raw + 2*pad, 0 for blank strips.

    ``onebit=True`` asserts every valid pixel is exactly 0.0 or 1.0 (the
    recognizer's bit-unpacked production input): the contrast
    normalization collapses to boolean reductions — temp IS the ink mask
    (zeroed, like the general path, for the degenerate all-ink strip
    whose max grey is 0) — replacing two full-image f32 max reductions
    and a division pass. Values identical to the general path on such
    inputs (tested).
    """
    B, Hp, Wp = grey.shape
    i_idx = jnp.arange(Hp, dtype=jnp.int32)
    x_idx = jnp.arange(Wp, dtype=jnp.int32)
    valid = (i_idx[None, :, None] < hs[:, None, None]) & (
        x_idx[None, None, :] < ws[:, None, None]
    )

    NEG = jnp.float32(-1e30)
    if onebit:
        # the onebit path never materializes a float page: grey may arrive
        # as uint8 {0,1} (the recognizer's bit-unpacked input), every
        # full-page intermediate before the matmuls stays 1 byte wide
        # (HBM bandwidth is this program's wall), and the u8->f32
        # converts fuse into the matmul operand reads
        grey = jnp.where(valid, grey.astype(jnp.uint8), jnp.uint8(1))
        ink_b = valid & (grey == 0)
        any_ink = jnp.any(ink_b, axis=(1, 2))
        any_bg = jnp.any(valid & (grey != 0), axis=(1, 2))
        blank = ~(any_ink & any_bg)
        mx = jnp.where(any_bg, 1.0, 0.0).astype(jnp.float32)  # max grey
        temp = jnp.where(ink_b & any_bg[:, None, None], jnp.uint8(1),
                         jnp.uint8(0))
    else:
        grey = jnp.where(valid, grey, 1.0)
        mx = jnp.max(jnp.where(valid, grey, NEG), axis=(1, 2))  # (B,)
        temp = mx[:, None, None] - grey
        temp = jnp.where(valid, temp, 0.0)
        tmax = jnp.max(temp, axis=(1, 2))
        blank = tmax <= 0.0
        temp = temp / jnp.where(blank, 1.0, tmax)[:, None, None]

    hf = hs.astype(jnp.float32)

    # -- measure --
    # axis-0 gaussian, sigma = 0.5 h: per-strip (Hp, Hp) kernel matrix
    k0max = 2 * int(_TRUNCATE * Hp * 0.5 + 0.5) + 1
    sig0 = 0.5 * hf
    rad0 = jnp.floor(_TRUNCATE * sig0 + 0.5).astype(jnp.int32)
    d0 = i_idx[:, None] - i_idx[None, :]  # (Hp, Hp)
    w0 = jnp.exp(
        -0.5 * (d0[None].astype(jnp.float32) / jnp.maximum(sig0, 1e-6)[:, None, None]) ** 2
    )
    w0 = jnp.where(jnp.abs(d0)[None] <= rad0[:, None, None], w0, 0.0)
    # normalize over the FULL kernel sum (scipy), not just in-matrix taps:
    # taps with |d| <= rad0 outside [0, Hp) exist only if rad0 >= Hp; the
    # full sum is computed analytically over [-rad0, rad0]
    t_full = jnp.arange(-(k0max // 2), k0max // 2 + 1,
                        dtype=jnp.float32)[None, :]
    wfull = jnp.exp(-0.5 * (t_full / jnp.maximum(sig0, 1e-6)[:, None]) ** 2)
    wfull = jnp.where(
        jnp.abs(t_full) <= rad0.astype(jnp.float32)[:, None], wfull, 0.0
    )
    w0 = w0 / jnp.sum(wfull, axis=1)[:, None, None]
    dt_sm = _smooth_dtype()

    # full-chain Pallas route: v-gauss + h-gauss + tail in one kernel,
    # sm never materializes in HBM (models.lineest_pallas; opt-in via
    # TEXT_ALIGNMENT_TPU_TAIL=full until gated on hardware)
    from . import lineest_pallas as _lpal0

    if (onebit and dt_sm == jnp.float32 and _lpal0.engaged_full(Wp, B)
            and not jax.config.jax_enable_x64):
        k1max_f = 2 * int(_TRUNCATE * Hp * _SMOOTHNESS + 0.5) + 1
        k1_f = _gauss_kernel_bank(_SMOOTHNESS * hf, k1max_f)
        center, dsum, dcnt = _lpal0.center_from_temp(
            temp, w0, k1_f, hs, ws, interpret=False)
        mad = dsum.astype(jnp.float32) / jnp.maximum(dcnt, 1)
        mad = jnp.where(dcnt > 0, mad, hf / 4.0)
        r = (1.0 + _RANGE * mad).astype(jnp.int32)
        r = jnp.clip(r, 1, Hp)
        return _dewarp_zoom(grey, mx, center, r, hs, ws, blank, onebit,
                            target_height, pad, t_max)

    sm = jnp.einsum("bij,bjx->bix", w0, temp.astype(jnp.float32),
                    precision=_HI).astype(dt_sm)

    # axis-1 gaussian, sigma = smoothness * h, grouped conv
    k1max = 2 * int(_TRUNCATE * Hp * _SMOOTHNESS + 0.5) + 1
    k1 = _gauss_kernel_bank(_SMOOTHNESS * hf, k1max)
    sm = _conv_rows(sm, k1)

    # Pallas fused tail (means -> argmax -> k2 smoothing -> MAD) keeps
    # the strip in VMEM instead of streaming (B, Hp, Wp) tensors through
    # HBM once per stage (models.lineest_pallas; engagement-gated:
    # accelerator + onebit + f32 chain + wide buckets)
    from . import lineest_pallas as _lpal

    use_ptail = (onebit and dt_sm == jnp.float32
                 and _lpal.engaged(Wp, B)
                 and not jax.config.jax_enable_x64)
    if use_ptail:
        center, dsum, dcnt = _lpal.tail_from_sm(
            sm.astype(jnp.float32), temp, hs, ws, interpret=False)
        mad = dsum.astype(jnp.float32) / jnp.maximum(dcnt, 1)
        mad = jnp.where(dcnt > 0, mad, hf / 4.0)
        r = (1.0 + _RANGE * mad).astype(jnp.int32)
        r = jnp.clip(r, 1, Hp)
        return _dewarp_zoom(grey, mx, center, r, hs, ws, blank, onebit,
                            target_height, pad, t_max)

    # + 0.001 * uniform_filter(sm, (0.5 h, w)); the uniform windows must
    # see zeros outside the strip's true (h, w) region (scipy's array ends
    # there), while our padded computation leaves garbage in the margins
    sm_z = jnp.where(valid, sm, jnp.zeros((), dt_sm))
    u = _windowed_mean_h(sm_z, (0.5 * hf).astype(jnp.int32))
    u = _windowed_mean_w(u, ws)
    sm = (sm + jnp.asarray(0.001, dt_sm) * u.astype(dt_sm))

    # argmax over rows (restricted to i < h), first-max wins like numpy
    sm = jnp.where(i_idx[None, :, None] < hs[:, None, None],
                   sm.astype(jnp.float32), NEG)
    a = jnp.argmax(sm, axis=1).astype(jnp.float32)  # (B, Wp)
    a = jnp.where(x_idx[None, :] < ws[:, None], a, 0.0)

    # gaussian_filter1d(a, extra * h) with scipy's DEFAULT mode="reflect",
    # then int cast (truncation). Reflect-extend each strip's true [0, w)
    # range by the max radius, correlate VALID, all per strip.
    r2max = int(_TRUNCATE * Hp * _EXTRA + 0.5)
    k2 = _gauss_kernel_bank(_EXTRA * hf, 2 * r2max + 1)
    ext_idx = jnp.arange(-r2max, Wp + r2max, dtype=jnp.int32)

    def reflect_extend(ab, w):
        # scipy 'reflect': (d c b a | a b c d | d c b a), period 2w
        m = jnp.mod(ext_idx, 2 * w)
        m = jnp.where(m < 0, m + 2 * w, m)
        src = jnp.where(m < w, m, 2 * w - 1 - m)
        return ab[jnp.clip(src, 0, Wp - 1)]

    a_ext = jax.vmap(reflect_extend)(a, ws)  # (B, Wp + 2*r2max)
    lhs = a_ext[None, :, :]                   # N=1, C=B
    rhs = k2[:, None, ::-1]
    a_s = jax.lax.conv_general_dilated(
        lhs, rhs, window_strides=(1,), padding="VALID",
        feature_group_count=B, dimension_numbers=("NCH", "OIH", "NCH"),
        precision=_HI,
    )[0]
    center = a_s.astype(jnp.int32)  # (B, Wp), truncation toward zero

    # mad = float64-exact mean of |i - center[x]| over ink pixels
    deltas = jnp.abs(i_idx[None, :, None] - center[:, None, :])
    ink = (temp != 0) & valid
    dsum = jnp.sum(jnp.where(ink, deltas, 0), axis=(1, 2),
                   dtype=jnp.int64 if jax.config.jax_enable_x64 else jnp.int32)
    dcnt = jnp.sum(ink, axis=(1, 2), dtype=jnp.int32)
    mad = dsum.astype(jnp.float64 if jax.config.jax_enable_x64
                      else jnp.float32) / jnp.maximum(dcnt, 1)
    mad = jnp.where(dcnt > 0, mad, hf / 4.0)
    r = (1.0 + _RANGE * mad).astype(jnp.int32)  # (B,), truncation
    # clamp to Hp: the matmul dewarp below covers 2r <= 2*Hp rows; r > Hp
    # only occurs for degenerate strips (ink scattered to the extreme rows)
    # where the dewarped window is mostly background anyway
    r = jnp.clip(r, 1, Hp)

    return _dewarp_zoom(grey, mx, center, r, hs, ws, blank, onebit,
                        target_height, pad, t_max)
