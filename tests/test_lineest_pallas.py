"""Pallas fused normalizer tail (models.lineest_pallas) vs the XLA tail
in interpret mode: the center map must agree except at documented f32
plateau knife edges (±1 row), and the MAD ink counts must be exact. The
production gate is the on-hardware decode-equality A/B in
tests/test_tpu_hw.py (measured byte-identical decode wires on v5e)."""

import numpy as np

import jax
import jax.numpy as jnp

from text_alignment_tpu.models import lineest_jax as lj
from text_alignment_tpu.models import lineest_pallas as lp


def _build_case(B=6, Hp=96, Wp=768, seed=0):
    rng = np.random.default_rng(seed)
    temp = (rng.random((B, Hp, Wp)) < 0.12).astype(np.uint8)
    hs = rng.integers(60, Hp + 1, B).astype(np.int32)
    ws = rng.integers(Wp - 255, Wp + 1, B).astype(np.int32)
    i_idx = jnp.arange(Hp, dtype=jnp.int32)
    x_idx = jnp.arange(Wp, dtype=jnp.int32)
    valid = (i_idx[None, :, None] < hs[:, None, None]) & (
        x_idx[None, None, :] < ws[:, None, None])
    tj = jnp.asarray(temp) * valid.astype(jnp.uint8)
    hf = jnp.asarray(hs).astype(jnp.float32)
    sig0 = 0.5 * hf
    rad0 = jnp.floor(4.0 * sig0 + 0.5).astype(jnp.int32)
    d0 = i_idx[:, None] - i_idx[None, :]
    w0 = jnp.exp(-0.5 * (d0[None].astype(jnp.float32)
                         / jnp.maximum(sig0, 1e-6)[:, None, None]) ** 2)
    w0 = jnp.where(jnp.abs(d0)[None] <= rad0[:, None, None], w0, 0.0)
    k0max = 2 * int(4.0 * Hp * 0.5 + 0.5) + 1
    t_full = jnp.arange(-(k0max // 2), k0max // 2 + 1,
                        dtype=jnp.float32)[None, :]
    wfull = jnp.exp(-0.5 * (t_full / jnp.maximum(sig0, 1e-6)[:, None]) ** 2)
    wfull = jnp.where(jnp.abs(t_full) <= rad0.astype(jnp.float32)[:, None],
                      wfull, 0.0)
    w0 = w0 / jnp.sum(wfull, axis=1)[:, None, None]
    sm = jnp.einsum("bij,bjx->bix", w0, tj.astype(jnp.float32))
    k1max = 2 * int(4.0 * Hp * 1.0 + 0.5) + 1
    sm = lj._conv_rows(sm, lj._gauss_kernel_bank(1.0 * hf, k1max))
    return sm, tj, hs, ws, valid


def _xla_tail(sm, tj, hs, ws, valid, Hp, Wp):
    NEGF = jnp.float32(-1e30)
    i_idx = jnp.arange(Hp, dtype=jnp.int32)
    x_idx = jnp.arange(Wp, dtype=jnp.int32)
    hf = jnp.asarray(hs).astype(jnp.float32)
    sm_z = jnp.where(valid, sm, 0.0)
    u = lj._windowed_mean_h(sm_z, (0.5 * hf).astype(jnp.int32))
    u = lj._windowed_mean_w(u, jnp.asarray(ws))
    smx = sm + 0.001 * u
    smx = jnp.where(i_idx[None, :, None] < jnp.asarray(hs)[:, None, None],
                    smx, NEGF)
    a = jnp.argmax(smx, axis=1).astype(jnp.float32)
    a = jnp.where(x_idx[None, :] < jnp.asarray(ws)[:, None], a, 0.0)
    r2max = int(4.0 * Hp * 0.3 + 0.5)
    k2 = lj._gauss_kernel_bank(0.3 * hf, 2 * r2max + 1)
    ext_idx = jnp.arange(-r2max, Wp + r2max, dtype=jnp.int32)

    def reflect_extend(ab, w):
        m = jnp.mod(ext_idx, 2 * w)
        m = jnp.where(m < 0, m + 2 * w, m)
        src = jnp.where(m < w, m, 2 * w - 1 - m)
        return ab[jnp.clip(src, 0, Wp - 1)]

    a_ext = jax.vmap(reflect_extend)(a, jnp.asarray(ws))
    B = sm.shape[0]
    a_s = jax.lax.conv_general_dilated(
        a_ext[None], k2[:, None, ::-1], window_strides=(1,),
        padding="VALID", feature_group_count=B,
        dimension_numbers=("NCH", "OIH", "NCH"),
        precision=jax.lax.Precision.HIGHEST)[0]
    center = np.asarray(a_s.astype(jnp.int32))
    deltas = jnp.abs(i_idx[None, :, None]
                     - jnp.asarray(center)[:, None, :])
    ink = (tj != 0) & valid
    dsum = np.asarray(jnp.sum(jnp.where(ink, deltas, 0), axis=(1, 2),
                              dtype=jnp.int32))
    dcnt = np.asarray(jnp.sum(ink, axis=(1, 2), dtype=jnp.int32))
    return center, dsum, dcnt


def test_tail_matches_xla_up_to_plateau_edges():
    B, Hp, Wp = 6, 96, 768
    sm, tj, hs, ws, valid = _build_case(B, Hp, Wp)
    cx, dsx, dcx = _xla_tail(sm, tj, hs, ws, valid, Hp, Wp)
    cp, dsp, dcp = lp.tail_from_sm(sm, tj, hs, ws, interpret=True)
    cp = np.asarray(cp)
    np.testing.assert_array_equal(np.asarray(dcp), dcx)
    for b in range(B):
        w = ws[b]
        d = np.abs(cp[b, :w].astype(np.int64) - cx[b, :w])
        # only ±1 knife-edge flips where the f32 argmax plateau tips
        # (u2 reproduces the XLA formulation to ~6e-8)
        assert d.max() <= 1, (b, d.max())
    # dsum moves only with those ±1 rows
    assert np.abs(np.asarray(dsp) - dsx).max() <= int(np.asarray(dcx).max())


def test_engagement_gate():
    assert not lp.engaged(512, 128)      # narrow bucket
    assert not lp.engaged(1536, 8)       # small batch
    # CPU backend never engages (interpret path is test-only)
    assert not lp.engaged(1536, 128) or jax.default_backend() != "cpu"


def test_full_chain_matches_xla_up_to_plateau_edges():
    """center_from_temp (v-gauss + h-gauss + tail in one kernel) vs the
    XLA chain in interpret mode: ±1 plateau knife edges only, exact ink
    counts. On-hardware decode-equality gating is pending (the kernel is
    opt-in via TEXT_ALIGNMENT_TPU_TAIL=full until it passes)."""
    B, Hp, Wp = 6, 96, 768
    sm, tj, hs, ws, valid = _build_case(B, Hp, Wp)
    cx, dsx, dcx = _xla_tail(sm, tj, hs, ws, valid, Hp, Wp)

    hf = jnp.asarray(hs).astype(jnp.float32)
    i_idx = jnp.arange(Hp, dtype=jnp.int32)
    sig0 = 0.5 * hf
    rad0 = jnp.floor(4.0 * sig0 + 0.5).astype(jnp.int32)
    d0 = i_idx[:, None] - i_idx[None, :]
    w0 = jnp.exp(-0.5 * (d0[None].astype(jnp.float32)
                         / jnp.maximum(sig0, 1e-6)[:, None, None]) ** 2)
    w0 = jnp.where(jnp.abs(d0)[None] <= rad0[:, None, None], w0, 0.0)
    k0max = 2 * int(4.0 * Hp * 0.5 + 0.5) + 1
    t_full = jnp.arange(-(k0max // 2), k0max // 2 + 1,
                        dtype=jnp.float32)[None, :]
    wfull = jnp.exp(-0.5 * (t_full / jnp.maximum(sig0, 1e-6)[:, None]) ** 2)
    wfull = jnp.where(jnp.abs(t_full) <= rad0.astype(jnp.float32)[:, None],
                      wfull, 0.0)
    w0 = w0 / jnp.sum(wfull, axis=1)[:, None, None]
    k1max = 2 * int(4.0 * Hp * 1.0 + 0.5) + 1
    k1 = lj._gauss_kernel_bank(1.0 * hf, k1max)

    cp, dsp, dcp = lp.center_from_temp(tj, w0, k1, hs, ws, interpret=True)
    cp = np.asarray(cp)
    np.testing.assert_array_equal(np.asarray(dcp), dcx)
    for b in range(B):
        w = ws[b]
        d = np.abs(cp[b, :w].astype(np.int64) - cx[b, :w])
        assert d.max() <= 1, (b, d.max())
