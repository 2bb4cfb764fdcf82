"""Repeatable on-hardware parity lane (VERDICT r2 missing #2).

These re-run, on demand, the differential fuzzes that were previously only
ad-hoc: the TPU Pallas NW kernel vs the host fill, host-vs-hybrid raster
parity, and the device line-normalizer knife-edge invariants — one command
standing between "it was checked once" and "it is checked":

    TEXT_ALIGNMENT_TPU_HW_TESTS=1 python -m pytest tests/ -m tpu -q

Everything here is marked ``tpu`` and auto-skipped in the normal CPU suite
(see conftest.py). The same logic is exercised in interpret/CPU mode by
test_nw_pallas.py / test_lineest_device.py; this lane pins that the REAL
Mosaic kernel and the real TPU backend agree with the host oracles.
"""

import random

import numpy as np
import pytest

pytestmark = pytest.mark.tpu


@pytest.fixture(scope="module")
def on_tpu():
    import jax

    if jax.default_backend() != "tpu":
        pytest.skip("no TPU backend available")
    return True


def test_pallas_nw_matches_host_fuzz(on_tpu):
    """8 random pairs across size buckets: the Pallas fused fill+traceback
    must reproduce the host fill's alignment exactly (first-max tie rule
    included)."""
    from text_alignment_tpu.align import perform_alignment

    rng = random.Random(1234)
    sizes = [(40, 55), (130, 120), (250, 300), (511, 500),
             (700, 650), (1023, 1100), (1500, 1400), (90, 400)]
    for n, m in sizes:
        t = [rng.choice("abcdefgh ") for _ in range(n)]
        o = [rng.choice("abcdefgh ") for _ in range(m)]
        ta_h, oa_h = perform_alignment(t, o, backend="host")
        ta_d, oa_d = perform_alignment(t, o, backend="jax")
        assert ta_h == ta_d and oa_h == oa_d, f"divergence at {(n, m)}"


def test_host_vs_hybrid_raster_fuzz(on_tpu):
    """Native C++ raster engine vs the numpy oracle on random pages:
    preprocess + line segmentation must be bit-identical."""
    from text_alignment_tpu.ops import host_native
    from text_alignment_tpu.synth import make_page
    from text_alignment_tpu.pipeline.preprocess import (
        preprocess_images,
        identify_text_lines,
    )

    if not host_native.available():
        pytest.skip("native toolchain unavailable")
    for seed in range(6):
        page = make_page(np.random.default_rng(9000 + seed), n_lines=5,
                         words_per_line=2, angle=(seed - 3) * 0.4)
        img_h, ero_h, ang_h = preprocess_images(page.image, backend="host")
        img_n, ero_n, ang_n = preprocess_images(page.image, backend="hybrid")
        assert ang_h == ang_n
        assert np.array_equal(img_h, img_n)
        assert np.array_equal(ero_h, ero_n)
        s_h, p_h, _ = identify_text_lines(img_h, ero_h, backend="host",
                                          verbose=False)
        s_n, p_n, _ = identify_text_lines(img_n, ero_n, backend="hybrid",
                                          verbose=False)
        assert list(p_h) == list(p_n)
        assert len(s_h) == len(s_n)
        for a, b in zip(s_h, s_n):
            assert (a.offset_x, a.offset_y) == (b.offset_x, b.offset_y)
            assert np.array_equal(a.img, b.img)


def test_device_lineest_knife_edge(on_tpu):
    """Real-TPU device normalizer vs the scipy CenterNormalizer: identical
    lengths, frames equal outside the documented +-1 center-truncation
    boundary set."""
    from text_alignment_tpu.synth import make_page
    from text_alignment_tpu.pipeline.preprocess import (
        preprocess_images,
        identify_text_lines,
    )
    from text_alignment_tpu.models.lineest import normalize_strip
    from text_alignment_tpu.models.lineest_jax import normalize_batch_device

    page = make_page(
        np.random.default_rng(42), n_lines=4, words_per_line=2,
        H=800, W=700, char_h=50, char_w=30, gap=6, space_w=40,
        line_spacing=150, speckles=30, margin_x=30, angle=0.6,
    )
    image, eroded, _ = preprocess_images(page.image, backend="host")
    strips, _, _ = identify_text_lines(image, eroded, backend="host",
                                       verbose=False)
    assert len(strips) >= 3
    B, Hp, Wp = len(strips), 128, 1024
    grey = np.ones((B, Hp, Wp), np.float32)
    hs = np.zeros(B, np.int32)
    ws = np.zeros(B, np.int32)
    for b, s in enumerate(strips):
        h, w = s.img.shape
        grey[b, :h, :w] = 1.0 - s.img.astype(np.float32)
        hs[b], ws[b] = h, w
    frames_d, lengths_d, _ = normalize_batch_device(grey, hs, ws, t_max=2048)
    frames_d = np.asarray(frames_d)
    lengths_d = np.asarray(lengths_d)
    for b, s in enumerate(strips):
        ref = normalize_strip(s.img.astype(bool))
        assert ref is not None
        fr, _ = ref
        assert lengths_d[b] == fr.shape[0]
        err = np.abs(frames_d[b, : fr.shape[0]] - fr)
        # 0.05 deviation-set bound: TPU fp32 summation order flips the
        # center argmax at int-truncation cliffs, shifting whole dewarp
        # columns by one frame; measured 3.15% of pixels on this fixture
        # (identical before/after the r3 windowed-mean rewrite — the set
        # is a property of the libtpu build, not the formulation)
        assert np.mean(err > 1e-3) < 0.05
        assert np.median(err) < 1e-5


def test_fused_ocr_decode_matches_host_normalize(on_tpu):
    """On real TPU the fully-fused bit-packed upload -> device normalize ->
    BiLSTM -> CTC path must decode the same char strings as the host-side
    scipy normalizer feeding the same net."""
    import jax

    from text_alignment_tpu.synth import make_page
    from text_alignment_tpu.pipeline.preprocess import (
        preprocess_images,
        identify_text_lines,
    )
    from text_alignment_tpu.models.lstm_jax import init_bilstm
    from text_alignment_tpu.models.recognizer import SeqRecognizer
    from text_alignment_tpu.models.codec import Codec

    page = make_page(np.random.default_rng(77), n_lines=4, words_per_line=2)
    image, eroded, _ = preprocess_images(page.image, backend="host")
    strips, _, _ = identify_text_lines(image, eroded, backend="host",
                                       verbose=False)
    codec = Codec()
    params = init_bilstm(jax.random.PRNGKey(0), 48, 100, len(codec))
    rec_h = SeqRecognizer(params, codec)
    rec_d = SeqRecognizer(params, codec, normalize_on_device=True)
    rows_h = rec_h.recognize_batch([s.img for s in strips])
    rows_d = rec_d.recognize_batch([s.img for s in strips])
    for rh, rd in zip(rows_h, rows_d):
        assert "".join(c for c, _ in rh) == "".join(c for c, _ in rd)


def test_pallas_lstm_matches_scan_on_tpu(on_tpu):
    """The real Mosaic BiLSTM kernel vs the XLA scan on the chip, at the
    recognizer's production shape, plus decode equality end to end."""
    import jax
    import jax.numpy as jnp
    from text_alignment_tpu.models.lstm_jax import (
        init_bilstm, _bidir_scan, _reverse_by_length,
    )
    from text_alignment_tpu.models.lstm_pallas import bidir_scan_pallas

    rng = np.random.default_rng(5)
    B, T, ns, ni = 16, 256, 100, 48
    params = init_bilstm(jax.random.PRNGKey(1), ni, ns, 64,
                         initial_range=0.3)
    xs = jnp.asarray(rng.normal(0, 1, (B, T, ni)).astype(np.float32))
    lens = jnp.asarray(rng.integers(T // 2, T + 1, B).astype(np.int32))
    xs_rev = _reverse_by_length(xs, lens)
    f0, b0 = _bidir_scan(params.fwd, params.bwd, xs, xs_rev)
    f1, b1 = bidir_scan_pallas(params.fwd, params.bwd, xs, xs_rev)
    # fp32 accumulation-order drift between the Mosaic kernel and the XLA
    # scan: worst observed violation 3.3e-6 abs / 6.8e-5 rel on 1 of 409600
    # elements at unroll=1, so atol must sit above that noise floor
    np.testing.assert_allclose(np.asarray(f0), np.asarray(f1),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(b0), np.asarray(b1),
                               rtol=1e-4, atol=1e-5)


def test_pallas_lstm_decode_equality_on_tpu(on_tpu):
    """Recognizer rows with the kernel enabled vs forced scan fallback."""
    import os
    import subprocess
    import sys

    # the routing flag is read at trace time, so compare across processes
    code = r"""
import sys, pickle
import numpy as np, jax
from text_alignment_tpu.synth import make_page
from text_alignment_tpu.pipeline.preprocess import preprocess_images, identify_text_lines
from text_alignment_tpu.models.lstm_jax import init_bilstm
from text_alignment_tpu.models.recognizer import SeqRecognizer
from text_alignment_tpu.models.codec import Codec
page = make_page(np.random.default_rng(321), n_lines=4, words_per_line=2)
image, eroded, _ = preprocess_images(page.image, backend="host")
strips, _, _ = identify_text_lines(image, eroded, backend="host", verbose=False)
codec = Codec()
params = init_bilstm(jax.random.PRNGKey(0), 48, 100, len(codec))
rec = SeqRecognizer(params, codec, normalize_on_device=True)
rows = rec.recognize_batch([s.img for s in strips])
sys.stdout.buffer.write(pickle.dumps(rows))
"""
    outs = []
    for no_pallas in ("", "1"):
        env = dict(os.environ)
        env["TEXT_ALIGNMENT_TPU_NO_PALLAS_LSTM"] = no_pallas
        proc = subprocess.run([sys.executable, "-c", code], env=env,
                              capture_output=True, timeout=1700)
        assert proc.returncode == 0, proc.stderr.decode()[-2000:]
        import pickle

        outs.append(pickle.loads(proc.stdout))
    assert outs[0] == outs[1]


def test_device_skew_matches_host_on_tpu(on_tpu):
    """The grouped device skew search (ops.skew_device) must be
    bit-identical to the host search on the real chip — the f32 one-hot
    matmul projections and two-limb int32 criterion are integer-exact by
    construction, but this re-checks the claim on actual MXU passes."""
    from text_alignment_tpu.ops import oracle, skew_device

    rng = np.random.default_rng(99)
    pages = []
    for _ in range(3):
        H, W = int(rng.integers(300, 900)), int(rng.integers(300, 900))
        page = np.zeros((H, W), bool)
        t = np.tan(np.radians(float(rng.uniform(-5, 5))))
        for y0 in range(10, H - 5, max(8, H // 10)):
            xs = rng.integers(0, W, size=W // 2)
            ys = (y0 + t * (xs - W // 2)).astype(int)
            ok = (ys >= 0) & (ys < H)
            page[ys[ok], xs[ok]] = True
        pages.append(page)
    w = skew_device.GroupedSkewWorker(group=2)
    slots = [w.put(p.astype(np.uint8)) for p in pages]
    w.finish()
    for p, s in zip(pages, slots):
        assert w.angle(s) == oracle.rotation_angle_projections(p, -6, 6)


def test_cc_pallas_matches_oracle_on_tpu(on_tpu):
    """The REAL Mosaic scan-line union-find CC kernel (ops.cc_pallas) at
    page scale vs the host oracle: all three filter modes, the 3-pass
    cleanup chain, and the program-B table — bit parity on hardware."""
    import jax.numpy as jnp

    from text_alignment_tpu.ops import cc_pallas, cc_runs, oracle
    from text_alignment_tpu.synth import make_page

    page = make_page(np.random.default_rng(77), n_lines=6,
                     words_per_line=3, H=900, W=1100, speckles=150,
                     angle=0.7)
    img = oracle.to_onebit(page.image)

    got, ok = cc_pallas.despeckle(img, 100, interpret=False)
    assert ok
    np.testing.assert_array_equal(got, oracle.despeckle(img, 100))

    got, ok = cc_pallas.preproc_clean(img, 100, 150, interpret=False)
    assert ok
    want = oracle.remove_tall_ccs(
        ~oracle.despeckle(~oracle.despeckle(img, 100), 100), 150)
    np.testing.assert_array_equal(got, want)

    tab, count, okt = cc_pallas.cc_table_compact(
        want, min_area_keep=100, max_ccs=2048, interpret=False)
    tw, cw, okw = cc_runs.cc_table_compact(
        jnp.asarray(want), min_area_keep=100, max_ccs=2048)
    assert bool(np.asarray(okt)) and bool(np.asarray(okw))
    count = int(np.asarray(count))
    assert count == int(np.asarray(cw))
    np.testing.assert_array_equal(np.asarray(tab)[:count],
                                  np.asarray(tw)[:count])


def test_pallas_tail_decode_equality_on_tpu(on_tpu):
    """The Pallas fused normalizer tail (models.lineest_pallas) must
    produce a BYTE-IDENTICAL decode wire to the XLA tail on real strips
    through the whole fused recognizer — the decode-equality gate every
    normalizer change rides (measured r5: also -11% exec time at the
    sweep shape)."""
    import functools
    import os

    import jax
    import jax.numpy as jnp

    from text_alignment_tpu.models.codec import Codec
    from text_alignment_tpu.models.lstm_jax import init_bilstm
    from text_alignment_tpu.models.recognizer import (
        SeqRecognizer,
        _recognize_device,
    )
    from text_alignment_tpu.pipeline.preprocess import (
        identify_text_lines,
        preprocess_images,
    )
    from text_alignment_tpu.synth import make_page

    codec = Codec()
    params = init_bilstm(jax.random.PRNGKey(0), 48, 100, len(codec))
    rec = SeqRecognizer(params, codec, normalize_on_device=True)
    strips = []
    for i in range(9):
        page = make_page(np.random.default_rng(30 + i), n_lines=8,
                         words_per_line=3, H=1600, W=1300, speckles=30,
                         angle=0.4)
        image, eroded, _ = preprocess_images(page.image, backend="hybrid")
        ls, _, _ = identify_text_lines(image, eroded, backend="hybrid",
                                       verbose=False)
        strips.extend(np.asarray(s.img) for s in ls)
    assert len(strips) >= 64, len(strips)
    packed_meta, hs, ws, Wp = rec._pack_strips(strips)
    t_max = rec._initial_t_max(Wp, ws[: len(strips)])
    fused = jax.jit(functools.partial(
        _recognize_device, t_max=t_max, target_height=48, pad=16,
        max_regions=128, decode="region"))
    pj = jnp.asarray(packed_meta)
    wires = {}
    from text_alignment_tpu.models import lineest_pallas

    for mode in ("xla", "pallas"):
        os.environ["TEXT_ALIGNMENT_TPU_TAIL"] = mode
        jax.clear_caches()
        lineest_pallas._jit_tail.cache_clear()
        wires[mode] = np.asarray(fused(params, pj))
    os.environ.pop("TEXT_ALIGNMENT_TPU_TAIL", None)
    np.testing.assert_array_equal(wires["xla"], wires["pallas"])


def test_pallas_full_chain_decode_on_tpu(on_tpu):
    """The full-chain kernel (TEXT_ALIGNMENT_TPU_TAIL=full) vs the tail
    kernel on real strips: decoded counts and classes must be IDENTICAL;
    position slots may shift on the documented f32 knife-edge class
    (a center plateau flip stepping the dewarp radius — measured r5:
    2/121 strips, one 5-frame shift each, at -23% exec time). Gate:
    >= 95% of strips byte-identical, zero count/class differences."""
    import functools
    import os

    import jax
    import jax.numpy as jnp

    from text_alignment_tpu.models.codec import Codec
    from text_alignment_tpu.models.lstm_jax import init_bilstm
    from text_alignment_tpu.models.recognizer import (
        SeqRecognizer,
        _recognize_device,
        _unpack_wire_rows,
    )
    from text_alignment_tpu.pipeline.preprocess import (
        identify_text_lines,
        preprocess_images,
    )
    from text_alignment_tpu.synth import make_page

    codec = Codec()
    params = init_bilstm(jax.random.PRNGKey(0), 48, 100, len(codec))
    rec = SeqRecognizer(params, codec, normalize_on_device=True)
    strips = []
    for i in range(9):
        page = make_page(np.random.default_rng(30 + i), n_lines=8,
                         words_per_line=3, H=1600, W=1300, speckles=30,
                         angle=0.4)
        image, eroded, _ = preprocess_images(page.image, backend="hybrid")
        ls, _, _ = identify_text_lines(image, eroded, backend="hybrid",
                                       verbose=False)
        strips.extend(np.asarray(s.img) for s in ls)
    assert len(strips) >= 64, len(strips)
    packed_meta, hs, ws, Wp = rec._pack_strips(strips)
    t_max = rec._initial_t_max(Wp, ws[: len(strips)])
    fused = jax.jit(functools.partial(
        _recognize_device, t_max=t_max, target_height=48, pad=16,
        max_regions=128, decode="region"))
    pj = jnp.asarray(packed_meta)
    rows = {}
    from text_alignment_tpu.models import lineest_pallas

    for mode in ("pallas", "full"):
        os.environ["TEXT_ALIGNMENT_TPU_TAIL"] = mode
        jax.clear_caches()
        lineest_pallas._jit_tail.cache_clear()
        lineest_pallas._jit_full.cache_clear()
        rows[mode] = _unpack_wire_rows(np.asarray(fused(params, pj)))
    os.environ.pop("TEXT_ALIGNMENT_TPU_TAIL", None)
    wa, wb = rows["pallas"], rows["full"]
    B = len(strips)
    n_same = 0
    for b in range(B):
        ca, cb = wa[b, 0], wb[b, 0]
        assert ca == cb, (b, ca, cb)
        # classes occupy the second slot of each (frame, class) pair
        assert np.array_equal(wa[b, 2:1 + 2 * ca:2],
                              wb[b, 2:1 + 2 * cb:2]), b
        if np.array_equal(wa[b, 1:1 + 2 * ca], wb[b, 1:1 + 2 * cb]):
            n_same += 1
    assert n_same >= 0.95 * B, (n_same, B)
