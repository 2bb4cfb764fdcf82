"""Native C++ raster engine parity vs the numpy oracle."""

import numpy as np
import pytest

from text_alignment_tpu.ops import oracle, host_native

pytestmark = pytest.mark.skipif(
    not host_native.available(), reason="native toolchain unavailable"
)


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(99)


def _page(rng, h=150, w=200, density=0.3):
    return rng.random((h, w)) < density


def test_cc_label_matches_oracle(rng):
    img = _page(rng)
    lab_n, n_n = host_native.cc_label(img)
    lab_o, n_o = oracle.label_ccs(img)
    assert n_n == n_o
    np.testing.assert_array_equal(lab_n, lab_o)


def test_cc_stats_matches_oracle(rng):
    img = _page(rng, density=0.2)
    t_n = host_native.cc_stats(img)
    _, t_o = oracle.cc_stats(img)
    np.testing.assert_array_equal(t_n, t_o)


@pytest.mark.parametrize("k", [1, 4, 12])
def test_despeckle(rng, k):
    img = _page(rng, density=0.15)
    np.testing.assert_array_equal(
        host_native.despeckle(img, k), oracle.despeckle(img, k)
    )


def test_remove_small_and_tall(rng):
    img = _page(rng, density=0.25)
    np.testing.assert_array_equal(
        host_native.remove_small_ccs(img, 10), oracle.remove_small_ccs(img, 10)
    )
    np.testing.assert_array_equal(
        host_native.remove_tall_ccs(img, 8), oracle.remove_tall_ccs(img, 8)
    )


@pytest.mark.parametrize("color", ["black", "white"])
@pytest.mark.parametrize("k", [2, 5])
def test_filter_runs(rng, color, k):
    img = _page(rng, density=0.5)
    np.testing.assert_array_equal(
        host_native.filter_short_runs(img, k, color),
        oracle.filter_short_runs(img, k, color),
    )
    np.testing.assert_array_equal(
        host_native.filter_narrow_runs(img, k, color),
        oracle.filter_narrow_runs(img, k, color),
    )


def test_projection_and_area(rng):
    img = _page(rng)
    np.testing.assert_array_equal(
        host_native.projection_rows(img), oracle.projection_rows(img)
    )
    assert host_native.black_area(img) == oracle.black_area(img)


def test_shear_projections_and_skew(rng):
    from text_alignment_tpu.ops import fixedpoint as fxp

    img = _page(rng, h=120, w=160, density=0.2)
    cands = fxp.angle_grid(-6, 6, 1.0)
    shifts = np.stack([fxp.shear_shifts(a, img.shape[1]) for a in cands])
    native = host_native.shear_projections(img, shifts)
    ref = np.stack([oracle.shear_projection(img, s) for s in shifts])
    np.testing.assert_array_equal(native, ref)
    assert host_native.rotation_angle_projections(
        img, -6, 6
    ) == oracle.rotation_angle_projections(img, -6, 6)


def test_shear_projections_runs_block_edges(rng):
    """Direct fuzz of the runs-based shear projection entry point across
    angle-row counts that exercise every dispatch branch: the AVX-512
    8-lane blocks (full + partial A%8), the A<4 scalar fallback, and the
    empty-runs edge. Counters must be bit-identical to the per-pixel
    oracle replay for each shift row."""
    import ctypes

    from text_alignment_tpu.ops import fixedpoint as fxp
    from text_alignment_tpu.ops.host_native import _black_runs, _lib

    for W, density in ((160, 0.2), (80, 0.0)):
        img = _page(rng, h=120, w=W, density=density)
        runs, n = _black_runs(img.astype(np.uint8))
        for A in (1, 2, 3, 4, 5, 7, 8, 9, 13, 19):
            angles = np.linspace(-6, 6, A)
            shifts = np.ascontiguousarray(
                np.stack([fxp.shear_shifts(a, W) for a in angles]), np.int32
            )
            proj = np.empty((A, img.shape[0]), np.int32)
            _lib.ta_shear_projections_runs32(
                runs.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), n,
                shifts.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                A, img.shape[0], W,
                proj.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            )
            ref = np.stack([oracle.shear_projection(img, s) for s in shifts])
            np.testing.assert_array_equal(proj.astype(np.int64), ref)


def test_greyscale_onebit(rng):
    rgb = (rng.random((40, 50, 3)) * 255).astype(np.uint8)
    rgba = (rng.random((40, 50, 4)) * 255).astype(np.uint8)
    grey = (rng.random((40, 50)) * 255).astype(np.uint8)
    for img in (rgb, rgba, grey):
        np.testing.assert_array_equal(
            host_native.to_greyscale(img), oracle.to_greyscale(img)
        )
        np.testing.assert_array_equal(
            host_native.to_onebit(img), oracle.to_onebit(img)
        )


def test_rotate_onebit(rng):
    img = _page(rng, h=90, w=120, density=0.2)
    for ang in (0.0, 0.8, -2.3, 5.5):
        np.testing.assert_array_equal(
            host_native.rotate_onebit(img, ang),
            oracle.rotate_onebit(img, ang),
        )


def test_preproc_stage1_fused(rng):
    img = _page(rng, h=120, w=160, density=0.25)
    ref = oracle.despeckle(img, 8)
    ref = ~oracle.despeckle(~ref, 8)
    ref = oracle.remove_tall_ccs(ref, 10)
    np.testing.assert_array_equal(host_native.preproc_stage1(img, 8, 10), ref)


def test_skew_coords_matches_oracle(rng):
    img = _page(rng, h=150, w=220, density=0.15)
    assert host_native.rotation_angle_projections(
        img, -6, 6
    ) == oracle.rotation_angle_projections(img, -6, 6)


def test_erode2_matches_oracle_filters(rng):
    # structured strokes AND bernoulli noise: both border and interior cases
    for density in (0.1, 0.5):
        img = _page(rng, h=70, w=90, density=density)
        ref = oracle.filter_narrow_runs(
            oracle.filter_short_runs(img, 2, "black"), 2, "black"
        )
        np.testing.assert_array_equal(host_native.erode2(img), ref)
    # degenerate 1-row / 1-col pages
    np.testing.assert_array_equal(
        host_native.erode2(np.ones((1, 5), bool)),
        oracle.filter_narrow_runs(
            oracle.filter_short_runs(np.ones((1, 5), bool), 2, "black"),
            2, "black"),
    )
    np.testing.assert_array_equal(
        host_native.erode2(np.ones((5, 1), bool)),
        oracle.filter_narrow_runs(
            oracle.filter_short_runs(np.ones((5, 1), bool), 2, "black"),
            2, "black"),
    )


def test_skew_runs_replay_matches_oracle(rng):
    # the runs-based replay must equal oracle's estimate exactly, including
    # on a page with long runs that straddle shift-cell boundaries
    img = _page(rng, h=150, w=220, density=0.15)
    img[40:43, 10:200] = True  # full-width bars: multi-cell runs
    img[90:92, 5:215] = True
    assert host_native.rotation_angle_projections(
        img, -6, 6
    ) == oracle.rotation_angle_projections(img, -6, 6)


def test_adjacent_unique_matches_np_unique():
    from text_alignment_tpu.ops import fixedpoint as fxp

    W = 900
    for lo, hi, step in ((-6.0, 6.0, 1.0), (-1.53, 0.27, 0.1),
                         (-0.723, -0.543, 0.01)):
        cands = fxp.angle_grid(lo, hi, step)
        shifts = np.stack([fxp.shear_shifts(a, W) for a in cands]).astype(
            np.int32
        )
        uniq, inv = host_native._adjacent_unique(shifts)
        ref_u, ref_inv = np.unique(shifts, axis=0, return_inverse=True)
        # same reconstruction => same scores/argmax downstream
        np.testing.assert_array_equal(uniq[inv], ref_u[ref_inv])
        assert len(uniq) == len(ref_u)


def test_preprocess_page_matches_staged(rng):
    rgb = (rng.random((140, 180, 3)) * 255).astype(np.uint8)
    rgb[30:60, 20:160] = 10  # some "text" mass so skew search has signal
    rgb[80:105, 30:150] = 15
    for correct_rotation in (True, False):
        got_bin, got_er, got_ang = host_native.preprocess_page(
            rgb, 20, 50, 1, 2, correct_rotation
        )
        img = oracle.to_onebit(rgb)
        img = oracle.despeckle(img, 20)
        img = ~oracle.despeckle(~img, 20)
        img = oracle.remove_tall_ccs(img, 50)
        ang = oracle.rotation_angle_projections(img, -6, 6)
        if correct_rotation:
            img = oracle.rotate_onebit(img, ang)
        er = oracle.filter_narrow_runs(
            oracle.filter_short_runs(img, 2, "black"), 2, "black"
        )
        assert got_ang == ang
        np.testing.assert_array_equal(got_bin, img)
        np.testing.assert_array_equal(got_er, er)


def test_greyscale_hist_fused(rng):
    """Fused greyscale+histogram == staged greyscale then bincount, for
    grey/RGB/RGBA inputs incl. the opaque fast path."""
    for C in (1, 3, 4):
        for opaque in (False, True):
            shape = (37, 53) if C == 1 else (37, 53, C)
            img = rng.integers(0, 256, shape, dtype=np.uint8)
            if C == 4 and opaque:
                img[..., 3] = 255
            g_ref = oracle.to_greyscale(img)
            h_ref = np.bincount(g_ref.ravel(), minlength=256).astype(np.int64)
            g, h = host_native._greyscale_hist(img)
            np.testing.assert_array_equal(g, g_ref)
            np.testing.assert_array_equal(h, h_ref)


def test_stage1_runs_export(rng):
    """The run-domain fused stage 1 paints the same page as the staged
    oracle ops AND its exported run list reconstructs that page exactly."""
    for trial in range(4):
        h = int(rng.integers(40, 200))
        w = int(rng.integers(40, 200))
        img = (rng.random((h, w)) < float(rng.uniform(0.05, 0.45)))
        k = int(rng.integers(1, 30))
        sat = int(rng.integers(3, 40))
        ref = oracle.despeckle(img, k)
        ref = ~oracle.despeckle(~ref, k)
        ref = oracle.remove_tall_ccs(ref, sat)
        a = img.astype(np.uint8)
        runs, n = host_native._stage1_runs(a, k, sat)
        np.testing.assert_array_equal(a.view(bool), ref)
        rec = np.zeros((h, w), np.uint8)
        for y, xs, xe in runs[: 3 * n].reshape(-1, 3):
            rec[y, xs:xe] = 1
        np.testing.assert_array_equal(rec, a)


def test_rotate_runs_matches_pixel_rotate(rng):
    """Run-interval rotate == the per-pixel Q16 inverse-map rotate."""
    for trial, ang in enumerate((0.0, 0.8, -2.3, 5.5, -5.9, 3.14159)):
        h = int(rng.integers(30, 180))
        w = int(rng.integers(30, 180))
        img = (rng.random((h, w)) < 0.15).astype(np.uint8)
        ref = host_native._rotate_u8(img, ang)
        runs, n = host_native._black_runs(img)
        got = host_native._rotate_runs_u8(runs, n, h, w, ang)
        np.testing.assert_array_equal(got, ref)


def test_cc_stats_masked_matches_erased_copy(rng):
    img = _page(rng, h=140, w=180, density=0.25)
    mask = np.zeros(140, bool)
    for i in (12, 60, 61, 130):
        mask[i : i + 2] = True
    cut = img.copy()
    cut[mask] = False
    np.testing.assert_array_equal(
        host_native.cc_stats_masked(img.astype(np.uint8), mask),
        host_native.cc_stats(cut.astype(np.uint8)),
    )


def test_new_native_paths_degenerate_inputs(rng):
    """Empty pages, single-row/column pages, boundary angles."""
    # empty page: no runs anywhere
    empty = np.zeros((40, 60), np.uint8)
    runs, n = host_native._stage1_runs(empty.copy(), 5, 10)
    assert n == 0
    got = host_native._rotate_runs_u8(runs, 0, 40, 60, 3.0)
    np.testing.assert_array_equal(got, host_native._rotate_u8(empty, 3.0))
    # all-black page (one giant CC), boundary angles +-6
    full = np.ones((30, 50), np.uint8)
    runs, n = host_native._black_runs(full)
    for ang in (6.0, -6.0):
        np.testing.assert_array_equal(
            host_native._rotate_runs_u8(runs, n, 30, 50, ang),
            host_native._rotate_u8(full, ang),
        )
    # 1-row and 1-col pages through the fused grey->stage1 entry
    for shape in ((1, 40), (40, 1)):
        grey = (rng.random(shape) * 255).astype(np.uint8)
        img = oracle.to_onebit(grey)
        ref = oracle.despeckle(img, 2)
        ref = ~oracle.despeckle(~ref, 2)
        ref = oracle.remove_tall_ccs(ref, 5)
        got_bin, got_er, _ = host_native.preprocess_page(
            grey, 2, 5, 1, 2, False
        )
        np.testing.assert_array_equal(got_bin, ref)


def test_preprocess_page_rgba_alpha(rng):
    """RGBA input with a real alpha channel through the fused chain."""
    rgba = (rng.random((90, 120, 4)) * 255).astype(np.uint8)
    rgba[20:40, 10:110] = (10, 10, 10, 255)
    rgba[60:75, 15:100] = (5, 5, 5, 200)  # semi-transparent ink
    got_bin, got_er, got_ang = host_native.preprocess_page(
        rgba, 10, 40, 1, 2, True
    )
    img = oracle.to_onebit(rgba)
    img = oracle.despeckle(img, 10)
    img = ~oracle.despeckle(~img, 10)
    img = oracle.remove_tall_ccs(img, 40)
    ang = oracle.rotation_angle_projections(img, -6, 6)
    img = oracle.rotate_onebit(img, ang)
    er = oracle.filter_narrow_runs(
        oracle.filter_short_runs(img, 2, "black"), 2, "black"
    )
    assert got_ang == ang
    np.testing.assert_array_equal(got_bin, img)
    np.testing.assert_array_equal(got_er, er)


def test_cc_stats_masked_all_and_none(rng):
    img = _page(rng, h=50, w=60, density=0.3)
    # all rows masked: no components at all
    assert len(host_native.cc_stats_masked(
        img.astype(np.uint8), np.ones(50, bool))) == 0
    # no rows masked: identical to plain cc_stats
    np.testing.assert_array_equal(
        host_native.cc_stats_masked(img.astype(np.uint8),
                                    np.zeros(50, bool)),
        host_native.cc_stats(img.astype(np.uint8)),
    )


def test_greyscale_rejects_unsupported_channels(rng):
    la = rng.integers(0, 256, (20, 30, 2), dtype=np.uint8)
    with pytest.raises(ValueError):
        host_native.to_greyscale(la)
    with pytest.raises(ValueError):
        host_native._greyscale_hist(la)
    # all three engines share the contract (the oracle used to raise a
    # bare IndexError; the device path traced through to a gather error)
    with pytest.raises(ValueError):
        oracle.to_greyscale(la)
    from text_alignment_tpu.ops import device

    with pytest.raises(ValueError):
        device.to_greyscale(la)


def test_run_extraction_word_boundary_widths(rng):
    """The AVX-512 run-mask path decodes runs from 64-px mask words; pin
    exactness at widths that straddle word boundaries, plus all-black and
    alternating rows (worst-case toggle density) against the oracle."""
    for w in (1, 2, 63, 64, 65, 127, 128, 129, 191, 192, 200):
        for kind in ("random", "black", "alt", "edges"):
            h = 5
            if kind == "random":
                img = (rng.random((h, w)) < 0.4)
            elif kind == "black":
                img = np.ones((h, w), bool)
            elif kind == "alt":
                img = np.zeros((h, w), bool)
                img[:, ::2] = True
            else:  # single pixels at both edges
                img = np.zeros((h, w), bool)
                img[:, 0] = True
                img[:, -1] = True
            a = img.astype(np.uint8)
            runs, n = host_native._black_runs(a)
            rec = np.zeros((h, w), np.uint8)
            total = 0
            for y, xs, xe in runs[: 3 * n].reshape(-1, 3):
                assert 0 <= xs < xe <= w
                rec[y, xs:xe] = 1
                total += xe - xs
            np.testing.assert_array_equal(rec.view(bool), img)
            assert total == int(img.sum())
            # labeling (extract_runs path) must agree with the oracle too
            lab_n, n_n = host_native.cc_label(img)
            lab_o, n_o = oracle.label_ccs(img)
            assert n_n == n_o
            np.testing.assert_array_equal(lab_n, lab_o)


def test_nearest_higher_matches_python_stacks(rng=np.random.default_rng(3)):
    """Native monotonic-stack neighbor search ≡ the Python fallback in
    ops/projections (exact float64 comparisons, tie semantics included)."""
    for trial in range(100):
        n = int(rng.integers(1, 80))
        vals = rng.choice([0.0, 1.0, 2.5, 3.0, 7.25, 7.25], size=n).tolist()
        hl, hr = host_native.nearest_higher(np.array(vals))
        HL = [0] * n
        st = []
        for i in range(n):
            while st and vals[st[-1]] <= vals[i]:
                st.pop()
            HL[i] = st[-1] if st else -1
            st.append(i)
        HR = [0] * n
        st = []
        for i in range(n - 1, -1, -1):
            while st and vals[st[-1]] <= vals[i]:
                st.pop()
            HR[i] = st[-1] if st else n
            st.append(i)
        assert hl.tolist() == HL and hr.tolist() == HR


def test_simd_greyscale_matches_scalar_formula(rng=np.random.default_rng(9)):
    """The VBMI RGB->grey path (16-px blocks + exact two-step /1000 magic)
    must equal the scalar reference formula at every tail length and at
    saturated channel values."""
    for n in (1, 15, 16, 17, 31, 32, 48, 63, 64, 100, 1000):
        img = rng.integers(0, 256, (1, n, 3), np.uint8)
        img[0, rng.random(n) < 0.25] = 255
        img[0, rng.random(n) < 0.25] = 0
        grey, hist = host_native._greyscale_hist(img)
        r, g, b = (img[0, :, c].astype(np.int64) for c in range(3))
        ref = ((299 * r + 587 * g + 114 * b + 500) // 1000).astype(np.uint8)
        np.testing.assert_array_equal(grey.reshape(-1), ref)
        counts = np.bincount(ref, minlength=256)
        np.testing.assert_array_equal(hist, counts)


def test_rotate_runs2_emits_rotated_runs(rng):
    """ta_rotate_runs2: same pixels as ta_rotate_runs, plus the rotated
    page's maximal black runs — identical to re-extracting them."""
    for ang in (0.0, 0.8, -2.3, 5.5, -5.9):
        h = int(rng.integers(30, 180))
        w = int(rng.integers(30, 180))
        img = (rng.random((h, w)) < 0.2).astype(np.uint8)
        runs, n = host_native._black_runs(img)
        out, oruns, m = host_native.rotate_runs2(runs, n, h, w, ang)
        ref = host_native._rotate_runs_u8(runs, n, h, w, ang)
        np.testing.assert_array_equal(out, ref)
        rruns, rm = host_native._black_runs(ref)
        assert m == rm
        np.testing.assert_array_equal(oruns[: 3 * m], rruns[: 3 * rm])


def test_erode_runs_matches_pixel_erode(rng):
    """Run-domain erode2 == pixel erode2 (runs + row projection)."""
    for density in (0.05, 0.3, 0.6):
        h = int(rng.integers(2, 150))
        w = int(rng.integers(2, 200))
        img = (rng.random((h, w)) < density).astype(np.uint8)
        runs, n = host_native._black_runs(img)
        eruns, m, proj = host_native.erode_runs(runs, n, h)
        ref = host_native._erode2_u8(img)
        ref_runs, ref_m = host_native._black_runs(ref)
        assert m == ref_m
        np.testing.assert_array_equal(eruns[: 3 * m], ref_runs[: 3 * ref_m])
        np.testing.assert_array_equal(proj, host_native.projection_rows(ref))
    # degenerate single-row / single-col pages
    for shape in ((1, 7), (7, 1)):
        img = np.ones(shape, np.uint8)
        runs, n = host_native._black_runs(img)
        eruns, m, proj = host_native.erode_runs(runs, n, shape[0])
        ref = host_native._erode2_u8(img)
        ref_runs, ref_m = host_native._black_runs(ref)
        assert m == ref_m
        np.testing.assert_array_equal(proj, host_native.projection_rows(ref))


def test_cc_stats_from_runs_matches_masked(rng):
    img = _page(rng, h=140, w=180, density=0.25)
    mask = np.zeros(140, bool)
    for i in (12, 60, 61, 130):
        mask[i : i + 2] = True
    runs, n = host_native._black_runs(img.astype(np.uint8))
    np.testing.assert_array_equal(
        host_native.cc_stats_from_runs(runs, n, 140, mask),
        host_native.cc_stats_masked(img.astype(np.uint8), mask),
    )
    # no mask
    np.testing.assert_array_equal(
        host_native.cc_stats_from_runs(runs, n, 140, None),
        host_native.cc_stats(img.astype(np.uint8)),
    )


def test_pack_runs_into_matches_packbits(rng):
    for trial in range(5):
        h = int(rng.integers(1, 80))
        w = int(rng.integers(1, 200))
        img = (rng.random((h, w)) < 0.4).astype(np.uint8)
        runs, n = host_native._black_runs(img)
        stride = (w + 7) // 8 + int(rng.integers(0, 4))
        dest = np.zeros((h, stride), np.uint8)
        host_native.pack_runs_into(runs, n, dest)
        ref = np.zeros((h, stride), np.uint8)
        ref[:, : (w + 7) // 8] = np.packbits(img, axis=1, bitorder="little")
        np.testing.assert_array_equal(dest, ref)


def test_phase2_runs_matches_phase2(rng):
    """Fused run-domain phase 2 == pixel phase 2 + projection + cc table."""
    from text_alignment_tpu.ops import host_native as hn

    img = (_page(rng, h=160, w=220, density=0.12)).astype(np.uint8)
    hn._lib.ta_preproc_stage1(hn._u8p(img), 160, 220, 10, 150, 0)
    runs, n = hn._black_runs(img)
    for angle in (0.37, -1.2, 0.0):
        ib_ref, ie_ref = hn.preprocess_page_phase2(
            img.copy(), runs, n, angle, 1, 2, True)
        ib, eruns, m, proj = hn.preprocess_page_phase2_runs(
            img.copy(), runs, n, angle, True)
        np.testing.assert_array_equal(ib, ib_ref)
        np.testing.assert_array_equal(
            proj, hn.projection_rows(np.asarray(ie_ref)))
        ref_runs, ref_m = hn._black_runs(np.asarray(ie_ref).view(np.uint8))
        assert m == ref_m
        np.testing.assert_array_equal(eruns[: 3 * m], ref_runs[: 3 * ref_m])
