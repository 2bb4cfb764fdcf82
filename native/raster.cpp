// Native host raster engine for text_alignment_tpu.
//
// The reference delegated its raster work to Gamera's C++ plugins
// (SURVEY.md §2.9). The TPU path replaces those with XLA kernels; this
// module is the native *host* engine: a drop-in accelerated implementation
// of the numpy oracle's semantics (ops/oracle.py) used by the CPU
// fallback/baseline path and by host-side stage code. Exposed via a plain C
// ABI and loaded with ctypes (no pybind11 in this image).
//
// Semantics contract (must match ops/oracle.py exactly; tested):
// - images are uint8 row-major H x W, nonzero = black;
// - cc_label: 8-connected, labels 1..n in scan order of first pixel;
// - despeckle(k): remove black CCs with area <= k;
// - filter_runs: remove runs of `color` along `axis` with length < k;
// - projections/black area: int64 counts.

#include <cstdint>
#include <cstring>
#include <vector>

namespace {

// union-find over provisional labels
struct UF {
  std::vector<int32_t> parent;
  int32_t make() {
    parent.push_back((int32_t)parent.size());
    return (int32_t)parent.size() - 1;
  }
  int32_t find(int32_t x) {
    while (parent[x] != x) {
      parent[x] = parent[parent[x]];
      x = parent[x];
    }
    return x;
  }
  void unite(int32_t a, int32_t b) {
    a = find(a);
    b = find(b);
    if (a == b) return;
    if (a < b) parent[b] = a; else parent[a] = b;
  }
};

// one horizontal run of black pixels: [xs, xe) on row y
struct Run {
  int32_t y, xs, xe, prov;
};

// Run-based 8-connected labeling: extract black runs per row, unite runs
// that touch runs of the previous row (8-connectivity widens the overlap
// window by one pixel each side), then paint labels run-by-run. Pages are
// ~5-10% ink, so this visits ~n_runs << H*W union-find nodes and the
// remaining work is sequential memory sweeps. Scan-order label ids (1..n),
// identical to the per-pixel two-pass labeling it replaces.
int32_t label_runs(const uint8_t* img, int64_t H, int64_t W,
                   std::vector<Run>& runs, std::vector<int64_t>& row_start,
                   UF& uf, bool black = true) {
  runs.clear();
  row_start.assign(H + 1, 0);
  for (int64_t y = 0; y < H; ++y) {
    const uint8_t* row = img + y * W;
    row_start[y] = (int64_t)runs.size();
    int64_t x = 0;
    while (x < W) {
      if ((row[x] != 0) != black) {
        ++x;
        continue;
      }
      int64_t s = x;
      while (x < W && (row[x] != 0) == black) ++x;
      runs.push_back({(int32_t)y, (int32_t)s, (int32_t)x, -1});
    }
  }
  row_start[H] = (int64_t)runs.size();

  uf.parent.clear();
  uf.parent.reserve(runs.size());
  for (int64_t y = 0; y < H; ++y) {
    int64_t pi = (y > 0) ? row_start[y - 1] : 0;
    const int64_t pe = (y > 0) ? row_start[y] : 0;
    for (int64_t k = row_start[y]; k < row_start[y + 1]; ++k) {
      Run& r = runs[k];
      int32_t best = -1;
      // advance pi past previous-row runs that end left of our window
      while (pi < pe && runs[pi].xe < r.xs) ++pi;
      for (int64_t q = pi; q < pe && runs[q].xs <= r.xe; ++q) {
        int32_t p = runs[q].prov;
        if (best < 0) best = p;
        else uf.unite(best, p);
      }
      if (best < 0) best = uf.make();
      r.prov = best;
    }
  }
  return (int32_t)runs.size();
}

// renumber provisional run labels in scan order of first occurrence;
// returns component count and fills runs[k].prov with final 1-based ids.
int32_t renumber_runs(std::vector<Run>& runs, UF& uf) {
  std::vector<int32_t> remap(uf.parent.size(), 0);
  int32_t n = 0;
  for (auto& r : runs) {
    int32_t root = uf.find(r.prov);
    if (remap[root] == 0) remap[root] = ++n;
    r.prov = remap[root];
  }
  return n;
}

// two-pass 8-connected labeling; fills labels (H*W int32, 0 = background),
// returns number of components. Scan-order label ids (1..n).
int32_t label_impl(const uint8_t* img, int64_t H, int64_t W,
                   int32_t* labels) {
  std::vector<Run> runs;
  std::vector<int64_t> row_start;
  UF uf;
  label_runs(img, H, W, runs, row_start, uf);
  int32_t n = renumber_runs(runs, uf);
  std::memset(labels, 0, sizeof(int32_t) * (size_t)(H * W));
  for (const auto& r : runs) {
    int32_t* dst = labels + (int64_t)r.y * W;
    for (int32_t x = r.xs; x < r.xe; ++x) dst[x] = r.prov;
  }
  return n;
}

// clear (fill white) every run whose component satisfies pred(comp id)
template <class Pred>
void clear_runs_if(uint8_t* img, int64_t W, const std::vector<Run>& runs,
                   Pred pred) {
  for (const auto& r : runs) {
    if (!pred(r.prov)) continue;
    std::memset(img + (int64_t)r.y * W + r.xs, 0, (size_t)(r.xe - r.xs));
  }
}

}  // namespace

extern "C" {

// labels: int32[H*W] out. returns component count.
int32_t ta_cc_label(const uint8_t* img, int64_t H, int64_t W,
                    int32_t* labels) {
  return label_impl(img, H, W, labels);
}

// table: int64[max_ccs*5] out rows (uly, lry, ulx, lrx, area).
// returns count (may exceed max_ccs; only max_ccs rows written).
// Run-based: stats accumulate over runs, never a full label map.
int32_t ta_cc_stats(const uint8_t* img, int64_t H, int64_t W,
                    int64_t* table, int32_t max_ccs) {
  std::vector<Run> runs;
  std::vector<int64_t> row_start;
  UF uf;
  label_runs(img, H, W, runs, row_start, uf);
  int32_t n = renumber_runs(runs, uf);
  std::vector<int64_t> uly(n + 1, INT64_MAX), lry(n + 1, -1),
      ulx(n + 1, INT64_MAX), lrx(n + 1, -1), area(n + 1, 0);
  for (const auto& r : runs) {
    int32_t l = r.prov;
    if (r.y < uly[l]) uly[l] = r.y;
    if (r.y > lry[l]) lry[l] = r.y;
    if (r.xs < ulx[l]) ulx[l] = r.xs;
    if (r.xe - 1 > lrx[l]) lrx[l] = r.xe - 1;
    area[l] += r.xe - r.xs;
  }
  int32_t rows = n < max_ccs ? n : max_ccs;
  for (int32_t k = 1; k <= rows; ++k) {
    int64_t* r = table + (int64_t)(k - 1) * 5;
    r[0] = uly[k]; r[1] = lry[k]; r[2] = ulx[k]; r[3] = lrx[k]; r[4] = area[k];
  }
  return n;
}

// remove black CCs with area <= k, in place.
void ta_despeckle(uint8_t* img, int64_t H, int64_t W, int64_t k) {
  std::vector<Run> runs;
  std::vector<int64_t> row_start;
  UF uf;
  label_runs(img, H, W, runs, row_start, uf);
  int32_t n = renumber_runs(runs, uf);
  std::vector<int64_t> area(n + 1, 0);
  for (const auto& r : runs) area[r.prov] += r.xe - r.xs;
  clear_runs_if(img, W, runs, [&](int32_t l) { return area[l] <= k; });
}

// remove CCs with area < min_area (fill_white small-CC pass), in place.
void ta_remove_small(uint8_t* img, int64_t H, int64_t W, int64_t min_area) {
  std::vector<Run> runs;
  std::vector<int64_t> row_start;
  UF uf;
  label_runs(img, H, W, runs, row_start, uf);
  int32_t n = renumber_runs(runs, uf);
  std::vector<int64_t> area(n + 1, 0);
  for (const auto& r : runs) area[r.prov] += r.xe - r.xs;
  clear_runs_if(img, W, runs, [&](int32_t l) { return area[l] < min_area; });
}

// remove CCs whose row count exceeds max_nrows, in place.
void ta_remove_tall(uint8_t* img, int64_t H, int64_t W, int64_t max_nrows) {
  std::vector<Run> runs;
  std::vector<int64_t> row_start;
  UF uf;
  label_runs(img, H, W, runs, row_start, uf);
  int32_t n = renumber_runs(runs, uf);
  std::vector<int64_t> rmin(n + 1, INT64_MAX), rmax(n + 1, -1);
  for (const auto& r : runs) {
    if (r.y < rmin[r.prov]) rmin[r.prov] = r.y;
    if (r.y > rmax[r.prov]) rmax[r.prov] = r.y;
  }
  clear_runs_if(img, W, runs, [&](int32_t l) {
    return (rmax[l] - rmin[l] + 1) > max_nrows;
  });
}

// remove runs of `color` (1=black, 0=white) with length < k along `axis`
// (0 = vertical runs, 1 = horizontal), in place.
void ta_filter_runs(uint8_t* img, int64_t H, int64_t W, int64_t k,
                    int32_t color, int32_t axis) {
  const uint8_t target = color ? 1 : 0;
  if (axis == 1) {
    for (int64_t y = 0; y < H; ++y) {
      uint8_t* row = img + y * W;
      int64_t x = 0;
      while (x < W) {
        bool is_t = (row[x] != 0) == (target != 0);
        int64_t s = x;
        while (x < W && ((row[x] != 0) == (target != 0)) == is_t) ++x;
        if (is_t && (x - s) < k)
          for (int64_t i = s; i < x; ++i) row[i] = target ? 0 : 1;
      }
    }
  } else {
    for (int64_t x = 0; x < W; ++x) {
      int64_t y = 0;
      while (y < H) {
        bool is_t = (img[y * W + x] != 0) == (target != 0);
        int64_t s = y;
        while (y < H && ((img[y * W + x] != 0) == (target != 0)) == is_t) ++y;
        if (is_t && (y - s) < k)
          for (int64_t i = s; i < y; ++i) img[i * W + x] = target ? 0 : 1;
      }
    }
  }
}

// black pixel count per row. proj: int64[H] out.
void ta_projection_rows(const uint8_t* img, int64_t H, int64_t W,
                        int64_t* proj) {
  for (int64_t y = 0; y < H; ++y) {
    int64_t s = 0;
    const uint8_t* row = img + y * W;
    for (int64_t x = 0; x < W; ++x) s += row[x] != 0;
    proj[y] = s;
  }
}

int64_t ta_black_area(const uint8_t* img, int64_t n) {
  int64_t s = 0;
  for (int64_t i = 0; i < n; ++i) s += img[i] != 0;
  return s;
}

// Row projections of the column-sheared image for A candidate angles
// (the skew-detection hot loop; semantics = oracle.shear_projection:
// sheared[y, x] = img[y + shifts[a, x], x] when in range).
// Sparse formulation: black pixel coordinates are extracted once, then
// each angle costs O(#black) instead of O(H*W) — manuscript pages are
// ~5-10% ink, so the 39-angle coarse-to-fine search runs ~15x faster.
// shifts: int32[A*W]; proj: int64[A*H] out, zeroed here.
void ta_shear_projections(const uint8_t* img, int64_t H, int64_t W,
                          const int32_t* shifts, int64_t A, int64_t* proj) {
  for (int64_t i = 0; i < A * H; ++i) proj[i] = 0;
  std::vector<int32_t> bx, by;
  bx.reserve(1 << 18);
  by.reserve(1 << 18);
  for (int64_t ys = 0; ys < H; ++ys) {
    const uint8_t* row = img + ys * W;
    for (int64_t x = 0; x < W; ++x)
      if (row[x]) {
        by.push_back((int32_t)ys);
        bx.push_back((int32_t)x);
      }
  }
  const int64_t n = (int64_t)bx.size();
  for (int64_t a = 0; a < A; ++a) {
    const int32_t* sh = shifts + a * W;
    int64_t* p = proj + a * H;
    for (int64_t k = 0; k < n; ++k) {
      int64_t y = by[k] - sh[bx[k]];  // destination row: y + shifts[x] == ys
      if (y >= 0 && y < H) p[y]++;
    }
  }
}

// Rotation about center onto an expanded canvas with the shared Q16
// fixed-point formulas (ops/fixedpoint.py) — bit-identical to
// oracle.rotate_onebit / the device rotate gather. out: uint8[H2*W2].
void ta_rotate_onebit(const uint8_t* img, int64_t H, int64_t W,
                      int64_t H2, int64_t W2, int32_t cfix, int32_t sfix,
                      int32_t scale_bits, uint8_t* out) {
  const int64_t S = (int64_t)1 << scale_bits;
  // incremental formulation: along a row, sx2/sy2 advance by constant
  // steps (2*cfix / -2*sfix), so the per-pixel muls become adds; the
  // numerators are identical to the closed form, hence bit-identical.
  const int64_t bx = (W - 1) * S + S, by = (H - 1) * S + S;
  for (int64_t y2 = 0; y2 < H2; ++y2) {
    const int64_t dy2 = 2 * y2 - (H2 - 1);
    uint8_t* orow = out + y2 * W2;
    int64_t sx2 = (int64_t)cfix * (-(W2 - 1)) + (int64_t)sfix * dy2;
    int64_t sy2 = -(int64_t)sfix * (-(W2 - 1)) + (int64_t)cfix * dy2;
    for (int64_t x2 = 0; x2 < W2; ++x2) {
      const int64_t src_x = (sx2 + bx) >> (scale_bits + 1);
      const int64_t src_y = (sy2 + by) >> (scale_bits + 1);
      orow[x2] =
          (src_y >= 0 && src_y < H && src_x >= 0 && src_x < W)
              ? img[src_y * W + src_x]
              : 0;
      sx2 += 2 * (int64_t)cfix;
      sy2 -= 2 * (int64_t)sfix;
    }
  }
}

// Integer luminance greyscale, exact oracle.to_greyscale semantics:
// (299 R + 587 G + 114 B + 500) / 1000, RGBA composited over white first
// ((c * a + 255 * (255 - a) + 127) / 255). C in {1, 3, 4}.
void ta_greyscale(const uint8_t* img, int64_t n_px, int32_t C,
                  uint8_t* out) {
  if (C == 1) {
    std::memcpy(out, img, (size_t)n_px);
    return;
  }
  for (int64_t i = 0; i < n_px; ++i) {
    const uint8_t* p = img + i * C;
    int32_t r = p[0], g = p[1], b = p[2];
    if (C == 4) {
      int32_t a = p[3];
      r = (r * a + 255 * (255 - a) + 127) / 255;
      g = (g * a + 255 * (255 - a) + 127) / 255;
      b = (b * a + 255 * (255 - a) + 127) / 255;
    }
    out[i] = (uint8_t)((299 * r + 587 * g + 114 * b + 500) / 1000);
  }
}

// 256-bin histogram of a uint8 image. hist: int64[256] out, zeroed here.
void ta_grey_histogram(const uint8_t* img, int64_t n, int64_t* hist) {
  for (int32_t i = 0; i < 256; ++i) hist[i] = 0;
  for (int64_t i = 0; i < n; ++i) hist[img[i]]++;
}

// Extract black pixel coordinates once (row-major scan order).
// out_xy: int32[2*max_n] interleaved (y, x). Returns count (may exceed
// max_n; only max_n pairs written).
int64_t ta_black_coords(const uint8_t* img, int64_t H, int64_t W,
                        int32_t* out_xy, int64_t max_n) {
  int64_t n = 0;
  for (int64_t y = 0; y < H; ++y) {
    const uint8_t* row = img + y * W;
    for (int64_t x = 0; x < W; ++x) {
      if (!row[x]) continue;
      if (n < max_n) {
        out_xy[2 * n] = (int32_t)y;
        out_xy[2 * n + 1] = (int32_t)x;
      }
      ++n;
    }
  }
  return n;
}

// Shear projections over precomputed black coordinates (skew refinement
// rounds reuse one extraction). proj: int64[A*H] out, zeroed here.
void ta_shear_projections_coords(const int32_t* xy, int64_t n,
                                 const int32_t* shifts, int64_t A,
                                 int64_t H, int64_t W, int64_t* proj) {
  for (int64_t i = 0; i < A * H; ++i) proj[i] = 0;
  for (int64_t a = 0; a < A; ++a) {
    const int32_t* sh = shifts + a * W;
    int64_t* p = proj + a * H;
    for (int64_t k = 0; k < n; ++k) {
      int64_t y = (int64_t)xy[2 * k] - sh[xy[2 * k + 1]];
      if (y >= 0 && y < H) p[y]++;
    }
  }
}

// Extract black runs once: out_runs int32[3*max_n] rows (y, xs, xe).
// Returns run count (may exceed max_n; only max_n rows written).
int64_t ta_black_runs(const uint8_t* img, int64_t H, int64_t W,
                      int32_t* out_runs, int64_t max_n) {
  int64_t n = 0;
  for (int64_t y = 0; y < H; ++y) {
    const uint8_t* row = img + y * W;
    int64_t x = 0;
    while (x < W) {
      if (!row[x]) { ++x; continue; }
      int64_t s = x;
      while (x < W && row[x]) ++x;
      if (n < max_n) {
        out_runs[3 * n] = (int32_t)y;
        out_runs[3 * n + 1] = (int32_t)s;
        out_runs[3 * n + 2] = (int32_t)x;
      }
      ++n;
    }
  }
  return n;
}

// Shear projections replayed over black RUNS instead of pixels. The shift
// ramp changes value every >= 1/tan(angle) columns (>= ~10 px at the 6 deg
// search limit) while text runs are a few px wide, so most runs fall inside
// one shift cell and cost ONE counter increment for their whole length.
// Bit-identical to the per-pixel replay: increments are merely grouped.
// proj: int64[A*H] out, zeroed here.
void ta_shear_projections_runs(const int32_t* runs, int64_t n,
                               const int32_t* shifts, int64_t A,
                               int64_t H, int64_t W, int64_t* proj) {
  for (int64_t i = 0; i < A * H; ++i) proj[i] = 0;
  // next-boundary index per column: nb[x] = first e > x with sh[e] != sh[x]
  // — lets boundary-straddling runs jump cell to cell instead of scanning
  // the shift ramp pixel by pixel
  std::vector<int32_t> nb((size_t)W);
  for (int64_t a = 0; a < A; ++a) {
    const int32_t* sh = shifts + a * W;
    int64_t* p = proj + a * H;
    nb[W - 1] = (int32_t)W;
    for (int64_t x = W - 2; x >= 0; --x)
      nb[x] = (sh[x + 1] == sh[x]) ? nb[x + 1] : (int32_t)(x + 1);
    for (int64_t k = 0; k < n; ++k) {
      const int32_t y = runs[3 * k], xs = runs[3 * k + 1],
                    xe = runs[3 * k + 2];
      const int32_t s1 = sh[xs], s2 = sh[xe - 1];
      if (s1 == s2) {
        const int64_t yd = (int64_t)y - s1;
        if (yd >= 0 && yd < H) p[yd] += xe - xs;
        continue;
      }
      int32_t x = xs;
      while (x < xe) {
        const int32_t e = nb[x] < xe ? nb[x] : xe;
        const int64_t yd = (int64_t)y - sh[x];
        if (yd >= 0 && yd < H) p[yd] += e - x;
        x = e;
      }
    }
  }
}

// Fused k=2 erosion: filter_short_runs(2,'black') then
// filter_narrow_runs(2,'black'). A black run of length < 2 is a single
// pixel with both along-axis neighbors white, so each pass is a
// neighbor formula over the ORIGINAL pass input (the run-walking loop in
// ta_filter_runs also derives runs from pre-pass pixels) — two streamed
// row-major passes instead of a column-major walk over the whole page.
void ta_erode2(const uint8_t* img, int64_t H, int64_t W, uint8_t* out) {
  std::vector<uint8_t> tmp((size_t)(H * W));
  // vertical pass: keep black px iff a vertical neighbor is black
  for (int64_t y = 0; y < H; ++y) {
    const uint8_t* r = img + y * W;
    const uint8_t* up = (y > 0) ? r - W : nullptr;
    const uint8_t* dn = (y + 1 < H) ? r + W : nullptr;
    uint8_t* t = tmp.data() + y * W;
    if (up && dn) {
      for (int64_t x = 0; x < W; ++x)
        t[x] = r[x] && (up[x] || dn[x]);
    } else if (dn) {
      for (int64_t x = 0; x < W; ++x) t[x] = r[x] && dn[x];
    } else if (up) {
      for (int64_t x = 0; x < W; ++x) t[x] = r[x] && up[x];
    } else {
      std::memset(t, 0, (size_t)W);
    }
  }
  // horizontal pass: keep black px iff a horizontal neighbor is black
  for (int64_t y = 0; y < H; ++y) {
    const uint8_t* t = tmp.data() + y * W;
    uint8_t* o = out + y * W;
    if (W == 1) { o[0] = 0; continue; }
    o[0] = t[0] && t[1];
    for (int64_t x = 1; x < W - 1; ++x)
      o[x] = t[x] && (t[x - 1] || t[x + 1]);
    o[W - 1] = t[W - 1] && t[W - 2];
  }
}

// Threshold a greyscale image to a uint8 onebit page (1 = black = value
// <= thresh), matching oracle.to_onebit's `grey <= t`.
void ta_binarize(const uint8_t* grey, int64_t n, int32_t thresh,
                 uint8_t* out) {
  const uint8_t t = (uint8_t)thresh;
  for (int64_t i = 0; i < n; ++i) out[i] = grey[i] <= t;
}

// Fused preprocessing stage 1 (textAlignPreprocessing.py:166-178), in
// place on a uint8 page: despeckle black CCs (area <= k), despeckle white
// CCs (area <= k, the reference's invert-despeckle-invert), then remove
// CCs taller than sat_thresh rows (the nrows-as-area quirk). One native
// call instead of three Python round-trips with bool<->u8 copies.
void ta_preproc_stage1(uint8_t* img, int64_t H, int64_t W, int64_t k,
                       int64_t sat_thresh) {
  ta_despeckle(img, H, W, k);
  // white despeckle (the reference's invert-despeckle-invert): label WHITE
  // runs directly and fill qualifying small white CCs black — the same
  // result without two full-page invert passes
  {
    std::vector<Run> runs;
    std::vector<int64_t> row_start;
    UF uf;
    label_runs(img, H, W, runs, row_start, uf, /*black=*/false);
    int32_t n = renumber_runs(runs, uf);
    std::vector<int64_t> area(n + 1, 0);
    for (const auto& r : runs) area[r.prov] += r.xe - r.xs;
    for (const auto& r : runs) {
      if (area[r.prov] > k) continue;
      std::memset(img + (int64_t)r.y * W + r.xs, 1, (size_t)(r.xe - r.xs));
    }
  }
  ta_remove_tall(img, H, W, sat_thresh);
}

// Affine-gap Needleman-Wunsch (Gotoh 3-matrix) fill for integer
// match/mismatch scoring, on token ids. Exact reference semantics
// (textSeqCompare.py:45-88): first-max tie-breaks in the reference's
// candidate order, boundary rows use the module-global gap extend, the
// x matrix's unreachable boundary is a large negative sentinel. All
// arithmetic is int64 with the same NEG sentinel as the numpy fast fill
// (align/nw_host.py), so every comparison — hence every pointer — is
// bit-identical. Host pairs are small (chant transcripts, a few hundred
// chars); one scalar row sweep is ~5 ns/cell, far below a device
// round-trip for anything under a few Mcells.
// mat_ptr/x_ptr/y_ptr: int8[N*M] out, fully written.
//
// no-tree-vectorize: g++ 12.2 -O3 miscompiles this loop nest when the
// vectorizer runs (verified: -O0/-O2/UBSan agree, -O3 with AVX diverges on
// one tie-broken cell; the j loop carries y_cur[j-1] so there is nothing
// to vectorize legally anyway).
__attribute__((optimize("no-tree-vectorize")))
void ta_nw_fill(const int32_t* t_ids, int64_t N, const int32_t* o_ids,
                int64_t M, int64_t match, int64_t mismatch, int64_t gox,
                int64_t goy, int64_t gex, int64_t gey, int64_t boundary_ge,
                int8_t* mat_ptr, int8_t* x_ptr, int8_t* y_ptr) {
  const int64_t NEG = -((int64_t)1 << 56);
  std::vector<int64_t> m_prev(M), x_prev(M), y_prev(M), m_cur(M), x_cur(M),
      y_cur(M);
  for (int64_t j = 0; j < M; ++j) {
    m_prev[j] = boundary_ge * j;
    x_prev[j] = boundary_ge * j;
    y_prev[j] = NEG;
  }
  std::memset(mat_ptr, 0, (size_t)(N * M));
  std::memset(x_ptr, 0, (size_t)(N * M));
  std::memset(y_ptr, 0, (size_t)(N * M));
  for (int64_t i = 1; i < N; ++i) {
    m_cur[0] = boundary_ge * i;
    x_cur[0] = NEG;
    y_cur[0] = boundary_ge * i;
    const int32_t ti = t_ids[i - 1];
    int8_t* mp = mat_ptr + i * M;
    int8_t* xp = x_ptr + i * M;
    int8_t* yp = y_ptr + i * M;
    for (int64_t j = 1; j < M; ++j) {
      // mat: diagonal move from (i-1, j-1)
      const int64_t m0 = m_prev[j - 1], m1 = x_prev[j - 1],
                    m2 = y_prev[j - 1];
      int64_t mb = m0;
      int8_t mi = 0;
      if (m1 > mb) { mb = m1; mi = 1; }
      if (m2 > mb) { mb = m2; mi = 2; }
      m_cur[j] = mb + (ti == o_ids[j - 1] ? match : mismatch);
      mp[j] = mi;
      // x: vertical gap from (i-1, j); candidate order m, x, y
      const int64_t x0 = m_prev[j] + gox + gex, x1 = x_prev[j] + gex,
                    x2 = y_prev[j] + gox + gex;
      int64_t xb = x0;
      int8_t xi = 0;
      if (x1 > xb) { xb = x1; xi = 1; }
      if (x2 > xb) { xb = x2; xi = 2; }
      x_cur[j] = xb;
      xp[j] = xi;
      // y: horizontal gap from (i, j-1); candidate order m, x, y
      const int64_t y0 = m_cur[j - 1] + goy + gey,
                    y1 = x_cur[j - 1] + goy + gey, y2 = y_cur[j - 1] + gey;
      int64_t yb = y0;
      int8_t yi = 0;
      if (y1 > yb) { yb = y1; yi = 1; }
      if (y2 > yb) { yb = y2; yi = 2; }
      y_cur[j] = yb;
      yp[j] = yi;
    }
    m_prev.swap(m_cur);
    x_prev.swap(x_cur);
    y_prev.swap(y_cur);
  }
}

int32_t ta_abi_version() { return 7; }

}  // extern "C"
