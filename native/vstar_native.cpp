// vstar_tpu native helpers (C++, ctypes ABI).
//
// The reference leans on external native code for its host-side hot spots:
// scipy's C linear_sum_assignment for DETR matching (matcher.py:102) and
// pycocotools' C RLE codec (dataset.py:10). These are their in-tree
// TPU-framework equivalents, built with g++ by vstar_tpu/native.py and
// loaded over ctypes; pure-python fallbacks exist for every entry point.
//
// Exported ABI (all extern "C"):
//   hungarian_solve(cost[q*t] f32, q, t, out_row_for_col[t] i32)
//     rectangular assignment (q >= t) minimizing total cost via the
//     Jonker-Volgenant shortest augmenting path algorithm, O(t * q * t).
//   rle_decode_counts(counts i64[n], n, h, w, out u8[h*w])
//     COCO column-major RLE -> row-major mask.
//   bilinear_resize(in f32[ih*iw], ih, iw, out f32[oh*ow], oh, ow)
//     half-pixel-center bilinear (torch align_corners=false semantics),
//     used to upscale 192x192 heatmaps to multi-megapixel patches.

#include <cfloat>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// Rectangular assignment (Jonker-Volgenant, shortest augmenting paths).
// cost is row-major [q][t]; q >= t required. out_row_for_col[j] = matched
// row for column j.
// ---------------------------------------------------------------------------
int hungarian_solve(const float* cost, int q, int t, int* out_row_for_col) {
  if (t == 0) return 0;
  if (q < t) return -1;

  // potentials
  std::vector<double> u(q + 1, 0.0), v(t + 1, 0.0);
  // p[j] = row matched to column j (1-based; 0 = virtual)
  std::vector<int> p(t + 1, 0);
  std::vector<int> way(t + 1, 0);

  // Classic Hungarian with rows as "workers" assigned one by one would be
  // O(q * t^2) with q up to 2304 — instead assign each COLUMN a row
  // (t columns, each augmenting path scans q rows): O(t * q * t).
  // Transposed formulation: treat columns as the scarce side.
  std::vector<double> minv;
  std::vector<char> used;
  // pc[i] = column matched to row i (1-based over rows; 0 none)
  std::vector<int> pc(q + 1, 0);

  // potentials for transposed problem
  std::vector<double> uu(t + 1, 0.0), vv(q + 1, 0.0);
  std::vector<int> wayr(q + 1, 0);

  for (int j = 1; j <= t; ++j) {
    // find augmenting path for column j over rows
    int i0 = 0;           // current row (0 = virtual start)
    uu[j] = 0;            // handled by algorithm below
    minv.assign(q + 1, DBL_MAX);
    used.assign(q + 1, 0);
    int j0 = j;           // current column in alternating tree
    int i_free = 0;
    used[0] = 1;
    i0 = 0;
    // p-style loop from e-maxx adapted to transposed (columns assign rows)
    // state: j0 = column whose row we search
    std::vector<int> colv(q + 1, 0);
    double delta;
    int i1 = -1;
    do {
      used[i0] = 1;
      int jcur = (i0 == 0) ? j : colv[i0];
      delta = DBL_MAX;
      i1 = -1;
      for (int i = 1; i <= q; ++i) {
        if (used[i]) continue;
        double cur = (double)cost[(size_t)(i - 1) * t + (jcur - 1)]
                     - uu[jcur] - vv[i];
        if (cur < minv[i]) {
          minv[i] = cur;
          wayr[i] = i0;
        }
        if (minv[i] < delta) {
          delta = minv[i];
          i1 = i;
        }
      }
      // update potentials
      for (int i = 0; i <= q; ++i) {
        if (used[i]) {
          int jj = (i == 0) ? j : colv[i];
          uu[jj] += delta;
          vv[i] -= delta;
        } else {
          minv[i] -= delta;
        }
      }
      i0 = i1;
      if (pc[i0] == 0) break;      // free row found
      colv[i0] = pc[i0];
    } while (true);

    // augment: walk back through wayr
    while (i0 != 0) {
      int iprev = wayr[i0];
      int jj = (iprev == 0) ? j : colv[iprev];
      pc[i0] = jj;
      colv[i0] = jj;
      i0 = iprev;
    }
  }

  for (int j = 0; j <= t; ++j) p[j] = 0;
  for (int i = 1; i <= q; ++i) {
    if (pc[i] > 0) out_row_for_col[pc[i] - 1] = i - 1;
  }
  return 0;
}

// ---------------------------------------------------------------------------
// COCO RLE decode (column-major counts -> row-major uint8 mask)
// ---------------------------------------------------------------------------
int rle_decode_counts(const int64_t* counts, int n, int h, int w,
                      uint8_t* out) {
  int64_t pos = 0;
  const int64_t total = (int64_t)h * w;
  uint8_t val = 0;
  for (int k = 0; k < n; ++k) {
    int64_t run = counts[k];
    if (pos + run > total) return -1;
    if (val) {
      for (int64_t c = pos; c < pos + run; ++c) {
        // column-major index c -> (row, col)
        int64_t col = c / h;
        int64_t row = c % h;
        out[row * w + col] = 1;
      }
    }
    pos += run;
    val ^= 1;
  }
  return pos == total ? 0 : -1;
}

// ---------------------------------------------------------------------------
// Half-pixel bilinear resize (align_corners=false)
// ---------------------------------------------------------------------------
int bilinear_resize(const float* in, int ih, int iw, float* out, int oh,
                    int ow) {
  for (int y = 0; y < oh; ++y) {
    double fy = ((double)y + 0.5) * ih / oh - 0.5;
    int y0 = (int)std::floor(fy);
    double wy = fy - y0;
    int y0c = y0 < 0 ? 0 : (y0 >= ih ? ih - 1 : y0);
    int y1c = y0 + 1 < 0 ? 0 : (y0 + 1 >= ih ? ih - 1 : y0 + 1);
    for (int x = 0; x < ow; ++x) {
      double fx = ((double)x + 0.5) * iw / ow - 0.5;
      int x0 = (int)std::floor(fx);
      double wx = fx - x0;
      int x0c = x0 < 0 ? 0 : (x0 >= iw ? iw - 1 : x0);
      int x1c = x0 + 1 < 0 ? 0 : (x0 + 1 >= iw ? iw - 1 : x0 + 1);
      double top = in[y0c * iw + x0c] * (1 - wx) + in[y0c * iw + x1c] * wx;
      double bot = in[y1c * iw + x0c] * (1 - wx) + in[y1c * iw + x1c] * wx;
      out[y * ow + x] = (float)(top * (1 - wy) + bot * wy);
    }
  }
  return 0;
}

}  // extern "C"
