// Native host-side runtime ops for pcseg_tpu.
//
// The per-region finalize pass runs inherently-sequential walks on the host
// (SURVEY.md §7: boundary ordering stays host-side). This library provides
// them in C++ for production-rate frame finalization, loaded via ctypes
// (pcseg_tpu/native/__init__.py) with a NumPy fallback.
//
//   pcseg_moore_trace: the reference's Moore boundary walk
//     (planar_region.h:295-353 + planar_region.cc:26-65) over a boolean
//     member mask, including the one-pixel-branch revisit handling.
//     Conscious divergence (documented in models/boundary.py + CLAUDE.md):
//     the reference's sweep backtracks to the previous boundary PIXEL and
//     loses which side the background is on — near single-pixel notches
//     the walk enters parasitic 3-cycles, and its stop rule fires early
//     on thin appendage tips, rejecting arbitrarily large regions by
//     area. This is textbook Moore-neighbor tracing with background
//     backtracking + Jacob's termination criterion instead.
//   pcseg_flood_outside: border-connected non-member flood fill (used to
//     pick an outer-boundary start pixel).
//
// Build: g++ -O3 -shared -fPIC -std=c++17 -o libpcseg_hostops.so hostops.cc

#include <cstdint>
#include <vector>

namespace {

struct Dir {
  int dx, dy, didx;  // dx = col step, dy = row step, didx = dx*rows + dy
};

void neighborhood8(int rows, Dir out[8]) {
  const Dir dirs[8] = {{-1, 0, -rows},       {-1, -1, -rows - 1},
                       {0, -1, -1},          {1, -1, rows - 1},
                       {1, 0, rows},         {1, 1, rows + 1},
                       {0, 1, 1},            {-1, 1, -rows + 1}};
  for (int i = 0; i < 8; ++i) out[i] = dirs[i];
}

}  // namespace

extern "C" {

// Trace the boundary of the true-region of `mask` (col-major linear
// addressing: idx = x*rows + y) starting from `start_idx`.
// `b_dir0` is the entry-background direction index (ring order); pass 0
// (West) with the canonical col-major-first start — the textbook
// configuration whose orbit provably closes. Pass -1 for the first
// in-bounds non-member neighbor in table order (arbitrary starts; may
// trace a hole ring or fail to close).
// Returns the number of boundary indices written to `out` (capacity
// `out_cap`), 0 if start is not on a boundary or the orbit fails to
// close within the step cap, or -1 on overflow.
int64_t pcseg_moore_trace(const uint8_t* mask, int32_t rows, int32_t cols,
                          int64_t start_idx, int32_t b_dir0, int64_t* out,
                          int64_t out_cap) {
  Dir dirs[8];
  neighborhood8(rows, dirs);
  auto at = [&](int64_t idx) -> bool { return mask[idx] != 0; };

  int64_t curr_idx = start_idx;
  int32_t curr_x = int32_t(start_idx / rows);
  int32_t curr_y = int32_t(start_idx % rows);

  int b_dir = b_dir0;
  if (b_dir < 0) {
    for (int i = 0; i < 8; ++i) {
      int x = curr_x + dirs[i].dx, y = curr_y + dirs[i].dy;
      if (x >= 0 && x < cols && y >= 0 && y < rows &&
          !at(curr_idx + dirs[i].didx)) {
        b_dir = i;
        break;
      }
    }
    if (b_dir < 0) return 0;
  }

  // REL[m]: direction index of dirs[m-1] - dirs[m] (the new pixel's view
  // of the last background cell scanned before entering it).
  int rel[8];
  for (int m = 0; m < 8; ++m) {
    int vx = dirs[(m + 7) % 8].dx - dirs[m].dx;
    int vy = dirs[(m + 7) % 8].dy - dirs[m].dy;
    for (int i = 0; i < 8; ++i) {
      if (dirs[i].dx == vx && dirs[i].dy == vy) {
        rel[m] = i;
        break;
      }
    }
  }

  int64_t n = 0;
  if (n >= out_cap) return -1;
  out[n++] = start_idx;
  // Terminate on ANY (pixel, background-direction) state recurrence: the
  // walk map is deterministic, so the first repeat closes the contour
  // cycle (the initial state may be a 1-state tail when the re-entry
  // background differs from the seeded West anchor).
  std::vector<uint8_t> seen(int64_t(rows) * cols, 0);
  seen[start_idx] = uint8_t(1u << b_dir);
  while (true) {
    int new_dir = -1;
    for (int delta = 1; delta <= 8; ++delta) {
      int ndi = (b_dir + delta) % 8;
      int x = curr_x + dirs[ndi].dx, y = curr_y + dirs[ndi].dy;
      if (x >= 0 && x < cols && y >= 0 && y < rows &&
          at(curr_idx + dirs[ndi].didx)) {
        new_dir = ndi;
        break;
      }
    }
    if (new_dir < 0) return n;  // isolated pixel
    b_dir = rel[new_dir];
    curr_idx += dirs[new_dir].didx;
    curr_x += dirs[new_dir].dx;
    curr_y += dirs[new_dir].dy;

    const uint8_t bit = uint8_t(1u << b_dir);
    if (seen[curr_idx] & bit) return n;
    seen[curr_idx] |= bit;
    if (n >= out_cap) return -1;
    out[n++] = curr_idx;
  }
}

// Mark all non-member cells 4-connected to the grid border.
// mask/out are col-major [rows*cols] uint8; out must be zero-initialized.
void pcseg_flood_outside(const uint8_t* mask, int32_t rows, int32_t cols,
                         uint8_t* out) {
  std::vector<int64_t> stack;
  auto push = [&](int64_t idx) {
    if (!mask[idx] && !out[idx]) {
      out[idx] = 1;
      stack.push_back(idx);
    }
  };
  for (int32_t x = 0; x < cols; ++x) {
    push(int64_t(x) * rows);
    push(int64_t(x) * rows + rows - 1);
  }
  for (int32_t y = 0; y < rows; ++y) {
    push(y);
    push(int64_t(cols - 1) * rows + y);
  }
  while (!stack.empty()) {
    int64_t idx = stack.back();
    stack.pop_back();
    int32_t x = int32_t(idx / rows), y = int32_t(idx % rows);
    if (y > 0) push(idx - 1);
    if (y + 1 < rows) push(idx + 1);
    if (x > 0) push(idx - rows);
    if (x + 1 < cols) push(idx + rows);
  }
}

}  // extern "C"

extern "C" {

// Andrew monotone-chain 2-D convex hull over [n, 2] float64 points (already
// deduplicated + lexsorted by the caller). Writes CCW hull vertex INDICES
// into ``out`` (capacity n) and returns their count. Moved from the
// pure-Python hostgeom.convex_hull_2d: the per-point Python loop was the
// host finalize's hottest spot (~43 ms/VGA-frame; this is ~microseconds).
int64_t pcseg_convex_hull_2d(const double* pts, int64_t n, int64_t* out) {
  if (n <= 2) {
    for (int64_t i = 0; i < n; ++i) out[i] = i;
    return n;
  }
  auto cross = [&](int64_t o, int64_t a, int64_t b) {
    const double ox = pts[2 * o], oy = pts[2 * o + 1];
    return (pts[2 * a] - ox) * (pts[2 * b + 1] - oy) -
           (pts[2 * a + 1] - oy) * (pts[2 * b] - ox);
  };
  std::vector<int64_t> h(2 * n);
  int64_t k = 0;
  for (int64_t i = 0; i < n; ++i) {  // lower
    while (k >= 2 && cross(h[k - 2], h[k - 1], i) <= 0) --k;
    h[k++] = i;
  }
  const int64_t lower = k + 1;
  for (int64_t i = n - 2; i >= 0; --i) {  // upper
    while (k >= lower && cross(h[k - 2], h[k - 1], i) <= 0) --k;
    h[k++] = i;
  }
  --k;  // last point == first
  for (int64_t i = 0; i < k; ++i) out[i] = h[i];
  return k;
}

}  // extern "C"
