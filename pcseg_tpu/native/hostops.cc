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
// Returns the number of boundary indices written to `out` (capacity
// `out_cap`), 0 if start is not on a boundary, or -1 on overflow.
int64_t pcseg_moore_trace(const uint8_t* mask, int32_t rows, int32_t cols,
                          int64_t start_idx, int64_t* out,
                          int64_t out_cap) {
  Dir dirs[8];
  neighborhood8(rows, dirs);
  auto at = [&](int64_t idx) -> bool { return mask[idx] != 0; };

  int64_t curr_idx = start_idx;
  int32_t curr_x = int32_t(start_idx / rows);
  int32_t curr_y = int32_t(start_idx % rows);

  int direction_idx = -1;
  for (int i = 0; i < 8; ++i) {
    int x = curr_x + dirs[i].dx, y = curr_y + dirs[i].dy;
    if (x >= 0 && x < cols && y >= 0 && y < rows &&
        !at(curr_idx + dirs[i].didx)) {
      direction_idx = i;
      break;
    }
  }
  if (direction_idx < 0) return 0;

  int64_t n = 0;
  bool found_start = false;
  while (true) {
    int new_dir = -1;
    for (int delta = 1; delta <= 8; ++delta) {
      int ndi = (direction_idx + delta) % 8;
      int x = curr_x + dirs[ndi].dx, y = curr_y + dirs[ndi].dy;
      if (x >= 0 && x < cols && y >= 0 && y < rows &&
          at(curr_idx + dirs[ndi].didx)) {
        new_dir = ndi;
        break;
      }
    }
    if (new_dir < 0) return 0;  // isolated pixel — caller guards
    direction_idx = (new_dir + 4) % 8;
    curr_idx += dirs[new_dir].didx;
    curr_x += dirs[new_dir].dx;
    curr_y += dirs[new_dir].dy;

    if (found_start) {
      if (n > 0 && curr_idx == out[0]) break;
      found_start = false;
    }
    if (n >= out_cap) return -1;
    out[n++] = curr_idx;
    if (curr_idx == start_idx) found_start = true;
  }
  return n;
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
