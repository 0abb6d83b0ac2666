// Single-core CPU baseline for the segmentation pipeline.
//
// The reference library (theteamatx/x-edr-pointcloud-segmentation) publishes
// no benchmark numbers and cannot be built offline (its bazel WORKSPACE
// fetches deps from the network), so this standalone C++17 program
// implements the same algorithms — organized normal estimation via the
// variable-radius 4/8-neighbor walk + incremental-PCA plane fit
// (algorithms.h:106-375), plane-support seed ranking (segmentation.h:190-230),
// FIFO planar region growing (segmentation.h:239-292, planar_region.h), and
// windowed euclidean clustering (cluster_region.h) — in a straightforward
// optimized single-threaded style, as the measured stand-in for the
// reference's single-core performance (BASELINE.md measurement plan).
//
// Input (stdin or file): int32 H, int32 W, then H*W*3 float32 points in
// col-major linear order (idx = col*H + row). Output: one JSON line with
// per-stage milliseconds.
//
// Build: g++ -O3 -march=native -std=c++17 -o cpp_baseline cpp_baseline.cc

#include <algorithm>
#include <chrono>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <limits>
#include <queue>
#include <vector>

namespace {

struct V3 {
  float x = 0, y = 0, z = 0;
  V3() = default;
  V3(float a, float b, float c) : x(a), y(b), z(c) {}
  V3 operator-(const V3& o) const { return {x - o.x, y - o.y, z - o.z}; }
  V3 operator+(const V3& o) const { return {x + o.x, y + o.y, z + o.z}; }
  V3 operator*(float s) const { return {x * s, y * s, z * s}; }
  float dot(const V3& o) const { return x * o.x + y * o.y + z * o.z; }
  float norm2() const { return dot(*this); }
  bool finite() const {
    return std::isfinite(x) && std::isfinite(y) && std::isfinite(z);
  }
};

constexpr float kNaN = std::numeric_limits<float>::quiet_NaN();
constexpr float kFltMin = std::numeric_limits<float>::min();

// Closed-form ascending eigenvalues of a symmetric 3x3 (trigonometric
// method with shift/scale, the same scheme as Eigen's computeDirect).
void Eig3Roots(const float m[6], float roots[3]) {
  // m packs (xx, xy, xz, yy, yz, zz)
  float shift = (m[0] + m[3] + m[5]) / 3.0f;
  float a00 = m[0] - shift, a11 = m[3] - shift, a22 = m[5] - shift;
  float a01 = m[1], a02 = m[2], a12 = m[4];
  float scale = 0.f;
  for (float v : {a00, a11, a22, a01, a02, a12})
    scale = std::max(scale, std::fabs(v));
  if (scale <= 0.f) scale = 1.f;
  a00 /= scale; a11 /= scale; a22 /= scale;
  a01 /= scale; a02 /= scale; a12 /= scale;
  float c0 = a00 * a11 * a22 + 2.f * a01 * a02 * a12 - a00 * a12 * a12 -
             a11 * a02 * a02 - a22 * a01 * a01;
  float c1 = a00 * a11 - a01 * a01 + a00 * a22 - a02 * a02 + a11 * a22 -
             a12 * a12;
  float c2 = a00 + a11 + a22;
  float c2o3 = c2 / 3.f;
  float ao3 = std::max((c2 * c2o3 - c1) / 3.f, 0.f);
  float hb = 0.5f * (c0 + c2o3 * (2.f * c2o3 * c2o3 - c1));
  float q = std::max(ao3 * ao3 * ao3 - hb * hb, 0.f);
  float rho = std::sqrt(ao3);
  float theta = std::atan2(std::sqrt(q), hb) / 3.f;
  float ct = std::cos(theta), st = std::sin(theta);
  const float s3 = 1.7320508f;
  roots[0] = (c2o3 - rho * (ct + s3 * st)) * scale + shift;
  roots[1] = (c2o3 - rho * (ct - s3 * st)) * scale + shift;
  roots[2] = (c2o3 + 2.f * rho * ct) * scale + shift;
}

V3 Cross(const V3& a, const V3& b) {
  return {a.y * b.z - a.z * b.y, a.z * b.x - a.x * b.z,
          a.x * b.y - a.y * b.x};
}

// Running plane fit: 6 second moments + centroid sum + weight.
struct PlaneFit {
  float acc[6] = {0, 0, 0, 0, 0, 0};
  V3 sum;
  float w = 0.f;
  V3 hint{1, 0, 0};

  void Clear() {
    std::memset(acc, 0, sizeof(acc));
    sum = V3();
    w = 0.f;
  }
  void Add(const V3& p) {
    acc[0] += p.x * p.x; acc[1] += p.x * p.y; acc[2] += p.x * p.z;
    acc[3] += p.y * p.y; acc[4] += p.y * p.z; acc[5] += p.z * p.z;
    sum = sum + p;
    w += 1.f;
  }
  // Returns true when the fit is valid; fills plane normal n and offset d.
  bool Solve(V3* n, float* d, V3* centroid) const {
    if (w <= 0.f) return false;
    V3 c = sum * (1.f / w);
    float cov[6] = {acc[0] / w - c.x * c.x, acc[1] / w - c.x * c.y,
                    acc[2] / w - c.x * c.z, acc[3] / w - c.y * c.y,
                    acc[4] / w - c.y * c.z, acc[5] / w - c.z * c.z};
    float ev[3];
    Eig3Roots(cov, ev);
    *centroid = c;
    if (!(ev[1] > kFltMin)) return false;
    // smallest-eigenvalue eigenvector via cross-product kernel extraction
    float l0 = ev[0];
    V3 r0{cov[0] - l0, cov[1], cov[2]};
    V3 r1{cov[1], cov[3] - l0, cov[4]};
    V3 r2{cov[2], cov[4], cov[5] - l0};
    V3 c01 = Cross(r0, r1), c02 = Cross(r0, r2), c12 = Cross(r1, r2);
    float n01 = c01.norm2(), n02 = c02.norm2(), n12 = c12.norm2();
    V3 best = c01; float bn = n01;
    if (n02 > bn) { best = c02; bn = n02; }
    if (n12 > bn) { best = c12; bn = n12; }
    if (bn < kFltMin) return false;
    V3 nn = best * (1.f / std::sqrt(bn));
    if (nn.dot(hint) < 0.f) nn = nn * -1.f;
    *n = nn;
    *d = -nn.dot(c);
    return true;
  }
};

struct Grid {
  int h = 0, w = 0;
  std::vector<V3> pts;  // col-major linear: idx = c*h + r
  const V3& at(int r, int c) const { return pts[c * h + r]; }
  const V3& at(int idx) const { return pts[idx]; }
};

// Variable-radius neighbor walk (algorithms.h:106-257 semantics).
int FindSupport(const Grid& g, int r, int c, float min2, float max2,
                int* out) {
  const V3& center = g.at(r, c);
  if (!center.finite()) return 0;
  int n = 0;
  out[n++] = c * g.h + r;
  int min_r = std::max(r - 1, 0), max_r = std::min(r + 1, g.h - 1);
  int min_c = std::max(c - 1, 0), max_c = std::min(c + 1, g.w - 1);
  auto band = [&](const V3& p) {
    if (!p.finite()) return false;
    float d2 = (center - p).norm2();
    return d2 >= min2 && d2 <= max2;
  };
  // walks continue past non-finite and out-of-band neighbors, stopping
  // only when an in-band neighbor is accepted (algorithms.h:136-199)
  for (int rr = r - 1; rr >= 0; --rr) {
    const V3& p = g.at(rr, c);
    if (!band(p)) continue;
    out[n++] = c * g.h + rr; min_r = rr; break;
  }
  for (int cc = c - 1; cc >= 0; --cc) {
    const V3& p = g.at(r, cc);
    if (!band(p)) continue;
    out[n++] = cc * g.h + r; min_c = cc; break;
  }
  for (int rr = r + 1; rr < g.h; ++rr) {
    const V3& p = g.at(rr, c);
    if (!band(p)) continue;
    out[n++] = c * g.h + rr; max_r = rr; break;
  }
  for (int cc = c + 1; cc < g.w; ++cc) {
    const V3& p = g.at(r, cc);
    if (!band(p)) continue;
    out[n++] = cc * g.h + r; max_c = cc; break;
  }
  if (min_c != c) {
    if (min_r != r && band(g.at(min_r, min_c)))
      out[n++] = min_c * g.h + min_r;
    if (max_r != r && band(g.at(max_r, min_c)))
      out[n++] = min_c * g.h + max_r;
  }
  if (max_c != c) {
    if (min_r != r && band(g.at(min_r, max_c)))
      out[n++] = max_c * g.h + min_r;
    if (max_r != r && band(g.at(max_r, max_c)))
      out[n++] = max_c * g.h + max_r;
  }
  return n;
}

}  // namespace

int main(int argc, char** argv) {
  FILE* in = stdin;
  if (argc > 1) in = std::fopen(argv[1], "rb");
  if (!in) { std::fprintf(stderr, "cannot open input\n"); return 1; }
  int32_t h = 0, w = 0;
  if (std::fread(&h, 4, 1, in) != 1 || std::fread(&w, 4, 1, in) != 1)
    return 1;
  Grid g;
  g.h = h; g.w = w;
  g.pts.resize(size_t(h) * w);
  if (std::fread(g.pts.data(), sizeof(V3), g.pts.size(), in) != g.pts.size())
    return 1;
  if (in != stdin) std::fclose(in);

  using Clock = std::chrono::steady_clock;
  auto ms = [](Clock::time_point a, Clock::time_point b) {
    return std::chrono::duration<double, std::milli>(b - a).count();
  };

  // --- normals ------------------------------------------------------------
  auto t0 = Clock::now();
  std::vector<V3> normals(g.pts.size(), V3(kNaN, kNaN, kNaN));
  {
    const float min2 = 0.1f * 0.1f, max2 = 1.0f * 1.0f;
    int support[9];
    PlaneFit fit;
    V3 origin{0, 0, 0};
    for (int c = 0; c < w; ++c)
      for (int r = 0; r < h; ++r) {
        const V3& p = g.at(r, c);
        if (!p.finite()) continue;
        int n = FindSupport(g, r, c, min2, max2, support);
        if (n < 4) continue;
        fit.Clear();
        fit.hint = origin - p;
        for (int i = 0; i < n; ++i) fit.Add(g.at(support[i]));
        V3 nn, cen; float d;
        if (fit.Solve(&nn, &d, &cen)) normals[c * h + r] = nn;
      }
  }
  auto t1 = Clock::now();

  // --- plane-support seed ranking ----------------------------------------
  std::vector<int> seeds;
  {
    const int half = 4;
    const float tau = 0.05f;
    std::vector<std::pair<int, int>> ranked;  // (count, index)
    for (int c = 0; c < w; ++c)
      for (int r = 0; r < h; ++r) {
        const V3& p = g.at(r, c);
        const V3& nn = normals[c * h + r];
        if (!p.finite() || !nn.finite()) continue;
        float d = -nn.dot(p);
        int cnt = 0;
        for (int cc = std::max(0, c - half);
             cc <= std::min(w - 1, c + half); ++cc)
          for (int rr = std::max(0, r - half);
               rr <= std::min(h - 1, r + half); ++rr) {
            float dist = std::fabs(nn.dot(g.at(rr, cc)) + d);
            if (dist < tau) ++cnt;
          }
        if (cnt >= 12) ranked.emplace_back(cnt, c * h + r);
      }
    std::stable_sort(ranked.begin(), ranked.end());
    seeds.reserve(ranked.size());
    for (auto& [cnt, idx] : ranked) seeds.push_back(idx);
  }
  auto t2 = Clock::now();

  // --- planar region growing (FIFO BFS) ----------------------------------
  std::vector<int> labels(g.pts.size(), -1);
  int num_planar = 0;
  {
    const float tau = 0.05f;
    const int period = 30, min_inliers = 5;
    std::queue<int> q;
    std::vector<int> inliers;
    for (int si = int(seeds.size()) - 1; si >= 0; --si) {
      int seed = seeds[si];
      if (labels[seed] != -1) continue;
      const V3& sp = g.at(seed);
      const V3& sn = normals[seed];
      V3 n = sn; float d = -sn.dot(sp);
      PlaneFit fit;
      fit.hint = sn;
      inliers.clear();
      q.push(seed);
      while (!q.empty()) {
        int cand = q.front(); q.pop();
        const V3& p = g.at(cand);
        float dist = std::fabs(n.dot(p) + d);
        if (!(dist < tau)) { labels[cand] = -1; continue; }
        inliers.push_back(cand);
        fit.Add(p);
        if (int(inliers.size()) % period == 0) {
          V3 nn, cen; float dd;
          if (fit.Solve(&nn, &dd, &cen)) { n = nn; d = dd; fit.hint = nn; }
        }
        labels[cand] = num_planar;
        int r = cand % h, c = cand / h;
        const int dr[4] = {-1, 1, 0, 0}, dc[4] = {0, 0, -1, 1};
        for (int k = 0; k < 4; ++k) {
          int rr = r + dr[k], cc = c + dc[k];
          if (rr < 0 || rr >= h || cc < 0 || cc >= w) continue;
          int nidx = cc * h + rr;
          if (labels[nidx] != -1) continue;
          labels[nidx] = -3;  // in-queue marker
          q.push(nidx);
        }
      }
      if (int(inliers.size()) >= min_inliers) {
        ++num_planar;
      } else {
        for (int i : inliers) labels[i] = -4;  // quarantine
      }
    }
    for (int& l : labels)
      if (l == -4 || l == -3) l = -1;
  }
  auto t3 = Clock::now();

  // --- euclidean clustering (FIFO BFS, window 3x3) ------------------------
  int num_clusters = 0;
  {
    const float tau2 = 1.0f;
    const int min_inliers = 7, hw = 1;
    std::queue<std::pair<int, int>> q;  // (source, candidate)
    std::vector<int> inliers;
    for (int seed = 0; seed < int(g.pts.size()); ++seed) {
      if (labels[seed] != -1) continue;
      inliers.clear();
      q.emplace(seed, seed);
      int label_id = num_planar + num_clusters;
      while (!q.empty()) {
        auto [src, cand] = q.front(); q.pop();
        if ((g.at(cand) - g.at(src)).norm2() < tau2) {
          inliers.push_back(cand);
          labels[cand] = label_id;
          int r = cand % h, c = cand / h;
          for (int dc2 = -hw; dc2 <= hw; ++dc2)
            for (int dr2 = -hw; dr2 <= hw; ++dr2) {
              if (dc2 == 0 && dr2 == 0) continue;
              int rr = r + dr2, cc = c + dc2;
              if (rr < 0 || rr >= h || cc < 0 || cc >= w) continue;
              int nidx = cc * h + rr;
              if (labels[nidx] != -1) continue;
              labels[nidx] = -3;
              q.emplace(cand, nidx);
            }
        } else {
          labels[cand] = -1;
        }
      }
      if (int(inliers.size()) >= min_inliers) {
        ++num_clusters;
      } else {
        for (int i : inliers) labels[i] = -4;
      }
    }
    for (int& l : labels)
      if (l == -4 || l == -3) l = -1;
  }
  auto t4 = Clock::now();

  std::printf(
      "{\"normals_ms\": %.3f, \"seeds_ms\": %.3f, \"planar_ms\": %.3f, "
      "\"cluster_ms\": %.3f, \"total_ms\": %.3f, \"num_planar\": %d, "
      "\"num_clusters\": %d}\n",
      ms(t0, t1), ms(t1, t2), ms(t2, t3), ms(t3, t4), ms(t0, t4), num_planar,
      num_clusters);
  return 0;
}
