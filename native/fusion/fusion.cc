// Native depth-map fusion: fusibile-equivalent consistency fusion.
//
// Behavioral reference: the external fusibile CUDA tool invoked by the
// reference's gipuma.py:178-195 (flags --disp_thresh / --num_consistent) —
// reimplemented as a multithreaded C++ library with a C ABI, driven from
// Python via ctypes (no process boundary, no .dmb conversion layer).
//
// Semantics: every reference pixel with a (confidence-filtered) depth is
// unprojected to a world point, projected into every other view, and checked
// for disparity consistency (|f·B/d1 − f·B/d2| < disp_thresh, pixel-disparity
// units). If at least num_consistent other views agree, the consistent
// views' points are averaged into one output point (colored from the
// reference image) and their source pixels are marked used so each surface
// patch is emitted once — the behavior that distinguishes fusibile-style
// fusion from the reference's fusion.py averaging path.
//
// Camera layout matches the framework: per view a (2,4,4) float array,
// [0]=extrinsic world->cam, [1,:3,:3]=intrinsic.

#include <atomic>
#include <memory>
#include <cmath>
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <thread>
#include <vector>

namespace {

struct Cam {
  // extrinsic rotation/translation and inverses, intrinsics
  float R[9], t[3], Rt[9];  // Rt = R^T
  float fx, fy, cx, cy;
  float center[3];
};

inline void mat3_vec(const float* m, const float* v, float* out) {
  out[0] = m[0] * v[0] + m[1] * v[1] + m[2] * v[2];
  out[1] = m[3] * v[0] + m[4] * v[1] + m[5] * v[2];
  out[2] = m[6] * v[0] + m[7] * v[1] + m[8] * v[2];
}

Cam make_cam(const float* cam244) {
  Cam c;
  const float* E = cam244;        // 4x4 row-major
  const float* K = cam244 + 16;   // 4x4 row-major, [:3,:3] used
  for (int r = 0; r < 3; ++r)
    for (int k = 0; k < 3; ++k) {
      c.R[r * 3 + k] = E[r * 4 + k];
      c.Rt[k * 3 + r] = E[r * 4 + k];
    }
  for (int r = 0; r < 3; ++r) c.t[r] = E[r * 4 + 3];
  c.fx = K[0];
  c.fy = K[5];
  c.cx = K[2];
  c.cy = K[6];
  float mt[3] = {-c.t[0], -c.t[1], -c.t[2]};
  mat3_vec(c.Rt, mt, c.center);
  return c;
}

inline void unproject(const Cam& c, float x, float y, float d, float* world) {
  // pixel (x, y) at depth d -> world = R^T (cam - t)
  float cam[3] = {(x - c.cx) / c.fx * d, (y - c.cy) / c.fy * d, d};
  float diff[3] = {cam[0] - c.t[0], cam[1] - c.t[1], cam[2] - c.t[2]};
  mat3_vec(c.Rt, diff, world);
}

inline bool project(const Cam& c, const float* world, float* u, float* v, float* d) {
  float cam[3];
  float tmp[3];
  mat3_vec(c.R, world, tmp);
  cam[0] = tmp[0] + c.t[0];
  cam[1] = tmp[1] + c.t[1];
  cam[2] = tmp[2] + c.t[2];
  if (cam[2] <= 1e-6f) return false;
  *u = c.fx * cam[0] / cam[2] + c.cx;
  *v = c.fy * cam[1] / cam[2] + c.cy;
  *d = cam[2];
  return true;
}

}  // namespace

extern "C" {

// Returns the number of fused points (<= H*W per view upper bound the caller
// allocates). All arrays are row-major float32/uint8.
//   depths:  (V, H, W)   confidence-filtered depths, 0 = invalid
//   cams:    (V, 2, 4, 4)
//   colors:  (V, H, W, 3) uint8 (reference-view colors for output points)
//   out_points: caller-allocated (max_points, 3) float
//   out_colors: caller-allocated (max_points, 3) uint8
long long fuse_depth_maps(
    const float* depths, const float* cams_raw, const unsigned char* colors,
    int V, int H, int W,
    float disp_thresh, int num_consistent, int n_threads,
    float* out_points, unsigned char* out_colors, long long max_points) {
  std::vector<Cam> cams(V);
  for (int v = 0; v < V; ++v) cams[v] = make_cam(cams_raw + v * 32);

  const long long npix = (long long)H * W;
  // atomics: rows race on marking/reading src pixels; atomic flags keep the
  // dedup exact rather than merely benign
  std::unique_ptr<std::atomic<uint8_t>[]> used(new std::atomic<uint8_t>[(size_t)V * npix]);
  for (long long i = 0; i < (long long)V * npix; ++i)
    used[i].store(0, std::memory_order_relaxed);
  std::atomic<long long> count{0};

  if (n_threads <= 0) n_threads = std::thread::hardware_concurrency();
  if (n_threads <= 0) n_threads = 4;

  // Process reference views sequentially (the used-mask creates a cross-view
  // dependency, like fusibile's sequential kernel launches); parallelize over
  // rows within a view.
  for (int ref = 0; ref < V; ++ref) {
    const Cam& rc = cams[ref];
    const float* rdepth = depths + (size_t)ref * npix;
    std::vector<std::thread> threads;
    std::atomic<int> next_row{0};

    auto worker = [&]() {
      std::vector<int> cons_view;
      std::vector<long long> cons_pix;
      cons_view.reserve(V);
      cons_pix.reserve(V);
      for (;;) {
        int y = next_row.fetch_add(1);
        if (y >= H) break;
        for (int x = 0; x < W; ++x) {
          long long pix = (long long)y * W + x;
          float d = rdepth[pix];
          if (d <= 0 || used[(size_t)ref * npix + pix].load(std::memory_order_relaxed)) continue;

          float world[3];
          unproject(rc, (float)x + 0.5f, (float)y + 0.5f, d, world);

          cons_view.clear();
          cons_pix.clear();
          float acc[3] = {world[0], world[1], world[2]};
          for (int src = 0; src < V; ++src) {
            if (src == ref) continue;
            const Cam& sc = cams[src];
            float u, v2, dproj;
            if (!project(sc, world, &u, &v2, &dproj)) continue;
            int ui = (int)std::floor(u - 0.5f + 0.5f);  // nearest pixel center
            int vi = (int)std::floor(v2 - 0.5f + 0.5f);
            if (ui < 0 || ui >= W || vi < 0 || vi >= H) continue;
            long long spix = (long long)vi * W + ui;
            float ds = depths[(size_t)src * npix + spix];
            if (ds <= 0) continue;
            // disparity-space consistency: f·B/d difference in pixels
            float bx = rc.center[0] - sc.center[0];
            float by = rc.center[1] - sc.center[1];
            float bz = rc.center[2] - sc.center[2];
            float baseline = std::sqrt(bx * bx + by * by + bz * bz);
            float fb = sc.fx * baseline;
            float disp_diff = std::fabs(fb / dproj - fb / ds);
            if (disp_diff >= disp_thresh) continue;
            // consistent: accumulate the src view's own 3D estimate
            float sworld[3];
            unproject(sc, (float)ui + 0.5f, (float)vi + 0.5f, ds, sworld);
            acc[0] += sworld[0];
            acc[1] += sworld[1];
            acc[2] += sworld[2];
            cons_view.push_back(src);
            cons_pix.push_back(spix);
          }
          if ((int)cons_view.size() >= num_consistent) {
            long long i = count.fetch_add(1);
            if (i < max_points) {
              float inv = 1.0f / (1 + cons_view.size());
              out_points[i * 3 + 0] = acc[0] * inv;
              out_points[i * 3 + 1] = acc[1] * inv;
              out_points[i * 3 + 2] = acc[2] * inv;
              const unsigned char* c = colors + ((size_t)ref * npix + pix) * 3;
              out_colors[i * 3 + 0] = c[0];
              out_colors[i * 3 + 1] = c[1];
              out_colors[i * 3 + 2] = c[2];
            }
            used[(size_t)ref * npix + pix].store(1, std::memory_order_relaxed);
            for (size_t k = 0; k < cons_view.size(); ++k)
              used[(size_t)cons_view[k] * npix + cons_pix[k]].store(1, std::memory_order_relaxed);
          }
        }
      }
    };

    for (int tdx = 0; tdx < n_threads; ++tdx) threads.emplace_back(worker);
    for (auto& th : threads) th.join();
  }
  long long n = count.load();
  return n < max_points ? n : max_points;
}

}  // extern "C"
