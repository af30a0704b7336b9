// Host-side native runtime for the TPU halo finder.
//
// TPU-native equivalent of the reference's C++ host machinery: the particle
// staging the reference does in its readers + MPI decomposition
// (/root/reference/src/mpiroutines.cxx:49-230 domain decomposition,
// /root/reference/src/gadgetio.cxx buffered reads).  On a single-controller
// TPU run the host's jobs are (a) streaming snapshot blocks, (b) computing
// spatial sort keys, and (c) producing the cell-sorted permutation that the
// device pipeline consumes — all bandwidth-bound work that benefits from
// multithreaded C++ rather than Python.
//
// Exposed via a plain C ABI for ctypes (no pybind11 in this image).
//
// Build: make -C velociraptor_stf_tpu/native

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

int hardware_threads() {
  unsigned n = std::thread::hardware_concurrency();
  return n == 0 ? 4 : static_cast<int>(n);
}

template <typename F>
void parallel_for(int64_t n, F&& fn, int nthreads = 0) {
  if (nthreads <= 0) nthreads = hardware_threads();
  if (n < (1 << 14) || nthreads == 1) {
    fn(0, n);
    return;
  }
  std::vector<std::thread> pool;
  int64_t chunk = (n + nthreads - 1) / nthreads;
  for (int t = 0; t < nthreads; ++t) {
    int64_t lo = t * chunk;
    int64_t hi = std::min(n, lo + chunk);
    if (lo >= hi) break;
    pool.emplace_back([&fn, lo, hi] { fn(lo, hi); });
  }
  for (auto& th : pool) th.join();
}

inline uint32_t spread_bits_10(uint32_t x) {
  x &= 0x3FFu;
  x = (x | (x << 16)) & 0x030000FFu;
  x = (x | (x << 8)) & 0x0300F00Fu;
  x = (x | (x << 4)) & 0x030C30C3u;
  x = (x | (x << 2)) & 0x09249249u;
  return x;
}

}  // namespace

extern "C" {

// Morton (Z-order) keys for positions in [lo, lo+ext) at 10 bits/axis.
// Matches ops/cells.py::morton_keys so host pre-sorting and device logic
// agree bit-for-bit.
void vr_morton_keys(const float* pos, int64_t n, const float* lo,
                    const float* ext, int32_t* keys) {
  const float sx = ext[0] > 0 ? 1023.0f / ext[0] : 0.0f;
  const float sy = ext[1] > 0 ? 1023.0f / ext[1] : 0.0f;
  const float sz = ext[2] > 0 ? 1023.0f / ext[2] : 0.0f;
  const float lx = lo[0], ly = lo[1], lz = lo[2];
  parallel_for(n, [&](int64_t i0, int64_t i1) {
    for (int64_t i = i0; i < i1; ++i) {
      auto clampi = [](float v) {
        return static_cast<uint32_t>(std::max(0.0f, std::min(1023.0f, v)));
      };
      uint32_t cx = clampi((pos[3 * i + 0] - lx) * sx);
      uint32_t cy = clampi((pos[3 * i + 1] - ly) * sy);
      uint32_t cz = clampi((pos[3 * i + 2] - lz) * sz);
      keys[i] = static_cast<int32_t>((spread_bits_10(cx) << 2) |
                                     (spread_bits_10(cy) << 1) |
                                     spread_bits_10(cz));
    }
  });
}

// Linear packed cell ids (x-major, matching ops/cells.py::pack_cells).
void vr_cell_keys(const float* pos, int64_t n, const float* origin,
                  const float* inv_width, const int32_t* ncells,
                  int32_t periodic, int32_t* keys) {
  const int32_t nx = ncells[0], ny = ncells[1], nz = ncells[2];
  parallel_for(n, [&](int64_t i0, int64_t i1) {
    for (int64_t i = i0; i < i1; ++i) {
      int32_t c[3];
      for (int a = 0; a < 3; ++a) {
        const int32_t na = ncells[a];
        float f = (pos[3 * i + a] - origin[a]) * inv_width[a];
        int32_t v = static_cast<int32_t>(f >= 0 ? f : f - 1.0f);
        if (periodic) {
          v %= na;
          if (v < 0) v += na;
        } else {
          v = std::max(0, std::min(na - 1, v));
        }
        c[a] = v;
      }
      keys[i] = (c[0] * ny + c[1]) * nz + c[2];
    }
  });
}

// Stable parallel counting sort over int32 keys in [0, nbuckets):
// writes the permutation (sorted -> original index) into perm and the
// per-bucket start offsets (nbuckets+1) into offsets.
// This replaces the device argsort that otherwise dominates host->device
// staging (device sort of 1e7+ keys is slow on a single chip).
void vr_counting_sort(const int32_t* keys, int64_t n, int64_t nbuckets,
                      int32_t* perm, int64_t* offsets) {
  const int nt = hardware_threads();
  std::vector<std::vector<int64_t>> counts(
      nt, std::vector<int64_t>(nbuckets, 0));
  int64_t chunk = (n + nt - 1) / nt;
  // count per thread
  std::vector<std::thread> pool;
  for (int t = 0; t < nt; ++t) {
    pool.emplace_back([&, t] {
      int64_t lo = t * chunk, hi = std::min(n, lo + chunk);
      auto& c = counts[t];
      for (int64_t i = lo; i < hi; ++i) ++c[keys[i]];
    });
  }
  for (auto& th : pool) th.join();
  pool.clear();
  // exclusive scan over (bucket, thread)
  int64_t total = 0;
  std::vector<std::vector<int64_t>> starts(
      nt, std::vector<int64_t>(nbuckets, 0));
  for (int64_t b = 0; b < nbuckets; ++b) {
    offsets[b] = total;
    for (int t = 0; t < nt; ++t) {
      starts[t][b] = total;
      total += counts[t][b];
    }
  }
  offsets[nbuckets] = total;
  // scatter (stable: thread-major then index-major order)
  for (int t = 0; t < nt; ++t) {
    pool.emplace_back([&, t] {
      int64_t lo = t * chunk, hi = std::min(n, lo + chunk);
      auto& s = starts[t];
      for (int64_t i = lo; i < hi; ++i)
        perm[s[keys[i]]++] = static_cast<int32_t>(i);
    });
  }
  for (auto& th : pool) th.join();
}

// Threaded gather: out[i] = src[perm[i]] for 3-vector float rows
// (host-side application of the sort permutation before device upload).
void vr_gather_f32x3(const float* src, const int32_t* perm, int64_t n,
                     float* out) {
  parallel_for(n, [&](int64_t i0, int64_t i1) {
    for (int64_t i = i0; i < i1; ++i) {
      const float* s = src + 3 * static_cast<int64_t>(perm[i]);
      float* d = out + 3 * i;
      d[0] = s[0];
      d[1] = s[1];
      d[2] = s[2];
    }
  });
}

void vr_gather_f32(const float* src, const int32_t* perm, int64_t n,
                   float* out) {
  parallel_for(n, [&](int64_t i0, int64_t i1) {
    for (int64_t i = i0; i < i1; ++i) out[i] = src[perm[i]];
  });
}

// Min-image periodic wrap of positions into [0, box) per axis.
void vr_wrap_positions(float* pos, int64_t n, const float* box) {
  parallel_for(n, [&](int64_t i0, int64_t i1) {
    for (int64_t i = i0; i < i1; ++i) {
      for (int a = 0; a < 3; ++a) {
        float b = box[a];
        if (b <= 0) continue;
        float v = std::fmod(pos[3 * i + a], b);
        if (v < 0) v += b;
        pos[3 * i + a] = v;
      }
    }
  });
}

int32_t vr_version() { return 1; }

}  // extern "C"
