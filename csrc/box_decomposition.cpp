// Native box-decomposition engine (Lacour17 local upper bounds).
//
// The qNEHVI construction path decomposes the non-dominated region once
// PER MC SAMPLE for m >= 3 (`acquisition/multi_objective.py::make_qnehvi`)
// — hundreds of incremental local-upper-bound updates whose Python/numpy
// form is interpreter-bound. This C++ engine implements the same two-step
// scheme as `utils/multi_objective.py` (reference
// `botorch/utils/multi_objective/box_decompositions/utils.py:104-222`,
// `non_dominated.py:397-431`) and batches over samples in one call.
//
// Exposed as a plain C ABI (called from Python via ctypes — no pybind11
// in this image):
//   decompose_batch(
//       fronts, front_sizes, n_samples, max_front, m, ref_point, clip_max,
//       out_lower, out_upper, out_cell_counts, max_cells)
// Cells for sample s are written to out_{lower,upper}[s * max_cells * m ..]
// with out_cell_counts[s] valid rows; extra rows are zero-volume (l = u =
// ref). Returns the maximum cell count seen (<= max_cells) or -1 on
// overflow.

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <limits>
#include <thread>
#include <vector>

namespace {

constexpr double kInf = std::numeric_limits<double>::infinity();

struct LubSet {
  // U: (k, m) local upper bounds; Z: (k, m, m) defining points.
  int m;
  std::vector<double> U;
  std::vector<double> Z;

  int size() const { return static_cast<int>(U.size()) / m; }
};

// One incremental update with point z ([Lacour17] Alg. 1, minimization).
void lub_update(LubSet& s, const double* z) {
  const int m = s.m;
  const int k = s.size();
  std::vector<char> dominated(k, 0);
  bool any = false;
  for (int i = 0; i < k; ++i) {
    bool dom = true;
    for (int j = 0; j < m; ++j) {
      if (!(s.U[i * m + j] > z[j])) { dom = false; break; }
    }
    dominated[i] = dom;
    any |= dom;
  }
  if (!any) return;

  std::vector<double> newU, newZ;
  newU.reserve(s.U.size());
  newZ.reserve(s.Z.size());
  // keep the non-dominated bounds
  for (int i = 0; i < k; ++i) {
    if (!dominated[i]) {
      newU.insert(newU.end(), s.U.begin() + i * m, s.U.begin() + (i + 1) * m);
      newZ.insert(newZ.end(), s.Z.begin() + i * m * m,
                  s.Z.begin() + (i + 1) * m * m);
    }
  }
  // generate replacements from the dominated set
  for (int j = 0; j < m; ++j) {
    for (int i = 0; i < k; ++i) {
      if (!dominated[i]) continue;
      const double* Zi = &s.Z[i * m * m];
      // z_j >= max_{l != j} Z[l][j] ?
      double zmax = -kInf;
      for (int l = 0; l < m; ++l) {
        if (l == j) continue;
        zmax = std::max(zmax, Zi[l * m + j]);
      }
      if (!(z[j] >= zmax)) continue;
      // new bound u: U[i] with coordinate j replaced by z_j
      for (int c = 0; c < m; ++c) {
        newU.push_back(c == j ? z[j] : s.U[i * m + c]);
      }
      // new defining points: row j = z; row l != j = the defining point
      // Z[l] with Z[l][j] <= z_j (unique by the algorithm's invariant)
      size_t base = newZ.size();
      newZ.resize(base + m * m);
      double* Zn = &newZ[base];
      for (int l = 0; l < m; ++l) {
        if (l == j) {
          std::memcpy(Zn + l * m, z, m * sizeof(double));
        } else {
          // rows l != j carry over: the add condition z_j >= max_{l!=j}
          // Z[l][j] already guarantees Z[l][j] <= z_j for all of them
          // (the reference's lt_zj filter is a defensive no-op).
          std::memcpy(Zn + l * m, Zi + l * m, m * sizeof(double));
        }
      }
    }
  }
  s.U.swap(newU);
  s.Z.swap(newZ);
}

// Cell bounds from local upper bounds ([Lacour17] Eq. 2, minimization,
// reference ref point +inf for step 2).
void cell_bounds(const LubSet& s, const double* ref, double clip_max,
                 std::vector<double>& lower, std::vector<double>& upper) {
  const int m = s.m;
  const int k = s.size();
  lower.clear();
  upper.clear();
  for (int i = 0; i < k; ++i) {
    std::vector<double> lo(m), up(m);
    lo[0] = s.Z[i * m * m + 0 * m + 0];
    up[0] = ref[0];
    for (int j = 1; j < m; ++j) {
      double mx = -kInf;
      for (int l = 0; l < j; ++l) mx = std::max(mx, s.Z[i * m * m + l * m + j]);
      lo[j] = mx;
      up[j] = s.U[i * m + j];
    }
    bool empty = false;
    for (int j = 0; j < m; ++j) {
      if (up[j] <= lo[j]) { empty = true; break; }
    }
    if (empty) continue;
    for (int j = 0; j < m; ++j) {
      lower.push_back(std::clamp(lo[j], -clip_max, clip_max));
      upper.push_back(std::clamp(up[j], -clip_max, clip_max));
    }
  }
}

// Shared per-front pipeline: step-1 LUBs over -Y, step-2 LUBs over -U,
// then Lacour Eq. 2 cells with reference +inf (the non-dominated region).
void nondominated_cells(const double* front, int64_t n_points, int m,
                        const double* ref_point, double clip_max,
                        std::vector<double>& lower,
                        std::vector<double>& upper) {
  std::vector<double> neg(m);
  LubSet s1{m, {}, {}};
  s1.U.assign(m, 0.0);
  for (int j = 0; j < m; ++j) s1.U[j] = -ref_point[j];
  s1.Z.assign(m * m, -kInf);
  for (int j = 0; j < m; ++j) s1.Z[j * m + j] = s1.U[j];
  for (int64_t p = 0; p < n_points; ++p) {
    for (int j = 0; j < m; ++j) neg[j] = -front[p * m + j];
    lub_update(s1, neg.data());
  }
  LubSet s2{m, {}, {}};
  s2.U.assign(m, kInf);
  s2.Z.resize(m * m);
  for (int j = 0; j < m; ++j) {
    for (int c = 0; c < m; ++c) s2.Z[j * m + c] = ref_point[c];
    s2.Z[j * m + j] = kInf;
  }
  const int k1 = s1.size();
  for (int i = 0; i < k1; ++i) {
    for (int j = 0; j < m; ++j) neg[j] = -s1.U[i * m + j];
    lub_update(s2, neg.data());
  }
  std::vector<double> ref_inf(m, kInf);
  cell_bounds(s2, ref_inf.data(), clip_max, lower, upper);
}

// Exact dominated hypervolume of one MAXIMIZATION front: the complement
// of the non-dominated decomposition inside [ref, componentwise-max]
// (same scheme as `utils/multi_objective.py::dominated_hypervolume_np`).
double hypervolume_one(const double* front, int64_t n_points, int m,
                       const double* ref_point) {
  // filter to points strictly above the reference
  std::vector<double> kept;
  kept.reserve(n_points * m);
  for (int64_t p = 0; p < n_points; ++p) {
    bool above = true;
    for (int j = 0; j < m; ++j) {
      if (!(front[p * m + j] > ref_point[j])) { above = false; break; }
    }
    if (above) {
      kept.insert(kept.end(), front + p * m, front + (p + 1) * m);
    }
  }
  const int64_t n = static_cast<int64_t>(kept.size()) / m;
  if (n == 0) return 0.0;
  std::vector<double> zmax(m, -kInf);
  for (int64_t p = 0; p < n; ++p) {
    for (int j = 0; j < m; ++j) zmax[j] = std::max(zmax[j], kept[p * m + j]);
  }
  double box = 1.0;
  for (int j = 0; j < m; ++j) box *= zmax[j] - ref_point[j];
  std::vector<double> lower, upper;
  nondominated_cells(kept.data(), n, m, ref_point, kInf, lower, upper);
  const int cells = static_cast<int>(lower.size()) / m;
  double nondom = 0.0;
  for (int i = 0; i < cells; ++i) {
    double v = 1.0;
    for (int j = 0; j < m; ++j) {
      const double lo = std::clamp(lower[i * m + j], ref_point[j], zmax[j]);
      const double up = std::clamp(upper[i * m + j], ref_point[j], zmax[j]);
      v *= std::max(up - lo, 0.0);
    }
    nondom += v;
  }
  return box - nondom;
}

// Run `fn(s)` for s in [0, n) striped over worker threads. Single-threaded
// when n is small or only one core is available.
template <typename Fn>
void parallel_for_samples(int64_t n, Fn fn) {
  unsigned hw = std::thread::hardware_concurrency();
  int64_t workers = std::min<int64_t>(hw ? hw : 1, n);
  if (workers <= 1 || n < 4) {
    for (int64_t s = 0; s < n; ++s) fn(s);
    return;
  }
  std::vector<std::thread> pool;
  pool.reserve(workers);
  for (int64_t w = 0; w < workers; ++w) {
    pool.emplace_back([=]() {
      for (int64_t s = w; s < n; s += workers) fn(s);
    });
  }
  for (auto& t : pool) t.join();
}

}  // namespace

extern "C" {

// Batched exact hypervolume (maximization). `fronts`: (n_samples,
// max_front, m); only the first front_sizes[s] rows of sample s are read.
// Writes n_samples doubles to out_hv. Returns 0.
int hypervolume_batch(const double* fronts, const int64_t* front_sizes,
                      int64_t n_samples, int64_t max_front, int64_t m_,
                      const double* ref_point, double* out_hv) {
  const int m = static_cast<int>(m_);
  parallel_for_samples(n_samples, [&](int64_t sidx) {
    out_hv[sidx] = hypervolume_one(fronts + sidx * max_front * m,
                                   front_sizes[sidx], m, ref_point);
  });
  return 0;
}

// See file header for the contract. `fronts`: (n_samples, max_front, m)
// MAXIMIZATION pareto points (only first front_sizes[s] rows valid).
int decompose_batch(const double* fronts, const int64_t* front_sizes,
                    int64_t n_samples, int64_t max_front, int64_t m_,
                    const double* ref_point, double clip_max,
                    double* out_lower, double* out_upper,
                    int64_t* out_cell_counts, int64_t max_cells) {
  const int m = static_cast<int>(m_);
  parallel_for_samples(n_samples, [&](int64_t sidx) {
    const double* F = fronts + sidx * max_front * m;
    std::vector<double> lower, upper;
    nondominated_cells(F, front_sizes[sidx], m, ref_point, clip_max,
                       lower, upper);
    const int cells = static_cast<int>(lower.size()) / m;
    if (cells > max_cells) {
      out_cell_counts[sidx] = -1;  // overflow marker, reduced below
      return;
    }
    out_cell_counts[sidx] = cells;
    double* OL = out_lower + sidx * max_cells * m;
    double* OU = out_upper + sidx * max_cells * m;
    // zero-volume padding at the reference point
    for (int64_t c = 0; c < max_cells; ++c) {
      for (int j = 0; j < m; ++j) {
        OL[c * m + j] = ref_point[j];
        OU[c * m + j] = ref_point[j];
      }
    }
    std::memcpy(OL, lower.data(), lower.size() * sizeof(double));
    std::memcpy(OU, upper.data(), upper.size() * sizeof(double));
  });
  int global_max = 0;
  for (int64_t sidx = 0; sidx < n_samples; ++sidx) {
    if (out_cell_counts[sidx] < 0) return -1;
    global_max = std::max(global_max, static_cast<int>(out_cell_counts[sidx]));
  }
  return global_max;
}

}  // extern "C"
