// Binned-SAH BVH builder with threaded (hit/miss-link) flattening.
//
// Native host-side equivalent of zyg_tpu/scene/bvh.py::build_bvh — the
// reference's performance-critical builder is native Zig and
// multi-threaded (ref: src/core/scene/bvh/builder_base.zig +
// thread/pool.zig); this is the C++ counterpart for the TPU build's host
// pipeline. The top of the tree splits sequentially until enough
// independent subtrees exist, then worker threads build them in parallel
// into disjoint node blocks (each subtree of m prims needs <= 2m-1
// nodes, so blocks are pre-partitioned — no locks on the hot path).
// Same array contract as the Python builder: callers allocate
// capacity-2N output arrays; returns the node count, or -1 on overflow.
//
// Build: g++ -O2 -shared -fPIC -o libzygbvh.so bvh_builder.cpp -pthread
// (done on demand by zyg_tpu/native/__init__.py).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <limits>
#include <thread>
#include <vector>

namespace {

constexpr int kNumBins = 16;

struct V3 {
  float x, y, z;
};

inline V3 vmin(const V3 &a, const V3 &b) {
  return {std::min(a.x, b.x), std::min(a.y, b.y), std::min(a.z, b.z)};
}
inline V3 vmax(const V3 &a, const V3 &b) {
  return {std::max(a.x, b.x), std::max(a.y, b.y), std::max(a.z, b.z)};
}
inline float half_area(const V3 &mn, const V3 &mx) {
  const float dx = std::max(mx.x - mn.x, 0.0f);
  const float dy = std::max(mx.y - mn.y, 0.0f);
  const float dz = std::max(mx.z - mn.z, 0.0f);
  return dx * dy + dy * dz + dz * dx;
}

struct Range {
  int node, lo, hi;
};

}  // namespace

namespace {

struct Shared {
  const V3 *prim_min;
  const V3 *prim_max;
  const V3 *cent;
  int *prim_order;
  int leaf_size;
  V3 *nmin;
  V3 *nmax;
  int *lchild;
  int *first;
  int *count;
};

// Process one range: write the node, either mark a leaf or partition and
// push both children (allocated from [*alloc, alloc_end)). Returns false
// on node-capacity overflow.
bool process_range(const Shared &S, const Range &r, std::vector<Range> &stack,
                   std::vector<int> &scratch, int *alloc, int alloc_end) {
  int *idx = S.prim_order + r.lo;
  const int m = r.hi - r.lo;
  const V3 *prim_min = S.prim_min;
  const V3 *prim_max = S.prim_max;
  const V3 *cent = S.cent;

  V3 bmin = prim_min[idx[0]], bmax = prim_max[idx[0]];
  V3 cmin = cent[idx[0]], cmax = cent[idx[0]];
  for (int k = 1; k < m; ++k) {
    bmin = vmin(bmin, prim_min[idx[k]]);
    bmax = vmax(bmax, prim_max[idx[k]]);
    cmin = vmin(cmin, cent[idx[k]]);
    cmax = vmax(cmax, cent[idx[k]]);
  }
  S.nmin[r.node] = bmin;
  S.nmax[r.node] = bmax;

  if (m <= S.leaf_size) {
    S.first[r.node] = r.lo;
    S.count[r.node] = m;
    return true;
  }

  const float ext[3] = {cmax.x - cmin.x, cmax.y - cmin.y, cmax.z - cmin.z};
  int axis = 0;
  if (ext[1] > ext[axis]) axis = 1;
  if (ext[2] > ext[axis]) axis = 2;
  auto comp = [&](int i) {
    return axis == 0 ? cent[i].x : (axis == 1 ? cent[i].y : cent[i].z);
  };
  const float cmin_a = axis == 0 ? cmin.x : (axis == 1 ? cmin.y : cmin.z);

  int split;
  if (ext[axis] <= 1e-12f) {
    std::stable_sort(idx, idx + m, [&](int a, int b) { return comp(a) < comp(b); });
    split = m / 2;
  } else {
    const float scale = kNumBins * (1.0f - 1e-6f) / ext[axis];
    int bin_count[kNumBins] = {0};
    V3 bin_min[kNumBins], bin_max[kNumBins];
    for (int b = 0; b < kNumBins; ++b) {
      bin_min[b] = {INFINITY, INFINITY, INFINITY};
      bin_max[b] = {-INFINITY, -INFINITY, -INFINITY};
    }
    std::vector<int8_t> which(m);
    for (int k = 0; k < m; ++k) {
      int b = static_cast<int>((comp(idx[k]) - cmin_a) * scale);
      b = std::min(b, kNumBins - 1);
      which[k] = static_cast<int8_t>(b);
      ++bin_count[b];
      bin_min[b] = vmin(bin_min[b], prim_min[idx[k]]);
      bin_max[b] = vmax(bin_max[b], prim_max[idx[k]]);
    }
    // prefix/suffix sweep (ref builder_base.zig splittingPlane)
    float larea[kNumBins], rarea[kNumBins];
    int lcnt[kNumBins], rcnt[kNumBins];
    {
      V3 amn = bin_min[0], amx = bin_max[0];
      int c = 0;
      for (int b = 0; b < kNumBins; ++b) {
        amn = vmin(amn, bin_min[b]);
        amx = vmax(amx, bin_max[b]);
        c += bin_count[b];
        larea[b] = half_area(amn, amx);
        lcnt[b] = c;
      }
      amn = bin_min[kNumBins - 1];
      amx = bin_max[kNumBins - 1];
      c = 0;
      for (int b = kNumBins - 1; b >= 0; --b) {
        amn = vmin(amn, bin_min[b]);
        amx = vmax(amx, bin_max[b]);
        c += bin_count[b];
        rarea[b] = half_area(amn, amx);
        rcnt[b] = c;
      }
    }
    int best = -1;
    float best_cost = std::numeric_limits<float>::infinity();
    for (int b = 0; b + 1 < kNumBins; ++b) {
      if (lcnt[b] == 0 || rcnt[b + 1] == 0) continue;
      const float cost = larea[b] * lcnt[b] + rarea[b + 1] * rcnt[b + 1];
      if (cost < best_cost) {
        best_cost = cost;
        best = b;
      }
    }
    if (best < 0) {
      std::stable_sort(idx, idx + m, [&](int a, int b) { return comp(a) < comp(b); });
      split = m / 2;
    } else {
      // stable partition by bin <= best
      int nl = 0, nr = 0;
      if (static_cast<int>(scratch.size()) < m) scratch.resize(m);
      for (int k = 0; k < m; ++k) {
        if (which[k] <= best) idx[nl++] = idx[k];
        else scratch[nr++] = idx[k];
      }
      std::memcpy(idx + nl, scratch.data(), nr * sizeof(int));
      split = nl;
    }
  }

  if (*alloc + 2 > alloc_end) return false;
  const int li = *alloc, ri = *alloc + 1;
  *alloc += 2;
  S.lchild[r.node] = li;
  stack.push_back({ri, r.lo + split, r.hi});
  stack.push_back({li, r.lo, r.lo + split});
  return true;
}

}  // namespace

extern "C" int zyg_build_bvh(
    const float *prim_min_f, const float *prim_max_f, int n, int leaf_size,
    float *nodes_min, float *nodes_max, int *hit_link, int *miss_link,
    int *first_prim, int *prim_count, int *prim_order, int cap) {
  if (n <= 0 || cap < 1) return -1;
  const V3 *prim_min = reinterpret_cast<const V3 *>(prim_min_f);
  const V3 *prim_max = reinterpret_cast<const V3 *>(prim_max_f);

  std::vector<V3> cent(n);
  for (int i = 0; i < n; ++i) {
    cent[i] = {0.5f * (prim_min[i].x + prim_max[i].x),
               0.5f * (prim_min[i].y + prim_max[i].y),
               0.5f * (prim_min[i].z + prim_max[i].z)};
    prim_order[i] = i;
  }

  std::vector<V3> nmin(cap), nmax(cap);
  std::vector<int> lchild(cap, -1), first(cap, -1), count(cap, 0);
  Shared S{prim_min, prim_max, cent.data(), prim_order, leaf_size,
           nmin.data(), nmax.data(), lchild.data(), first.data(),
           count.data()};

  int node_count = 1;
  std::vector<Range> stack;
  stack.push_back({0, 0, n});
  std::vector<int> scratch(n);

  // ---- sequential top: split until enough independent subtrees exist
  // (want == 0: small builds or single-core hosts run fully sequential)
  const unsigned hw = std::max(1u, std::thread::hardware_concurrency());
  const int want = (n >= 1 << 15 && hw > 1) ? static_cast<int>(2 * hw) : 0;
  while (!stack.empty() && (want == 0 || static_cast<int>(stack.size()) < want)) {
    const Range r = stack.back();
    stack.pop_back();
    if (!process_range(S, r, stack, scratch, &node_count, cap)) return -1;
  }

  if (!stack.empty()) {
    // ---- parallel subtrees in disjoint node blocks (<= 2m-1 nodes each)
    const int ntasks = static_cast<int>(stack.size());
    std::vector<int> base(ntasks), end(ntasks);
    {
      long long acc = node_count;
      for (int i = 0; i < ntasks; ++i) {
        const long long need = 2LL * (stack[i].hi - stack[i].lo);
        base[i] = static_cast<int>(acc);
        acc += need;
        end[i] = static_cast<int>(acc);
      }
      if (acc > cap) return -1;
      node_count = static_cast<int>(acc);
    }
    std::vector<char> failed(ntasks, 0);
    const int nthreads = std::min<int>(hw, ntasks);
    std::vector<std::thread> pool;
    pool.reserve(nthreads);
    for (int tid = 0; tid < nthreads; ++tid) {
      pool.emplace_back([&, tid]() {
        std::vector<Range> st;
        std::vector<int> scr;
        for (int i = tid; i < ntasks; i += nthreads) {
          st.clear();
          st.push_back(stack[i]);
          int alloc = base[i];
          while (!st.empty()) {
            const Range r = st.back();
            st.pop_back();
            if (!process_range(S, r, st, scr, &alloc, end[i])) {
              failed[i] = 1;
              return;
            }
          }
        }
      });
    }
    for (auto &t : pool) t.join();
    for (int i = 0; i < ntasks; ++i)
      if (failed[i]) return -1;
  }

  // DFS renumber + thread (hit/miss links), matching bvh.py's layout
  std::vector<int> new_index(node_count, -1), dfs;
  dfs.reserve(node_count);
  {
    std::vector<int> st = {0};
    while (!st.empty()) {
      const int ni = st.back();
      st.pop_back();
      new_index[ni] = static_cast<int>(dfs.size());
      dfs.push_back(ni);
      if (lchild[ni] >= 0) {
        st.push_back(lchild[ni] + 1);
        st.push_back(lchild[ni]);
      }
    }
  }
  const int mcount = static_cast<int>(dfs.size());
  for (int i = 0; i < mcount; ++i) {
    const int old = dfs[i];
    nodes_min[3 * i + 0] = nmin[old].x;
    nodes_min[3 * i + 1] = nmin[old].y;
    nodes_min[3 * i + 2] = nmin[old].z;
    nodes_max[3 * i + 0] = nmax[old].x;
    nodes_max[3 * i + 1] = nmax[old].y;
    nodes_max[3 * i + 2] = nmax[old].z;
    first_prim[i] = first[old];
    prim_count[i] = count[old];
  }
  // miss links via DFS with "next right sibling"
  {
    std::vector<std::pair<int, int>> work = {{0, -1}};
    while (!work.empty()) {
      const auto [i, ms] = work.back();
      work.pop_back();
      miss_link[i] = ms;
      const int old = dfs[i];
      if (lchild[old] >= 0) {
        const int l_new = new_index[lchild[old]];
        const int r_new = new_index[lchild[old] + 1];
        hit_link[i] = l_new;
        work.push_back({l_new, r_new});
        work.push_back({r_new, ms});
      } else {
        hit_link[i] = ms;
      }
    }
  }
  return mcount;
}
