// Native k-mer ranking + bifurcation enumeration kernels (host runtime).
//
// C++ twins of sibelia_tpu/index/ranking.py::kmer_ranks_numpy and
// sibelia_tpu/index/enumeration.py::enumerate_bifurcations with identical
// outputs.  Replaces the reference's divsufsort + LCP construction and
// suffix-group scan (reference: src/vertexenumeration.cpp:103,292; :44-65;
// :193-256) on the host path.
//
// Ranking: base-4 packing of up to 32 chars into overlapped u64 keys, one
// LSD radix argsort (pair-scatter, position-stable), then chunked prefix
// doubling over the active set (groups that can still split), dropping
// singleton groups each round.
#include <cstdint>
#include <cstring>
#include <vector>
#include <thread>
#include <algorithm>

namespace {

// Parallel-for over contiguous slices (no-op threading below ~512k items).
template <typename F>
void parallel_for(int64_t n, F f) {
  unsigned hw = std::thread::hardware_concurrency();
  int T = (n >= (1 << 19) && hw > 1) ? (int)std::min<unsigned>(hw, 8) : 1;
  if (T == 1) {
    f((int64_t)0, n);
    return;
  }
  std::vector<std::thread> th;
  for (int t = 0; t < T; ++t)
    th.emplace_back([&, t]() { f(n * t / T, n * (t + 1) / T); });
  for (auto& x : th) x.join();
}

// Position-stable LSD radix argsort of u64 keys.  Keys and indices travel
// together through the passes (sequential reads, scattered writes).
// 16-bit digits (4 passes) beat 8-bit on large inputs despite the bigger
// counter array; the counting and scatter phases are parallelized over
// contiguous slices with per-(thread, digit) cursors, which preserves
// stability.  Constant-digit passes are skipped.
void radix_argsort_u64(const uint64_t* keys, int64_t* idx, int64_t n) {
  int T = 1;
  if (n >= (1 << 19)) {
    unsigned hw = std::thread::hardware_concurrency();
    T = (int)std::min<unsigned>(hw ? hw : 1, 8);
  }
  std::vector<uint64_t> kcur((size_t)n), knext((size_t)n);
  std::vector<int64_t> inext((size_t)n);
  parallel_for(n, [&](int64_t lo, int64_t hi) {
    for (int64_t i = lo; i < hi; ++i) kcur[(size_t)i] = keys[idx[i]];
  });
  std::vector<std::vector<int64_t>> cnt((size_t)T,
                                        std::vector<int64_t>(1 << 16));
  for (int pass = 0; pass < 4; ++pass) {
    int shift = pass * 16;
    auto count_slice = [&](int t) {
      auto& c = cnt[(size_t)t];
      std::fill(c.begin(), c.end(), 0);
      int64_t lo = n * t / T, hi = n * (t + 1) / T;
      for (int64_t i = lo; i < hi; ++i)
        ++c[(kcur[(size_t)i] >> shift) & 0xFFFF];
    };
    if (T == 1) {
      count_slice(0);
    } else {
      std::vector<std::thread> th;
      for (int t = 0; t < T; ++t) th.emplace_back(count_slice, t);
      for (auto& x : th) x.join();
    }
    // merged exclusive prefix over (digit, thread); skip constant digits
    bool trivial = false;
    {
      int64_t total = 0;
      for (int d = 0; d < (1 << 16); ++d) {
        int64_t dsum = 0;
        for (int t = 0; t < T; ++t) dsum += cnt[(size_t)t][(size_t)d];
        if (dsum == n) { trivial = true; break; }
        for (int t = 0; t < T; ++t) {
          int64_t c = cnt[(size_t)t][(size_t)d];
          cnt[(size_t)t][(size_t)d] = total;
          total += c;
        }
      }
    }
    if (trivial) continue;
    auto scatter_slice = [&](int t) {
      auto& c = cnt[(size_t)t];
      int64_t lo = n * t / T, hi = n * (t + 1) / T;
      for (int64_t i = lo; i < hi; ++i) {
        int64_t slot = c[(kcur[(size_t)i] >> shift) & 0xFFFF]++;
        knext[(size_t)slot] = kcur[(size_t)i];
        inext[(size_t)slot] = idx[i];
      }
    };
    if (T == 1) {
      scatter_slice(0);
    } else {
      std::vector<std::thread> th;
      for (int t = 0; t < T; ++t) th.emplace_back(scatter_slice, t);
      for (auto& x : th) x.join();
    }
    kcur.swap(knext);
    std::memcpy(idx, inext.data(), (size_t)n * sizeof(int64_t));
  }
}

// Fills rank (bucket-start dense ranks) and order (stable by rank then
// position for k > 32; the initial stable radix order for k <= 32, which
// already is that order) — semantics identical to kmer_ranks_numpy.
void compute_ranks(const uint8_t* codes, int64_t n, int64_t k,
                   std::vector<int64_t>& rank, std::vector<int64_t>& order) {
  int64_t m = k < 32 ? k : 32;
  int64_t b = 1;
  while (b * 2 <= m && b < 16) b *= 2;
  int64_t off = m - b;
  const int64_t pad = 40;

  // next separator at or after i (padding positions count as separators,
  // as in the numpy twin's zero padding)
  std::vector<int64_t> next_sep((size_t)(n + pad));
  {
    int64_t ns = n + pad;
    for (int64_t i = n + pad - 1; i >= 0; --i) {
      uint8_t c = (i < n) ? codes[i] : 0;
      if (c == 0) ns = std::min(ns, i);
      next_sep[(size_t)i] = ns;
    }
  }

  std::vector<uint64_t> p((size_t)(n + pad));
  parallel_for(n + pad, [&](int64_t lo, int64_t hi) {
    for (int64_t i = lo; i < hi; ++i) {
      uint64_t c = (i < n) ? codes[i] : 0;
      p[(size_t)i] = (c - 1) & 3;
    }
  });
  {
    int64_t width = 1;
    std::vector<uint64_t> shifted((size_t)(n + pad));
    while (width < b) {
      parallel_for(n + pad, [&](int64_t lo, int64_t hi) {
        for (int64_t i = lo; i < hi; ++i) {
          uint64_t s = (i + width < n + pad) ? p[(size_t)(i + width)] : 0;
          shifted[(size_t)i] = (p[(size_t)i] << (2 * width)) | s;
        }
      });
      p.swap(shifted);
      width *= 2;
    }
  }

  std::vector<uint64_t> big((size_t)n);
  parallel_for(n, [&](int64_t lo, int64_t hi) {
    for (int64_t i = lo; i < hi; ++i) {
      bool valid = (i + m) <= next_sep[(size_t)i];
      big[(size_t)i] = valid
          ? ((p[(size_t)i] << 32) | p[(size_t)(off + i)])
          : 0xFFFFFFFFFFFFFFFFULL;
    }
  });
  p.clear();
  p.shrink_to_fit();

  order.resize((size_t)n);
  for (int64_t i = 0; i < n; ++i) order[(size_t)i] = i;
  radix_argsort_u64(big.data(), order.data(), n);

  rank.resize((size_t)n);
  {
    int64_t start = 0;
    for (int64_t i = 0; i < n; ++i) {
      if (i > 0 && big[(size_t)order[(size_t)i]] !=
                       big[(size_t)order[(size_t)(i - 1)]])
        start = i;
      rank[(size_t)order[(size_t)i]] = start;
    }
  }

  if (k <= 32) return;

  // r with negative sentinels past the end (numpy tail -(arange(k+1)+2))
  std::vector<int64_t> r((size_t)(n + k + 1));
  std::memcpy(r.data(), rank.data(), (size_t)n * sizeof(int64_t));
  for (int64_t i = 0; i < k + 1; ++i) r[(size_t)(n + i)] = -(i + 2);

  std::vector<int64_t> active = order;
  std::vector<uint8_t> grp((size_t)n);
  for (int64_t i = 0; i < n; ++i)
    grp[(size_t)i] =
        (i == 0) || (big[(size_t)active[(size_t)i]] !=
                     big[(size_t)active[(size_t)(i - 1)]]);
  big.clear();
  big.shrink_to_fit();

  std::vector<uint64_t> key;
  std::vector<int64_t> sub, k1v, k2v, nact;
  std::vector<uint8_t> ngrp;
  int64_t length = 32;
  while (length < k) {
    int64_t step = std::min(length, k - length);
    {  // drop singleton groups
      int64_t w = 0, i = 0;
      int64_t na = (int64_t)active.size();
      while (i < na) {
        int64_t j = i + 1;
        while (j < na && !grp[(size_t)j]) ++j;
        if (j - i >= 2) {
          for (int64_t t = i; t < j; ++t) {
            active[(size_t)w] = active[(size_t)t];
            grp[(size_t)w] = (t == i) ? 1 : 0;
            ++w;
          }
        }
        i = j;
      }
      active.resize((size_t)w);
      grp.resize((size_t)w);
    }
    int64_t na = (int64_t)active.size();
    if (na == 0) break;
    key.resize((size_t)na);
    sub.resize((size_t)na);
    k1v.resize((size_t)na);
    k2v.resize((size_t)na);
    for (int64_t i = 0; i < na; ++i) {
      int64_t pos = active[(size_t)i];
      int64_t a = r[(size_t)pos];
      int64_t c = r[(size_t)(pos + step)];
      k1v[(size_t)i] = a;
      k2v[(size_t)i] = c;
      key[(size_t)i] =
          ((uint64_t)a << 32) | ((uint64_t)(c + (1 << 16)) & 0xFFFFFFFFULL);
      sub[(size_t)i] = i;
    }
    radix_argsort_u64(key.data(), sub.data(), na);
    nact.resize((size_t)na);
    ngrp.resize((size_t)na);
    int64_t parent_first = 0, sub_start = 0;
    for (int64_t i = 0; i < na; ++i) {
      int64_t s = sub[(size_t)i];
      nact[(size_t)i] = active[(size_t)s];
      bool parent_new =
          (i == 0) || (k1v[(size_t)s] != k1v[(size_t)sub[(size_t)(i - 1)]]);
      bool grp_new = parent_new ||
          (k2v[(size_t)s] != k2v[(size_t)sub[(size_t)(i - 1)]]);
      if (parent_new) parent_first = i;
      if (grp_new) sub_start = i;
      ngrp[(size_t)i] = grp_new ? 1 : 0;
      r[(size_t)nact[(size_t)i]] = k1v[(size_t)s] + (sub_start - parent_first);
    }
    active.swap(nact);
    grp.swap(ngrp);
    length += step;
  }
  std::memcpy(rank.data(), r.data(), (size_t)n * sizeof(int64_t));

  // final order: stable by (rank, position)
  key.resize((size_t)n);
  for (int64_t i = 0; i < n; ++i)
    key[(size_t)i] = ((uint64_t)rank[(size_t)i] << 32) | (uint64_t)i;
  for (int64_t i = 0; i < n; ++i) order[(size_t)i] = i;
  radix_argsort_u64(key.data(), order.data(), n);
}

}  // namespace

extern "C" {

// codes: u8[n] with values 0..4 (0 = separator '#'); outputs rank[n] and
// order[n] (int64), identical to kmer_ranks_numpy.
void kmer_ranks_native(const uint8_t* codes, int64_t n, int64_t k,
                       int64_t* rank_out, int64_t* order_out) {
  if (n <= 0) return;
  std::vector<int64_t> rank, order;
  compute_ranks(codes, n, k, rank, order);
  std::memcpy(rank_out, rank.data(), (size_t)n * sizeof(int64_t));
  std::memcpy(order_out, order.data(), (size_t)n * sizeof(int64_t));
}

// Full bifurcation enumeration over the supergenome
// (enumerate_bifurcations twin).  Returns a handle; fetch per-strand
// arrays sorted by (chr, pos) and destroy.
struct EnumResult {
  int64_t count;
  std::vector<int64_t> chr[2], pos[2];
  std::vector<uint32_t> id[2];
};

void* enum_run(const uint8_t* codes, int64_t n, const int64_t* block_starts,
               int64_t n_blocks, int64_t n_chr, int64_t k) {
  EnumResult* res = new EnumResult;
  res->count = 0;
  if (n <= 0) return res;
  std::vector<int64_t> rank, order;
  compute_ranks(codes, n, k, rank, order);

  // validity: position is not a separator and its k-window crosses none
  std::vector<int64_t> next_sep((size_t)n);
  {
    int64_t ns = n;
    for (int64_t i = n - 1; i >= 0; --i) {
      if (codes[i] == 0) ns = i;
      next_sep[(size_t)i] = ns;
    }
  }

  // scan groups (equal rank) over valid positions in rank order
  struct Sel {
    int64_t sgpos;
    uint32_t id;
  };
  std::vector<Sel> sel;
  int64_t i = 0;
  int64_t count = 0;
  std::vector<int64_t> members;
  while (i < n) {
    int64_t p0 = order[(size_t)i];
    int64_t r0 = rank[(size_t)p0];
    int64_t j = i;
    members.clear();
    int prev_or = 0, next_or = 0;
    bool terminal = false;
    for (; j < n && rank[(size_t)order[(size_t)j]] == r0; ++j) {
      int64_t p = order[(size_t)j];
      if (codes[p] == 0 || p + k > next_sep[(size_t)p]) continue;
      members.push_back(p);
      uint8_t pc = codes[p - 1];  // supergenome starts with '#', p >= 1
      uint8_t nc = (p + k <= n - 1) ? codes[p + k] : codes[n - 1];
      prev_or |= 1 << pc;
      next_or |= 1 << nc;
      if (pc == 0 || nc == 0) terminal = true;
    }
    if (!members.empty()) {
      auto is_bif = [](int bits) {
        return __builtin_popcount(bits) > 1 || (bits & 1) != 0;
      };
      bool bif = is_bif(prev_or) || is_bif(next_or);
      bool counted = bif && ((int64_t)members.size() > 1 || terminal);
      if (counted) {
        for (int64_t p : members)
          sel.push_back(Sel{p, (uint32_t)count});
        ++count;
      }
    }
    i = j;
  }
  res->count = count;

  // map to (strand, chr, local) and sort per strand by (chr, pos)
  struct Inst {
    int64_t chr, pos;
    uint32_t id;
  };
  std::vector<Inst> strand_insts[2];
  for (const Sel& s : sel) {
    // block = last start <= pos (upper_bound - 1), clipped as in numpy
    int64_t lo = 0, hi = n_blocks;
    while (lo < hi) {
      int64_t mid = (lo + hi) / 2;
      if (block_starts[mid] <= s.sgpos)
        lo = mid + 1;
      else
        hi = mid;
    }
    int64_t blk = lo - 1;
    if (blk < 0) blk = 0;
    if (blk > 2 * n_chr - 1) blk = 2 * n_chr - 1;
    int64_t chr = (blk < n_chr) ? blk : blk - n_chr;
    int64_t local = s.sgpos - block_starts[blk];
    int strand = (blk >= n_chr) ? 1 : 0;
    strand_insts[strand].push_back(Inst{chr, local, s.id});
  }
  for (int s = 0; s < 2; ++s) {
    std::sort(strand_insts[s].begin(), strand_insts[s].end(),
              [](const Inst& a, const Inst& b) {
                return a.chr != b.chr ? a.chr < b.chr : a.pos < b.pos;
              });
    res->chr[s].reserve(strand_insts[s].size());
    res->pos[s].reserve(strand_insts[s].size());
    res->id[s].reserve(strand_insts[s].size());
    for (const Inst& it : strand_insts[s]) {
      res->chr[s].push_back(it.chr);
      res->pos[s].push_back(it.pos);
      res->id[s].push_back(it.id);
    }
  }
  return res;
}

int64_t enum_count(void* h) { return ((EnumResult*)h)->count; }

int64_t enum_strand_size(void* h, int s) {
  return (int64_t)((EnumResult*)h)->chr[s].size();
}

void enum_fetch(void* h, int s, int64_t* chr_out, int64_t* pos_out,
                uint32_t* id_out) {
  EnumResult* r = (EnumResult*)h;
  size_t m = r->chr[s].size();
  std::memcpy(chr_out, r->chr[s].data(), m * sizeof(int64_t));
  std::memcpy(pos_out, r->pos[s].data(), m * sizeof(int64_t));
  std::memcpy(id_out, r->id[s].data(), m * sizeof(uint32_t));
}

void enum_destroy(void* h) { delete (EnumResult*)h; }

}  // extern "C"
