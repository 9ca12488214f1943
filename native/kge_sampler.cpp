// Native training-batch sampler for dglke_tpu.
//
// TPU-native counterpart of the reference's C++ DGL EdgeSampler
// (dgl.contrib.sampling.EdgeSampler, used at
// /root/reference/python/dglke/dataloader/sampler.py:408-419): a
// multi-threaded producer of packed [S, 3B + C*K] int32 superbatches —
// shuffled positive edges plus uniform corrupted-entity negatives — feeding
// the scanned device train step.  The Python sampler tops out around
// 25M triples/s of batch generation on small hosts; this one runs at memcpy
// speed with per-thread xoshiro PRNGs.
//
// Exposed as a plain C ABI for ctypes (no pybind11 dependency).

#include <atomic>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

// splitmix64: seeding / stream derivation
static inline uint64_t splitmix64(uint64_t& x) {
  uint64_t z = (x += 0x9e3779b97f4a7c15ULL);
  z = (z ^ (z >> 30)) * 0xbf58476d1ce4e5b9ULL;
  z = (z ^ (z >> 27)) * 0x94d049bb133111ebULL;
  return z ^ (z >> 31);
}

struct Xoshiro256ss {
  uint64_t s[4];
  explicit Xoshiro256ss(uint64_t seed) {
    for (int i = 0; i < 4; ++i) s[i] = splitmix64(seed);
  }
  static inline uint64_t rotl(uint64_t x, int k) {
    return (x << k) | (x >> (64 - k));
  }
  inline uint64_t next() {
    const uint64_t result = rotl(s[1] * 5, 7) * 9;
    const uint64_t t = s[1] << 17;
    s[2] ^= s[0];
    s[3] ^= s[1];
    s[1] ^= s[2];
    s[0] ^= s[3];
    s[2] ^= t;
    s[3] = rotl(s[3], 45);
    return result;
  }
  // unbiased bounded draw (Lemire)
  inline uint32_t bounded(uint32_t n) {
    uint64_t m = (uint64_t)(uint32_t)next() * n;
    uint32_t l = (uint32_t)m;
    if (l < n) {
      uint32_t t = (0u - n) % n;
      while (l < t) {
        m = (uint64_t)(uint32_t)next() * n;
        l = (uint32_t)m;
      }
    }
    return (uint32_t)(m >> 32);
  }
};

struct Sampler {
  const int32_t* h;
  const int32_t* r;
  const int32_t* t;
  int64_t n_edges;
  int32_t n_entities;
  int32_t batch_size;   // B
  int32_t neg_total;    // C*K per step
  uint64_t seed;
  uint64_t call_count = 0;
  std::vector<int32_t> perm;
  int64_t pos = 0;      // consumed prefix of perm
  Xoshiro256ss shuffle_rng;
  int n_threads;

  Sampler(const int32_t* h_, const int32_t* r_, const int32_t* t_,
          int64_t n_edges_, int32_t n_entities_, int32_t batch_,
          int32_t neg_total_, uint64_t seed_, int n_threads_)
      : h(h_), r(r_), t(t_), n_edges(n_edges_), n_entities(n_entities_),
        batch_size(batch_), neg_total(neg_total_), seed(seed_),
        shuffle_rng(seed_ ^ 0xa5a5a5a5a5a5a5a5ULL),
        n_threads(n_threads_) {
    perm.resize(n_edges);
    for (int64_t i = 0; i < n_edges; ++i) perm[i] = (int32_t)i;
    reshuffle();
  }

  void reshuffle() {
    for (int64_t i = n_edges - 1; i > 0; --i) {
      int64_t j = shuffle_rng.bounded((uint32_t)(i + 1));
      std::swap(perm[i], perm[j]);
    }
    pos = 0;
  }

  // Fill out[S][3B + neg_total] with packed batches; when idx_out is
  // non-null, also write the sampled edge INDICES [S, B] so the caller can
  // gather per-edge side data (edge-importance weights) without the C ABI
  // carrying floats (reference: the DGL EdgeSampler carries edata['impts']
  // through its positive subgraph, sampler.py:338-344).
  void superbatch(int32_t S, int32_t* out, int32_t* idx_out) {
    const int64_t B = batch_size;
    const int64_t row_len = 3 * B + neg_total;
    // 1) draw the positive edge indices serially from the permutation
    std::vector<int32_t> idx((size_t)S * B);
    int64_t need = (int64_t)S * B, got = 0;
    while (need > 0) {
      if (pos >= n_edges) reshuffle();
      int64_t take = std::min(need, n_edges - pos);
      std::memcpy(idx.data() + got, perm.data() + pos,
                  take * sizeof(int32_t));
      pos += take;
      got += take;
      need -= take;
    }
    if (idx_out != nullptr) {
      std::memcpy(idx_out, idx.data(), (size_t)S * B * sizeof(int32_t));
    }
    // 2) parallel gather + negative generation per row
    uint64_t call = call_count++;
    auto work = [&](int tid) {
      for (int32_t srow = tid; srow < S; srow += n_threads) {
        int32_t* row = out + (int64_t)srow * row_len;
        const int32_t* ids = idx.data() + (int64_t)srow * B;
        for (int64_t i = 0; i < B; ++i) {
          int32_t e = ids[i];
          row[i] = h[e];
          row[B + i] = r[e];
          row[2 * B + i] = t[e];
        }
        uint64_t stream = seed ^ (call * 0x9e3779b97f4a7c15ULL) ^
                          ((uint64_t)srow << 32);
        Xoshiro256ss rng(stream);
        int32_t* negs = row + 3 * B;
        for (int32_t k = 0; k < neg_total; ++k) {
          negs[k] = (int32_t)rng.bounded((uint32_t)n_entities);
        }
      }
    };
    if (n_threads <= 1 || S == 1) {
      work(0);
    } else {
      std::vector<std::thread> threads;
      for (int tid = 0; tid < n_threads; ++tid) threads.emplace_back(work, tid);
      for (auto& th : threads) th.join();
    }
  }
};

}  // namespace

extern "C" {

void* kge_sampler_create(const int32_t* h, const int32_t* r,
                         const int32_t* t, int64_t n_edges,
                         int32_t n_entities, int32_t batch_size,
                         int32_t neg_total, uint64_t seed, int n_threads) {
  // int32 permutation indices cap the edge count; n_threads <= 0 would
  // make the strided worker loop (srow += n_threads) never advance.
  if (n_edges <= 0 || n_edges > INT32_MAX || n_entities <= 0 ||
      batch_size <= 0 || neg_total <= 0)
    return nullptr;
  if (n_threads < 1) n_threads = 1;
  return new Sampler(h, r, t, n_edges, n_entities, batch_size, neg_total,
                     seed, n_threads);
}

void kge_sampler_superbatch(void* handle, int32_t S, int32_t* out) {
  static_cast<Sampler*>(handle)->superbatch(S, out, nullptr);
}

// Variant that also emits the sampled edge indices [S, B] (for gathering
// per-edge side data such as edge-importance weights on the Python side).
void kge_sampler_superbatch_idx(void* handle, int32_t S, int32_t* out,
                                int32_t* idx_out) {
  static_cast<Sampler*>(handle)->superbatch(S, out, idx_out);
}

void kge_sampler_destroy(void* handle) {
  delete static_cast<Sampler*>(handle);
}

}  // extern "C"
