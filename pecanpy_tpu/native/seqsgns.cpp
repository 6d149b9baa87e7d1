// Sequential skip-gram negative-sampling trainer (gensim loop semantics).
//
// Evidence tool, not a production path: the TPU trainer applies one
// simultaneous capped-sum step per chunk of walks, where gensim /
// word2vec.c applies every (center, context) pair strictly in sequence,
// mutating the tables between pairs. This trainer reproduces the
// sequential semantics exactly (single thread, no hogwild races) so the
// two dynamics can be scored side by side on the SAME device-generated
// walks (benchmarks/bench_quality.py --trainer sequential).
//
// Loop contract (gensim word2vec train_batch_sg / train_sg_pair,
// reference usage: /root/reference/src/pecanpy/pecanpy.py:279-288):
//   * sentence = walk prefix, subsampled by keep_prob BEFORE windowing
//     (dropped tokens do not count as context);
//   * per center position a reduced window: b ~ U{0..window-1},
//     effective span = window - b;
//   * pair (center, context): input vector l1 = W_in[context], outputs
//     = W_out[center] (label 1) plus `negative` unigram^0.75 draws
//     (label 0), a draw colliding with the center skipped;
//   * updates applied immediately (W_out rows during the pair,
//     W_in[context] += neu1e after it);
//   * linear lr decay by token progress across all epochs.
//
// The RNG is splitmix64 (public-domain construction), duplicated
// bit-for-bit in tests/test_seqsgns.py's Python oracle so the C++ loop
// itself is pinned by an exact test at tiny scale.
#include <cmath>
#include <cstdint>
#include <cstring>

namespace {

struct SplitMix64 {
  uint64_t state;
  explicit SplitMix64(uint64_t seed) : state(seed) {}
  uint64_t next() {
    state += 0x9E3779B97f4A7C15ULL;
    uint64_t z = state;
    z = (z ^ (z >> 30)) * 0xBF58476D1CE4E5B9ULL;
    z = (z ^ (z >> 27)) * 0x94D049BB133111EBULL;
    return z ^ (z >> 31);
  }
  // uniform in [0, 1)
  double uniform() { return (next() >> 11) * (1.0 / 9007199254740992.0); }
  // uniform integer in [0, n)
  uint64_t randint(uint64_t n) { return next() % n; }
};

inline float sigmoidf(float x) { return 1.0f / (1.0f + std::exp(-x)); }

}  // namespace

extern "C" {

// Trains in place; returns the number of trained (center, context) pairs.
long long pp_train_sgns_sequential(
    const int32_t* walks, const int32_t* eff_len, long long n_walks,
    long long t_cols, float* w_in, float* w_out, long long n_nodes,
    long long dim, const float* keep_prob, const int32_t* neg_table,
    long long neg_table_size, int window, int negative, float alpha,
    float min_alpha, double total_tokens, int epochs, uint64_t seed) {
  SplitMix64 rng(seed);
  int32_t* sent = new int32_t[t_cols];
  float* neu1e = new float[dim];
  double done_tokens = 0.0;
  long long pairs = 0;
  (void)n_nodes;

  for (int epoch = 0; epoch < epochs; ++epoch) {
    for (long long w = 0; w < n_walks; ++w) {
      const int32_t* walk = walks + w * t_cols;
      long long eff = eff_len[w];
      if (eff > t_cols) eff = t_cols;
      // subsample: prune before windowing
      long long m = 0;
      for (long long i = 0; i < eff; ++i) {
        int32_t tok = walk[i];
        if (rng.uniform() < keep_prob[tok]) sent[m++] = tok;
      }
      float lr = alpha - (float)((alpha - min_alpha) *
                                 (done_tokens / (total_tokens > 1.0
                                                     ? total_tokens
                                                     : 1.0)));
      if (lr < min_alpha) lr = min_alpha;

      for (long long i = 0; i < m; ++i) {  // center position
        long long b = (long long)rng.randint((uint64_t)window);
        long long lo = i - (window - b);
        long long hi = i + (window - b);
        if (lo < 0) lo = 0;
        if (hi >= m) hi = m - 1;
        int32_t cen = sent[i];
        for (long long j = lo; j <= hi; ++j) {  // context position
          if (j == i) continue;
          int32_t ctx = sent[j];
          float* l1 = w_in + (long long)ctx * dim;
          std::memset(neu1e, 0, dim * sizeof(float));
          // positive output row + `negative` sampled rows
          for (int k = 0; k < negative + 1; ++k) {
            int32_t target;
            float label;
            if (k == 0) {
              target = cen;
              label = 1.0f;
            } else {
              target = neg_table[rng.randint((uint64_t)neg_table_size)];
              if (target == cen) continue;  // collision skip
              label = 0.0f;
            }
            float* l2 = w_out + (long long)target * dim;
            float f = 0.0f;
            for (long long d = 0; d < dim; ++d) f += l1[d] * l2[d];
            float g = (label - sigmoidf(f)) * lr;
            for (long long d = 0; d < dim; ++d) neu1e[d] += g * l2[d];
            for (long long d = 0; d < dim; ++d) l2[d] += g * l1[d];
          }
          for (long long d = 0; d < dim; ++d) l1[d] += neu1e[d];
          ++pairs;
        }
      }
      done_tokens += (double)eff;
    }
  }
  delete[] sent;
  delete[] neu1e;
  return pairs;
}

}  // extern "C"
