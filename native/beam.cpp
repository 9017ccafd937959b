// Native host-side decode kernels: CTC prefix beam search + edit distance.
//
// The compute path of this framework is JAX/XLA on TPU; these are the two
// genuinely host-side hot loops (SURVEY.md §2.5): the CTC prefix beam search
// used for offline rescoring (reference realtime_sim/ctc_decoder.py:45-118,
// a pure-Python triple loop) and Levenshtein distance for PER evaluation at
// scale. Exposed with C linkage for ctypes binding
// (cross_patient_speech_decoding_tpu/realtime/beam.py); a Python fallback
// with identical semantics lives in ops/ctc.py and is the parity oracle.
//
// Build: ./build.sh  (g++ -O3 -shared -fPIC)

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <limits>
#include <unordered_map>
#include <vector>

namespace {

constexpr double kNegInf = -std::numeric_limits<double>::infinity();

inline double logsumexp2(double a, double b) {
  if (a == kNegInf && b == kNegInf) return kNegInf;
  double m = a > b ? a : b;
  return m + std::log(std::exp(a - m) + std::exp(b - m));
}

// Prefixes live in an arena trie: node 0 is the empty prefix.
struct PrefixArena {
  std::vector<int32_t> parent{-1};
  std::vector<int32_t> sym{-1};
  // child lookup: (node << 20) | sym  -> child node (V < 2^20 assumed)
  std::unordered_map<int64_t, int32_t> children;

  int32_t child(int32_t node, int32_t s) {
    int64_t key = (static_cast<int64_t>(node) << 20) | s;
    auto it = children.find(key);
    if (it != children.end()) return it->second;
    int32_t id = static_cast<int32_t>(parent.size());
    parent.push_back(node);
    sym.push_back(s);
    children.emplace(key, id);
    return id;
  }
};

struct Probs {
  double pb = kNegInf;   // log P(prefix, ends in blank)
  double pnb = kNegInf;  // log P(prefix, ends in non-blank)
  double total() const { return logsumexp2(pb, pnb); }
};

}  // namespace

extern "C" {

// log_probs: (T, V) row-major log probabilities.
// out_seq: caller-allocated buffer of at least T ints.
// Returns decoded length; *out_nll gets the negative log likelihood.
int prefix_beam_search(const float* log_probs, int T, int V, int beam_size,
                       int blank, int32_t* out_seq, double* out_nll) {
  PrefixArena arena;
  std::unordered_map<int32_t, Probs> beam;
  beam[0] = Probs{0.0, kNegInf};

  std::vector<std::pair<int32_t, Probs>> sorted;
  for (int t = 0; t < T; ++t) {
    const float* row = log_probs + static_cast<int64_t>(t) * V;
    std::unordered_map<int32_t, Probs> next;
    next.reserve(beam.size() * (V + 1));

    for (const auto& [node, p] : beam) {
      const double total = p.total();
      // blank extension: prefix unchanged
      {
        Probs& q = next[node];
        q.pb = logsumexp2(q.pb, total + row[blank]);
      }
      const int32_t last = arena.sym[node];
      for (int s = 0; s < V; ++s) {
        if (s == blank) continue;
        const double ps = row[s];
        if (s == last) {
          // repeat without blank merges into the same prefix...
          Probs& q_same = next[node];
          q_same.pnb = logsumexp2(q_same.pnb, p.pnb + ps);
          // ...and extends only from the ends-in-blank mass
          int32_t ext = arena.child(node, s);
          Probs& q_ext = next[ext];
          q_ext.pnb = logsumexp2(q_ext.pnb, p.pb + ps);
        } else {
          int32_t ext = arena.child(node, s);
          Probs& q_ext = next[ext];
          q_ext.pnb = logsumexp2(q_ext.pnb, total + ps);
        }
      }
    }

    sorted.assign(next.begin(), next.end());
    const size_t keep = std::min<size_t>(beam_size, sorted.size());
    std::partial_sort(
        sorted.begin(), sorted.begin() + keep, sorted.end(),
        [](const auto& a, const auto& b) { return a.second.total() > b.second.total(); });
    beam.clear();
    for (size_t i = 0; i < keep; ++i) beam.emplace(sorted[i]);
  }

  int32_t best = 0;
  double best_total = kNegInf;
  for (const auto& [node, p] : beam) {
    const double tot = p.total();
    if (tot > best_total) {
      best_total = tot;
      best = node;
    }
  }
  *out_nll = -best_total;

  // walk the trie back to the root
  std::vector<int32_t> rev;
  for (int32_t n = best; n != 0; n = arena.parent[n]) rev.push_back(arena.sym[n]);
  std::reverse(rev.begin(), rev.end());
  for (size_t i = 0; i < rev.size(); ++i) out_seq[i] = rev[i];
  return static_cast<int>(rev.size());
}

// Batched Levenshtein distance over padded int32 sequences.
// preds: (B, P), targets: (B, L); lengths give valid prefixes.
void edit_distance_batch(const int32_t* preds, const int32_t* pred_lens,
                         const int32_t* targets, const int32_t* target_lens,
                         int B, int P, int L, int32_t* out) {
  std::vector<int32_t> dp(static_cast<size_t>(L) + 1);
  for (int b = 0; b < B; ++b) {
    const int32_t* p = preds + static_cast<int64_t>(b) * P;
    const int32_t* t = targets + static_cast<int64_t>(b) * L;
    const int pl = pred_lens[b], tl = target_lens[b];
    for (int j = 0; j <= tl; ++j) dp[j] = j;
    for (int i = 0; i < pl; ++i) {
      int32_t diag = dp[0];
      dp[0] = i + 1;
      for (int j = 1; j <= tl; ++j) {
        const int32_t cost = (p[i] == t[j - 1]) ? 0 : 1;
        const int32_t val =
            std::min(std::min(dp[j] + 1, dp[j - 1] + 1), diag + cost);
        diag = dp[j];
        dp[j] = val;
      }
    }
    out[b] = dp[tl];
  }
}

}  // extern "C"
