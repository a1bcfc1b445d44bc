// Native CTC prefix beam search with char n-gram LM shallow fusion.
//
// Semantics mirror the Python reference implementation
// (pero_pretraining_tpu/utils/ctc_decode.py — Hannun et al. 2014 prefix beam
// search; pero_pretraining_tpu/utils/lm.py — stupid-backoff char n-gram, the
// in-repo equivalent of the external PERO-OCR production decoder the
// reference delegates to, reference README.md:9 / SURVEY.md §6). The Python
// decoder stays as the semantics oracle; tests assert this implementation
// produces identical transcriptions (tests/test_native_beam.py).
//
// Design: the search is sequential and data-dependent — the opposite of what
// XLA wants — so it lives on the host, in C++, with the batch fanned out over
// a thread pool (the per-line searches are independent and read-only over the
// LM). All probability math is double precision, matching the Python
// reference's float64 arrays exactly.
//
// Exposed C ABI (ctypes-bound in pero_pretraining_tpu/utils/native_beam.py):
//   lm_create / lm_free     build an immutable stupid-backoff LM from a blob
//   beam_decode_batch       decode N ragged lines in parallel

#include <algorithm>
#include <array>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <string>
#include <thread>
#include <unordered_map>
#include <vector>

namespace {

constexpr double kNegInf = -std::numeric_limits<double>::infinity();
constexpr int kMaxCtx = 15;  // supports n-gram order <= 16

inline double logaddexp(double a, double b) {
  if (a == kNegInf) return b;
  if (b == kNegInf) return a;
  if (a < b) std::swap(a, b);
  return a + std::log1p(std::exp(b - a));
}

// ---------------------------------------------------------------------------
// Stupid-backoff char n-gram LM. Contexts are sequences of unicode code
// points (BOS = 0x02), packed into byte-string keys of an unordered_map.
// Scoring matches CharNgramLM.logp_all: walk the backoff chain once for a
// whole candidate set, accumulating log(backoff_factor) per level, grounding
// in an add-one smoothed unigram floor.
// ---------------------------------------------------------------------------

struct Bucket {
  std::unordered_map<uint32_t, uint64_t> counts;
  uint64_t total = 0;
};

struct Lm {
  int order = 0;
  double log_backoff = 0.0;
  uint64_t vocab_size = 0;
  std::unordered_map<std::string, Bucket> table;

  static std::string key(const uint32_t* ctx, int len) {
    return std::string(reinterpret_cast<const char*>(ctx),
                       static_cast<size_t>(len) * sizeof(uint32_t));
  }

  // log P(c | ctx) for each candidate char code; one backoff walk total.
  void logp_all(const uint32_t* ctx, int ctx_len, const uint32_t* chars, int n,
                double* out) const {
    std::vector<int> remaining(n);
    for (int i = 0; i < n; ++i) {
      remaining[i] = i;
      out[i] = kNegInf;
    }
    double backoff_penalty = 0.0;
    int start = 0;  // context suffix start (drop leftmost char per backoff)
    for (;;) {
      auto it = table.find(key(ctx + start, ctx_len - start));
      if (it != table.end()) {
        const Bucket& bucket = it->second;
        std::vector<int> still;
        still.reserve(remaining.size());
        for (int i : remaining) {
          auto cit = bucket.counts.find(chars[i]);
          if (cit != bucket.counts.end() && cit->second > 0) {
            out[i] = backoff_penalty +
                     std::log(static_cast<double>(cit->second) /
                              static_cast<double>(bucket.total));
          } else {
            still.push_back(i);
          }
        }
        remaining.swap(still);
      }
      if (remaining.empty()) break;
      if (start >= ctx_len) {  // empty context: smoothed unigram floor
        auto uit = table.find(std::string());
        uint64_t unigram_total = (uit != table.end()) ? uit->second.total : 0;
        double floor = backoff_penalty +
                       std::log(1.0 / static_cast<double>(unigram_total + vocab_size + 1));
        for (int i : remaining) out[i] = floor;
        break;
      }
      ++start;
      backoff_penalty += log_backoff;
    }
  }
};

// ---------------------------------------------------------------------------
// Prefix beam search. Prefixes live in a node pool (parent-pointer trie);
// each beam carries its blank/non-blank masses and its LM context (the last
// order-1 emitted chars, BOS-padded).
// ---------------------------------------------------------------------------

struct Ctx {
  std::array<uint32_t, kMaxCtx> buf{};
  uint8_t len = 0;

  void push(uint32_t ch, int max_len) {
    if (max_len <= 0) {
      len = 0;
      return;
    }
    if (len < max_len) {
      buf[len++] = ch;
    } else {
      for (int i = 1; i < len; ++i) buf[i - 1] = buf[i];
      buf[len - 1] = ch;
    }
  }
};

struct Beam {
  int32_t node = -1;  // index into the node pool; -1 = empty prefix
  int32_t last = -1;  // last emitted class id (-1 for empty prefix)
  double p_blank = kNegInf;
  double p_nonblank = kNegInf;
  Ctx ctx;

  double total() const { return logaddexp(p_blank, p_nonblank); }
};

struct Node {
  int32_t parent;
  int32_t cls;
};

int beam_search_line(const float* logp, int s, int c, int blank, int beam_width,
                     int prune_chars, double prune_logp, const Lm* lm,
                     double lm_weight, double insertion_bonus,
                     const uint32_t* id_to_char, int32_t* out_ids, int out_cap) {
  std::vector<Node> pool;
  pool.reserve(256);
  // canonical prefix ids: (parent_node + 1) << 32 | cls -> node. A prefix can
  // be reached both by staying on it AND by extending its parent in the same
  // frame; the Python oracle merges those masses (dict keyed by the prefix
  // tuple), so prefix identity — not (source beam, candidate) — must key the
  // next-beam set.
  std::unordered_map<int64_t, int32_t> trie;

  const int max_ctx = (lm != nullptr) ? lm->order - 1 : 0;
  auto make_root = [&]() {
    Beam root;
    for (int i = 0; i < max_ctx; ++i) root.ctx.push(0x02, max_ctx);
    root.p_blank = 0.0;
    return root;
  };

  std::vector<Beam> beams{make_root()};
  std::vector<int> order_idx(c);
  std::vector<int> candidates;
  std::vector<uint32_t> cand_chars;
  std::vector<double> lm_adds;
  std::vector<Beam> next;
  std::unordered_map<int64_t, int> slot_of;  // prefix node (+1) -> index in `next`

  for (int t = 0; t < s; ++t) {
    const float* frame = logp + static_cast<int64_t>(t) * c;

    // candidates: top prune_chars by value, minus blank, above the floor —
    // the slice happens BEFORE the blank/floor filter, matching Python.
    for (int i = 0; i < c; ++i) order_idx[i] = i;
    int take = std::min(prune_chars, c);
    std::partial_sort(order_idx.begin(), order_idx.begin() + take, order_idx.end(),
                      [&](int a, int b) { return frame[a] > frame[b]; });
    candidates.clear();
    for (int i = 0; i < take; ++i) {
      int cls = order_idx[i];
      if (cls != blank && static_cast<double>(frame[cls]) > prune_logp) {
        candidates.push_back(cls);
      }
    }
    const double lp_blank = static_cast<double>(frame[blank]);

    if (lm != nullptr) {
      cand_chars.resize(candidates.size());
      for (size_t i = 0; i < candidates.size(); ++i) {
        cand_chars[i] = id_to_char ? id_to_char[candidates[i]] : 0;
      }
    }

    next.clear();
    slot_of.clear();

    // find-or-create the next-beam slot for a prefix node
    auto get_slot = [&](int32_t node) -> std::pair<Beam*, bool> {
      auto it = slot_of.find(node);
      if (it != slot_of.end()) return {&next[it->second], false};
      slot_of.emplace(node, static_cast<int>(next.size()));
      next.emplace_back();
      return {&next.back(), true};
    };

    for (const Beam& beam : beams) {
      const double total = beam.total();

      // stay: emit blank, or repeat the last char (collapses, no new label)
      {
        auto [stay, created] = get_slot(beam.node);
        if (created) {
          stay->node = beam.node;
          stay->last = beam.last;
          stay->ctx = beam.ctx;
        }
        stay->p_blank = logaddexp(stay->p_blank, total + lp_blank);
        if (beam.last >= 0) {
          stay->p_nonblank = logaddexp(
              stay->p_nonblank, beam.p_nonblank + static_cast<double>(frame[beam.last]));
        }
      }

      if (candidates.empty()) continue;
      if (lm != nullptr) {
        lm_adds.resize(candidates.size());
        lm->logp_all(beam.ctx.buf.data(), beam.ctx.len, cand_chars.data(),
                     static_cast<int>(candidates.size()), lm_adds.data());
      }

      for (size_t i = 0; i < candidates.size(); ++i) {
        const int cls = candidates[i];
        const double lp_c = static_cast<double>(frame[cls]);
        const double add =
            (lm != nullptr) ? lm_weight * lm_adds[i] + insertion_bonus : insertion_bonus;
        const double mass = ((cls == beam.last) ? beam.p_blank : total) + lp_c + add;
        if (mass == kNegInf) continue;
        const int64_t child_key =
            ((static_cast<int64_t>(beam.node) + 1) << 32) | static_cast<int64_t>(cls);
        auto tit = trie.find(child_key);
        int32_t child;
        if (tit != trie.end()) {
          child = tit->second;
        } else {
          pool.push_back(Node{beam.node, cls});
          child = static_cast<int32_t>(pool.size() - 1);
          trie.emplace(child_key, child);
        }
        auto [ext, created] = get_slot(child);
        if (created) {
          ext->node = child;
          ext->last = cls;
          ext->ctx = beam.ctx;
          ext->ctx.push(id_to_char ? id_to_char[cls] : 0, max_ctx);
        }
        ext->p_nonblank = logaddexp(ext->p_nonblank, mass);
      }
    }

    // keep the top beam_width by total mass
    const int keep = std::min(static_cast<int>(next.size()), beam_width);
    std::partial_sort(next.begin(), next.begin() + keep, next.end(),
                      [](const Beam& a, const Beam& b) { return a.total() > b.total(); });
    next.resize(keep);
    beams.swap(next);
    if (beams.empty()) beams.push_back(make_root());  // S==0 / all pruned
  }

  const Beam* best = &beams[0];
  for (const Beam& b : beams) {
    if (b.total() > best->total()) best = &b;
  }

  // walk the node chain; prefixes ARE the collapsed label sequences
  std::vector<int32_t> rev;
  for (int32_t node = best->node; node >= 0; node = pool[node].parent) {
    rev.push_back(pool[node].cls);
  }
  const int n = std::min(static_cast<int>(rev.size()), out_cap);
  for (int i = 0; i < n; ++i) out_ids[i] = rev[rev.size() - 1 - i];
  return static_cast<int>(rev.size());
}

}  // namespace

extern "C" {

// Blob layout (int64 array), repeated per context:
//   ctx_len, ctx_code*ctx_len, n_entries, (char_code, count)*n_entries
void* lm_create(int32_t order, double backoff_factor, int64_t vocab_size,
                const int64_t* blob, int64_t blob_len) {
  if (order < 1 || order - 1 > kMaxCtx) return nullptr;
  Lm* lm = new Lm();
  lm->order = order;
  lm->log_backoff = std::log(backoff_factor);
  lm->vocab_size = static_cast<uint64_t>(vocab_size);
  int64_t i = 0;
  std::vector<uint32_t> ctx;
  while (i < blob_len) {
    const int64_t ctx_len = blob[i++];
    ctx.resize(ctx_len);
    for (int64_t k = 0; k < ctx_len; ++k) ctx[k] = static_cast<uint32_t>(blob[i++]);
    const int64_t n = blob[i++];
    Bucket& bucket = lm->table[Lm::key(ctx.data(), static_cast<int>(ctx_len))];
    for (int64_t k = 0; k < n; ++k) {
      const uint32_t ch = static_cast<uint32_t>(blob[i++]);
      const uint64_t count = static_cast<uint64_t>(blob[i++]);
      bucket.counts[ch] += count;
      bucket.total += count;
    }
  }
  return lm;
}

void lm_free(void* lm) { delete static_cast<Lm*>(lm); }

// Ragged batch: line i owns frames [offsets[i], offsets[i+1]) of the packed
// (sum_S, C) float32 log-prob buffer. Decodes lines across `num_threads`.
// out_ids is (n, out_cap) int32; out_lens[i] receives the TRUE length (may
// exceed out_cap, in which case the ids are truncated).
void beam_decode_batch(const float* logp, const int64_t* offsets, int32_t n,
                       int32_t c, int32_t blank, int32_t beam_width,
                       int32_t prune_chars, double prune_logp, void* lm_handle,
                       double lm_weight, double insertion_bonus,
                       const uint32_t* id_to_char, int32_t* out_ids,
                       int32_t out_cap, int32_t* out_lens, int32_t num_threads) {
  const Lm* lm = static_cast<const Lm*>(lm_handle);
  if (num_threads < 1) num_threads = 1;
  num_threads = std::min(num_threads, n > 0 ? n : 1);

  auto work = [&](int start, int step) {
    for (int i = start; i < n; i += step) {
      const int64_t lo = offsets[i];
      const int64_t hi = offsets[i + 1];
      out_lens[i] = beam_search_line(
          logp + lo * c, static_cast<int>(hi - lo), c, blank, beam_width,
          prune_chars, prune_logp, lm, lm_weight, insertion_bonus, id_to_char,
          out_ids + static_cast<int64_t>(i) * out_cap, out_cap);
    }
  };

  if (num_threads == 1) {
    work(0, 1);
    return;
  }
  std::vector<std::thread> threads;
  threads.reserve(num_threads);
  for (int t = 0; t < num_threads; ++t) threads.emplace_back(work, t, num_threads);
  for (auto& th : threads) th.join();
}

}  // extern "C"
