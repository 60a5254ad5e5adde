// vosk_tpu native lattice finishing.
//
// Mirrors vosk_tpu/graph/lattice.py (the behavioral oracle for tests) in
// C++ for production host throughput: lattice assembly from decoder
// records, lattice-beam pruning, log-domain forward-backward posteriors,
// exact A* n-best with distinct word sequences.
//
// Reference counterpart: Kaldi lattice algebra driven at
// src/recognizer.cc:430-667 (word alignment, MBR, ShortestPath).

#include "vosk_tpu_core.h"

#include <algorithm>
#include <array>
#include <cmath>
#include <cstring>
#include <limits>
#include <map>
#include <queue>
#include <set>
#include <unordered_map>
#include <vector>

namespace {

constexpr float kInf = std::numeric_limits<float>::infinity();

struct Arc {
  int32_t src, dst;
  int32_t olabel;
  float graph_cost, acoustic_cost;
  bool is_frame;
  int32_t pdf;
  float cost() const { return graph_cost + acoustic_cost; }
};

}  // namespace

struct VtLattice {
  std::vector<Arc> arcs;
  std::vector<std::vector<int32_t>> out, in;
  std::vector<float> final_cost;
  std::vector<int32_t> node_frame;
  std::vector<int32_t> silence_pdfs;

  int32_t add_node(int32_t frame) {
    out.emplace_back();
    in.emplace_back();
    final_cost.push_back(kInf);
    node_frame.push_back(frame);
    return (int32_t)out.size() - 1;
  }
  void add_arc(const Arc &a) {
    int32_t i = (int32_t)arcs.size();
    arcs.push_back(a);
    out[a.src].push_back(i);
    in[a.dst].push_back(i);
  }
  int32_t num_nodes() const { return (int32_t)out.size(); }
};

static VtLattice *build_raw(const VtRecords *r) {
  auto *lat = new VtLattice();
  lat->silence_pdfs.assign(r->silence_pdfs,
                           r->silence_pdfs + r->num_silence_pdfs);
  lat->add_node(0);  // source

  const int32_t T = r->T, L = r->L, K = r->K, R = r->R, S = r->num_states;

  // slot -> (node, viterbi cost, graph state) of previous level.  The
  // graph state is needed for the padded layout (M > 0), whose em-level
  // lat_arc records store the in-row arc slot m: the dense arc id is
  // reconstructed as prev_state * M + m.
  std::vector<int32_t> prev_node(K, -1);
  std::vector<float> prev_cost(K, kInf);
  std::vector<int32_t> prev_state(K, S);
  for (int32_t k = 0; k < K; k++) {
    if (std::isfinite(r->init_cost[k])) {
      // start-closure olabel prefix words chain before the slot node
      int32_t src = 0;
      int32_t last_word = 0;
      if (r->init_prefix_off) {
        int32_t b = r->init_prefix_off[k], e = r->init_prefix_off[k + 1];
        for (int32_t i = b; i + 1 < e; i++) {
          int32_t mid = lat->add_node(0);
          lat->add_arc({src, mid, r->init_prefix_data[i], 0.f, 0.f, false, -1});
          src = mid;
        }
        if (e > b) last_word = r->init_prefix_data[e - 1];
      }
      int32_t n = lat->add_node(0);
      prev_node[k] = n;
      prev_cost[k] = r->init_cost[k];
      prev_state[k] = r->init_state[k];
      lat->add_arc({src, n, last_word, r->init_cost[k], 0.f, false, -1});
    }
  }

  std::vector<int32_t> cur_node(K);
  std::vector<float> cur_cost(K);
  std::vector<int32_t> cur_state(K);
  std::unordered_map<int32_t, int32_t> state_slot;
  state_slot.reserve(K * 2);

  int32_t frame = 0;
  for (int32_t t = 0; t < T; t++) {
    const int32_t *pdf0 = r->pdf + ((size_t)t * L) * K;
    bool is_real = false;
    for (int32_t k = 0; k < K; k++)
      if (pdf0[k] >= 0) {
        is_real = true;
        break;
      }
    for (int32_t lvl = 0; lvl < L; lvl++) {
      const size_t base_k = ((size_t)t * L + lvl) * K;
      const size_t base_r = ((size_t)t * L + lvl) * R;
      const int32_t *fs = r->f_state + base_k;
      const float *fc = r->f_cost + base_k;
      state_slot.clear();
      std::fill(cur_node.begin(), cur_node.end(), -1);
      std::fill(cur_cost.begin(), cur_cost.end(), kInf);
      std::fill(cur_state.begin(), cur_state.end(), S);
      int32_t cur_frame = frame + (is_real ? 1 : 0);
      for (int32_t k = 0; k < K; k++) {
        if (std::isfinite(fc[k]) && fs[k] != S) {
          cur_node[k] = lat->add_node(cur_frame);
          cur_cost[k] = fc[k];
          cur_state[k] = fs[k];
          state_slot.emplace(fs[k], k);
        }
      }
      for (int32_t ri = 0; ri < R; ri++) {
        float total = r->lat_cost[base_r + ri];
        int32_t ns = r->lat_ns[base_r + ri];
        if (!std::isfinite(total) || ns == S) continue;
        auto it = state_slot.find(ns);
        if (it == state_slot.end()) continue;
        int32_t slot = it->second;
        int32_t pslot = r->lat_prev[base_r + ri];
        if (pslot < 0 || pslot >= K || prev_node[pslot] < 0) continue;
        float delta = total - prev_cost[pslot];
        int32_t ai = r->lat_arc[base_r + ri];
        Arc a;
        a.src = prev_node[pslot];
        a.dst = cur_node[slot];
        if (lvl == 0 && is_real) {
          a.is_frame = true;
          if (ai >= 0) {
            if (r->M > 0) {
              ai = prev_state[pslot] * r->M + ai;  // lat_arc stores m
              a.graph_cost = r->dense_w[ai];
              a.olabel = r->dense_olabel[ai];
              a.pdf = r->dense_pdf[ai];
            } else {
              a.graph_cost = r->em_w[ai];
              a.olabel = r->em_olabel[ai];
              a.pdf = r->em_pdf[ai];
            }
          } else {
            a.graph_cost = 0.f;
            a.olabel = 0;
            a.pdf = -1;
          }
          a.acoustic_cost = delta - a.graph_cost;
        } else {
          a.is_frame = false;
          a.pdf = -1;
          if (ai >= 0) {
            a.graph_cost = r->eps_w[ai];
            a.olabel = r->eps_olabel[ai];
            a.acoustic_cost = delta - a.graph_cost;
          } else {
            a.graph_cost = delta;
            a.olabel = 0;
            a.acoustic_cost = 0.f;
          }
        }
        lat->add_arc(a);
      }
      prev_node = cur_node;
      prev_cost = cur_cost;
      prev_state = cur_state;
    }
    if (is_real) frame++;
  }

  // finals
  bool any_final = false;
  if (r->use_final) {
    for (int32_t k = 0; k < K; k++) {
      if (prev_node[k] < 0) continue;
      // final-state cost of the last-level states
      // (prev_node now points at the final level; states via records not
      // retained — use f_state of last level)
    }
  }
  // final costs from the last level's states
  if (T > 0) {
    const size_t base_k = ((size_t)(T - 1) * L + (L - 1)) * K;
    const int32_t *fs = r->f_state + base_k;
    for (int32_t k = 0; k < K; k++) {
      if (prev_node[k] < 0) continue;
      float fcost = (fs[k] >= 0 && fs[k] <= S) ? r->final_cost[fs[k]] : kInf;
      if (r->use_final && std::isfinite(fcost)) {
        lat->final_cost[prev_node[k]] = fcost;
        any_final = true;
      }
    }
  }
  if (!(r->use_final && any_final)) {
    for (int32_t k = 0; k < K; k++)
      if (prev_node[k] >= 0) lat->final_cost[prev_node[k]] = 0.f;
  }
  return lat;
}

static void scale_graph(VtLattice *lat, float s) {
  for (auto &a : lat->arcs) a.graph_cost *= s;
}

static VtLattice *prune(VtLattice *lat, float beam) {
  const int32_t n = lat->num_nodes();
  std::vector<double> fwd(n, kInf), bwd(n);
  fwd[0] = 0.0;
  for (int32_t u = 0; u < n; u++) {
    if (!std::isfinite(fwd[u])) continue;
    for (int32_t ai : lat->out[u]) {
      const Arc &a = lat->arcs[ai];
      fwd[a.dst] = std::min(fwd[a.dst], fwd[u] + a.cost());
    }
  }
  for (int32_t u = 0; u < n; u++) bwd[u] = lat->final_cost[u];
  for (int32_t u = n - 1; u >= 0; u--) {
    for (int32_t ai : lat->out[u]) {
      const Arc &a = lat->arcs[ai];
      bwd[u] = std::min(bwd[u], a.cost() + bwd[a.dst]);
    }
  }
  double best = kInf;
  for (int32_t u = 0; u < n; u++) best = std::min(best, fwd[u] + bwd[u]);
  if (!std::isfinite(best)) return lat;

  std::vector<int32_t> remap(n, -1);
  auto *out = new VtLattice();
  out->silence_pdfs = lat->silence_pdfs;
  out->add_node(lat->node_frame[0]);
  remap[0] = 0;
  out->final_cost[0] = lat->final_cost[0];
  for (int32_t u = 1; u < n; u++) {
    bool keep = std::isfinite(fwd[u]) && std::isfinite(bwd[u]) &&
                fwd[u] + bwd[u] <= best + beam;
    if (keep) {
      remap[u] = out->add_node(lat->node_frame[u]);
      out->final_cost[remap[u]] = lat->final_cost[u];
    }
  }
  for (const Arc &a : lat->arcs) {
    if (remap[a.src] < 0 || remap[a.dst] < 0) continue;
    if (fwd[a.src] + a.cost() + bwd[a.dst] > best + beam) continue;
    Arc b = a;
    b.src = remap[a.src];
    b.dst = remap[a.dst];
    out->add_arc(b);
  }
  delete lat;
  return out;
}

extern "C" {

VtLattice *vt_lattice_build(const VtRecords *rec) {
  VtLattice *lat = build_raw(rec);
  scale_graph(lat, rec->graph_scale);
  return prune(lat, rec->lattice_beam);
}

void vt_lattice_free(VtLattice *lat) { delete lat; }

int32_t vt_lattice_num_nodes(const VtLattice *lat) {
  return lat->num_nodes();
}
int32_t vt_lattice_num_arcs(const VtLattice *lat) {
  return (int32_t)lat->arcs.size();
}

int32_t vt_lattice_nbest(VtLattice *lat, int32_t n, int32_t distinct,
                         VtWord *out_words, int32_t cap, int32_t *out_sizes,
                         float *out_costs, int32_t max_paths) {
  const int32_t N = lat->num_nodes();
  if (N == 0) return 0;

  // posteriors: log-domain forward-backward over arc costs
  std::vector<double> alpha(N, -kInf), beta(N, -kInf);
  auto lse = [](double a, double b) {
    if (a == -kInf) return b;
    if (b == -kInf) return a;
    double m = std::max(a, b);
    return m + std::log(std::exp(a - m) + std::exp(b - m));
  };
  alpha[0] = 0.0;
  for (int32_t u = 0; u < N; u++) {
    if (alpha[u] == -kInf) continue;
    for (int32_t ai : lat->out[u]) {
      const Arc &a = lat->arcs[ai];
      alpha[a.dst] = lse(alpha[a.dst], alpha[u] - a.cost());
    }
  }
  for (int32_t u = 0; u < N; u++)
    if (std::isfinite(lat->final_cost[u])) beta[u] = -lat->final_cost[u];
  for (int32_t u = N - 1; u >= 0; u--) {
    for (int32_t ai : lat->out[u]) {
      const Arc &a = lat->arcs[ai];
      beta[u] = lse(beta[u], -a.cost() + beta[a.dst]);
    }
  }
  double total = -kInf;
  for (int32_t u = 0; u < N; u++)
    if (std::isfinite(lat->final_cost[u]))
      total = lse(total, alpha[u] - lat->final_cost[u]);
  std::vector<float> post(lat->arcs.size());
  for (size_t i = 0; i < lat->arcs.size(); i++) {
    const Arc &a = lat->arcs[i];
    double lp = alpha[a.src] - a.cost() + beta[a.dst] - total;
    post[i] = (float)std::exp(std::min(lp, 0.0));
  }

  // sausage-style confidence pool: every word-arc occurrence by label with
  // its time anchor, so competing alignments of the same word merge into
  // one bin posterior (mirrors vosk_tpu/runtime/finishing.py; the role of
  // Kaldi's MBR sausages in the reference, recognizer.cc:440-444)
  std::map<int32_t, std::vector<std::pair<int32_t, float>>> occ;
  for (size_t i = 0; i < lat->arcs.size(); i++) {
    const Arc &a = lat->arcs[i];
    if (a.olabel != 0)
      occ[a.olabel].push_back({lat->node_frame[a.src], post[i]});
  }

  // exact backward heuristic
  std::vector<double> h(N);
  for (int32_t u = 0; u < N; u++) h[u] = lat->final_cost[u];
  for (int32_t u = N - 1; u >= 0; u--)
    for (int32_t ai : lat->out[u]) {
      const Arc &a = lat->arcs[ai];
      h[u] = std::min(h[u], a.cost() + h[a.dst]);
    }
  if (!std::isfinite(h[0])) return 0;

  struct Entry {
    double prio;
    int64_t seq;
    int32_t node;
    double cost;
    std::vector<int32_t> path;
    bool operator>(const Entry &o) const { return prio > o.prio; }
  };
  std::priority_queue<Entry, std::vector<Entry>, std::greater<Entry>> heap;
  int64_t seq = 0;
  heap.push({h[0], seq++, 0, 0.0, {}});
  std::set<std::vector<int32_t>> seen_words;
  int32_t written_paths = 0, written_words = 0;
  int64_t pops = 0;
  const int64_t pop_budget = 200000;
  while (!heap.empty() && written_paths < std::min(n, max_paths) &&
         pops < pop_budget) {
    Entry e = heap.top();
    heap.pop();
    pops++;
    if (std::isfinite(lat->final_cost[e.node])) {
      // materialize word sequence
      std::vector<int32_t> words;
      std::vector<VtWord> items;
      // frame alignment: count frame arcs
      std::vector<int32_t> pdfs;
      for (int32_t ai : e.path) {
        const Arc &a = lat->arcs[ai];
        if (a.is_frame) pdfs.push_back(a.pdf);
      }
      int32_t f = 0;
      std::vector<std::pair<int32_t, int32_t>> word_start;  // (olabel, frame)
      std::vector<int32_t> anchors;  // node frame of each word arc's source
      for (int32_t ai : e.path) {
        const Arc &a = lat->arcs[ai];
        if (a.olabel != 0) {
          word_start.push_back({a.olabel, f});
          anchors.push_back(lat->node_frame[a.src]);
          words.push_back(a.olabel);
        }
        if (a.is_frame) f++;
      }
      // bin boundaries at midpoints between adjacent path word anchors;
      // conf = pooled posterior of same-word occurrences inside the bin
      std::vector<float> word_conf(words.size());
      for (size_t i = 0; i < words.size(); i++) {
        double lo = (i == 0) ? -1e9 : (anchors[i - 1] + anchors[i]) / 2.0;
        double hi = (i + 1 >= words.size())
                        ? 1e9
                        : (anchors[i] + anchors[i + 1]) / 2.0;
        double conf = 0.0;
        for (const auto &fp : occ[words[i]])
          if (fp.first >= lo && fp.first < hi) conf += fp.second;
        word_conf[i] = (float)std::min(conf, 1.0);
      }
      bool fresh = !distinct || seen_words.insert(words).second;
      if (fresh && !words.empty()) {
        const int32_t T_end = f;
        std::set<int32_t> sil(lat->silence_pdfs.begin(),
                              lat->silence_pdfs.end());
        for (size_t i = 0; i < word_start.size(); i++) {
          int32_t f0 = word_start[i].second;
          int32_t f1 =
              (i + 1 < word_start.size()) ? word_start[i + 1].second : T_end;
          while (f1 > f0 + 1 && f1 - 1 < (int32_t)pdfs.size() &&
                 sil.count(pdfs[f1 - 1]))
            f1--;
          if (f1 <= f0) f1 = f0 + 1;
          if (written_words >= cap) return written_paths;
          out_words[written_words++] = {word_start[i].first, f0, f1,
                                        word_conf[i]};
        }
        out_sizes[written_paths] = (int32_t)word_start.size();
        out_costs[written_paths] = (float)(e.cost + lat->final_cost[e.node]);
        written_paths++;
      } else if (fresh && words.empty() && written_paths == 0 &&
                 heap.empty()) {
        out_sizes[written_paths] = 0;
        out_costs[written_paths] = (float)(e.cost + lat->final_cost[e.node]);
        written_paths++;
      }
    }
    for (int32_t ai : lat->out[e.node]) {
      const Arc &a = lat->arcs[ai];
      if (!std::isfinite(h[a.dst])) continue;
      Entry ne;
      ne.cost = e.cost + a.cost();
      ne.prio = ne.cost + h[a.dst];
      ne.seq = seq++;
      ne.node = a.dst;
      ne.path = e.path;
      ne.path.push_back(ai);
      heap.push(std::move(ne));
    }
  }
  return written_paths;
}

/* MBR sausage decoding — native port of vosk_tpu/graph/mbr.py (the
 * expected-edit-distance recursion of Xu/Povey 2011 behind Kaldi's
 * MinimumBayesRisk, used by the reference's MbrResult at
 * recognizer.cc:440-444).  Returns word count written (<= cap), -1 on
 * failure; out_cost gets the lattice best-path cost. */
int32_t vt_lattice_mbr(VtLattice *lat, VtWord *out_words, int32_t cap,
                       float *out_cost) {
  const int32_t N0 = lat->num_nodes();
  if (N0 == 0) return -1;

  /* ---- best path (initial R) via min-cost DP */
  std::vector<double> d(N0, kInf);
  std::vector<int32_t> back(N0, -1);
  d[0] = 0.0;
  for (int32_t u = 0; u < N0; u++) {
    if (!std::isfinite(d[u])) continue;
    for (int32_t ai : lat->out[u]) {
      const Arc &a = lat->arcs[ai];
      double c = (double)a.graph_cost + (double)a.acoustic_cost;
      if (d[u] + c < d[a.dst]) {
        d[a.dst] = d[u] + c;
        back[a.dst] = ai;
      }
    }
  }
  double best = kInf;
  int32_t bend = -1;
  for (int32_t u = 0; u < N0; u++)
    if (std::isfinite(lat->final_cost[u]) &&
        d[u] + lat->final_cost[u] < best) {
      best = d[u] + lat->final_cost[u];
      bend = u;
    }
  if (bend < 0) return -1;
  if (out_cost) *out_cost = (float)best;
  std::vector<int32_t> R;
  for (int32_t v = bend; back[v] >= 0; v = lat->arcs[back[v]].src)
    if (lat->arcs[back[v]].olabel != 0) R.push_back(lat->arcs[back[v]].olabel);
  std::reverse(R.begin(), R.end());

  /* ---- word graph with a super-final node */
  struct WArc { int32_t src, dst, w; double c; int32_t f0, f1; };
  const int32_t FINAL = N0, N = N0 + 1;
  std::vector<WArc> arcs;
  arcs.reserve(lat->arcs.size() + N0);
  for (const Arc &a : lat->arcs)
    arcs.push_back({a.src, a.dst, a.olabel,
                    (double)a.graph_cost + (double)a.acoustic_cost,
                    lat->node_frame[a.src], lat->node_frame[a.dst]});
  for (int32_t u = 0; u < N0; u++)
    if (std::isfinite(lat->final_cost[u]))
      arcs.push_back({u, FINAL, 0, (double)lat->final_cost[u],
                      lat->node_frame[u], lat->node_frame[u]});
  std::vector<std::vector<int32_t>> pre(N);
  for (size_t i = 0; i < arcs.size(); i++) pre[arcs[i].dst].push_back((int32_t)i);

  auto lse = [](double a, double b) {
    if (a == -kInf) return b;
    if (b == -kInf) return a;
    double m = std::max(a, b);
    return m + std::log1p(std::exp(-std::fabs(a - b)));
  };
  std::vector<double> alpha(N, -kInf);
  alpha[0] = 0.0;
  for (int32_t n = 1; n < N; n++) {
    double acc = -kInf;
    for (int32_t ai : pre[n]) {
      const WArc &a = arcs[ai];
      if (alpha[a.src] != -kInf) acc = lse(acc, alpha[a.src] - a.c);
    }
    alpha[n] = acc;
  }
  if (alpha[FINAL] == -kInf) return -1;

  auto edit = [](int32_t a, int32_t b) { return a == b ? 0.0 : 1.0; };

  std::vector<int32_t> Rp;
  std::vector<std::map<int32_t, double>> gamma;
  std::vector<std::array<double, 2>> tau;
  for (int iter = 0; iter < 20; iter++) {
    /* eps-interleave: Rp = eps r1 eps r2 ... eps */
    Rp.clear();
    Rp.push_back(0);
    for (int32_t w : R) { Rp.push_back(w); Rp.push_back(0); }
    const int32_t Q = (int32_t)Rp.size();

    /* forward alpha_dash */
    std::vector<std::vector<double>> ad(N, std::vector<double>(Q + 1, 0.0));
    for (int32_t q = 1; q <= Q; q++)
      ad[0][q] = ad[0][q - 1] + edit(0, Rp[q - 1]);
    std::vector<std::vector<double>> arc_ad(arcs.size());
    for (int32_t n = 1; n < N; n++) {
      std::vector<double> row(Q + 1, 0.0);
      for (int32_t ai : pre[n]) {
        const WArc &a = arcs[ai];
        if (alpha[a.src] == -kInf) continue;
        double scale = std::exp(alpha[a.src] - a.c - alpha[n]);
        std::vector<double> &v = arc_ad[ai];
        v.assign(Q + 1, 0.0);
        v[0] = ad[a.src][0] + edit(a.w, 0);
        for (int32_t q = 1; q <= Q; q++) {
          double a1 = ad[a.src][q - 1] + edit(a.w, Rp[q - 1]);
          double a2 = ad[a.src][q] + edit(a.w, 0);
          double a3 = v[q - 1] + edit(0, Rp[q - 1]);
          v[q] = (a1 <= a2 && a1 <= a3) ? a1 : (a2 <= a3 ? a2 : a3);
        }
        for (int32_t q = 0; q <= Q; q++) row[q] += scale * v[q];
      }
      ad[n] = row;
    }

    /* backward occupancies + stats */
    std::vector<std::vector<double>> bd(N, std::vector<double>(Q + 1, 0.0));
    bd[FINAL][Q] = 1.0;
    gamma.assign(Q, {});
    tau.assign(Q, {0.0, 0.0});
    for (int32_t n = N - 1; n >= 1; n--) {
      for (int32_t ai : pre[n]) {
        const WArc &a = arcs[ai];
        if (alpha[a.src] == -kInf || arc_ad[ai].empty()) continue;
        double scale = std::exp(alpha[a.src] - a.c - alpha[n]);
        const std::vector<double> &v = arc_ad[ai];
        double beta_arc = 0.0; /* deletion cascade from q+1 */
        for (int32_t q = Q; q >= 0; q--) {
          double b = bd[n][q] * scale + beta_arc;
          beta_arc = 0.0;
          if (b == 0.0) continue;
          if (q == 0) { bd[a.src][0] += b; continue; }
          double a1 = ad[a.src][q - 1] + edit(a.w, Rp[q - 1]);
          double a2 = ad[a.src][q] + edit(a.w, 0);
          double a3 = v[q - 1] + edit(0, Rp[q - 1]);
          if (a1 <= a2 && a1 <= a3) {
            bd[a.src][q - 1] += b;
            gamma[q - 1][a.w] += b;
            tau[q - 1][0] += b * a.f0;
            tau[q - 1][1] += b * a.f1;
          } else if (a2 <= a3) {
            bd[a.src][q] += b;
            if (a.w != 0) {
              gamma[q - 1][a.w] += b;
              tau[q - 1][0] += b * a.f0;
              tau[q - 1][1] += b * a.f1;
            }
          } else {
            beta_arc = b;
            gamma[q - 1][0] += b;
          }
        }
      }
    }

    /* re-estimate R from bin argmaxes */
    std::vector<int32_t> Rn;
    bool changed = false;
    for (int32_t q = 1; q <= Q; q++) {
      int32_t wbest = 0;
      double pbest = -1.0;
      for (const auto &kv : gamma[q - 1])
        if (kv.second > pbest) {  /* std::map ascending: ties keep the
                                      smallest word id, matching the
                                      Python oracle's tie-break */
          pbest = kv.second;
          wbest = kv.first;
        }
      if (wbest != Rp[q - 1]) changed = true;
      if (wbest != 0) Rn.push_back(wbest);
    }
    if (!changed) break;
    R.swap(Rn);
  }

  /* ---- emit the non-eps positions */
  int32_t nw = 0;
  for (size_t q = 0; q < Rp.size() && nw < cap; q++) {
    int32_t w = Rp[q];
    if (w == 0) continue;
    double mass = 0.0;
    for (const auto &kv : gamma[q]) mass += kv.second;
    double tb = tau[q][0], te = tau[q][1];
    if (mass > 0) { tb /= mass; te /= mass; }
    double conf = 0.0;
    auto it = gamma[q].find(w);
    if (it != gamma[q].end()) conf = std::min(it->second, 1.0);
    int32_t f0 = (int32_t)std::lround(tb);
    int32_t f1 = std::max((int32_t)std::lround(te), f0 + 1);
    out_words[nw++] = {w, f0, f1, (float)conf};
  }
  return nw;
}

}  // extern "C"
