"""Batched WFST token-passing beam search on TPU.

Replaces Kaldi's `SingleUtteranceNnet3IncrementalDecoder` /
`BatchedThreadedNnet3CudaOnlinePipeline` beam search (reference
src/recognizer.cc:310, src/batch_model.cc:90-92).  The CPU reference walks
linked-list tokens; this kernel is the TPU-shaped equivalent of the CUDA
decoder's design (papers 1804.03243 / 1910.10032): fixed-size frontier,
arc expansion over a flattened CSR table, dedup by next-state via
scatter-min, beam + max-active pruning via top-k, backpointer records
emitted per frame for host traceback.

All shapes are static:
  K = max_active (frontier slots; padded with sentinel state S, cost +inf)
  E = emitting-expansion budget, Ee = epsilon-expansion budget
Each decoded frame produces (1 + eps_iters) record levels of K slots each;
traceback walks levels backwards on the host.

Batch dimension = channels (streams); a single jitted scan advances all
channels one chunk at a time.  Dead/padded frames pass the frontier through
unchanged (valid mask), which is how dynamic stream join/leave stays inside
one fixed-shape program (reference: `reset_on_endpoint`, batch_model.cc:72).
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..graph.fst import EPSILON, DecodingGraph

INF = jnp.float32(jnp.inf)
BIG_I32 = jnp.int32(2**31 - 1)

# device-side trailing-silence tracking: the per-arc pdf field carries a
# silence-pdf flag in bit 30; per-token state "tsil" packs the trailing
# silence frame count (low bits) with a has-speech flag (bit 30).  This is
# what makes endpoint checks O(1): no host traceback needed (the reference
# reads equivalent decoder state at recognizer.cc:318).
SIL_FLAG = jnp.int32(1 << 30)
PDF_MASK = jnp.int32((1 << 30) - 1)
SPEECH_BIT = jnp.int32(1 << 30)
TSIL_MASK = jnp.int32((1 << 30) - 1)


@dataclasses.dataclass
class DecodeParams:
    """Pruning semantics match the reference defaults (src/model.cc:134-147)."""

    beam: float = 13.0
    max_active: int = 7000
    lattice_beam: float = 6.0
    acoustic_scale: float = 1.0


class BatchViterbi:
    """Channel-batched streaming Viterbi over one decoding graph."""

    def __init__(
        self,
        graph: DecodingGraph,
        params: DecodeParams,
        expand_budget: Optional[int] = None,
        eps_expand_budget: Optional[int] = None,
        dedup: str = "sort",
        lattice_records: bool = False,
        lattice_budget: Optional[int] = None,
        layout: Optional[str] = None,  # "padded" | "csr" | None (auto)
        padded_max_out: int = 16,
        silence_pdfs=None,
    ):
        self.graph = graph
        self.params = params
        self.dedup = dedup
        self.lattice_records = lattice_records
        self.silence_pdfs = (
            np.asarray(silence_pdfs, np.int64)
            if silence_pdfs is not None and len(np.asarray(silence_pdfs))
            else np.zeros(0, np.int64)
        )
        S = graph.num_states
        self.S = S
        K = min(params.max_active, max(S, 1))
        self.K = K
        if layout is None:
            layout = "padded" if 0 < graph.max_em_out <= padded_max_out else "csr"
        self.layout = layout
        self.M = max(graph.max_em_out, 1)
        if layout == "padded":
            expand_budget = K * self.M  # each token contributes exactly M slots
        # top_k(k=K) needs at least K candidates, so E >= K always.
        self.E = expand_budget or max(K, 128, min(K * max(graph.max_em_out, 1), 1 << 18))
        self.Ee = eps_expand_budget or max(
            128, min(K * max(graph.max_eps_out, 1), 1 << 18)
        )
        self.Me = 0  # padded eps tables; set by _build_padded_tables
        self.has_eps = graph.num_eps_arcs > 0
        # no eps arcs -> no closure rounds, regardless of claimed depth
        self.eps_iters = graph.eps_depth if self.has_eps else 0
        # lattice candidate budget per level (must fit both candidate pools)
        R = lattice_budget or max(self.K, min(2048, self.E))
        self.R = min(max(R, self.K), self.E, self.K + self.Ee)

        # device tables; state-indexed arrays padded so sentinel state S is a
        # zero-out-degree, non-final state.
        g = graph
        # device pdf table carries the silence flag in bit 30 (SIL_FLAG);
        # host-side consumers keep using graph.em_pdf (clean ids)
        if len(g.em_pdf):
            sil_mask = np.isin(g.em_pdf, self.silence_pdfs)
            self._em_pdf_flagged = np.where(
                sil_mask, g.em_pdf | (1 << 30), g.em_pdf
            ).astype(np.int32)
        else:
            self._em_pdf_flagged = np.zeros((1,), np.int32)
        self.em_off = jnp.asarray(np.append(g.em_off, g.em_off[-1]))
        self.em_pdf = jnp.asarray(self._em_pdf_flagged)
        self.em_olabel = jnp.asarray(g.em_olabel) if len(g.em_olabel) else jnp.zeros((1,), jnp.int32)
        self.em_w = jnp.asarray(g.em_w) if len(g.em_w) else jnp.zeros((1,), jnp.float32)
        self.em_next = jnp.asarray(g.em_next) if len(g.em_next) else jnp.zeros((1,), jnp.int32)
        self.eps_off = jnp.asarray(np.append(g.eps_off, g.eps_off[-1]))
        self.eps_olabel = jnp.asarray(g.eps_olabel) if len(g.eps_olabel) else jnp.zeros((1,), jnp.int32)
        self.eps_w = jnp.asarray(g.eps_w) if len(g.eps_w) else jnp.zeros((1,), jnp.float32)
        self.eps_next = jnp.asarray(g.eps_next) if len(g.eps_next) else jnp.zeros((1,), jnp.int32)
        self.final_cost = jnp.asarray(np.append(g.final_cost, np.float32(np.inf)))

        if self.layout == "padded":
            self._build_padded_tables()

        # initial frontier: epsilon closure of the start state, done exactly on
        # host once (tiny).  Initial tokens carry an olabel prefix for traceback.
        self._init_states, self._init_costs, self._init_prefixes = self._initial_closure()

        # Graph tables are passed through jit as ARGUMENTS (self.tables), not
        # captured by closure: closed-over arrays are embedded in the lowered
        # program as literals, which at real-graph scale (a 2M-state pack is
        # ~256 MB) breaks compilation and forces retraces per graph.
        table_keys = [
            "em_off", "em_pdf", "em_olabel", "em_w", "em_next",
            "eps_off", "eps_olabel", "eps_w", "eps_next", "final_cost",
        ]
        if self.layout == "padded":
            table_keys.append("em_pack")
            if self.Me:
                table_keys.append("eps_pack")
        self._table_keys = table_keys
        self.tables = {k: getattr(self, k) for k in table_keys}
        self._decode_jit = jax.jit(self._decode_entry)

    def _decode_entry(self, tables, frontier, loglikes, valid):
        """Jit entry point: rebinds the graph tables to the traced arguments
        for the duration of tracing (restored afterwards)."""
        saved = {k: getattr(self, k) for k in tables}
        try:
            for k, v in tables.items():
                setattr(self, k, v)
            return self._decode_chunk_impl(frontier, loglikes, valid)
        finally:
            for k, v in saved.items():
                setattr(self, k, v)

    # ------------------------------------------------------------------ init

    def _build_padded_tables(self) -> None:
        """Dense [S+1, M] arc layout packed into ONE f32 gather row per state
        [S+1, 4*M]: (w | next | pdf | olabel), int fields bit-cast to f32.
        Pad slots: w=+inf, next=S.  One row gather replaces the CSR cumsum/
        searchsorted/per-field gather chain — the dominant cost on TPU where
        each non-fusable op pays a fixed launch overhead."""
        g, S, M = self.graph, self.S, self.M
        A = len(g.em_pdf)
        w = np.full((S + 1, M), np.inf, np.float32)
        nxt = np.full((S + 1, M), S, np.int32)
        pdf = np.zeros((S + 1, M), np.int32)
        ola = np.zeros((S + 1, M), np.int32)
        if A:
            cnt = (g.em_off[1:] - g.em_off[:-1]).astype(np.int64)
            state_of_arc = np.repeat(np.arange(S), cnt)
            pos = np.arange(A) - g.em_off[:-1].astype(np.int64)[state_of_arc]
            w[state_of_arc, pos] = g.em_w
            nxt[state_of_arc, pos] = g.em_next
            pdf[state_of_arc, pos] = self._em_pdf_flagged  # silence flag in bit 30
            ola[state_of_arc, pos] = g.em_olabel
        pack = np.concatenate(
            [w, nxt.view(np.float32), pdf.view(np.float32), ola.view(np.float32)],
            axis=1,
        )
        self.em_pack = jnp.asarray(pack)
        # host-side dense views for lattice building (arc id = state*M + m);
        # pdf stripped of the silence flag
        self.dense_w, self.dense_next = w, nxt
        self.dense_pdf, self.dense_olabel = pdf & ((1 << 30) - 1), ola

        # padded epsilon tables (batched eps closure without vmap); the CSR
        # arc index rides along so lattice records keep CSR eps-arc ids.
        self.Me = 0
        if self.has_eps and g.max_eps_out <= 2 * max(self.M, 4):
            Me = max(int(g.max_eps_out), 1)
            An = len(g.eps_next)
            ew = np.full((S + 1, Me), np.inf, np.float32)
            enxt = np.full((S + 1, Me), S, np.int32)
            eola = np.zeros((S + 1, Me), np.int32)
            eidx = np.full((S + 1, Me), -1, np.int32)
            cnt = (g.eps_off[1:] - g.eps_off[:-1]).astype(np.int64)
            st = np.repeat(np.arange(S), cnt)
            pos = np.arange(An) - g.eps_off[:-1].astype(np.int64)[st]
            ew[st, pos] = g.eps_w
            enxt[st, pos] = g.eps_next
            eola[st, pos] = g.eps_olabel
            eidx[st, pos] = np.arange(An, dtype=np.int32)
            self.Me = Me
            self.eps_pack = jnp.asarray(
                np.concatenate(
                    [ew, enxt.view(np.float32), eola.view(np.float32),
                     eidx.view(np.float32)], axis=1,
                )
            )

    def _initial_closure(self):
        import heapq

        g = self.graph
        costs = {g.start: 0.0}
        prefix: dict[int, tuple] = {g.start: ()}
        heap = [(0.0, g.start)]
        while heap:
            c, s = heapq.heappop(heap)
            if c > costs.get(s, np.inf):
                continue
            for i in range(g.eps_off[s], g.eps_off[s + 1]):
                ns, w, ol = int(g.eps_next[i]), float(g.eps_w[i]), int(g.eps_olabel[i])
                nc = c + w
                if nc < costs.get(ns, np.inf) - 1e-12:
                    costs[ns] = nc
                    prefix[ns] = prefix[s] + ((ol,) if ol != EPSILON else ())
                    heapq.heappush(heap, (nc, ns))
        items = sorted(costs.items(), key=lambda kv: kv[1])[: self.K]
        states = np.full(self.K, self.S, np.int32)
        cost = np.full(self.K, np.inf, np.float32)
        prefixes = []
        for i, (s, c) in enumerate(items):
            states[i] = s
            cost[i] = c
            prefixes.append(list(prefix[s]))
        while len(prefixes) < self.K:
            prefixes.append([])
        return states, cost, prefixes

    def init_frontier(self, batch: int):
        return {
            "state": jnp.tile(jnp.asarray(self._init_states)[None, :], (batch, 1)),
            "cost": jnp.tile(jnp.asarray(self._init_costs)[None, :], (batch, 1)),
            # packed trailing-silence count + has-speech bit per token
            "tsil": jnp.zeros((batch, self.K), jnp.int32),
        }

    # ------------------------------------------------------------- expansion

    def _expand(self, tok_state, tok_cost, off_table, budget):
        """CSR arc expansion with a fixed budget.

        Returns (tok_idx [budget], arc_idx [budget], mask [budget], overflow).
        """
        off = off_table[tok_state]
        cnt = off_table[tok_state + 1] - off
        cum = jnp.cumsum(cnt)
        total = cum[-1]
        e = jnp.arange(budget, dtype=jnp.int32)
        tok = jnp.searchsorted(cum, e, side="right").astype(jnp.int32)
        tok_c = jnp.minimum(tok, self.K - 1)
        base = jnp.where(tok_c > 0, cum[tok_c - 1], 0).astype(jnp.int32)
        arc = off[tok_c] + (e - base)
        mask = e < total
        arc = jnp.where(mask, arc, 0)
        return tok_c, arc, mask, total > budget

    def _dedup_prune(self, ns, cost, mask):
        """Dedup by next state + top-K/beam prune.

        ns/cost/mask: [N] candidates. Returns (sel [K] candidate indices,
        new_state [K], new_cost [K], valid [K]).

        Two strategies:
          - "sort": one lexicographic sort by (state, cost); the first entry
            of each state run is its min — no scatters.  TPU-friendly (XLA
            scatter serializes; sort is a fast bitonic network).
          - "scatter": dense table scatter-min + winner compare (good on CPU
            and for very large N where sort costs more).
        """
        if self.dedup == "sort":
            return self._dedup_prune_sort(ns, cost, mask)
        return self._dedup_prune_scatter(ns, cost, mask)

    def _dedup_prune_scatter(self, ns, cost, mask):
        S, K = self.S, self.K
        beam = self.params.beam
        nsm = jnp.where(mask, ns, S)
        costm = jnp.where(mask, cost, INF)
        table = jnp.full((S + 1,), INF).at[nsm].min(costm)
        best_for_state = table[nsm]
        win = (costm <= best_for_state) & mask
        idx = jnp.arange(ns.shape[0], dtype=jnp.int32)
        owner = jnp.full((S + 1,), BIG_I32).at[nsm].min(jnp.where(win, idx, BIG_I32))
        winner = win & (idx == owner[nsm])
        wcost = jnp.where(winner, costm, INF)
        neg, sel = jax.lax.top_k(-wcost, K)
        new_cost = -neg
        best = new_cost[0]
        keep = new_cost <= best + beam
        new_state = jnp.where(keep, nsm[sel], S)
        new_cost = jnp.where(keep, new_cost, INF)
        return sel, new_state, new_cost, keep

    def _dedup_prune_sort(self, ns, cost, mask):
        S, K = self.S, self.K
        beam = self.params.beam
        nsm = jnp.where(mask, ns, S)
        costm = jnp.where(mask, cost, INF)
        idx = jnp.arange(ns.shape[0], dtype=jnp.int32)
        s_ns, s_cost, s_idx = jax.lax.sort((nsm, costm, idx), num_keys=2)
        first = jnp.concatenate(
            [jnp.ones((1,), bool), s_ns[1:] != s_ns[:-1]]
        )
        winner = first & (s_ns != S) & jnp.isfinite(s_cost)
        wcost = jnp.where(winner, s_cost, INF)
        neg, sel2 = jax.lax.top_k(-wcost, K)
        new_cost = -neg
        best = new_cost[0]
        keep = new_cost <= best + beam
        new_state = jnp.where(keep, s_ns[sel2], S)
        new_cost = jnp.where(keep, new_cost, INF)
        sel = s_idx[sel2]
        return sel, new_state, new_cost, keep

    # ---------------------------------------------------- packed sort helpers
    #
    # The frame step's irregular work is done entirely by single-key sorts
    # that CARRY their payloads: on this TPU backend a multi-operand
    # `lax.sort` moves ~1.4 ps/byte/pass while every `take_along_axis` /
    # `top_k`-then-gather costs ~10-17 ns per element (XLA lowers batched
    # dynamic gathers element-at-a-time).  Measured on v5e, see
    # tools/mb_primitives.py + tools/mb_framestep.py; replacing
    # top_k + 5 selects with payload sorts cut the honest-operating-point
    # frame step (max_active=7000, 2M states) by ~2x.

    @staticmethod
    def _cost_bits(cost):
        """Order-preserving int32 encoding of an f32 cost (monotone: a < b
        <=> bits(a) < bits(b)); +inf maps above all finite costs."""
        cb = jax.lax.bitcast_convert_type(cost, jnp.int32)
        return jnp.where(cb < 0, jnp.int32(-2147483648) - cb, cb)

    @staticmethod
    def _bits_cost(bits):
        raw = jnp.where(bits < 0, jnp.int32(-2147483648) - bits, bits)
        return jax.lax.bitcast_convert_type(raw, jnp.float32)

    def _packed_level(self, nsm, cm, payloads, lat_payloads=None):
        """Dedup by next state + top-K/beam selection, payload-carrying.

        nsm/cm: [B, N] candidate next-states (masked to sentinel S) and
        costs (masked to +inf).  payloads: dict of int32 [B, N] arrays to
        carry through to the K survivors.  lat_payloads: (prev, arc) for
        lattice record emission (enables the third, cost-ordered sort).

        Returns (new_state, new_cost, keep, sel_payloads, lattice_rec).
        Selection semantics match Kaldi's: per-state min (dedup), then the
        best max_active states by cost, then beam pruning about the best.
        """
        B, N = nsm.shape
        K, S = self.K, self.S
        beam = self.params.beam

        names = sorted(payloads)
        cbits = self._cost_bits(cm)
        sorted1 = jax.lax.sort(
            (nsm, cbits) + tuple(payloads[n] for n in names),
            num_keys=2,
            dimension=1,
        )
        s_state, s_cbits, s_pay = sorted1[0], sorted1[1], sorted1[2:]
        first = jnp.concatenate(
            [jnp.ones((B, 1), bool), s_state[:, 1:] != s_state[:, :-1]], axis=1
        )
        alive = first & (s_state != S)
        key2 = jnp.where(alive, s_cbits, BIG_I32)
        sorted2 = jax.lax.sort(
            (key2, s_state) + tuple(s_pay), num_keys=1, dimension=1
        )
        kbits = sorted2[0][:, :K]
        new_state = sorted2[1][:, :K]
        sel_pay = {n: p[:, :K] for n, p in zip(names, sorted2[2:])}
        new_cost = self._bits_cost(kbits)
        keep = (kbits < BIG_I32) & (kbits <= self._cost_bits(new_cost[:, :1] + beam))
        new_state = jnp.where(keep, new_state, S)
        new_cost = jnp.where(keep, new_cost, INF)

        lattice_rec = None
        if lat_payloads is not None:
            R = self.R
            lprev, larc = lat_payloads
            key3 = self._cost_bits(cm)
            sorted3 = jax.lax.sort(
                (key3, nsm, lprev, larc), num_keys=1, dimension=1
            )

            def takeR(x, fill):
                if N >= R:
                    return x[:, :R]
                return jnp.concatenate(
                    [x, jnp.full((B, R - N), fill, x.dtype)], axis=1
                )

            lcost = self._bits_cost(takeR(sorted3[0], BIG_I32))
            best = new_cost[:, :1]  # sort2 slot 0 is the post-dedup best
            lkeep = lcost <= best + self.params.lattice_beam
            lattice_rec = {
                "lat_ns": jnp.where(lkeep, takeR(sorted3[1], S), S),
                "lat_prev": jnp.where(lkeep, takeR(sorted3[2], -1), -1),
                "lat_arc": jnp.where(lkeep, takeR(sorted3[3], -1), -1),
                "lat_cost": jnp.where(lkeep, lcost, INF),
            }
        return new_state, new_cost, keep, sel_pay, lattice_rec

    # ------------------------------------------------------------- one frame

    def _frame_step_batched(self, frontier, ll, valid):
        """Whole-batch frame step for the padded layout — no vmap anywhere,
        every op natively batched.  All selection/dedup runs through
        payload-carrying sorts (_packed_level); the only dynamic gathers are
        the per-state arc-row fetch and the acoustic lookup.

        ll: [B, P] acoustic rows; valid: [B] bool.
        """
        K, M, E, S = self.K, self.M, self.E, self.S
        scale = self.params.acoustic_scale
        tok_state, tok_cost = frontier["state"], frontier["cost"]  # [B, K]
        B = tok_state.shape[0]

        rows = self.em_pack[tok_state]  # [B, K, 4M] shared-operand gather
        w = rows[:, :, :M].reshape(B, E)
        ns = jax.lax.bitcast_convert_type(rows[:, :, M : 2 * M], jnp.int32).reshape(B, E)
        pdf_f = jax.lax.bitcast_convert_type(rows[:, :, 2 * M : 3 * M], jnp.int32).reshape(B, E)
        olab = jax.lax.bitcast_convert_type(rows[:, :, 3 * M :], jnp.int32).reshape(B, E)
        sil = (pdf_f & SIL_FLAG) != 0
        pdf = pdf_f & PDF_MASK
        ac = jnp.take_along_axis(ll, pdf, axis=1)
        e_ids = jnp.broadcast_to(jnp.arange(E, dtype=jnp.int32), (B, E))
        cost = jnp.repeat(tok_cost, M, axis=1) + w - scale * ac
        mask = jnp.isfinite(w)

        # trailing-silence state: silence arcs extend the run, speech arcs
        # reset it and latch the has-speech bit
        prev_ts = jnp.repeat(frontier["tsil"], M, axis=1)
        cand_ts = jnp.where(
            sil,
            ((prev_ts & TSIL_MASK) + 1) | (prev_ts & SPEECH_BIT),
            SPEECH_BIT,
        )

        nsm = jnp.where(mask, ns, S)
        cm = jnp.where(mask, cost, INF)
        # dense arc ids (state*M + m) computed before sorting so no gather is
        # needed to reconstruct them afterwards
        arc_id = jnp.repeat(tok_state, M, axis=1) * M + (e_ids % M)
        payloads = {"e": e_ids, "olab": olab, "pdf": pdf, "arc": arc_id,
                    "ts": cand_ts}
        lat = (e_ids // M, arc_id) if self.lattice_records else None
        new_state, new_cost, keep, sel, lattice_rec = self._packed_level(
            nsm, cm, payloads, lat
        )
        new_tsil = jnp.where(keep, sel["ts"], 0)
        rec = {
            "prev": jnp.where(keep, sel["e"] // M, -1),
            "olabel": jnp.where(keep, sel["olab"], 0),
            "pdf": jnp.where(keep, sel["pdf"], -1),
        }
        if self.lattice_records:
            rec.update(lattice_rec)
            rec["f_state"] = new_state
            rec["f_cost"] = new_cost

        # eps closure rounds
        cur_state, cur_cost, cur_tsil = new_state, new_cost, new_tsil
        rec_levels = [rec]
        for _ in range(self.eps_iters):
            if self.Me:
                (cur_state, cur_cost, cur_tsil), lvl_rec = self._eps_level_batched(
                    cur_state, cur_cost, cur_tsil
                )
            else:
                (cur_state, cur_cost, cur_tsil), lvl_rec = jax.vmap(
                    self._eps_level
                )(cur_state, cur_cost, cur_tsil)
            rec_levels.append(lvl_rec)

        vb = valid[:, None]
        new_frontier = {
            "state": jnp.where(vb, cur_state, tok_state),
            "cost": jnp.where(vb, cur_cost, tok_cost),
            "tsil": jnp.where(vb, cur_tsil, frontier["tsil"]),
        }
        slot = jnp.broadcast_to(jnp.arange(K, dtype=jnp.int32), (B, K))
        ident = {
            "prev": slot,
            "olabel": jnp.zeros((B, K), jnp.int32),
            "pdf": jnp.full((B, K), -1, jnp.int32),
        }
        if self.lattice_records:
            R = self.R
            pad_i = jnp.full((B, R - K), -1, jnp.int32) if R > K else None

            def padk(x, fill):
                if R > K:
                    return jnp.concatenate(
                        [x, jnp.full((B, R - K), fill, x.dtype)], axis=1
                    )
                return x[:, :R]

            ident.update(
                {
                    "f_state": tok_state,
                    "f_cost": tok_cost,
                    "lat_ns": padk(tok_state, S),
                    "lat_prev": padk(slot, -1),
                    "lat_arc": jnp.full((B, R), -1, jnp.int32),
                    "lat_cost": padk(tok_cost, jnp.inf),
                }
            )
        records = {
            k: jnp.stack(
                [
                    jnp.where(
                        vb if lvl[k].ndim == 2 else vb[:, :, None],
                        lvl[k],
                        ident[k],
                    )
                    for lvl in rec_levels
                ],
                axis=1,
            )
            for k in rec_levels[0]
        }
        return new_frontier, records

    def _eps_level_batched(self, cur_state, cur_cost, cur_tsil):
        """One whole-batch epsilon-closure round over the padded eps tables
        (payload-sort selection, no vmap).  Frontier tokens are carried as
        zero-cost candidates so states without eps arcs survive the round;
        eps moves consume no frame, so tsil passes through unchanged."""
        K, Me, S = self.K, self.Me, self.S
        B = cur_state.shape[0]
        Ke = K * Me
        rows = self.eps_pack[cur_state]  # [B, K, 4Me]
        w = rows[:, :, :Me].reshape(B, Ke)
        ens = jax.lax.bitcast_convert_type(rows[:, :, Me : 2 * Me], jnp.int32).reshape(B, Ke)
        eol = jax.lax.bitcast_convert_type(rows[:, :, 2 * Me : 3 * Me], jnp.int32).reshape(B, Ke)
        earc = jax.lax.bitcast_convert_type(rows[:, :, 3 * Me :], jnp.int32).reshape(B, Ke)
        slot = jnp.broadcast_to(jnp.arange(K, dtype=jnp.int32), (B, K))
        ecost = jnp.repeat(cur_cost, Me, axis=1) + w
        emask = jnp.isfinite(w)

        all_ns = jnp.concatenate([cur_state, jnp.where(emask, ens, S)], axis=1)
        all_cost = jnp.concatenate([cur_cost, jnp.where(emask, ecost, INF)], axis=1)
        prev = jnp.concatenate([slot, jnp.repeat(slot, Me, axis=1)], axis=1)
        olab = jnp.concatenate([jnp.zeros((B, K), jnp.int32), eol], axis=1)
        arc = jnp.concatenate([jnp.full((B, K), -1, jnp.int32), earc], axis=1)
        ts = jnp.concatenate([cur_tsil, jnp.repeat(cur_tsil, Me, axis=1)], axis=1)
        payloads = {"prev": prev, "olab": olab, "ts": ts}
        lat = (prev, arc) if self.lattice_records else None
        st2, c2, keep2, sel, lattice_rec = self._packed_level(
            all_ns, all_cost, payloads, lat
        )
        ts2 = jnp.where(keep2, sel["ts"], 0)
        lvl_rec = {
            "prev": jnp.where(keep2, sel["prev"], -1),
            "olabel": jnp.where(keep2, sel["olab"], 0),
            "pdf": jnp.full((B, K), -1, jnp.int32),
        }
        if self.lattice_records:
            lvl_rec.update(lattice_rec)
            lvl_rec["f_state"], lvl_rec["f_cost"] = st2, c2
        return (st2, c2, ts2), lvl_rec

    def _eps_level(self, cur_state, cur_cost, cur_tsil):
        """One per-channel epsilon-closure round (vmapped); eps moves
        consume no frame, so tsil passes through from the source token."""
        K = self.K
        toke, arce, maske, _ovfe = self._expand(
            cur_state, cur_cost, self.eps_off, self.Ee
        )
        ecost = cur_cost[toke] + self.eps_w[arce]
        ens = self.eps_next[arce]
        slot = jnp.arange(K, dtype=jnp.int32)
        all_ns = jnp.concatenate([cur_state, ens])
        all_cost = jnp.concatenate([cur_cost, ecost])
        all_mask = jnp.concatenate([cur_state != self.S, maske])
        all_prev = jnp.concatenate([slot, toke])
        all_ol = jnp.concatenate([jnp.zeros(K, jnp.int32), self.eps_olabel[arce]])
        all_ts = jnp.concatenate([cur_tsil, cur_tsil[toke]])
        sel2, st2, c2, keep2 = self._dedup_prune(all_ns, all_cost, all_mask)
        ts2 = jnp.where(keep2, all_ts[sel2], 0)
        lvl_rec = {
            "prev": jnp.where(keep2, all_prev[sel2], -1),
            "olabel": jnp.where(keep2, all_ol[sel2], 0),
            "pdf": jnp.full((K,), -1, jnp.int32),
        }
        if self.lattice_records:
            all_arc = jnp.concatenate([jnp.full((K,), -1, jnp.int32), arce])
            lvl_rec.update(
                self._lattice_level(all_ns, all_cost, all_mask, all_prev, all_arc, c2)
            )
            lvl_rec["f_state"], lvl_rec["f_cost"] = st2, c2
        return (st2, c2, ts2), lvl_rec

    def _frame_step(self, frontier, loglike, valid):
        """Advance one channel one frame (CSR layout).

        loglike: [n_pdf] acoustic row. valid: scalar bool.
        Returns new frontier + per-level records.
        """
        scale = self.params.acoustic_scale
        tok_state, tok_cost = frontier["state"], frontier["cost"]
        tok, arc, mask, _ovf = self._expand(
            tok_state, tok_cost, self.em_off, self.E
        )
        pdf_f = self.em_pdf[arc]
        sil = (pdf_f & SIL_FLAG) != 0
        pdf = pdf_f & PDF_MASK
        cost = tok_cost[tok] + self.em_w[arc] - scale * loglike[pdf]
        ns = self.em_next[arc]
        olab = self.em_olabel[arc]
        prev_ts = frontier["tsil"][tok]
        cand_ts = jnp.where(
            sil,
            ((prev_ts & TSIL_MASK) + 1) | (prev_ts & SPEECH_BIT),
            SPEECH_BIT,
        )
        return self._frame_finish(
            frontier, tok, arc, ns, cost, pdf, olab, cand_ts, mask, valid
        )

    def _frame_finish(self, frontier, tok, arc, ns, cost, pdf, olab, cand_ts,
                      mask, valid):
        K = self.K
        tok_state, tok_cost = frontier["state"], frontier["cost"]
        sel, st1, c1, keep = self._dedup_prune(ns, cost, mask)
        rec_levels = []
        em_rec = {
            "prev": jnp.where(keep, tok[sel], -1),
            "olabel": jnp.where(keep, olab[sel], 0),
            "pdf": jnp.where(keep, pdf[sel], -1),
        }
        cur_tsil = jnp.where(keep, cand_ts[sel], 0)
        if self.lattice_records:
            em_rec.update(self._lattice_level(ns, cost, mask, tok, arc, c1))
            em_rec["f_state"], em_rec["f_cost"] = st1, c1
        rec_levels.append(em_rec)
        cur_state, cur_cost = st1, c1

        # ---- epsilon closure levels
        for _ in range(self.eps_iters):
            (cur_state, cur_cost, cur_tsil), lvl_rec = self._eps_level(
                cur_state, cur_cost, cur_tsil
            )
            rec_levels.append(lvl_rec)

        # ---- valid masking: pass-through when frame is padding
        slot = jnp.arange(K, dtype=jnp.int32)
        new_frontier = {
            "state": jnp.where(valid, cur_state, tok_state),
            "cost": jnp.where(valid, cur_cost, tok_cost),
            "tsil": jnp.where(valid, cur_tsil, frontier["tsil"]),
        }
        ident = {
            "prev": slot,
            "olabel": jnp.zeros(K, jnp.int32),
            "pdf": jnp.full((K,), -1, jnp.int32),
        }
        if self.lattice_records:
            R = self.R
            pad_i32 = jnp.full((R,), -1, jnp.int32)
            ident.update(
                {
                    "f_state": tok_state,
                    "f_cost": tok_cost,
                    # identity carries so lattice stays connected across
                    # masked frames: first K lattice rows mirror the frontier
                    "lat_ns": jnp.concatenate([tok_state, jnp.full((R - K,), self.S, jnp.int32)]) if R > K else tok_state[:R],
                    "lat_prev": jnp.concatenate([slot, pad_i32[: R - K]]) if R > K else slot[:R],
                    "lat_arc": pad_i32,
                    "lat_cost": jnp.concatenate([tok_cost, jnp.full((R - K,), jnp.inf)]) if R > K else tok_cost[:R],
                }
            )
        records = {
            k: jnp.stack(
                [jnp.where(valid, lvl[k], ident[k]) for lvl in rec_levels], 0
            )
            for k in rec_levels[0]
        }
        return new_frontier, records

    def _lattice_level(self, ns, cost, mask, prev, arc, frontier_cost):
        """Top-R candidate arcs of one level, pruned to lattice_beam above the
        level's best cost — the forward links Kaldi's lattice decoder keeps.
        For carry entries (eps levels) arc == -1."""
        R = self.R
        costm = jnp.where(mask, cost, INF)
        neg, sel = jax.lax.top_k(-costm, R)
        lcost = -neg
        best = jnp.min(frontier_cost)
        keep = lcost <= best + self.params.lattice_beam
        return {
            "lat_ns": jnp.where(keep, ns[sel], self.S),
            "lat_prev": jnp.where(keep, prev[sel], -1),
            "lat_arc": jnp.where(keep, arc[sel], -1),
            "lat_cost": jnp.where(keep, lcost, INF),
        }

    # ------------------------------------------------------------- chunk API

    def _decode_chunk_impl(self, frontier, loglikes, valid):
        """loglikes: [B, T, P]; valid: [B, T] bool."""

        def step(car, xs):
            ll, v = xs
            if self.layout == "padded":
                f2, rec = self._frame_step_batched(car, ll, v)
            else:
                f2, rec = jax.vmap(self._frame_step)(car, ll, v)
            return f2, rec

        xs = (jnp.swapaxes(loglikes, 0, 1), jnp.swapaxes(valid, 0, 1))
        frontier, recs = jax.lax.scan(step, frontier, xs)
        # recs: [T, B, L, K] -> [B, T, L, K]
        recs = {k: jnp.swapaxes(v, 0, 1) for k, v in recs.items()}
        best_cost = jnp.min(frontier["cost"], axis=1)
        final_tot = frontier["cost"] + self.final_cost[frontier["state"]]
        best_final_cost = jnp.min(final_tot, axis=1)
        return frontier, recs, best_cost, best_final_cost

    def endpoint_info(self, frontier):
        """O(1) endpoint inputs from the device-tracked token state: per
        channel, the best (non-final) token's trailing-silence frame count
        and whether its path contains speech.  Replaces per-chunk host
        tracebacks (the reference reads equivalent decoder state,
        recognizer.cc:318).  Returns (trailing [B], has_speech [B])."""
        cost = np.asarray(frontier["cost"])
        tsil = np.asarray(frontier["tsil"])
        slot = np.argmin(np.where(np.isfinite(cost), cost, np.inf), axis=1)
        ts = tsil[np.arange(len(slot)), slot]
        return (ts & int(TSIL_MASK), (ts & int(SPEECH_BIT)) != 0)

    def decode_chunk(self, frontier, loglikes, valid=None):
        if valid is None:
            valid = jnp.ones(loglikes.shape[:2], bool)
        return self._decode_jit(self.tables, frontier, loglikes, valid)

    # ------------------------------------------------------------ host side

    def host_em_arc(self, ai: int) -> tuple[float, int, int]:
        """(graph_weight, olabel, pdf) of an emitting-arc record id — dense
        ids for the padded layout, CSR indices otherwise."""
        if self.layout == "padded":
            s, m = divmod(int(ai), self.M)
            return (
                float(self.dense_w[s, m]),
                int(self.dense_olabel[s, m]),
                int(self.dense_pdf[s, m]),
            )
        g = self.graph
        return float(g.em_w[ai]), int(g.em_olabel[ai]), int(g.em_pdf[ai])

    def traceback(
        self,
        records: list[dict],
        frontier,
        channel: int,
        use_final: bool = True,
        at_start: bool = True,
    ) -> tuple[float, list[int], list[int]]:
        """Best-path traceback on host.

        Returns (cost, olabels, per-frame pdf alignment).
        """
        cost, ols_frames, pdfs = self.traceback_with_frames(
            records, frontier, channel, use_final, at_start
        )
        return cost, [o for o, _ in ols_frames], pdfs

    def traceback_with_frames(
        self,
        records: list[dict],
        frontier,
        channel: int,
        use_final: bool = True,
        at_start: bool = True,
    ) -> tuple[float, list[tuple[int, int]], list[int]]:
        """Best-path traceback with frame indices.

        records: list of per-chunk record pytrees ({prev, olabel, pdf} each
        [B, T, L, K]).  Returns (cost, [(olabel, frame_idx)], pdf alignment)
        where frame_idx counts *valid decoded frames* from utterance start
        (identity records of masked frames don't count).
        """
        state = np.asarray(frontier["state"][channel])
        cost = np.asarray(frontier["cost"][channel])
        fc = np.asarray(self.final_cost)[state]
        tot = cost + fc
        if use_final and np.isfinite(tot).any():
            slot = int(np.argmin(tot))
            best_cost = float(tot[slot])
        else:
            slot = int(np.argmin(cost))
            best_cost = float(cost[slot])
        if not np.isfinite(cost[slot]):
            return np.inf, [], []

        # total valid frames = count of level-0 records with pdf >= 0 along
        # the path; first pass collects raw entries, then frames are numbered.
        raw: list[tuple[int, bool, int]] = []  # (olabel, is_frame_level, pdf)
        for rec in reversed(records):
            prev = np.asarray(rec["prev"][channel])  # [T, L, K]
            olab = np.asarray(rec["olabel"][channel])
            pdf = np.asarray(rec["pdf"][channel])
            T, L, _ = prev.shape
            for t in range(T - 1, -1, -1):
                for lvl in range(L - 1, -1, -1):
                    if slot < 0:
                        return best_cost, [], []
                    raw.append(
                        (int(olab[t, lvl, slot]), lvl == 0, int(pdf[t, lvl, slot]))
                    )
                    slot = int(prev[t, lvl, slot])

        n_valid = sum(1 for _, isf, p in raw if isf and p >= 0)
        pdfs = [0] * n_valid
        ols_frames: list[tuple[int, int]] = []
        fidx = n_valid  # walking backwards; current frame = fidx - 1
        for ol, is_frame, p in raw:
            if ol != 0:
                ols_frames.append((ol, max(fidx - 1, 0)))
            if is_frame and p >= 0:
                fidx -= 1
                pdfs[fidx] = p
        # initial-closure olabel prefix of the starting slot (frame 0);
        # skipped when the records don't reach utterance start (at_start
        # False: folded-window mode, the caller holds the frozen prefix)
        if at_start and 0 <= slot < len(self._init_prefixes):
            for ol in reversed(self._init_prefixes[slot]):
                ols_frames.append((ol, 0))
        ols_frames.reverse()
        return best_cost, ols_frames, pdfs
