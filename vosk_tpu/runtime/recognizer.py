"""Streaming Recognizer — API/behavior parity with the reference Recognizer
(src/recognizer.h:43, src/recognizer.cc) on a TPU-shaped pipeline:

  PCM chunks -> streaming feature kernel -> streaming TDNN-F -> batched
  token-passing decode, with the state machine INITIALIZED/RUNNING/ENDPOINT/
  FINALIZED (recognizer.h:36-41), endpoint rules, 0.2 s sub-chunking
  (recognizer.cc:305-311), frame-offset/sample bookkeeping for absolute
  timestamps (recognizer.cc:196-223,457-458), and JSON result schemas.

This class drives a batch-1 slice of the same jitted programs the batch
pipeline uses; compiled executables are shared across recognizers created
from the same Model (the reference shares the static Model the same way,
vosk_api.h:24-27).
"""
from __future__ import annotations

import enum
import json
import math
from typing import List, Optional

import numpy as np

from ..graph.builder import build_decoding_graph
from ..graph.lm import grammar_to_fst
from ..io.native import NativeModel
from ..io.wav import pcm16_bytes_to_float
from ..ops.viterbi import BatchViterbi, DecodeParams
from ..utils.logging import log_warn
from . import endpoint as ep
from . import jsonout


class State(enum.Enum):
    INITIALIZED = 0
    RUNNING = 1
    ENDPOINT = 2
    FINALIZED = 3


# pipeline recycle threshold: ~10 minutes of decoded frames
# (reference recognizer.cc:196-202 uses 20000 decoded frames)
RECYCLE_FRAMES = 20000


class Recognizer:
    def __init__(
        self,
        model: NativeModel,
        sample_rate: float,
        grammar: Optional[str] = None,
        spk_model=None,
    ):
        self.model = model
        self.sample_rate = float(sample_rate)
        # input at a different rate is resampled to the model's rate
        # (reference: allow_downsample in the feature pipeline, model.cc:221,
        # and LinearResample on the batch path, batch_recognizer.cc:27-29)
        self.model_rate = float(model.config.sample_rate)
        self.spk_model = spk_model

        self.graph = model.graph
        self._grammar_info = None
        if grammar is not None:
            self._build_grammar_graph(grammar)
        if self.graph is None:
            raise ValueError("Can't create decoding graph")

        self.ex = model.feature_extractor()
        self.am = model.make_am()
        # same decoder configuration as BatchPipeline (runtime/batch.py) so
        # the single-stream and batch entry points score identically: the
        # v4 single-phase frame step on the optimized (eps-free) graph with
        # f16-packed arc rows.  The decoder is SHARED across recognizers of
        # the same model (NativeModel.shared_decoder): one graph transform
        # and one jit cache per model, so creating the N-th recognizer is
        # cheap — the reference's one-Model/N-Recognizers property
        # (model.cc:343-354, vosk_api.h:24-27).
        self.dec = model.shared_decoder(
            graph=self.graph if self._grammar_info is not None else None,
            cache_key=grammar if self._grammar_info is not None else None,
        )
        from .finishing import Finisher

        self._finisher = Finisher(model, self.dec)
        self.frame_shift = model.config.frame_shift_seconds
        self.rules = model.endpoint_rules()
        # bounded streaming memory: device records older than this window
        # are folded into a frozen best-path prefix (the reference bounds
        # memory with incremental lattice determinization, model.h:24; here
        # paths older than ~6 s have converged and are frozen instead)
        self.max_window_frames = 300
        self.keep_window_frames = 200

        # fixed device chunk: 0.2 s of samples (recognizer.cc:305)
        self.chunk_samples = int(0.2 * self.model_rate)
        self.max_feat_frames = self.ex.stream_max_frames(self.chunk_samples)

        # online i-vector extractor + decoded-silence weighting
        # (reference model.cc:247-263, recognizer.cc:226-237)
        self.iv = model.make_ivector_extractor(chunk_frames=self.max_feat_frames)
        self._silence_weight = float(getattr(model, "silence_weight", 1.0))
        swp = getattr(model, "silence_weight_phones", set())
        self._silence_weight_pdfs = (
            {
                int(pdf)
                for pdf in range(len(model.phone_of_pdf))
                if int(model.phone_of_pdf[pdf]) in swp
            }
            if swp
            else {int(x) for x in np.asarray(model.silence_pdfs)}
        )

        # result options
        self.words_ = False
        self.partial_words_ = False
        self.max_alternatives_ = 0
        self.nlsml_ = False

        # bookkeeping across utterances
        self.frame_offset_ = 0          # output frames finalized so far
        self.samples_processed_ = 0
        self.samples_round_start_ = 0

        from ..utils.metrics import StageTimers

        self.metrics = StageTimers()
        self._spk_feats: list = []      # raw audio retained for speaker branch
        self._init_pipeline()
        self.state = State.INITIALIZED
        self.last_result_ = ""

    # ------------------------------------------------------------- setup

    def _build_grammar_graph(self, grammar: str) -> None:
        """Runtime phrase-list graph (reference recognizer.cc:49-98).

        Native models recompile L∘G from their lexicon; split-graph Kaldi
        models (HCLr/Gr) recompose HCLr with a phrase-list G, exactly the
        reference's LookaheadComposeFst(hcl, g, disambig) path."""
        hcl_fst = getattr(self.model, "hcl_fst", None)
        if self.model.lexicon is None and hcl_fst is None:
            log_warn("Runtime graphs are not supported by this model")
            return
        try:
            phrases = json.loads(grammar)
        except json.JSONDecodeError:
            phrases = []
        if not isinstance(phrases, list) or not phrases:
            log_warn(f"Expecting array of strings, got: '{grammar}'")
            return
        g = grammar_to_fst([str(p) for p in phrases], self.model.words.find)
        if self.model.lexicon is not None:
            graph, info = build_decoding_graph(
                self.model.lexicon, g, self.model.topology
            )
            self.graph = graph
            self._grammar_info = info
        else:
            from ..graph.lookahead import lookahead_compose, prepare_decode_fst

            fst = lookahead_compose(
                hcl_fst, g, getattr(self.model, "disambig_tids", [])
            )
            self.graph = prepare_decode_fst(fst, self.model.tid2pdf)
            self._grammar_info = None

    def _init_pipeline(self) -> None:
        self._feat_state = self.ex.init_stream_state(1, self.chunk_samples)
        self._am_state = self.am.init_stream_state(1, self.max_feat_frames)
        self._iv_state = self.iv.init_state(1) if self.iv is not None else None
        self._iv_frames_weighted = 0    # silence weighting high-water mark
        self._frontier = self.dec.init_frontier(1)
        self._reset_utterance_records()
        self._pending = np.zeros(0, np.float32)
        self._best_cost = np.inf
        self._best_final_cost = np.inf
        self._flushed = False

    def _reset_utterance_records(self) -> None:
        self._records: list = []
        self._rec_frames: list = []     # decoded frames per retained chunk
        self._utt_frames = 0            # output frames decoded this utterance
        self._folded_frames = 0         # frames folded out of the window
        self._prefix_ols: list = []     # frozen (olabel, frame) before window
        self._prefix_pdfs: list = []    # frozen pdf alignment before window
        self._fold_init = None          # (states, costs) at the fold boundary
        self._prefix_lat = None         # windowed prefix LATTICE (alternatives
        self._prefix_slots = None       # survive folding); slot -> end node

    # ---------------------------------------------------------- options

    def set_words(self, v: bool) -> None:
        self.words_ = bool(v)

    def set_partial_words(self, v: bool) -> None:
        self.partial_words_ = bool(v)

    def set_max_alternatives(self, n: int) -> None:
        self.max_alternatives_ = int(n)

    def set_nlsml(self, v: bool) -> None:
        self.nlsml_ = bool(v)

    def set_spk_model(self, spk_model) -> None:
        if self.state == State.RUNNING:
            raise RuntimeError("Can't add speaker model to already running recognizer")
        self.spk_model = spk_model

    # ------------------------------------------------------------ ingest

    def accept_waveform(self, data) -> bool:
        """Accept PCM data (bytes = s16le, or numpy int16/float array).
        Returns True when an endpoint (silence) was detected
        (vosk_api.h:212-221)."""
        wave = self._to_float(data)
        return self._accept(wave)

    def _to_float(self, data) -> np.ndarray:
        if isinstance(data, (bytes, bytearray, memoryview)):
            return pcm16_bytes_to_float(bytes(data))
        a = np.asarray(data)
        if a.dtype == np.int16:
            return a.astype(np.float32)
        return a.astype(np.float32)

    def _accept(self, wave: np.ndarray) -> bool:
        if self.state not in (State.RUNNING, State.INITIALIZED):
            self._clean_up()
        self.state = State.RUNNING

        if abs(self.sample_rate - self.model_rate) > 1e-6:
            # stateful band-limited resampler (role of the reference's
            # per-stream Kaldi LinearResample, batch_recognizer.cc:27-29);
            # phase carries across calls so chunking doesn't alias
            if getattr(self, "_resampler", None) is None:
                from ..ops.resample import StreamingResampler

                self._resampler = StreamingResampler(
                    self.sample_rate, self.model_rate
                )
            wave = self._resampler.process(wave)

        if self.spk_model is not None:
            self._spk_feats.append(wave.copy())

        buf = np.concatenate([self._pending, wave])
        S = self.chunk_samples
        pos = 0
        while len(buf) - pos >= S:
            self._process_chunk(buf[pos : pos + S], S)
            pos += S
        self._pending = buf[pos:]
        self.samples_processed_ += len(wave)

        return self._endpoint_check()

    def _process_chunk(self, chunk: np.ndarray, n_valid: int) -> None:
        S = self.chunk_samples
        if len(chunk) < S:
            chunk = np.concatenate([chunk, np.zeros(S - len(chunk), np.float32)])
        self.metrics.add_audio(n_valid / self.model_rate)
        with self.metrics.timer("features"):
            self._feat_state, feats, fvalid = self.ex.extract_chunk(
                self._feat_state, chunk[None, :], n_samples=np.array([n_valid], np.int32)
            )
        ivec = None
        if self.iv is not None:
            with self.metrics.timer("ivector"):
                self._iv_state = self.iv.update(self._iv_state, feats, fvalid)
                ivec = self.iv.current(self._iv_state)
        with self.metrics.timer("acoustic_model"):
            self._am_state, ll, lvalid = self.am.process_chunk(
                self._am_state, feats, fvalid, ivec
            )
        self._decode(ll, lvalid)

    def _decode(self, ll, lvalid) -> None:
        with self.metrics.timer("decoder"):
            self._frontier, recs, best, bestf = self.dec.decode_chunk(
                self._frontier, ll, lvalid
            )
        n = int(np.asarray(lvalid)[0].sum())
        self._records.append(recs)
        self._rec_frames.append(n)
        self._utt_frames += n
        self._best_cost = float(np.asarray(best)[0])
        self._best_final_cost = float(np.asarray(bestf)[0])
        if self._utt_frames - self._folded_frames > self.max_window_frames:
            with self.metrics.timer("fold"):
                self._fold_records()

    def _fold_records(self) -> None:
        """Bound streaming memory: fold the oldest record chunks into a
        frozen best-path prefix so retained device records stay within
        keep_window_frames (the reference bounds lattice memory with
        incremental determinization, model.h:24; freezing the >6 s-old
        prefix to the converged best path is the TPU-shaped equivalent —
        alternatives that old have virtually always collapsed under beam
        pruning)."""
        retained = self._utt_frames - self._folded_frames
        n_drop, drop_frames = 0, 0
        while (
            n_drop < len(self._records) - 1
            and retained - drop_frames > self.keep_window_frames
        ):
            drop_frames += self._rec_frames[n_drop]
            n_drop += 1
        if n_drop == 0 or drop_frames == 0:
            return
        _, ols, pdfs = self.dec.traceback_with_frames(
            self._records, self._frontier, 0, use_final=False,
            at_start=self._folded_frames == 0,
            init_states=self._window_init_states(),
        )
        self._prefix_ols += [
            (ol, f + self._folded_frames) for (ol, f) in ols if f < drop_frames
        ]
        self._prefix_pdfs += pdfs[:drop_frames]
        last = self._records[n_drop - 1]
        prev_init = self._fold_init
        if "pm" in last:  # v4 records: [T, B, K]
            self._fold_init = (
                np.asarray(last["state"][-1, 0]).copy(),
                np.asarray(last["f_cost"][-1, 0]).copy(),
            )
        else:  # v3 records: [B, T, L, K]
            self._fold_init = (
                np.asarray(last["f_state"][0, -1, -1]).copy(),
                np.asarray(last["f_cost"][0, -1, -1]).copy(),
            )
        self._extend_prefix_lattice(
            self._records[:n_drop], prev_init, self._fold_init
        )
        self._records = self._records[n_drop:]
        self._rec_frames = self._rec_frames[n_drop:]
        self._folded_frames += drop_frames

    def _extend_prefix_lattice(self, dropped, prev_init, boundary) -> None:
        """Windowed lattice: append the dropped record window's lattice to
        the retained prefix lattice so ALTERNATIVES (n-best, confidences)
        survive folding — the reference keeps a determinized lattice over
        the whole utterance (incremental determinization, model.h:24); here
        the prefix lattice is spliced window-by-window and beam-pruned at
        each fold to bound memory."""
        from ..graph.lattice import build_lattice, splice_lattices

        fake_fr = {
            "state": np.asarray(boundary[0])[None, :],
            "cost": np.asarray(boundary[1])[None, :],
        }
        init_map: dict = {}
        try:
            lat_d, endmap = build_lattice(
                dropped, fake_fr, 0, self.dec, use_final=False,
                init_override=prev_init, init_map_out=init_map,
            )
        except Exception as e:  # never let prefix-lattice upkeep kill decode
            log_warn(f"prefix lattice build failed, freezing prefix: {e}")
            self._prefix_lat = None
            self._prefix_slots = None
            return
        if self._prefix_lat is None:
            self._prefix_lat, self._prefix_slots = lat_d, endmap
        elif self._prefix_slots is not None:
            self._prefix_lat, nmap = splice_lattices(
                self._prefix_lat, self._prefix_slots, lat_d, init_map,
                frame_offset=self._folded_frames,
            )
            self._prefix_slots = {k: nmap[n] for k, n in endmap.items()}
        if self._prefix_lat is not None and self._prefix_slots is not None:
            # bound memory: prune against the best boundary cost (finals
            # 0.0 on boundary nodes for the forward-backward, then cleared)
            lat = self._prefix_lat
            for node in self._prefix_slots.values():
                lat.final[node] = 0.0
            node_map: list = []
            pruned = lat.prune(
                self.dec.params.lattice_beam, node_map_out=node_map
            )
            if pruned is not lat:
                self._prefix_lat = pruned
                self._prefix_slots = {
                    k: node_map[n]
                    for k, n in self._prefix_slots.items()
                    if node_map[n] >= 0
                }
            for node in self._prefix_slots.values():
                self._prefix_lat.final[node] = math.inf

    def _window_init_states(self):
        """[K] graph-state row of the frontier just before the retained
        record window — the fold-boundary anchor v4 tracebacks need (v3
        records ignore it).  None at utterance start (decoder default)."""
        if self._folded_frames == 0 or self._fold_init is None:
            return None
        return self._fold_init[0]

    def _last_chunk_init_states(self):
        """[K] state row just before the NEWEST record chunk (for the O(1)
        silence-weighting traceback over that chunk alone)."""
        if len(self._records) >= 2:
            prev = self._records[-2]
            if "pm" in prev:  # v4: [T, B, K]
                return np.asarray(prev["state"][-1, 0])
            return np.asarray(prev["f_state"][0, -1, -1])
        win = self._window_init_states()
        # single retained chunk at utterance start: the decoder's initial
        # closure is the preceding frontier
        return win if win is not None else np.asarray(self.dec._init_states)

    def _full_traceback(self, use_final: bool):
        """Best path over the whole utterance: frozen prefix + retained
        window.  Returns (cost, ols_frames, pdfs) in utterance frames."""
        cost, ols, pdfs = self.dec.traceback_with_frames(
            self._records, self._frontier, 0, use_final=use_final,
            at_start=self._folded_frames == 0,
            init_states=self._window_init_states(),
        )
        off = self._folded_frames
        ols = self._prefix_ols + [(ol, f + off) for (ol, f) in ols]
        return cost, ols, self._prefix_pdfs + pdfs

    def _flush_pending(self, input_finished: bool) -> None:
        """Feed remaining buffered samples; on `input_finished` additionally
        flush the AM right context (reference: InputFinished + AdvanceDecoding
        only in FinalResult, recognizer.cc:824-827 — the endpoint Result() at
        recognizer.cc:808 does NOT flush, so the feature/AM stream stays live
        for the next utterance)."""
        if input_finished and getattr(self, "_resampler", None) is not None:
            tail = self._resampler.flush()
            if len(tail):
                self._pending = np.concatenate([self._pending, tail])
            self._resampler.reset()
        if input_finished and self.ex.flush_pad_samples:
            # pitch delays frame emission by its lookahead; flush the tail
            # frames against zeros (end-of-stream silence), like Kaldi's
            # online pitch at InputFinished
            self._pending = np.concatenate(
                [self._pending,
                 np.zeros(self.ex.flush_pad_samples, np.float32)]
            )
        if len(self._pending) > 0:
            self._process_chunk(self._pending, len(self._pending))
            self._pending = np.zeros(0, np.float32)
        if input_finished and not self._flushed:
            ivec = None
            if self.iv is not None:
                self._iv_state = self.iv.flush(self._iv_state)
                ivec = self.iv.current(self._iv_state)
            self._am_state, ll, lvalid = self.am.flush(self._am_state, ivec)
            self._decode(ll, lvalid)
            self._flushed = True

    # ---------------------------------------------------------- endpoint

    def _endpoint_check(self) -> bool:
        """O(1) endpoint check from device-tracked trailing silence (no host
        traceback; the reference reads equivalent decoder state at
        recognizer.cc:318)."""
        if self._utt_frames == 0:
            return False
        trailing, has_speech = self.dec.endpoint_info(self._frontier)
        if self.iv is not None and self._silence_weight != 1.0 and self._records:
            # silence weighting needs a frame alignment; a traceback over
            # just the newest chunk is O(chunk), not O(utterance)
            _, _, pdfs = self.dec.traceback(
                [self._records[-1]], self._frontier, 0, use_final=False,
                at_start=False, init_states=self._last_chunk_init_states(),
            )
            self._update_silence_weights(pdfs, self._utt_frames - len(pdfs))
        rel = self._best_final_cost - self._best_cost
        return ep.endpoint_detected(
            self.rules,
            self._utt_frames,
            int(trailing[0]),
            rel,
            self.frame_shift,
            bool(has_speech[0]),
        )

    def _update_silence_weights(self, pdfs, frames_before: int = 0) -> None:
        """Downweight i-vector stats on frames the decoder aligned to
        silence (reference UpdateSilenceWeights, recognizer.cc:226-237).
        pdfs: best-path alignment of the utterance's decode frames starting
        at utterance frame `frames_before`."""
        if (
            self.iv is None
            or self._silence_weight == 1.0
            or not pdfs
        ):
            return
        ss = self.am.subsample
        n_feat = int(np.asarray(self._iv_state["centers_done"])[0])
        sil = self._silence_weight_pdfs
        ids, ws = [], []
        for f in range(self._iv_frames_weighted, n_feat):
            d = f // ss - self.frame_offset_ - frames_before
            if 0 <= d < len(pdfs) and pdfs[d] in sil:
                ids.append(f)
                ws.append(self._silence_weight)
        self._iv_frames_weighted = n_feat
        if ids:
            # fixed-width call so the jitted reweight doesn't retrace
            N = self.iv.ring
            ids = (ids + [-1] * N)[:N]
            ws = (ws + [1.0] * N)[:N]
            self._iv_state = self.iv.reweight(
                self._iv_state,
                np.asarray([ids], np.int32),
                np.asarray([ws], np.float32),
            )

    # ----------------------------------------------------------- results

    def _clean_up(self) -> None:
        """Reference CleanUp (recognizer.cc:188-224): accumulate frame
        offset; recycle the whole pipeline after FINALIZED or ~10 min,
        else just restart the decoder with the frame offset."""
        self.frame_offset_ += self._utt_frames
        if self.state == State.FINALIZED or self.frame_offset_ > RECYCLE_FRAMES:
            self.samples_round_start_ += self.samples_processed_
            self.samples_processed_ = 0
            self.frame_offset_ = 0
            self._spk_feats = []
            self._init_pipeline()
        else:
            # restart decoding from the start state, keep feature/AM streams
            self._frontier = self.dec.init_frontier(1)
            self._reset_utterance_records()
            self._best_cost = np.inf
            self._best_final_cost = np.inf

    def _word_results(self, olabels_with_frames) -> List[jsonout.WordResult]:
        """Build word timing entries.  Word start = frame where its olabel was
        emitted on the best path; end = next word's start frame or end of
        trailing speech run.  Times use the reference formula
        samples_round_start_/rate + (frame_offset_ + frame) * 0.03
        (recognizer.cc:457-458)."""
        out = []
        base = self.samples_round_start_ / self.model_rate
        for i, (wid, f_start, f_end, conf) in enumerate(olabels_with_frames):
            out.append(
                jsonout.WordResult(
                    self.model.words.name(wid),
                    base + (self.frame_offset_ + f_start) * self.frame_shift,
                    base + (self.frame_offset_ + f_end) * self.frame_shift,
                    conf,
                )
            )
        return out

    def _best_path_words(self, use_final: bool):
        """Traceback + word segmentation from the pdf alignment."""
        cost, ols, pdfs = self._full_traceback(use_final)
        words = self._segment_words(ols, pdfs)
        return cost, words, pdfs

    def _segment_words(self, ols_frames, pdfs):
        """ols_frames: list of (olabel, frame emitted). Produce
        (wid, start_frame, end_frame, conf) from phone word-boundary types
        when available (reference WordAlignLattice, recognizer.cc:435,752),
        else from emission frames with silence trimming."""
        sil = set(int(x) for x in self.model.silence_pdfs)
        T = len(pdfs)
        items = []
        for i, (wid, f0) in enumerate(ols_frames):
            f1 = ols_frames[i + 1][1] if i + 1 < len(ols_frames) else T
            # trim trailing silence frames inside [f0, f1)
            while f1 > f0 + 1 and pdfs[f1 - 1] in sil:
                f1 -= 1
            items.append((wid, f0, f1, 1.0))
        from .wordalign import realign_items

        return realign_items(
            items, pdfs, self.model.phone_of_pdf, self.model.word_boundary
        )

    def _lattice_paths(self, n: int, use_final: bool):
        """Prune + extract n best lattice paths with word items and
        per-word posteriors via the shared Finisher (native C++ library when
        built, Python lattice oracle otherwise).
        Returns [(cost, [(wid, f0, f1, conf)])] in utterance frames."""
        if self._folded_frames > 0 and self._prefix_lat is not None:
            out = self._spliced_lattice_paths(n, use_final)
            if not out and use_final:
                out = self._spliced_lattice_paths(n, use_final=False)
            if out:
                return out  # frames already absolute; no prefix merge
        out = self._finisher.paths(
            self._records,
            self._frontier,
            0,
            n=n,
            use_final=use_final,
            init_override=self._fold_init,
        )
        if not out and use_final:
            # no complete final-state path inside the lattice beam: fall
            # back to non-final paths, like Kaldi's "Not producing output as
            # no final-state was active" path which still returns the best
            # live token's result (reference recognizer.cc FinalResult ->
            # GetLattice(use_final_probs=false) fallback semantics)
            out = self._finisher.paths(
                self._records,
                self._frontier,
                0,
                n=n,
                use_final=False,
                init_override=self._fold_init,
            )
        return self._merge_prefix_paths(out)

    def _spliced_lattice_paths(self, n: int, use_final: bool):
        """Whole-utterance n-best/confidences across fold boundaries: the
        retained window's lattice is spliced onto the prefix lattice so
        alternatives and posteriors cover the full utterance (reference
        incremental determinization, model.h:24).  Python lattice path —
        the native fast path applies to unfolded utterances."""
        from ..graph.lattice import build_lattice, splice_lattices

        init_map: dict = {}
        try:
            win_lat, _ = build_lattice(
                self._records, self._frontier, 0, self.dec,
                use_final=use_final, init_override=self._fold_init,
                init_map_out=init_map,
            )
            pre = self._prefix_lat.copy()
            lat, _ = splice_lattices(
                pre, dict(self._prefix_slots), win_lat, init_map,
                frame_offset=self._folded_frames,
            )
        except Exception as e:
            log_warn(f"spliced lattice failed, frozen-prefix fallback: {e}")
            return []
        return self._finisher.finish_lattice(lat, n)

    def _merge_prefix_paths(self, paths):
        """Shift window-relative word frames into utterance frames and
        prepend the frozen best-path prefix (identical for every
        alternative; its words keep conf 1.0 — their posterior mass has
        collapsed to the surviving path by fold time)."""
        if self._folded_frames == 0:
            return paths
        prefix_items = [
            (wid, f0, f1, 1.0)
            for (wid, f0, f1, _c) in self._segment_words(
                self._prefix_ols, self._prefix_pdfs
            )
        ]
        off = self._folded_frames
        return [
            (
                cost,
                prefix_items
                + [(w, f0 + off, f1 + off, c) for (w, f0, f1, c) in items],
            )
            for cost, items in paths
        ]

    def get_metrics(self) -> dict:
        """Per-stage timing report (observability; SURVEY §5 greenfield)."""
        return self.metrics.report()

    def _get_result(self) -> str:
        """Reference GetResult dispatch (recognizer.cc:669-728)."""
        if self._utt_frames == 0:
            return self._store_empty()
        if self.max_alternatives_ == 0:
            with self.metrics.timer("finishing"):
                paths = self._lattice_paths(1, use_final=True)
            if not paths:
                return self._store_empty()
            words = self._word_results(paths[0][1])
            spk_vec, spk_frames = self._speaker_vector()
            return jsonout.final_result(words, self.words_, spk_vec, spk_frames)
        paths = self._lattice_paths(self.max_alternatives_, use_final=True)
        if not paths:
            return self._store_empty()
        alts = [(self._word_results(items), -cost) for cost, items in paths]
        if self.nlsml_:
            return jsonout.nlsml_result(alts)
        return jsonout.nbest_result(alts, self.words_)

    def _speaker_vector(self):
        if self.spk_model is None:
            return None, None
        from ..models.xvector import extract_xvector_for_recognizer

        return extract_xvector_for_recognizer(self)

    def _store_empty(self) -> str:
        if not self.max_alternatives_:
            self.last_result_ = '{"text": ""}'
        elif self.nlsml_:
            self.last_result_ = (
                '<?xml version="1.0"?>\n<result grammar="default">\n'
                '<interpretation confidence="1.0">\n<instance/>\n'
                "<input><noinput/></input>\n</interpretation>\n</result>\n"
            )
        else:
            self.last_result_ = '{"alternatives" : [{"text": "", "confidence" : 1.0}] }'
        return self.last_result_

    def result(self) -> str:
        """Finalize current utterance after an endpoint (vosk_api.h:234-250)."""
        if self.state != State.RUNNING:
            return self._store_empty()
        self._flush_pending(input_finished=False)
        self.state = State.ENDPOINT
        self.last_result_ = self._get_result()
        return self.last_result_

    def partial_result(self) -> str:
        if self.state != State.RUNNING:
            return jsonout.empty_partial()
        if self._utt_frames == 0:
            return jsonout.empty_partial()
        if self.partial_words_:
            # lattice path with posteriors (reference partial_words MBR path,
            # recognizer.cc:740-781)
            paths = self._lattice_paths(1, use_final=False)
            words = self._word_results(paths[0][1]) if paths else []
        else:
            _, words_items, pdfs = self._best_path_words(use_final=False)
            words = self._word_results(words_items)
        self.last_result_ = jsonout.partial_result(words, self.partial_words_)
        return self.last_result_

    def final_result(self) -> str:
        if self.state != State.RUNNING:
            return self._store_empty()
        self._flush_pending(input_finished=True)
        self.state = State.FINALIZED
        self.last_result_ = self._get_result()
        return self.last_result_

    def reset(self) -> None:
        self._store_empty()
        if getattr(self, "_resampler", None) is not None:
            self._resampler.reset()
        self.state = State.ENDPOINT
