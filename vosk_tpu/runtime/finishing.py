"""Shared lattice finishing: records -> pruned lattice -> n-best word items
with posteriors (and optional LM rescoring).

Used by both the streaming Recognizer and the BatchPipeline so batched
streams get the same lattice-based confidences/timings as single streams
(the reference batch path converts callback lattices through the same
word-alignment + MBR code, batch_recognizer.cc:43-107)."""
from __future__ import annotations

from typing import List, Optional, Tuple


def _viterbi_spans(ols_frames, n_frames, pdfs, sil):
    """Word spans from a best-path alignment: word i runs from its anchor
    frame to the next word's anchor (or path end), trailing silence
    trimmed — the same rule finish_lattice applies to lattice paths."""
    spans = []
    for i, (_, f0) in enumerate(ols_frames):
        f1 = ols_frames[i + 1][1] if i + 1 < len(ols_frames) else n_frames
        f1 = max(f1, f0 + 1)
        while f1 > f0 + 1 and f1 - 1 < len(pdfs) and pdfs[f1 - 1] in sil:
            f1 -= 1
        spans.append((f0, f1))
    return spans


class Finisher:
    """Holds per-model rescoring caches; thread-safe for concurrent reads."""

    def __init__(self, model, dec, lattice_beam: Optional[float] = None):
        self.model = model
        self.dec = dec
        self.lattice_beam = (
            lattice_beam if lattice_beam is not None else model.config.lattice_beam
        )
        self._sub_lm = None
        self._rnn_rescorer = None

    @property
    def rescoring(self) -> bool:
        return self.model.g_fst is not None and (
            self.model.rescore_lm is not None
            or self.model.rnnlm is not None
            or getattr(self.model, "rnnlm_rescorer", None) is not None
        )

    def paths(
        self,
        records: List[dict],
        frontier,
        channel: int,
        n: int,
        use_final: bool = True,
        init_override=None,
    ) -> List[Tuple[float, List[Tuple[int, int, int, float]]]]:
        """n best paths as [(cost, [(wid, f0, f1, conf)])]; frames relative
        to the given records."""
        from . import native_lattice

        model, dec = self.model, self.dec
        # n == 1: MBR sausage decode (reference MbrResult) — native C++
        # when the library is built, Python (graph/mbr.py) otherwise.
        if (n == 1 and not self.rescoring and native_lattice.available()
                and records):
            got = native_lattice.mbr_native(
                records, frontier, channel, dec, model.silence_pdfs,
                lattice_beam=self.lattice_beam, graph_scale=0.9,
                use_final=use_final, init_override=init_override,
            )
            if got is not None and got[1]:
                cost, items = got
                # span refinement: when the MBR words equal the Viterbi
                # best path's words, realign spans from the traceback pdf
                # alignment (the reference word-aligns the lattice before
                # MBR, recognizer.cc:435)
                tcost, ols_frames, pdfs = dec.traceback_with_frames(
                    records, frontier, channel, use_final=use_final,
                    at_start=init_override is None,
                    init_states=None if init_override is None
                    else init_override[0],
                )
                if [w for w, *_ in items] == [o for o, _ in ols_frames]:
                    sil = set(int(x) for x in model.silence_pdfs)
                    spans = _viterbi_spans(ols_frames, len(pdfs), pdfs, sil)
                    items = [
                        (w, f0, f1, conf)
                        for (w, _, _, conf), (f0, f1) in zip(items, spans)
                    ]
                    if model.word_boundary:
                        from .wordalign import realign_items

                        items = realign_items(
                            items, pdfs, model.phone_of_pdf,
                            model.word_boundary,
                        )
                return [(cost, list(items))]
        # n > 1 alternatives: native n-best fast path (NbestResult
        # semantics — per-path confidences)
        if (n > 1 and not self.rescoring and native_lattice.available()
                and records):
            out = native_lattice.nbest_native(
                records,
                frontier,
                channel,
                dec,
                model.silence_pdfs,
                n=n,
                lattice_beam=self.lattice_beam,
                graph_scale=0.9,
                use_final=use_final,
                distinct=n > 1,
                init_override=init_override,
            )
            if out:
                return out
        from ..graph.lattice import build_lattice

        lat, _ = build_lattice(
            records, frontier, channel, dec, use_final=use_final,
            init_override=init_override,
        )
        return self.finish_lattice(lat, n)

    def _finish_mbr(self, lat):
        """One-best items via MBR sausage decoding on the pruned lattice.

        Words and confidences come from the sausage bins (the MBR
        hypothesis, which may differ from the lattice best path — that is
        the point of MBR decoding).  Spans: when the MBR words coincide
        with the best path's words, keep the Viterbi spans + word-boundary
        realignment (the reference word-aligns the lattice BEFORE MBR,
        recognizer.cc:435, so its MBR times are boundary-exact too);
        otherwise fall back to the sausage's expected times."""
        from ..graph.mbr import mbr_decode

        model = self.model
        words = mbr_decode(lat)[0]
        if not words:
            return None
        best_cost, best_path = lat.shortest()
        path_items = None
        if best_path and [w for w, _, _, _ in words] == [
            lat.arcs[ai].olabel for ai in best_path if lat.arcs[ai].olabel
        ]:
            raw = lat.path_words(best_path)
            pdfs = [lat.arcs[ai].pdf for ai in best_path if lat.arcs[ai].is_frame]
            sil = set(int(x) for x in model.silence_pdfs)
            path_items = []
            for wid, f0, f1 in raw:
                while f1 > f0 + 1 and f1 - 1 < len(pdfs) and pdfs[f1 - 1] in sil:
                    f1 -= 1
                path_items.append((wid, f0, f1, 1.0))
            if model.word_boundary:
                from .wordalign import realign_items

                path_items = realign_items(
                    path_items, pdfs, model.phone_of_pdf,
                    model.word_boundary,
                )
        items = []
        for i, (wid, conf, tb, te) in enumerate(words):
            if path_items is not None:
                _, f0, f1, _ = path_items[i]
            else:
                f0 = int(round(tb))
                f1 = max(int(round(te)), f0 + 1)
            items.append((wid, f0, f1, float(min(conf, 1.0))))
        return [(best_cost, items)]

    def finish_lattice(
        self, lat, n: int
    ) -> List[Tuple[float, List[Tuple[int, int, int, float]]]]:
        """Rescore/prune/extract n-best word items from a built lattice
        (also the entry point for spliced whole-utterance lattices from the
        windowed-fold path, runtime/recognizer.py)."""
        from ..graph.lattice import rescore_lattice

        model = self.model
        if self.rescoring:
            # big-LM rescoring: subtract the graph's G, add the ARPA LM
            # and/or the RNNLM 0.5/0.5 mixture (reference recognizer.cc:680-705)
            from ..graph.arpa import FstLm

            if self._sub_lm is None and model.g_fst is not None:
                self._sub_lm = FstLm(model.g_fst)
            add_lm = model.rescore_lm
            kaldi_rnn = getattr(model, "rnnlm_rescorer", None)
            if model.rnnlm is not None or kaldi_rnn is not None:
                from ..models.rnnlm import MixtureLm, RnnlmRescorer

                if self._rnn_rescorer is None:
                    self._rnn_rescorer = (
                        kaldi_rnn
                        if kaldi_rnn is not None
                        else RnnlmRescorer(model.rnnlm)
                    )
                if add_lm is not None:
                    add_lm = MixtureLm([(0.5, add_lm), (0.5, self._rnn_rescorer)])
                else:
                    add_lm = self._rnn_rescorer
            lat = rescore_lattice(lat, self._sub_lm, add_lm)
            if self._rnn_rescorer is not None:
                self._rnn_rescorer.clear()
        # reference applies GraphLatticeScale(0.9) before result extraction
        lat.scale_graph(0.9)
        lat = lat.prune(self.lattice_beam)
        if n == 1:
            # no-alternatives path: true MBR sausage decode, the reference's
            # MbrResult mechanism (recognizer.cc:440-444, Kaldi
            # lat/sausages.cc) — words/confidences from the sausage bins
            out = self._finish_mbr(lat)
            if out is not None:
                return out
        post = lat.arc_posteriors()
        # sausage-style confidence pool: all word-arc occurrences by label
        # with their time anchors, so competing alignments of the same word
        # MERGE into one bin posterior (the role of Kaldi's MBR sausages,
        # recognizer.cc:440-444; split alignments otherwise under-report)
        occ: dict = {}
        for ai, a in enumerate(lat.arcs):
            if a.olabel != 0:
                occ.setdefault(a.olabel, []).append(
                    (lat.node_frame[a.src], float(post[ai]))
                )
        out = []
        seen_texts = set()
        sil = set(int(x) for x in model.silence_pdfs)
        for cost, path in lat.nbest(4 * n + 8):
            if len(out) >= n:
                break
            pdfs = [lat.arcs[ai].pdf for ai in path if lat.arcs[ai].is_frame]
            raw = lat.path_words(path)
            text_key = tuple(w for w, _, _ in raw)
            if n > 1 and text_key in seen_texts:
                continue  # distinct lattice paths can share a word sequence
            seen_texts.add(text_key)
            items = []
            for wid, f0, f1 in raw:
                while f1 > f0 + 1 and f1 - 1 < len(pdfs) and pdfs[f1 - 1] in sil:
                    f1 -= 1
                items.append((wid, f0, f1, 1.0))
            # word-boundary realignment (reference WordAlignLattice,
            # recognizer.cc:435): exact spans from phone boundary types
            from .wordalign import realign_items

            items = realign_items(
                items, pdfs, model.phone_of_pdf, model.word_boundary
            )
            # bin boundaries at midpoints between adjacent path word anchors
            anchors = []
            for ai in path:
                a = lat.arcs[ai]
                if a.olabel != 0:
                    anchors.append(lat.node_frame[a.src])
            for wi, (wid, f0, f1, _c) in enumerate(items):
                lo = (
                    -1e9 if wi == 0 else (anchors[wi - 1] + anchors[wi]) / 2.0
                )
                hi = (
                    1e9
                    if wi + 1 >= len(anchors)
                    else (anchors[wi] + anchors[wi + 1]) / 2.0
                )
                conf = sum(p for (f, p) in occ.get(wid, ()) if lo <= f < hi)
                items[wi] = (wid, f0, f1, min(1.0, conf))
            out.append((cost, items))
        return out
