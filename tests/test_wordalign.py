"""Word-boundary realignment (reference WordAlignLattice semantics) and
sausage-pooled confidences."""
import math

import numpy as np

from vosk_tpu.graph.lattice import LatArc, Lattice
from vosk_tpu.runtime.wordalign import realign_items, word_spans

# positional phone inventory: 1=SIL(nonword), 2=a_B, 3=a_I, 4=a_E, 5=b_S
WB = {1: "nonword", 2: "begin", 3: "internal", 4: "end", 5: "singleton"}
# pdf == phone for simplicity
PHONE_OF_PDF = np.arange(6, dtype=np.int32)


def test_word_spans_basic():
    #        SIL SIL a_B a_B a_I a_E SIL b_S b_S SIL
    pdfs = [1, 1, 2, 2, 3, 4, 1, 5, 5, 1]
    spans = word_spans(pdfs, PHONE_OF_PDF, WB)
    assert spans == [(2, 6), (7, 9)]


def test_word_spans_adjacent_words():
    # end followed directly by begin (no silence between words)
    pdfs = [2, 3, 4, 2, 4, 1]
    spans = word_spans(pdfs, PHONE_OF_PDF, WB)
    assert spans == [(0, 3), (3, 5)]


def test_word_spans_truncated_final_word():
    pdfs = [1, 2, 3]
    assert word_spans(pdfs, PHONE_OF_PDF, WB) == [(1, 3)]


def test_word_spans_inconsistent_returns_none():
    # internal phone with no begin
    assert word_spans([1, 3, 4], PHONE_OF_PDF, WB) is None
    # nonword inside a word
    assert word_spans([2, 1, 4], PHONE_OF_PDF, WB) is None


def test_realign_items():
    pdfs = [1, 2, 3, 4, 1, 5, 1]
    items = [(10, 0, 3, 0.9), (11, 4, 6, 0.8)]  # emission-based spans
    out = realign_items(items, pdfs, PHONE_OF_PDF, WB)
    assert out == [(10, 1, 4, 0.9), (11, 5, 6, 0.8)]
    # span count mismatch -> unchanged
    out2 = realign_items(items[:1], pdfs, PHONE_OF_PDF, WB)
    assert out2 == items[:1]
    # no word-boundary info -> unchanged
    assert realign_items(items, pdfs, PHONE_OF_PDF, None) == items


def test_sausage_pooled_confidence():
    """Two alignments of the same word must POOL their posterior into one
    confidence (Kaldi sausage-MBR semantics) instead of splitting it."""
    lat = Lattice()
    # two parallel 1-frame paths both emitting word 7 (different pdfs =
    # different alignments), then joining; costs make posts 0.6/0.4
    a = lat.add_node(1)
    b = lat.add_node(1)
    lat.add_arc(LatArc(0, a, 7, 0.0, -math.log(0.6), True, pdf=2))
    lat.add_arc(LatArc(0, b, 7, 0.0, -math.log(0.4), True, pdf=3))
    end = lat.add_node(2)
    lat.add_arc(LatArc(a, end, 0, 0.0, 0.0, True, pdf=1))
    lat.add_arc(LatArc(b, end, 0, 0.0, 0.0, True, pdf=1))
    lat.final[end] = 0.0

    post = lat.arc_posteriors()
    assert abs(post[0] - 0.6) < 1e-3 and abs(post[1] - 0.4) < 1e-3

    # pool by (olabel, anchor bin) as finishing.py does
    occ = {}
    for ai, arc in enumerate(lat.arcs):
        if arc.olabel != 0:
            occ.setdefault(arc.olabel, []).append(
                (lat.node_frame[arc.src], float(post[ai]))
            )
    conf = sum(p for (_f, p) in occ[7])
    assert abs(conf - 1.0) < 1e-3
