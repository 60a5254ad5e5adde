"""Lattice construction, n-best, and posterior tests vs brute-force
enumeration on small FSTs."""
import numpy as np
import pytest

from vosk_tpu.graph.fst import StdFst, flatten_fst
from vosk_tpu.graph.lattice import build_lattice
from vosk_tpu.graph.ref_decoder import ref_decode
from vosk_tpu.ops.viterbi import BatchViterbi, DecodeParams

from test_viterbi import random_fst


def brute_force_paths(fst, ll, topn=50):
    """All complete em-only paths (eps-free FSTs) with total costs."""
    T = ll.shape[0]
    out = []

    def rec(state, t, cost, words):
        if t == T:
            if fst.final[state] != np.inf:
                out.append((cost + fst.final[state], tuple(words)))
            return
        for il, ol, w, ns in fst.arcs[state]:
            nw = words + ([ol] if ol else [])
            rec(ns, t + 1, cost + w - ll[t, il - 1], nw)

    rec(fst.start, 0, 0.0, [])
    out.sort(key=lambda x: x[0])
    return out[:topn]


@pytest.mark.parametrize("seed", [0, 2, 5])
def test_lattice_best_matches_viterbi(seed):
    fst = random_fst(seed, n_states=16, with_eps=True)
    graph = flatten_fst(fst)
    rng = np.random.default_rng(seed)
    ll = rng.standard_normal((10, 6)).astype(np.float32)

    dec = BatchViterbi(
        graph, DecodeParams(beam=1e9, max_active=64, lattice_beam=1e9),
        lattice_records=True,
    )
    fr = dec.init_frontier(1)
    fr, recs, _, _ = dec.decode_chunk(fr, ll[None])
    cost_tb, ols_tb, _ = dec.traceback([recs], fr, 0)

    lat, _ = build_lattice([recs], fr, 0, dec)
    best, path = lat.shortest()
    assert best == pytest.approx(cost_tb, rel=1e-4)
    words = [lat.arcs[ai].olabel for ai in path if lat.arcs[ai].olabel != 0]
    assert words == ols_tb


@pytest.mark.parametrize("seed", [1, 3])
def test_nbest_matches_bruteforce(seed):
    fst = random_fst(seed, n_states=8, n_pdf=4, with_eps=False)
    graph = flatten_fst(fst)
    rng = np.random.default_rng(seed + 50)
    T = 5
    ll = rng.standard_normal((T, 4)).astype(np.float32)

    want = brute_force_paths(fst, ll, topn=10)

    dec = BatchViterbi(
        graph, DecodeParams(beam=1e9, max_active=64, lattice_beam=1e9),
        lattice_records=True,
        lattice_budget=512,
    )
    fr = dec.init_frontier(1)
    fr, recs, _, _ = dec.decode_chunk(fr, ll[None])
    lat, _ = build_lattice([recs], fr, 0, dec)
    got = lat.nbest(10)
    assert len(got) >= min(len(want), 5)
    for (gc, path), (wc, wwords) in zip(got[:5], want[:5]):
        assert gc == pytest.approx(wc, rel=1e-3, abs=1e-3)


def test_posteriors_unambiguous():
    """Single-path FST: every arc posterior is 1."""
    f = StdFst()
    f.add_states(4)
    f.set_start(0)
    for s in range(3):
        f.add_arc(s, 1, s + 1, 0.5, s + 1)
    f.set_final(3, 0.0)
    graph = flatten_fst(f)
    ll = np.zeros((3, 1), np.float32)
    dec = BatchViterbi(
        graph, DecodeParams(beam=1e9, max_active=8, lattice_beam=1e9),
        lattice_records=True,
    )
    fr = dec.init_frontier(1)
    fr, recs, _, _ = dec.decode_chunk(fr, ll[None])
    lat, _ = build_lattice([recs], fr, 0, dec)
    lat = lat.prune(100.0)
    post = lat.arc_posteriors()
    np.testing.assert_allclose(post, 1.0, atol=1e-5)


def test_posteriors_competing_paths():
    """Two parallel paths with cost gap d: posteriors = softmax(-costs)."""
    f = StdFst()
    f.add_states(3)
    f.set_start(0)
    f.add_arc(0, 1, 1, 0.0, 1)   # word 1, cost 0
    f.add_arc(0, 2, 2, 1.0, 2)   # word 2, cost 1
    f.add_arc(1, 1, 0, 0.0, 1)
    f.add_arc(2, 2, 0, 0.0, 2)
    f.set_final(1, 0.0)
    f.set_final(2, 0.0)
    graph = flatten_fst(f)
    ll = np.zeros((2, 2), np.float32)
    dec = BatchViterbi(
        graph, DecodeParams(beam=1e9, max_active=8, lattice_beam=1e9),
        lattice_records=True,
    )
    fr = dec.init_frontier(1)
    fr, recs, _, _ = dec.decode_chunk(fr, ll[None])
    lat, _ = build_lattice([recs], fr, 0, dec)
    post = lat.arc_posteriors()
    p_hi = 1.0 / (1.0 + np.exp(-1.0))  # path cost gap 1.0
    # the word-1 arc should carry ~p_hi posterior, word-2 arc ~1-p_hi
    by_word = {}
    for a, p in zip(lat.arcs, post):
        if a.olabel:
            by_word[a.olabel] = p
    assert by_word[1] == pytest.approx(p_hi, abs=1e-4)
    assert by_word[2] == pytest.approx(1 - p_hi, abs=1e-4)


def test_chunked_lattice():
    fst = random_fst(4, n_states=12, with_eps=True)
    graph = flatten_fst(fst)
    rng = np.random.default_rng(9)
    ll = rng.standard_normal((1, 12, 6)).astype(np.float32)
    dec = BatchViterbi(
        graph, DecodeParams(beam=1e9, max_active=64, lattice_beam=1e9),
        lattice_records=True,
    )
    fr = dec.init_frontier(1)
    all_recs = []
    for t0 in range(0, 12, 4):
        fr, r, _, _ = dec.decode_chunk(fr, ll[:, t0 : t0 + 4])
        all_recs.append(r)
    cost_tb, ols_tb, _ = dec.traceback(all_recs, fr, 0)
    lat, _ = build_lattice(all_recs, fr, 0, dec)
    best, path = lat.shortest()
    assert best == pytest.approx(cost_tb, rel=1e-4)
