"""Token-passing kernel vs exact numpy Viterbi on random small FSTs."""
import numpy as np
import pytest

from vosk_tpu.graph.fst import StdFst, flatten_fst
from vosk_tpu.graph.ref_decoder import ref_decode
from vosk_tpu.ops.viterbi import BatchViterbi, DecodeParams


def random_fst(seed, n_states=24, n_pdf=6, n_words=5, with_eps=True):
    """Random connected FST. Epsilon arcs restricted to (s%3,ns%3) in
    {(0,1),(1,2)}, ns>s, so closure depth <= 2 and no eps cycles."""
    rng = np.random.default_rng(seed)
    f = StdFst()
    f.add_states(n_states)
    f.set_start(0)
    # spine to keep everything reachable
    for s in range(n_states - 1):
        f.add_arc(s, int(rng.integers(1, n_pdf + 1)), int(rng.integers(0, n_words + 1)),
                  float(rng.uniform(0, 2)), s + 1)
    # random extra emitting arcs
    for _ in range(n_states * 2):
        s = int(rng.integers(0, n_states))
        ns = int(rng.integers(0, n_states))
        f.add_arc(s, int(rng.integers(1, n_pdf + 1)), int(rng.integers(0, n_words + 1)),
                  float(rng.uniform(0, 2)), ns)
    if with_eps:
        for _ in range(n_states):
            s = int(rng.integers(0, n_states - 1))
            ns = int(rng.integers(s + 1, n_states))
            if (s % 3, ns % 3) in ((0, 1), (1, 2)):
                f.add_arc(s, 0, int(rng.integers(0, n_words + 1)),
                          float(rng.uniform(0.1, 1.0)), ns)
    # several final states
    for s in range(n_states - 3, n_states):
        f.set_final(s, float(rng.uniform(0, 1)))
    return f


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
@pytest.mark.parametrize("with_eps", [False, True])
@pytest.mark.parametrize("dedup", ["sort", "scatter"])
def test_exact_match_no_pruning(seed, with_eps, dedup):
    n_pdf = 6
    fst = random_fst(seed, with_eps=with_eps)
    graph = flatten_fst(fst)
    rng = np.random.default_rng(100 + seed)
    T = 15
    ll = rng.standard_normal((T, n_pdf)).astype(np.float32) * 2

    ref_cost, ref_ols, _ = ref_decode(fst, ll)

    dec = BatchViterbi(graph, DecodeParams(beam=1e9, max_active=64), dedup=dedup)
    frontier = dec.init_frontier(batch=2)
    ll_b = np.stack([ll, ll])  # two identical channels
    frontier, recs, best, best_final = dec.decode_chunk(frontier, ll_b)
    for ch in range(2):
        cost, ols, pdfs = dec.traceback([recs], frontier, ch)
        assert cost == pytest.approx(ref_cost, rel=1e-4), f"seed={seed}"
        assert ols == ref_ols, f"seed={seed} got={ols} want={ref_ols}"
        assert len(pdfs) == T


def test_chunked_equals_single_shot():
    n_pdf = 6
    fst = random_fst(7)
    graph = flatten_fst(fst)
    rng = np.random.default_rng(42)
    T = 20
    ll = rng.standard_normal((1, T, n_pdf)).astype(np.float32)

    dec = BatchViterbi(graph, DecodeParams(beam=1e9, max_active=64))
    f1 = dec.init_frontier(1)
    f1, recs1, _, _ = dec.decode_chunk(f1, ll)
    c1, o1, p1 = dec.traceback([recs1], f1, 0)

    f2 = dec.init_frontier(1)
    all_recs = []
    for t0 in range(0, T, 5):
        f2, r, _, _ = dec.decode_chunk(f2, ll[:, t0 : t0 + 5])
        all_recs.append(r)
    c2, o2, p2 = dec.traceback(all_recs, f2, 0)
    assert c1 == pytest.approx(c2, rel=1e-5)
    assert o1 == o2
    assert p1 == p2


def test_invalid_frames_passthrough():
    n_pdf = 6
    fst = random_fst(9)
    graph = flatten_fst(fst)
    rng = np.random.default_rng(5)
    T = 12
    ll = rng.standard_normal((1, T, n_pdf)).astype(np.float32)

    dec = BatchViterbi(graph, DecodeParams(beam=1e9, max_active=64))
    f1 = dec.init_frontier(1)
    f1, r1, _, _ = dec.decode_chunk(f1, ll)
    c1, o1, p1 = dec.traceback([r1], f1, 0)

    # same frames but interleaved with invalid padding frames
    ll_pad = np.zeros((1, T * 2, n_pdf), np.float32)
    valid = np.zeros((1, T * 2), bool)
    ll_pad[0, ::2] = ll[0]
    valid[0, ::2] = True
    f2 = dec.init_frontier(1)
    f2, r2, _, _ = dec.decode_chunk(f2, ll_pad, valid)
    c2, o2, p2 = dec.traceback([r2], f2, 0)
    assert c1 == pytest.approx(c2, rel=1e-5)
    assert o1 == o2
    assert p1 == p2


def test_tight_beam_still_valid():
    """With pruning the cost can only get worse, and traceback still works."""
    n_pdf = 6
    fst = random_fst(11)
    graph = flatten_fst(fst)
    rng = np.random.default_rng(13)
    ll = rng.standard_normal((1, 18, n_pdf)).astype(np.float32)
    ref_cost, _, _ = ref_decode(fst, ll[0])

    dec = BatchViterbi(graph, DecodeParams(beam=4.0, max_active=8))
    f = dec.init_frontier(1)
    f, r, best, bestf = dec.decode_chunk(f, ll)
    cost, ols, pdfs = dec.traceback([r], f, 0)
    assert cost >= ref_cost - 1e-5
    assert len(pdfs) == 18
