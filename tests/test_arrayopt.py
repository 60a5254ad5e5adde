"""Array-level graph transforms (graph/arrayopt.py): decode parity.

The transforms must preserve min-plus path semantics exactly: decoding the
transformed graph gives the same best cost and the same output-label
sequence as the reference decoder on the ORIGINAL graph.
"""
import numpy as np
import pytest

from vosk_tpu.graph.arrayopt import (
    cap_degree_pred_dup,
    prepare_graph_v4,
    remove_epsilons_arrays,
)
from vosk_tpu.graph.fst import StdFst, flatten_fst
from vosk_tpu.graph.ref_decoder import ref_decode
from vosk_tpu.ops.viterbi import BatchViterbi, DecodeParams

from test_viterbi import random_fst


def _decode(graph, ll, max_active=64):
    dec = BatchViterbi(graph, DecodeParams(beam=1e9, max_active=max_active))
    frontier = dec.init_frontier(batch=1)
    frontier, recs, best, best_final = dec.decode_chunk(frontier, ll[None])
    return dec.traceback([recs], frontier, 0)


def random_fst_unlabeled_eps(seed, n_states=24, n_pdf=6, n_words=5):
    """random_fst but with olabel-0 eps arcs only (fully removable)."""
    rng = np.random.default_rng(seed)
    f = random_fst(seed, n_states, n_pdf, n_words, with_eps=False)
    for _ in range(n_states):
        s = int(rng.integers(0, n_states - 1))
        ns = int(rng.integers(s + 1, n_states))
        f.add_arc(s, 0, 0, float(rng.uniform(0.1, 1.0)), ns)
    # eps from the start state exercises init_entries
    f.add_arc(0, 0, 0, 0.25, int(rng.integers(1, n_states)))
    return f


@pytest.mark.parametrize("seed", [0, 1, 2, 5])
def test_remove_epsilons_parity(seed):
    fst = random_fst_unlabeled_eps(seed)
    g = flatten_fst(fst)
    g2 = remove_epsilons_arrays(g)
    assert g2.num_eps_arcs == 0
    assert g2.eps_depth == 0

    rng = np.random.default_rng(100 + seed)
    ll = rng.standard_normal((15, 6)).astype(np.float32) * 2
    ref_cost, ref_ols, _ = ref_decode(fst, ll)
    cost, ols, pdfs = _decode(g2, ll)
    assert cost == pytest.approx(ref_cost, rel=1e-4)
    assert ols == ref_ols
    assert len(pdfs) == 15


@pytest.mark.parametrize("seed", [0, 3])
def test_remove_epsilons_keeps_labeled(seed):
    # random_fst's eps arcs carry random olabels: some stay, targets fanned
    fst = random_fst(seed, with_eps=True)
    g = flatten_fst(fst)
    g2 = remove_epsilons_arrays(g)
    rng = np.random.default_rng(200 + seed)
    ll = rng.standard_normal((15, 6)).astype(np.float32) * 2
    ref_cost, ref_ols, _ = ref_decode(fst, ll)
    cost, ols, _ = _decode(g2, ll)
    assert cost == pytest.approx(ref_cost, rel=1e-4)
    assert ols == ref_ols


def test_pred_dup_split_diverges_low_m():
    fst = random_fst(0, with_eps=False)
    g = remove_epsilons_arrays(flatten_fst(fst))
    with pytest.raises(ValueError):
        cap_degree_pred_dup(g, 2)  # below mean out-degree: must refuse


def sparse_hub_fst(seed, n_states=40, n_pdf=6, n_words=5, hub_deg=9):
    """Mostly degree-2 chain with a few high-degree hubs — the HCLG shape
    pred-dup splitting is for (dense random graphs cascade; see
    test_pred_dup_split_diverges_low_m)."""
    rng = np.random.default_rng(seed)
    f = StdFst()
    f.add_states(n_states)
    f.set_start(0)
    for s in range(n_states - 1):
        f.add_arc(s, int(rng.integers(1, n_pdf + 1)),
                  int(rng.integers(0, n_words + 1)),
                  float(rng.uniform(0, 2)), s + 1)
        f.add_arc(s, int(rng.integers(1, n_pdf + 1)), 0,
                  float(rng.uniform(0, 0.5)), s)  # self-loop
    for hub in rng.choice(n_states - 1, 3, replace=False):
        for _ in range(hub_deg):
            f.add_arc(int(hub), int(rng.integers(1, n_pdf + 1)),
                      int(rng.integers(0, n_words + 1)),
                      float(rng.uniform(0, 2)),
                      int(rng.integers(0, n_states)))
    for s in range(n_states - 3, n_states):
        f.set_final(s, float(rng.uniform(0, 1)))
    return f


@pytest.mark.parametrize("seed", [0, 1, 4])
@pytest.mark.parametrize("M", [4, 6])
def test_pred_dup_split_parity(seed, M):
    fst = sparse_hub_fst(seed)
    g = flatten_fst(fst)
    g2 = cap_degree_pred_dup(remove_epsilons_arrays(g), M)
    assert g2.max_em_out <= M
    cnt = g2.em_off[1:] - g2.em_off[:-1]
    assert int(cnt.max()) <= M

    rng = np.random.default_rng(300 + seed)
    ll = rng.standard_normal((12, 6)).astype(np.float32) * 2
    ref_cost, ref_ols, _ = ref_decode(fst, ll)
    # split states consume extra frontier slots; keep max_active ample
    cost, ols, _ = _decode(g2, ll, max_active=128)
    assert cost == pytest.approx(ref_cost, rel=1e-4)
    assert ols == ref_ols


@pytest.mark.parametrize("seed", [0, 2, 6])
def test_prepare_graph_v4_parity(seed):
    fst = random_fst_unlabeled_eps(seed)
    g = flatten_fst(fst)
    g2 = prepare_graph_v4(g, M=4)
    assert g2.num_eps_arcs == 0  # capping may fall back on dense graphs
    rng = np.random.default_rng(400 + seed)
    ll = rng.standard_normal((15, 6)).astype(np.float32) * 2
    ref_cost, ref_ols, _ = ref_decode(fst, ll)
    cost, ols, _ = _decode(g2, ll, max_active=128)
    assert cost == pytest.approx(ref_cost, rel=1e-4)
    assert ols == ref_ols


def test_v4_on_bench_graph_shape():
    """The bench-scale generator's graph comes out eps-free with bounded
    degree and a bounded arc-count growth."""
    from vosk_tpu.utils.benchdata import make_realistic_graph

    g = make_realistic_graph(num_states=20_000, num_pdfs=128, num_words=500,
                             seed=1)
    a0 = g.num_emitting_arcs
    g2 = prepare_graph_v4(g, M=8)
    assert g2.num_eps_arcs == 0
    assert g2.max_em_out <= 8
    assert g2.num_emitting_arcs < 2.0 * a0, (g2.num_emitting_arcs, a0)
    assert g2.num_states < 1.5 * g.num_states
