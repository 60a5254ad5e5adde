"""v4 frame step (eps-free single-phase, packed records) vs v3 and the
reference decoder."""
import numpy as np
import pytest

from vosk_tpu.graph.arrayopt import prepare_graph_v4
from vosk_tpu.graph.fst import flatten_fst
from vosk_tpu.graph.ref_decoder import ref_decode
from vosk_tpu.ops.viterbi import BatchViterbi, DecodeParams

from test_arrayopt import random_fst_unlabeled_eps, sparse_hub_fst


def _mk(seed, hub=False):
    fst = sparse_hub_fst(seed) if hub else random_fst_unlabeled_eps(seed)
    g = prepare_graph_v4(flatten_fst(fst), M=4)
    return fst, g


@pytest.mark.parametrize("seed", [0, 1, 2, 5])
@pytest.mark.parametrize("pack", ["exact3", "packed16"])
def test_v4_matches_reference(seed, pack):
    fst, g = _mk(seed)
    rng = np.random.default_rng(50 + seed)
    T = 15
    ll = rng.standard_normal((T, 6)).astype(np.float32) * 2
    ref_cost, ref_ols, _ = ref_decode(fst, ll)

    dec = BatchViterbi(
        g, DecodeParams(beam=1e9, max_active=128),
        frame_step="v4", pack=pack, padded_max_out=64,
    )
    frontier = dec.init_frontier(batch=2)
    ll_b = np.stack([ll, ll])
    frontier, recs, best, best_final = dec.decode_chunk(frontier, ll_b)
    assert recs["pm"].shape[:2] == (T, 2)  # scan-native [T, B, K]
    for ch in range(2):
        cost, ols, pdfs = dec.traceback([recs], frontier, ch)
        rel = 1e-4 if pack == "exact3" else 3e-3  # f16 graph weights
        assert cost == pytest.approx(ref_cost, rel=rel), f"seed={seed}"
        assert ols == ref_ols, f"seed={seed}"
        assert len(pdfs) == T


@pytest.mark.parametrize("seed", [0, 3])
def test_v4_matches_v3_pruned(seed):
    """With real pruning (small max_active/beam) v4 must match v3 exactly
    on the SAME prepared graph with the exact pack."""
    _, g = _mk(seed, hub=True)
    rng = np.random.default_rng(70 + seed)
    T = 20
    ll = rng.standard_normal((2, T, 6)).astype(np.float32) * 2
    params = DecodeParams(beam=8.0, max_active=12)

    d3 = BatchViterbi(g, params, frame_step="v3", lattice_records=True,
                      padded_max_out=64, layout="padded")
    f3 = d3.init_frontier(2)
    f3, r3, b3, bf3 = d3.decode_chunk(f3, ll)

    d4 = BatchViterbi(g, params, frame_step="v4", pack="exact3",
                      lattice_records=True, padded_max_out=64)
    f4 = d4.init_frontier(2)
    f4, r4, b4, bf4 = d4.decode_chunk(f4, ll)

    np.testing.assert_allclose(np.asarray(b3), np.asarray(b4), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(bf3), np.asarray(bf4), rtol=1e-6)
    for ch in range(2):
        c3, o3, p3 = d3.traceback([r3], f3, ch)
        c4, o4, p4 = d4.traceback([r4], f4, ch)
        assert c3 == pytest.approx(c4, rel=1e-6)
        assert o3 == o4
        assert p3 == p4


def test_v4_chunked_and_masked_frames():
    _, g = _mk(4)
    rng = np.random.default_rng(99)
    T = 18
    ll = rng.standard_normal((1, T, 6)).astype(np.float32)
    dec = BatchViterbi(g, DecodeParams(beam=1e9, max_active=64),
                       frame_step="v4", padded_max_out=64)
    f1 = dec.init_frontier(1)
    f1, recs1, _, _ = dec.decode_chunk(f1, ll)
    c1, o1, p1 = dec.traceback([recs1], f1, 0)

    # same decode in chunks of 5 with two trailing masked (invalid) frames
    f2 = dec.init_frontier(1)
    all_recs = []
    for t0 in range(0, T, 5):
        chunk = ll[:, t0 : t0 + 5]
        pad = 5 - chunk.shape[1] + 2
        chunk = np.concatenate(
            [chunk, np.zeros((1, pad, 6), np.float32)], axis=1
        )
        valid = np.zeros((1, chunk.shape[1]), bool)
        valid[:, : min(5, T - t0)] = True
        f2, r, _, _ = dec.decode_chunk(f2, chunk, valid)
        all_recs.append(r)
    c2, o2, p2 = dec.traceback(all_recs, f2, 0)
    assert c1 == pytest.approx(c2, rel=1e-5)
    assert o1 == o2
    assert p1 == p2


def test_v4_lattice_adapter_matches_v3():
    """build_lattice over convert_v4_records == build_lattice over v3
    records (same prepared graph, exact pack, real pruning)."""
    from vosk_tpu.graph.lattice import build_lattice, convert_v4_records

    _, g = _mk(2, hub=True)
    rng = np.random.default_rng(123)
    T = 16
    ll = rng.standard_normal((1, T, 6)).astype(np.float32) * 2
    params = DecodeParams(beam=9.0, max_active=16, lattice_beam=6.0)

    d3 = BatchViterbi(g, params, frame_step="v3", lattice_records=True,
                      padded_max_out=64, layout="padded")
    f3 = d3.init_frontier(1)
    f3, r3, _, _ = d3.decode_chunk(f3, ll)
    lat3, _ = build_lattice([r3], f3, 0, d3)

    d4 = BatchViterbi(g, params, frame_step="v4", pack="exact3",
                      lattice_records=True, padded_max_out=64)
    f4 = d4.init_frontier(1)
    f4, r4, _, _ = d4.decode_chunk(f4, ll)
    conv = convert_v4_records(d4, [r4], 0)
    lat4, _ = build_lattice(conv, f4, 0, d4)

    c3, p3 = lat3.shortest()
    c4, p4 = lat4.shortest()
    assert c4 == pytest.approx(c3, rel=1e-5)
    w3 = [w for w, _, _ in lat3.path_words(p3)]
    w4 = [w for w, _, _ in lat4.path_words(p4)]
    assert w3 == w4
    nb3 = lat3.nbest(3)
    nb4 = lat4.nbest(3)
    assert len(nb3) == len(nb4)
    for (ca, _), (cb, _) in zip(nb3, nb4):
        assert cb == pytest.approx(ca, rel=1e-5)


def test_v4_lattice_multichannel():
    """build_lattice fed RAW (unconverted) v4 records must produce each
    channel's own lattice — incl. FINAL COSTS read from that channel's
    frontier row, not stream 0's (the BatchPipeline.finalize path passes
    channels up to B-1 straight into build_lattice)."""
    from vosk_tpu.graph.lattice import build_lattice

    _, g = _mk(3, hub=True)
    rng = np.random.default_rng(321)
    B, T = 3, 14
    # different audio per channel -> different lattices and finals
    ll = rng.standard_normal((B, T, 6)).astype(np.float32) * 2
    params = DecodeParams(beam=9.0, max_active=16, lattice_beam=6.0)

    d4 = BatchViterbi(g, params, frame_step="v4", pack="exact3",
                      lattice_records=True, padded_max_out=64)
    f4 = d4.init_frontier(B)
    f4, r4, _, _ = d4.decode_chunk(f4, ll)

    d3 = BatchViterbi(g, params, frame_step="v3", lattice_records=True,
                      padded_max_out=64, layout="padded")
    for ch in range(B):
        lat4, _ = build_lattice([r4], f4, ch, d4)  # raw records: ch>0 path
        # per-channel v3 oracle decoded alone (batch of 1)
        f3 = d3.init_frontier(1)
        f3, r3, _, _ = d3.decode_chunk(f3, ll[ch : ch + 1])
        lat3, _ = build_lattice([r3], f3, 0, d3)
        c4, p4 = lat4.shortest()
        c3, p3 = lat3.shortest()
        assert c4 == pytest.approx(c3, rel=1e-5), f"ch={ch}"
        w4 = [w for w, _, _ in lat4.path_words(p4)]
        w3 = [w for w, _, _ in lat3.path_words(p3)]
        assert w4 == w3, f"ch={ch}"
        # final-cost isolation: this channel must have reachable finals of
        # its own (shortest() above already proves end-to-end reachability)
        assert np.isfinite(lat4.final).any(), f"ch={ch}"


def test_v4_ragged_matches_full():
    """Live-prefix bucketed expansion (ragged) must be BIT-exact vs the
    plain v4 step: frontier, best costs, and every record plane."""
    import jax
    from vosk_tpu.utils.benchdata import make_bench_graph

    g = make_bench_graph(num_states=20_000, num_pdfs=64, num_words=500,
                         eps_fraction=0.0, seed=7)
    params = DecodeParams(beam=10.0, max_active=2048, lattice_beam=6.0)
    B, T = 16, 10
    rng = np.random.default_rng(11)
    # low-noise loglikes so live counts vary sharply per channel: some
    # channels get confident (few live), some uniform (many live)
    ll = rng.standard_normal((B, T, 64)).astype(np.float32)
    ll[: B // 2] *= 6.0  # confident channels -> few live tokens

    d_full = BatchViterbi(g, params, frame_step="v4", pack="packed16",
                          lattice_records=True, ragged=False)
    d_rag = BatchViterbi(g, params, frame_step="v4", pack="packed16",
                         lattice_records=True, ragged=True)
    assert d_rag._ragged_G(B) > 1, "ragged path must be active in this test"

    f1, r1, b1, bf1 = d_full.decode_chunk(d_full.init_frontier(B), ll)
    f2, r2, b2, bf2 = d_rag.decode_chunk(d_rag.init_frontier(B), ll)

    np.testing.assert_array_equal(np.asarray(b1), np.asarray(b2))
    np.testing.assert_array_equal(np.asarray(bf1), np.asarray(bf2))
    for k in f1:
        np.testing.assert_array_equal(np.asarray(f1[k]), np.asarray(f2[k]),
                                      err_msg=f"frontier[{k}]")
    assert set(r1) == set(r2)
    for k in r1:
        np.testing.assert_array_equal(np.asarray(r1[k]), np.asarray(r2[k]),
                                      err_msg=f"records[{k}]")


def test_v4_ragged_unrolled_matches_scan():
    """The unrolled channel-group variant (concurrent group scheduling)
    must be BIT-exact vs the lax.scan ragged step."""
    from vosk_tpu.utils.benchdata import make_bench_graph

    g = make_bench_graph(num_states=20_000, num_pdfs=64, num_words=500,
                         eps_fraction=0.0, seed=7)
    params = DecodeParams(beam=10.0, max_active=2048, lattice_beam=6.0)
    B, T = 16, 8
    rng = np.random.default_rng(13)
    ll = rng.standard_normal((B, T, 64)).astype(np.float32)
    ll[: B // 2] *= 6.0

    d_scan = BatchViterbi(g, params, frame_step="v4", pack="packed16",
                          lattice_records=True, ragged=True)
    d_unr = BatchViterbi(g, params, frame_step="v4", pack="packed16",
                         lattice_records=True, ragged=True)
    d_unr.ragged_unroll = True
    assert d_scan._ragged_G(B) > 1

    f1, r1, b1, bf1 = d_scan.decode_chunk(d_scan.init_frontier(B), ll)
    f2, r2, b2, bf2 = d_unr.decode_chunk(d_unr.init_frontier(B), ll)
    np.testing.assert_array_equal(np.asarray(b1), np.asarray(b2))
    np.testing.assert_array_equal(np.asarray(bf1), np.asarray(bf2))
    for k in f1:
        np.testing.assert_array_equal(np.asarray(f1[k]), np.asarray(f2[k]),
                                      err_msg=f"frontier[{k}]")
    for k in r1:
        np.testing.assert_array_equal(np.asarray(r1[k]), np.asarray(r2[k]),
                                      err_msg=f"records[{k}]")
