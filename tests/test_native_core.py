"""Native (C++) lattice finishing vs the Python oracle on random FSTs."""
import subprocess
from pathlib import Path

import numpy as np
import pytest

from vosk_tpu.graph.fst import flatten_fst
from vosk_tpu.graph.lattice import build_lattice
from vosk_tpu.ops.viterbi import BatchViterbi, DecodeParams
from vosk_tpu.runtime import native_lattice

from test_viterbi import random_fst

ROOT = Path(__file__).resolve().parents[1]


@pytest.fixture(scope="module", autouse=True)
def built_lib():
    if not (ROOT / "core" / "libvosk_tpu_core.so").exists():
        subprocess.run(["make", "-C", str(ROOT / "core")], check=True)
    assert native_lattice.available()


def setup_decode(seed, T=12):
    fst = random_fst(seed, n_states=18, with_eps=True)
    graph = flatten_fst(fst)
    rng = np.random.default_rng(seed + 500)
    ll = rng.standard_normal((1, T, 6)).astype(np.float32)
    dec = BatchViterbi(
        graph,
        DecodeParams(beam=1e9, max_active=64, lattice_beam=1e9),
        lattice_records=True,
    )
    fr = dec.init_frontier(1)
    fr, recs, _, _ = dec.decode_chunk(fr, ll)
    return dec, fr, [recs]


@pytest.mark.parametrize("seed", [0, 1, 2, 3, 4])
def test_native_matches_python(seed):
    dec, fr, recs = setup_decode(seed)

    native = native_lattice.nbest_native(
        recs, fr, 0, dec, [], n=5, lattice_beam=20.0, graph_scale=0.9,
    )
    assert native is not None and native

    lat, _ = build_lattice(recs, fr, 0, dec)
    lat.scale_graph(0.9)
    lat = lat.prune(20.0)
    paths = lat.nbest(40)
    # python distinct-word-sequence n-best
    seen = set()
    py = []
    for cost, path in paths:
        words = tuple(
            lat.arcs[ai].olabel for ai in path if lat.arcs[ai].olabel != 0
        )
        if words in seen or not words:
            continue
        seen.add(words)
        py.append((cost, words))
        if len(py) >= 5:
            break

    assert len(native) >= 1
    for (nc, nitems), (pc, pwords) in zip(native, py):
        assert nc == pytest.approx(pc, rel=1e-3, abs=1e-3)
        assert tuple(w for w, _, _, _ in nitems) == pwords

    # confidences within [0, 1]
    for _, items in native:
        for _, f0, f1, conf in items:
            assert 0.0 <= conf <= 1.0 + 1e-5
            assert f0 <= f1


def test_native_chunked(seed=7):
    fst = random_fst(seed, n_states=14, with_eps=True)
    graph = flatten_fst(fst)
    rng = np.random.default_rng(77)
    ll = rng.standard_normal((1, 12, 6)).astype(np.float32)
    dec = BatchViterbi(
        graph,
        DecodeParams(beam=1e9, max_active=64, lattice_beam=1e9),
        lattice_records=True,
    )
    fr = dec.init_frontier(1)
    all_recs = []
    for t0 in range(0, 12, 4):
        fr, r, _, _ = dec.decode_chunk(fr, ll[:, t0 : t0 + 4])
        all_recs.append(r)
    native = native_lattice.nbest_native(
        all_recs, fr, 0, dec, [], n=1, lattice_beam=30.0, graph_scale=1.0,
    )
    cost_tb, ols_tb, _ = dec.traceback(all_recs, fr, 0)
    assert native
    nc, nitems = native[0]
    assert [w for w, _, _, _ in nitems] == ols_tb
    assert nc == pytest.approx(cost_tb, rel=1e-3, abs=1e-3)


@pytest.mark.parametrize("seed", [0, 1, 2, 3, 4, 11, 23])
def test_native_mbr_matches_python(seed):
    """vt_lattice_mbr vs the Python MBR oracle (graph/mbr.py) on random
    lattices: identical word sequence and matching bin confidences."""
    from vosk_tpu.graph.mbr import mbr_decode

    dec, fr, recs = setup_decode(seed)
    native = native_lattice.mbr_native(
        recs, fr, 0, dec, [], lattice_beam=20.0, graph_scale=0.9,
    )
    assert native is not None
    cost_n, items_n = native

    lat, _ = build_lattice(recs, fr, 0, dec)
    lat.scale_graph(0.9)
    lat = lat.prune(20.0)
    words_p, _bins = mbr_decode(lat)
    cost_p, _ = lat.shortest()

    assert [w for w, *_ in items_n] == [w for w, *_ in words_p], (
        items_n, words_p)
    assert cost_n == pytest.approx(cost_p, abs=1e-3)
    # the two lattice BUILDERS (C++ vt_lattice_build vs python
    # build_lattice) split acoustic/graph costs with small float
    # differences at prune boundaries, so bin posteriors match to ~1e-2,
    # not ulps; the word sequence and best cost match exactly
    for (w_n, f0_n, f1_n, c_n), (w_p, c_p, tb, te) in zip(items_n, words_p):
        assert c_n == pytest.approx(c_p, abs=2e-2), (items_n, words_p)
        assert abs(f0_n - int(round(tb))) <= 1
        assert abs(f1_n - max(int(round(te)), f0_n + 1)) <= 1
