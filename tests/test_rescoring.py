"""LM rescoring: ARPA reader, backoff scoring, lattice rescoring vs
hand-scored n-best, and the Recognizer rescoring path."""
import json
import math
import os

import numpy as np
import pytest

import vosk_tpu
from vosk_tpu.graph.arpa import LOG10, BackoffLm, FstLm
from vosk_tpu.graph.fst import SymbolTable
from vosk_tpu.utils import toydata

TOY_DIR = "/tmp/vosk_tpu_toy_model_v1"

ARPA = """\
\\data\\
ngram 1=10
ngram 2=3

\\1-grams:
-1.0 <s> -0.5
-1.2 </s>
-0.9 zero -0.3
-0.8 one -0.3
-0.9 two -0.3
-1.0 three -0.3
-1.0 four -0.3
-0.7 five -0.3
-1.1 six -0.3
-1.1 seven -0.3

\\2-grams:
-0.2 one five
-0.3 five zero
-0.4 zero three

\\end\\
"""


@pytest.fixture(scope="module")
def words():
    w, _ = toydata.build_symbols()
    return w


@pytest.fixture(scope="module")
def lm(words, tmp_path_factory):
    p = tmp_path_factory.mktemp("lm") / "lm.arpa"
    p.write_text(ARPA)
    return BackoffLm.read_arpa(p, words)


def test_arpa_scores(lm, words):
    one, five, zero = words.find("one"), words.find("five"), words.find("zero")
    st = lm.initial_state()
    # <s> one: no bigram -> backoff(<s>)=0.5 + uni(one)=0.8  (log10)
    c, st = lm.score(st, one)
    assert c == pytest.approx((0.5 + 0.8) * LOG10, rel=1e-5)
    # one five: bigram -0.2
    c, st = lm.score(st, five)
    assert c == pytest.approx(0.2 * LOG10, rel=1e-5)
    # five zero: bigram -0.3
    c, st = lm.score(st, zero)
    assert c == pytest.approx(0.3 * LOG10, rel=1e-5)
    # zero </s>: no bigram -> backoff(zero)=0.3 + uni(</s>)=1.2
    c = lm.final_cost(st)
    assert c == pytest.approx((0.3 + 1.2) * LOG10, rel=1e-5)


def test_lattice_rescoring_matches_manual(lm):
    """Rescored shortest path == min over enumerated paths of
    (cost - G(path) + arpa(path))."""
    if not os.path.exists(os.path.join(TOY_DIR, "g.npz")):
        toydata.build_toy_model(TOY_DIR, train_steps=400)
    from vosk_tpu.io import native
    from vosk_tpu.graph.lattice import build_lattice, rescore_lattice
    from vosk_tpu.models.tdnnf import TdnnfModel
    from vosk_tpu.ops.viterbi import BatchViterbi, DecodeParams

    m = native.load_model(TOY_DIR)
    assert m.g_fst is not None
    am = m.make_am()
    ex = toydata.make_extractor()
    wav = toydata.make_test_wav(["one", "five", "zero"], seed=90)
    ll = np.asarray(am(np.asarray(ex.extract(wav[None])))).astype(np.float32)
    dec = BatchViterbi(
        m.graph,
        DecodeParams(beam=m.config.beam, max_active=m.config.max_active,
                     lattice_beam=1e9),
        lattice_records=True,
    )
    fr = dec.init_frontier(1)
    fr, recs, _, _ = dec.decode_chunk(fr, ll)
    lat, _ = build_lattice([recs], fr, 0, dec)
    sub = FstLm(m.g_fst)

    # manual expectation over enumerated paths
    best_manual = math.inf
    for cost, path in lat.nbest(200):
        ws = [lat.arcs[ai].olabel for ai in path if lat.arcs[ai].olabel != 0]
        gs = sub.initial_state()
        g_tot = 0.0
        for w in ws:
            c, gs = sub.score(gs, w)
            g_tot += c
        g_tot += sub.final_cost(gs)
        ls = lm.initial_state()
        l_tot = 0.0
        for w in ws:
            c, ls = lm.score(ls, w)
            l_tot += c
        l_tot += lm.final_cost(ls)
        best_manual = min(best_manual, cost - g_tot + l_tot)

    r = rescore_lattice(lat, sub, lm)
    got, _ = r.shortest()
    assert got == pytest.approx(best_manual, rel=1e-4, abs=1e-3)


def test_recognizer_with_rescoring(tmp_path):
    """Model dir with rescore.arpa: results flow through the rescoring
    path and still decode correctly."""
    import shutil

    if not os.path.exists(os.path.join(TOY_DIR, "g.npz")):
        toydata.build_toy_model(TOY_DIR, train_steps=400)
    mdir = tmp_path / "model"
    shutil.copytree(TOY_DIR, mdir)
    (mdir / "rescore.arpa").write_text(ARPA)

    model = vosk_tpu.Model(str(mdir))
    assert model._model.rescore_lm is not None
    rec = vosk_tpu.KaldiRecognizer(model, 16000)
    rec.SetWords(True)
    wav = toydata.make_test_wav(["one", "five", "zero"], seed=91)
    rec.AcceptWaveform(np.clip(wav, -32768, 32767).astype("<i2").tobytes())
    res = json.loads(rec.FinalResult())
    assert res["text"] == "one five zero"
    for w in res.get("result", []):
        assert 0.0 < w["conf"] <= 1.0
