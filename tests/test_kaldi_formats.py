"""Kaldi format matrix: binary const-ARPA (G.carpa) and split-graph
(HCLr.fst/Gr.fst/disambig_tid.int) model dirs.

Covers what the reference loads at model.cc:278-314: split graphs composed
at recognizer.cc:33 and the CARPA rescoring pair.  The byte-layout
documentation lives in vosk_tpu/io/kaldi_carpa.py.
"""
import json
import os
import shutil

import numpy as np
import pytest

import vosk_tpu
from vosk_tpu.graph.arpa import BackoffLm
from vosk_tpu.io.kaldi_carpa import (
    ConstArpaLm,
    build_carpa_from_arpa,
    read_carpa,
    write_carpa,
)
from vosk_tpu.utils import toydata

TOY_DIR = "/tmp/vosk_tpu_toy_model_v1"

ARPA = """\
\\data\\
ngram 1=6
ngram 2=5

\\1-grams:
-1.2041200\t<s>\t-0.3010300
-0.6989700\tone\t-0.1760913
-0.7781513\ttwo\t-0.2218487
-0.9030900\tthree\t0.0000000
-1.0000000\tsix\t0.0000000
-0.9542425\t</s>

\\2-grams:
-0.3010300\t<s> one
-0.4771213\tone two
-0.6020600\ttwo three
-0.3979400\tone six
-0.5228787\ttwo </s>

\\end\\
"""


@pytest.fixture(scope="module")
def model_dir():
    if not os.path.exists(os.path.join(TOY_DIR, "vosk_tpu_model.json")):
        toydata.build_toy_model(TOY_DIR, train_steps=400)
    return TOY_DIR


@pytest.fixture(scope="module")
def words():
    w, _ = toydata.build_symbols()
    w.add("<s>")
    w.add("</s>")
    return w


def test_carpa_build_and_roundtrip(tmp_path, words):
    arpa = tmp_path / "lm.arpa"
    arpa.write_text(ARPA)
    carpa = build_carpa_from_arpa(arpa, words)
    path = tmp_path / "G.carpa"
    write_carpa(carpa, path)
    # binary marker + token at fixed offsets (layout documented in module)
    raw = path.read_bytes()
    assert raw[:2] == b"\x00B"
    assert raw[2:16] == b"<ConstArpaLm> "
    got = read_carpa(path)
    assert got.order == 2
    assert got.bos == carpa.bos and got.eos == carpa.eos
    np.testing.assert_array_equal(got.lm_states, carpa.lm_states)
    np.testing.assert_array_equal(got.unigram_states, carpa.unigram_states)


def test_carpa_scores_match_text_arpa(tmp_path, words):
    """ConstArpaLm must score identically to the text-ARPA BackoffLm on
    in-vocabulary sequences (same backoff semantics, -ln costs)."""
    arpa = tmp_path / "lm.arpa"
    arpa.write_text(ARPA)
    carpa = build_carpa_from_arpa(arpa, words)
    ref = BackoffLm.read_arpa(arpa, words)

    for seq in (["one", "two", "three"], ["two", "three", "six"],
                ["six", "one", "two"], ["three", "three"]):
        ids = [words.find(w) for w in seq]
        sc, sr = carpa.initial_state(), ref.initial_state()
        for wid in ids:
            c1, sc = carpa.score(sc, wid)
            c2, sr = ref.score(sr, wid)
            assert abs(c1 - c2) < 1e-4, (seq, wid, c1, c2)
        assert abs(carpa.final_cost(sc) - ref.final_cost(sr)) < 1e-4


def test_carpa_rejects_garbage(tmp_path):
    p = tmp_path / "bad.carpa"
    p.write_bytes(b"\x00B<NotCarpa> junk")
    with pytest.raises(Exception):
        read_carpa(p)


def _decode(model, wav):
    rec = vosk_tpu.KaldiRecognizer(model, 16000)
    rec.AcceptWaveform(np.clip(wav, -32768, 32767).astype("<i2").tobytes())
    return json.loads(rec.FinalResult())["text"]


def test_split_graph_decode_matches_hclg(model_dir, tmp_path):
    """A split-graph (HCLr/Gr) export must decode the same words as the
    HCLG export of the same model."""
    from vosk_tpu.io.kaldi_export import export_kaldi_dir, export_kaldi_split_dir

    native = vosk_tpu.Model(model_dir)
    hclg_dir = tmp_path / "kaldi_hclg"
    split_dir = tmp_path / "kaldi_split"
    export_kaldi_dir(native._model, hclg_dir)
    export_kaldi_split_dir(native._model, split_dir)
    assert (split_dir / "graph" / "HCLr.fst").exists()
    assert (split_dir / "graph" / "Gr.fst").exists()
    assert not (split_dir / "graph" / "HCLG.fst").exists()

    wav = toydata.make_test_wav(["one", "six", "two"], seed=11)
    m1 = vosk_tpu.Model(str(hclg_dir))
    m2 = vosk_tpu.Model(str(split_dir))
    t1 = _decode(m1, wav)
    t2 = _decode(m2, wav)
    assert t1 == t2
    assert t1  # must actually decode words


def test_split_graph_runtime_grammar(model_dir, tmp_path):
    """Runtime phrase-list grammars on split-graph models (the reference
    recomposes HCLr with an estimated G, recognizer.cc:60-95)."""
    from vosk_tpu.io.kaldi_export import export_kaldi_split_dir

    native = vosk_tpu.Model(model_dir)
    split_dir = tmp_path / "kaldi_split"
    export_kaldi_split_dir(native._model, split_dir)
    m = vosk_tpu.Model(str(split_dir))

    wav = toydata.make_test_wav(["one", "six"], seed=11)
    rec = vosk_tpu.KaldiRecognizer(m, 16000, '["one six", "three"]')
    rec.AcceptWaveform(np.clip(wav, -32768, 32767).astype("<i2").tobytes())
    text = json.loads(rec.FinalResult())["text"]
    assert set(text.split()) <= {"one", "six", "three"}
    assert text  # constrained decode still yields words


def test_carpa_rescoring_end_to_end(model_dir, tmp_path, words):
    """rescore/G.carpa + rescore/G.fst in a Kaldi dir feed the lattice
    rescoring path (reference recognizer.cc:680-693)."""
    from vosk_tpu.io.kaldi_export import export_kaldi_dir

    native = vosk_tpu.Model(model_dir)
    kdir = tmp_path / "kaldi_rescore"
    export_kaldi_dir(native._model, kdir)
    (kdir / "rescore").mkdir()
    arpa = tmp_path / "lm.arpa"
    arpa.write_text(ARPA)
    write_carpa(build_carpa_from_arpa(arpa, words), kdir / "rescore" / "G.carpa")

    m = vosk_tpu.Model(str(kdir))
    assert m._model.rescore_lm is not None
    wav = toydata.make_test_wav(["one", "six"], seed=11)
    text = _decode(m, wav)
    assert text  # rescored decode produces output
