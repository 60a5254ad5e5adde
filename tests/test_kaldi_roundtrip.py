"""Full Kaldi-pathway e2e: export the trained toy model to a Kaldi-layout
dir (final.mdl + HCLG.fst + confs), load it back through the Kaldi loader
(auto-detected by vosk_tpu.Model), and decode — transcripts must match the
native model."""
import json
import os

import numpy as np
import pytest

import vosk_tpu
from vosk_tpu.io import native
from vosk_tpu.io.kaldi_export import export_kaldi_dir, tdnnf_to_nnet3
from vosk_tpu.utils import toydata

TOY_DIR = "/tmp/vosk_tpu_toy_model_v1"
KALDI_DIR = "/tmp/vosk_tpu_toy_kaldi_v1"


@pytest.fixture(scope="module")
def kaldi_dir():
    if not os.path.exists(os.path.join(TOY_DIR, "vosk_tpu_model.json")):
        toydata.build_toy_model(TOY_DIR, train_steps=400)
    if not os.path.exists(os.path.join(KALDI_DIR, "am", "final.mdl")):
        export_kaldi_dir(native.load_model(TOY_DIR), KALDI_DIR)
    return KALDI_DIR


def test_nnet3_conversion_matches_tdnnf():
    """The exported nnet3 network evaluates identically to TdnnfModel."""
    m = native.load_model(TOY_DIR) if os.path.exists(
        os.path.join(TOY_DIR, "vosk_tpu_model.json")
    ) else None
    if m is None:
        toydata.build_toy_model(TOY_DIR, train_steps=400)
        m = native.load_model(TOY_DIR)
    am = m.make_am()
    net = tdnnf_to_nnet3(m.am_config, m.am_params)
    rng = np.random.default_rng(0)
    T = 40
    feats = rng.standard_normal((T, m.am_config.feat_dim)).astype(np.float32)
    want = np.asarray(am.forward(am.params, feats[None]))[0]
    got = np.asarray(net.evaluate({"input": feats}))[:: m.am_config.subsample]
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_kaldi_dir_decodes_like_native(kaldi_dir):
    texts = [["one", "five", "zero"], ["seven", "two"]]
    native_model = vosk_tpu.Model(TOY_DIR)
    kaldi_model = vosk_tpu.Model(kaldi_dir)  # auto-detected Kaldi layout
    for i, words in enumerate(texts):
        wav = toydata.make_test_wav(words, seed=200 + i)
        pcm = np.clip(wav, -32768, 32767).astype("<i2").tobytes()
        results = []
        for model in (native_model, kaldi_model):
            rec = vosk_tpu.KaldiRecognizer(model, 16000)
            rec.AcceptWaveform(pcm)
            results.append(json.loads(rec.FinalResult())["text"])
        assert results[0] == " ".join(words)
        assert results[1] == results[0], f"kaldi path diverged: {results}"


def test_kaldi_dir_batch_pipeline(kaldi_dir):
    """Kaldi-layout model through the batch pipeline (Nnet3Am batched)."""
    bm = vosk_tpu.BatchModel(kaldi_dir, max_batch_size=2)
    rec = vosk_tpu.BatchRecognizer(bm, 16000)
    wav = toydata.make_test_wav(["six", "four"], seed=210)
    rec.AcceptWaveform(np.clip(wav, -32768, 32767).astype("<i2").tobytes())
    rec.FinishStream()
    bm.Wait()
    import json as _json

    texts = []
    while True:
        r = rec.Result()
        if not r:
            break
        texts.append(_json.loads(r)["text"])
    assert "six four" in " ".join(texts)


def test_kaldi_model_find_word(kaldi_dir):
    m = vosk_tpu.Model(kaldi_dir)
    assert m.FindWord("one") > 0
    assert m.FindWord("nope") == -1
