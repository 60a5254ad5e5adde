"""Speaker identification e2e (reference python/example/test_speaker.py):
recognizer with spk model returns an x-vector + frame count; cosine distance
behaves (same audio -> distance ~0)."""
import json
import os

import numpy as np
import pytest

import vosk_tpu
from vosk_tpu.models.xvector import SpkModel, XvectorConfig, init_xvector_params
from vosk_tpu.utils import toydata

TOY_DIR = "/tmp/vosk_tpu_toy_model_v1"
SPK_DIR = "/tmp/vosk_tpu_toy_spk_v1"


@pytest.fixture(scope="module")
def model():
    if not os.path.exists(os.path.join(TOY_DIR, "vosk_tpu_model.json")):
        toydata.build_toy_model(TOY_DIR, train_steps=400)
    return vosk_tpu.Model(TOY_DIR)


@pytest.fixture(scope="module")
def spk_model():
    if not os.path.exists(os.path.join(SPK_DIR, "vosk_tpu_spk.json")):
        cfg = XvectorConfig(feat_dim=20, hidden_dim=32, embed_dim=16, num_layers=2)
        params = init_xvector_params(cfg, seed=0)
        rng = np.random.default_rng(1)
        m = SpkModel(
            cfg,
            params,
            mean=rng.standard_normal(16).astype(np.float32) * 0.1,
            transform=np.eye(16, dtype=np.float32),
        )
        m.save(SPK_DIR)
    return vosk_tpu.SpkModel(SPK_DIR)


def cosine_dist(a, b):
    a, b = np.asarray(a), np.asarray(b)
    return 1 - np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b))


def wav_bytes(words, seed):
    wav = toydata.make_test_wav(words, seed=seed)
    return np.clip(wav, -32768, 32767).astype("<i2").tobytes()


def test_spk_vector_in_result(model, spk_model):
    rec = vosk_tpu.KaldiRecognizer(model, 16000, spk_model)
    rec.AcceptWaveform(wav_bytes(["one", "two", "three", "four"], seed=60))
    res = json.loads(rec.FinalResult())
    assert "spk" in res and "spk_frames" in res
    assert len(res["spk"]) == 16
    assert res["spk_frames"] >= 50
    # length-normalized: ||v|| ~= sqrt(dim)
    norm = np.linalg.norm(res["spk"])
    assert norm == pytest.approx(np.sqrt(16), rel=0.2)


def test_spk_vector_deterministic(model, spk_model):
    out = []
    for _ in range(2):
        rec = vosk_tpu.KaldiRecognizer(model, 16000, spk_model)
        rec.AcceptWaveform(wav_bytes(["five", "six", "seven", "zero"], seed=61))
        out.append(json.loads(rec.FinalResult())["spk"])
    assert cosine_dist(out[0], out[1]) < 1e-5


def test_set_spk_model_after_init(model, spk_model):
    """vosk_recognizer_set_spk_model parity (vosk_api.h:140-146)."""
    rec = vosk_tpu.KaldiRecognizer(model, 16000)
    rec.SetSpkModel(spk_model)
    rec.AcceptWaveform(wav_bytes(["three", "five", "one", "six"], seed=62))
    res = json.loads(rec.FinalResult())
    assert "spk" in res


def test_kaldi_spk_roundtrip(spk_model, tmp_path):
    """Native spk model -> Kaldi layout (final.ext.raw/mean.vec/
    transform.mat) -> loaded back -> identical embeddings."""
    from vosk_tpu.models.xvector import SpkModel, export_kaldi_spk_model

    native = spk_model._model
    out = tmp_path / "spk_kaldi"
    export_kaldi_spk_model(native, out)
    loaded = SpkModel.load(out)
    rng = np.random.default_rng(7)
    feats = rng.standard_normal((80, native.cfg.feat_dim)).astype(np.float32)
    v1 = native.extract(feats)
    v2 = loaded.extract(feats)
    np.testing.assert_allclose(v1, v2, rtol=1e-4, atol=1e-4)


def test_short_audio_no_spk_vector(model, spk_model):
    """< MIN_SPK_FEATS nonsilence frames -> no spk output
    (reference recognizer.cc:354,387)."""
    rec = vosk_tpu.KaldiRecognizer(model, 16000, spk_model)
    rec.AcceptWaveform(wav_bytes(["one"], seed=63)[:4000])
    res = json.loads(rec.FinalResult())
    assert "spk" not in res
