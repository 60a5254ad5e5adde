"""RNNLM rescoring: scorer determinism, mixture math, recognizer path."""
import json
import os
import shutil

import numpy as np
import pytest

import vosk_tpu
from vosk_tpu.graph.arpa import BackoffLm
from vosk_tpu.models.rnnlm import (
    MixtureLm,
    RnnlmConfig,
    RnnlmModel,
    RnnlmRescorer,
    init_rnnlm_params,
    train_rnnlm,
)
from vosk_tpu.utils import toydata

TOY_DIR = "/tmp/vosk_tpu_toy_model_v1"


def test_scorer_deterministic_and_normalized():
    cfg = RnnlmConfig(vocab_size=10)
    m = RnnlmModel(cfg, init_rnnlm_params(cfg, seed=3))
    r = RnnlmRescorer(m)
    st = r.initial_state()
    c1, st1 = r.score(st, 3)
    c2, st2 = r.score(st, 3)
    assert c1 == c2 and st1 == st2
    # proper distribution: sum over vocab of p < = 1 (softmax over V+2)
    import jax.numpy as jnp

    _, logp = m.step(m.init_hidden(), m.cfg.bos)
    assert float(jnp.exp(logp).sum()) == pytest.approx(1.0, abs=1e-4)
    # history truncation at lm_order-1
    st = r.initial_state()
    for w in (1, 2, 3, 4, 5):
        _, st = r.score(st, w)
    assert len(st) == 3


def test_training_lowers_perplexity():
    cfg = RnnlmConfig(vocab_size=9, embed_dim=8, hidden_dim=16)
    sents = [[1, 2, 3], [1, 2, 4], [2, 3, 1]] * 3
    p0 = init_rnnlm_params(cfg, seed=0)
    pt = train_rnnlm(cfg, sents, steps=150)

    def nll(params):
        m = RnnlmModel(cfg, params)
        r = RnnlmRescorer(m)
        tot = 0.0
        for s in sents[:3]:
            st = r.initial_state()
            for w in s:
                c, st = r.score(st, w)
                tot += c
            tot += r.final_cost(st)
        return tot

    assert nll(pt) < nll(p0) - 1.0


def test_mixture_lm():
    cfg = RnnlmConfig(vocab_size=10)
    m = RnnlmModel(cfg, init_rnnlm_params(cfg, seed=5))
    r1 = RnnlmRescorer(m)
    r2 = RnnlmRescorer(m)
    mix = MixtureLm([(0.5, r1), (0.5, r2)])
    st = mix.initial_state()
    c, st2 = mix.score(st, 4)
    ca, _ = r1.score(r1.initial_state(), 4)
    assert c == pytest.approx(ca)  # 0.5+0.5 of identical scorers


def test_recognizer_with_rnnlm(tmp_path):
    if not os.path.exists(os.path.join(TOY_DIR, "g.npz")):
        toydata.build_toy_model(TOY_DIR, train_steps=400)
    mdir = tmp_path / "model"
    shutil.copytree(TOY_DIR, mdir)
    words, _ = toydata.build_symbols()
    cfg = RnnlmConfig(vocab_size=len(words))
    sents = [[words.find(w) for w in ["one", "five", "zero"]]] * 4
    params = train_rnnlm(cfg, sents, steps=100)
    RnnlmModel(cfg, params).save(mdir / "rnnlm")

    model = vosk_tpu.Model(str(mdir))
    assert model._model.rnnlm is not None
    rec = vosk_tpu.KaldiRecognizer(model, 16000)
    rec.SetWords(True)
    wav = toydata.make_test_wav(["one", "five", "zero"], seed=95)
    rec.AcceptWaveform(np.clip(wav, -32768, 32767).astype("<i2").tobytes())
    res = json.loads(rec.FinalResult())
    assert res["text"] == "one five zero"
