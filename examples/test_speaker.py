#!/usr/bin/env python3
"""Speaker vector + cosine distance — reference test_speaker.py."""
import json

import numpy as np

from _common import ensure_model, example_wav

from vosk_tpu import KaldiRecognizer, Model, SpkModel

SPK_DIR = "/tmp/vosk_tpu_toy_spk_v1"


def ensure_spk():
    import os

    if not os.path.exists(os.path.join(SPK_DIR, "vosk_tpu_spk.json")):
        from vosk_tpu.models.xvector import (SpkModel as _SpkModel,
                                             XvectorConfig,
                                             init_xvector_params)

        cfg = XvectorConfig(feat_dim=20, hidden_dim=32, embed_dim=16,
                            num_layers=2)
        params = init_xvector_params(cfg, seed=0)
        rng = np.random.default_rng(1)
        _SpkModel(cfg, params,
                  mean=rng.standard_normal(16).astype(np.float32) * 0.1,
                  transform=np.eye(16, dtype=np.float32)).save(SPK_DIR)
    return SPK_DIR


model = Model(ensure_model())
spk = SpkModel(ensure_spk())
rec = KaldiRecognizer(model, 16000.0)
rec.SetSpkModel(spk)
rec.AcceptWaveform(example_wav())
res = json.loads(rec.FinalResult())
vec = np.asarray(res.get("spk", []))
print("x-vector dim:", vec.shape, "frames:", res.get("spk_frames"))

rec2 = KaldiRecognizer(model, 16000.0)
rec2.SetSpkModel(spk)
rec2.AcceptWaveform(example_wav(("two", "three", "zero", "four"), seed=7))
v2 = np.asarray(json.loads(rec2.FinalResult()).get("spk", []))
cos = float(np.dot(vec, v2) / (np.linalg.norm(vec) * np.linalg.norm(v2)))
print("cosine similarity to second utterance:", round(cos, 3))
