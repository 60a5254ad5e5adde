#!/usr/bin/env python3
"""Word timings + confidences — reference test_words.py."""
import json

from _common import ensure_model, example_wav

from vosk_tpu import KaldiRecognizer, Model

model = Model(ensure_model())
rec = KaldiRecognizer(model, 16000.0)
rec.SetWords(True)
rec.AcceptWaveform(example_wav())
res = json.loads(rec.FinalResult())
for w in res.get("result", []):
    print(f"{w['word']:10s} {w['start']:6.2f} {w['end']:6.2f} conf={w['conf']:.3f}")
print(res["text"])
