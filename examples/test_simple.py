#!/usr/bin/env python3
"""Streaming decode with partials — reference python/example/test_simple.py."""
from _common import ensure_model, example_wav

from vosk_tpu import KaldiRecognizer, Model, SetLogLevel

SetLogLevel(0)
model = Model(ensure_model())
rec = KaldiRecognizer(model, 16000.0)
rec.SetWords(True)
rec.SetPartialWords(True)

data = example_wav()
CH = 4000
for i in range(0, len(data), CH):
    if rec.AcceptWaveform(data[i:i + CH]):
        print(rec.Result())
    else:
        print(rec.PartialResult())
print(rec.FinalResult())
