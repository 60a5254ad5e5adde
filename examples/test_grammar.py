#!/usr/bin/env python3
"""Runtime grammar (phrase list) — reference test_words.py:16 grammar mode."""
import json

from _common import ensure_model, example_wav

from vosk_tpu import KaldiRecognizer, Model

model = Model(ensure_model())
rec = KaldiRecognizer(model, 16000.0, json.dumps(["five one seven", "zero"]))
rec.AcceptWaveform(example_wav())
print(rec.FinalResult())
