#!/usr/bin/env python3
"""Empty-input edge case — reference test_empty.py."""
from _common import ensure_model

from vosk_tpu import KaldiRecognizer, Model

model = Model(ensure_model())
rec = KaldiRecognizer(model, 16000.0)
rec.AcceptWaveform(b"")
print(rec.FinalResult())
