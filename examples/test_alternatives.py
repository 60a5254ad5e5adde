#!/usr/bin/env python3
"""N-best alternatives — reference test_alternatives.py."""
from _common import ensure_model, example_wav

from vosk_tpu import KaldiRecognizer, Model

model = Model(ensure_model())
rec = KaldiRecognizer(model, 16000.0)
rec.SetMaxAlternatives(5)
rec.AcceptWaveform(example_wav())
print(rec.FinalResult())
