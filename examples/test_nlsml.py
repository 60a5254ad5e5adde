#!/usr/bin/env python3
"""NLSML XML output — reference test_nlsml.py."""
from _common import ensure_model, example_wav

from vosk_tpu import KaldiRecognizer, Model

model = Model(ensure_model())
rec = KaldiRecognizer(model, 16000.0)
rec.SetMaxAlternatives(3)
rec.SetNLSML(True)
rec.AcceptWaveform(example_wav())
print(rec.FinalResult())
