#!/usr/bin/env python3
"""Reset mid-stream — reference test_reset.py."""
from _common import ensure_model, example_wav

from vosk_tpu import KaldiRecognizer, Model

model = Model(ensure_model())
rec = KaldiRecognizer(model, 16000.0)
data = example_wav()
rec.AcceptWaveform(data[: len(data) // 2])
print("before reset:", rec.PartialResult())
rec.Reset()
rec.AcceptWaveform(data[len(data) // 2:])
print("after reset:", rec.FinalResult())
