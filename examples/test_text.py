#!/usr/bin/env python3
"""Raw-PCM one-shot decode, text only — reference test_text.py."""
import json

from _common import ensure_model, example_wav

from vosk_tpu import KaldiRecognizer, Model

model = Model(ensure_model())
rec = KaldiRecognizer(model, 16000.0)
rec.AcceptWaveform(example_wav())
print(json.loads(rec.FinalResult())["text"])
