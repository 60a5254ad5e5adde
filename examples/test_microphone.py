#!/usr/bin/env python3
"""Live microphone decode — reference test_microphone.py.

Needs the `sounddevice` package and an input device; falls back to the
synthesized example when neither exists (this build image has no audio)."""
import json
import queue
import sys

from _common import ensure_model, example_wav

from vosk_tpu import KaldiRecognizer, Model

model = Model(ensure_model())
rec = KaldiRecognizer(model, 16000.0)

try:
    import sounddevice as sd
except ImportError:
    sd = None

if sd is None:
    print("(no sounddevice; decoding the synthesized example instead)")
    rec.AcceptWaveform(example_wav())
    print(rec.FinalResult())
    sys.exit(0)

q: "queue.Queue[bytes]" = queue.Queue()


def cb(indata, frames, t, status):
    q.put(bytes(indata))


with sd.RawInputStream(samplerate=16000, blocksize=3200, dtype="int16",
                       channels=1, callback=cb):
    print("listening (ctrl-c to stop)")
    try:
        while True:
            if rec.AcceptWaveform(q.get()):
                print(json.loads(rec.Result())["text"])
    except KeyboardInterrupt:
        print(rec.FinalResult())
