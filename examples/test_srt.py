#!/usr/bin/env python3
"""SRT subtitle output via the transcriber — reference test_srt.py."""
import io
import os
import tempfile
import wave

from _common import ensure_model, example_wav

import argparse

from vosk_tpu.transcriber.transcriber import Transcriber

with tempfile.TemporaryDirectory() as td:
    wav_path = os.path.join(td, "in.wav")
    with wave.open(wav_path, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(16000)
        wf.writeframes(example_wav())
    out = os.path.join(td, "out.srt")
    args = argparse.Namespace(
        model=ensure_model(), model_name=None, lang=None, server=None,
        output_type="srt", tasks=1, log_level="WARNING")
    t = Transcriber(args)
    t.pool_worker((wav_path, out))
    print(open(out).read())
