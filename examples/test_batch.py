#!/usr/bin/env python3
"""Batched multi-stream decode with xRT — reference test_gpu_batch.py."""
import json
import time

from _common import ensure_model, example_wav

from vosk_tpu import BatchModel, BatchRecognizer

model = BatchModel(ensure_model())
streams = [("five", "one"), ("two", "three"), ("seven", "zero")]
recs = [BatchRecognizer(model, 16000.0) for _ in streams]
datas = [example_wav(ws, seed=11 + i) for i, ws in enumerate(streams)]

t0 = time.perf_counter()
for rec, data in zip(recs, datas):
    CH = 8000
    for i in range(0, len(data), CH):
        rec.AcceptWaveform(data[i:i + CH])
    rec.FinishStream()
model.Wait()
audio_s = sum(len(d) for d in datas) / 2 / 16000
for i, rec in enumerate(recs):
    while rec.GetPendingChunks() > 0:
        time.sleep(0.01)
    res = rec.FrontResult()
    print(i, json.loads(res)["text"] if res else "")
    rec.Pop()
dt = time.perf_counter() - t0
print(f"xRT: {audio_s / dt:.2f} audio-s/s")
