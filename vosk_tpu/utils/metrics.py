"""Per-stage timing/observability.

The reference has no in-core tracing (SURVEY §5) — timing is user-space xRT
math in the CLI (transcriber.py:130-131).  vosk_tpu builds it in: every
Recognizer/BatchPipeline owns a `StageTimers`; `report()` returns stage
totals, counts, and realtime factors.  jax.profiler can be layered on via
`trace()` for deep dives.
"""
from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict


class StageTimers:
    def __init__(self):
        self.total_s: Dict[str, float] = defaultdict(float)
        self.count: Dict[str, int] = defaultdict(int)
        self.audio_seconds = 0.0

    @contextlib.contextmanager
    def timer(self, stage: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.total_s[stage] += time.perf_counter() - t0
            self.count[stage] += 1

    def add_audio(self, seconds: float) -> None:
        self.audio_seconds += seconds

    def report(self) -> dict:
        total = sum(self.total_s.values())
        out = {
            "stages": {
                k: {
                    "seconds": round(v, 4),
                    "calls": self.count[k],
                    "share": round(v / total, 3) if total else 0.0,
                }
                for k, v in sorted(self.total_s.items(), key=lambda kv: -kv[1])
            },
            "audio_seconds": round(self.audio_seconds, 3),
            "wall_seconds": round(total, 4),
        }
        if total > 0 and self.audio_seconds > 0:
            out["xrt"] = round(total / self.audio_seconds, 4)
            out["audio_seconds_per_second"] = round(self.audio_seconds / total, 2)
        return out


@contextlib.contextmanager
def trace(log_dir: str):
    """jax.profiler trace scope (view with tensorboard/xprof)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
