"""Throughput benchmark: batch streaming transcription, audio-seconds/s/chip.

Runs the fused pipeline (features -> TDNN-F -> WFST token passing) over B
concurrent channels of synthetic 16 kHz audio on the available accelerator
and prints ONE JSON line.

Baseline: the reference publishes no RTF tables (BASELINE.md); the north-star
target is 5000 audio-s/s/chip (BASELINE.json), so vs_baseline = value/5000.

Env knobs: VOSK_TPU_BENCH_B (channels, default 32), VOSK_TPU_BENCH_STATES
(graph states, default 50000), VOSK_TPU_BENCH_SECONDS (audio seconds per
channel, default 8), VOSK_TPU_BENCH_MAX_ACTIVE (default 1000).
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def main() -> None:
    import jax

    from vosk_tpu.runtime.pipeline import FusedPipeline
    from vosk_tpu.utils.benchdata import make_bench_model

    B = int(os.environ.get("VOSK_TPU_BENCH_B", "256"))
    states = int(os.environ.get("VOSK_TPU_BENCH_STATES", "50000"))
    seconds = float(os.environ.get("VOSK_TPU_BENCH_SECONDS", "8"))
    max_active = int(os.environ.get("VOSK_TPU_BENCH_MAX_ACTIVE", "1000"))

    model = make_bench_model(num_states=states, max_active=max_active)
    pipe = FusedPipeline(model, batch=B, collect_records=False)

    S = pipe.chunk_samples
    n_chunks = int(seconds * model.config.sample_rate) // S
    rng = np.random.default_rng(0)
    audio = (rng.standard_normal((n_chunks, B, S)) * 500).astype(np.float32)

    audio_dev = jax.device_put(audio)

    # warmup: compile the scan + one full pass
    state = pipe.init_state()
    state, _, best = pipe.run_scan(state, audio_dev)
    jax.block_until_ready(best)

    # measure: fresh state, one device program for all chunks
    state = pipe.init_state()
    jax.block_until_ready(state)
    t0 = time.perf_counter()
    state, _, best = pipe.run_scan(state, audio_dev)
    jax.block_until_ready(best)
    dt = time.perf_counter() - t0

    audio_seconds = n_chunks * B * (S / model.config.sample_rate)
    value = audio_seconds / dt
    print(
        json.dumps(
            {
                "metric": "batch_streaming_throughput",
                "value": round(value, 1),
                "unit": "audio-s/s/chip",
                "vs_baseline": round(value / 5000.0, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
