"""Throughput benchmark: batch streaming transcription, audio-seconds/s/chip.

Default configuration is the HONEST operating point — the reference's own
decode parameters and a realistic graph scale (cf. /root/reference
src/model.cc:134-147 defaults and vosk-model-en-us-0.22 graph size):

  * max-active 7000, beam 13.0, lattice-beam 6.0, acoustic-scale 1.0
  * 2,000,000-state graph with HCLG-shaped out-degrees, epsilon (backoff)
    arcs, 100k-word vocabulary, 6008 pdfs
  * full lattice record emission ON (what Result()/confidences consume)
  * structured acoustic scores (random graph walks + noise) so beam
    dynamics look like speech, not like worst-case uniform noise

The full pipeline (features -> TDNN-F AM -> WFST token passing with lattice
records) runs as one jitted scan over 0.2 s chunks for B concurrent
channels.  A secondary EASY line reproduces the round-1 synthetic config
(50k states, max-active 1000, no lattice records) for continuity; it is
printed inside the same JSON under "easy" and is NOT the headline number.

Baseline: the reference publishes no RTF tables (BASELINE.md); the
north-star target is 5000 audio-s/s/chip (BASELINE.json), so
vs_baseline = value/5000.

Env knobs: VOSK_TPU_BENCH_B (channels, default 96), VOSK_TPU_BENCH_STATES
(default 2,000,000), VOSK_TPU_BENCH_SECONDS (audio seconds per channel per
drive, default 4), VOSK_TPU_BENCH_DRIVES (pipelined drives in the window,
default 10), VOSK_TPU_BENCH_MAX_ACTIVE (default 7000),
VOSK_TPU_BENCH_CAP_M (degree cap; 0 = library default),
VOSK_TPU_BENCH_SLACK (dedup slack), VOSK_TPU_BENCH_UNROLL=1 (unrolled
ragged groups), VOSK_TPU_BENCH_SKIP_EASY / _SKIP_ADAPTIVE =1 to skip the
secondary configs.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

# persistent XLA compilation cache: the honest-scale programs (2M-state
# graph, 5-bucket ragged switch) take tens of minutes to compile through
# the tunnel; cached executables make reruns start in seconds
try:
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("VOSK_TPU_XLA_CACHE", "/tmp/vosk_tpu_xla_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
except Exception:
    pass


def run_config(B, states, seconds, max_active, *, realistic, lattice,
               num_pdfs, num_words, seed=0, adaptive=False, snr=2.0,
               drives=1):
    import jax
    from vosk_tpu.runtime.pipeline import FusedPipeline
    from vosk_tpu.utils.benchdata import make_bench_model, make_plausible_loglikes

    model = make_bench_model(
        num_states=states,
        num_pdfs=num_pdfs,
        max_active=max_active,
        realistic=realistic,
        num_words=num_words,
        seed=seed,
    )
    pipe = FusedPipeline(
        model,
        batch=B,
        # 0.48 s device chunks: the scan length per chunk is the WORST-case
        # AM output slots; at 0.2 s chunks ~17% of decode steps are masked
        # boundary padding that still pays the full frame step, at 0.48 s
        # it's ~6% (the streaming Recognizer keeps its own 0.2 s latency
        # path — this is the batch-throughput surface)
        chunk_seconds=float(os.environ.get("VOSK_TPU_BENCH_CHUNK", "0.48")),
        collect_records=lattice,
        lattice_records=lattice,
        frame_step=os.environ.get("VOSK_TPU_BENCH_STEP", "auto"),
        cap_m=int(os.environ.get("VOSK_TPU_BENCH_CAP_M", "0")) or None,
        dedup_slack=float(os.environ.get("VOSK_TPU_BENCH_SLACK", "0")) or None,
        ragged_unroll=bool(int(os.environ.get("VOSK_TPU_BENCH_UNROLL", "0"))),
    )
    S = pipe.chunk_samples
    n_chunks = int(seconds * model.config.sample_rate) // S
    rng = np.random.default_rng(seed)
    audio = (rng.standard_normal((n_chunks, B, S)) * 500).astype(np.float32)
    audio_dev = jax.device_put(audio)

    ll_bias = None
    if realistic:
        # probe decode-frame count per chunk, then build structured scores.
        # snr=2.0 live-token distribution MEASURED on TPU (r5, f_cost
        # records over the whole window): per-frame live p50=4505,
        # mean=3734, 48% of frames AT the 7000 cap — a saturated-beam
        # regime, harder than real speech typically is, so the headline
        # does not lean on the ragged fast path.
        st = pipe.init_state()

        # ONE jitted probe call — the raw impls dispatch op-by-op, which
        # costs seconds per op through the axon tunnel (tens of minutes
        # for the whole feature+AM graph; this was the bench "hang")
        @jax.jit
        def _probe(params, st, a, n):
            _, feats, fvalid = pipe.ex._extract_chunk_impl(
                st["feat"], a, None, n)
            _, ll, _ = pipe.am._process_chunk_impl(
                params, st["am"], feats, fvalid, None)
            return ll

        ll = _probe(pipe.params, st, audio_dev[0],
                    np.full((B,), S, np.int32))
        fd = ll.shape[1]
        lb = make_plausible_loglikes(
            model.graph, num_pdfs, B, n_chunks * fd, snr=snr, seed=seed
        )
        ll_bias = jax.device_put(
            lb.reshape(n_chunks, fd, B, num_pdfs).swapaxes(1, 2) * 1.0
        )

    def drive(state):
        if adaptive:
            return pipe.run_adaptive(state, audio_dev, ll_bias=ll_bias, seg=4)
        return pipe.run_scan(state, audio_dev, ll_bias=ll_bias)

    # warmup/compile
    state = pipe.init_state()
    state, recs, best = drive(state)
    np.asarray(best)  # force completion (axon block_until_ready returns early)
    del recs

    # measure: `drives` back-to-back drives with state carried across, the
    # way a production server streams continuously.  Drives are enqueued
    # asynchronously (jax dispatch) so the per-drive launch latency of the
    # axon tunnel (~1.4 s/drive) overlaps device execution of the previous
    # drive; blocking on drive d-1's output before enqueueing d+1 bounds
    # in-flight record buffers to ~2 drives of HBM.  Lattice records are
    # computed and materialized ON DEVICE every drive (they are jit
    # outputs); only a small witness slice is pulled — a bulk device->host
    # pull through the axon tunnel runs at ~1.5 MB/s and would measure the
    # tunnel, not the decoder (on local TPU hosts D2H is ~10 GB/s).
    state = pipe.init_state()
    jax.block_until_ready(state)
    t0 = time.perf_counter()
    done_t = []          # completion wall time of each drive
    prev_best = None
    best_h = None
    wit = None
    for d in range(drives):
        state, recs, best = drive(state)
        if recs is not None and lattice and d == drives - 1:
            last = recs[-1] if isinstance(recs, list) else recs
            wk = "pm" if "pm" in last else "prev"  # v4 vs v3 record schema
            wit = last[wk].reshape(-1)[:8]
        del recs  # release record buffers as soon as the device is done
        if prev_best is not None:
            np.asarray(prev_best)  # block: drive d-1 complete
            done_t.append(time.perf_counter())
        prev_best = best
    best_h = np.asarray(prev_best)
    done_t.append(time.perf_counter())
    if wit is not None:
        np.asarray(wit)  # witness: records exist
    dt = time.perf_counter() - t0

    audio_seconds = drives * n_chunks * B * (S / model.config.sample_rate)
    assert np.isfinite(best_h[-1]).any(), "decode produced no live tokens"
    frames_per_drive = None
    if ll_bias is not None:
        # ll_bias: [n_chunks, B, frames_per_chunk, P]
        frames_per_drive = int(ll_bias.shape[0] * ll_bias.shape[2])
    stats = {"drives": drives, "window_audio_s": round(audio_seconds, 1),
             "wall_s": round(dt, 2)}
    if len(done_t) >= 3:
        # steady-state marginal cost per drive once dispatch overlaps
        diffs = np.diff(done_t)
        steady = float(np.median(diffs))
        stats["steady_drive_s"] = round(steady, 3)
        stats["dispatch_overhead_s"] = round(dt - drives * steady, 2)
        stats["dispatch_overhead_pct"] = round(
            100.0 * max(dt - drives * steady, 0.0) / dt, 1)
        stats["steady_audio_s_per_s"] = round(
            (audio_seconds / drives) / steady, 1)
        if frames_per_drive:
            stats["steady_ms_per_frame"] = round(
                steady / frames_per_drive * 1e3, 3)
    return audio_seconds / dt, stats


def main() -> None:
    # B=96 is the measured v5e sweet spot at the honest operating point:
    # 48ch=38, 64ch=48, 96ch=61, 128ch=19 audio-s/s (records spill HBM)
    B = int(os.environ.get("VOSK_TPU_BENCH_B", "96"))
    states = int(os.environ.get("VOSK_TPU_BENCH_STATES", "2000000"))
    seconds = float(os.environ.get("VOSK_TPU_BENCH_SECONDS", "4"))
    max_active = int(os.environ.get("VOSK_TPU_BENCH_MAX_ACTIVE", "7000"))

    drives = int(os.environ.get("VOSK_TPU_BENCH_DRIVES", "10"))

    # HEADLINE: fixed max-active at the reference operating point.  The
    # live-prefix ragged expansion inside this path is bit-exact (dead
    # slots contribute nothing; tests/test_viterbi_v4.py), so this number
    # carries no accuracy caveat.  The multi-drive window makes the number
    # self-proving about dispatch latency: `measure` in the JSON reports
    # the steady-state marginal drive cost, ms/decoded-frame, and the
    # dispatch overhead share of the wall clock.
    fixed, fstats = run_config(
        B, states, seconds, max_active,
        realistic=True, lattice=True, num_pdfs=6008, num_words=100_000,
        adaptive=False, drives=drives,
    )

    adaptive = astats = None
    if not os.environ.get("VOSK_TPU_BENCH_SKIP_ADAPTIVE"):
        adaptive, astats = run_config(
            B, states, seconds, max_active,
            realistic=True, lattice=True, num_pdfs=6008, num_words=100_000,
            adaptive=True, drives=max(drives // 2, 2),
        )

    easy = None
    if not os.environ.get("VOSK_TPU_BENCH_SKIP_EASY"):
        easy, _ = run_config(
            256, 50_000, 8.0, 1000,
            realistic=False, lattice=False, num_pdfs=2048, num_words=5000,
            drives=4,
        )

    out = {
        "metric": "batch_streaming_throughput",
        "value": round(fixed, 1),
        "unit": "audio-s/s/chip",
        "vs_baseline": round(fixed / 5000.0, 4),
        "measure": fstats,
        "config": {
            "states": states, "max_active": max_active, "beam": 13.0,
            "lattice_beam": 6.0, "lattice_records": True, "channels": B,
            "pdfs": 6008, "snr": 2.0,
            "note": "FIXED max-active (reference operating point, "
                    "src/model.cc:134-147) with exact live-prefix ragged "
                    "expansion; measured live tokens p50=4505, 48% of "
                    "frames at the cap (saturated-beam regime)",
        },
    }
    if adaptive is not None:
        out["adaptive_ladder"] = {
            "value": round(adaptive, 1),
            "measure": astats,
            "config": {
                "note": "adaptive max-active ladder 1024/2048/4096/7000; "
                        "initial rung follows the carried frontier's live "
                        "count (r5 fix), so at the saturated measured "
                        "regime the ladder sits at 7000 and matches "
                        "fixed-K; its advantage appears in easier "
                        "regimes (WER-parity-tested, tests/"
                        "test_wer_parity.py + test_wer_bigvocab.py)",
            },
        }
    if easy is not None:
        out["easy"] = {
            "value": round(easy, 1),
            "config": {
                "states": 50000, "max_active": 1000,
                "lattice_records": False, "channels": 256,
                "note": "round-1 synthetic config, for continuity only",
            },
        }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
