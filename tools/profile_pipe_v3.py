"""Where does the honest-bench FusedPipeline spend time beyond the decoder?

Times run_scan at the honest configuration with pieces ablated:
  full           : bench configuration (records + ll_bias)
  no-records     : collect_records=False (records not returned from scan)
  no-bias        : ll_bias=None (pure AM scores)
  am-only        : decoder skipped (monkeypatched identity)
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from vosk_tpu.runtime.pipeline import FusedPipeline
from vosk_tpu.utils.benchdata import make_bench_model, make_plausible_loglikes

B, STATES, SECONDS, K = 64, 2_000_000, 2.0, 7000


def timeit(tag, pipe, audio_dev, ll_bias, fetch_recs):
    state = pipe.init_state()
    out = pipe.run_scan(state, audio_dev, ll_bias=ll_bias)
    np.asarray(out[2])
    dts = []
    for _ in range(2):
        state = pipe.init_state()
        jax.block_until_ready(state)
        t0 = time.perf_counter()
        state, recs, best = pipe.run_scan(state, audio_dev, ll_bias=ll_bias)
        np.asarray(best)
        if recs is not None and fetch_recs:
            np.asarray(recs["prev"][-1, :, -1, 0, :8])
        dts.append(time.perf_counter() - t0)
    dt = min(dts)
    n_chunks = audio_dev.shape[0]
    audio_seconds = n_chunks * B * (audio_dev.shape[2] / 16000.0)
    print(f"{tag:12s}: {dt:6.2f} s -> {audio_seconds/dt:7.1f} audio-s/s", flush=True)


def main():
    model = make_bench_model(
        num_states=STATES, num_pdfs=6008, max_active=K,
        realistic=True, num_words=100_000, seed=0,
    )

    def build(lattice):
        return FusedPipeline(model, batch=B, collect_records=lattice,
                             lattice_records=lattice)

    pipe = build(True)
    S = pipe.chunk_samples
    n_chunks = int(SECONDS * 16000) // S
    rng = np.random.default_rng(0)
    audio = (rng.standard_normal((n_chunks, B, S)) * 500).astype(np.float32)
    audio_dev = jax.device_put(audio)

    st = pipe.init_state()
    _, ll, _ = pipe.am._process_chunk_impl(
        pipe.params, st["am"],
        *pipe.ex._extract_chunk_impl(st["feat"], audio_dev[0], None,
                                     np.full((B,), S, np.int32))[1:],
        None,
    )
    fd = ll.shape[1]
    lb = make_plausible_loglikes(model.graph, 6008, B, n_chunks * fd, snr=5.0, seed=0)
    ll_bias = jax.device_put(lb.reshape(n_chunks, fd, B, 6008).swapaxes(1, 2) * 1.0)

    timeit("full", pipe, audio_dev, ll_bias, True)
    timeit("no-bias", pipe, audio_dev, None, True)
    pipe2 = build(False)
    timeit("no-records", pipe2, audio_dev, ll_bias, False)

    # am-only: decode replaced by identity
    pipe3 = build(False)
    orig = pipe3.dec._decode_entry
    def ident(tables, frontier, ll, valid):
        best = jnp.min(frontier["cost"], axis=1) + jnp.sum(ll[:, 0, :8], axis=1) * 0
        return frontier, None, best, best
    pipe3.dec._decode_entry = ident
    timeit("am-only", pipe3, audio_dev, ll_bias, False)


if __name__ == "__main__":
    main()
