"""Stage attribution for the fused pipeline: time features / AM / decoder
separately as device-side scans with bench shapes.

Run on TPU: python tools/profile_pipeline.py
Run on CPU: JAX_PLATFORMS='' python -c "import jax; jax.config.update('jax_platforms','cpu')" ...
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, n=3):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def main():
    from vosk_tpu.runtime.pipeline import FusedPipeline
    from vosk_tpu.utils.benchdata import make_bench_model

    B = int(os.environ.get("VOSK_TPU_BENCH_B", "32"))
    states = int(os.environ.get("VOSK_TPU_BENCH_STATES", "50000"))
    max_active = int(os.environ.get("VOSK_TPU_BENCH_MAX_ACTIVE", "1000"))
    T = int(os.environ.get("VOSK_TPU_BENCH_CHUNKS", "16"))
    dedup = os.environ.get("VOSK_TPU_DEDUP", "sort")

    model = make_bench_model(num_states=states, max_active=max_active)
    pipe = FusedPipeline(model, batch=B, collect_records=False)
    pipe.dec.dedup = dedup
    S = pipe.chunk_samples
    rng = np.random.default_rng(0)
    audio = jax.device_put((rng.standard_normal((T, B, S)) * 500).astype(np.float32))
    n_samples = jnp.full((T, B), S, jnp.int32)

    ex, am, dec = pipe.ex, pipe.am, pipe.dec
    params = pipe.params

    # features only
    @jax.jit
    def feat_scan(state, audio, n_samples):
        def body(st, xs):
            a, n = xs
            st2, feats, valid = ex._extract_chunk_impl(st, a, None, n)
            return st2, (feats, valid)

        return jax.lax.scan(body, state, (audio, n_samples))

    fstate = ex.init_stream_state(B, S)
    t_feat = timeit(feat_scan, fstate, audio, n_samples)
    _, (feats_all, fvalid_all) = feat_scan(fstate, audio, n_samples)

    # am only
    @jax.jit
    def am_scan(params, state, feats_all, fvalid_all):
        def body(st, xs):
            f, v = xs
            st2, ll, lv = am._process_chunk_impl(params, st, f, v, None)
            return st2, (ll, lv)

        return jax.lax.scan(body, state, (feats_all, fvalid_all))

    astate = am.init_stream_state(B, pipe.F)
    t_am = timeit(am_scan, params, astate, feats_all, fvalid_all)
    _, (ll_all, lvalid_all) = am_scan(params, astate, feats_all, fvalid_all)

    # decoder only
    @jax.jit
    def dec_scan(frontier, ll_all, lvalid_all):
        def body(fr, xs):
            ll, lv = xs
            fr2, recs, best, bestf = dec._decode_chunk_impl(fr, ll, lv)
            return fr2, best

        return jax.lax.scan(body, frontier, (ll_all, lvalid_all))

    frontier = dec.init_frontier(B)
    t_dec = timeit(dec_scan, frontier, ll_all, lvalid_all)

    audio_sec = T * B * S / model.config.sample_rate
    print(f"B={B} states={states} K={max_active} E={dec.E} dedup={dedup} chunks={T}")
    print(f"features: {t_feat*1e3:8.1f} ms  ({audio_sec/t_feat:8.0f} audio-s/s)")
    print(f"am:       {t_am*1e3:8.1f} ms  ({audio_sec/t_am:8.0f} audio-s/s)")
    print(f"decoder:  {t_dec*1e3:8.1f} ms  ({audio_sec/t_dec:8.0f} audio-s/s)")


if __name__ == "__main__":
    main()
