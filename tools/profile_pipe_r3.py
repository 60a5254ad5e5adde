"""Round-3 end-to-end pipeline breakdown at the honest operating point.

Times FusedPipeline.run_scan over T chunks (fixed K=7000) and ablations:
  full        run_scan as-is (lattice records on, collect on)
  norecords   collect_records=False (records computed? no - recs dropped
              from scan carry entirely)
  nolat       lattice_records=False (selection without lattice planes)
  deconly     decoder only: scan of decode_chunk on precomputed loglikes
  amfeat      features+AM only (no decoder)
Per-frame numbers printed; frames/chunk measured from the AM output.
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

B = int(os.environ.get("B", "96"))
STATES = int(os.environ.get("STATES", "2000000"))
T = int(os.environ.get("T", "10"))  # chunks per timed program
MAX_ACTIVE = int(os.environ.get("K", "7000"))


def timed(label, fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    best = np.inf
    for _ in range(2):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    model = make_bench_model(
        num_states=STATES, num_pdfs=6008, max_active=MAX_ACTIVE,
        realistic=True, num_words=100_000, seed=0,
    )
    rng = np.random.default_rng(0)

    results = {}
    for tag, collect, lat in (
        ("full", True, True),
        ("norecords", False, False),
        ("nolat", True, False),
    ):
        pipe = FusedPipeline(model, batch=B, collect_records=collect,
                             lattice_records=lat)
        S = pipe.chunk_samples
        audio = jnp.asarray(
            (rng.standard_normal((T, B, S)) * 500).astype(np.float32))
        st = pipe.init_state()
        @jax.jit
        def _probe(params, st, a, n):
            _, feats, fvalid = pipe.ex._extract_chunk_impl(
                st["feat"], a, None, n)
            _, ll, _ = pipe.am._process_chunk_impl(
                params, st["am"], feats, fvalid, None)
            return ll

        ll = _probe(pipe.params, st, audio[0], np.full((B,), S, np.int32))
        fd = ll.shape[1]
        lb = make_plausible_loglikes(model.graph, 6008, B, T * fd, snr=2.0,
                                     seed=0)
        ll_bias = jax.device_put(
            lb.reshape(T, fd, B, 6008).swapaxes(1, 2) * 1.0)

        def run(st):
            st2, recs, best = pipe.run_scan(st, audio, ll_bias=ll_bias)
            return best

        dt = timed(tag, run, pipe.init_state())
        per_frame = dt / (T * fd)
        results[tag] = per_frame
        print(f"{tag:10s} {dt*1e3:8.1f} ms total  {per_frame*1e3:7.2f} ms/frame"
              f"  ({fd} frames/chunk)")
        if tag == "full":
            # decoder-only on the same pipe: precomputed lls through scan
            dec = pipe.dec
            lls = jnp.asarray(
                rng.standard_normal((T, B, fd, 6008)).astype(np.float32))
            valid = jnp.ones((T, B, fd), bool)

            @jax.jit
            def dscan(tables, fr, lls, valid):
                def body(fr, xs):
                    ll, v = xs
                    fr2, recs, b, bf = dec._decode_entry(tables, fr, ll, v)
                    return fr2, b

                return jax.lax.scan(body, fr, (lls, valid))

            def drun(fr):
                return dscan(dec.tables, fr, lls, valid)

            dt = timed("deconly", drun, dec.init_frontier(B))
            print(f"{'deconly':10s} {dt*1e3:8.1f} ms total  "
                  f"{dt/(T*fd)*1e3:7.2f} ms/frame  (no record pull)")

            @jax.jit
            def afscan(params, st, audio):
                def body(st, a):
                    fs, feats, fv = pipe.ex._extract_chunk_impl(
                        st["feat"], a, None,
                        jnp.full((a.shape[0],), a.shape[1], jnp.int32))
                    ams, ll, lv = pipe.am._process_chunk_impl(
                        params, st["am"], feats, fv, None)
                    return {"feat": fs, "am": ams}, jnp.sum(ll[:, :1, :1])

                st0 = {"feat": st["feat"], "am": st["am"]}
                return jax.lax.scan(body, st0, audio)

            def afrun(st):
                return afscan(pipe.params, st, audio)

            dt = timed("amfeat", afrun, pipe.init_state())
            print(f"{'amfeat':10s} {dt*1e3:8.1f} ms total  "
                  f"{dt/(T*fd)*1e3:7.2f} ms/frame")


if __name__ == "__main__":
    main()
