"""Bisect the PRODUCTION decoder step by monkeypatching pieces:
  prod      — as-is
  norec     — records replaced by empty dict
  sort2     — dedup via 2-operand sort (no idx payload; dummy sel)
  norec2    — both
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from vosk_tpu.ops import viterbi as V
from vosk_tpu.utils.benchdata import make_bench_graph

B = int(os.environ.get("B", "256"))
K = int(os.environ.get("K", "1000"))
S = int(os.environ.get("S", "50000"))
T = 16
P = 2048


def timeit(dec, name):
    @jax.jit
    def scan(frontier, lls):
        def body(fr, xs):
            ll, v = xs
            fr2, recs, best, bestf = dec._decode_chunk_impl(fr, ll, v)
            return fr2, best

        return jax.lax.scan(
            body, frontier, (lls, jnp.ones((T, B, lls.shape[2] // P), bool))
        )

    rng = np.random.default_rng(0)
    # shape decode_chunk expects: [B, Tframes, P]; emulate 1-frame chunks
    lls = jnp.asarray(rng.standard_normal((T, B, 1, P)).astype(np.float32))

    @jax.jit
    def scan2(frontier, lls):
        def body(fr, ll):
            fr2, recs, best, bestf = dec._decode_chunk_impl(
                fr, ll, jnp.ones((B, 1), bool)
            )
            return fr2, best

        return jax.lax.scan(body, frontier, lls)

    fr = dec.init_frontier(B)
    out = scan2(fr, lls)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = scan2(fr, lls)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / T
    print(f"{name:8s} {dt*1e3:8.2f} ms/frame  ({B*0.03/dt:8.0f} audio-s/s)")


def main():
    graph = make_bench_graph(num_states=S, num_pdfs=P, seed=0)

    def make(norec=False, sort2=False):
        dec = V.BatchViterbi(graph, V.DecodeParams(beam=13.0, max_active=K))
        if norec:
            orig = dec._frame_finish

            def ff(frontier, tok, arc, ns, cost, pdf, olab, mask, valid):
                f2, rec = orig(frontier, tok, arc, ns, cost, pdf, olab, mask, valid)
                return f2, {}

            dec._frame_finish = ff
        if sort2:
            def dp2(ns, cost, mask):
                Sn, Kn = dec.S, dec.K
                beam = dec.params.beam
                nsm = jnp.where(mask, ns, Sn)
                costm = jnp.where(mask, cost, jnp.inf)
                s_ns, s_cost = jax.lax.sort((nsm, costm), num_keys=2)
                first = jnp.concatenate(
                    [jnp.ones((1,), bool), s_ns[1:] != s_ns[:-1]]
                )
                wcost = jnp.where(first & (s_ns != Sn), s_cost, jnp.inf)
                neg, sel2 = jax.lax.top_k(-wcost, Kn)
                new_cost = -neg
                best = new_cost[0]
                keep = new_cost <= best + beam
                new_state = jnp.where(keep, s_ns[sel2], Sn)
                new_cost = jnp.where(keep, new_cost, jnp.inf)
                sel = jnp.zeros((Kn,), jnp.int32)  # dummy (records wrong)
                return sel, new_state, new_cost, keep

            dec._dedup_prune = dp2
        return dec

    timeit(make(), "prod")
    timeit(make(norec=True), "norec")
    timeit(make(sort2=True), "sort2")
    timeit(make(norec=True, sort2=True), "norec2")


if __name__ == "__main__":
    main()
