"""Measure the live-token distribution per (channel, frame) at the honest
operating point — sizing data for live-prefix bucketed expansion.

Prints per-frame percentiles of live counts and, for channel-sorted groups
of size Bg, the average bucket each group would run at.
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from vosk_tpu.runtime.pipeline import FusedPipeline
from vosk_tpu.utils.benchdata import make_bench_model, make_plausible_loglikes

B = int(os.environ.get("B", "96"))
STATES = int(os.environ.get("STATES", "2000000"))
T = int(os.environ.get("T", "20"))
K = int(os.environ.get("K", "7000"))

model = make_bench_model(
    num_states=STATES, num_pdfs=6008, max_active=K,
    realistic=True, num_words=100_000, seed=0,
)
pipe = FusedPipeline(model, batch=B, collect_records=False)
dec = pipe.dec
S = pipe.chunk_samples
rng = np.random.default_rng(0)

# probe frames/chunk
st = pipe.init_state()


@jax.jit
def _probe(params, st, a, n):
    _, feats, fvalid = pipe.ex._extract_chunk_impl(st["feat"], a, None, n)
    _, ll, _ = pipe.am._process_chunk_impl(params, st["am"], feats, fvalid, None)
    return ll


ll0 = _probe(pipe.params, st, jnp.zeros((B, S), jnp.float32),
             np.full((B,), S, np.int32))
fd = ll0.shape[1]
lb = make_plausible_loglikes(model.graph, 6008, B, T * fd, snr=2.0, seed=0)
lls = jnp.asarray(lb.reshape(T, fd, B, 6008).swapaxes(1, 2))


@jax.jit
def run(tables, frontier, lls):
    saved = {k: getattr(dec, k) for k in tables}
    for k, v in tables.items():
        setattr(dec, k, v)
    try:
        def chunk(fr, ll):
            def frame(fr, l):
                fr2, _ = (dec._frame_step_v4 if dec.frame_step == "v4"
                          else dec._frame_step)(fr, l, jnp.ones((B,), bool))
                live = jnp.sum(jnp.isfinite(fr2["cost"]), axis=1)
                return fr2, live
            return jax.lax.scan(frame, fr, jnp.swapaxes(ll, 0, 1))
        fr, lives = jax.lax.scan(chunk, frontier, lls)
        return lives  # [T, fd, B]
    finally:
        for k, v in saved.items():
            setattr(dec, k, v)


lives = np.asarray(run(dec.tables, dec.init_frontier(B), lls))
lv = lives.reshape(-1, B)  # [frames, B]
print("per-(channel,frame) live counts:")
for q in (50, 75, 90, 95, 99, 100):
    print(f"  p{q:<3d} {np.percentile(lv, q):8.0f}")
print(f"  mean {lv.mean():8.0f}")

buckets = np.array([512, 1024, 2048, 4096, K])


def to_bucket(x):
    return buckets[np.searchsorted(buckets, x, side="left").clip(0, len(buckets) - 1)]


for G in (1, 2, 4, 8):
    Bg = B // G
    tot = 0.0
    for f in range(lv.shape[0]):
        srt = np.sort(lv[f])[::-1]
        for g in range(G):
            tot += Bg * to_bucket(srt[g * Bg])
    full = lv.shape[0] * B * K
    print(f"groups={G:2d} (Bg={Bg:3d}): expansion work vs full-K = {tot/full:.3f}")
