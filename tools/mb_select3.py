"""Microbench for the round-3 selection redesign, on real TPU.

Measures, at the honest operating point (B=96, K=7000, M=8, S=2M):
  rowgather-3M   em_pack row gather [B,K] rows x 3M lanes (current)
  rowgather-2M   same rows, 2/3 bytes  -> is the gather bytes- or row-bound?
  rowgather-1M   same rows, 1/3 bytes
  sortA-5p       lax.sort 5 planes over [B, E=K*M], num_keys=1 (current)
  sortA-2p       2 planes only
  segsort-5p     lax.sort 5 planes over [B, E/128, 128] last axis
  sort14k-5p     lax.sort 5 planes over [B, 2K]
  sort7k-5p      lax.sort 5 planes over [B, K]
  hist-32        32 threshold passes over [B, E] (histogram cutoff)
  topk-E-K       lax.top_k(K) over [B, E]
Run: python tools/mb_select3.py
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

B, K, M, P, S = 96, 7000, 8, 6008, 2_000_000
E = K * M


from functools import partial as _partial
from _mbutil import carry_dep  # noqa: E402
from _mbutil import measure as _measure  # noqa: E402

ITERS = 20
measure = _partial(_measure, iters=ITERS)


def main():
    rng = np.random.default_rng(0)
    idx = jnp.asarray(rng.integers(0, S, (B, K)).astype(np.int32))
    tbl3 = jnp.asarray(rng.standard_normal((S + 1, 3 * M)).astype(np.float32))
    tbl2 = tbl3[:, : 2 * M]
    tbl1 = tbl3[:, :M]

    def rg(c, t, ix):
        rows = t[(ix + c.astype(jnp.int32) % 2)]
        return jnp.sum(rows[:, :1, :1])

    measure("rowgather-3M", rg, tbl3, idx)
    measure("rowgather-2M", rg, tbl2, idx)
    measure("rowgather-1M", rg, tbl1, idx)

    cb = jnp.asarray(rng.integers(0, 2**30, (B, E)).astype(np.int32))
    p1 = jnp.asarray(rng.integers(0, S, (B, E)).astype(np.int32))
    p2 = jnp.asarray(rng.integers(0, E, (B, E)).astype(np.int32))
    p3 = jnp.asarray(rng.integers(0, 2**30, (B, E)).astype(np.int32))
    p4 = jnp.asarray(rng.integers(0, 2**18, (B, E)).astype(np.int32))

    def sort5(c, cb, p1, p2, p3, p4):
        s = jax.lax.sort((cb + c.astype(jnp.int32), p1, p2, p3, p4), num_keys=1, dimension=1)
        return jnp.sum(s[0][:, :1].astype(jnp.float32))

    def sort2(c, cb, p1):
        s = jax.lax.sort((cb + c.astype(jnp.int32), p1), num_keys=1, dimension=1)
        return jnp.sum(s[0][:, :1].astype(jnp.float32))

    measure("sortA-5p", sort5, cb, p1, p2, p3, p4)
    measure("sortA-2p", sort2, cb, p1)

    Ep = ((E + 127) // 128) * 128
    pad = lambda x: jnp.pad(x, ((0, 0), (0, Ep - E)))
    cb3 = pad(cb).reshape(B, Ep // 128, 128)
    ps3 = [pad(p).reshape(B, Ep // 128, 128) for p in (p1, p2, p3, p4)]

    def segsort5(c, cb, p1, p2, p3, p4):
        s = jax.lax.sort((cb + c.astype(jnp.int32), p1, p2, p3, p4), num_keys=1, dimension=2)
        return jnp.sum(s[0][:, :1, :1].astype(jnp.float32))

    measure("segsort-5p", segsort5, cb3, *ps3)

    cbs = cb[:, : 2 * K]
    pss = [p[:, : 2 * K] for p in (p1, p2, p3, p4)]
    measure("sort14k-5p", sort5, cbs, *pss)
    cbs7 = cb[:, :K]
    ps7 = [p[:, :K] for p in (p1, p2, p3, p4)]
    measure("sort7k-5p", sort5, cbs7, *ps7)

    def hist(c, cb):
        lo = jnp.min(cb, axis=1, keepdims=True) + c.astype(jnp.int32)
        acc = jnp.zeros((B, 1), jnp.int32)
        for i in range(32):
            t = lo + (i * 1000)
            acc += jnp.sum((cb <= t).astype(jnp.int32), axis=1, keepdims=True)
        return jnp.sum(acc[:, :1].astype(jnp.float32))

    measure("hist-32", hist, cb)

    def topk(c, cb):
        neg, sel = jax.lax.top_k(-(cb + c.astype(jnp.int32)), K)
        return jnp.sum(neg[:, :1].astype(jnp.float32))

    measure("topk-E-K", topk, cb)


if __name__ == "__main__" and not os.environ.get("MB3_SKIP_MAIN"):
    main()


def main2():
    rng = np.random.default_rng(0)
    cb = jnp.asarray(rng.integers(0, 2**30, (B, E)).astype(np.int32))
    nsf = jnp.asarray(rng.integers(0, 2**23, (B, E)).astype(np.int32))
    K2 = 14000

    def topk14(c, cb):
        neg, sel = jax.lax.top_k(-(cb + c.astype(jnp.int32)), K2)
        return jnp.sum(neg[:, :1].astype(jnp.float32))

    measure("topk-E-14k", topk14, cb)

    def approxk(c, cb):
        neg, sel = jax.lax.approx_max_k(-(cb + c.astype(jnp.float32)), K2)
        return jnp.sum(neg[:, :1])

    measure("approx-E-14k", approxk, cb)

    from vosk_tpu.ops.gather import onehot_gather
    idx2 = jnp.asarray(rng.integers(0, E, (B, K2)).astype(np.int32))

    def pg(c, nsf, ix):
        out = onehot_gather(nsf, (ix + c.astype(jnp.int32) % 2) % E)
        return jnp.sum(out[:, :1].astype(jnp.float32))

    measure("pallasg-E-14k", pg, nsf, idx2)

    idx3 = jnp.asarray(rng.integers(0, K2, (B, K)).astype(np.int32))
    nsf2 = nsf[:, :K2]

    def pg2(c, nsf, ix):
        out = onehot_gather(nsf, (ix + c.astype(jnp.int32) % 2) % K2)
        return jnp.sum(out[:, :1].astype(jnp.float32))

    measure("pallasg-14k-7k", pg2, nsf2, idx3)

    # 2-key dedup sort over K2 with 2 payloads (v4 sortB)
    s1 = jnp.asarray(rng.integers(0, S, (B, K2)).astype(np.int32))
    s2 = cb[:, :K2]
    s3 = jnp.asarray(rng.integers(0, E, (B, K2)).astype(np.int32))

    def sortB(c, a, b, d):
        s = jax.lax.sort((a, b + c.astype(jnp.int32), d), num_keys=2, dimension=1)
        return jnp.sum(s[0][:, :1].astype(jnp.float32))

    measure("sortB-14k-3p", sortB, s1, s2, s3)


if __name__ == "__main__":
    main2()
