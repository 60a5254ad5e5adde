"""Round-4 selection microbench: what does each stage of _select_v4 cost,
and what would alternatives cost?

Stages at the honest operating point (B=96, K=7000, M=8, E=56k, K2=14k):
  sortA-3p-56k   cost-ordered sort of the full candidate pool (3 planes)
  sortA-3p-14k   same at the 2K bucket
  sortBC-14k     dedup sort (2-key) + re-rank sort (1-key), 3 planes
  topk-56k-7k    lax.top_k(K) over the pool
  approx-56k-7k  lax.approx_max_k(K) over the pool
  hist16+count   16 threshold/count passes over the pool (radix cutoff)
  cumsum-56k     prefix-sum over the pool (compaction position calc)
Run: python tools/mb_r4sel.py
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

ITERS = 10
B, K, M = 96, 7000, 8
E = K * M
K2 = 2 * K


def measure(name, fn, *args):
    @jax.jit
    def run(*a):
        def body(c, _):
            out = fn(c, *a)
            return (c + out * 1e-30) % 1.0, ()

        c, _ = jax.lax.scan(body, jnp.float32(0), None, length=ITERS)
        return c

    np.asarray(run(*args))  # compile
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(run(*args))
        best = min(best, (time.perf_counter() - t0) / ITERS)
    print(f"{name:16s} {best*1e3:8.3f} ms", flush=True)
    return best


def main():
    rng = np.random.default_rng(0)
    cb = jnp.asarray(rng.integers(0, 2**30, (B, E)).astype(np.int32))
    p1 = jnp.asarray(rng.integers(0, 2_000_000, (B, E)).astype(np.int32))
    p2 = jnp.asarray(rng.integers(0, E, (B, E)).astype(np.int32))

    def noop(c, cb):
        return jnp.sum(cb[:, :8].astype(jnp.float32))

    measure("noop", noop, cb)

    def addsum(c, cb):
        return jnp.sum((cb + c.astype(jnp.int32))[:, :8].astype(jnp.float32))

    measure("addsum-56k", addsum, cb)
    measure("addsum-14k", addsum, cb[:, :K2])

    def topk1k(c, cb):
        neg, idx = jax.lax.top_k(-(cb + c.astype(jnp.int32)), 1000)
        return jnp.sum(neg[:, :1].astype(jnp.float32))

    measure("topk-3.5k-1k", topk1k, cb[:, : K // 2])

    def sortA(c, cb, p1, p2):
        s = jax.lax.sort(
            (cb + c.astype(jnp.int32), p1, p2), num_keys=1, dimension=1
        )
        return jnp.sum(s[0][:, :1].astype(jnp.float32))

    for n, tag in ((E, "56k"), (K2, "14k"), (K, "7k"), (K // 2, "3.5k")):
        measure(f"sortA-3p-{tag}", sortA, cb[:, :n], p1[:, :n], p2[:, :n])

    def sortBC(c, cb, p1, p2):
        sub = (p1[:, :K2], cb[:, :K2] + c.astype(jnp.int32), p2[:, :K2])
        sB = jax.lax.sort(sub, num_keys=2, dimension=1)
        first = jnp.concatenate(
            [jnp.ones((B, 1), bool), sB[0][:, 1:] != sB[0][:, :-1]], axis=1
        )
        key = jnp.where(first, sB[1], jnp.int32(2**31 - 1))
        sC = jax.lax.sort((key, sB[0], sB[2]), num_keys=1, dimension=1)
        return jnp.sum(sC[0][:, :1].astype(jnp.float32))

    measure("sortBC-14k", sortBC, cb, p1, p2)

    def topk(c, cb):
        neg, idx = jax.lax.top_k(-(cb + c.astype(jnp.int32)), K)
        return jnp.sum(neg[:, :1].astype(jnp.float32))

    measure("topk-56k-7k", topk, cb)
    measure("topk-14k-7k", topk, cb[:, :K2])

    cf = jnp.asarray(rng.standard_normal((B, E)).astype(np.float32))

    def approx(c, cf):
        neg, idx = jax.lax.approx_max_k(-(cf + c), K)
        return jnp.sum(neg[:, :1])

    measure("approx-56k-7k", approx, cf)

    def hist(c, cb, passes):
        x = cb + c.astype(jnp.int32)
        t = jnp.zeros((B, 1), jnp.int32)
        tot = jnp.float32(0)
        for p in range(passes):
            cnt = jnp.sum((x < t).astype(jnp.int32), axis=1, keepdims=True)
            t = jnp.where(cnt < K, t + (1 << (29 - p)), t - (1 << (29 - p)))
            tot += jnp.sum(cnt[:, 0].astype(jnp.float32))
        return tot

    measure("hist16-56k", lambda c, x: hist(c, x, 16), cb)

    def cumsum(c, cb):
        keep = (cb + c.astype(jnp.int32)) < 2**29
        pos = jnp.cumsum(keep.astype(jnp.int32), axis=1)
        return jnp.sum(pos[:, -1].astype(jnp.float32))

    measure("cumsum-56k", cumsum, cb)

    # 1-key sort, single plane (index payload packed in low bits):
    def sort1p(c, cb):
        s = jax.lax.sort(cb + c.astype(jnp.int32), dimension=1)
        return jnp.sum(s[:, :1].astype(jnp.float32))

    measure("sort1p-56k", sort1p, cb)
    measure("sort1p-14k", sort1p, cb[:, :K2])


if __name__ == "__main__":
    main()
