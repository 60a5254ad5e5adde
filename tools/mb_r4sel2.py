"""Round-4 selection microbench part 2: costs of the v5 building blocks.

  rowgather-rand   em_pack row gather [B,K] rows (current, random states)
  rowgather-sort   same rows, per-channel ascending state ids
  topk-idx-56k     top_k(K2) over the pool incl. index use
  nsgather-perm    ns extraction via M per-slice pallas lane-gathers
  nsgather-bigP    ns extraction via one pallas gather from [B, E] (P=56k)
  sort2p-8k        dedup sort (2-key) at 8k
Run: python tools/mb_r4sel2.py
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from vosk_tpu.ops.gather import onehot_gather

ITERS = 10
B, K, M, S = 96, 7000, 8, 2_000_000
E = K * M
K2 = 8192


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

    measure("noop", lambda c, x: jnp.sum(x[:, :8].astype(jnp.float32)),
            jnp.zeros((B, 8), jnp.int32))

    # --- row gather: random vs sorted state ids
    tbl = jnp.asarray(rng.standard_normal((S + 1, 2 * M)).astype(np.float32))
    idx_r = rng.integers(0, S, (B, K)).astype(np.int32)
    idx_s = np.sort(idx_r, axis=1)
    # clustered: states drawn from 64 hot regions of 4k states each
    base = rng.integers(0, S - 4096, (B, 64))
    idx_c = np.sort(
        (base[:, rng.integers(0, 64, K)] + rng.integers(0, 4096, (B, K)))
        .astype(np.int32), axis=1,
    )

    def rowg(c, t, ix):
        rows = t[ix + (c.astype(jnp.int32) & 0)]
        return jnp.sum(rows[:, :1, :1])

    measure("rowgather-rand", rowg, tbl, jnp.asarray(idx_r))
    measure("rowgather-sort", rowg, tbl, jnp.asarray(idx_s))
    measure("rowgather-clus", rowg, tbl, jnp.asarray(idx_c))

    # --- top_k with index consumption
    cb = jnp.asarray(rng.integers(0, 2**30, (B, E)).astype(np.int32))

    def topki(c, cb):
        neg, eidx = jax.lax.top_k(-(cb + c.astype(jnp.int32)), K2)
        kk = eidx // M
        mm = eidx - kk * M
        return jnp.sum(neg[:, :1].astype(jnp.float32)) + jnp.sum(
            kk[:, :1].astype(jnp.float32)) + jnp.sum(mm[:, :1].astype(jnp.float32))

    measure("topk-idx-56k", topki, cb)

    # --- ns extraction, per-m lane gathers from [B, K] slices
    ns3 = jnp.asarray(rng.integers(0, 2**23, (B, K, M)).astype(np.int32))
    kk = jnp.asarray(rng.integers(0, K, (B, K2)).astype(np.int32))
    mm = jnp.asarray(rng.integers(0, M, (B, K2)).astype(np.int32))

    def ns_perm(c, ns3, kk, mm):
        out = jnp.zeros((B, K2), jnp.int32)
        kk2 = (kk + (c.astype(jnp.int32) & 0))
        for m in range(M):
            g = onehot_gather(ns3[:, :, m], kk2)
            out = jnp.where(mm == m, g, out)
        return jnp.sum(out[:, :1].astype(jnp.float32))

    measure("nsgather-perm", ns_perm, ns3, kk, mm)

    # --- ns extraction, one big-P pallas gather
    nsf = ns3.reshape(B, E)
    eix = jnp.asarray(rng.integers(0, E, (B, K2)).astype(np.int32))

    def ns_bigp(c, nsf, eix):
        g = onehot_gather(nsf, eix + (c.astype(jnp.int32) & 0))
        return jnp.sum(g[:, :1].astype(jnp.float32))

    measure("nsgather-bigP", ns_bigp, nsf, eix)

    # --- dedup-size sorts
    p1 = jnp.asarray(rng.integers(0, S, (B, K2)).astype(np.int32))
    p2 = jnp.asarray(rng.integers(0, E, (B, K2)).astype(np.int32))

    def sortBC(c, cb, p1, p2):
        sB = jax.lax.sort((p1, cb + c.astype(jnp.int32), p2), num_keys=2,
                          dimension=1)
        first = jnp.concatenate(
            [jnp.ones((B, 1), bool), sB[0][:, 1:] != sB[0][:, :-1]], axis=1
        )
        key = jnp.where(first, sB[1], jnp.int32(2**31 - 1))
        sC = jax.lax.sort((key, sB[0], sB[2]), num_keys=1, dimension=1)
        return jnp.sum(sC[0][:, :1].astype(jnp.float32))

    measure("sortBC-8k", sortBC, cb[:, :K2], p1, p2)


if __name__ == "__main__":
    main()
