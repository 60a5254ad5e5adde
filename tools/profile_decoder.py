"""Micro-profile of decoder frame-step components at bench shapes.

Times each stage in isolation (batched over channels, single frame):
expand (searchsorted+gathers), dedup variants (sort vs scatter), top_k.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, n=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def main():
    B = int(os.environ.get("VOSK_TPU_BENCH_B", "32"))
    K = int(os.environ.get("VOSK_TPU_BENCH_MAX_ACTIVE", "1000"))
    S = int(os.environ.get("VOSK_TPU_BENCH_STATES", "50000"))
    E = K * 8
    rng = np.random.default_rng(0)

    cnt = jnp.asarray(rng.integers(4, 9, (B, K)).astype(np.int32))
    tok_state = jnp.asarray(rng.integers(0, S, (B, K)).astype(np.int32))
    tok_cost = jnp.asarray(rng.uniform(0, 10, (B, K)).astype(np.float32))
    ns = jnp.asarray(rng.integers(0, S, (B, E)).astype(np.int32))
    cost = jnp.asarray(rng.uniform(0, 20, (B, E)).astype(np.float32))
    mask = jnp.asarray(rng.random((B, E)) < 0.9)
    arc_table = jnp.asarray(rng.integers(0, S, (S * 8,)).astype(np.int32))
    off = jnp.asarray((np.arange(S + 1) * 8).astype(np.int32))

    def expand_searchsorted(cnt, method):
        def one(c):
            cum = jnp.cumsum(c)
            e = jnp.arange(E, dtype=jnp.int32)
            return jnp.searchsorted(cum, e, side="right", method=method)

        return jax.vmap(one)(cnt)

    for method in ("scan", "sort", "compare_all"):
        try:
            t = timeit(jax.jit(lambda c, m=method: expand_searchsorted(c, m)), cnt)
            print(f"searchsorted[{method}]: {t*1e3:8.2f} ms")
        except Exception as e:  # noqa: BLE001
            print(f"searchsorted[{method}]: failed {type(e).__name__}")

    # repeat-style expansion alternative: cumsum + one-hot scatter-add free
    def gather_arcs(tok_state):
        def one(ts):
            o = off[ts]
            return arc_table[jnp.clip(o[:, None] + jnp.arange(8)[None, :], 0, S * 8 - 1)]

        return jax.vmap(one)(tok_state)

    print(f"arc gather KxMax: {timeit(jax.jit(gather_arcs), tok_state)*1e3:8.2f} ms")

    def dedup_sort(ns, cost, mask):
        def one(n_, c_, m_):
            nsm = jnp.where(m_, n_, S)
            cm = jnp.where(m_, c_, jnp.inf)
            idx = jnp.arange(E, dtype=jnp.int32)
            s_ns, s_c, s_i = jax.lax.sort((nsm, cm, idx), num_keys=2)
            first = jnp.concatenate([jnp.ones((1,), bool), s_ns[1:] != s_ns[:-1]])
            w = jnp.where(first, s_c, jnp.inf)
            neg, sel = jax.lax.top_k(-w, K)
            return s_ns[sel], -neg

        return jax.vmap(one)(ns, cost, mask)

    print(f"dedup sort+topk: {timeit(jax.jit(dedup_sort), ns, cost, mask)*1e3:8.2f} ms")

    def sort_only(ns, cost):
        def one(n_, c_):
            return jax.lax.sort((n_, c_), num_keys=2)

        return jax.vmap(one)(ns, cost)

    print(f"sort only:       {timeit(jax.jit(sort_only), ns, cost)*1e3:8.2f} ms")

    def topk_only(cost):
        return jax.lax.top_k(-cost, K)

    print(f"top_k only:      {timeit(jax.jit(topk_only), cost)*1e3:8.2f} ms")

    def dedup_scatter(ns, cost, mask):
        def one(n_, c_, m_):
            nsm = jnp.where(m_, n_, S)
            cm = jnp.where(m_, c_, jnp.inf)
            table = jnp.full((S + 1,), jnp.inf).at[nsm].min(cm)
            win = (cm <= table[nsm]) & m_
            idx = jnp.arange(E, dtype=jnp.int32)
            owner = jnp.full((S + 1,), 2**31 - 1).at[nsm].min(jnp.where(win, idx, 2**31 - 1))
            winner = win & (idx == owner[nsm])
            w = jnp.where(winner, cm, jnp.inf)
            neg, sel = jax.lax.top_k(-w, K)
            return nsm[sel], -neg

        return jax.vmap(one)(ns, cost, mask)

    print(f"dedup scatter:   {timeit(jax.jit(dedup_scatter), ns, cost, mask)*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
