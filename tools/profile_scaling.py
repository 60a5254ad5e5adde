"""How do sort/top_k/row-gather costs scale with channel batch B?
Determines the throughput-optimal operating point for the decode step."""
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
    K = int(os.environ.get("K", "1000"))
    S = int(os.environ.get("S", "50000"))
    MAXOUT = 8
    E = K * MAXOUT
    rng = np.random.default_rng(0)
    # dense padded arc table: [S, MAXOUT, 4] fields packed as f32 rows
    arc_rows = jnp.asarray(rng.standard_normal((S, MAXOUT * 4)).astype(np.float32))

    for B in (32, 128, 512):
        tok = jnp.asarray(rng.integers(0, S, (B, K)).astype(np.int32))
        ns = jnp.asarray(rng.integers(0, S, (B, E)).astype(np.int32))
        cost = jnp.asarray(rng.uniform(0, 20, (B, E)).astype(np.float32))

        def row_gather(tok):
            return arc_rows[tok]  # [B, K, MAXOUT*4]

        t_g = timeit(jax.jit(row_gather), tok)

        def sort3(ns, cost):
            idx = jnp.broadcast_to(jnp.arange(E, dtype=jnp.int32), ns.shape)
            return jax.lax.sort((ns, cost, idx), num_keys=2, dimension=1)

        t_s3 = timeit(jax.jit(sort3), ns, cost)

        def sort2(ns, cost):
            return jax.lax.sort((ns, cost), num_keys=2, dimension=1)

        t_s2 = timeit(jax.jit(sort2), ns, cost)

        def topk(cost):
            return jax.lax.top_k(-cost, K)

        t_k = timeit(jax.jit(topk), cost)

        # packed single-key sort: key = ns * 2048 + quantized-cost-rank proxy
        def sort1(ns, cost):
            key = ns.astype(jnp.uint32) * jnp.uint32(2048) + jnp.clip(
                (cost * 10).astype(jnp.uint32), 0, 2047
            )
            return jax.lax.sort(key, dimension=1)

        t_s1 = timeit(jax.jit(sort1), ns, cost)

        per_frame = t_g + t_s3 + t_k
        audio_per_s = B * 0.03 / per_frame
        print(
            f"B={B:4d}: rowgather {t_g*1e3:7.2f}  sort3 {t_s3*1e3:7.2f}  "
            f"sort2 {t_s2*1e3:7.2f}  sort1 {t_s1*1e3:7.2f}  topk {t_k*1e3:7.2f} ms"
            f"  -> est {audio_per_s:7.0f} audio-s/s"
        )


if __name__ == "__main__":
    main()
