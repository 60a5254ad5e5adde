"""In-scan timing of candidate-selection strategies at bench shapes:
exact sort3+topk vs approx_max_k prefilter vs packed-u64 single sort.
Loops inside one jit (lax.scan) so per-dispatch tunnel latency is amortized.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

B = int(os.environ.get("B", "256"))
K = int(os.environ.get("K", "1000"))
E = K * 8
N_ITER = 30


def bench(name, body):
    @jax.jit
    def run(ns, cost):
        def step(carry, _):
            ns, cost = carry
            out_ns, out_cost = body(ns, cost)
            # feed outputs back so each iteration depends on the previous
            W = out_ns.shape[1]
            ns2 = jnp.where(
                jnp.arange(E)[None, :] < W, 0, ns
            ) + jnp.pad(out_ns[:, :E], ((0, 0), (0, max(E - W, 0))), constant_values=0)
            ns2 = jnp.abs(ns2) % 50000
            cost2 = cost + 1e-6 * jnp.pad(out_cost[:, :E], ((0, 0), (0, max(E - W, 0))), constant_values=0.0)
            cost2 = jnp.where(jnp.isfinite(cost2), cost2, 20.0)
            return (ns2, cost2), None

        (ns, cost), _ = jax.lax.scan(step, (ns, cost), None, length=N_ITER)
        return ns

    rng = np.random.default_rng(0)
    ns = jnp.asarray(rng.integers(0, 50000, (B, E)).astype(np.int32))
    cost = jnp.asarray(rng.uniform(0, 20, (B, E)).astype(np.float32))
    out = run(ns, cost)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = run(ns, cost)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / N_ITER
    print(f"{name:28s} {dt*1e3:8.2f} ms/iter")


def main():
    def exact(ns, cost):
        idx = jnp.broadcast_to(jnp.arange(E, dtype=jnp.int32), ns.shape)
        s_ns, s_cost, s_idx = jax.lax.sort((ns, cost, idx), num_keys=2, dimension=1)
        first = jnp.concatenate(
            [jnp.ones(ns.shape[:1] + (1,), bool), s_ns[:, 1:] != s_ns[:, :-1]], axis=1
        )
        w = jnp.where(first, s_cost, jnp.inf)
        neg, sel = jax.lax.top_k(-w, K)
        return (s_ns.take_along_axis(sel, axis=1) if hasattr(s_ns, 'take_along_axis') else jnp.take_along_axis(s_ns, sel, axis=1), -neg)

    bench("sort3 + topk (exact)", exact)

    def packed(ns, cost):
        cost_bits = jax.lax.bitcast_convert_type(cost, jnp.uint32)
        # IEEE float sortable transform (costs > 0 here, so identity works)
        key = (ns.astype(jnp.uint64) << jnp.uint64(32)) | cost_bits.astype(jnp.uint64)
        s = jax.lax.sort(key, dimension=1)
        s_ns = (s >> jnp.uint64(32)).astype(jnp.int32)
        first = jnp.concatenate(
            [jnp.ones(ns.shape[:1] + (1,), bool), s_ns[:, 1:] != s_ns[:, :-1]], axis=1
        )
        s_cost = jax.lax.bitcast_convert_type(
            (s & jnp.uint64(0xFFFFFFFF)).astype(jnp.uint32), jnp.float32
        )
        w = jnp.where(first, s_cost, jnp.inf)
        neg, sel = jax.lax.top_k(-w, K)
        return (jnp.take_along_axis(s_ns, sel, axis=1), -neg)

    bench("packed-u64 sort + topk", packed)

    def approx_pref(ns, cost):
        # stage 1: approx top 2K by cost (negated)
        neg, sel = jax.lax.approx_max_k(-cost, 2 * K)
        ns2 = jnp.take_along_axis(ns, sel, axis=1)
        cost2 = -neg
        idx = jnp.broadcast_to(jnp.arange(2 * K, dtype=jnp.int32), ns2.shape)
        s_ns, s_cost, s_idx = jax.lax.sort((ns2, cost2, idx), num_keys=2, dimension=1)
        first = jnp.concatenate(
            [jnp.ones(ns.shape[:1] + (1,), bool), s_ns[:, 1:] != s_ns[:, :-1]], axis=1
        )
        w = jnp.where(first, s_cost, jnp.inf)
        neg2, sel2 = jax.lax.top_k(-w, K)
        return (jnp.take_along_axis(s_ns, sel2, axis=1), -neg2)

    bench("approx_max_k 2K + sort2K", approx_pref)

    def approx_only(ns, cost):
        neg, sel = jax.lax.approx_max_k(-cost, K)
        return (jnp.take_along_axis(ns, sel, axis=1), -neg)

    bench("approx_max_k only (no dedup)", approx_only)

    def topk_only(ns, cost):
        neg, sel = jax.lax.top_k(-cost, K)
        return (jnp.take_along_axis(ns, sel, axis=1), -neg)

    bench("exact top_k only", topk_only)

    def sort_only(ns, cost):
        s_ns, s_cost = jax.lax.sort((ns, cost), num_keys=2, dimension=1)
        return (s_ns, s_cost)

    bench("sort2 only", sort_only)


if __name__ == "__main__":
    main()
