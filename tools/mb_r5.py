"""Round-5 microbench: is the frame step sort-STAGE-latency-bound?

Measures lax.sort cost vs width (stages ~ log^2 width), operand count
(bytes per stage), and batch rows B (width of each stage).  If cost is
~flat in B and ~log-ish in width, the selection pipeline is bound by the
sequential bitonic stage count, and (a) larger B is near-free throughput,
(b) fusing the sortB/sortC/winner chain into one Pallas kernel removes
per-sort overhead.  Run: python tools/mb_r5.py
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("VOSK_TPU_XLA_CACHE", "/tmp/vosk_tpu_xla_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import jax.numpy as jnp
import numpy as np

from _mbutil import measure, carry_dep  # noqa: E402

S = 2_000_000


def main():
    rng = np.random.default_rng(0)

    # sort width scaling at B=96, 3 ops (the sortA/sortB/sortC shape)
    for W in (3500, 7000, 14000, 28000):
        cb = jnp.asarray(rng.integers(0, 2**30, (96, W)).astype(np.int32))
        p1 = jnp.asarray(rng.integers(0, S, (96, W)).astype(np.int32))
        p2 = jnp.asarray(rng.integers(0, W, (96, W)).astype(np.int32))

        def s3(c, cb, p1, p2):
            out = jax.lax.sort((cb + carry_dep(c), p1, p2), num_keys=1,
                               dimension=1)
            return jnp.sum(out[0][:, :1].astype(jnp.float32))

        measure(f"sort3-B96-{W}", s3, cb, p1, p2)

    # B scaling at width 14000
    for B in (24, 48, 96, 192):
        cb = jnp.asarray(rng.integers(0, 2**30, (B, 14000)).astype(np.int32))
        p1 = jnp.asarray(rng.integers(0, S, (B, 14000)).astype(np.int32))
        p2 = jnp.asarray(rng.integers(0, 14000, (B, 14000)).astype(np.int32))

        def s3b(c, cb, p1, p2):
            out = jax.lax.sort((cb + carry_dep(c), p1, p2), num_keys=1,
                               dimension=1)
            return jnp.sum(out[0][:, :1].astype(jnp.float32))

        measure(f"sort3-{B}x14000", s3b, cb, p1, p2)

    # operand count at B=96, width 14000
    cb = jnp.asarray(rng.integers(0, 2**30, (96, 14000)).astype(np.int32))
    p1 = jnp.asarray(rng.integers(0, S, (96, 14000)).astype(np.int32))
    p2 = jnp.asarray(rng.integers(0, 14000, (96, 14000)).astype(np.int32))

    def s1(c, cb):
        out = jax.lax.sort((cb + carry_dep(c),), num_keys=1, dimension=1)
        return jnp.sum(out[0][:, :1].astype(jnp.float32))

    def s2k(c, cb, p1, p2):
        out = jax.lax.sort((p1 + carry_dep(c), cb, p2), num_keys=2,
                           dimension=1)
        return jnp.sum(out[0][:, :1].astype(jnp.float32))

    measure("sort1-96x14000", s1, cb)
    measure("sort3k2-96x14000", s2k, cb, p1, p2)

    # the full v4 selection block (sortB+sortC+wheres) in isolation,
    # on a cost-ordered pool like sortA's output
    sA0 = jnp.sort(cb, axis=1)

    def sel(c, sA0, p1, p2):
        K = 7000
        sB = jax.lax.sort((p1, sA0 + carry_dep(c), p2), num_keys=2,
                          dimension=1)
        first = jnp.concatenate(
            [jnp.ones((96, 1), bool), sB[0][:, 1:] != sB[0][:, :-1]], axis=1)
        alive = first & (sB[0] != S) & (sB[1] < 2**30)
        key = jnp.where(alive, sB[1], 2**30)
        sC = jax.lax.sort((key, sB[0], sB[2]), num_keys=1, dimension=1)
        return jnp.sum(sC[0][:, :K][:, :1].astype(jnp.float32))

    measure("selBC-96x14000", sel, sA0, p1, p2)


if __name__ == "__main__":
    main()
