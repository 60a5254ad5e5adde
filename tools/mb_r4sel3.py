"""Round-4 microbench part 3: row-gather width scaling + sortBC sizes.

Run: python tools/mb_r4sel3.py
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

B, K, M, S = 96, 7000, 8, 2_000_000
E = K * M


from _mbutil import measure, carry_dep  # noqa: E402


def main():
    rng = np.random.default_rng(0)
    measure("noop", lambda c, x: jnp.sum(x[:, :8].astype(jnp.float32)),
            jnp.zeros((B, 8), jnp.int32))

    idx = jnp.asarray(rng.integers(0, S, (B, K)).astype(np.int32))

    def rowg(c, t, ix):
        rows = t[ix + carry_dep(c)]
        return jnp.sum(rows[:, :1, :1])

    for lanes in (16, 8, 4, 2, 1):
        tbl = jnp.asarray(
            rng.standard_normal((S + 1, lanes)).astype(np.float32))
        measure(f"rowg-{lanes}lane", rowg, tbl, idx)

    # flat element gather [B, K] from [S] (lanes=0 case)
    tbl1 = jnp.asarray(rng.standard_normal((S + 1,)).astype(np.float32))

    def eg(c, t, ix):
        v = t[ix + carry_dep(c)]
        return jnp.sum(v[:, :1])

    measure("elemg-7k", eg, tbl1, idx)

    # half the rows (ragged-ish): K/2 rows of 16 lanes
    tbl16 = jnp.asarray(rng.standard_normal((S + 1, 16)).astype(np.float32))
    measure("rowg-16l-3.5k", rowg, tbl16, idx[:, : K // 2])

    # sortBC at several widths
    cb = jnp.asarray(rng.integers(0, 2**30, (B, 16384)).astype(np.int32))
    p1 = jnp.asarray(rng.integers(0, S, (B, 16384)).astype(np.int32))
    p2 = jnp.asarray(rng.integers(0, E, (B, 16384)).astype(np.int32))

    def sortBC(c, cb, p1, p2):
        sB = jax.lax.sort((p1, cb + c.astype(jnp.int32), p2), num_keys=2,
                          dimension=1)
        first = jnp.concatenate(
            [jnp.ones((B, 1), bool), sB[0][:, 1:] != sB[0][:, :-1]], axis=1
        )
        key = jnp.where(first, sB[1], jnp.int32(2**31 - 1))
        sC = jax.lax.sort((key, sB[0], sB[2]), num_keys=1, dimension=1)
        return jnp.sum(sC[0][:, :1].astype(jnp.float32))

    for n, tag in ((14000, "14k"), (9000, "9k"), (8192, "8k2"), (7000, "7k")):
        measure(f"sortBC-{tag}", sortBC, cb[:, :n], p1[:, :n], p2[:, :n])


if __name__ == "__main__":
    main()
