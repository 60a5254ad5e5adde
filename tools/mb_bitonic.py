"""Can a hand-rolled bitonic network beat lax.sort on TPU for the frame
step's [B, E] selection sorts?  Also: how much does sort stability cost
(lax.sort defaults to is_stable=True; the bitonic tie behavior is
deterministic but not input-stable).

Run: python tools/mb_bitonic.py
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


def bitonic_sort(key, *payload):
    """Ascending bitonic sort along axis 1 (length must be a power of 2).
    Pure jnp (reshape + min/max/where): every stage is elementwise over
    the whole array, so XLA/Mosaic can keep it in registers/VMEM."""
    B, E = key.shape
    assert (E & (E - 1)) == 0, "power-of-2 length"
    ops = (key,) + payload

    def stage(ops, k, j):
        out = []
        key = ops[0]
        a = key.reshape(B, E // (2 * j), 2, j)
        lo, hi = a[:, :, 0], a[:, :, 1]
        # ascending iff (block_base & k) == 0
        base = (jnp.arange(E // (2 * j), dtype=jnp.int32) * (2 * j))
        asc = ((base & k) == 0)[None, :, None]
        swap = jnp.where(asc, lo > hi, lo < hi)
        for x in ops:
            xa = x.reshape(B, E // (2 * j), 2, j)
            xl, xh = xa[:, :, 0], xa[:, :, 1]
            nl = jnp.where(swap, xh, xl)
            nh = jnp.where(swap, xl, xh)
            out.append(jnp.stack([nl, nh], axis=2).reshape(B, E))
        return tuple(out)

    k = 2
    while k <= E:
        j = k // 2
        while j >= 1:
            ops = stage(ops, k, j)
            j //= 2
        k *= 2
    return ops


def main():
    rng = np.random.default_rng(0)
    for W in (4096, 32768):
        cb = jnp.asarray(rng.integers(0, 2**30, (96, W)).astype(np.int32))
        p1 = jnp.asarray(rng.integers(0, 2**21, (96, W)).astype(np.int32))
        p2 = jnp.asarray(rng.integers(0, W, (96, W)).astype(np.int32))

        # correctness check once (small W only; bitonic is not stable but
        # the KEY order must match)
        if W == 4096:
            ref = jax.lax.sort((cb, p1, p2), num_keys=1, dimension=1)
            got = bitonic_sort(cb, p1, p2)
            np.testing.assert_array_equal(np.asarray(ref[0]),
                                          np.asarray(got[0]))
            print("bitonic key order == lax.sort ✓", flush=True)

        def lx(c, cb, p1, p2):
            out = jax.lax.sort((cb + carry_dep(c), p1, p2), num_keys=1,
                               dimension=1)
            return jnp.sum(out[0][:, :1].astype(jnp.float32))

        def lx_unstable(c, cb, p1, p2):
            out = jax.lax.sort((cb + carry_dep(c), p1, p2), num_keys=1,
                               dimension=1, is_stable=False)
            return jnp.sum(out[0][:, :1].astype(jnp.float32))

        def bt(c, cb, p1, p2):
            out = bitonic_sort(cb + carry_dep(c), p1, p2)
            return jnp.sum(out[0][:, :1].astype(jnp.float32))

        measure(f"laxsort-{W}", lx, cb, p1, p2)
        measure(f"laxsort-unstable-{W}", lx_unstable, cb, p1, p2)
        measure(f"bitonic-{W}", bt, cb, p1, p2)


if __name__ == "__main__":
    main()
