"""Shared microbench harness for tools/mb_*.py.

`measure` times a jitted ITERS-step scan of `fn(carry, *args)` and reports
the best per-iteration time.  `carry_dep(c)` produces a runtime-zero int32
that DEPENDS on the loop carry but that XLA's algebraic simplifier cannot
fold away (ADVICE r4: `c & 0` folds to 0, letting LICM hoist gathers out of
the loop and under-report cost by up to 10x).  Add it to any gather index
you want to keep inside the loop.
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

ITERS = 10


def carry_dep(c):
    """Runtime-zero int32 depending on the (float) carry; unfoldable."""
    return (c > jnp.float32(1e9)).astype(jnp.int32)


def measure(name, fn, *args, iters: int = ITERS, reps: int = 3):
    @jax.jit
    def run(*a):
        def body(c, _):
            out = fn(c, *a)
            return (c + out * 1e-30) % 1.0, ()

        c, _ = jax.lax.scan(body, jnp.float32(0), None, length=iters)
        return c

    np.asarray(run(*args))  # compile
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(run(*args))
        best = min(best, (time.perf_counter() - t0) / iters)
    print(f"{name:16s} {best*1e3:8.3f} ms", flush=True)
    return best
