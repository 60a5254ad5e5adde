"""Microbench: frame-step pieces at the honest operating point.

Each measured op runs ITERS times inside one lax.scan with a scalar
carry-dependence injected into the first argument so XLA cannot hoist it;
a baseline loop (carry-add only) is subtracted.  One device program per
measurement, so the ~70 ms axon-tunnel dispatch is amortized and removed.
"""
from __future__ import annotations

import time
import jax
import jax.numpy as jnp
import numpy as np
from jax import random

ITERS = 40
B, K, M, P, S = 64, 7000, 8, 6008, 2_000_000
E = K * M

_base_cache = {}


def _measure(fn, args, iters):
    @jax.jit
    def run(*a):
        def body(c, _):
            a0 = jax.tree.map(
                lambda x: x + c.astype(x.dtype) if jnp.issubdtype(x.dtype, jnp.floating) else x,
                a[0],
            )
            out = fn(a0, *a[1:])
            leaves = jax.tree.leaves(out)
            s = sum(jnp.sum(x[..., :1].astype(jnp.float32)) for x in leaves)
            return (c + s * 1e-30) % 1.0, ()
        c, _ = jax.lax.scan(body, jnp.float32(0), None, length=iters)
        return c

    np.asarray(run(*args))
    dts = []
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(run(*args))
        dts.append(time.perf_counter() - t0)
    return sorted(dts)[1] / iters


def timed(name, fn, *args, iters=ITERS):
    # baseline: the carry-injection add alone on args[0]
    shape_key = tuple((x.shape, str(x.dtype)) for x in jax.tree.leaves(args[0]))
    if shape_key not in _base_cache:
        _base_cache[shape_key] = _measure(lambda a0, *r: (a0,), args, iters)
    base = _base_cache[shape_key]
    dt = _measure(fn, args, iters) - base
    print(f"{name:56s} {dt*1e3:9.3f} ms", flush=True)
    return dt


def main():
    kk = iter(random.split(random.key(0), 32))

    med = random.uniform(next(kk), (64, 8192), jnp.float32)
    timed("sort [64,8192] 1 op", lambda x: jax.lax.sort((x,), num_keys=1, dimension=1), med)

    cost = random.uniform(next(kk), (B, E), jnp.float32, 0.0, 30.0)
    timed(f"sort [B,{E}] 1 op", lambda x: jax.lax.sort((x,), num_keys=1, dimension=1), cost)

    ns = random.randint(next(kk), (B, E), 0, S, jnp.int32)
    pays = [random.randint(next(kk), (B, E), 0, 1 << 20, jnp.int32) for _ in range(6)]
    for k in (1, 3, 6):
        timed(f"sort [B,{E}] cost key + ns + {k} payloads",
              lambda x, *o: jax.lax.sort((x,) + o, num_keys=1, dimension=1),
              cost, ns, *pays[:k])
    timed(f"sort [B,{E}] 2key (ns,cost) + 5 payloads",
          lambda x, n, *o: jax.lax.sort((n, x) + o, num_keys=2, dimension=1),
          cost, ns, *pays[:5])

    timed(f"top_k [B,{E}] k={K}", lambda c: jax.lax.top_k(-c, K), cost)
    timed(f"approx_max_k [B,{E}] k=2K", lambda c: jax.lax.approx_max_k(-c, 2 * K), cost)

    # small sorts at K''=2K
    cost2 = cost[:, : 2 * K]
    ns2 = ns[:, : 2 * K]
    p2 = [p[:, : 2 * K] for p in pays]
    timed(f"sort [B,{2*K}] 2key + 5 payloads",
          lambda x, n, *o: jax.lax.sort((n, x) + o, num_keys=2, dimension=1),
          cost2, ns2, *p2[:5])

    # acoustic gather variants
    ll = random.normal(next(kk), (B, P), jnp.float32)
    pdf = random.randint(next(kk), (B, E), 0, P, jnp.int32)
    timed("ac take_along_axis [B,E] from [B,P]",
          lambda l, p: jnp.take_along_axis(l, p, axis=1), ll, pdf)

    HI = (P + 127) // 128
    Ppad = HI * 128
    TILE = 3584  # E/TILE integer-ish: 56000/3500=16; use scan over 16 tiles of 3500? need mult of 8
    # E = 56000 = 16 * 3500; 3500 not 128-mult. reshape to [B, 437.5, 128] no.
    # do one-hot in full instead, tiled by scan chunks of 2000 (rows only matter)
    def onehot2(ll, pdf):
        ll2 = jnp.pad(ll, ((0, 0), (0, Ppad - P))).reshape(B, HI, 128)
        hi = pdf // 128
        lo = pdf % 128
        nT = 16
        T = E // nT
        def chunk(carry, xs):
            hi_c, lo_c = xs
            oh_hi = (hi_c[:, :, None] == jnp.arange(HI, dtype=jnp.int32)).astype(jnp.float32)
            rows = jnp.einsum("bth,bhl->btl", oh_hi, ll2)
            oh_lo = lo_c[:, :, None] == jnp.arange(128, dtype=jnp.int32)
            ac = jnp.sum(jnp.where(oh_lo, rows, 0.0), axis=2)
            return carry, ac
        xs = (hi.reshape(B, nT, T).swapaxes(0, 1), lo.reshape(B, nT, T).swapaxes(0, 1))
        _, acs = jax.lax.scan(chunk, 0, xs)
        return acs.swapaxes(0, 1).reshape(B, E)
    timed("ac two-level one-hot (XLA)", onehot2, ll, pdf)

    # arc-row gather at honest scale
    pack = random.normal(next(kk), (S + 1, 4 * M), jnp.float32)
    tok = random.randint(next(kk), (B, K), 0, S, jnp.int32)
    timed(f"arc-row gather [B,K]x{4*M}f32 from [S+1,{4*M}]",
          lambda p, t: p[t], pack, tok)
    timed("arc-row gather bf16", lambda p, t: p[t], pack.astype(jnp.bfloat16), tok)

    flat = random.normal(next(kk), (S + 1,), jnp.float32)
    timed("flat gather [B,K] from [S+1]", lambda f, t: f[t], flat, tok)
    timed("flat gather [B,E] from [S+1]", lambda f, t: f[t], flat, ns)

    w = random.normal(next(kk), (B, E), jnp.float32)
    cost0 = random.normal(next(kk), (B, K), jnp.float32)
    timed("repeat+add+where [B,E]",
          lambda w, c: jnp.where(jnp.isfinite(w), jnp.repeat(c, M, axis=1) + w, jnp.inf),
          w, cost0)


if __name__ == "__main__":
    main()
