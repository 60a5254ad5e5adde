"""Microbenchmarks for decoder primitives at the honest operating point.

Methodology (hard-won, see tools/README_bench_notes.md):
  * axon memoizes identical (executable, input-buffer) requests AND has a
    ~2-3 ms per-dispatch tunnel latency.  Sub-ms ops are therefore timed by
    running ITERS iterations inside ONE lax.scan dispatch, with inputs
    perturbed per-iteration on device so no step can be CSE'd/memoized.
  * calibration ops sanity-check against v5e speed of light
    (~819 GB/s HBM, ~197 TFLOP/s bf16).
"""
from __future__ import annotations

import time
import numpy as np
import jax
import jax.numpy as jnp
from jax import random

B = 128
P = 6008
K = 7000
E = 56 * 1024
S = 2_000_000
ITERS = 30


def scan_time(name, op, carry_init, bytes_moved=None, flops=None):
    """op: (carry, j) -> carry (must consume j so iterations differ)."""

    @jax.jit
    def run(carry):
        def body(c, j):
            return op(c, j), ()
        c, _ = jax.lax.scan(body, carry, jnp.arange(ITERS, dtype=jnp.int32))
        return c

    c = run(carry_init)
    jax.block_until_ready(c)
    t0 = time.perf_counter()
    c = run(carry_init)
    jax.block_until_ready(c)
    dt = time.perf_counter() - t0
    # a second distinct carry to defeat memoization of the timed call
    c2 = jax.tree.map(lambda x: x + 1 if x.dtype != jnp.bool_ else x, carry_init)
    t0 = time.perf_counter()
    c = run(c2)
    jax.block_until_ready(c)
    dt = min(dt, time.perf_counter() - t0) / ITERS
    extra = ""
    if bytes_moved:
        extra += f"  {bytes_moved/dt/1e9:7.0f} GB/s"
    if flops:
        extra += f"  {flops/dt/1e12:6.1f} TFLOP/s"
    print(f"{name:34s} {dt*1e3:8.3f} ms{extra}", flush=True)
    return dt


kk = iter(random.split(random.key(0), 64))

# ---- calibration
x0 = random.normal(next(kk), (64, 1024, 1024), dtype=jnp.float32)
scan_time("CAL elementwise 256MB r+w", lambda x, j: x + jnp.float32(1.000001), x0,
          bytes_moved=2 * x0.nbytes)
m0 = random.normal(next(kk), (4096, 4096), dtype=jnp.float32).astype(jnp.bfloat16)
scan_time("CAL bf16 matmul 4k^3",
          lambda a, j: (a @ a * jnp.bfloat16(1e-4)), m0, flops=2 * 4096**3)

# ---- decoder-shaped ops; carry = (ll, pdf, state, cost) perturbed per iter
ll0 = random.normal(next(kk), (B, P), dtype=jnp.float32)
pdf0 = random.randint(next(kk), (B, E), 0, P, dtype=jnp.int32)
st0 = random.randint(next(kk), (B, E), 0, S, dtype=jnp.int32)
c0 = random.normal(next(kk), (B, E), dtype=jnp.float32)
eidx = jnp.broadcast_to(jnp.arange(E, dtype=jnp.int32), (B, E))

def perturb_idx(idx, j, maxval):
    return (idx + j + 1) % maxval

def g_taa(cr, j):
    ll, pdf = cr
    out = jnp.take_along_axis(ll, pdf, axis=1)
    return (ll + out[:, :P] * 1e-9, perturb_idx(pdf, j, P))
scan_time("gather t_a_a (consumed)", g_taa, (ll0, pdf0),
          bytes_moved=B * E * 8)

def g_flat(cr, j):
    ll, pdf = cr
    off = jnp.arange(B, dtype=jnp.int32)[:, None] * P
    out = ll.reshape(-1)[(pdf + off).reshape(-1)].reshape(B, E)
    return (ll + out[:, :P] * 1e-9, perturb_idx(pdf, j, P))
scan_time("gather flat 1-D", g_flat, (ll0, pdf0), bytes_moved=B * E * 8)

def s2key(cr, j):
    st, c = cr
    s_s, s_c, s_i = jax.lax.sort((st, c, eidx), num_keys=2, dimension=1)
    return (perturb_idx(st, j, S), c + s_c * 1e-9)
scan_time("sort (s,c,i) 2-key", s2key, (st0, c0))

def su64(cr, j):
    st, c = cr
    cb = jax.lax.bitcast_convert_type(c, jnp.int32)
    cb = jnp.where(cb < 0, jnp.int32(-2147483648) - cb, cb)
    key = (st.astype(jnp.int64) << 32) | cb.astype(jnp.uint32).astype(jnp.int64)
    sk, si = jax.lax.sort((key, eidx), num_keys=1, dimension=1)
    return (perturb_idx(st, j, S), c + si.astype(jnp.float32) * 1e-9)
scan_time("sort u64 1-key", su64, (st0, c0))

def sf32(cr, j):
    st, c = cr
    sc, si = jax.lax.sort((c, eidx), num_keys=1, dimension=1)
    return (st, c + sc * 1e-9 + j * 1e-9)
scan_time("sort f32 1-key + idx", sf32, (st0, c0))

def tk(cr, j):
    st, c = cr
    neg, sel = jax.lax.top_k(-c, K)
    return (st, c.at[:, :K].add(neg * 1e-9) + j * 1e-9)
scan_time(f"top_k K={K}", tk, (st0, c0))

def tk128(cr, j):
    st, c = cr
    neg, sel = jax.lax.top_k(-c, 128)
    return (st, c.at[:, :128].add(neg * 1e-9) + j * 1e-9)
scan_time("top_k K=128", tk128, (st0, c0))

def hist(cr, j):
    st, c = cr
    best = jnp.min(c, axis=1, keepdims=True)
    beam, nb = 13.0, 64
    b = jnp.clip(((c - best) * (nb / beam)).astype(jnp.int32), 0, nb - 1)
    oh = jax.nn.one_hot(b, nb, dtype=jnp.float32)
    csum = jnp.cumsum(jnp.sum(oh, axis=1), axis=1)
    thr = jnp.sum(csum <= K, axis=1).astype(jnp.float32)
    return (st, c + thr[:, None] * 1e-9 + j * 1e-9)
scan_time("hist threshold 64-bin", hist, (st0, c0))

def hist_bincount(cr, j):
    st, c = cr
    best = jnp.min(c, axis=1, keepdims=True)
    beam, nb = 13.0, 64
    b = jnp.clip(((c - best) * (nb / beam)).astype(jnp.int32), 0, nb - 1)
    # segment-sum via scatter-add into [B, nb]
    hist = jnp.zeros((B, nb), jnp.float32).at[
        jnp.arange(B, dtype=jnp.int32)[:, None], b].add(1.0)
    csum = jnp.cumsum(hist, axis=1)
    thr = jnp.sum(csum <= K, axis=1).astype(jnp.float32)
    return (st, c + thr[:, None] * 1e-9 + j * 1e-9)
scan_time("hist threshold scatter-add", hist_bincount, (st0, c0))

# ---- arc row gather from [S+1, W]
for W in (64, 32, 16):
    pack = random.normal(next(kk), (S + 1, W), dtype=jnp.float32)
    sK0 = random.randint(next(kk), (B, K), 0, S, dtype=jnp.int32)

    def arg(cr, j, pack=pack):
        sK, acc = cr
        rows = pack[sK]  # [B, K, W]
        return (perturb_idx(sK, j, S), acc + rows.sum() * 1e-9)
    scan_time(f"arc-row gather [B,K,{W}]", arg, (sK0, jnp.float32(0)),
              bytes_moved=B * K * W * 4)
