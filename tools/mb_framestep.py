"""Composite frame-step microbenchmark for the v2 decoder design.

Simulates the full planned frame step at the honest operating point
(max_active=7000 on a 2M-state graph) without building a real graph:
  1. arc-row gather  pack[tok_state] -> [B, K, 4M] (w,ns,pdf,olabel)
  2. candidate costs tok_cost + w (graph only; pdf-on-state defers acoustic)
  3. u64 sort by (next_state, cost) -> dedup-first mask
  4. top-K selection on deduped graph costs
  5. acoustic add on K survivors: ll[b, pdf_k]  ([B,K] gather)
  6. records selects (prev, olabel, pdf) via take_along_axis
Prints ms/frame for several (K, M, B) configs. Timing: ITERS frames inside
one lax.scan dispatch, fetched to host (axon block_until_ready lies).
"""
from __future__ import annotations

import time
import jax
import jax.numpy as jnp
import numpy as np
from jax import random

ITERS = 10


def frame_step(pack, ll, tok_state, tok_cost, S, K, M, beam=13.0, scale=1.0):
    B = tok_state.shape[0]
    E = K * M
    rows = pack[tok_state]  # [B, K, 4M]
    w = rows[:, :, :M].reshape(B, E)
    ns = jax.lax.bitcast_convert_type(rows[:, :, M:2*M], jnp.int32).reshape(B, E)
    pdf = jax.lax.bitcast_convert_type(rows[:, :, 2*M:3*M], jnp.int32).reshape(B, E)
    olab = jax.lax.bitcast_convert_type(rows[:, :, 3*M:], jnp.int32).reshape(B, E)

    cost = jnp.repeat(tok_cost, M, axis=1) + w  # graph-only
    mask = jnp.isfinite(w)
    nsm = jnp.where(mask, ns, S)
    cm = jnp.where(mask, cost, jnp.float32(3e38))

    # u64 single-key sort by (state, cost)
    cb = jax.lax.bitcast_convert_type(cm, jnp.int32)
    cb = jnp.where(cb < 0, jnp.int32(-2147483648) - cb, cb)
    key = (nsm.astype(jnp.int64) << 32) | cb.astype(jnp.uint32).astype(jnp.int64)
    eidx = jnp.broadcast_to(jnp.arange(E, dtype=jnp.int32), (B, E))
    skey, sidx = jax.lax.sort((key, eidx), num_keys=1, dimension=1)
    s_ns = (skey >> 32).astype(jnp.int32)
    first = jnp.concatenate([jnp.ones((B, 1), bool), s_ns[:, 1:] != s_ns[:, :-1]], axis=1)
    scost_b = skey.astype(jnp.int32)  # low 32 bits (order-encoded cost)
    raw = jnp.where(scost_b < 0, jnp.int32(-2147483648) - scost_b, scost_b)
    s_cost = jax.lax.bitcast_convert_type(raw, jnp.float32)

    wcost = jnp.where(first & (s_ns != S), s_cost, jnp.float32(3e38))
    neg, sel2 = jax.lax.top_k(-wcost, K)
    new_cost = -neg
    new_state = jnp.take_along_axis(s_ns, sel2, axis=1)
    sel = jnp.take_along_axis(sidx, sel2, axis=1)  # original candidate ids [B,K]

    # acoustic on survivors only (pdf-on-state)
    sel_pdf = jnp.take_along_axis(pdf, sel, axis=1)
    ac = jnp.take_along_axis(ll, jnp.maximum(sel_pdf, 0), axis=1)
    new_cost = new_cost - scale * ac
    best = jnp.min(new_cost, axis=1, keepdims=True)
    keep = new_cost <= best + beam
    new_state = jnp.where(keep, new_state, S)
    new_cost = jnp.where(keep, new_cost, jnp.float32(3e38))

    rec_prev = jnp.where(keep, sel // M, -1)
    rec_olab = jnp.where(keep, jnp.take_along_axis(olab, sel, axis=1), 0)
    return new_state, new_cost, (rec_prev, rec_olab, sel_pdf)


def bench(B, K, M, S, P=6008):
    E = K * M
    kk = iter(random.split(random.key(0), 16))
    # pack: [S+1, 4M]; random next states, finite weights for ~70% of slots
    wcol = random.uniform(next(kk), (S + 1, M), jnp.float32, 0.1, 8.0)
    drop = random.uniform(next(kk), (S + 1, M)) > 0.7
    wcol = jnp.where(drop, jnp.float32(jnp.inf), wcol)
    nscol = random.randint(next(kk), (S + 1, M), 0, S, jnp.int32)
    pdfcol = random.randint(next(kk), (S + 1, M), 0, P, jnp.int32)
    olcol = random.randint(next(kk), (S + 1, M), 0, 1000, jnp.int32)
    pack = jnp.concatenate([
        wcol,
        jax.lax.bitcast_convert_type(nscol, jnp.float32),
        jax.lax.bitcast_convert_type(pdfcol, jnp.float32),
        jax.lax.bitcast_convert_type(olcol, jnp.float32),
    ], axis=1)
    ll = random.normal(next(kk), (B, P), jnp.float32)

    def mkstate(v):
        k1, k2 = random.split(random.key(v + 77))
        return (random.randint(k1, (B, K), 0, S, jnp.int32),
                random.uniform(k2, (B, K), jnp.float32, 0.0, 10.0))

    @jax.jit
    def run(pack, ll, st, co):
        def body(c, j):
            s, c2 = c
            ns_, nc_, recs = frame_step(pack, ll, s, c2, S, K, M)
            return (ns_, nc_ - jnp.min(nc_, axis=1, keepdims=True)), recs
        (s, c2), recs = jax.lax.scan(body, (st, co), jnp.arange(ITERS, dtype=jnp.int32))
        return s, c2, jax.tree.map(lambda r: r.sum(), recs)

    st, co = mkstate(0)
    out = run(pack, ll, st, co)
    np.asarray(out[0])
    dts = []
    for v in (1, 2, 3):
        st, co = mkstate(v)
        jax.block_until_ready((st, co))
        t0 = time.perf_counter()
        out = run(pack, ll, st, co)
        np.asarray(out[0]); np.asarray(out[1])
        dts.append((time.perf_counter() - t0) / ITERS)
    dt = sorted(dts)[1]
    thr = B * 0.03 / dt
    print(f"B={B:4d} K={K:5d} M={M} S={S}: {dt*1e3:8.3f} ms/frame -> {thr:7.0f} audio-s/s",
          flush=True)


if __name__ == "__main__":
    bench(B=128, K=1000, M=8, S=50_000)
    bench(B=128, K=7000, M=4, S=2_000_000)
    bench(B=128, K=7000, M=8, S=2_000_000)
    bench(B=256, K=7000, M=4, S=2_000_000)
    bench(B=128, K=2000, M=4, S=2_000_000)
