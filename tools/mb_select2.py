"""Microbench: candidate primitives for the v3 frame step at the honest
operating point (B=64, K=7000, M=8 -> E=56k candidates/channel, P=6008).

Measures, per frame-equivalent call:
  1. acoustic gather ll[b, pdf]:
     a. jnp.take_along_axis          (current, known slow)
     b. two-level one-hot (matmul over hi-rows, mask-reduce over lanes), XLA
     c. same as Pallas kernel
     d. Pallas in-kernel jnp.take    (does Mosaic support dynamic gather?)
  2. big selection over [B, E]:
     a. lax.sort (costbits,+k payloads) for k in 2,4,7
     b. lax.sort single i64 key + 1 payload
     c. jax.lax.approx_max_k(k=2K)
     d. lax.top_k(k=2K)
Timing: ITERS calls inside one scan, result pulled to host.
"""
from __future__ import annotations

import time
import functools
import jax
import jax.numpy as jnp
import numpy as np
from jax import random

ITERS = 10
B, K, M, P = 64, 7000, 8, 6008
E = 57344  # K*M = 56000 padded up to 2048*28 for clean tiling


def timed(name, fn, *args):
    @jax.jit
    def run(*a):
        def body(c, _):
            out = fn(*a)
            # fold outputs into a small carry so nothing is DCE'd
            s = sum(jnp.sum(x[..., :1].astype(jnp.float32)) for x in jax.tree.leaves(out))
            return c + s, ()
        c, _ = jax.lax.scan(body, jnp.float32(0), None, length=ITERS)
        return c

    out = run(*args)
    np.asarray(out)
    dts = []
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(run(*args))
        dts.append((time.perf_counter() - t0) / ITERS)
    dt = sorted(dts)[1]
    print(f"{name:42s} {dt*1e3:9.3f} ms", flush=True)
    return dt


def main():
    kk = iter(random.split(random.key(0), 32))
    ll = random.normal(next(kk), (B, P), jnp.float32)
    pdf = random.randint(next(kk), (B, E), 0, P, jnp.int32)
    cost = random.uniform(next(kk), (B, E), jnp.float32, 0.0, 30.0)
    ns = random.randint(next(kk), (B, E), 0, 2_000_000, jnp.int32)
    pays = [random.randint(next(kk), (B, E), 0, 1 << 20, jnp.int32) for _ in range(6)]

    # -------- 1a take_along_axis
    timed("ac: take_along_axis", lambda ll, pdf: jnp.take_along_axis(ll, pdf, axis=1), ll, pdf)

    # -------- 1b two-level one-hot, pure XLA, tiled by scan over N-chunks
    HI = (P + 127) // 128  # 47
    Ppad = HI * 128

    def onehot2(ll, pdf):
        ll2 = jnp.pad(ll, ((0, 0), (0, Ppad - P))).reshape(B, HI, 128)
        hi = pdf // 128
        lo = pdf % 128
        TILE = 4096

        def chunk(carry, xs):
            hi_c, lo_c = xs  # [B, TILE]
            oh_hi = (hi_c[:, :, None] == jnp.arange(HI, dtype=jnp.int32)).astype(jnp.float32)
            rows = jnp.einsum("bth,bhl->btl", oh_hi, ll2)  # [B, TILE, 128]
            oh_lo = (lo_c[:, :, None] == jnp.arange(128, dtype=jnp.int32))
            ac = jnp.sum(jnp.where(oh_lo, rows, 0.0), axis=2)
            return carry, ac

        nT = E // TILE
        xs = (hi.reshape(B, nT, TILE).swapaxes(0, 1), lo.reshape(B, nT, TILE).swapaxes(0, 1))
        _, acs = jax.lax.scan(chunk, 0, xs)
        return acs.swapaxes(0, 1).reshape(B, E)

    timed("ac: two-level one-hot (XLA scan tiles)", onehot2, ll, pdf)

    # -------- 1c Pallas kernel version
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    TILE_N = 2048

    def gather_kernel(ll_ref, hi_ref, lo_ref, out_ref):
        # ll_ref: [HI, 128] one channel's table; hi/lo: [TILE_N]; out: [TILE_N]
        hi_c = hi_ref[:]  # [TILE_N]
        lo_c = lo_ref[:]
        oh_hi = (hi_c[:, None] == jax.lax.broadcasted_iota(jnp.int32, (TILE_N, HI), 1)).astype(jnp.float32)
        rows = jnp.dot(oh_hi, ll_ref[:], preferred_element_type=jnp.float32)  # [TILE_N, 128]
        oh_lo = lo_c[:, None] == jax.lax.broadcasted_iota(jnp.int32, (TILE_N, 128), 1)
        out_ref[:] = jnp.sum(jnp.where(oh_lo, rows, 0.0), axis=1)

    def pallas_gather(ll, pdf):
        ll2 = jnp.pad(ll, ((0, 0), (0, Ppad - P))).reshape(B, HI, 128)
        hi = (pdf // 128).astype(jnp.int32)
        lo = (pdf % 128).astype(jnp.int32)
        grid = (B, E // TILE_N)
        return pl.pallas_call(
            gather_kernel,
            out_shape=jax.ShapeDtypeStruct((B, E), jnp.float32),
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, HI, 128), lambda b, n: (b, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, TILE_N), lambda b, n: (b, n), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, TILE_N), lambda b, n: (b, n), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, TILE_N), lambda b, n: (b, n), memory_space=pltpu.VMEM),
        )(ll2, hi, lo)

    def gather_kernel2(ll_ref, hi_ref, lo_ref, out_ref):
        hi_c = hi_ref[0]
        lo_c = lo_ref[0]
        oh_hi = (hi_c[:, None] == jax.lax.broadcasted_iota(jnp.int32, (TILE_N, HI), 1)).astype(jnp.float32)
        rows = jnp.dot(oh_hi, ll_ref[0], preferred_element_type=jnp.float32)
        oh_lo = lo_c[:, None] == jax.lax.broadcasted_iota(jnp.int32, (TILE_N, 128), 1)
        out_ref[0, :] = jnp.sum(jnp.where(oh_lo, rows, 0.0), axis=1)

    def pallas_gather2(ll, pdf):
        ll2 = jnp.pad(ll, ((0, 0), (0, Ppad - P))).reshape(B, HI, 128)
        hi = (pdf // 128).astype(jnp.int32)
        lo = (pdf % 128).astype(jnp.int32)
        grid = (B, E // TILE_N)
        return pl.pallas_call(
            gather_kernel2,
            out_shape=jax.ShapeDtypeStruct((B, E), jnp.float32),
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, HI, 128), lambda b, n: (b, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, TILE_N), lambda b, n: (b, n), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, TILE_N), lambda b, n: (b, n), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, TILE_N), lambda b, n: (b, n), memory_space=pltpu.VMEM),
        )(ll2, hi, lo)

    try:
        r = pallas_gather2(ll, pdf)
        ref = jnp.take_along_axis(ll, pdf, axis=1)
        err = float(jnp.max(jnp.abs(r - ref)))
        print(f"pallas onehot gather max err: {err}")
        timed("ac: two-level one-hot (pallas)", pallas_gather2, ll, pdf)
    except Exception as ex:
        print("pallas onehot gather FAILED:", str(ex)[:500])

    # -------- 1d Pallas in-kernel jnp.take (vector gather support probe)
    def take_kernel(ll_ref, pdf_ref, out_ref):
        out_ref[0, :] = jnp.take(ll_ref[0], pdf_ref[0], axis=0)

    def pallas_take(ll, pdf):
        Ppad2 = ((P + 127) // 128) * 128
        llp = jnp.pad(ll, ((0, 0), (0, Ppad2 - P)))
        grid = (B, E // TILE_N)
        return pl.pallas_call(
            take_kernel,
            out_shape=jax.ShapeDtypeStruct((B, E), jnp.float32),
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, Ppad2), lambda b, n: (b, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, TILE_N), lambda b, n: (b, n), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, TILE_N), lambda b, n: (b, n), memory_space=pltpu.VMEM),
        )(llp, pdf)

    try:
        r = pallas_take(ll, pdf)
        ref = jnp.take_along_axis(ll, pdf, axis=1)
        err = float(jnp.max(jnp.abs(r - ref)))
        print(f"pallas jnp.take max err: {err}")
        timed("ac: pallas in-kernel jnp.take", pallas_take, ll, pdf)
    except Exception as ex:
        print("pallas jnp.take FAILED:", str(ex)[:300])

    # -------- 2 selection
    cb = jax.lax.bitcast_convert_type(cost, jnp.int32)
    cb = jnp.where(cb < 0, jnp.int32(-2147483648) - cb, cb)

    for k in (1, 3, 6):
        ops = (cb, ns) + tuple(pays[:k])
        timed(f"sort [B,{E}] 1key+{k+1}payload", lambda *o: jax.lax.sort(o, num_keys=1, dimension=1), *ops)

    key64 = (ns.astype(jnp.int64) << 32) | cb.astype(jnp.uint32).astype(jnp.int64)
    timed(f"sort [B,{E}] i64 key + 1 payload", lambda a, b: jax.lax.sort((a, b), num_keys=1, dimension=1), key64, pays[0])

    timed(f"top_k [B,{E}] k={2*K}", lambda c: jax.lax.top_k(-c, 2 * K), cost)
    try:
        timed(f"approx_max_k [B,{E}] k={2*K}", lambda c: jax.lax.approx_max_k(-c, 2 * K), cost)
        timed(f"approx_max_k [B,{E}] k={2*K} recall .9",
              lambda c: jax.lax.approx_max_k(-c, 2 * K, recall_target=0.90), cost)
    except Exception as ex:
        print("approx_max_k FAILED:", str(ex)[:300])

    # small sorts over K'' = 2K
    cb2 = cb[:, : 2 * K]
    ops2 = (cb2, ns[:, : 2 * K]) + tuple(p[:, : 2 * K] for p in pays)
    timed(f"sort [B,{2*K}] 1key+7payload", lambda *o: jax.lax.sort(o, num_keys=1, dimension=1), *ops2)

    # gather payloads for 2K winners via take_along_axis (for comparison)
    sel = random.randint(next(kk), (B, 2 * K), 0, E, jnp.int32)
    timed(f"take_along_axis [B,{2*K}] from [B,{E}]",
          lambda p, s: jnp.take_along_axis(p, s, axis=1), pays[0], sel)


if __name__ == "__main__":
    main()
