"""Batched table gathers as dense MXU work.

XLA lowers per-channel dynamic gathers (`jnp.take_along_axis(table, idx)`)
on TPU element-at-a-time (~10 ns/element measured on v5e — see
tools/mb_parts.py); at decoder scale (millions of lookups per frame) that
dominates the whole frame step.  For tables that fit comfortably in VMEM
(P up to a few tens of thousands), a two-level one-hot formulation is ~8x
faster and bit-exact:

    idx = hi * 128 + lo
    rows[n]  = onehot(hi[n]) @ table2d          (MXU matmul, f32-highest)
    out[n]   = sum_l rows[n, l] * [lo[n] == l]  (VPU select + reduce)

The matmul selects exactly one table element per output (all other terms
are exact zeros), so with `precision='highest'` the result is bit-identical
to a gather.  Work is chunked along N so intermediates stay bounded.

This replaces the decoder's acoustic lookup ll[b, pdf] (the reference reads
per-arc acoustic costs through DecodableAmNnetLoopedOnline,
/root/reference/src/recognizer.cc:310 -> Kaldi decodable->LogLikelihood)
and all small per-channel payload gathers in the frame step.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

_LANES = 128
_TILE_ROWS = 32  # index tile = 32 sublanes x 128 lanes per kernel step


def _pallas_gather(table_f32: jax.Array, idx: jax.Array,
                   interpret: bool = False) -> jax.Array:
    """TPU fast path: per-channel gather as a Pallas kernel.

    The table lives in VMEM as [HI, 128]; for each index tile the kernel
    statically unrolls over the HI rows, doing one per-sublane lane gather
    (`take_along_axis(axis=1)` — the 2D gather Mosaic supports natively)
    plus a select per row.  No HBM intermediates, bit-exact; measured
    ~0.9 ms for [64, 57k] from [64, 6008] on v5e vs 4.6 ms for the XLA
    one-hot formulation and 36 ms for take_along_axis.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, P = table_f32.shape
    N = idx.shape[1]
    hi_n = (P + _LANES - 1) // _LANES
    t3 = jnp.pad(table_f32, ((0, 0), (0, hi_n * _LANES - P))).reshape(
        B, hi_n, _LANES
    )
    tile = _TILE_ROWS * _LANES
    n_pad = (-N) % tile
    if n_pad:
        idx = jnp.pad(idx, ((0, 0), (0, n_pad)))
    idx3 = idx.reshape(B, (N + n_pad) // _LANES, _LANES)

    def kern(tbl_ref, idx_ref, out_ref):
        tbl = tbl_ref[0]
        ix = idx_ref[0]
        hi = ix // _LANES
        lo = ix % _LANES
        acc = jnp.zeros(lo.shape, jnp.float32)
        for h in range(hi_n):  # static unroll: lane gather + select per row
            row = jnp.broadcast_to(tbl[h, :][None, :], lo.shape)
            vals = jnp.take_along_axis(row, lo, axis=1)
            acc = jnp.where(hi == h, vals, acc)
        out_ref[0] = acc

    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct(idx3.shape, jnp.float32),
        grid=(B, (N + n_pad) // tile),
        in_specs=[
            pl.BlockSpec((1, hi_n, _LANES), lambda b, n: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _TILE_ROWS, _LANES), lambda b, n: (b, n, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, _TILE_ROWS, _LANES), lambda b, n: (b, n, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(t3, idx3)
    return out.reshape(B, N + n_pad)[:, :N]


def _tpu_backend() -> bool:
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:  # pragma: no cover
        return False


def onehot_gather(table: jax.Array, idx: jax.Array, chunk: int = 4096) -> jax.Array:
    """out[b, n] = table[b, idx[b, n]], bit-exact.

    On TPU backends this is a Pallas lane-gather kernel (_pallas_gather);
    elsewhere a two-level one-hot MXU formulation.  table: [B, P] float32
    (or int32 with |values| < 2^24, via f32 round-trip — use
    onehot_gather_i32 for arbitrary int32).  idx: [B, N] int32 in [0, P).
    Efficient for P up to ~50k; N arbitrary (chunked/padded internally).
    """
    squeeze = False
    if table.ndim == 1:
        table, idx, squeeze = table[None], idx[None], True
    B, P = table.shape
    N = idx.shape[1]
    out_dtype = table.dtype
    tf = table.astype(jnp.float32)
    if _tpu_backend():
        out = _pallas_gather(tf, idx)
        if jnp.issubdtype(out_dtype, jnp.integer):
            out = out.astype(out_dtype)
        return out[0] if squeeze else out
    hi_n = (P + _LANES - 1) // _LANES
    t2 = jnp.pad(tf, ((0, 0), (0, hi_n * _LANES - P))).reshape(B, hi_n, _LANES)

    n_pad = (-N) % chunk
    if n_pad:
        idx = jnp.pad(idx, ((0, 0), (0, n_pad)))
    n_chunks = (N + n_pad) // chunk
    hi = (idx // _LANES).astype(jnp.int32)
    lo = (idx % _LANES).astype(jnp.int32)

    def one_chunk(hi_c, lo_c):
        oh = (hi_c[:, :, None] == jnp.arange(hi_n, dtype=jnp.int32)).astype(
            jnp.float32
        )
        rows = jnp.einsum("bnh,bhl->bnl", oh, t2, precision="highest")
        sel = lo_c[:, :, None] == jnp.arange(_LANES, dtype=jnp.int32)
        return jnp.sum(jnp.where(sel, rows, 0.0), axis=2)

    if n_chunks == 1:
        out = one_chunk(hi, lo)
    else:
        xs = (
            hi.reshape(B, n_chunks, chunk).swapaxes(0, 1),
            lo.reshape(B, n_chunks, chunk).swapaxes(0, 1),
        )
        _, outs = jax.lax.scan(lambda c, x: (c, one_chunk(*x)), 0, xs)
        out = outs.swapaxes(0, 1).reshape(B, n_chunks * chunk)
    out = out[:, :N]
    if jnp.issubdtype(out_dtype, jnp.integer):
        out = out.astype(out_dtype)
    if squeeze:
        out = out[0]
    return out


def onehot_gather_i32(table: jax.Array, idx: jax.Array, chunk: int = 4096) -> jax.Array:
    """Exact int32 gather for arbitrary 32-bit values: the value is split
    into two 16-bit halves (each f32-exact), gathered, and recombined."""
    u = table.astype(jnp.uint32)
    lo16 = (u & jnp.uint32(0xFFFF)).astype(jnp.int32)
    hi16 = (u >> 16).astype(jnp.int32)
    glo = onehot_gather(lo16, idx, chunk).astype(jnp.uint32)
    ghi = onehot_gather(hi16, idx, chunk).astype(jnp.uint32)
    return ((ghi << 16) | glo).astype(jnp.int32)
