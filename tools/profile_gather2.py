"""Acoustic-lookup variants with loop-carried pdf (prevents hoisting —
earlier isolated numbers were invalidated by loop-invariant code motion)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

B = int(os.environ.get("B", "256"))
E = int(os.environ.get("E", "8000"))
P = 2048
T = 32


def run(name, fn):
    @jax.jit
    def scan(ll, pdf):
        def body(c, _):
            ll, pdf = c
            out = fn(ll, pdf)
            # carry real dependence: next pdf depends on out
            pdf2 = (pdf + out.astype(jnp.int32)) % P
            return (ll, jnp.abs(pdf2)), None

        (ll, pdf), _ = jax.lax.scan(body, (ll, pdf), None, length=T)
        return pdf

    rng = np.random.default_rng(0)
    ll = jnp.asarray(rng.standard_normal((B, P)).astype(np.float32))
    pdf = jnp.asarray(rng.integers(0, P, (B, E)).astype(np.int32))
    out = scan(ll, pdf)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = scan(ll, pdf)
    jax.block_until_ready(out)
    print(f"{name:28s} {(time.perf_counter()-t0)/T*1e3:8.2f} ms")


def main():
    run("take_along_axis", lambda ll, pdf: jnp.take_along_axis(ll, pdf, axis=1))
    run(
        "take_along promise_in_bounds",
        lambda ll, pdf: jnp.take_along_axis(
            ll, pdf, axis=1, mode="promise_in_bounds"
        ),
    )
    run(
        "flat global gather",
        lambda ll, pdf: ll.reshape(-1)[
            (jnp.arange(B, dtype=jnp.int32)[:, None] * P + pdf)
        ],
    )
    run(
        "flat promise_in_bounds",
        lambda ll, pdf: ll.reshape(-1).at[
            (jnp.arange(B, dtype=jnp.int32)[:, None] * P + pdf)
        ].get(mode="promise_in_bounds"),
    )
    run(
        "bf16 take_along",
        lambda ll, pdf: jnp.take_along_axis(
            ll.astype(jnp.bfloat16), pdf, axis=1
        ).astype(jnp.float32),
    )
    # butterfly/one-hot contraction on MXU: out = sum_p onehot * ll via dot
    def onehot_dot(ll, pdf):
        # [B, E] = [B, E, P/128 blocks]·... use segment trick: compare+matmul
        # per 128-wide pdf block to bound memory: sum over 16 blocks
        out = jnp.zeros(pdf.shape, jnp.float32)
        for blk in range(P // 128):
            base = blk * 128
            sel = (pdf >= base) & (pdf < base + 128)
            oh = jax.nn.one_hot(
                jnp.where(sel, pdf - base, 0), 128, dtype=jnp.bfloat16
            )  # [B, E, 128]
            part = jnp.einsum(
                "bek,bk->be", oh, ll[:, base : base + 128].astype(jnp.bfloat16)
            )
            out = out + jnp.where(sel, part.astype(jnp.float32), 0.0)
        return out

    run("onehot-dot blocks", onehot_dot)


if __name__ == "__main__":
    main()
