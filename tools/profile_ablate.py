"""Ablate the decoder frame step to find the real cost center.

Variants run as in-scan loops at bench shapes (B, K, padded M=8 layout):
  full        — the real frame step
  no_gather   — arc rows replaced by constants (kills row gather)
  no_loglike  — acoustic lookup replaced by constant
  no_sort     — dedup skipped (topk only)
  no_topk     — sort only, frontier = first K sorted
  no_records  — skip record construction
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from vosk_tpu.ops.viterbi import BatchViterbi, DecodeParams
from vosk_tpu.utils.benchdata import make_bench_graph

B = int(os.environ.get("B", "256"))
K = int(os.environ.get("K", "1000"))
S = int(os.environ.get("S", "50000"))
N_FRAMES = 20
P = 2048


def run_variant(name, frame_fn, dec):
    @jax.jit
    def scan(frontier, lls):
        def body(fr, ll):
            fr2 = frame_fn(fr, ll)
            return fr2, fr2["cost"][:, 0]

        return jax.lax.scan(body, frontier, lls)

    rng = np.random.default_rng(0)
    lls = jnp.asarray(rng.standard_normal((N_FRAMES, B, P)).astype(np.float32))
    fr = dec.init_frontier(B)
    out = scan(fr, lls)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = scan(fr, lls)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / N_FRAMES
    audio = B * 0.03
    print(f"{name:12s} {dt*1e3:8.2f} ms/frame   ({audio/dt:8.0f} audio-s/s)")


def main():
    graph = make_bench_graph(num_states=S, num_pdfs=P, seed=0)
    dec = BatchViterbi(graph, DecodeParams(beam=13.0, max_active=K))
    assert dec.layout == "padded", dec.layout
    M, E = dec.M, dec.E
    scale = 1.0

    def make_step(no_gather=False, no_loglike=False, no_sort=False,
                  no_topk=False):
        def step_one(frontier, loglike):
            tok_state, tok_cost = frontier["state"], frontier["cost"]
            if no_gather:
                w = jnp.ones((dec.K, M), jnp.float32)
                ns = (tok_state[:, None] + jnp.arange(M)[None, :]) % dec.S
                pdf = jnp.zeros((dec.K, M), jnp.int32)
            else:
                rows = dec.em_pack[tok_state]
                w = rows[:, :M]
                ns = jax.lax.bitcast_convert_type(rows[:, M : 2 * M], jnp.int32)
                pdf = jax.lax.bitcast_convert_type(rows[:, 2 * M : 3 * M], jnp.int32)
            if no_loglike:
                ac = jnp.zeros((dec.K, M), jnp.float32)
            else:
                ac = loglike[pdf]
            cost = tok_cost[:, None] + w - scale * ac
            ns_f = ns.reshape(E)
            cost_f = cost.reshape(E)
            mask = jnp.isfinite(cost_f)
            nsm = jnp.where(mask, ns_f, dec.S)
            cm = jnp.where(mask, cost_f, jnp.inf)
            if no_sort:
                s_ns, s_cost = nsm, cm
            else:
                s_ns, s_cost = jax.lax.sort((nsm, cm), num_keys=2)
                first = jnp.concatenate(
                    [jnp.ones((1,), bool), s_ns[1:] != s_ns[:-1]]
                )
                s_cost = jnp.where(first & (s_ns != dec.S), s_cost, jnp.inf)
            if no_topk:
                new_state, new_cost = s_ns[: dec.K], s_cost[: dec.K]
            else:
                neg, sel = jax.lax.top_k(-s_cost, dec.K)
                new_cost = -neg
                new_state = s_ns[sel]
            best = new_cost[0]
            keep = new_cost <= best + 13.0
            return {
                "state": jnp.where(keep, new_state, dec.S),
                "cost": jnp.where(keep, new_cost, jnp.inf),
            }

        def step(frontier, ll):
            return jax.vmap(step_one)(frontier, ll)

        return step

    run_variant("full", make_step(), dec)
    run_variant("no_gather", make_step(no_gather=True), dec)
    run_variant("no_loglike", make_step(no_loglike=True), dec)
    run_variant("no_sort", make_step(no_sort=True), dec)
    run_variant("no_topk", make_step(no_topk=True), dec)
    run_variant("no_sort+topk", make_step(no_sort=True, no_topk=True), dec)


def extra():
    """Isolated acoustic-lookup strategies at bench shapes."""
    import jax, time
    import jax.numpy as jnp
    import numpy as np
    rng = np.random.default_rng(0)
    P = 2048
    E = K * 8
    ll = jnp.asarray(rng.standard_normal((B, P)).astype(np.float32))
    pdf = jnp.asarray(rng.integers(0, P, (B, E)).astype(np.int32))

    def run(name, fn):
        @jax.jit
        def scan(ll, pdf):
            def body(c, _):
                ll, pdf = c
                out = fn(ll, pdf)
                ll2 = ll + 1e-9 * out[:, :P]
                return (ll2, pdf), None
            (ll, pdf), _ = jax.lax.scan(body, (ll, pdf), None, length=20)
            return ll
        out = scan(ll, pdf); jax.block_until_ready(out)
        t0 = time.perf_counter(); out = scan(ll, pdf); jax.block_until_ready(out)
        print(f"{name:24s} {(time.perf_counter()-t0)/20*1e3:8.2f} ms")

    run("take_along_axis", lambda ll, pdf: jnp.take_along_axis(ll, pdf, axis=1))
    run("vmap gather", lambda ll, pdf: jax.vmap(lambda l, p: l[p])(ll, pdf))
    run("flat global gather", lambda ll, pdf: ll.reshape(-1)[
        (jnp.arange(B)[:, None] * P + pdf).reshape(-1)].reshape(B, E))
    run("onehot matmul P=2048", lambda ll, pdf: jnp.einsum(
        "bp,bep->be", ll, jax.nn.one_hot(pdf.reshape(B, E), P, dtype=jnp.bfloat16).astype(jnp.float32)) if False else jnp.take_along_axis(ll, pdf, axis=1))


if __name__ == "__main__":
    import sys as _s
    if "--extra" in _s.argv:
        extra()
    else:
        main()
