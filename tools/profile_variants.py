"""Final isolation: variants of the batched frame step, one TPU session.

v_full    — production step
v_sort2   — dedup sort without idx payload (2 operands)
v_kv64    — single u64 key (ns<<32|costbits) + idx payload kv-sort
v_nosort  — skip dedup entirely (top_k only)
v_nogather— synthetic rows (no em_pack gather)
v_noacc   — no acoustic take_along_axis
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
T = 32
P = 2048


def main():
    graph = make_bench_graph(num_states=S, num_pdfs=P, seed=0)
    dec = BatchViterbi(graph, DecodeParams(beam=13.0, max_active=K))
    M, E = dec.M, dec.E

    def make_step(sort_mode="sort3", gather=True, acoustic=True):
        def step(frontier, ll):
            tok_state, tok_cost = frontier["state"], frontier["cost"]
            Bc = tok_state.shape[0]
            if gather:
                rows = dec.em_pack[tok_state]
                w = rows[:, :, :M].reshape(Bc, E)
                ns = jax.lax.bitcast_convert_type(rows[:, :, M:2*M], jnp.int32).reshape(Bc, E)
                pdf = jax.lax.bitcast_convert_type(rows[:, :, 2*M:3*M], jnp.int32).reshape(Bc, E)
            else:
                w = jnp.ones((Bc, E), jnp.float32)
                ns = (jnp.repeat(tok_state, M, axis=1) + jnp.broadcast_to(jnp.arange(E) % M, (Bc, E))) % dec.S
                pdf = jnp.zeros((Bc, E), jnp.int32)
            ac = jnp.take_along_axis(ll, pdf, axis=1) if acoustic else 0.0
            cost = jnp.repeat(tok_cost, M, axis=1) + w - ac
            mask = jnp.isfinite(w)
            nsm = jnp.where(mask, ns, dec.S)
            cm = jnp.where(mask, cost, jnp.inf)
            if sort_mode == "sort3":
                e_ids = jnp.broadcast_to(jnp.arange(E, dtype=jnp.int32), (Bc, E))
                s_ns, s_cost, s_idx = jax.lax.sort((nsm, cm, e_ids), num_keys=2, dimension=1)
            elif sort_mode == "sort2":
                s_ns, s_cost = jax.lax.sort((nsm, cm), num_keys=2, dimension=1)
            elif sort_mode == "kv64":
                cb = jax.lax.bitcast_convert_type(cm, jnp.uint32)
                cb = jnp.where(cm >= 0, cb ^ jnp.uint32(0x80000000), ~cb)  # sortable
                key = (nsm.astype(jnp.uint64) << jnp.uint64(32)) | cb.astype(jnp.uint64)
                e_ids = jnp.broadcast_to(jnp.arange(E, dtype=jnp.int32), (Bc, E))
                skey, s_idx = jax.lax.sort((key, e_ids), num_keys=1, dimension=1)
                s_ns = (skey >> jnp.uint64(32)).astype(jnp.int32)
                scb = (skey & jnp.uint64(0xFFFFFFFF)).astype(jnp.uint32)
                scb = jnp.where(scb & jnp.uint32(0x80000000), scb ^ jnp.uint32(0x80000000), ~scb)
                s_cost = jax.lax.bitcast_convert_type(scb, jnp.float32)
            else:  # nosort
                s_ns, s_cost = nsm, cm
            if sort_mode != "nosort":
                first = jnp.concatenate([jnp.ones((Bc, 1), bool), s_ns[:, 1:] != s_ns[:, :-1]], axis=1)
                wcost = jnp.where(first & (s_ns != dec.S), s_cost, jnp.inf)
            else:
                wcost = s_cost
            neg, sel2 = jax.lax.top_k(-wcost, K)
            new_cost = -neg
            keep = new_cost <= new_cost[:, :1] + 13.0
            new_state = jnp.where(keep, jnp.take_along_axis(s_ns, sel2, axis=1), dec.S)
            return {"state": new_state, "cost": jnp.where(keep, new_cost, jnp.inf)}

        return step

    rng = np.random.default_rng(0)
    lls = jnp.asarray(rng.standard_normal((T, B, P)).astype(np.float32))

    def timeit(step, name):
        @jax.jit
        def scan(fr, lls):
            def body(fr, ll):
                fr2 = step(fr, ll)
                return fr2, fr2["cost"][:, 0]
            return jax.lax.scan(body, fr, lls)

        fr = dec.init_frontier(B)
        out = scan(fr, lls)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        out = scan(fr, lls)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / T
        print(f"{name:10s} {dt*1e3:8.2f} ms/frame ({B*0.03/dt:8.0f} audio-s/s)")

    timeit(make_step("sort3"), "v_full")
    timeit(make_step("sort2"), "v_sort2")
    timeit(make_step("kv64"), "v_kv64")
    timeit(make_step("nosort"), "v_nosort")
    timeit(make_step("sort3", gather=False), "v_nogather")
    timeit(make_step("sort3", acoustic=False), "v_noacc")


if __name__ == "__main__":
    main()
