"""Measure per-iteration lax.scan overhead on this runtime and the effect of
scan unrolling on the decoder frame loop."""
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
T = 64
P = 2048


def timeit(fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = fn(*args)
    jax.block_until_ready(out)
    return time.perf_counter() - t0


def main():
    x = jnp.ones((B, K), jnp.float32)

    @jax.jit
    def empty_scan(x):
        def body(c, _):
            return c * 1.000001 + 0.000001, None

        c, _ = jax.lax.scan(body, x, None, length=T)
        return c

    dt = timeit(empty_scan, x)
    print(f"empty scan: {dt/T*1e3:8.3f} ms/iter")

    graph = make_bench_graph(num_states=S, num_pdfs=P, seed=0)
    dec = BatchViterbi(graph, DecodeParams(beam=13.0, max_active=K))
    rng = np.random.default_rng(0)
    lls = jnp.asarray(rng.standard_normal((T, B, P)).astype(np.float32))

    for unroll in (1, 4):
        @jax.jit
        def frame_scan(frontier, lls):
            def body(fr, ll):
                fr2, rec = dec._frame_step_batched(fr, ll, jnp.ones((B,), bool))
                return fr2, fr2["cost"][:, 0]

            return jax.lax.scan(body, frontier, lls, unroll=unroll)

        fr = dec.init_frontier(B)
        dt = timeit(frame_scan, fr, lls)
        print(
            f"frame scan unroll={unroll}: {dt/T*1e3:8.2f} ms/frame "
            f"({B*0.03/(dt/T):8.0f} audio-s/s)"
        )


if __name__ == "__main__":
    main()
