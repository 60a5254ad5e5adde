"""Ablation profile of the v3 decode step at the honest operating point.

Times decode_chunk (scan over F frames inside one program) for:
  full                : lattice records + eps rounds (bench configuration)
  no-lattice          : lattice_records=False
  no-eps              : same graph but eps arcs stripped (eps_iters=0)
  no-eps, no-lattice  : selection core only
Reported per decoded frame.  Also sweeps B.
"""
from __future__ import annotations

import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from vosk_tpu.ops.viterbi import BatchViterbi, DecodeParams
from vosk_tpu.utils.benchdata import make_realistic_graph

F = 20  # frames per timed program


def run(graph, B, K, lattice, tag):
    dec = BatchViterbi(
        graph,
        DecodeParams(beam=13.0, max_active=K, lattice_beam=6.0),
        lattice_records=lattice,
        silence_pdfs=[0],
    )
    P = 6008
    rng = np.random.default_rng(0)
    ll = jax.device_put(rng.standard_normal((B, F, P)).astype(np.float32) * 2)
    valid = jnp.ones((B, F), bool)
    frontier = dec.init_frontier(B)
    out = dec.decode_chunk(frontier, ll, valid)
    np.asarray(out[2])
    dts = []
    for _ in range(3):
        frontier = dec.init_frontier(B)
        jax.block_until_ready(frontier)
        t0 = time.perf_counter()
        out = dec.decode_chunk(frontier, ll, valid)
        np.asarray(out[2])
        if out[1] is not None and lattice:
            np.asarray(out[1]["prev"][:1, -1, 0, :8])
        dts.append(time.perf_counter() - t0)
    dt = sorted(dts)[1] / F
    thr = B * 0.03 / dt
    print(f"{tag:34s} B={B:4d} K={K}: {dt*1e3:8.2f} ms/frame -> {thr:7.0f} audio-s/s",
          flush=True)


def main():
    g = make_realistic_graph(num_states=2_000_000, num_pdfs=6008,
                             num_words=100_000, seed=0)
    g_noeps = dataclasses.replace(
        g, eps_off=np.zeros(g.num_states + 1, np.int32),
        eps_next=np.zeros(0, np.int32), eps_w=np.zeros(0, np.float32),
        eps_olabel=np.zeros(0, np.int32), eps_depth=0, max_eps_out=0,
    )
    run(g, 64, 7000, True, "full")
    run(g, 64, 7000, False, "no-lattice")
    run(g_noeps, 64, 7000, True, "no-eps")
    run(g_noeps, 64, 7000, False, "no-eps no-lattice")
    run(g, 128, 7000, True, "full B=128")
    run(g, 64, 2048, True, "full K=2048")
    run(g_noeps, 64, 2048, False, "bare K=2048")


if __name__ == "__main__":
    main()
