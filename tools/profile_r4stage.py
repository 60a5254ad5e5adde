"""Round-4 decoder stage profiler at the honest operating point.

Times jax.lax.scan programs at two frame counts and reports the SLOPE
(ms/frame) so the axon tunnel's per-dispatch overhead cancels out.
Stages:
  expand      arc-row gather + unpack + acoustic + cost (cbits only)
  exp+sortA   expansion + the cost-ordered pool sort
  v4-full     whole _frame_step_v4 (no ragged)
  v4-ragged   production ragged step (lax.scan over channel groups)
Run: B=96 K=7000 python tools/profile_r4stage.py
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("VOSK_TPU_XLA_CACHE", "/tmp/vosk_tpu_xla_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import jax.numpy as jnp
import numpy as np

from vosk_tpu.ops.viterbi import BatchViterbi, DecodeParams
from vosk_tpu.utils.benchdata import make_realistic_graph, make_plausible_loglikes

B = int(os.environ.get("B", "96"))
STATES = int(os.environ.get("STATES", "2000000"))
K = int(os.environ.get("K", "7000"))
CAP_M = int(os.environ.get("CAP_M", "0")) or None
T_LO, T_HI = 4, 20
P = 6008


def slope(label, mk_scan, dec, lls_hi, fr):
    """mk_scan(n) -> jitted scan over n frames; report slope ms/frame."""
    times = {}
    for n in (T_LO, T_HI):
        f = mk_scan(n)
        lls = lls_hi[:n]
        out = f(dec.tables, fr, lls)
        jax.block_until_ready(out)
        best = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            out = f(dec.tables, fr, lls)
            jax.block_until_ready(out)
            best = min(best, time.perf_counter() - t0)
        times[n] = best
    ms = (times[T_HI] - times[T_LO]) / (T_HI - T_LO) * 1e3
    print(f"{label:12s} {ms:7.2f} ms/frame   "
          f"(t{T_LO}={times[T_LO]*1e3:.0f}ms t{T_HI}={times[T_HI]*1e3:.0f}ms)",
          flush=True)
    return ms


def main():
    graph = make_realistic_graph(num_states=STATES, num_pdfs=P,
                                 num_words=100_000, seed=0)
    dec = BatchViterbi(
        graph, DecodeParams(beam=13.0, max_active=K, lattice_beam=6.0),
        frame_step="auto", lattice_records=True, optimize_graph=True,
        cap_m=CAP_M,
    )
    dec_nolat = BatchViterbi(
        dec.graph, DecodeParams(beam=13.0, max_active=K, lattice_beam=6.0),
        frame_step="auto", lattice_records=False, optimize_graph=False,
    )
    print(f"M={dec.M} S={dec.S} E={dec.E} K2={dec.K2} R={dec.R} "
          f"ragged={dec.ragged} G={dec._ragged_G(B)} "
          f"buckets={dec._ragged_buckets()}", flush=True)
    rng = np.random.default_rng(0)
    noise = float(os.environ.get("NOISE", "0"))
    lb = make_plausible_loglikes(graph, P, B, T_HI + 8, snr=2.0, seed=0)
    lb += (rng.standard_normal(lb.shape) * noise).astype(np.float32)
    warm_lls = jnp.asarray(lb[:8])
    lls_hi = jnp.asarray(lb[8:])
    fr = dec.init_frontier(B)
    valid = jnp.ones((B,), bool)

    # warm the frontier to realistic live counts: run 8 ragged steps
    @jax.jit
    def warm(tables, fr, lls):
        def body(fr, ll):
            f2, _ = dec._frame_step_v4_ragged(fr, ll, valid)
            return f2, ()
        f2, _ = jax.lax.scan(body, fr, lls)
        return f2
    fr = warm(dec.tables, fr, warm_lls)
    live = np.sum(np.isfinite(np.asarray(fr["cost"])), axis=1)
    print(f"live after warm: p50={np.percentile(live,50):.0f} "
          f"p95={np.percentile(live,95):.0f} max={live.max()}", flush=True)

    def mk(fn):
        def mk_scan(n):
            @jax.jit
            def scan(tables, fr, lls):
                def body(car, ll):
                    fr, acc = car
                    fr2, out = fn(fr, ll)
                    return (fr2, acc + out), ()
                (f2, acc), _ = jax.lax.scan(body, (fr, jnp.float32(0)), lls)
                return f2["cost"][:, 0], acc
            return scan
        return mk_scan

    def rtz(ll):
        # runtime-zero that depends on the per-frame input: keeps gathers of
        # the (otherwise loop-invariant) frontier inside the scan so LICM
        # can't hoist them (ADVICE r4: `& 0` folds under the simplifier)
        return (jnp.sum(ll) > jnp.float32(1e30)).astype(jnp.int32)

    def rows_only(fr_, ll):
        rows = dec.em_pack[fr_["state"] + rtz(ll)]
        return fr_, jnp.sum(rows[:, :1, :1])

    def rows_unpack(fr_, ll):
        w, nsf, sil, pdf = dec._unpack_rows_v4(fr_["state"] + rtz(ll))
        return fr_, jnp.sum(w[:, :1]) + jnp.sum(pdf[:, :1].astype(jnp.float32))

    def acoustic_only(fr_, ll):
        from vosk_tpu.ops.gather import onehot_gather
        w, nsf, sil, pdf = dec._unpack_rows_v4(fr_["state"] + rtz(ll))
        ac = onehot_gather(ll, pdf)
        return fr_, jnp.sum(ac[:, :1])

    def expand_only(fr_, ll):
        z = rtz(ll)
        cbits, nsm, pm = dec._expand_v4(
            fr_["state"] + z, fr_["cost"], ll)
        return fr_, jnp.sum(cbits[:, :1].astype(jnp.float32))

    def exp_sortA(fr_, ll):
        z = rtz(ll)
        cbits, nsm, pm = dec._expand_v4(
            fr_["state"] + z, fr_["cost"], ll)
        sA = jax.lax.sort((cbits, nsm, pm), num_keys=1, dimension=1)
        return fr_, jnp.sum(sA[0][:, :1].astype(jnp.float32))

    def v4_full(fr_, ll):
        f2, rec = dec._frame_step_v4(fr_, ll, valid)
        return f2, jnp.sum(rec["pm"][:, :1].astype(jnp.float32))

    def v4_nolat(fr_, ll):
        f2, rec = dec_nolat._frame_step_v4(fr_, ll, valid)
        return f2, jnp.sum(rec["pm"][:, :1].astype(jnp.float32))

    def v4_ragged(fr_, ll):
        f2, rec = dec._frame_step_v4_ragged(fr_, ll, valid)
        return f2, jnp.sum(rec["pm"][:, :1].astype(jnp.float32))

    def v4_ragged_nolat(fr_, ll):
        f2, rec = dec_nolat._frame_step_v4_ragged(fr_, ll, valid)
        return f2, jnp.sum(rec["pm"][:, :1].astype(jnp.float32))

    stages = os.environ.get(
        "STAGES", "rows,rows+unpack,+acoustic,expand,exp+sortA,v4-full,v4-ragged"
    ).split(",")
    fns = {
        "rows": rows_only, "rows+unpack": rows_unpack,
        "+acoustic": acoustic_only, "expand": expand_only,
        "exp+sortA": exp_sortA, "v4-full": v4_full, "v4-ragged": v4_ragged,
        "v4-nolat": v4_nolat, "v4-ragged-nolat": v4_ragged_nolat,
    }
    for s in stages:
        slope(s, mk(fns[s]), dec, lls_hi, fr)


if __name__ == "__main__":
    main()
