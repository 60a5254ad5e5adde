"""Fused streaming pipeline: features -> TDNN-F -> token passing in ONE
jitted step over the channel batch.

This is the TPU analogue of the reference's single CUDA pipeline launch per
dynamic batch (`BatchedThreadedNnet3CudaOnlinePipeline::DecodeBatch`): one
compiled program advances all channels by one 0.2 s chunk, keeping all
streaming state on device.  Used by bench and the scale paths; the
object-per-stream API (runtime/batch.py) drives the same building blocks.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..io.native import NativeModel
from ..ops.features import FeatureExtractor
from ..ops.viterbi import BatchViterbi, DecodeParams


class FusedPipeline:
    def __init__(
        self,
        model: NativeModel,
        batch: int,
        chunk_seconds: float = 0.2,
        mesh=None,
        collect_records: bool = True,
        expand_budget: Optional[int] = None,
        lattice_records: bool = False,
        lattice_budget: Optional[int] = None,
    ):
        self.model = model
        self.B = batch
        self.ex = model.feature_extractor()
        self.am = model.make_am()
        self.dec = BatchViterbi(
            model.graph,
            DecodeParams(
                beam=model.config.beam,
                max_active=model.config.max_active,
                lattice_beam=model.config.lattice_beam,
                acoustic_scale=model.config.acoustic_scale,
            ),
            expand_budget=expand_budget,
            lattice_records=lattice_records,
            lattice_budget=lattice_budget,
            silence_pdfs=model.silence_pdfs,
        )
        self.rate = model.config.sample_rate
        self.chunk_samples = int(chunk_seconds * self.rate)
        self.F = self.ex.stream_max_frames(self.chunk_samples)
        self.collect_records = collect_records
        self.mesh = mesh

        params = self.am.params
        if mesh is not None:
            from ..parallel import mesh as pm

            params = pm.shard_am_params(mesh, params)
        self.params = params
        self._step = jax.jit(self._step_impl)

    def init_state(self):
        st = {
            "feat": self.ex.init_stream_state(self.B, self.chunk_samples),
            "am": self.am.init_stream_state(self.B, self.F),
            "frontier": self.dec.init_frontier(self.B),
        }
        if self.mesh is not None:
            from ..parallel import mesh as pm

            st = {k: pm.shard_channel_state(self.mesh, v) for k, v in st.items()}
        return st

    def _step_impl(self, params, tables, state, audio, n_samples, ll_bias=None):
        feat_state, feats, fvalid = self.ex._extract_chunk_impl(
            state["feat"], audio, None, n_samples
        )
        am_state, ll, lvalid = self.am._process_chunk_impl(
            params, state["am"], feats, fvalid, None
        )
        if ll_bias is not None:
            # benchmark hook: structured acoustic scores added to the AM
            # output so the decoder sees plausible-path dynamics
            ll = ll * 1e-3 + ll_bias
        frontier, recs, best, bestf = self.dec._decode_entry(
            tables, state["frontier"], ll, lvalid
        )
        new_state = {"feat": feat_state, "am": am_state, "frontier": frontier}
        if not self.collect_records:
            recs = None
        return new_state, recs, best, bestf, jnp.sum(lvalid, axis=1)

    def step(self, state, audio: np.ndarray, n_samples=None):
        """audio: [B, chunk_samples]. Returns (state, records|None, best,
        best_final, frames_decoded[B])."""
        if n_samples is None:
            n_samples = jnp.full((self.B,), audio.shape[1], jnp.int32)
        return self._step(self.params, self.dec.tables, state, audio, n_samples)

    def run_scan(self, state, audio, n_samples=None, ll_bias=None):
        """Advance many chunks in ONE device program via lax.scan.

        audio: [T, B, chunk_samples] pre-staged chunks.  Minimizes host
        round-trips — the shape for offline batch jobs and benchmarking.
        ll_bias: optional [T, B, F, P] acoustic bias (see _step_impl).
        Returns (state, stacked records|None, best [T, B]).
        """
        key = ll_bias is not None
        if getattr(self, "_scan_key", None) != key:
            def scan_fn(params, tables, state, audio, n_samples, ll_bias):
                def body(st, xs):
                    if ll_bias is None:
                        a, n = xs
                        lb = None
                    else:
                        a, n, lb = xs
                    st2, recs, best, bestf, nf = self._step_impl(
                        params, tables, st, a, n, lb
                    )
                    return st2, (recs, best)

                xs = (audio, n_samples) if ll_bias is None else (
                    audio, n_samples, ll_bias)
                return jax.lax.scan(body, state, xs)

            self._scan_jit = jax.jit(scan_fn, static_argnames=())
            self._scan_key = key
        if n_samples is None:
            n_samples = jnp.full(audio.shape[:2], audio.shape[2], jnp.int32)
        state, (recs, best) = self._scan_jit(
            self.params, self.dec.tables, state, audio, n_samples, ll_bias
        )
        return state, recs, best
