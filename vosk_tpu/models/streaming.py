"""Generic streaming wrapper for acoustic models.

Any AM exposing `forward(params, window [B, W, D]) -> [B, ceil(W/ss), P]`
with known left/right context and subsampling gets chunked streaming with
carried feature history, masked per-channel advance, and end-of-stream flush
— the contract the Recognizer/BatchPipeline drive (the reference's
equivalent state lives inside Kaldi's looped decodable, cf.
`DecodableNnetSimpleLoopedInfo`, model.cc:245).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


class StreamingAm:
    """Mixin/driver: subclass (or compose) must provide attributes
    `feat_dim`, `subsample`, `left_context`, `right_context`, `params`, and
    method `forward(params, window, ivector=None)`."""

    feat_dim: int
    subsample: int
    left_context: int
    right_context: int

    @property
    def _left_pad(self) -> int:
        ss = self.subsample
        return ((self.left_context + ss - 1) // ss) * ss

    def forward_utterance(self, params, feats, ivector=None):
        """Whole-utterance forward with Kaldi edge-copy padding."""
        ss = self.subsample
        Lp, R = self._left_pad, self.right_context
        T = feats.shape[1]
        n_out = -(-T // ss)
        left = jnp.repeat(feats[:, :1], Lp, axis=1)
        need_right = (n_out - 1) * ss + R + 1 - T
        right = jnp.repeat(feats[:, -1:], max(need_right, 0), axis=1)
        window = jnp.concatenate([left, feats, right], axis=1)
        out = self.forward(params, window, ivector)
        return out[:, Lp // ss : Lp // ss + n_out]

    def __call__(self, feats, ivector=None):
        if not hasattr(self, "_utt_jit_fn"):
            self._utt_jit_fn = jax.jit(self.forward_utterance)
        return self._utt_jit_fn(self.params, feats, ivector)

    # ------------------------------------------------------------- stream

    def init_stream_state(self, batch: int, chunk_frames: int):
        H = self._left_pad + self.right_context + chunk_frames + self.subsample
        return {
            "hist": jnp.zeros((batch, H, self.feat_dim), jnp.float32),
            "hist_len": jnp.zeros((batch,), jnp.int32),
            "feats_seen": jnp.zeros((batch,), jnp.int32),
            "out_emitted": jnp.zeros((batch,), jnp.int32),
        }

    def stream_max_out(self, chunk_frames: int) -> int:
        return chunk_frames // self.subsample + 1

    def process_chunk(self, state, feats, valid, ivector=None):
        if not hasattr(self, "_chunk_jit_fn"):
            self._chunk_jit_fn = jax.jit(self._process_chunk_impl)
        return self._chunk_jit_fn(self.params, state, feats, valid, ivector)

    def _process_chunk_impl(self, params, state, feats, valid, ivector):
        B, F, D = feats.shape
        hist, hist_len = state["hist"], state["hist_len"]
        H = hist.shape[1]
        O = self.stream_max_out(F)
        ss, R = self.subsample, self.right_context
        Lp = self._left_pad

        n_new = jnp.sum(valid, axis=1).astype(jnp.int32)

        col = jax.lax.broadcasted_iota(jnp.int32, (B, H), 1)
        overflow = jnp.maximum(hist_len + n_new - H, 0)
        src = jnp.clip(col + overflow[:, None], 0, H - 1)
        hist = jnp.take_along_axis(hist, src[:, :, None], axis=1)
        hist_len2 = hist_len - overflow
        fsrc = jnp.clip(col - hist_len2[:, None], 0, F - 1)
        newf = jnp.take_along_axis(feats, fsrc[:, :, None], axis=1)
        write = (col >= hist_len2[:, None]) & (col < (hist_len2 + n_new)[:, None])
        hist = jnp.where(write[:, :, None], newf, hist)
        hist_len3 = hist_len2 + n_new

        feats_seen = state["feats_seen"] + n_new
        out_emitted = state["out_emitted"]

        total_out_ready = jnp.maximum((feats_seen - R - 1) // ss + 1, 0)
        n_out = jnp.clip(total_out_ready - out_emitted, 0, O)

        W = (O - 1) * ss + Lp + R + 1
        hist_base = feats_seen - hist_len3
        want0 = out_emitted * ss - Lp
        off = want0 - hist_base
        wcol = jax.lax.broadcasted_iota(jnp.int32, (B, W), 1)
        widx = jnp.clip(wcol + off[:, None], 0, H - 1)
        window = jnp.take_along_axis(hist, widx[:, :, None], axis=1)

        out = self.forward(params, window, ivector)
        out = out[:, Lp // ss : Lp // ss + O]

        out_valid = jax.lax.broadcasted_iota(jnp.int32, (B, O), 1) < n_out[:, None]
        out = jnp.where(out_valid[:, :, None], out, 0.0)

        return (
            {
                "hist": hist,
                "hist_len": hist_len3,
                "feats_seen": feats_seen,
                "out_emitted": out_emitted + n_out,
            },
            out,
            out_valid,
        )

    # -------------------------------------------------------------- flush

    def flush(self, state, ivector=None):
        if not hasattr(self, "_flush_jit_fn"):
            self._flush_jit_fn = jax.jit(self._flush_impl)
        return self._flush_jit_fn(self.params, state, ivector)

    def _flush_impl(self, params, state, ivector=None):
        ss, R = self.subsample, self.right_context
        hist, hist_len = state["hist"], state["hist_len"]
        B, H, D = hist.shape
        feats_seen = state["feats_seen"]
        total_out = (feats_seen + ss - 1) // ss
        need = jnp.maximum((total_out - 1) * ss + R + 1 - feats_seen, 0)
        P = R + ss
        last = jnp.take_along_axis(
            hist, jnp.clip(hist_len - 1, 0, H - 1)[:, None, None], axis=1
        )
        pad_feats = jnp.broadcast_to(last, (B, P, D))
        pad_valid = jax.lax.broadcasted_iota(jnp.int32, (B, P), 1) < need[:, None]
        return self._process_chunk_impl(params, state, pad_feats, pad_valid, ivector)
