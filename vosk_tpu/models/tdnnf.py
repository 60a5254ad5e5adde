"""TDNN-F acoustic model — the chain-model family the reference serves
(nnet3 `AmNnetSimple` loaded at reference src/model.cc:233-246; architecture
family per training/local/chain/run_tdnn.sh:104-118: relu-batchnorm input
layer, a stack of factorized TDNN-F layers with bottleneck + bypass, prefinal
linear, chain output without log-softmax, frame-subsampling 3).

TPU-first formulation: every layer is a batched matmul over *spliced* frames
(gather + reshape), so the whole forward is a chain of [B*T, in] @ [in, out]
MXU matmuls — no conv primitives, no dynamic shapes.  bfloat16 matmuls with
f32 accumulation are used when `compute_dtype=bfloat16`.

Streaming uses sliding-window recompute: to emit outputs for frames
[t0, t1) the model is fed features [t0 - left_ctx, t1 + right_ctx), with the
context tail carried between chunks (same contract as the reference's
chunked looped computation, `DecodableNnetSimpleLoopedInfo`).
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass
class TdnnfConfig:
    feat_dim: int = 40
    ivector_dim: int = 0
    hidden_dim: int = 512
    bottleneck_dim: int = 96
    prefinal_dim: int = 192
    num_pdfs: int = 128
    # per-TDNN-F-layer time strides (0 = no splicing in that layer)
    time_strides: tuple = (1, 1, 1, 0, 3, 3, 3, 3, 3, 3, 3)
    subsample: int = 3
    bypass_scale: float = 0.75
    compute_dtype: str = "float32"  # or "bfloat16"

    @property
    def left_context(self) -> int:
        return 1 + sum(self.time_strides)

    @property
    def right_context(self) -> int:
        return 1 + sum(self.time_strides)


def init_params(cfg: TdnnfConfig, seed: int = 0) -> dict:
    """Random (inference-normalized) parameters; real models load weights via
    io.native / io.kaldi converters."""
    rng = np.random.default_rng(seed)

    def mat(i, o):
        return (rng.standard_normal((i, o)) / np.sqrt(i)).astype(np.float32)

    p: dict = {}
    in_dim = (cfg.feat_dim + cfg.ivector_dim) * 3  # splice (-1,0,1)
    p["tdnn1_w"] = mat(in_dim, cfg.hidden_dim)
    p["tdnn1_b"] = np.zeros(cfg.hidden_dim, np.float32)
    p["tdnn1_scale"] = np.ones(cfg.hidden_dim, np.float32)
    p["tdnn1_offset"] = np.zeros(cfg.hidden_dim, np.float32)
    for i, s in enumerate(cfg.time_strides):
        taps = 1 if s == 0 else 2
        p[f"tdnnf{i}_lin"] = mat(cfg.hidden_dim * taps, cfg.bottleneck_dim)
        p[f"tdnnf{i}_aff_w"] = mat(cfg.bottleneck_dim * taps, cfg.hidden_dim)
        p[f"tdnnf{i}_aff_b"] = np.zeros(cfg.hidden_dim, np.float32)
        p[f"tdnnf{i}_scale"] = np.ones(cfg.hidden_dim, np.float32)
        p[f"tdnnf{i}_offset"] = np.zeros(cfg.hidden_dim, np.float32)
    p["prefinal_l"] = mat(cfg.hidden_dim, cfg.prefinal_dim)
    p["prefinal_w"] = mat(cfg.prefinal_dim, cfg.hidden_dim)
    p["prefinal_b"] = np.zeros(cfg.hidden_dim, np.float32)
    p["prefinal_scale"] = np.ones(cfg.hidden_dim, np.float32)
    p["prefinal_offset"] = np.zeros(cfg.hidden_dim, np.float32)
    p["prefinal_l2"] = mat(cfg.hidden_dim, cfg.prefinal_dim)
    p["output_w"] = mat(cfg.prefinal_dim, cfg.num_pdfs)
    p["output_b"] = np.zeros(cfg.num_pdfs, np.float32)
    return p


def _splice(x, offsets):
    """x: [B, T, D] -> [B, T, D*len(offsets)] with edge clamping.

    Edge clamping only matters for frames inside the context margin; callers
    (forward_utterance / streaming) pre-pad the input with edge-frame copies
    — Kaldi's looped-decodable convention — so emitted frames never depend on
    the clamping.
    """
    T = x.shape[1]
    parts = []
    for off in offsets:
        idx = np.clip(np.arange(T) + off, 0, T - 1)
        parts.append(x[:, idx])
    return jnp.concatenate(parts, axis=-1)


class TdnnfModel:
    """Stateless forward over parameter pytrees (pure-functional, jit/pjit
    friendly); streaming state = carried feature context."""

    def __init__(self, cfg: TdnnfConfig, params: dict):
        self.cfg = cfg
        self.params = jax.tree_util.tree_map(jnp.asarray, params)

    # ---- full forward: feats [B, T, feat_dim], ivec [B, ivector_dim]|None
    def forward(self, params, feats, ivector=None):
        cfg = self.cfg
        cdt = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32

        def mm(x, w):
            return jnp.matmul(x.astype(cdt), w.astype(cdt), preferred_element_type=jnp.float32)

        x = feats
        if cfg.ivector_dim:
            if ivector is None:
                raise ValueError("model expects an i-vector input")
            iv = jnp.broadcast_to(ivector[:, None, :], (x.shape[0], x.shape[1], cfg.ivector_dim))
            x = jnp.concatenate([x, iv], axis=-1)
        x = _splice(x, (-1, 0, 1))
        x = mm(x, params["tdnn1_w"]) + params["tdnn1_b"]
        x = jnp.maximum(x, 0.0) * params["tdnn1_scale"] + params["tdnn1_offset"]

        for i, s in enumerate(self.cfg.time_strides):
            y = x if s == 0 else _splice(x, (-s, 0))
            b = mm(y, params[f"tdnnf{i}_lin"])
            y2 = b if s == 0 else _splice(b, (0, s))
            y2 = mm(y2, params[f"tdnnf{i}_aff_w"]) + params[f"tdnnf{i}_aff_b"]
            y2 = jnp.maximum(y2, 0.0) * params[f"tdnnf{i}_scale"] + params[f"tdnnf{i}_offset"]
            x = cfg.bypass_scale * x + y2

        x = mm(x, params["prefinal_l"])
        x = mm(x, params["prefinal_w"]) + params["prefinal_b"]
        x = jnp.maximum(x, 0.0) * params["prefinal_scale"] + params["prefinal_offset"]
        x = mm(x, params["prefinal_l2"])
        out = mm(x, params["output_w"]) + params["output_b"]
        # chain output: raw pseudo-loglikes, no log-softmax (run_tdnn.sh:120)
        return out[:, :: cfg.subsample]

    def forward_utterance(self, params, feats, ivector=None):
        """Whole-utterance forward with Kaldi edge-copy padding.

        feats: [B, T, D] -> [B, ceil(T/ss), P]; output j is centered at
        input frame j*ss, context taken from edge-duplicated padding.
        """
        cfg = self.cfg
        ss = cfg.subsample
        Lp = self._left_pad
        R = cfg.right_context
        T = feats.shape[1]
        n_out = -(-T // ss)
        left = jnp.repeat(feats[:, :1], Lp, axis=1)
        # pad right so the last output frame has full right context
        need_right = (n_out - 1) * ss + R + 1 - T
        right = jnp.repeat(feats[:, -1:], max(need_right, 0), axis=1)
        window = jnp.concatenate([left, feats, right], axis=1)
        out = self.forward(params, window, ivector)
        return out[:, Lp // ss : Lp // ss + n_out]

    # ---- offline convenience
    def __call__(self, feats, ivector=None):
        if not hasattr(self, "_utt_jit_fn"):
            self._utt_jit_fn = jax.jit(self.forward_utterance)
        return self._utt_jit_fn(self.params, feats, ivector)

    # ---- streaming ----------------------------------------------------

    @property
    def _left_pad(self) -> int:
        """Left context rounded up to a multiple of subsample so the
        forward's output subsampling grid lands exactly on the desired
        output frames."""
        ss = self.cfg.subsample
        return ((self.cfg.left_context + ss - 1) // ss) * ss

    def init_stream_state(self, batch: int, chunk_frames: int):
        """chunk_frames: max feature frames fed per chunk (masked by valid).

        Carried: feature history ring [B, H, D] + counters.  The history must
        cover [oldest-needed-frame, newest): Lp + R + chunk + ss frames.
        """
        cfg = self.cfg
        H = self._left_pad + cfg.right_context + chunk_frames + cfg.subsample
        return {
            "hist": jnp.zeros((batch, H, cfg.feat_dim), jnp.float32),
            "hist_len": jnp.zeros((batch,), jnp.int32),  # valid frames in hist
            "feats_seen": jnp.zeros((batch,), jnp.int32),
            "out_emitted": jnp.zeros((batch,), jnp.int32),
        }

    def stream_max_out(self, chunk_frames: int) -> int:
        return chunk_frames // self.cfg.subsample + 1

    def process_chunk(self, state, feats, valid, ivector=None):
        """Streaming step (jit-compiled per shape).

        feats: [B, F, D] new feature frames (masked by valid [B, F], which
        must be a prefix mask per row).  Returns (state', loglikes [B, O, P],
        out_valid [B, O]): output frame rows out_emitted..out_emitted+n-1,
        i.e. feature frames t*subsample with full left/right context.
        """
        if not hasattr(self, "_chunk_jit_fn"):
            self._chunk_jit_fn = jax.jit(self._process_chunk_impl)
        return self._chunk_jit_fn(self.params, state, feats, valid, ivector)

    def _process_chunk_impl(self, params, state, feats, valid, ivector):
        cfg = self.cfg
        B, F, D = feats.shape
        hist, hist_len = state["hist"], state["hist_len"]
        H = hist.shape[1]
        O = self.stream_max_out(F)
        ss, R = cfg.subsample, cfg.right_context
        Lp = self._left_pad

        n_new = jnp.sum(valid, axis=1).astype(jnp.int32)  # [B]

        # shift out oldest frames if appending would overflow the ring
        col = jax.lax.broadcasted_iota(jnp.int32, (B, H), 1)
        overflow = jnp.maximum(hist_len + n_new - H, 0)
        src = jnp.clip(col + overflow[:, None], 0, H - 1)
        hist = jnp.take_along_axis(hist, src[:, :, None], axis=1)
        hist_len2 = hist_len - overflow
        # append new frames at hist_len2
        fsrc = jnp.clip(col - hist_len2[:, None], 0, F - 1)
        newf = jnp.take_along_axis(feats, fsrc[:, :, None], axis=1)
        write = (col >= hist_len2[:, None]) & (col < (hist_len2 + n_new)[:, None])
        hist = jnp.where(write[:, :, None], newf, hist)
        hist_len3 = hist_len2 + n_new

        feats_seen = state["feats_seen"] + n_new
        out_emitted = state["out_emitted"]

        # output frame j needs feature frames [j*ss - L, j*ss + R]; emit once
        # j*ss + R < feats_seen
        total_out_ready = jnp.maximum((feats_seen - R - 1) // ss + 1, 0)
        n_out = jnp.clip(total_out_ready - out_emitted, 0, O)

        # forward window: frames [out_emitted*ss - Lp, (out_emitted+O-1)*ss + R]
        W = (O - 1) * ss + Lp + R + 1
        hist_base = feats_seen - hist_len3  # global index of hist[0]
        want0 = out_emitted * ss - Lp  # negative early on -> clamped (edge copy)
        off = want0 - hist_base
        wcol = jax.lax.broadcasted_iota(jnp.int32, (B, W), 1)
        widx = jnp.clip(wcol + off[:, None], 0, H - 1)
        window = jnp.take_along_axis(hist, widx[:, :, None], axis=1)  # [B, W, D]

        out = self.forward(params, window, ivector)
        # forward emits window frames 0, ss, 2ss, ...; window frame Lp is
        # output frame `out_emitted`, and Lp % ss == 0 by construction.
        out = out[:, Lp // ss : Lp // ss + O]

        out_valid = jax.lax.broadcasted_iota(jnp.int32, (B, O), 1) < n_out[:, None]
        out = jnp.where(out_valid[:, :, None], out, 0.0)

        new_state = {
            "hist": hist,
            "hist_len": hist_len3,
            "feats_seen": feats_seen,
            "out_emitted": out_emitted + n_out,
        }
        return new_state, out, out_valid

    # ---- end-of-stream flush -----------------------------------------

    def flush(self, state):
        """Emit the outputs still blocked on right context by feeding
        edge-copies of the last frame (the reference flushes via
        `feature_pipeline_->InputFinished()`, recognizer.cc:824-827).

        Returns (state', loglikes [B, O2, P], out_valid [B, O2]).  After this
        the stream has emitted exactly ceil(feats_seen/subsample) outputs.
        """
        if not hasattr(self, "_flush_jit_fn"):
            self._flush_jit_fn = jax.jit(self._flush_impl)
        return self._flush_jit_fn(self.params, state)

    def _flush_impl(self, params, state):
        cfg = self.cfg
        ss, R = cfg.subsample, cfg.right_context
        hist, hist_len = state["hist"], state["hist_len"]
        B, H, D = hist.shape
        feats_seen = state["feats_seen"]

        # per-channel pad so that total outputs = ceil(feats_seen/ss)
        total_out = (feats_seen + ss - 1) // ss
        need = jnp.maximum((total_out - 1) * ss + R + 1 - feats_seen, 0)
        P = R + ss  # static max pad
        last = jnp.take_along_axis(
            hist, jnp.clip(hist_len - 1, 0, H - 1)[:, None, None], axis=1
        )  # [B, 1, D]
        pad_feats = jnp.broadcast_to(last, (B, P, D))
        pad_valid = jax.lax.broadcasted_iota(jnp.int32, (B, P), 1) < need[:, None]
        return self._process_chunk_impl(params, state, pad_feats, pad_valid, None)
