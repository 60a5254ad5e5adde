"""Kaldi `rnnlm/` directory loading.

The reference loads four artifacts (model.cc:316-339):
  rnnlm/final.raw                 nnet3 network (no TransitionModel)
  rnnlm/feat_embedding.final.mat  feature-embedding matrix [feat_dim, emb]
  rnnlm/word_feats.txt            sparse word features (per line:
                                  word_id  feat_idx feat_val ...)
  rnnlm/special_symbol_opts.conf  --bos-symbol/--eos-symbol/--brk-symbol

and composes the dense word-embedding matrix as
word_feature_mat @ feature_embedding (AddSmatMat at model.cc:330-334).

We load all four the same way.  Scoring: feedforward TDNN-style RNNLMs
run step-wise over a bounded word-history window with tied output
embeddings; recurrent (LSTM) nets take nnet3's time-stepped recurrent
evaluator (LstmNonlinearityComponent + IfDefined(Offset(..,-d))
back-edges) over the same bounded window — the truncation Kaldi's own
RnnlmDeterministicFst applies via --max-ngram-order.
"""
from __future__ import annotations

import dataclasses
from pathlib import Path
from typing import Dict, Optional, Tuple

import numpy as np

from ..utils.config import read_config_file
from .kaldiio import open_kaldi, read_kaldi_matrix
from .nnet3 import Nnet3


@dataclasses.dataclass
class KaldiRnnlm:
    net: Nnet3
    word_embedding: np.ndarray  # [num_words, emb_dim]
    bos: int
    eos: int
    brk: int


def read_sparse_word_features(path, feat_dim: int) -> np.ndarray:
    """word_feats.txt -> dense [num_words, feat_dim]
    (rnnlm::ReadSparseWordFeatures, model.cc:325-328)."""
    rows = []
    for line in Path(path).read_text().splitlines():
        parts = line.split()
        if not parts:
            continue
        wid = int(parts[0])
        feats = parts[1:]
        if len(feats) % 2:
            raise ValueError(f"{path}: odd feature list for word {wid}")
        rows.append((wid, feats))
    num_words = max(w for w, _ in rows) + 1 if rows else 0
    mat = np.zeros((num_words, feat_dim), np.float32)
    for wid, feats in rows:
        for i in range(0, len(feats), 2):
            idx = int(feats[i])
            if not (0 <= idx < feat_dim):
                raise ValueError(f"{path}: feature index {idx} >= {feat_dim}")
            mat[wid, idx] = float(feats[i + 1])
    return mat


def read_rnnlm_dir(path) -> KaldiRnnlm:
    p = Path(path)
    feat_embedding = read_kaldi_matrix(p / "feat_embedding.final.mat")
    word_feats = read_sparse_word_features(
        p / "word_feats.txt", feat_embedding.shape[0]
    )
    word_embedding = (word_feats @ feat_embedding).astype(np.float32)

    opts = read_config_file(p / "special_symbol_opts.conf")
    bos = int(opts.get("bos-symbol", 1))
    eos = int(opts.get("eos-symbol", 2))
    brk = int(opts.get("brk-symbol", 3))

    r, binary = open_kaldi(p / "final.raw")
    if not binary:
        raise ValueError("text-mode final.raw not supported")
    net = Nnet3.read(r)
    return KaldiRnnlm(net, word_embedding, bos, eos, brk)


class KaldiRnnlmRescorer:
    """Deterministic rescoring adapter (score/final_cost/initial_state)
    over a loaded Kaldi RNNLM with a bounded word-history window.

    Kaldi's own rescoring runs the network incrementally per lattice state
    (kaldi::rnnlm::RnnlmDeterministicFst); with feedforward (TDNN) RNNLMs a
    bounded history is exact up to the network's left context.  Output
    logits use the tied embedding: logit(w) = out . word_embedding[w]
    (Kaldi's sampling-trained RNNLMs treat the unnormalized logit as a
    log-prob, rnnlm-compute-state.cc).
    """

    def __init__(self, lm: KaldiRnnlm, history: int = 4):
        from ..models.am import _node_context

        self.lm = lm
        self.history = history
        if lm.net.has_recurrence():
            # recurrent (LSTM) nets consume the whole history window via
            # their back-edges; no receptive-field padding needed (and
            # _node_context would not terminate on a cyclic graph)
            self.left_context = 0
            self.right_context = 0
        else:
            # left context of the output node: how many embedded words the
            # net consumes before producing the current prediction
            lc, rc = _node_context(lm.net, "output", {})
            self.left_context = max(lc, 0)
            self.right_context = max(rc, 0)
        self._cache: Dict[Tuple[int, ...], np.ndarray] = {}

    def initial_state(self) -> Tuple[int, ...]:
        return (self.lm.bos,)

    def _logprobs(self, state: Tuple[int, ...]) -> np.ndarray:
        out = self._cache.get(state)
        if out is None:
            emb = self.lm.word_embedding[list(state)]  # [T, emb]
            brk = self.lm.word_embedding[self.lm.brk]
            # pad the network's receptive field with <brk> embeddings: lc
            # history rows on the left, rc rows on the right so the final
            # valid output row aligns with the last real word
            lpad = max(self.left_context - len(state) + 1, 0)
            pads = [np.tile(brk, (lpad, 1))] if lpad else []
            pads.append(emb)
            if self.right_context:
                pads.append(np.tile(brk, (self.right_context, 1)))
            emb = np.concatenate(pads, axis=0)
            hid = np.asarray(
                self.lm.net.evaluate(
                    {"input": emb.astype(np.float32)}, output="output"
                )
            )
            # evaluate() is same-length (edge-clamped): the row aligned to
            # the last real word sits right_context rows before the end
            last = hid[-1 - self.right_context] if self.right_context else hid[-1]
            # Kaldi convention (rnnlm-compute-state.cc LogProbOfWord): the
            # raw unnormalized logit IS the log-prob — sampling-trained
            # RNNLMs are self-normalized; softmax-normalizing here would
            # scale costs differently from the reference
            out = last @ self.lm.word_embedding.T
            self._cache[state] = out
        return out

    def score(self, state: Tuple[int, ...], word: int) -> Tuple[float, Tuple[int, ...]]:
        lp = self._logprobs(state)
        cost = -float(lp[word]) if 0 <= word < len(lp) else 20.0
        ns = (state + (word,))[-self.history:]
        return cost, ns

    def final_cost(self, state: Tuple[int, ...]) -> float:
        cost, _ = self.score(state, self.lm.eos)
        return cost

    def clear(self) -> None:
        self._cache.clear()
