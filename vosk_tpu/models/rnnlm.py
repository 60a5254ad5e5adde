"""Neural (RNN) language model rescoring.

Reference counterpart: Kaldi RNNLM lattice rescoring (loaded at
src/model.cc:316-339, applied at src/recognizer.cc:696-705 as a 0.5/-0.5
mixture with the const-ARPA over a pruned composition, virtualizing RNN
states by truncated n-gram history, lm_order=4).

vosk_tpu native form: a GRU word LM in JAX; `RnnlmRescorer` exposes the
deterministic-LM interface (initial_state/score/final_cost) used by
graph/lattice.rescore_lattice, with states = truncated word histories and
hidden vectors memoized per history (the KaldiRnnlmDeterministicFst trick).
`MixtureLm` combines scorers with weights (the carpa -0.5 / rnnlm +0.5
composition becomes carpa*0.5 + rnnlm*0.5 after the full-carpa add).
"""
from __future__ import annotations

import dataclasses
import json
from pathlib import Path
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass
class RnnlmConfig:
    vocab_size: int = 16          # word ids 0..vocab_size-1; 0 unused
    embed_dim: int = 16
    hidden_dim: int = 32
    bos: int = 1_000_000          # virtual ids for sentence markers
    eos: int = 1_000_001


def init_rnnlm_params(cfg: RnnlmConfig, seed: int = 0) -> Dict[str, np.ndarray]:
    rng = np.random.default_rng(seed)

    def mat(i, o):
        return (rng.standard_normal((i, o)) / np.sqrt(i)).astype(np.float32)

    V = cfg.vocab_size + 2  # + bos/eos rows
    return {
        "embed": mat(V, cfg.embed_dim),
        "gru_wz": mat(cfg.embed_dim + cfg.hidden_dim, cfg.hidden_dim),
        "gru_wr": mat(cfg.embed_dim + cfg.hidden_dim, cfg.hidden_dim),
        "gru_wh": mat(cfg.embed_dim + cfg.hidden_dim, cfg.hidden_dim),
        "out_w": mat(cfg.hidden_dim, V),
        "out_b": np.zeros(V, np.float32),
    }


class RnnlmModel:
    def __init__(self, cfg: RnnlmConfig, params):
        self.cfg = cfg
        self.params = jax.tree_util.tree_map(jnp.asarray, params)
        self._step = jax.jit(self._step_impl)

    def _wid(self, w: int) -> int:
        if w == self.cfg.bos:
            return self.cfg.vocab_size
        if w == self.cfg.eos:
            return self.cfg.vocab_size + 1
        return min(max(w, 0), self.cfg.vocab_size - 1)

    def _step_impl(self, params, h, wid):
        x = params["embed"][wid]
        xh = jnp.concatenate([x, h])
        z = jax.nn.sigmoid(xh @ params["gru_wz"])
        r = jax.nn.sigmoid(xh @ params["gru_wr"])
        xh2 = jnp.concatenate([x, r * h])
        hc = jnp.tanh(xh2 @ params["gru_wh"])
        h2 = (1 - z) * h + z * hc
        logits = h2 @ params["out_w"] + params["out_b"]
        logp = jax.nn.log_softmax(logits)
        return h2, logp

    def init_hidden(self):
        return jnp.zeros(self.cfg.hidden_dim, jnp.float32)

    def step(self, h, word: int):
        """(new hidden, log-probs over extended vocab)."""
        return self._step(self.params, h, self._wid(word))

    # ------------------------------------------------------------- save

    def save(self, path) -> None:
        p = Path(path)
        p.mkdir(parents=True, exist_ok=True)
        (p / "vosk_tpu_rnnlm.json").write_text(
            json.dumps(dataclasses.asdict(self.cfg))
        )
        np.savez(p / "rnnlm.npz", **{k: np.asarray(v) for k, v in self.params.items()})

    @classmethod
    def load(cls, path) -> "RnnlmModel":
        p = Path(path)
        cfg = RnnlmConfig(**json.loads((p / "vosk_tpu_rnnlm.json").read_text()))
        z = np.load(p / "rnnlm.npz")
        return cls(cfg, {k: z[k] for k in z.files})


class RnnlmRescorer:
    """Deterministic-LM adapter over RnnlmModel with truncated-history
    state virtualization (lm_order as in the reference, recognizer.cc:179)."""

    def __init__(self, model: RnnlmModel, lm_order: int = 4):
        self.model = model
        self.hist_len = lm_order - 1
        # history tuple -> (hidden after consuming history, logp for next)
        h0, logp0 = model.step(model.init_hidden(), model.cfg.bos)
        self._cache: Dict[Tuple[int, ...], tuple] = {(): (h0, logp0)}

    def initial_state(self) -> Tuple[int, ...]:
        return ()

    def _get(self, hist: Tuple[int, ...]):
        if hist in self._cache:
            return self._cache[hist]
        ph, _ = self._get(hist[:-1])
        h, logp = self.model.step(ph, hist[-1])
        self._cache[hist] = (h, logp)
        return self._cache[hist]

    def score(self, state: Tuple[int, ...], word: int) -> Tuple[float, Tuple[int, ...]]:
        _, logp = self._get(state)
        cost = -float(logp[self.model._wid(word)])
        ns = (state + (word,))[-self.hist_len :]
        return cost, ns

    def final_cost(self, state: Tuple[int, ...]) -> float:
        _, logp = self._get(state)
        return -float(logp[self.model._wid(self.model.cfg.eos)])

    def clear(self) -> None:
        """Drop memoized hidden states between utterances (the reference
        calls rnnlm_to_add_->Clear(), recognizer.cc:705)."""
        keep = self._cache[()]
        self._cache = {(): keep}


class MixtureLm:
    """Weighted sum of deterministic LMs (the carpa/rnnlm 0.5/0.5 mixture)."""

    def __init__(self, parts: List[Tuple[float, object]]):
        self.parts = parts

    def initial_state(self):
        return tuple(p.initial_state() for _, p in self.parts)

    def score(self, state, word):
        total = 0.0
        ns = []
        for (wgt, lm), st in zip(self.parts, state):
            c, s2 = lm.score(st, word)
            total += wgt * c
            ns.append(s2)
        return total, tuple(ns)

    def final_cost(self, state):
        return sum(
            wgt * lm.final_cost(st) for (wgt, lm), st in zip(self.parts, state)
        )


def train_rnnlm(
    cfg: RnnlmConfig,
    sentences: List[List[int]],
    steps: int = 200,
    lr: float = 1e-2,
    seed: int = 0,
) -> Dict[str, np.ndarray]:
    """Tiny next-word CE trainer (teacher forcing over padded batches)."""
    import optax

    model = RnnlmModel(cfg, init_rnnlm_params(cfg, seed))
    params = model.params
    V = cfg.vocab_size + 2
    bos_id, eos_id = cfg.vocab_size, cfg.vocab_size + 1
    T = max(len(s) for s in sentences) + 1
    N = len(sentences)
    inp = np.full((N, T), eos_id, np.int64)
    tgt = np.full((N, T), -1, np.int64)
    for i, s in enumerate(sentences):
        ids = [bos_id] + [model._wid(w) for w in s]
        out = [model._wid(w) for w in s] + [eos_id]
        inp[i, : len(ids)] = ids
        tgt[i, : len(out)] = out
    inp_j, tgt_j = jnp.asarray(inp), jnp.asarray(tgt)

    def loss_fn(p):
        def cell(h, w):
            x = p["embed"][w]
            xh = jnp.concatenate([x, h], axis=-1)
            z = jax.nn.sigmoid(xh @ p["gru_wz"])
            r = jax.nn.sigmoid(xh @ p["gru_wr"])
            xh2 = jnp.concatenate([x, r * h], axis=-1)
            hc = jnp.tanh(xh2 @ p["gru_wh"])
            h2 = (1 - z) * h + z * hc
            return h2, h2

        h0 = jnp.zeros((N, cfg.hidden_dim))
        _, hs = jax.lax.scan(cell, h0, jnp.swapaxes(inp_j, 0, 1))
        logits = hs @ p["out_w"] + p["out_b"]  # [T, N, V]
        logp = jax.nn.log_softmax(logits, axis=-1)
        t = jnp.swapaxes(tgt_j, 0, 1)
        mask = t >= 0
        nll = -jnp.take_along_axis(logp, jnp.maximum(t, 0)[..., None], axis=-1)[..., 0]
        return jnp.sum(nll * mask) / jnp.maximum(jnp.sum(mask), 1)

    opt = optax.adam(lr)
    opt_state = opt.init(params)

    @jax.jit
    def step(p, s):
        loss, g = jax.value_and_grad(loss_fn)(p)
        up, s = opt.update(g, s, p)
        return optax.apply_updates(p, up), s, loss

    for _ in range(steps):
        params, opt_state, loss = step(params, opt_state)
    return jax.tree_util.tree_map(np.asarray, params)
