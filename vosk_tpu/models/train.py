"""Minimal frame-level acoustic-model training.

The reference has no in-process training (its recipe is a Kaldi bash pipeline,
training/run.sh); vosk_tpu ships a small native trainer used to produce test
and demo models: frame cross-entropy on aligned data, Adam, jit-compiled
train step.  Real large-scale training would layer optax/pjit on the same
pure-functional forward.
"""
from __future__ import annotations

from functools import partial
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
import optax

from .tdnnf import TdnnfConfig, TdnnfModel, init_params


def train_frame_ce(
    cfg: TdnnfConfig,
    feats: np.ndarray,   # [N, T, D]
    labels: np.ndarray,  # [N, ceil(T/ss)] pdf targets
    steps: int = 300,
    lr: float = 3e-3,
    seed: int = 0,
    log_every: int = 0,
) -> Dict[str, np.ndarray]:
    """Returns trained parameter dict (numpy)."""
    params = jax.tree_util.tree_map(jnp.asarray, init_params(cfg, seed))
    model = TdnnfModel(cfg, params)
    opt = optax.adam(lr)
    opt_state = opt.init(params)
    feats_j = jnp.asarray(feats)
    labels_j = jnp.asarray(labels)

    def loss_fn(p):
        out = model.forward_utterance(p, feats_j)  # [N, T_out, P]
        logp = jax.nn.log_softmax(out, axis=-1)
        nll = -jnp.take_along_axis(logp, labels_j[..., None], axis=-1)
        return jnp.mean(nll)

    @jax.jit
    def step(p, s):
        loss, grads = jax.value_and_grad(loss_fn)(p)
        updates, s = opt.update(grads, s, p)
        return optax.apply_updates(p, updates), s, loss

    for i in range(steps):
        params, opt_state, loss = step(params, opt_state)
        if log_every and i % log_every == 0:
            print(f"step {i}: loss {float(loss):.4f}")
    return jax.tree_util.tree_map(np.asarray, params)
