"""LF-MMI chain training (models/chain.py) — the reference recipe's
objective (training/run.sh stage 4, local/chain/run_tdnn.sh:135-166)."""
import json
import os

import numpy as np
import pytest

import vosk_tpu
from vosk_tpu.models.chain import (
    DenominatorGraph,
    chain_objective,
    den_logprob,
    num_logprob,
)
from vosk_tpu.utils import toydata


def brute_force_den(den, ll):
    """Enumerate all state sequences (tiny graphs only)."""
    import itertools

    S = den.trans.shape[0]
    T = ll.shape[0]
    tot = -np.inf
    for seq in itertools.product(range(S), repeat=T):
        lp = np.log(den.init[seq[0]]) + ll[0, seq[0]]
        for t in range(1, T):
            lp += np.log(den.trans[seq[t - 1], seq[t]]) + ll[t, seq[t]]
        lp += np.log(den.final[seq[-1]])
        tot = np.logaddexp(tot, lp)
    return tot


def test_den_forward_matches_bruteforce():
    rng = np.random.default_rng(0)
    S, T = 3, 5
    labels = rng.integers(0, S, (20, T))
    den = DenominatorGraph.from_alignments(labels, S)
    ll = rng.standard_normal((2, T, S)).astype(np.float32)
    got = np.asarray(den_logprob(den, ll))
    for b in range(2):
        want = brute_force_den(den, ll[b])
        assert got[b] == pytest.approx(want, rel=1e-5), b


def test_num_le_den_and_objective_improves():
    """num <= den always (the numerator path is one of the denominator's);
    and a gradient step on the chain objective increases the margin."""
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(1)
    S, T, B = 4, 12, 8
    labels = rng.integers(0, S, (B, T))
    den = DenominatorGraph.from_alignments(labels, S)
    ll = jnp.asarray(rng.standard_normal((B, T, S)).astype(np.float32))
    num = np.asarray(num_logprob(den, ll, jnp.asarray(labels)))
    dn = np.asarray(den_logprob(den, ll))
    assert (num <= dn + 1e-4).all()

    def loss(x):
        return chain_objective(den, x, jnp.asarray(labels))[0]

    l0 = float(loss(ll))
    g = jax.grad(loss)(ll)
    l1 = float(loss(ll - 0.5 * g))
    assert l1 < l0


def test_chain_trained_toy_model_decodes():
    """End-to-end: an LF-MMI-trained toy model decodes a held-out corpus
    (the recipe equivalence check; reference trains chain models and
    decodes them with the same runtime, training/RESULTS.txt)."""
    chain_dir = "/tmp/vosk_tpu_toy_chain_v1"
    if not os.path.exists(os.path.join(chain_dir, "vosk_tpu_model.json")):
        toydata.build_toy_model(
            chain_dir, train_steps=400, objective="chain")
    model = vosk_tpu.Model(chain_dir)
    from vosk_tpu.utils.wer import score_corpus

    rng = np.random.default_rng(99)
    refs, hyps = [], []
    for i in range(4):
        ws = [toydata.WORDS[rng.integers(0, len(toydata.WORDS))]
              for _ in range(4)]
        refs.append(ws)
        wav = toydata.make_test_wav(ws, seed=700 + i)
        rec = vosk_tpu.KaldiRecognizer(model, 16000)
        rec.AcceptWaveform(np.clip(wav, -32768, 32767).astype("<i2"))
        hyps.append(json.loads(rec.FinalResult())["text"].split())
    assert score_corpus(refs, hyps).wer <= 0.15, (refs, hyps)


def test_leaky_hmm_adds_paths_and_keeps_bound():
    """leaky-HMM (Kaldi leaky_hmm_coefficient): the denominator with a
    leak accepts strictly more path mass, and the num <= den bound holds
    with the leak enabled."""
    import jax
    import jax.numpy as jnp
    from vosk_tpu.models.chain import (DenominatorGraph, chain_objective,
                                       den_logprob, num_logprob)

    rng = np.random.default_rng(3)
    S, B, T = 6, 4, 12
    labels = rng.integers(0, S, (B, T))
    den0 = DenominatorGraph.from_alignments(labels, S)
    den1 = DenominatorGraph.from_alignments(labels, S)
    den1.leaky_hmm = 0.1
    ll = jnp.asarray(rng.standard_normal((B, T, S)).astype(np.float32))
    d0 = np.asarray(den_logprob(den0, ll))
    d1 = np.asarray(den_logprob(den1, ll))
    assert (d1 >= d0 - 1e-5).all()  # leak only adds mass
    num = np.asarray(num_logprob(den1, ll, jnp.asarray(labels)))
    assert (num <= d1 + 1e-4).all()

    # gradient still improves the objective with the leak on
    def loss(x):
        return chain_objective(den1, x, jnp.asarray(labels))[0]

    l0 = float(loss(ll))
    g = jax.grad(loss)(ll)
    assert float(loss(ll - 0.5 * g)) < l0
