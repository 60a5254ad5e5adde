"""Flat-start GMM bootstrap alignment (training/gmm.py) — the reference
recipe's mono-GMM stages (training/run.sh:31-60) done in-process, so the
chain recipe can train from (wav, transcript) pairs alone."""
import json
import os

import numpy as np
import pytest

from vosk_tpu.training.gmm import (
    GmmConfig,
    MonoGmmAligner,
    flat_start_align,
    viterbi_align,
)
from vosk_tpu.utils import toydata


def test_viterbi_align_chain_with_optional_silence():
    # 3 states: optional sil, phone A, optional sil; frames clearly A
    T = 10
    ll = np.full((T, 3), -10.0)
    ll[:, 1] = -1.0          # phone A likeliest everywhere
    opt = np.array([True, False, True])
    path = viterbi_align(ll, opt, np.log(0.7), np.log(0.3))
    assert (path == 1).all()  # both optional silences skipped

    # make the first 3 and last 2 frames silence-like
    ll[:3, 0] = -0.1
    ll[-2:, 2] = -0.1
    path = viterbi_align(ll, opt, np.log(0.7), np.log(0.3))
    assert (path[:3] == 0).all() and (path[-2:] == 2).all()
    assert (path[3:-2] == 1).all()


def test_flat_start_alignment_matches_oracle():
    """Train the aligner from transcripts only; compare the per-sample
    phone alignment against the synthesis oracle."""
    rng = np.random.default_rng(0)
    words, phones = toydata.build_symbols()
    ex = toydata.make_extractor()
    wavs, trans, oracle = [], [], []
    for _ in range(10):
        ws = [toydata.WORDS[rng.integers(0, len(toydata.WORDS))]
              for _ in range(4)]
        wav, phn = toydata.synth_utterance(ws, rng)
        wavs.append(wav)
        trans.append([words.find(w) for w in ws])
        oracle.append(phn)
    prons = {words.find(w): [list(p)] for w, p in toydata.WORD_PHONES.items()}
    aligns = flat_start_align(
        wavs, trans, prons, num_phones=len(phones),
        sil_phone=toydata.SIL_PHONE, extractor=ex,
        cfg=GmmConfig(num_iters=6),
    )
    agree = total = 0
    for a, o in zip(aligns, oracle):
        n = min(len(a), len(o))
        agree += int((a[:n] == o[:n]).sum())
        total += n
    acc = agree / total
    # flat-start mono alignment on the toy corpus should land the vast
    # majority of frames on the oracle phone (Kaldi mono does the same on
    # clean speech); boundary frames wobble, interiors shouldn't
    assert acc > 0.80, acc


@pytest.mark.slow
def test_recipe_trains_from_transcripts_only(tmp_path):
    """run_recipe with phn=None bootstraps its own alignments and still
    produces a decodable model (the flat-start property of run.sh)."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    from vosk_tpu.graph.builder import Lexicon
    from vosk_tpu.training.recipe import RecipeConfig, run_recipe

    rng = np.random.default_rng(1)
    words, phones = toydata.build_symbols()
    ex = toydata.make_extractor()
    train, dev = [], []
    for _ in range(20):
        ws = [toydata.WORDS[rng.integers(0, len(toydata.WORDS))]
              for _ in range(5)]
        wav, _ = toydata.synth_utterance(ws, rng)
        train.append((ws, wav, None))   # <-- no alignment provided
    for _ in range(5):
        ws = [toydata.WORDS[rng.integers(0, len(toydata.WORDS))]
              for _ in range(4)]
        wav, _ = toydata.synth_utterance(ws, rng)
        dev.append((ws, wav))
    lex = Lexicon(
        words=words, phones=phones,
        prons={words.find(w): [list(p)]
               for w, p in toydata.WORD_PHONES.items()},
        silence_phone=toydata.SIL_PHONE, silence_cost=0.7,
    )
    out = str(tmp_path / "flatstart_model")
    rep = run_recipe(
        RecipeConfig(out_dir=out, objective="ce", train_steps=300),
        train, dev, lex, words, phones, ex, toydata.SIL_PHONE,
        log=lambda s: None,
    )
    assert os.path.exists(os.path.join(out, "RESULTS.json"))
    # bootstrapped alignments are noisier than the oracle; the model must
    # still be clearly decoding (toy corpus, 8-word vocab)
    assert rep["wer"] <= 0.30, rep
