"""WER parity across decode configurations (utils/wer.py harness).

The reference's QA story is real-model decode + WER scoring
(training/RESULTS.txt:1-2, training/local/score.sh); here the same metric
gates the framework's own decode variants against each other on a held-out
synthetic corpus:

  (a) v3 oracle vs v4 production step vs v4+ragged — zero WER delta
  (b) adaptive max-active ladder vs fixed-K          — bounded delta
  (c) 8 kHz input path vs native 16 kHz              — bounded delta
"""
import json
import os

import numpy as np
import pytest

import vosk_tpu
from vosk_tpu.ops.viterbi import BatchViterbi, DecodeParams
from vosk_tpu.utils import toydata
from vosk_tpu.utils.wer import score_corpus

TOY_DIR = "/tmp/vosk_tpu_toy_model_v1"
N_UTTS = 8
WORDS_PER_UTT = 4


@pytest.fixture(scope="module")
def model():
    if not os.path.exists(os.path.join(TOY_DIR, "vosk_tpu_model.json")):
        toydata.build_toy_model(TOY_DIR, train_steps=400)
    return vosk_tpu.Model(TOY_DIR)


@pytest.fixture(scope="module")
def corpus():
    """Held-out word sequences (seeds disjoint from training, which uses
    the model-build rng stream)."""
    rng = np.random.default_rng(5150)
    utts = []
    for i in range(N_UTTS):
        ws = [toydata.WORDS[rng.integers(0, len(toydata.WORDS))]
              for _ in range(WORDS_PER_UTT)]
        wav = toydata.make_test_wav(ws, seed=900 + i)
        utts.append((ws, wav))
    return utts


def _decode_loglikes(native, wav):
    """Features -> AM loglikes for one utterance (shared across decoders so
    decoder variants are compared on IDENTICAL acoustics)."""
    ex = native.feature_extractor()
    am = native.make_am()
    feats = np.asarray(ex.extract(wav[None]))
    ll = np.asarray(am.forward_utterance(am.params, feats))
    return ll  # [1, T, P]


def _words_from_traceback(native, dec, recs, frontier):
    _, ols, _ = dec.traceback([recs], frontier, 0)
    return [native.words.name(o) for o in ols]


def _dec(native, **kw):
    return BatchViterbi(
        native.graph,
        DecodeParams(
            beam=native.config.beam,
            max_active=native.config.max_active,
            lattice_beam=native.config.lattice_beam,
            acoustic_scale=native.config.acoustic_scale,
        ),
        silence_pdfs=native.silence_pdfs,
        lattice_records=True,
        **kw,
    )


def test_wer_v3_vs_v4_vs_ragged(model, corpus):
    """The production v4 step (packed16 + ragged) and the v3 oracle must
    produce word-identical transcripts on the held-out corpus: WER(v4 | v3)
    == 0 and WER(ragged | plain v4) == 0."""
    native = model._model
    decs = {
        "v3": _dec(native, frame_step="v3", layout="padded"),
        "v4": _dec(native, frame_step="auto", pack="packed16",
                   optimize_graph=True, ragged=False),
        "v4r": _dec(native, frame_step="auto", pack="packed16",
                    optimize_graph=True, ragged=True),
    }
    hyps = {k: [] for k in decs}
    refs = []
    for ws, wav in corpus:
        refs.append(ws)
        ll = _decode_loglikes(native, wav)
        for k, dec in decs.items():
            fr, recs, _, _ = dec.decode_chunk(dec.init_frontier(1), ll)
            hyps[k].append(_words_from_traceback(native, dec, recs, fr))

    base = score_corpus(refs, hyps["v3"])
    # the decoders themselves must agree word-for-word (f16 graph weights
    # may not flip any word on this corpus; if they ever do, that is a
    # finding, not tolerance creep)
    assert score_corpus(hyps["v3"], hyps["v4"]).errors == 0, (
        hyps["v3"], hyps["v4"])
    assert score_corpus(hyps["v4"], hyps["v4r"]).errors == 0
    # and the model actually recognizes the held-out corpus
    assert base.wer <= 0.10, base.as_dict()


def test_wer_adaptive_ladder_vs_fixed(model, corpus):
    """Adaptive max-active ladder vs fixed-K through the FusedPipeline:
    bounded WER delta (ladder is an upper-bound adaptation; on the toy
    corpus it should be word-identical)."""
    from vosk_tpu.runtime.pipeline import FusedPipeline

    native = model._model
    B = 1
    pipe = FusedPipeline(native, batch=B, collect_records=True,
                         lattice_records=True)
    S = pipe.chunk_samples

    def merge_chunks(recs):
        """Stacked pipeline records [chunks, F, B, ...] -> [frames, B, ...]
        (traceback consumes scan-native [T, B, ...])."""
        return {
            k: np.asarray(v).reshape((-1,) + np.asarray(v).shape[2:])
            for k, v in recs.items()
        }

    def pad_k(r, K, S_sent):
        out = {}
        for key, v in r.items():
            v = np.asarray(v)
            w = K - v.shape[-1]
            if w > 0:
                fill = {"pm": -1, "state": S_sent, "f_cost": np.inf,
                        "lat_pm": -1, "lat_cost": np.inf}[key]
                v = np.concatenate(
                    [v, np.full(v.shape[:-1] + (w,), fill, v.dtype)],
                    axis=-1)
            out[key] = v
        return out

    def decode(wav, adaptive):
        n = ((len(wav) + S - 1) // S) * S
        wavp = np.zeros(n, np.float32)
        wavp[: len(wav)] = wav
        audio = wavp.reshape(-1, 1, S)
        st = pipe.init_state()
        if adaptive:
            st, recs_l, _ = pipe.run_adaptive(st, audio, seg=4)
            # pad every segment's records to the FULL decoder width so slot
            # ids stay valid against the resized final frontier
            recs = [pad_k(merge_chunks(r), pipe.dec.K, pipe.dec.S)
                    for r in recs_l]
            fr = pipe.dec.resize_frontier(st["frontier"], pipe.dec.K)
            _, ols, _ = pipe.dec.traceback(recs, fr, 0)
        else:
            st, recs, _ = pipe.run_scan(st, audio)
            _, ols, _ = pipe.dec.traceback(
                [merge_chunks(recs)], st["frontier"], 0)
        return [native.words.name(o) for o in ols]

    refs, fixed_h, adap_h = [], [], []
    for ws, wav in corpus[:4]:
        refs.append(ws)
        fixed_h.append(decode(wav, adaptive=False))
        adap_h.append(decode(wav, adaptive=True))
    delta = score_corpus(fixed_h, adap_h)
    assert delta.wer <= 0.0, (fixed_h, adap_h)
    assert score_corpus(refs, fixed_h).wer <= 0.10


def test_wer_8k_vs_16k_input(model, corpus):
    """Resampled 8 kHz input vs native 16 kHz through the full Recognizer:
    bounded WER delta (the band-limited resampler keeps tones < 4 kHz
    intact; quantization-boundary flips are allowed within the bound)."""
    def decode(rec, wav_arr):
        # ndarray input: int16 = accept_waveform_s, float = _f (both paths
        # are exercised; bytes would round-trip through pcm16 only)
        rec.AcceptWaveform(wav_arr)
        return json.loads(rec.FinalResult())["text"].split()

    from vosk_tpu.ops.resample import resample_offline

    # telephone-band vocabulary: phone 8's 4.7 kHz tone exceeds the 8 kHz
    # Nyquist and is destroyed by downsampling, so words using it ("three",
    # "seven") are excluded — the classic 8 kHz telephony constraint
    band_ok = [w for w in toydata.WORDS
               if all(toydata.TONE_FREQS[p - 1] < 3900
                      for p in toydata.WORD_PHONES[w])]
    rng = np.random.default_rng(77)
    refs, h16, h8 = [], [], []
    for i in range(4):
        ws = [band_ok[rng.integers(0, len(band_ok))] for _ in range(4)]
        refs.append(ws)
        wav16 = toydata.make_test_wav(ws, seed=950 + i)
        wav8 = np.asarray(resample_offline(wav16, 16000, 8000))
        # apples-to-apples: the anchor decodes the SAME band-limited audio
        # at 16 kHz (a 16 kHz-trained AM degrades on 0-4 kHz audio no
        # matter how it arrives — the reference trains separate 8 kHz
        # models for telephony; this test isolates the INPUT PATH delta)
        wav8_i16 = np.clip(wav8, -32768, 32767).astype("<i2")
        # the anchor gets BIT-IDENTICAL floats to what the 8 kHz input
        # path produces internally (StreamingResampler == resample_offline
        # bit-exact, test_resample.py); int16 re-quantization would
        # perturb samples <=1 LSB, which the sharply-trained toy AM can
        # amplify into word flips — accept_waveform_f-style float input
        wav16b = np.asarray(
            resample_offline(wav8_i16.astype(np.float32), 8000, 16000))
        rec16 = vosk_tpu.KaldiRecognizer(model, 16000)
        h16.append(decode(rec16, wav16b))
        rec8 = vosk_tpu.KaldiRecognizer(model, 8000)
        h8.append(decode(rec8, wav8_i16))
    d = score_corpus(h16, h8)
    # bit-identical audio through the same pipeline: ZERO tolerance
    assert d.errors == 0, (h16, h8, d.as_dict())
    # accuracy on band-limited audio through a 16 kHz-trained AM degrades
    # (upper mel bins lose energy — the reference ships separate 8 kHz
    # models for telephony); bound the degradation rather than expect
    # parity with full-band decoding
    acc = score_corpus(refs, h8)
    assert acc.wer <= 0.5, acc.as_dict()
