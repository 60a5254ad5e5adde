"""End-to-end library drive used by /verify: synthesized tone audio ->
features -> WFST decode -> transcript, plus edge-case probes.

Run: python /root/repo/tools/verify_drive.py   (CPU, ~30 s)
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
import jax

jax.config.update("jax_platforms", "cpu")
import numpy as np

from vosk_tpu.graph.fst import StdFst, SymbolTable, flatten_fst
from vosk_tpu.io.wav import read_wav, write_wav
from vosk_tpu.ops.features import (
    FbankOptions,
    FeatureExtractor,
    FrameOptions,
    MelOptions,
    MfccOptions,
)
from vosk_tpu.ops.viterbi import BatchViterbi, DecodeParams


def main() -> None:
    words = SymbolTable(["<eps>", "one", "two"])
    lexicon = {1: [1, 2], 2: [3, 1]}
    freqs = {1: 440.0, 2: 1320.0, 3: 2640.0}

    f = StdFst()
    root = f.add_state()
    f.set_start(root)
    f.set_final(root, 0.0)
    for wid, phones in lexicon.items():
        prev = root
        for i, p in enumerate(phones):
            st = f.add_state()
            f.add_arc(prev, p, wid if i == 0 else 0, 0.5, st)
            f.add_arc(st, p, 0, 0.1, st)
            prev = st
        f.add_arc(prev, 0, 0, 0.3, root)
    graph = flatten_fst(f)

    rate = 16000

    def tone(freq, dur):
        t = np.arange(int(dur * rate)) / rate
        return (4000 * np.sin(2 * np.pi * freq * t)).astype(np.float32)

    seq = [1, 2, 3, 1, 1, 2]  # one two one
    wav = np.concatenate([tone(freqs[p], 0.12) for p in seq])
    write_wav("/tmp/verify_tone.wav", wav, rate)
    wav2, r2 = read_wav("/tmp/verify_tone.wav")
    assert r2 == rate and len(wav2) == len(wav)

    fb = FeatureExtractor(
        FbankOptions(frame_opts=FrameOptions(dither=0.0), mel_opts=MelOptions(num_bins=40))
    )
    fbank = np.asarray(fb.extract(wav2[None, :]))[0]
    centers = {1: 7, 2: 17, 3: 24}
    ll = np.stack([fbank[:, c - 1 : c + 2].mean(1) for p, c in sorted(centers.items())], axis=1)
    ll = (ll - ll.mean(1, keepdims=True)) / 3.0

    dec = BatchViterbi(graph, DecodeParams(beam=1e9, max_active=32))
    fr = dec.init_frontier(1)
    fr, recs, best, bestf = dec.decode_chunk(fr, ll[None])
    cost, ols, pdfs = dec.traceback([recs], fr, 0)
    text = " ".join(words.name(o) for o in ols)
    print("TRANSCRIPT:", repr(text), "cost", round(cost, 2))
    assert text == "one two one", text

    # probes
    ex = FeatureExtractor(
        MfccOptions(
            frame_opts=FrameOptions(dither=0.0),
            mel_opts=MelOptions(num_bins=40, low_freq=20, high_freq=-400),
            num_ceps=40,
            use_energy=False,
        )
    )
    e = np.asarray(ex.extract(np.zeros((1, 10), np.float32)))
    assert e.shape == (1, 0, 40)

    ll0 = np.zeros((1, 20, 3), np.float32)
    fr2 = dec.init_frontier(1)
    fr2, recs2, _, _ = dec.decode_chunk(fr2, ll0)
    c2, o2, p2 = dec.traceback([recs2], fr2, 0)
    assert np.isfinite(c2) and len(p2) == 20

    rng = np.random.default_rng(1)
    noisy = (1000 * rng.standard_normal(777 * 8)).astype(np.float32)
    st = ex.init_stream_state(1, 777)
    outs = []
    for i in range(0, len(noisy), 777):
        st, fo, vo = ex.extract_chunk(st, noisy[None, i : i + 777])
        outs.append(np.asarray(fo)[:, : int(np.asarray(vo)[0].sum())])
    stream = np.concatenate(outs, 1)
    off = np.asarray(ex.extract(noisy[None, :]))
    assert stream.shape == off.shape
    assert np.allclose(stream, off, atol=1e-3)
    print("ALL OK")


if __name__ == "__main__":
    main()
