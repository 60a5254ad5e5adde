"""Band-limited streaming resampler (vosk_tpu/ops/resample.py).

The reference resamples every non-model-rate stream through Kaldi's
LinearResample (batch_recognizer.cc:27-29,157-158): windowed-sinc low-pass,
stateful across buffers.  These tests pin (1) reconstruction quality far
above linear interpolation on both up- and down-sampling, (2) bit-exact
chunk-size invariance (the stateful property the per-buffer np.interp
lacked), (3) the recognizer path accepting non-model-rate audio.
"""
import numpy as np
import pytest

from vosk_tpu.ops.resample import StreamingResampler, resample_offline


def _snr(ref, x):
    n = min(len(ref), len(x))
    m = slice(200, n - 200)
    e = ref[:n][m] - x[:n][m]
    return 10 * np.log10((ref[:n][m] ** 2).mean() / max((e ** 2).mean(), 1e-20))


@pytest.mark.parametrize("in_r,out_r", [(8000, 16000), (44100, 16000), (16000, 8000)])
def test_sinc_quality(in_r, out_r):
    t_in = np.arange(int(in_r * 0.5)) / in_r
    x = np.sin(2 * np.pi * 1000.0 * t_in).astype(np.float32)
    y = resample_offline(x, in_r, out_r)
    assert len(y) == int(round(len(x) * out_r / in_r))
    t_out = np.arange(len(y)) / out_r
    ref = np.sin(2 * np.pi * 1000.0 * t_out).astype(np.float32)
    assert _snr(ref, y) > 60.0  # linear interp gives ~25 dB at 8k->16k


@pytest.mark.parametrize("chunk", [160, 441, 1333])
def test_chunk_invariance(chunk):
    rng = np.random.default_rng(0)
    x = rng.standard_normal(44100).astype(np.float32)
    whole = resample_offline(x, 44100, 16000)
    r = StreamingResampler(44100, 16000)
    outs = [r.process(x[i : i + chunk]) for i in range(0, len(x), chunk)]
    outs.append(r.flush())
    ys = np.concatenate(outs)
    assert len(ys) == len(whole)
    assert np.array_equal(ys, whole)


def test_identity_passthrough():
    r = StreamingResampler(16000, 16000)
    x = np.arange(100, dtype=np.float32)
    assert np.array_equal(r.process(x), x)


def test_recognizer_8k_input():
    """8 kHz input decodes the same words as 16 kHz on the toy model
    (reference: any-rate streams resample to the model rate)."""
    import json
    import os

    import vosk_tpu
    from vosk_tpu.utils import toydata

    toy_dir = "/tmp/vosk_tpu_toy_model_v1"
    if not os.path.exists(os.path.join(toy_dir, "vosk_tpu_model.json")):
        toydata.build_toy_model(toy_dir, train_steps=400)
    model = vosk_tpu.Model(toy_dir)

    def stream(rec, data, step):
        texts = []
        for i in range(0, len(data), step):
            if rec.AcceptWaveform(data[i : i + step]):
                texts.append(json.loads(rec.Result())["text"])
        texts.append(json.loads(rec.FinalResult())["text"])
        return " ".join(t for t in texts if t)

    want = ["one", "five", "zero"]
    audio16 = toydata.make_test_wav(want, seed=7).astype(np.float32)
    audio8 = resample_offline(audio16, 16000, 8000)
    # the exact float stream the 8 kHz recognizer's internal resampler will
    # produce (including its end-of-stream flush tail)
    back16 = resample_offline(audio8, 8000, 16000)

    rec16 = vosk_tpu.KaldiRecognizer(model, 16000)
    ref = stream(rec16, back16, 1600)
    assert ref  # the band-limited 16 kHz baseline must decode something

    rec8 = vosk_tpu.KaldiRecognizer(model, 8000)
    got = stream(rec8, audio8, 800)
    assert got == ref
