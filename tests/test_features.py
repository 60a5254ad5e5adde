"""Feature kernel golden tests: matmul-DFT MFCC/fbank vs an independent numpy
reference (np.fft.rfft path), plus streaming==offline equivalence."""
import numpy as np
import pytest

from vosk_tpu.ops import features as F


def numpy_reference(wav, opts):
    """Independent reference using np.fft (not the matmul path)."""
    fo = opts.frame_opts
    ws, sh, nfft = fo.window_size, fo.window_shift, fo.padded_window_size
    n = 0 if len(wav) < ws else (len(wav) - ws) // sh + 1
    window = F.feature_window(fo).astype(np.float64)
    mel = F.mel_banks(opts.mel_opts, fo).astype(np.float64)
    is_mfcc = isinstance(opts, F.MfccOptions)
    if is_mfcc:
        dct = F.dct_matrix(opts.num_ceps, opts.mel_opts.num_bins).astype(np.float64)
        lift = (
            F.lifter_coeffs(opts.num_ceps, opts.cepstral_lifter).astype(np.float64)
            if opts.cepstral_lifter != 0
            else np.ones(opts.num_ceps)
        )
    out = []
    for t in range(n):
        x = wav[t * sh : t * sh + ws].astype(np.float64).copy()
        if fo.remove_dc_offset:
            x -= x.mean()
        raw_energy = np.sum(x * x)
        c = fo.preemphasis_coefficient
        if c != 0:
            x[1:] -= c * x[:-1]
            x[0] -= c * x[0]
        x *= window
        spec = np.fft.rfft(x, nfft)
        power = np.abs(spec) ** 2
        mel_e = power @ mel
        if is_mfcc:
            logmel = np.log(np.maximum(mel_e, 1.1754944e-38))
            ceps = (logmel @ dct) * lift
            if opts.use_energy:
                ceps[0] = np.log(max(raw_energy, 1.1754944e-38))
            out.append(ceps)
        else:
            e = mel_e if opts.use_power else np.sqrt(mel_e)
            out.append(np.log(np.maximum(e, 1.1754944e-38)) if opts.use_log_fbank else e)
    return np.array(out)


def make_wav(n=8000, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(n) / 16000.0
    wav = 3000 * np.sin(2 * np.pi * 440 * t) + 500 * rng.standard_normal(n)
    return wav.astype(np.float32)


@pytest.mark.parametrize("kind", ["mfcc", "fbank"])
def test_offline_matches_numpy(kind):
    fo = F.FrameOptions(dither=0.0)
    if kind == "mfcc":
        opts = F.MfccOptions(
            frame_opts=fo,
            mel_opts=F.MelOptions(num_bins=40, low_freq=20, high_freq=-400),
            num_ceps=40,
            use_energy=False,
        )
    else:
        opts = F.FbankOptions(frame_opts=fo, mel_opts=F.MelOptions(num_bins=40))
    ex = F.FeatureExtractor(opts)
    wav = make_wav()
    got = np.asarray(ex.extract(wav[None, :]))[0]
    want = numpy_reference(wav, opts)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)


def test_mfcc_with_energy_matches_numpy():
    opts = F.MfccOptions(
        frame_opts=F.FrameOptions(dither=0.0),
        mel_opts=F.MelOptions(num_bins=23),
        num_ceps=13,
        use_energy=True,
    )
    ex = F.FeatureExtractor(opts)
    wav = make_wav(6000, seed=3)
    got = np.asarray(ex.extract(wav[None, :]))[0]
    want = numpy_reference(wav, opts)
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)


def test_streaming_equals_offline():
    opts = F.MfccOptions(
        frame_opts=F.FrameOptions(dither=0.0),
        mel_opts=F.MelOptions(num_bins=40, low_freq=20, high_freq=-400),
        num_ceps=40,
        use_energy=False,
    )
    ex = F.FeatureExtractor(opts)
    B, S = 2, 3200  # 0.2 s chunks
    nchunks = 5
    rng = np.random.default_rng(7)
    wav = (1000 * rng.standard_normal((B, S * nchunks))).astype(np.float32)

    offline = np.asarray(ex.extract(wav))

    state = ex.init_stream_state(B, S)
    chunks_out = []
    for i in range(nchunks):
        state, feats, valid = ex.extract_chunk(state, wav[:, i * S : (i + 1) * S])
        v = np.asarray(valid)
        f = np.asarray(feats)
        assert (v[0] == v[1]).all()
        chunks_out.append(f[:, : v[0].sum()])
    streamed = np.concatenate(chunks_out, axis=1)
    assert streamed.shape == offline.shape
    np.testing.assert_allclose(streamed, offline, rtol=1e-4, atol=1e-3)


def test_streaming_odd_chunk_sizes():
    """Chunk size not a multiple of frame shift still yields identical frames."""
    opts = F.FbankOptions(frame_opts=F.FrameOptions(dither=0.0))
    ex = F.FeatureExtractor(opts)
    B, S = 1, 1000
    nchunks = 7
    rng = np.random.default_rng(11)
    wav = (1000 * rng.standard_normal((B, S * nchunks))).astype(np.float32)
    offline = np.asarray(ex.extract(wav))
    state = ex.init_stream_state(B, S)
    outs = []
    for i in range(nchunks):
        state, feats, valid = ex.extract_chunk(state, wav[:, i * S : (i + 1) * S])
        outs.append(np.asarray(feats)[:, : int(np.asarray(valid)[0].sum())])
    streamed = np.concatenate(outs, axis=1)
    np.testing.assert_allclose(streamed, offline, rtol=1e-4, atol=1e-3)


def test_sliding_window_cmn():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((50, 4)).astype(np.float32)
    out = np.asarray(F.sliding_window_cmn(x, window=10, center=True))
    # frame 25: window [20, 30)
    np.testing.assert_allclose(out[25], x[25] - x[20:30].mean(0), rtol=1e-5, atol=1e-5)
    # frame 2: window clipped to [0, 10)
    np.testing.assert_allclose(out[2], x[2] - x[0:10].mean(0), rtol=1e-5, atol=1e-5)
