"""Pitch features (ops/pitch.py): NCCF + Viterbi tracking + POV.

Reference enables Kaldi pitch when conf/pitch.conf exists
(model.cc:265-276); algorithm per Ghahremani et al. 2014."""
import numpy as np
import pytest

from vosk_tpu.ops.pitch import PitchOptions, compute_pitch_features


@pytest.mark.parametrize("f0", [60.0, 100.0, 220.0, 330.0])
def test_tracks_pure_tones(f0):
    rng = np.random.default_rng(0)
    sr = 16000
    t = np.arange(sr) / sr
    x = (np.sin(2 * np.pi * f0 * t) * 3000
         + rng.standard_normal(sr) * 30).astype(np.float32)
    feats, hz, pov = compute_pitch_features(x)
    mid = slice(10, len(hz) - 10)
    est = float(np.median(hz[mid]))
    assert abs(est - f0) / f0 < 0.03, est  # integer-lag grid: ~2% worst case
    assert float(np.median(pov[mid])) > 0.8  # clearly voiced
    assert feats.shape == (len(hz), 3)
    assert np.isfinite(feats).all()


def test_noise_is_unvoiced():
    rng = np.random.default_rng(1)
    x = (rng.standard_normal(16000) * 500).astype(np.float32)
    feats, hz, pov = compute_pitch_features(x)
    assert float(np.median(pov[10:-10])) < 0.5


def test_voicing_transition():
    """Voiced segment between noise: POV must rise inside the tone."""
    rng = np.random.default_rng(2)
    sr = 16000
    n = sr // 2
    t = np.arange(n) / sr
    tone = np.sin(2 * np.pi * 180.0 * t) * 3000
    noise = rng.standard_normal(n) * 120
    x = np.concatenate([noise, tone + rng.standard_normal(n) * 30, noise]).astype(
        np.float32
    )
    feats, hz, pov = compute_pitch_features(x)
    T = len(pov)
    third = T // 3
    assert np.median(pov[third + 3 : 2 * third - 3]) > np.median(pov[3:third - 3])
    # normalized log pitch is roughly zero-mean on steady voicing
    mid = feats[third + 5 : 2 * third - 5, 1]
    assert abs(float(np.mean(mid))) < 0.2


# ---------------------------------------------------------------- streaming


def test_streaming_pitch_chunk_invariant():
    """Streaming pitch (inside the feature pipeline) must be bit-identical
    across chunkings and equal to the offline extract()."""
    from vosk_tpu.ops.features import (
        FeatureExtractor, FrameOptions, MelOptions, MfccOptions)

    ex = FeatureExtractor(
        MfccOptions(frame_opts=FrameOptions(dither=0.0),
                    mel_opts=MelOptions(num_bins=23), num_ceps=13),
        pitch_opts={},
    )
    assert ex.dim == 16 and ex.flush_pad_samples > 0
    rng = np.random.default_rng(0)
    t = np.arange(12000) / 16000
    wav = (2500 * np.sin(2 * np.pi * 240 * t)
           + 60 * rng.standard_normal(len(t))).astype(np.float32)
    off = np.asarray(ex.extract(wav[None]))[0]

    for S in (800, 3200):
        st = ex.init_stream_state(1, S)
        wavp = np.concatenate(
            [wav, np.zeros(ex.flush_pad_samples, np.float32)])
        outs = []
        for pos in range(0, len(wavp), S):
            c = wavp[pos:pos + S]
            n = len(c)
            if n < S:
                c = np.concatenate([c, np.zeros(S - n, np.float32)])
            st, f, v = ex.extract_chunk(
                st, c[None], None, np.asarray([n], np.int32))
            outs.append(np.asarray(f)[0, : int(np.asarray(v)[0].sum())])
        stream = np.concatenate(outs)[: len(off)]
        np.testing.assert_array_equal(off[:, 13:], stream[:, 13:],
                                      err_msg=f"S={S} pitch dims")
        np.testing.assert_allclose(off[:, :13], stream[:, :13], atol=1e-3)


def test_streaming_pitch_tracks_f0_change():
    from vosk_tpu.ops.features import (
        FeatureExtractor, FrameOptions, MelOptions, MfccOptions)

    ex = FeatureExtractor(
        MfccOptions(frame_opts=FrameOptions(dither=0.0),
                    mel_opts=MelOptions(num_bins=23), num_ceps=13),
        pitch_opts={},
    )
    rng = np.random.default_rng(1)
    t = np.arange(8000) / 16000
    w1 = 3000 * np.sin(2 * np.pi * 220 * t)
    w2 = 3000 * np.sin(2 * np.pi * 330 * t)
    wav = (np.concatenate([w1, w2])
           + 30 * rng.standard_normal(16000)).astype(np.float32)
    f = np.asarray(ex.extract(wav[None]))[0]
    # normalized log pitch must rise by ~log(330/220)=0.405 after the switch
    after = f[55:70, 14]
    assert 0.25 < float(np.median(after)) < 0.55, after
    # POV feature strongly voiced throughout the tones
    assert float(np.median(f[5:90, 13])) < -0.8
