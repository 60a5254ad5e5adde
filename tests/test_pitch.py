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
