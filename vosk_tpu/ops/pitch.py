"""Pitch features (NCCF + Viterbi lag tracking + POV), Kaldi-style.

The reference enables Kaldi's online pitch when a model ships
conf/pitch.conf (/root/reference/src/model.cc:265-276); the algorithm is
Ghahremani et al. 2014 ("A pitch extraction algorithm tuned for ASR"),
implemented in Kaldi feat/pitch-functions.cc:

  1. resample the signal to 4 kHz (band-limited; ops/resample.py)
  2. per 10 ms frame, NCCF over candidate lags in [rate/max_f0,
     rate/min_f0], with a ballast term that de-emphasizes low-energy frames
  3. Viterbi smoothing over the lag grid with a log-lag transition penalty
  4. per-frame features: [POV feature, POV-weighted mean-subtracted log
     pitch, delta log pitch]

This module is the utterance-level (offline) extractor, written as jnp so
the NCCF (a batch of sliding dot products) and the Viterbi recursion
(lax.scan over frames) run on TPU; streaming integration into the feature
pipeline is tracked in COVERAGE.md.  Differences from Kaldi kept simple
deliberately: integer lag grid (Kaldi interpolates onto a log-spaced grid)
and a fixed POV mapping from the paper's NCCF statistic.
"""
from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class PitchOptions:
    sample_rate: float = 16000.0
    resample_rate: float = 4000.0
    frame_shift_ms: float = 10.0
    frame_length_ms: float = 25.0
    min_f0: float = 50.0
    max_f0: float = 400.0
    penalty_factor: float = 0.1
    nccf_ballast: float = 7000.0
    pov_scale: float = 2.0
    delta_window: int = 2
    mean_window: int = 151  # POV-weighted moving mean of log pitch


@partial(jax.jit, static_argnums=(1, 2, 3))
def _nccf(sig, window, shift, max_lag):
    """sig: [N] at the resampled rate. Returns [T, max_lag+1] NCCF (lag 0
    column unused) and frame energies [T]."""
    n = sig.shape[0]
    T = max(1 + (n - window - max_lag) // shift, 1)
    starts = jnp.arange(T) * shift
    idx = starts[:, None] + jnp.arange(window + max_lag)[None, :]
    frames = sig[jnp.clip(idx, 0, n - 1)]  # [T, window+max_lag]
    x0 = frames[:, :window]
    x0c = x0 - jnp.mean(x0, axis=1, keepdims=True)
    e0 = jnp.sum(x0c * x0c, axis=1)

    def one_lag(lag):
        xl = jax.lax.dynamic_slice_in_dim(frames, lag, window, axis=1)
        xlc = xl - jnp.mean(xl, axis=1, keepdims=True)
        el = jnp.sum(xlc * xlc, axis=1)
        num = jnp.sum(x0c * xlc, axis=1)
        return num, el

    lags = jnp.arange(max_lag + 1)
    nums, els = jax.vmap(one_lag)(lags)  # [L+1, T]
    mean_sq = jnp.mean(e0) / window + 1e-12
    ballast = 0.0  # applied by the caller (two NCCF flavors)
    den = jnp.sqrt((e0[None, :] + ballast) * els + 1e-10)
    return (nums / den).T, e0, mean_sq  # [T, L+1]


def compute_pitch_features(wave, opts: PitchOptions = PitchOptions()):
    """wave: [N] float at opts.sample_rate. Returns np.ndarray [T, 3] =
    (pov_feature, normalized_log_pitch, delta_log_pitch) plus the raw
    per-frame (pitch_hz, pov) for inspection: (feats, pitch_hz, pov)."""
    from .resample import resample_offline

    wave = np.asarray(wave, np.float32)
    rr = opts.resample_rate
    if abs(rr - opts.sample_rate) > 1e-6:
        sig = resample_offline(wave, opts.sample_rate, rr)
    else:
        sig = wave
    sig = jnp.asarray(sig / max(np.abs(sig).max(), 1e-6))

    shift = int(rr * opts.frame_shift_ms / 1000.0)
    window = int(rr * opts.frame_length_ms / 1000.0)
    min_lag = max(int(rr / opts.max_f0), 2)
    max_lag = int(rr / opts.min_f0)
    nccf, e0, mean_sq = _nccf(sig, window, shift, max_lag)
    nccf = np.asarray(nccf)[:, min_lag:]  # [T, L]
    T, L = nccf.shape
    lags_s = (np.arange(min_lag, max_lag + 1)) / rr  # lag in seconds

    # ballast flavor for pitch tracking (de-emphasizes silence); the raw
    # nccf above (no ballast) is the POV statistic
    ballast = opts.nccf_ballast * float(mean_sq)
    e0n = np.asarray(e0)
    scale = np.sqrt(e0n / (e0n + ballast * window))[:, None]
    nccf_pitch = nccf * scale
    # short-lag preference against subharmonic (octave-down) picks: a pure
    # tone correlates equally at lag and 2*lag; bias the tracker toward the
    # true (shorter) period like Kaldi's local-cost shaping
    lag_bias = 1.0 - 0.02 * (np.log(lags_s) - np.log(lags_s[0]))
    nccf_pitch = nccf_pitch * lag_bias[None, :]

    # Viterbi over lags: local cost = -nccf_pitch, transition cost =
    # penalty * (log lag ratio)^2 (pitch-functions.cc ComputeLocalCost)
    loglags = np.log(lags_s)
    trans = opts.penalty_factor * (loglags[:, None] - loglags[None, :]) ** 2

    @jax.jit
    def viterbi(obs):
        def step(car, ob):
            best = jnp.min(car[:, None] + jnp.asarray(trans), axis=0)
            bp = jnp.argmin(car[:, None] + jnp.asarray(trans), axis=0)
            nxt = best - ob
            return nxt, (nxt, bp)

        init = -obs[0]
        _, (costs, bps) = jax.lax.scan(step, init, obs[1:])
        return costs, bps

    if T > 1:
        costs, bps = viterbi(jnp.asarray(nccf_pitch))
        costs, bps = np.asarray(costs), np.asarray(bps)
        path = np.zeros(T, np.int64)
        path[-1] = int(np.argmin(costs[-1]))
        for t in range(T - 2, -1, -1):
            path[t] = bps[t][path[t + 1]]
    else:
        path = np.array([int(np.argmax(nccf_pitch[0]))])

    pitch_hz = 1.0 / lags_s[path]
    nccf_at = nccf[np.arange(T), path]

    # POV feature: the paper's monotone transform of the (ballast-free)
    # NCCF at the chosen lag
    c = np.clip(nccf_at, -1.0, 1.0)
    pov_raw = np.abs(c)
    pov_feature = opts.pov_scale * (np.power(1.0001 - c, 0.15) - 1.0)
    pov = np.clip(pov_raw, 0.0, 1.0)

    # POV-weighted moving-mean subtraction of log pitch
    logp = np.log(pitch_hz)
    half = opts.mean_window // 2
    norm_logp = np.empty(T, np.float32)
    for t in range(T):
        lo, hi = max(0, t - half), min(T, t + half + 1)
        w = pov[lo:hi] + 1e-4
        norm_logp[t] = logp[t] - float(np.sum(w * logp[lo:hi]) / np.sum(w))

    # delta of log pitch (standard 2-sided delta window)
    dw = opts.delta_window
    k = np.arange(-dw, dw + 1, dtype=np.float32)
    denom = float(np.sum(k * k))
    pad = np.pad(logp, (dw, dw), mode="edge")
    delta = np.convolve(pad, -k / denom, mode="valid").astype(np.float32)

    feats = np.stack([pov_feature, norm_logp, delta], axis=1).astype(np.float32)
    return feats, pitch_hz.astype(np.float32), pov.astype(np.float32)
