"""Endpoint detection, mirroring Kaldi OnlineEndpointConfig semantics as the
reference configures them (src/model.cc:142-145; decision at
src/recognizer.cc:318 via decoder traceback).

A rule fires when:
  - (must_contain_nonsilence implies the utterance has non-silence frames)
  - trailing_silence >= min_trailing_silence
  - relative_cost <= max_relative_cost  (best-final vs best cost)
  - utterance_length >= min_utterance_length
Endpoint detected if any rule fires.
"""
from __future__ import annotations

import math
from typing import List, Sequence


def endpoint_detected(
    rules,
    num_frames_decoded: int,
    trailing_silence_frames: int,
    relative_cost: float,
    frame_shift_seconds: float,
    contains_nonsilence: bool,
) -> bool:
    if num_frames_decoded == 0:
        return False
    utterance_length = num_frames_decoded * frame_shift_seconds
    trailing_silence = trailing_silence_frames * frame_shift_seconds
    for r in rules:
        if r.must_contain_nonsilence and not contains_nonsilence:
            continue
        if trailing_silence < r.min_trailing_silence:
            continue
        if not (relative_cost <= r.max_relative_cost):
            continue
        if utterance_length < r.min_utterance_length:
            continue
        return True
    return False


def trailing_silence(pdf_alignment: Sequence[int], silence_pdfs) -> tuple[int, bool]:
    """(trailing silence frame count, contains_nonsilence) from a best-path
    pdf alignment."""
    sil = set(int(x) for x in silence_pdfs)
    n = 0
    for p in reversed(pdf_alignment):
        if p in sil:
            n += 1
        else:
            break
    contains_nonsilence = any(p not in sil for p in pdf_alignment)
    return n, contains_nonsilence
