"""vosk_tpu — TPU-native speech recognition with the vosk-api surface.

Drop-in parity with the reference Python binding (python/vosk/__init__.py):
`Model`, `SpkModel`, `KaldiRecognizer`, `BatchModel`, `BatchRecognizer`,
`SetLogLevel`, `GpuInit` — same method names and JSON result formats, backed
by jax/XLA on TPU instead of a Kaldi C library.
"""
from __future__ import annotations

import os
from pathlib import Path

from .utils.logging import set_log_level as _set_log_level

# model search path parity (reference python/vosk/__init__.py:13-15)
MODEL_DIRS = [
    os.getenv("VOSK_MODEL_PATH"),
    Path("/usr/share/vosk"),
    Path.home() / "AppData/Local/vosk",
    Path.home() / ".cache/vosk",
]


def _resolve_model_path(model_path=None, model_name=None, lang=None):
    from re import match

    if model_path is not None:
        return model_path
    for directory in MODEL_DIRS:
        if directory is None or not Path(directory).exists():
            continue
        for entry in sorted(os.listdir(directory)):
            if model_name is not None and entry == model_name:
                return Path(directory, entry)
            if lang is not None and match(rf"vosk-model(-small)?-{lang}", entry):
                return Path(directory, entry)
    what = model_name if model_name is not None else lang
    raise Exception(
        f"model {what} does not exist (downloads are not available; set "
        "VOSK_MODEL_PATH or pass model_path)"
    )


class Model:
    """Static recognition model, shareable across recognizers
    (vosk_api.h:24-27)."""

    def __init__(self, model_path=None, model_name=None, lang=None):
        from pathlib import Path as _P

        from .io import native

        path = _resolve_model_path(model_path, model_name, lang)
        self._model = native.load_any(path)
        self._decoder_cache: dict = {}

    def vosk_model_find_word(self, word: str) -> int:
        return self._model.find_word(word)

    def FindWord(self, word: str) -> int:
        return self._model.find_word(word)


class SpkModel:
    """Speaker identification model (vosk_api.h:30-32)."""

    def __init__(self, model_path):
        from .models.xvector import SpkModel as _SpkModel

        self._model = _SpkModel.load(model_path)


class KaldiRecognizer:
    """Streaming recognizer with the reference binding's API
    (python/vosk/__init__.py:134-183): constructors (model, rate),
    (model, rate, spk_model), (model, rate, grammar_json)."""

    def __init__(self, *args):
        from .runtime.recognizer import Recognizer

        if len(args) == 2:
            model, rate = args
            self._rec = Recognizer(model._model, float(rate))
        elif len(args) == 3 and isinstance(args[2], SpkModel):
            model, rate, spk = args
            self._rec = Recognizer(model._model, float(rate), spk_model=spk._model)
        elif len(args) == 3 and isinstance(args[2], str):
            model, rate, grammar = args
            self._rec = Recognizer(model._model, float(rate), grammar=grammar)
        else:
            raise TypeError("Unknown arguments")

    def SetMaxAlternatives(self, max_alternatives: int) -> None:
        self._rec.set_max_alternatives(max_alternatives)

    def SetWords(self, enable_words: bool) -> None:
        self._rec.set_words(enable_words)

    def SetPartialWords(self, enable_partial_words: bool) -> None:
        self._rec.set_partial_words(enable_partial_words)

    def SetNLSML(self, enable_nlsml: bool) -> None:
        self._rec.set_nlsml(enable_nlsml)

    def SetSpkModel(self, spk_model: SpkModel) -> None:
        self._rec.set_spk_model(spk_model._model)

    def AcceptWaveform(self, data) -> int:
        try:
            return 1 if self._rec.accept_waveform(data) else 0
        except Exception:
            raise Exception("Failed to process waveform")

    def Result(self) -> str:
        return self._rec.result()

    def PartialResult(self) -> str:
        return self._rec.partial_result()

    def FinalResult(self) -> str:
        return self._rec.final_result()

    def Reset(self) -> None:
        self._rec.reset()

    def GetMetrics(self) -> dict:
        """vosk_tpu extension: per-stage timing report (features /
        acoustic_model / decoder / finishing seconds, xRT)."""
        return self._rec.get_metrics()


def SetLogLevel(level: int) -> None:
    """vosk_set_log_level parity (vosk_api.h:287-294)."""
    _set_log_level(level)


def GpuInit() -> None:
    """Device init parity (vosk_api.h:296-301): jax initializes devices
    lazily; this just forces backend initialization."""
    import jax

    jax.devices()


def GpuThreadInit() -> None:
    """No-op: jax manages per-thread device state (vosk_api.h:303-308)."""


def list_models():
    """List locally available models (no network in this build)."""
    for directory in MODEL_DIRS:
        if directory is None or not Path(directory).exists():
            continue
        for entry in sorted(os.listdir(directory)):
            print(entry)


def list_languages():
    print("(model downloads unavailable; list local models with list_models())")


from .runtime.batch import BatchModel, BatchRecognizer  # noqa: E402,F401
