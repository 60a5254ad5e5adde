"""Result serialization with reference JSON schema parity.

Schemas (reference src/recognizer.cc):
  MbrResult     -> {"result":[{word,start,end,conf}...], "text": "...", ["spk":[...], "spk_frames":N]}
  PartialResult -> {"partial": "..."} or {"partial_result":[...], "partial": "..."}
  NbestResult   -> {"alternatives":[{"result":[...], "text":..., "confidence":...}]}
  NlsmlResult   -> XML <result grammar="default">...
Empty result    -> {"text": ""} / {"partial": ""} (StoreEmptyReturn,
                   recognizer.cc:855-866)
"""
from __future__ import annotations

import json
from typing import List, Optional


class WordResult:
    __slots__ = ("word", "start", "end", "conf")

    def __init__(self, word: str, start: float, end: float, conf: float = 1.0):
        self.word = word
        self.start = start
        self.end = end
        self.conf = conf

    def to_dict(self, with_conf: bool = True) -> dict:
        d = {"conf": round(self.conf, 6), "end": round(self.end, 6),
             "start": round(self.start, 6), "word": self.word}
        if not with_conf:
            d.pop("conf")
        return d


def final_result(
    words: List[WordResult],
    show_words: bool,
    spk_vector: Optional[List[float]] = None,
    spk_frames: Optional[int] = None,
) -> str:
    obj: dict = {}
    if show_words and words:
        obj["result"] = [w.to_dict() for w in words]
    obj["text"] = " ".join(w.word for w in words)
    if spk_vector is not None:
        obj["spk"] = [round(float(x), 6) for x in spk_vector]
        obj["spk_frames"] = spk_frames
    return json.dumps(obj, ensure_ascii=False)


def partial_result(
    words: List[WordResult], show_words: bool
) -> str:
    obj: dict = {}
    text = " ".join(w.word for w in words)
    if show_words:
        if words:
            obj["partial_result"] = [w.to_dict() for w in words]
        obj["partial"] = text
    else:
        obj["partial"] = text
    return json.dumps(obj, ensure_ascii=False)


def nbest_result(
    alternatives: List[tuple],  # (words: List[WordResult], confidence: float)
    show_words: bool,
) -> str:
    alts = []
    for words, conf in alternatives:
        entry: dict = {}
        if show_words and words:
            entry["result"] = [w.to_dict(with_conf=False) for w in words]
        entry["text"] = " ".join(w.word for w in words)
        entry["confidence"] = round(float(conf), 6)
        alts.append(entry)
    return json.dumps({"alternatives": alts}, ensure_ascii=False)


def nlsml_result(alternatives: List[tuple]) -> str:
    """XML per reference NlsmlResult (recognizer.cc:609-667)."""
    out = ['<?xml version="1.0"?>', '<result grammar="default">']
    for words, conf in alternatives:
        text = " ".join(w.word for w in words)
        out.append(f'<interpretation grammar="default" confidence="{conf:g}">')
        out.append(f'<input mode="speech">{text}</input>')
        out.append(f"<instance>{text}</instance>")
        out.append("</interpretation>")
    out.append("</result>")
    return "\n".join(out) + "\n"


def empty_final() -> str:
    return json.dumps({"text": ""})


def empty_partial() -> str:
    return json.dumps({"partial": ""})
