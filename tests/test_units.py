"""Unit tests for small subsystems: config parsing, endpoint rules, wav IO,
symbol tables, metrics."""
import io

import numpy as np
import pytest

from vosk_tpu.graph.fst import SymbolTable
from vosk_tpu.io.native import EndpointRule, default_endpoint_rules
from vosk_tpu.io.wav import pcm16_bytes_to_float, read_wav, write_wav
from vosk_tpu.runtime import endpoint as ep
from vosk_tpu.utils.config import apply_options, parse_config_lines
from vosk_tpu.utils.metrics import StageTimers


def test_parse_config_lines():
    raw = parse_config_lines(
        """
        --beam=13.0
        --max-active=7000   # trailing comment
        # full comment
        --use-energy=false
        --print-args
        """
    )
    assert raw["beam"] == "13.0"
    assert raw["max-active"] == "7000"
    assert raw["use-energy"] == "false"
    assert raw["print-args"] == "true"


def test_apply_options_typing():
    import dataclasses

    @dataclasses.dataclass
    class Opts:
        beam: float = 10.0
        max_active: int = 100
        use_energy: bool = True

    o = Opts()
    apply_options(o, {"beam": "13.5", "max-active": "7000", "use-energy": "false"})
    assert o.beam == 13.5 and o.max_active == 7000 and o.use_energy is False


def test_endpoint_rules_reference_semantics():
    rules = default_endpoint_rules()
    fs = 0.03
    # rule 2: >=0.5 s trailing silence with final state close (rel cost <= 2)
    assert ep.endpoint_detected(rules, 100, 20, 1.0, fs, True)
    # not enough trailing silence
    assert not ep.endpoint_detected(rules, 100, 5, 1.0, fs, True)
    # no final state nearby (rel cost inf) but 2 s of silence -> rule 4
    assert ep.endpoint_detected(rules, 100, 70, float("inf"), fs, True)
    # rule 1: 5 s of silence without any speech
    assert ep.endpoint_detected(rules, 170, 170, float("inf"), fs, False)
    # 20 s utterance length -> rule 5
    assert ep.endpoint_detected(rules, 700, 0, float("inf"), fs, True)
    # zero frames decoded -> never
    assert not ep.endpoint_detected(rules, 0, 0, 0.0, fs, False)


def test_trailing_silence():
    n, speech = ep.trailing_silence([1, 1, 0, 0, 0], [0])
    assert n == 3 and speech
    n, speech = ep.trailing_silence([0, 0], [0])
    assert n == 2 and not speech


def test_wav_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    samples = (rng.standard_normal(1600) * 1000).astype(np.float32)
    p = tmp_path / "x.wav"
    write_wav(p, samples, 16000)
    back, rate = read_wav(p)
    assert rate == 16000
    np.testing.assert_allclose(back, np.round(samples).clip(-32768, 32767), atol=1.0)


def test_pcm16_bytes():
    arr = np.array([0, 1000, -1000, 32767], dtype="<i2")
    out = pcm16_bytes_to_float(arr.tobytes())
    np.testing.assert_array_equal(out, arr.astype(np.float32))
    # odd byte count: trailing byte ignored
    out2 = pcm16_bytes_to_float(arr.tobytes() + b"\x01")
    assert len(out2) == 4


def test_symbol_table_roundtrip(tmp_path):
    t = SymbolTable(["<eps>", "hello", "world"])
    assert t.find("hello") == 1
    assert t.find("nope") == -1
    assert t.name(2) == "world"
    p = tmp_path / "words.txt"
    t.write_text(p)
    t2 = SymbolTable.read_text(p)
    assert t2.find("world") == 2
    assert len(t2) == 3


def test_stage_timers():
    m = StageTimers()
    with m.timer("a"):
        pass
    with m.timer("a"):
        pass
    m.add_audio(2.0)
    r = m.report()
    assert r["stages"]["a"]["calls"] == 2
    assert r["audio_seconds"] == 2.0
    assert "xrt" in r
