"""NGramFst ("ngram"-type Gr.fst) reader against a hand-assembled binary
fixture.

The fixture bytes are built bit-by-bit from the layout documented in
vosk_tpu/io/ngram_fst.py (NOT by any repo writer), encoding this bigram
acceptor over {1:one, 2:two}:

  trie: node0 = root, node1 = ctx(one), node2 = ctx(two)
  futures: root -> one(0.1), two(0.2); ctx(one) -> two(0.3)
  backoffs: node1 0.5, node2 0.7; finals: node1 0.9, node2 1.1

Expected arcs after expansion:
  state0: (1:1 w=0.1 -> 1), (2:2 w=0.2 -> 2)
  state1: (0:0 w=0.5 -> 0), (2:2 w=0.3 -> 2)   # target = longest ctx (two)
  state2: (0:0 w=0.7 -> 0)
"""
import struct

import numpy as np
import pytest

from vosk_tpu.io.kaldi_models import raw_fst_to_std, read_fst
from vosk_tpu.io.kaldiio import KaldiReadError


def _bits_to_words(bits):
    b = np.asarray(bits, np.uint8)
    pad = (-len(b)) % 64
    b = np.concatenate([b, np.zeros(pad, np.uint8)])
    return np.packbits(b, bitorder="little").view("<u8")


def _write_header(f, start, num_states):
    f.write(struct.pack("<i", 2125659606))  # OpenFST magic
    for s in ("ngram", "standard"):
        f.write(struct.pack("<i", len(s)) + s.encode())
    f.write(struct.pack("<i", 1))   # version
    f.write(struct.pack("<i", 0))   # flags
    f.write(struct.pack("<Q", 0))   # properties
    f.write(struct.pack("<q", start))
    f.write(struct.pack("<q", num_states))
    f.write(struct.pack("<q", 0))   # numarcs (unused)


def _fixture_bytes(path):
    num_states, num_futures, num_final = 3, 3, 2
    with open(path, "wb") as f:
        _write_header(f, 0, num_states)
        f.write(struct.pack("<QQQ", num_states, num_futures, num_final))
        # context LOUDS: "10" super-root + "110" root + "0" + "0"
        f.write(_bits_to_words([1, 0, 1, 1, 0, 0, 0]).tobytes())
        # future degrees: "0" prefix + "110" + "10" + "0"
        f.write(_bits_to_words([0, 1, 1, 0, 1, 0, 0]).tobytes())
        # finals: node1, node2 (num_states+1 bits)
        f.write(_bits_to_words([0, 1, 1, 0]).tobytes())
        f.write(np.asarray([0, 1, 2], "<i4").tobytes())  # context_words
        f.write(np.asarray([1, 2, 2], "<i4").tobytes())  # future_words
        # consumed so far: 24 + 3*8 + 6*4 = 72 -> already 8-aligned
        f.write(np.asarray([0.0, 0.5, 0.7], "<f4").tobytes())  # backoff
        f.write(np.asarray([0.9, 1.1], "<f4").tobytes())       # final_probs
        f.write(np.asarray([0.1, 0.2, 0.3], "<f4").tobytes())  # future_probs


def test_ngram_fixture_roundtrip(tmp_path):
    p = tmp_path / "Gr.fst"
    _fixture_bytes(p)
    fst = raw_fst_to_std(read_fst(p))
    assert fst.num_states == 3
    assert fst.start == 0
    assert fst.final[0] == float("inf")
    assert abs(fst.final[1] - 0.9) < 1e-6
    assert abs(fst.final[2] - 1.1) < 1e-6

    def arcset(s):
        return sorted((il, ol, round(w, 5), ns) for il, ol, w, ns in fst.arcs[s])

    assert arcset(0) == [(1, 1, 0.1, 1), (2, 2, 0.2, 2)]
    assert arcset(1) == [(0, 0, 0.5, 0), (2, 2, 0.3, 2)]
    assert arcset(2) == [(0, 0, 0.7, 0)]


def test_ngram_validation_rejects_corrupt(tmp_path):
    p = tmp_path / "bad.fst"
    _fixture_bytes(p)
    data = bytearray(p.read_bytes())
    # corrupt the context LOUDS word (header is 65 bytes, counts 24): the
    # ones count will mismatch num_states and validation must fire
    data[65 + 24] ^= 0xFF
    p.write_bytes(bytes(data))
    with pytest.raises(KaldiReadError):
        read_fst(p)
