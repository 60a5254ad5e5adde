"""Kaldi format I/O: binary primitive round-trips, TransitionModel,
nnet3 read + evaluation vs direct computation, OpenFST binary reading.

(No Kaldi binaries exist in this environment; byte-level compatibility with
upstream files is asserted structurally via our writers.)
"""
import io

import numpy as np
import pytest

from vosk_tpu.io import kaldiio
from vosk_tpu.io.kaldi_models import (
    HmmState,
    HmmTopology,
    TransitionModel,
)
from vosk_tpu.io import nnet3 as n3


def roundtrip(write_fn, read_fn):
    buf = io.BytesIO()
    w = kaldiio.BinaryWriter(buf)
    write_fn(w)
    buf.seek(0)
    r = kaldiio.BinaryReader(io.BufferedReader(io.BytesIO(buf.getvalue())))
    return read_fn(r)


def test_primitives_roundtrip():
    rng = np.random.default_rng(0)
    v = rng.standard_normal(17).astype(np.float32)
    m = rng.standard_normal((5, 7)).astype(np.float32)
    got_v = roundtrip(lambda w: w.write_vector(v), lambda r: r.read_vector())
    np.testing.assert_array_equal(got_v, v)
    got_m = roundtrip(lambda w: w.write_matrix(m), lambda r: r.read_matrix())
    np.testing.assert_array_equal(got_m, m)
    got_i = roundtrip(lambda w: w.write_int_vector([3, 1, 4, 1, 5]), lambda r: r.read_int_vector())
    assert list(got_i) == [3, 1, 4, 1, 5]
    assert roundtrip(lambda w: w.write_basic_int(-42), lambda r: r.read_basic_int()) == -42
    assert roundtrip(lambda w: w.write_basic_float(2.5), lambda r: r.read_basic_float()) == 2.5
    assert roundtrip(lambda w: w.write_bool(True), lambda r: r.read_bool()) is True


def make_topology():
    t = HmmTopology()
    t.phones = [1, 2, 3]
    t.phone2idx = [-1, 0, 0, 1]  # phones 1,2 share entry 0; phone 3 entry 1
    # 1-state chain-style topology with self-loop
    t.entries = [
        [HmmState(0, 0, [(0, 0.5), (1, 0.5)]), ],
        [HmmState(0, 1, [(0, 0.7), (1, 0.3)]), ],
    ]
    return t


def test_transition_model_roundtrip_and_mapping():
    tm = TransitionModel()
    tm.topo = make_topology()
    tm.tuples = [(1, 0, 0, 0), (2, 0, 1, 1), (3, 0, 2, 3)]
    tm.log_probs = np.log(np.full(7, 0.5, np.float32))
    tm._build_derived()

    got = roundtrip(tm.write, TransitionModel.read)
    assert got.tuples == tm.tuples
    assert got.num_transition_ids == tm.num_transition_ids
    id2pdf = got.id2pdf()
    # phone 1: transitions (self-loop idx0, forward idx1) -> pdfs (0, 0)
    assert id2pdf[1] == 0 and id2pdf[2] == 0
    # phone 2 -> pdf 1; phone 3 -> self-loop pdf 3, forward pdf 2
    assert id2pdf[3] == 1 and id2pdf[4] == 1
    assert id2pdf[5] == 3 and id2pdf[6] == 2
    assert got.id2phone()[5] == 3


def make_tdnn_net(rng):
    """A miniature TDNN-F-style nnet3 net via our builder API."""
    net = n3.Nnet3()
    D, H, P = 8, 12, 5
    net._parse_config_line("input-node name=input dim=8")
    net._parse_config_line(
        "component-node name=tdnn1 component=tdnn1 "
        "input=Append(Offset(input, -1), input, Offset(input, 1))"
    )
    net._parse_config_line("component-node name=relu1 component=relu1 input=tdnn1")
    net._parse_config_line("component-node name=bn1 component=bn1 input=relu1")
    net._parse_config_line("component-node name=tdnnf component=tdnnf input=bn1")
    net._parse_config_line(
        "component-node name=out_aff component=out_aff "
        "input=Sum(Scale(0.66, bn1), tdnnf)"
    )
    net._parse_config_line("output-node name=output input=out_aff objective=linear")
    net.components = {
        "tdnn1": n3.AffineComponent(
            rng.standard_normal((H, 3 * D)).astype(np.float32),
            rng.standard_normal(H).astype(np.float32),
        ),
        "relu1": n3.NonlinComponent(H, "RectifiedLinearComponent"),
        "bn1": n3.BatchNormComponent(
            H, 1e-3, 1.0,
            rng.standard_normal(H).astype(np.float32),
            rng.uniform(0.5, 2.0, H).astype(np.float32),
        ),
        "tdnnf": n3.TdnnComponent(
            [-3, 0],
            rng.standard_normal((H, 2 * H)).astype(np.float32),
            rng.standard_normal(H).astype(np.float32),
        ),
        "out_aff": n3.AffineComponent(
            rng.standard_normal((P, H)).astype(np.float32),
            rng.standard_normal(P).astype(np.float32),
        ),
    }
    net.component_order = list(net.components)
    return net, D, P


def test_nnet3_roundtrip_and_eval():
    rng = np.random.default_rng(1)
    net, D, P = make_tdnn_net(rng)

    got = roundtrip(net.write, n3.Nnet3.read)
    assert got.component_order == net.component_order
    assert [got.nodes[n].kind for n in got.node_order] == [
        net.nodes[n].kind for n in net.node_order
    ]

    T = 20
    x = rng.standard_normal((T, D)).astype(np.float32)
    y1 = np.asarray(net.evaluate({"input": x}))
    y2 = np.asarray(got.evaluate({"input": x}))
    assert y1.shape == (T, P)
    np.testing.assert_allclose(y1, y2, rtol=1e-5, atol=1e-5)

    # manual check of the first layer path at an interior frame
    t = 10
    comp = net.components["tdnn1"]
    spliced = np.concatenate([x[t - 1], x[t], x[t + 1]])
    want = spliced @ comp.linear.T + comp.bias
    bn = net.components["bn1"]
    relu = np.maximum(want, 0)
    scale = bn.target_rms / np.sqrt(bn.stats_var + bn.epsilon)
    bn_out = relu * scale - bn.stats_mean * scale
    got_bn = np.asarray(net.evaluate({"input": x}, output="bn1"))[t]
    np.testing.assert_allclose(got_bn, bn_out, rtol=1e-4, atol=1e-4)


def test_statistics_pooling_eval():
    rng = np.random.default_rng(2)
    net = n3.Nnet3()
    D = 6
    net._parse_config_line("input-node name=input dim=6")
    net._parse_config_line("component-node name=stats_ex component=stats_ex input=input")
    net._parse_config_line("component-node name=stats_pool component=stats_pool input=stats_ex")
    net._parse_config_line("output-node name=output input=stats_pool objective=linear")
    net.components = {
        "stats_ex": n3.StatisticsExtractionComponent(D, 1, 1, True),
        "stats_pool": n3.StatisticsPoolingComponent(1 + 2 * D, 1, -1000, 1000, 0, True),
    }
    net.component_order = list(net.components)
    x = rng.standard_normal((30, D)).astype(np.float32)
    y = np.asarray(net.evaluate({"input": x}))
    np.testing.assert_allclose(y[0, :D], x.mean(0), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(y[0, D:], x.std(0), rtol=1e-3, atol=1e-3)

    got = roundtrip(net.write, n3.Nnet3.read)
    y2 = np.asarray(got.evaluate({"input": x}))
    np.testing.assert_allclose(y2, y, rtol=1e-5, atol=1e-5)


def test_fst_binary_roundtrip(tmp_path):
    """Write an OpenFST-format VectorFst by hand; read it back."""
    import struct

    path = tmp_path / "g.fst"
    arcs = {0: [(1, 7, 0.5, 1)], 1: [(2, 0, 0.25, 0)]}
    finals = {1: 0.125}
    with open(path, "wb") as f:
        f.write(struct.pack("<i", 2125659606))
        for s in ("vector", "standard"):
            f.write(struct.pack("<i", len(s)))
            f.write(s.encode())
        f.write(struct.pack("<i", 2))  # version
        f.write(struct.pack("<i", 0))  # flags
        f.write(struct.pack("<Q", 0))  # properties
        f.write(struct.pack("<q", 0))  # start
        f.write(struct.pack("<q", 2))  # states
        f.write(struct.pack("<q", 2))  # arcs
        for s in range(2):
            f.write(struct.pack("<f", finals.get(s, float("inf"))))
            a = arcs.get(s, [])
            f.write(struct.pack("<q", len(a)))
            for il, ol, w, ns in a:
                f.write(struct.pack("<iifi", il, ol, w, ns))
    from vosk_tpu.io.kaldi_models import raw_fst_to_std, read_fst

    raw = read_fst(path)
    fst = raw_fst_to_std(raw)
    assert fst.start == 0
    assert fst.arcs[0] == [(1, 7, 0.5, 1)]
    assert fst.arcs[1] == [(2, 0, 0.25, 0)]
    assert fst.final[1] == 0.125


def test_compressed_matrix_golden_bytes():
    """Hand-assembled CompressedMatrix bytes (Kaldi matrix/compressed-matrix.cc
    layout, consumed by the reference via CMVN stats at model.cc:265-276),
    decompressed against the documented formula field by field."""
    import struct

    # format 1 ("CM"): global header (min, range, rows, cols) + per-column
    # uint16 percentile headers + uint8 data stored COLUMN-major.
    minv, rng_ = -2.0, 10.0
    rows, cols = 3, 2
    buf = io.BytesIO()
    buf.write(b"CM ")
    buf.write(struct.pack("<ffii", minv, rng_, rows, cols))
    # col 0: p0=0, p25=16384, p75=49152, p100=65535
    # col 1: p0=1000, p25=2000, p75=3000, p100=4000
    buf.write(struct.pack("<4H", 0, 16384, 49152, 65535))
    buf.write(struct.pack("<4H", 1000, 2000, 3000, 4000))
    # col-major data: col0 rows = [0, 64, 200]; col1 rows = [64, 192, 255]
    buf.write(bytes([0, 64, 200, 64, 192, 255]))
    buf.seek(0)
    r = kaldiio.BinaryReader(io.BufferedReader(io.BytesIO(buf.getvalue())))
    got = r.read_matrix()
    assert got.shape == (rows, cols)

    def u2f(u):
        return minv + u * (rng_ / 65535.0)

    # CharToFloat: v<=64 -> p0+(p25-p0)*v/64; 64<v<=192 -> p25+(p75-p25)*
    # (v-64)/128; v>192 -> p75+(p100-p75)*(v-192)/63
    p = [u2f(np.float64(x)) for x in (0, 16384, 49152, 65535)]
    exp00 = p[0]
    exp10 = p[1]  # v=64 is the p25 knee
    exp20 = p[2] + (p[3] - p[2]) * (200 - 192) / 63.0
    q = [u2f(np.float64(x)) for x in (1000, 2000, 3000, 4000)]
    exp01 = q[1]
    exp11 = q[1] + (q[2] - q[1]) * (192 - 64) / 128.0  # v=192 -> p75
    exp21 = q[2] + (q[3] - q[2]) * (255 - 192) / 63.0  # v=255 -> p100
    np.testing.assert_allclose(
        got, np.array([[exp00, exp01], [exp10, exp11], [exp20, exp21]],
                      np.float32), rtol=0, atol=1e-6)

    # format 2 ("CM2"): uint16 row-major, v = min + u*(range/65535)
    buf = io.BytesIO()
    buf.write(b"CM2 ")
    buf.write(struct.pack("<ffii", 1.0, 2.0, 2, 2))
    buf.write(struct.pack("<4H", 0, 32768, 65535, 16384))
    buf.seek(0)
    r = kaldiio.BinaryReader(io.BufferedReader(io.BytesIO(buf.getvalue())))
    got2 = r.read_matrix()
    np.testing.assert_allclose(
        got2,
        1.0 + np.array([[0, 32768], [65535, 16384]]) * (2.0 / 65535.0),
        rtol=0, atol=1e-6)

    # format 3 ("CM3"): uint8 row-major, v = min + u*(range/255)
    buf = io.BytesIO()
    buf.write(b"CM3 ")
    buf.write(struct.pack("<ffii", -1.0, 4.0, 2, 2))
    buf.write(bytes([0, 128, 255, 64]))
    buf.seek(0)
    r = kaldiio.BinaryReader(io.BufferedReader(io.BytesIO(buf.getvalue())))
    got3 = r.read_matrix()
    np.testing.assert_allclose(
        got3, -1.0 + np.array([[0, 128], [255, 64]]) * (4.0 / 255.0),
        rtol=0, atol=1e-6)


def test_compressed_matrix_roundtrip_precision():
    """write_compressed_matrix -> read_matrix round-trip at Kaldi's own
    quantization error bounds for each format."""
    rng = np.random.default_rng(7)
    m = (rng.standard_normal((20, 6)) * 3.0).astype(np.float32)
    span = float(m.max() - m.min())
    for fmt, tol in ((1, None), (2, span / 65535.0 * 1.01), (3, span / 255.0 * 1.01)):
        got = roundtrip(
            lambda w, fmt=fmt: w.write_compressed_matrix(m, fmt=fmt),
            lambda r: r.read_matrix(),
        )
        assert got.shape == m.shape
        if fmt == 1:
            # per-column percentile coding: inner quartiles are fine-coded;
            # bound by the worst per-column segment width / 63
            for j in range(m.shape[1]):
                c = np.sort(m[:, j])
                qn = len(c) // 4
                seg = max(c[qn] - c[0], c[3 * qn] - c[qn], c[-1] - c[3 * qn])
                err = np.abs(got[:, j] - m[:, j]).max()
                assert err <= seg / 63.0 + span / 65535.0 * 2 + 1e-5
        else:
            np.testing.assert_allclose(got, m, rtol=0, atol=tol)

    # automatic mode: >8 rows -> format 1 token "CM"
    buf = io.BytesIO()
    kaldiio.BinaryWriter(buf).write_compressed_matrix(m)
    assert buf.getvalue().startswith(b"CM ")
    small = m[:4]
    buf = io.BytesIO()
    kaldiio.BinaryWriter(buf).write_compressed_matrix(small)
    assert buf.getvalue().startswith(b"CM2 ")

    # constant matrix: range guard, no NaNs
    const = np.full((10, 3), 2.5, np.float32)
    got = roundtrip(lambda w: w.write_compressed_matrix(const),
                    lambda r: r.read_matrix())
    np.testing.assert_allclose(got, const, rtol=0, atol=1e-4)


def test_compressed_matrix_via_file(tmp_path):
    """CM matrices read through the standard file entry point (the path
    CMVN stats take: read_kaldi_matrix on global_cmvn.stats)."""
    m = (np.arange(30, dtype=np.float32).reshape(10, 3) * 0.37) - 4.0
    p = tmp_path / "cmvn.stats"
    kaldiio.write_kaldi_object(
        p, lambda w: w.write_compressed_matrix(m, fmt=1))
    got = kaldiio.read_kaldi_matrix(p)
    assert np.abs(got - m).max() < 0.2


def test_nnet3_component_with_compressed_matrix():
    """A real Kaldi final.mdl can ship component weight matrices
    compressed (CM); the nnet3 reader must consume them through the
    generic matrix dispatch.  Write a LinearComponent-style blob whose
    matrix is CM-coded and evaluate against the uncompressed original."""
    rng = np.random.default_rng(11)
    m = (rng.standard_normal((6, 10)) * 2.0).astype(np.float32)

    # read through the same BinaryReader path nnet3 uses (read_matrix)
    buf = io.BytesIO()
    w = kaldiio.BinaryWriter(buf)
    w.write_compressed_matrix(m, fmt=1)
    buf.seek(0)
    r = kaldiio.BinaryReader(io.BufferedReader(io.BytesIO(buf.getvalue())))
    got = r.read_matrix()
    assert got.shape == m.shape
    # format-1 per-column coding: fine everywhere except coarse tails
    assert np.abs(got - m).max() < 0.35

    # and a forward evaluation with the decompressed weights stays close
    x = rng.standard_normal((4, 10)).astype(np.float32)
    y_ref = x @ m.T
    y_cm = x @ got.T
    assert np.abs(y_cm - y_ref).max() < 1.0


def test_global_cmvn_stats_compressed(tmp_path):
    """model.cc:265-276 reads global CMVN stats; Kaldi often writes them
    compressed.  The V2-layout loader path (read_kaldi_matrix) must accept
    a CM-coded global_cmvn.stats."""
    # Kaldi CMVN stats: [2, dim+1] (sums / sumsq with counts)
    dim = 13
    n = 1000.0
    sums = np.linspace(-5, 5, dim) * n
    sumsq = (np.linspace(1, 3, dim) ** 2) * n
    stats = np.zeros((2, dim + 1), np.float32)
    stats[0, :dim] = sums
    stats[0, dim] = n
    stats[1, :dim] = sumsq
    p = tmp_path / "global_cmvn.stats"
    kaldiio.write_kaldi_object(
        p, lambda w: w.write_compressed_matrix(stats, fmt=1))
    got = kaldiio.read_kaldi_matrix(p)
    assert got.shape == stats.shape
    # counts and means must survive the quantization usefully
    assert abs(got[0, dim] - n) / n < 0.02
    mean_ref = sums / n
    mean_got = got[0, :dim] / got[0, dim]
    assert np.abs(mean_got - mean_ref).max() < 0.2
