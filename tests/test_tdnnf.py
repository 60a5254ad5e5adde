"""TDNN-F acoustic model: numpy reference forward + streaming==offline."""
import numpy as np
import pytest

from vosk_tpu.models.tdnnf import TdnnfConfig, TdnnfModel, init_params


def numpy_forward(cfg, p, feats):
    """Independent numpy reference of the padded-window forward (single batch).

    feats: [T, D] already includes any padding the caller wants.
    """
    def splice(x, offsets):
        T = x.shape[0]
        return np.concatenate(
            [x[np.clip(np.arange(T) + o, 0, T - 1)] for o in offsets], axis=-1
        )

    x = splice(feats, (-1, 0, 1)) @ p["tdnn1_w"] + p["tdnn1_b"]
    x = np.maximum(x, 0) * p["tdnn1_scale"] + p["tdnn1_offset"]
    for i, s in enumerate(cfg.time_strides):
        y = x if s == 0 else splice(x, (-s, 0))
        b = y @ p[f"tdnnf{i}_lin"]
        y2 = b if s == 0 else splice(b, (0, s))
        y2 = y2 @ p[f"tdnnf{i}_aff_w"] + p[f"tdnnf{i}_aff_b"]
        y2 = np.maximum(y2, 0) * p[f"tdnnf{i}_scale"] + p[f"tdnnf{i}_offset"]
        x = cfg.bypass_scale * x + y2
    x = x @ p["prefinal_l"]
    x = x @ p["prefinal_w"] + p["prefinal_b"]
    x = np.maximum(x, 0) * p["prefinal_scale"] + p["prefinal_offset"]
    x = x @ p["prefinal_l2"]
    out = x @ p["output_w"] + p["output_b"]
    return out[:: cfg.subsample]


CFG = TdnnfConfig(
    feat_dim=8,
    hidden_dim=32,
    bottleneck_dim=8,
    prefinal_dim=16,
    num_pdfs=10,
    time_strides=(1, 1, 0, 3, 3),
)


def test_forward_matches_numpy():
    p = init_params(CFG, seed=1)
    model = TdnnfModel(CFG, p)
    rng = np.random.default_rng(0)
    feats = rng.standard_normal((1, 40, CFG.feat_dim)).astype(np.float32)
    got = np.asarray(model.forward(model.params, feats))
    want = numpy_forward(CFG, p, feats[0])
    np.testing.assert_allclose(got[0], want, rtol=1e-4, atol=1e-4)


def test_utterance_output_count():
    p = init_params(CFG, seed=2)
    model = TdnnfModel(CFG, p)
    rng = np.random.default_rng(1)
    for T in (3, 10, 31, 60):
        feats = rng.standard_normal((2, T, CFG.feat_dim)).astype(np.float32)
        out = np.asarray(model(feats))
        assert out.shape == (2, -(-T // CFG.subsample), CFG.num_pdfs)


@pytest.mark.parametrize("chunk", [7, 10, 16])
def test_streaming_equals_offline(chunk):
    p = init_params(CFG, seed=3)
    model = TdnnfModel(CFG, p)
    rng = np.random.default_rng(2)
    B, T = 2, 61
    feats = rng.standard_normal((B, T, CFG.feat_dim)).astype(np.float32)
    offline = np.asarray(model(feats))

    state = model.init_stream_state(B, chunk)
    outs = []
    for t0 in range(0, T, chunk):
        f = feats[:, t0 : t0 + chunk]
        n = f.shape[1]
        if n < chunk:
            f = np.concatenate([f, np.zeros((B, chunk - n, CFG.feat_dim), np.float32)], 1)
        valid = np.zeros((B, chunk), bool)
        valid[:, :n] = True
        state, out, ov = model.process_chunk(state, f, valid)
        nv = int(np.asarray(ov)[0].sum())
        assert (np.asarray(ov).sum(1) == nv).all()
        outs.append(np.asarray(out)[:, :nv])
    state, out, ov = model.flush(state)
    outs.append(np.asarray(out)[:, : int(np.asarray(ov)[0].sum())])
    streamed = np.concatenate(outs, axis=1)
    assert streamed.shape == offline.shape, (streamed.shape, offline.shape)
    np.testing.assert_allclose(streamed, offline, rtol=1e-4, atol=1e-4)


def test_streaming_uneven_valid_mask():
    """Channels advancing at different rates through the same batched calls."""
    p = init_params(CFG, seed=4)
    model = TdnnfModel(CFG, p)
    rng = np.random.default_rng(3)
    B, T, chunk = 2, 36, 9
    feats = rng.standard_normal((B, T, CFG.feat_dim)).astype(np.float32)
    offline = np.asarray(model(feats))

    # channel 0 gets 9 frames per call; channel 1 gets 6
    state = model.init_stream_state(B, chunk)
    pos = [0, 0]
    outs = [[], []]
    for _ in range(12):
        f = np.zeros((B, chunk, CFG.feat_dim), np.float32)
        valid = np.zeros((B, chunk), bool)
        for b, step in ((0, 9), (1, 6)):
            n = min(step, T - pos[b])
            if n > 0:
                f[b, :n] = feats[b, pos[b] : pos[b] + n]
                valid[b, :n] = True
                pos[b] += n
        state, out, ov = model.process_chunk(state, f, valid)
        for b in range(B):
            outs[b].append(np.asarray(out)[b, : int(np.asarray(ov)[b].sum())])
    state, out, ov = model.flush(state)
    for b in range(B):
        outs[b].append(np.asarray(out)[b, : int(np.asarray(ov)[b].sum())])
    for b in range(B):
        streamed = np.concatenate(outs[b], axis=0)
        np.testing.assert_allclose(streamed, offline[b], rtol=1e-4, atol=1e-4)


def test_bfloat16_close():
    cfg = TdnnfConfig(**{**CFG.__dict__, "compute_dtype": "bfloat16"})
    p = init_params(CFG, seed=5)
    m32 = TdnnfModel(CFG, p)
    m16 = TdnnfModel(cfg, p)
    rng = np.random.default_rng(4)
    feats = rng.standard_normal((1, 30, CFG.feat_dim)).astype(np.float32)
    a = np.asarray(m32(feats))
    b = np.asarray(m16(feats))
    assert np.abs(a - b).max() < 0.25 * np.abs(a).max()
