"""Online i-vector extractor: numpy oracle equivalence, Kaldi-format
round-trip, silence reweighting, and streaming-chunk invariance."""
import numpy as np
import pytest

from vosk_tpu.io.kaldi_ivector import (
    DiagGmm,
    IvectorDirConfig,
    IvectorExtractor,
    read_diag_gmm,
    read_ivector_dir,
    read_ivector_extractor,
    write_diag_gmm,
    write_ivector_dir,
    write_ivector_extractor,
)
from vosk_tpu.ops.ivector import OnlineIvectorExtractor

G, DIN, D, I = 8, 6, 5, 4
L = R = 2


def make_cfg(seed=0) -> IvectorDirConfig:
    rng = np.random.default_rng(seed)
    miv = rng.standard_normal((G, DIN)).astype(np.float32)
    ivars = rng.uniform(0.5, 2.0, (G, DIN)).astype(np.float32)
    # note: dubm operates on the LDA output space in real models; for the
    # synthetic config we give LDA output dim == dubm dim
    gmm = DiagGmm(
        gconsts=np.zeros(G, np.float32),
        weights=(rng.uniform(0.5, 1.0, G) / G).astype(np.float32),
        means_invvars=rng.standard_normal((G, D)).astype(np.float32),
        inv_vars=rng.uniform(0.5, 2.0, (G, D)).astype(np.float32),
    )
    gmm.gconsts = gmm.compute_gconsts()
    M = rng.standard_normal((G, D, I)).astype(np.float32) * 0.5
    A = rng.standard_normal((G, D, D)).astype(np.float32) * 0.3
    sigma_inv = np.einsum("gij,gkj->gik", A, A) + 0.5 * np.eye(D, dtype=np.float32)
    ie = IvectorExtractor(
        M=M, sigma_inv=sigma_inv.astype(np.float32),
        prior_offset=3.7, w_vec=np.full(G, 1.0 / G, np.float32),
    )
    spliced = DIN * (L + R + 1)
    lda = rng.standard_normal((D, spliced + 1)).astype(np.float32) * 0.2
    cmvn = np.zeros((2, DIN + 1), np.float64)
    cmvn[0, :-1] = rng.standard_normal(DIN) * 10
    cmvn[0, -1] = 10.0
    cmvn[1, :-1] = 20.0
    return IvectorDirConfig(
        dubm=gmm, extractor=ie, lda=lda, global_cmvn=cmvn,
        splice_left=L, splice_right=R, num_gselect=3, min_post=0.025,
        posterior_scale=0.1, ivector_period=10, max_count=100.0,
    )


def oracle_ivector(cfg: IvectorDirConfig, feats: np.ndarray,
                   weights=None) -> np.ndarray:
    """Offline numpy reference: splice (edge-replicated) + LDA, top-Q
    posteriors on the CMVN'd stream, stats on the raw stream, solve."""
    T = len(feats)
    w = np.ones(T) if weights is None else np.asarray(weights, np.float64)
    mean = cfg.global_cmvn[0, :-1] / cfg.global_cmvn[0, -1]
    lda_m, lda_off = cfg.lda[:, :-1], cfg.lda[:, -1]

    def splice_lda(x):
        padded = np.concatenate(
            [np.repeat(x[:1], L, 0), x, np.repeat(x[-1:], R, 0)], axis=0
        )
        sp = np.concatenate([padded[i : i + T] for i in range(L + R + 1)], axis=1)
        return sp @ lda_m.T + lda_off

    y = splice_lda(feats)
    yc = splice_lda(feats - mean[None, :])
    g = cfg.dubm
    ll = yc @ g.means_invvars.T - 0.5 * (yc ** 2) @ g.inv_vars.T + g.gconsts
    gamma = np.zeros(G)
    xstat = np.zeros((G, D))
    for t in range(T):
        top = np.argsort(-ll[t])[: cfg.num_gselect]
        p = np.exp(ll[t][top] - ll[t][top].max())
        p /= p.sum()
        p = np.where(p >= cfg.min_post, p, 0.0)
        p /= max(p.sum(), 1e-9)
        p *= cfg.posterior_scale * w[t]
        for q, gi in enumerate(top):
            gamma[gi] += p[q]
            xstat[gi] += p[q] * y[t]
    count = gamma.sum()
    if cfg.max_count > 0 and count > cfg.max_count:
        s = cfg.max_count / count
        gamma, xstat = gamma * s, xstat * s
    ie = cfg.extractor
    proj = np.einsum("gdi,gde->gie", ie.M, ie.sigma_inv)
    U = np.einsum("gie,gej->gij", proj, ie.M)
    quad = np.einsum("g,gij->ij", gamma, U) + np.eye(I)
    lin = np.einsum("gid,gd->i", proj, xstat)
    lin[0] += ie.prior_offset
    iv = np.linalg.solve(quad, lin)
    iv[0] -= ie.prior_offset
    return iv


def test_matches_oracle_offline():
    cfg = make_cfg()
    ex = OnlineIvectorExtractor(cfg, chunk_frames=16)
    rng = np.random.default_rng(1)
    feats = rng.standard_normal((24, DIN)).astype(np.float32)
    st = ex.init_state(1)
    st = ex.update(st, feats[None, :16])
    st = ex.update(st, feats[None, 16:])
    st = ex.flush(st)
    iv = np.asarray(ex.current(st))[0]
    ref = oracle_ivector(cfg, feats)
    np.testing.assert_allclose(iv, ref, rtol=2e-3, atol=2e-3)


def test_chunking_invariance():
    """Different chunkings accumulate identical stats (modulo the flush
    edge); two-channel batch matches single-channel runs."""
    cfg = make_cfg(2)
    ex = OnlineIvectorExtractor(cfg, chunk_frames=10)
    rng = np.random.default_rng(3)
    feats = rng.standard_normal((30, DIN)).astype(np.float32)

    st = ex.init_state(1)
    for t0 in range(0, 30, 10):
        st = ex.update(st, feats[None, t0 : t0 + 10])
    st = ex.flush(st)
    iv_a = np.asarray(ex.current(st))[0]

    ex2 = OnlineIvectorExtractor(cfg, chunk_frames=6)
    st2 = ex2.init_state(2)
    for t0 in range(0, 30, 6):
        st2 = ex2.update(st2, np.stack([feats[t0 : t0 + 6]] * 2))
    st2 = ex2.flush(st2)
    iv_b = np.asarray(ex2.current(st2))
    np.testing.assert_allclose(iv_a, iv_b[0], rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(iv_b[0], iv_b[1], rtol=1e-6, atol=1e-6)


def test_partial_chunks_with_padding():
    """Padded (invalid) tail frames must not contribute."""
    cfg = make_cfg(4)
    ex = OnlineIvectorExtractor(cfg, chunk_frames=8)
    rng = np.random.default_rng(5)
    feats = rng.standard_normal((11, DIN)).astype(np.float32)
    st = ex.init_state(1)
    st = ex.update(st, feats[None, :8])
    pad = np.zeros((1, 8, DIN), np.float32)
    pad[0, :3] = feats[8:]
    valid = np.zeros((1, 8), bool)
    valid[0, :3] = True
    st = ex.update(st, pad, valid=valid)
    st = ex.flush(st)
    iv = np.asarray(ex.current(st))[0]
    ref = oracle_ivector(cfg, feats)
    np.testing.assert_allclose(iv, ref, rtol=2e-3, atol=2e-3)


def test_silence_reweighting_matches_oracle():
    cfg = make_cfg(6)
    ex = OnlineIvectorExtractor(cfg, chunk_frames=16)
    rng = np.random.default_rng(7)
    feats = rng.standard_normal((16, DIN)).astype(np.float32)
    st = ex.init_state(1)
    st = ex.update(st, feats[None])
    st = ex.flush(st)
    # downweight frames 3..7 to 0.05
    w = np.ones(16)
    w[3:8] = 0.05
    ids = np.asarray([[3, 4, 5, 6, 7, -1]], np.int32)
    ws = np.asarray([[0.05] * 5 + [1.0]], np.float32)
    st = ex.reweight(st, ids, ws)
    iv = np.asarray(ex.current(st))[0]
    ref = oracle_ivector(cfg, feats, weights=w)
    np.testing.assert_allclose(iv, ref, rtol=2e-3, atol=2e-3)
    # reweighting twice with the same weights is a no-op
    st2 = ex.reweight(st, ids, ws)
    iv2 = np.asarray(ex.current(st2))[0]
    np.testing.assert_allclose(iv, iv2, rtol=1e-5, atol=1e-5)


def test_kaldi_dir_roundtrip(tmp_path):
    cfg = make_cfg(8)
    write_ivector_dir(tmp_path, cfg)
    back = read_ivector_dir(tmp_path)
    np.testing.assert_allclose(back.dubm.means_invvars, cfg.dubm.means_invvars)
    np.testing.assert_allclose(back.dubm.gconsts, cfg.dubm.gconsts, rtol=1e-5)
    np.testing.assert_allclose(back.extractor.M, cfg.extractor.M)
    np.testing.assert_allclose(
        back.extractor.sigma_inv, cfg.extractor.sigma_inv, rtol=1e-5
    )
    assert back.extractor.prior_offset == pytest.approx(cfg.extractor.prior_offset)
    np.testing.assert_allclose(back.lda, cfg.lda)
    assert back.splice_left == L and back.splice_right == R
    assert back.num_gselect == cfg.num_gselect
    assert back.max_count == cfg.max_count
    # extractor built from the reread config gives the same ivector
    rng = np.random.default_rng(9)
    feats = rng.standard_normal((12, DIN)).astype(np.float32)
    for c in (cfg, back):
        ex = OnlineIvectorExtractor(c, chunk_frames=12)
        st = ex.update(ex.init_state(1), feats[None])
        st = ex.flush(st)
        c._iv = np.asarray(ex.current(st))[0]
    np.testing.assert_allclose(cfg._iv, back._iv, rtol=1e-5, atol=1e-5)
