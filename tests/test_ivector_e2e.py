"""End-to-end i-vector pathway: a Kaldi-layout model dir whose AM consumes
an i-vector input (reference model.cc:247-263) loads and decodes through
the full streaming Recognizer, including decoded-silence weighting."""
import json
import os
import shutil
from pathlib import Path

import numpy as np
import pytest

import vosk_tpu
from vosk_tpu.io import native
from vosk_tpu.io import nnet3 as n3
from vosk_tpu.io.kaldi_export import build_transition_model, tdnnf_to_nnet3
from vosk_tpu.io.kaldi_ivector import (
    DiagGmm,
    IvectorDirConfig,
    IvectorExtractor,
    write_ivector_dir,
)
from vosk_tpu.io.kaldiio import BinaryWriter
from vosk_tpu.utils import toydata

TOY_DIR = "/tmp/vosk_tpu_toy_model_v1"
KALDI_DIR = "/tmp/vosk_tpu_toy_kaldi_v1"
IV_DIR = "/tmp/vosk_tpu_toy_kaldi_iv_v1"

IVD = 6      # ivector dim fed to the AM
UBM_D = 5    # LDA output / UBM dim
SPLICE = 2


@pytest.fixture(scope="module")
def iv_kaldi_dir():
    if not os.path.exists(os.path.join(TOY_DIR, "vosk_tpu_model.json")):
        toydata.build_toy_model(TOY_DIR, train_steps=400)
    if not os.path.exists(os.path.join(KALDI_DIR, "am", "final.mdl")):
        from vosk_tpu.io.kaldi_export import export_kaldi_dir

        export_kaldi_dir(native.load_model(TOY_DIR), KALDI_DIR)
    if os.path.exists(IV_DIR):
        shutil.rmtree(IV_DIR)
    shutil.copytree(KALDI_DIR, IV_DIR)

    m = native.load_model(TOY_DIR)
    num_phones = len(m.phones) - 1
    tm = build_transition_model(num_phones, m.topology.self_loop_prob)
    net = tdnnf_to_nnet3(m.am_config, m.am_params)

    # graft an ivector input onto tdnn1.affine with ZERO weights: the
    # network output is unchanged, so the transcript must match the
    # non-ivector model while exercising the whole extractor pathway
    net._parse_config_line(f"input-node name=ivector dim={IVD}")
    net._parse_config_line(
        "component-node name=tdnn1.affine component=tdnn1.affine "
        "input=Append(Offset(input, -1), input, Offset(input, 1), "
        "ReplaceIndex(ivector, t, 0))"
    )
    aff = net.components["tdnn1.affine"]
    aff.linear = np.concatenate(
        [aff.linear, np.zeros((aff.linear.shape[0], IVD), np.float32)], axis=1
    )
    am = n3.AmNnetSimple(net, np.zeros(0, np.float32))
    with open(Path(IV_DIR) / "am" / "final.mdl", "wb") as f:
        f.write(b"\x00B")
        w = BinaryWriter(f)
        tm.write(w)
        am.write(w)

    # synthetic ivector/ directory sized for the toy model's MFCC dim
    din = m.am_config.feat_dim
    rng = np.random.default_rng(11)
    gmm = DiagGmm(
        gconsts=np.zeros(4, np.float32),
        weights=np.full(4, 0.25, np.float32),
        means_invvars=rng.standard_normal((4, UBM_D)).astype(np.float32),
        inv_vars=np.ones((4, UBM_D), np.float32),
    )
    gmm.gconsts = gmm.compute_gconsts()
    A = rng.standard_normal((4, UBM_D, UBM_D)).astype(np.float32) * 0.2
    sig = np.einsum("gij,gkj->gik", A, A) + np.eye(UBM_D, dtype=np.float32)
    ie = IvectorExtractor(
        M=(rng.standard_normal((4, UBM_D, IVD)) * 0.3).astype(np.float32),
        sigma_inv=sig.astype(np.float32),
        prior_offset=2.0,
        w_vec=np.full(4, 0.25, np.float32),
    )
    lda = (rng.standard_normal((UBM_D, din * (2 * SPLICE + 1) + 1)) * 0.05).astype(
        np.float32
    )
    cmvn = np.zeros((2, din + 1), np.float64)
    cmvn[0, -1] = 1.0
    write_ivector_dir(
        Path(IV_DIR) / "ivector",
        IvectorDirConfig(
            dubm=gmm, extractor=ie, lda=lda, global_cmvn=cmvn,
            splice_left=SPLICE, splice_right=SPLICE,
        ),
    )

    # enable silence weighting in model.conf
    conf = Path(IV_DIR) / "conf" / "model.conf"
    extra = (
        "--ivector-silence-weighting.silence-weight=0.001\n"
        "--ivector-silence-weighting.silence-phones=9\n"
    )
    conf.write_text((conf.read_text() if conf.exists() else "") + extra)
    return IV_DIR


def test_ivector_model_loads_and_decodes(iv_kaldi_dir):
    words = ["three", "seven", "one"]
    wav = toydata.make_test_wav(words, seed=300)
    pcm = np.clip(wav, -32768, 32767).astype("<i2").tobytes()

    model = vosk_tpu.Model(iv_kaldi_dir)
    rec = vosk_tpu.KaldiRecognizer(model, 16000)
    # stream in small chunks so silence weighting runs mid-utterance
    step = 6400
    for off in range(0, len(pcm), step):
        rec.AcceptWaveform(pcm[off : off + step])
    out = json.loads(rec.FinalResult())["text"]
    assert out == " ".join(words)

    # the extractor actually accumulated stats
    r = rec._rec
    assert r.iv is not None
    assert int(np.asarray(r._iv_state["centers_done"])[0]) > 0
    iv = np.asarray(r.iv.current(r._iv_state))[0]
    assert np.all(np.isfinite(iv)) and np.any(iv != 0)
    # silence weighting engaged (toy audio has silence segments)
    assert r._iv_frames_weighted > 0


def test_ivector_missing_dir_raises(iv_kaldi_dir, tmp_path):
    broken = tmp_path / "broken"
    shutil.copytree(iv_kaldi_dir, broken)
    shutil.rmtree(broken / "ivector")
    with pytest.raises(FileNotFoundError):
        vosk_tpu.Model(str(broken))
