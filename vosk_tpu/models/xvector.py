"""x-vector speaker-identification model (reference SpkModel,
src/spk_model.cc + extraction at src/recognizer.cc:326-419: TDNN with stats
pooling, then mean subtraction, transform, length normalization).

Native format + JAX forward.  Fuller speaker pipeline lands with the
SpkModel loader; this module provides the forward + the recognizer hook.
"""
from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass
class XvectorConfig:
    feat_dim: int = 20
    hidden_dim: int = 64
    embed_dim: int = 32
    num_layers: int = 3
    context: int = 2  # splice +-context in first layer


def init_xvector_params(cfg: XvectorConfig, seed: int = 0) -> Dict[str, np.ndarray]:
    rng = np.random.default_rng(seed)

    def mat(i, o):
        return (rng.standard_normal((i, o)) / np.sqrt(i)).astype(np.float32)

    p: Dict[str, np.ndarray] = {}
    in_dim = cfg.feat_dim * (2 * cfg.context + 1)
    for i in range(cfg.num_layers):
        p[f"l{i}_w"] = mat(in_dim if i == 0 else cfg.hidden_dim, cfg.hidden_dim)
        p[f"l{i}_b"] = np.zeros(cfg.hidden_dim, np.float32)
    p["post_w"] = mat(2 * cfg.hidden_dim, cfg.embed_dim)
    p["post_b"] = np.zeros(cfg.embed_dim, np.float32)
    return p


def xvector_forward(cfg: XvectorConfig, params, feats):
    """feats: [T, D] -> embedding [embed_dim].

    Frame stack -> relu layers -> stats pooling (mean+std) -> affine,
    mirroring the reference x-vector recipe shape.
    """
    T = feats.shape[0]
    offs = range(-cfg.context, cfg.context + 1)
    x = jnp.concatenate(
        [feats[jnp.clip(jnp.arange(T) + o, 0, T - 1)] for o in offs], axis=-1
    )
    for i in range(cfg.num_layers):
        x = jnp.maximum(jnp.matmul(x, params[f"l{i}_w"]) + params[f"l{i}_b"], 0.0)
    mean = jnp.mean(x, axis=0)
    std = jnp.sqrt(jnp.maximum(jnp.var(x, axis=0), 1e-10))
    stats = jnp.concatenate([mean, std])
    return jnp.matmul(stats, params["post_w"]) + params["post_b"]


class SpkModel:
    """Speaker model: x-vector net + global mean + transform
    (reference spk_model.cc:17-32 reads final.ext.raw, mean.vec,
    transform.mat)."""

    def __init__(self, cfg: XvectorConfig, params, mean, transform):
        self.cfg = cfg
        self.params = jax.tree_util.tree_map(jnp.asarray, params)
        self.mean = np.asarray(mean, np.float32)
        self.transform = np.asarray(transform, np.float32)
        self._fwd = jax.jit(lambda p, f: xvector_forward(cfg, p, f))

    def extract(self, feats: np.ndarray) -> np.ndarray:
        """feats: [T, D] speaker-feature matrix -> final whitened, length-
        normalized vector (reference recognizer.cc:406-417)."""
        xvec = np.asarray(self._fwd(self.params, jnp.asarray(feats)))
        xvec = xvec - self.mean
        out = self.transform @ xvec
        norm = np.linalg.norm(out)
        ratio = norm / np.sqrt(out.shape[0])
        if ratio > 0:
            out = out / ratio
        return out

    @classmethod
    def load(cls, path) -> "SpkModel":
        from pathlib import Path
        import json

        p = Path(path)
        cfg_file = p / "vosk_tpu_spk.json"
        if not cfg_file.exists():
            if (p / "final.ext.raw").exists():
                return load_kaldi_spk_model(p)
            raise FileNotFoundError(f"Folder '{path}' does not contain a speaker model")
        cfg = XvectorConfig(**json.loads(cfg_file.read_text()))
        z = np.load(p / "spk.npz")
        params = {k: z[k] for k in z.files if k not in ("mean", "transform")}
        return cls(cfg, params, z["mean"], z["transform"])

    def save(self, path) -> None:
        from pathlib import Path
        import json

        p = Path(path)
        p.mkdir(parents=True, exist_ok=True)
        (p / "vosk_tpu_spk.json").write_text(json.dumps(dataclasses.asdict(self.cfg)))
        np.savez(
            p / "spk.npz",
            **{k: np.asarray(v) for k, v in self.params.items()},
            mean=self.mean,
            transform=self.transform,
        )


class KaldiSpkModel:
    """Speaker model backed by a parsed nnet3 x-vector network (Kaldi
    final.ext.raw layout, reference spk_model.cc:17-32)."""

    def __init__(self, net, mean, transform, feat_dim: int):
        import jax as _jax

        self.net = net
        self.mean = np.asarray(mean, np.float32)
        self.transform = np.asarray(transform, np.float32)
        self.cfg = XvectorConfig(feat_dim=feat_dim, embed_dim=len(mean))

    def extract(self, feats: np.ndarray) -> np.ndarray:
        out = np.asarray(self.net.evaluate({"input": feats}))
        xvec = out[0] - self.mean
        v = self.transform @ xvec
        norm = np.linalg.norm(v)
        ratio = norm / np.sqrt(v.shape[0])
        return v / ratio if ratio > 0 else v


def load_kaldi_spk_model(path) -> "KaldiSpkModel":
    """Read a Kaldi speaker-model dir: final.ext.raw (raw nnet3), mean.vec,
    transform.mat, mfcc.conf."""
    from pathlib import Path

    from ..io.kaldiio import (
        open_kaldi,
        read_kaldi_matrix,
        read_kaldi_vector,
    )
    from ..io.nnet3 import Nnet3
    from ..utils.config import read_config_file

    p = Path(path)
    r, binary = open_kaldi(p / "final.ext.raw")
    if not binary:
        raise ValueError("text-mode final.ext.raw not supported")
    net = Nnet3.read(r)
    mean = read_kaldi_vector(p / "mean.vec")
    transform = read_kaldi_matrix(p / "transform.mat")
    feat_dim = net.nodes["input"].dim
    return KaldiSpkModel(net, mean, transform, feat_dim)


def export_kaldi_spk_model(spk: "SpkModel", out_dir) -> None:
    """Write a native SpkModel as a Kaldi-layout speaker dir (round-trip
    validation of the reading path)."""
    from pathlib import Path

    from ..io import nnet3 as n3
    from ..io.kaldiio import BinaryWriter, write_kaldi_object

    p = Path(out_dir)
    p.mkdir(parents=True, exist_ok=True)
    cfg = spk.cfg
    net = n3.Nnet3()
    lines = [f"input-node name=input dim={cfg.feat_dim}"]
    comps = {}
    offs = list(range(-cfg.context, cfg.context + 1))
    splice = ", ".join(
        f"Offset(input, {o})" if o else "input" for o in offs
    )
    prev = None
    for i in range(cfg.num_layers):
        inp = f"Append({splice})" if i == 0 else prev
        lines.append(f"component-node name=l{i}.affine component=l{i}.affine input={inp}")
        comps[f"l{i}.affine"] = n3.AffineComponent(
            np.asarray(spk.params[f"l{i}_w"]).T, np.asarray(spk.params[f"l{i}_b"])
        )
        lines.append(f"component-node name=l{i}.relu component=l{i}.relu input=l{i}.affine")
        comps[f"l{i}.relu"] = n3.NonlinComponent(cfg.hidden_dim, "RectifiedLinearComponent")
        prev = f"l{i}.relu"
    lines.append(f"component-node name=stats_ex component=stats_ex input={prev}")
    comps["stats_ex"] = n3.StatisticsExtractionComponent(cfg.hidden_dim, 1, 1, True)
    lines.append("component-node name=stats_pool component=stats_pool input=stats_ex")
    comps["stats_pool"] = n3.StatisticsPoolingComponent(
        1 + 2 * cfg.hidden_dim, 1, -1000, 1000, 0, True
    )
    lines.append("component-node name=post component=post input=stats_pool")
    comps["post"] = n3.AffineComponent(
        np.asarray(spk.params["post_w"]).T, np.asarray(spk.params["post_b"])
    )
    lines.append("output-node name=output input=post objective=linear")
    for line in lines:
        net._parse_config_line(line)
    net.components = comps
    net.component_order = list(comps)

    write_kaldi_object(p / "final.ext.raw", net.write)
    write_kaldi_object(p / "mean.vec", lambda w: w.write_vector(spk.mean))
    write_kaldi_object(p / "transform.mat", lambda w: w.write_matrix(spk.transform))
    (p / "mfcc.conf").write_text(
        f"--num-ceps={cfg.feat_dim}\n--num-mel-bins={cfg.feat_dim + 3}\n"
        "--use-energy=false\n"
    )


MIN_SPK_FEATS = 50  # reference recognizer.cc:354


def extract_xvector_for_recognizer(rec) -> Tuple[Optional[list], Optional[int]]:
    """Compute the speaker vector for a Recognizer's current utterance audio
    using non-silence frames only (reference GetSpkVector,
    recognizer.cc:356-419).  Returns (vector list, num_frames) or (None,
    None) when not enough speech."""
    from ..ops.features import (
        FeatureExtractor,
        FrameOptions,
        MelOptions,
        MfccOptions,
        sliding_window_cmn,
    )

    if not rec._spk_feats:
        return None, None
    wav = np.concatenate(rec._spk_feats)
    ex = FeatureExtractor(
        MfccOptions(
            frame_opts=FrameOptions(dither=0.0, samp_freq=rec.model_rate),
            mel_opts=MelOptions(num_bins=rec.spk_model.cfg.feat_dim + 3),
            num_ceps=rec.spk_model.cfg.feat_dim,
            use_energy=False,
        )
    )
    feats = np.asarray(ex.extract(wav[None]))[0]  # [T, D] 10ms frames

    # non-silence selection from the decoder's best-path alignment (output
    # frames are subsample x 10ms)
    # whole-utterance alignment (frozen prefix + retained window) — the
    # speaker features span the full utterance, so folded streams need the
    # prefix pdfs too
    _, _, pdfs = rec._full_traceback(use_final=False)
    sil = set(int(x) for x in rec.model.silence_pdfs)
    ss = rec.am.subsample
    keep = []
    for i in range(feats.shape[0]):
        j = min(i // ss, len(pdfs) - 1) if pdfs else -1
        if j >= 0 and pdfs[j] not in sil:
            keep.append(i)
    if len(keep) < MIN_SPK_FEATS:
        return None, None
    sel = feats[keep]
    sel = np.asarray(sliding_window_cmn(jnp.asarray(sel), window=300, center=True))
    vec = rec.spk_model.extract(sel)
    return [float(x) for x in vec], len(keep)
