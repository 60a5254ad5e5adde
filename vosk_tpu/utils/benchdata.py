"""Synthetic benchmark model at realistic scale: flagship-size TDNN-F AM and
a procedurally generated decoding graph with controllable state/arc counts
(standing in for an HCLG while Kaldi-model loading matures).
"""
from __future__ import annotations

import dataclasses

import numpy as np

from ..graph.fst import DecodingGraph, SymbolTable
from ..io import native
from ..models.tdnnf import TdnnfConfig, init_params


def make_bench_graph(
    num_states: int = 50_000,
    avg_em_arcs: int = 6,
    max_em_out: int = 8,
    num_pdfs: int = 2048,
    num_words: int = 5000,
    eps_fraction: float = 0.0,  # load-time epsilon removal leaves real
    # graphs (mostly) eps-free; see graph/optimize.py
    seed: int = 0,
) -> DecodingGraph:
    """Random strongly-decodable graph in CSR form (built directly as arrays;
    no python-loop FST for large sizes)."""
    rng = np.random.default_rng(seed)
    S = num_states
    em_cnt = rng.integers(max(1, avg_em_arcs - 2), max_em_out + 1, S).astype(np.int64)
    em_off = np.zeros(S + 1, np.int32)
    em_off[1:] = np.cumsum(em_cnt)
    Ae = int(em_off[-1])
    em_pdf = rng.integers(0, num_pdfs, Ae).astype(np.int32)
    em_next = rng.integers(0, S, Ae).astype(np.int32)
    em_w = rng.uniform(0.1, 4.0, Ae).astype(np.float32)
    # sparse word labels (~1 in 8 arcs emits a word)
    em_olabel = np.where(
        rng.random(Ae) < 0.125, rng.integers(1, num_words + 1, Ae), 0
    ).astype(np.int32)

    n_eps_states = int(S * eps_fraction)
    eps_cnt = np.zeros(S, np.int64)
    eps_states = rng.choice(S, n_eps_states, replace=False)
    eps_cnt[eps_states] = 1
    eps_off = np.zeros(S + 1, np.int32)
    eps_off[1:] = np.cumsum(eps_cnt)
    An = int(eps_off[-1])
    eps_next = rng.integers(0, S, An).astype(np.int32)
    eps_w = rng.uniform(0.5, 2.0, An).astype(np.float32)
    eps_olabel = np.where(
        rng.random(An) < 0.2, rng.integers(1, num_words + 1, An), 0
    ).astype(np.int32)

    final_cost = np.full(S, np.inf, np.float32)
    finals = rng.choice(S, max(S // 100, 1), replace=False)
    final_cost[finals] = rng.uniform(0, 2.0, len(finals)).astype(np.float32)

    return DecodingGraph(
        num_states=S,
        start=0,
        em_off=em_off,
        em_pdf=em_pdf,
        em_olabel=em_olabel,
        em_w=em_w,
        em_next=em_next,
        eps_off=eps_off,
        eps_olabel=eps_olabel,
        eps_w=eps_w,
        eps_next=eps_next,
        final_cost=final_cost,
        eps_depth=2 if An else 0,
        max_em_out=int(em_cnt.max()),
        max_eps_out=1,
    )


def make_bench_model(
    num_states: int = 50_000,
    num_pdfs: int = 2048,
    hidden: int = 512,
    max_active: int = 1000,
    beam: float = 13.0,
    compute_dtype: str = "bfloat16",
    seed: int = 0,
) -> native.NativeModel:
    """In-memory NativeModel at flagship scale (no disk round-trip)."""
    am_cfg = TdnnfConfig(
        feat_dim=40,
        hidden_dim=hidden,
        bottleneck_dim=96,
        prefinal_dim=192,
        num_pdfs=num_pdfs,
        time_strides=(1, 1, 1, 0, 3, 3, 3, 3, 3, 3, 3),
        subsample=3,
        compute_dtype=compute_dtype,
    )
    params = init_params(am_cfg, seed=seed)
    graph = make_bench_graph(num_states=num_states, num_pdfs=num_pdfs, seed=seed)
    config = native.ModelConfig(
        sample_rate=16000.0,
        feature_type="mfcc",
        frame_opts={"dither": 0.0},
        mel_opts={"num_bins": 40, "low_freq": 20.0, "high_freq": -400.0},
        mfcc_opts={"num_ceps": 40, "use_energy": False},
        am=dataclasses.asdict(am_cfg),
        beam=beam,
        max_active=max_active,
    )
    words = SymbolTable(["<eps>"] + [f"w{i}" for i in range(1, 5001)])
    phones = SymbolTable(["<eps>", "SIL"])
    return native.NativeModel(
        config=config,
        am_params=params,
        graph=graph,
        words=words,
        phones=phones,
        lexicon=None,
        phone_of_pdf=np.zeros(num_pdfs, np.int32),
        silence_pdfs=np.array([0], np.int32),
        topology=native.Topology(),
    )
