#!/usr/bin/env python
"""Recall curve for the fitted-IVF index: (C, nprobe) vs brute force.

NumPy replica of the engine's quantized-exact spherical-k-means fit
(``textops/similarity.py:_ivf_fit_centroids`` — same sample, same init,
same sum-centroid Lloyd steps, same first-max tie rule), so the curve
predicts the registered queries' recall exactly without paying a Spark
session per cell-count. Recall@k is measured over EVERY vector as probe
(n=500 at sf0.01, 2000 at sf0.1), not just the 5 gate probes — the
5-probe gate number is reported alongside.

VERDICT_r04 next #4: pick the (C, nprobe) point that beats the r4
multiprobe query (recall 0.4 at 2/8 = 25% candidate fraction) on BOTH
axes, then register it with the generated oracle.

Usage: python scripts/ivf_recall_curve.py [--sf-dirs DIR ...]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np
import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from astro_data_pipeline_spark.textops.similarity import (  # noqa: E402
    _IVF_FIT_CAP,
    _IVF_FIT_MOD,
    _IVF_ITERS,
    _IVF_Q_SCALE,
    _IVF_PROBE_IDS,
    _TOP_K,
)


def load(sf_dir: str) -> tuple[np.ndarray, np.ndarray]:
    t = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"))
    ids = np.asarray(t.column("vec_id").to_pylist(), dtype=np.int64)
    V = np.asarray(t.column("embedding").to_pylist(), dtype=np.float64)
    order = np.argsort(ids)
    return ids[order], V[order]


def fit_cells(ids: np.ndarray, V: np.ndarray, C: int) -> np.ndarray:
    """Replicates _ivf_fit_centroids + full-corpus argmax assignment.
    Returns centroid matrix (C, d)."""
    Q = np.floor(V * _IVF_Q_SCALE + 0.5)
    m = (ids % _IVF_FIT_MOD == 0) & (ids < _IVF_FIT_CAP)
    S = Q[m]
    cent = S[:C].copy()
    sn = (S * S).sum(axis=1)
    for _ in range(_IVF_ITERS):
        cn = (cent * cent).sum(axis=1)
        cos = (S @ cent.T) / np.sqrt(sn[:, None] * cn[None, :])
        asg = np.argmax(cos, axis=1)
        for j in range(C):
            mem = S[asg == j]
            if len(mem):
                cent[j] = mem.sum(axis=0)
    return cent


def probe_cells(Q: np.ndarray, cent: np.ndarray) -> np.ndarray:
    qn = (Q * Q).sum(axis=1)
    cn = (cent * cent).sum(axis=1)
    cos = (Q @ cent.T) / np.sqrt(qn[:, None] * cn[None, :])
    # rank DESC with first-max/lowest-cell ties: argsort on (-cos, cell)
    return np.argsort(-cos, axis=1, kind="stable")


def brute_topk(V: np.ndarray, k: int) -> np.ndarray:
    n = (V * V).sum(axis=1)
    cos = (V @ V.T) / np.sqrt(n[:, None] * n[None, :])
    np.fill_diagonal(cos, -np.inf)
    # the registered queries and their oracles rank by
    # round(cos, 4) DESC, vec_id ASC — mirror that tie-break here so
    # the truth set matches what the engine actually returns on
    # near-tie neighbors (ids are sorted ascending, stable argsort on
    # the rounded value preserves id order within a tie)
    cos = np.round(cos, 4)
    return np.argsort(-cos, axis=1, kind="stable")[:, :k]


def curve(sf_dir: str, cs: list[int], nprobes: list[int]) -> list[dict]:
    ids, V = load(sf_dir)
    Q = np.floor(V * _IVF_Q_SCALE + 0.5)
    truth = brute_topk(V, _TOP_K)
    gate = np.isin(ids, _IVF_PROBE_IDS)
    rows = []
    for C in cs:
        cent = fit_cells(ids, V, C)
        ranks = probe_cells(Q, cent)  # per-vector cell ranking
        cell = ranks[:, 0]
        sizes = np.bincount(cell, minlength=C)
        for npb in nprobes:
            probed = ranks[:, :npb]  # (n, npb)
            # neighbor recalled iff its home cell is among probe's cells
            hit = (cell[truth][:, :, None] == probed[:, None, :]).any(axis=2)
            recall = float(hit.mean())
            recall_gate = float(hit[gate].mean())
            cand_frac = float(sizes[probed].sum(axis=1).mean()) / len(ids)
            rows.append(
                {
                    "sf_dir": sf_dir,
                    "C": C,
                    "nprobe": npb,
                    "recall_at_3": round(recall, 4),
                    "recall_at_3_gate_probes": round(recall_gate, 4),
                    "mean_candidate_fraction": round(cand_frac, 4),
                    "nonempty_cells": int((sizes > 0).sum()),
                    "max_cell_share": round(float(sizes.max()) / len(ids), 4),
                }
            )
            print(
                f"{os.path.basename(sf_dir)} C={C:3d} nprobe={npb}: "
                f"recall@3 {recall:.3f} (gate {recall_gate:.3f}), "
                f"cand {cand_frac:.3f}, cells {int((sizes > 0).sum())}/{C}",
                flush=True,
            )
    return rows


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--sf-dirs", nargs="+",
        default=["/root/testdata/sf0.01", "/root/testdata/sf0.1"],
    )
    ap.add_argument("--cs", type=int, nargs="+", default=[8, 16, 32, 64])
    ap.add_argument("--nprobes", type=int, nargs="+", default=[1, 2, 4, 8])
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    rows = []
    for d in args.sf_dirs:
        rows += curve(d, args.cs, args.nprobes)
    if args.out:
        with open(args.out, "w") as f:
            json.dump(rows, f, indent=2)


if __name__ == "__main__":
    main()
