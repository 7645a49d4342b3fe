#!/usr/bin/env python
"""Quantify the residual-encoding story for the IVF-PQ capstone
(VERDICT r11 #4): recall@k of four ADC variants — {sampled, trained}
codebooks x {raw, residual} encode space — against the exact cosine
top-k, on the same even-half index / md5-first odd-half query batch
the graded capstone serves. All-numpy (driver-side measurement tool,
NOT an engine path): recall is a data property, so float64 cosine
truth and float64 ADC estimates are adequate — engine-exact integer
ranking matters for GRADING, not for measuring a recall curve.

Usage: python tools/pq_residual_recall.py [sf_dir ...] [--k 5]

Results table lives in SCALE.md (round 12)."""

from __future__ import annotations

import argparse
import hashlib
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def md5_first(prefix: str, ids, n: int):
    keyed = sorted(
        (hashlib.md5(f"{prefix}{i}".encode()).hexdigest(), i) for i in ids
    )
    return [i for (_, i) in keyed[:n]]


def lloyd(sub: np.ndarray, k: int, iters: int = 8, seed: int = 42):
    rng = np.random.RandomState(seed)
    centers = sub[rng.choice(len(sub), k, replace=False)].astype(np.float64)
    for _ in range(iters):
        d2 = ((sub[:, None, :] - centers[None, :, :]) ** 2).sum(axis=2)
        assign = np.argmin(d2, axis=1)
        for j in range(k):
            m = sub[assign == j]
            if len(m):
                centers[j] = m.mean(axis=0)
    return centers


def adc_recall(index_x, query_x, truth, ids, books, k,
               member_cell=None, cell_seeds=None, query_raw=None):
    """index_x/query_x: encode-space matrices (n, D) float64; books:
    list of (K, d_sub) per subspace. Raw mode (member_cell None): one
    distance table per (query, subspace). Residual mode: the IVF-ADC
    identity ||q - x||^2 = ||(q - b_c) - (x - b_c)||^2 requires the
    query residual to be taken to the MEMBER's cell, so tables are per
    (query, cell, subspace) and each member reads its own cell's table
    — exactly what the graded capstone's per-probed-cell qtab does."""
    M = len(books)
    d_sub = index_x.shape[1] // M
    n = len(index_x)
    codes = np.zeros((n, M), dtype=np.int64)
    for m in range(M):
        sub = index_x[:, m * d_sub : (m + 1) * d_sub]
        d2 = ((sub[:, None, :] - books[m][None, :, :]) ** 2).sum(axis=2)
        codes[:, m] = np.argmin(d2, axis=1)
    hits = denom = 0
    nq = len(query_x) if query_x is not None else len(query_raw)
    for qi in range(nq):
        est = np.zeros(n)
        if member_cell is None:
            for m in range(M):
                qsub = query_x[qi, m * d_sub : (m + 1) * d_sub]
                tab = ((books[m] - qsub[None, :]) ** 2).sum(axis=1)
                est += tab[codes[:, m]]
        else:
            qres_by_cell = query_raw[qi][None, :] - cell_seeds  # (C, D)
            for m in range(M):
                qsubs = qres_by_cell[:, m * d_sub : (m + 1) * d_sub]
                tabs = (
                    (books[m][None, :, :] - qsubs[:, None, :]) ** 2
                ).sum(axis=2)  # (C, K)
                est += tabs[member_cell, codes[:, m]]
        got = ids[np.argsort(est, kind="stable")[:k]]
        hits += len(set(got) & set(truth[qi]))
        denom += k
    return hits / denom


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("sf_dirs", nargs="*", default=None)
    ap.add_argument("--k", type=int, default=5)
    args = ap.parse_args()
    sf_dirs = args.sf_dirs or ["/root/testdata/sf0.01", "/root/testdata/sf0.1"]

    from sealnet_etl_spark.operators.similarity import (
        IVF_PROBE_Q,
        IVF_REFRESH_CELLS,
        PQ_K,
        PQ_M,
    )
    from sealnet_etl_spark.session import get_spark

    spark = get_spark(app_name="pq-residual-recall")
    for sf_dir in sf_dirs:
        rows = (
            spark.read.parquet(f"{sf_dir}/embeddings.parquet")
            .filter("embedding is not null")
            .select("vec_id", "embedding")
            .collect()
        )
        ids = np.array([r.vec_id for r in rows], dtype=np.int64)
        a = np.floor(
            np.array([r.embedding for r in rows], dtype=np.float64) * 1e6
        )
        even, odd = ids % 2 == 0, ids % 2 == 1
        eids, ex = ids[even], a[even]
        qids_all = ids[odd]
        qsel = md5_first("ivfp:", qids_all.tolist(), IVF_PROBE_Q)
        qpos = [int(np.where(ids == q)[0][0]) for q in qsel]
        qx = a[qpos]

        # exact cosine truth over the even half
        en = ex / np.linalg.norm(ex, axis=1, keepdims=True)
        qn = qx / np.linalg.norm(qx, axis=1, keepdims=True)
        sims = qn @ en.T
        truth = [
            eids[np.argsort(-sims[i], kind="stable")[: args.k]]
            for i in range(len(qsel))
        ]

        # frozen coarse quantizer: md5-first 16 even-half seeds, float
        # argmax assignment (measurement twin of the exact integer rule)
        sids = md5_first("ivfr:", eids.tolist(), IVF_REFRESH_CELLS)
        spos = [int(np.where(eids == s)[0][0]) for s in sids]
        seeds = ex[spos]
        def assign(x):
            cs = (x @ seeds.T) / np.linalg.norm(seeds, axis=1)[None, :]
            return np.argmin(
                -cs / np.linalg.norm(x, axis=1, keepdims=True), axis=1
            )
        e_cell, q_cell = assign(ex), assign(qx)
        e_res = ex - seeds[e_cell]
        q_res = qx - seeds[q_cell]

        # codebooks: sampled = md5-first PQ_K members' (raw | residual)
        # sub-vectors; trained = per-subspace Lloyd on the same space
        cb_ids = md5_first("pqcb:", eids.tolist(), PQ_K)
        cb_pos = [int(np.where(eids == c)[0][0]) for c in cb_ids]
        d_sub = ex.shape[1] // PQ_M
        variants = {
            "sampled/raw": (
                ex, qx, None,
                [ex[cb_pos][:, m * d_sub : (m + 1) * d_sub] for m in range(PQ_M)],
            ),
            "sampled/residual": (
                e_res, None, e_cell,
                [e_res[cb_pos][:, m * d_sub : (m + 1) * d_sub] for m in range(PQ_M)],
            ),
            "trained/raw": (
                ex, qx, None,
                [lloyd(ex[:, m * d_sub : (m + 1) * d_sub], PQ_K) for m in range(PQ_M)],
            ),
            "trained/residual": (
                e_res, None, e_cell,
                [lloyd(e_res[:, m * d_sub : (m + 1) * d_sub], PQ_K) for m in range(PQ_M)],
            ),
        }
        for name, (ix, qx_v, mcell, books) in variants.items():
            r = adc_recall(
                ix, qx_v, truth, eids, books, args.k,
                member_cell=mcell, cell_seeds=seeds, query_raw=qx,
            )
            print(f"{sf_dir} {name:18s} recall@{args.k}={r:.3f}")

        # the residual story's control: a TRAINED coarse quantizer
        # (k-means cell centers minimize E||x - c||^2, which is where
        # production residual-PQ's gain comes from) vs the md5-sampled
        # frozen seeds (arbitrary corpus vectors: residual energy is
        # ~2x raw energy on isotropic data — measured below)
        kcenters = lloyd(ex, IVF_REFRESH_CELLS, iters=10, seed=7)
        def assign_to(x, cents):
            cs = (x @ cents.T) / np.linalg.norm(cents, axis=1)[None, :]
            return np.argmin(
                -cs / np.linalg.norm(x, axis=1, keepdims=True), axis=1
            )
        ek_cell = assign_to(ex, kcenters)
        ek_res = ex - kcenters[ek_cell]
        books_k = [
            lloyd(ek_res[:, m * d_sub : (m + 1) * d_sub], PQ_K)
            for m in range(PQ_M)
        ]
        r = adc_recall(
            ek_res, None, truth, eids, books_k, args.k,
            member_cell=ek_cell, cell_seeds=kcenters, query_raw=qx,
        )
        print(f"{sf_dir} {'kmeans-coarse/residual':22s} recall@{args.k}={r:.3f}")
        print(
            f"{sf_dir} mean|x|={np.linalg.norm(ex, axis=1).mean():.0f} "
            f"mean|x-seed|={np.linalg.norm(e_res, axis=1).mean():.0f} "
            f"mean|x-kmeans|={np.linalg.norm(ek_res, axis=1).mean():.0f}"
        )


if __name__ == "__main__":
    main()
