#!/usr/bin/env python
"""Does the rebalance IMPROVE nprobe=1 recall on the hot cells?
(VERDICT r11 #1's recall-row ask.) Numpy measurement twin of the
registered llm_ivf_probe_rebalanced layout: full corpus indexed, the
IVF_SPLIT_TOP hottest of the 16 frozen cells split IVF_SPLIT_WAYS
ways on md5-first 'ivfs:' sub-seeds, members re-routed; queries (the
md5-first IVF_PROBE_Q odd-half batch) probe nprobe=1 PRE (16 cells)
vs POST (20 cells), self-excluded, against exact cosine top-k truth
over the same corpus-minus-self. Reported overall and restricted to
queries whose PRE cell was one of the split (hot) cells — the
population the rebalance is for. Also reports the candidate-set size
each probe touched (the split's cost story: fewer candidates per
probe at equal-or-better recall).

Usage: python tools/ivf_rebalance_recall.py [sf_dir ...] [--k 5]
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


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("sf_dirs", nargs="*", default=None)
    ap.add_argument("--k", type=int, default=5)
    args = ap.parse_args()
    sf_dirs = args.sf_dirs or ["/root/testdata/sf0.01", "/root/testdata/sf0.1"]

    from sealnet_etl_spark.operators.similarity import (
        IVF_PROBE_Q,
        IVF_REFRESH_CELLS,
        IVF_SPLIT_TOP,
        IVF_SPLIT_WAYS,
    )
    from sealnet_etl_spark.session import get_spark

    spark = get_spark(app_name="ivf-rebalance-recall")
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
        norm = np.linalg.norm(a, axis=1)
        unit = a / norm[:, None]
        eids = ids[ids % 2 == 0]

        seeds_ids = md5_first("ivfr:", eids.tolist(), IVF_REFRESH_CELLS)
        spos = np.array([int(np.where(ids == s)[0][0]) for s in seeds_ids])

        def route(x_unit, seed_mat):
            return np.argmax(
                x_unit @ (seed_mat / np.linalg.norm(seed_mat, axis=1)[:, None]).T,
                axis=1,
            )

        cell = route(unit, a[spos])  # pre-assignment, full corpus
        occ = np.bincount(cell, minlength=IVF_REFRESH_CELLS)
        hot = np.argsort(-occ, kind="stable")[:IVF_SPLIT_TOP]

        # post layout: survivors keep their members; each hot cell
        # re-seeds on its md5-first IVF_SPLIT_WAYS members ('ivfs:')
        post_seed_pos, post_parent = [], []
        for ci in range(IVF_REFRESH_CELLS):
            if ci in hot:
                members = ids[cell == ci]
                subs = md5_first("ivfs:", members.tolist(), IVF_SPLIT_WAYS)
                for s in subs:
                    post_seed_pos.append(int(np.where(ids == s)[0][0]))
                    post_parent.append(ci)
            else:
                post_seed_pos.append(int(spos[ci]))
                post_parent.append(ci)
        post_seed_pos = np.array(post_seed_pos)
        post_parent = np.array(post_parent)
        # members: cold keep cell; hot re-route among their sub-seeds
        post_cell = np.zeros(len(ids), dtype=np.int64)
        for pi, (ppos, par) in enumerate(zip(post_seed_pos, post_parent)):
            pass  # filled below per parent group
        for ci in range(IVF_REFRESH_CELLS):
            mask = cell == ci
            if ci in hot:
                sub_idx = np.where(post_parent == ci)[0]
                sub_mat = a[post_seed_pos[sub_idx]]
                choice = route(unit[mask], sub_mat)
                post_cell[mask] = sub_idx[choice]
            else:
                post_cell[mask] = int(np.where(
                    (post_parent == ci)
                    & (post_seed_pos == spos[ci])
                )[0][0])

        qids = md5_first(
            "ivfp:", ids[ids % 2 == 1].tolist(), IVF_PROBE_Q
        )
        qpos = np.array([int(np.where(ids == q)[0][0]) for q in qids])

        def probe(q_i, cells_vec, seed_pos):
            c = int(route(unit[q_i : q_i + 1], a[seed_pos])[0])
            cand = np.where((cells_vec == c) & (np.arange(len(ids)) != q_i))[0]
            sims = unit[cand] @ unit[q_i]
            top = cand[np.argsort(-sims, kind="stable")[: args.k]]
            return c, set(ids[top].tolist()), len(cand)

        stats = {"pre": [0, 0, 0], "post": [0, 0, 0]}
        hot_stats = {"pre": [0, 0, 0], "post": [0, 0, 0]}
        for q_i in qpos:
            others = np.arange(len(ids)) != q_i
            sims = unit[others] @ unit[q_i]
            truth = set(
                ids[np.where(others)[0][np.argsort(-sims, kind="stable")[: args.k]]]
                .tolist()
            )
            pre_c, pre_got, pre_n = probe(q_i, cell, spos)
            post_c, post_got, post_n = probe(q_i, post_cell, post_seed_pos)
            was_hot = pre_c in hot
            for tag, got, n in (("pre", pre_got, pre_n), ("post", post_got, post_n)):
                stats[tag][0] += len(got & truth)
                stats[tag][1] += args.k
                stats[tag][2] += n
                if was_hot:
                    hot_stats[tag][0] += len(got & truth)
                    hot_stats[tag][1] += args.k
                    hot_stats[tag][2] += n
        for tag in ("pre", "post"):
            h, d, n = stats[tag]
            hh, hd, hn = hot_stats[tag]
            hot_str = (
                f" hot-routed recall={hh/hd:.3f} ({hh}/{hd}) cand/q={hn/max(hd//args.k,1):.0f}"
                if hd
                else " (no query routed hot pre-split)"
            )
            print(
                f"{sf_dir} {tag:4s} recall@{args.k}={h/d:.3f} ({h}/{d}) "
                f"cand/q={n/(d//args.k):.0f}{hot_str}"
            )


if __name__ == "__main__":
    main()
