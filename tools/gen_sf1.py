#!/usr/bin/env python
"""Synthesize decade fixtures for the density-sensitive scale curves
(VERDICT r4 #7, r6 #3): N× the source events/documents/embeddings,
written to .scratch/<name>/, derived deterministically from the source
scale by key-shifted copies (FIXTURES.md documents the driver's seed-42
generator; this recipe preserves its distributions without re-running
it):

- events: copy k shifts event_id/user_id by k·(max+1) and jitters ts by a
  deterministic per-copy prime millisecond offset. Users 10×, the SAME
  30-day window -> every (day, hour) interval-join block gets ~10× denser,
  exactly the superlinearity stress the (day,hour) re-block must absorb.
- documents: copy k shifts doc_id and suffixes every word with '~k', so
  copies share NO vocabulary: SimHash signatures decorrelate across
  copies, planted near-dup pairs replicate linearly (10× positives), and
  block density grows 10× without degenerate 10-clone clusters.
  CHAINING TRAP (measured, round 7): naively re-running the same recipe
  on sf1 (suffixes ~1..~9, copy 0 plain) makes copy k's plain sub-copy
  become `word~k` — IDENTICAL vocabulary AND text to copy 0's sub-copy
  k, i.e. 9 blocks of full-document exact duplicates that inflated
  substring spans 27× instead of 10×. A chained decade must therefore
  suffix EVERY copy (including k=0) from a fresh label range:
  --suffix-start 10 --suffix-all gives suffixes ~10..~19, and the
  compound vocabulary word[~j]~m (j in {none,1..9}, m in 10..19) is
  collision-free because j < 10 <= m.
- embeddings: copy k shifts vec_id and rotates the 64-dim vector by k
  positions — norm-preserving, cosine-decorrelating, so ANN bucket load
  grows 10× while per-query neighbor structure stays realistic.
  CHAINING TRAP (same shape): composed rotations add mod 64, so the 100
  (j, k) totals land on only 19 distinct offsets — groups of identical
  vectors. With --suffix-all each chained copy additionally negates the
  dims d with d % 10 == k (norm- and dot-structure-preserving per copy,
  distinct masks per k), so no two copies compose to the same transform.

Default invocation reproduces the original sf1 fixture:

    python tools/gen_sf1.py                       # sf0.1 -> .scratch/sf1
    python tools/gen_sf1.py --src .scratch/sf1 --out .scratch/sf10 \
        --suffix-start 10 --suffix-all --tables documents embeddings
                                                  # the second text decade
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default=os.path.join(_REPO, ".scratch", "sf1"))
    ap.add_argument("--copies", type=int, default=10)
    ap.add_argument(
        "--tables",
        nargs="+",
        default=["events", "documents", "embeddings"],
        choices=["events", "documents", "embeddings"],
    )
    ap.add_argument(
        "--suffix-start",
        type=int,
        default=1,
        help="first word-suffix label (copy k>=1 gets ~(start+k-1) unless "
        "--suffix-all, which gives copy k suffix ~(start+k))",
    )
    ap.add_argument(
        "--suffix-all",
        action="store_true",
        help="suffix copy 0 too (REQUIRED when chaining decades; also "
        "enables the per-copy embedding sign-flip mask)",
    )
    ap.add_argument(
        "--preserve-terms",
        nargs="*",
        default=None,
        help="tokens exempt from word-suffixing in EVERY copy (default: the "
        "registered BM25 retrieval terms). VERDICT r7 #4: with --suffix-all "
        "no document kept the plain registered query terms, so the sf10 "
        "retrieval rows (bm25/ndcg/rbo) measured zero matches. Preserving "
        "the 3 bare terms keeps retrieval non-degenerate at every decade "
        "while leaving the collision-free vocabulary argument intact: "
        "already-suffixed occurrences (data~3) still get re-suffixed, and "
        "3 isolated shared tokens per doc cannot form a shared shingle "
        "(min shingle length > 1) or flip a 64-bit SimHash band.",
    )
    args = ap.parse_args()
    n_copies, src, out = args.copies, args.src, args.out
    if args.suffix_all and n_copies > 10:
        # the per-copy embedding sign-flip mask is d % 10 == k, which is a
        # no-op for k >= 10, and rotations >= 64 break F.slice — beyond 10
        # chained copies the decorrelation guarantees silently vanish
        ap.error("--suffix-all supports at most --copies 10 (chain decades "
                 "instead: sf1 -> sf10 -> sf100)")

    from pyspark.sql import functions as F

    from sealnet_etl_spark.session import get_spark
    from sealnet_etl_spark.sources import load_table

    spark = get_spark(app_name="gen-decade")

    if "events" in args.tables:
        ev = load_table(spark, src, "events")
        max_eid, max_uid = ev.agg(F.max("event_id"), F.max("user_id")).first()
        if max_eid is None:
            raise SystemExit(f"events table at {src} is empty — wrong source dir?")
        max_eid, max_uid = max_eid + 1, max_uid + 1
        copies = []
        for k in range(n_copies):
            copies.append(
                ev.select(
                    (F.col("event_id") + F.lit(k * max_eid)).alias("event_id"),
                    # prime ms jitter decorrelates interval endpoints per copy
                    (
                        F.col("ts")
                        + F.expr(f"INTERVAL {k * 7919} MILLISECOND")
                    ).alias("ts"),
                    (F.col("user_id") + F.lit(k * max_uid)).alias("user_id"),
                    "event_type",
                    "value",
                    "props",
                )
            )
        out_ev = copies[0]
        for c in copies[1:]:
            out_ev = out_ev.unionByName(c)
        out_ev.repartition(8 * max(1, n_copies // 10)).write.mode(
            "overwrite"
        ).parquet(os.path.join(out, "events.parquet"))

    if "documents" in args.tables:
        import re as _re

        if args.preserve_terms is None:
            from sealnet_etl_spark.operators.textstats import BM25_QUERY

            preserve = list(BM25_QUERY)
        else:
            preserve = list(args.preserve_terms)
        # token-anchored negative lookahead: a BARE preserved term (no
        # trailing non-space — "data" but not "data~3") is left unsuffixed
        if preserve:
            alt = "|".join(_re.escape(t) for t in preserve)
            word_pat = rf"(?<!\S)(?!(?:{alt})(?!\S))(\S+)"
        else:
            word_pat = r"(\S+)"
        docs = load_table(spark, src, "documents")
        max_did = docs.agg(F.max("doc_id")).first()[0]
        if max_did is None:
            raise SystemExit(
                f"documents table at {src} is empty — wrong source dir?"
            )
        max_did += 1
        copies = []
        for k in range(n_copies):
            if k == 0 and not args.suffix_all:
                text = F.col("text")
            else:
                label = args.suffix_start + k - (0 if args.suffix_all else 1)
                text = F.regexp_replace(F.col("text"), word_pat, rf"$1~{label}")
            # Per-copy term-frequency boost (round 8): APPEND one extra
            # occurrence of preserved term i when bit i of the copy index
            # is set. Without this, every copy of a doc carries IDENTICAL
            # query tf/dl, the retrieval rankings' top-10 collapses to 10
            # tied clones of ONE best ancestor (tie-break = doc_id), and
            # the tf-idf / bm25 top-10s are DISJOINT at every decade (rbo
            # n_common = 0, measured). The bit pattern gives 2^|terms|
            # distinct score classes per ancestor; both rankings rank
            # boosted clones of shared ancestors first, so ranking
            # overlap measures real arithmetic (sf1 n_common 0 → 6,
            # measured). APPEND — not occurrence-doubling — because
            # doubling composes across chained decades into ≥8-token
            # plain runs wherever the source has adjacent query terms,
            # which aliased substring 8-gram anchors ACROSS copies
            # (spans 27× instead of 10×, measured and reverted). The
            # tail uses only the FIRST TWO terms (≤2 plain tokens per
            # decade, ≤4 composed): a 3-term tail composed to 6 needed
            # only 2 matching suffixed predecessor words to complete a
            # shared 8-gram, and on this 31-word vocabulary that alone
            # inflated sf10 spans to 11.9× of sf1 (measured); at ≤4 the
            # completion needs 4 matching predecessors (~31⁻⁴ of
            # same-class pairs — negligible, spans back to ~10×).
            boost = " ".join(
                t for i, t in enumerate(preserve[:2]) if (k >> i) & 1
            )
            if boost:
                text = F.concat(text, F.lit(" " + boost))
            copies.append(
                docs.select(
                    (F.col("doc_id") + F.lit(k * max_did)).alias("doc_id"),
                    text.alias("text"),
                    "lang",
                    "source",
                    F.length(text).alias("n_chars"),
                )
            )
        out_docs = copies[0]
        for c in copies[1:]:
            out_docs = out_docs.unionByName(c)
        out_docs.repartition(8 * max(1, n_copies // 10)).write.mode(
            "overwrite"
        ).parquet(os.path.join(out, "documents.parquet"))

    if "embeddings" in args.tables:
        emb = load_table(spark, src, "embeddings")
        max_vid = emb.agg(F.max("vec_id")).first()[0]
        if max_vid is None:
            raise SystemExit(
                f"embeddings table at {src} is empty — wrong source dir?"
            )
        max_vid += 1
        dim = 64
        copies = []
        for k in range(n_copies):
            rot = (
                F.col("embedding")
                if k == 0
                else F.concat(
                    F.slice(F.col("embedding"), k + 1, dim - k),
                    F.slice(F.col("embedding"), 1, k),
                )
            )
            if args.suffix_all:
                # chained decade: distinct per-copy sign-flip mask so
                # composed transforms never coincide across copies
                rot = F.transform(
                    rot,
                    lambda v, d: F.when(
                        d % 10 == F.lit(k), -v
                    ).otherwise(v),
                )
            copies.append(
                emb.select(
                    (F.col("vec_id") + F.lit(k * max_vid)).alias("vec_id"),
                    rot.alias("embedding"),
                    "label",
                )
            )
        out_emb = copies[0]
        for c in copies[1:]:
            out_emb = out_emb.unionByName(c)
        out_emb.repartition(4 * max(1, n_copies // 10)).write.mode(
            "overwrite"
        ).parquet(os.path.join(out, "embeddings.parquet"))

    for t in args.tables:
        n = spark.read.parquet(os.path.join(out, f"{t}.parquet")).count()
        print(f"{t}: {n} rows")
    spark.stop()


if __name__ == "__main__":
    main()
