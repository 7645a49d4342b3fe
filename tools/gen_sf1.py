#!/usr/bin/env python
"""Synthesize an sf1-equivalent decade for the density-sensitive scale
curves (VERDICT r4 #7): 10× the sf0.1 events/documents/embeddings, written
to .scratch/sf1/, derived deterministically from sf0.1 by key-shifted
copies (FIXTURES.md documents the driver's seed-42 generator; this recipe
preserves its distributions without re-running it):

- events: copy k shifts event_id/user_id by k·(max+1) and jitters ts by a
  deterministic per-copy prime millisecond offset. Users 10×, the SAME
  30-day window -> every (day, hour) interval-join block gets ~10× denser,
  exactly the superlinearity stress the (day,hour) re-block must absorb.
- documents: copy k shifts doc_id and suffixes every word with '~k', so
  copies share NO vocabulary: SimHash signatures decorrelate across
  copies, planted near-dup pairs replicate linearly (10× positives), and
  block density grows 10× without degenerate 10-clone clusters.
- embeddings: copy k shifts vec_id and rotates the 64-dim vector by k
  positions — norm-preserving, cosine-decorrelating, so ANN bucket load
  grows 10× while per-query neighbor structure stays realistic.

Only these three tables are written: the four curve queries
(jn_interval_overlap, jn_interval_containment, llm_simhash_near_dup,
llm_lsh_ann_topk) read nothing else."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_COPIES = 10
OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".scratch",
    "sf1",
)
SRC = "/root/testdata/sf0.1"


def main() -> None:
    from pyspark.sql import functions as F

    from sealnet_etl_spark.session import get_spark
    from sealnet_etl_spark.sources import load_table

    spark = get_spark(app_name="gen-sf1")

    ev = load_table(spark, SRC, "events")
    max_eid, max_uid = ev.agg(F.max("event_id"), F.max("user_id")).first()
    if max_eid is None:
        raise SystemExit(f"events table at {SRC} is empty — wrong source dir?")
    max_eid, max_uid = max_eid + 1, max_uid + 1
    copies = []
    for k in range(N_COPIES):
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
    out_ev.repartition(8).write.mode("overwrite").parquet(
        os.path.join(OUT, "events.parquet")
    )

    docs = load_table(spark, SRC, "documents")
    max_did = docs.agg(F.max("doc_id")).first()[0]
    if max_did is None:
        raise SystemExit(f"documents table at {SRC} is empty — wrong source dir?")
    max_did += 1
    copies = []
    for k in range(N_COPIES):
        text = (
            F.col("text")
            if k == 0
            else F.regexp_replace(F.col("text"), r"(\S+)", rf"$1~{k}")
        )
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
    out_docs.repartition(8).write.mode("overwrite").parquet(
        os.path.join(OUT, "documents.parquet")
    )

    emb = load_table(spark, SRC, "embeddings")
    max_vid = emb.agg(F.max("vec_id")).first()[0]
    if max_vid is None:
        raise SystemExit(f"embeddings table at {SRC} is empty — wrong source dir?")
    max_vid += 1
    dim = 64
    copies = []
    for k in range(N_COPIES):
        rot = (
            F.col("embedding")
            if k == 0
            else F.concat(
                F.slice(F.col("embedding"), k + 1, dim - k),
                F.slice(F.col("embedding"), 1, k),
            )
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
    out_emb.repartition(4).write.mode("overwrite").parquet(
        os.path.join(OUT, "embeddings.parquet")
    )

    for t in ("events", "documents", "embeddings"):
        n = spark.read.parquet(os.path.join(OUT, f"{t}.parquet")).count()
        print(f"{t}: {n} rows")
    spark.stop()


if __name__ == "__main__":
    main()
