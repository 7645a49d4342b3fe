"""Sorts / limits / top-k (SURVEY.md §2.6) and set operations (§2.7).

Global sorts are range-partitioned sample sorts in Spark (scalable but a
full shuffle); `ORDER BY ... LIMIT k` instead plans TakeOrderedAndProject —
per-partition heaps + driver merge, no global shuffle — which is the only
top-k shape worth running at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..registry import query
from ..sources import load_table


@query(
    "srt_global_sort",
    survey_id="SRT-1",
    oracle="""
        SELECT c_custkey, ROUND(c_acctbal, 2) AS acctbal,
               ROW_NUMBER() OVER (ORDER BY c_acctbal DESC, c_custkey) AS overall_rank
        FROM customer
    """,
)
def srt_global_sort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global multi-key sort, made hash-observable via a rank column over
    the same total order (a bare sort hashes identically to its input)."""
    customer = load_table(spark, sf_dir, "customer")
    w = Window.orderBy(F.col("c_acctbal").desc(), F.col("c_custkey"))
    return (
        customer.orderBy(F.col("c_acctbal").desc(), F.col("c_custkey"))
        .select(
            "c_custkey",
            F.round("c_acctbal", 2).alias("acctbal"),
            F.row_number().over(w).alias("overall_rank"),
        )
    )


@query(
    "srt_global_topk",
    survey_id="SRT-2",
    oracle="""
        SELECT p_partkey, p_name, ROUND(p_retailprice, 2) AS retailprice
        FROM part
        ORDER BY p_retailprice DESC, p_partkey
        LIMIT 15
    """,
)
def srt_global_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORDER BY + LIMIT → TakeOrderedAndProject (per-partition top-k heaps,
    no global sort). Unique-key tiebreak keeps the cut deterministic."""
    part = load_table(spark, sf_dir, "part")
    return (
        part.orderBy(F.col("p_retailprice").desc(), F.col("p_partkey"))
        .limit(15)
        .select(
            "p_partkey", "p_name", F.round("p_retailprice", 2).alias("retailprice")
        )
    )


@query(
    "srt_within_partitions",
    survey_id="SRT-3",
    oracle="""
        SELECT
            CAST(('0x' || substring(md5('pt|' || l_orderkey), 1, 8))::BIGINT
                 % 8 AS INT)            AS bucket,
            CAST(COUNT(*) AS BIGINT)    AS n_rows,
            MIN(l_orderkey)             AS min_orderkey,
            MAX(l_orderkey)             AS max_orderkey,
            TRUE                        AS is_sorted
        FROM lineitem
        GROUP BY 1
    """,
)
def srt_within_partitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sortWithinPartitions: per-partition clustering without a global
    shuffle — the sink-layout primitive (parquet run-length/dictionary
    pages compress far better on locally sorted data).

    Upgraded rows-only -> hash (round 5, VERDICT r4 #6): the output is a
    per-bucket LAYOUT WITNESS rather than the echoed input. Rows route
    on a content-derived md5 bucket (the repo's md5_bucket convention,
    so DuckDB can recompute membership — Spark's own hash partitioning
    cannot be mirrored in SQL), get sorted within partitions by
    (bucket, l_orderkey, l_linenumber), and a mapInPandas pass then
    walks each partition in PHYSICAL row order, carrying the running
    last-seen key across Arrow batches, and emits per bucket: row
    count, key min/max, and whether the rows were truly encountered in
    sorted order. Equal bucket keys land in exactly one partition, so
    per-bucket witnesses need no cross-partition merge. The oracle
    recomputes count/min/max per bucket and asserts is_sorted — a
    false flag (e.g. sortWithinPartitions dropped, or batches
    re-ordered) hash-mismatches instead of passing silently."""
    from ..operators.trainprep import md5_bucket

    lineitem = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber"
    )
    bucketed = (
        lineitem.withColumn(
            "bucket",
            md5_bucket(F.col("l_orderkey").cast("string"), "pt|", 8).cast(
                "int"
            ),
        )
        .repartition(8, "bucket")
        .sortWithinPartitions("bucket", "l_orderkey", "l_linenumber")
    )

    def _witness(batches):
        import pandas as pd

        stats: dict[int, list] = {}
        last_key = None
        sorted_ok = True
        for pdf in batches:
            if pdf.empty:
                continue
            keys = list(
                zip(pdf["bucket"], pdf["l_orderkey"], pdf["l_linenumber"])
            )
            if last_key is not None and keys and keys[0] < last_key:
                sorted_ok = False
            for a, b in zip(keys, keys[1:]):
                if b < a:
                    sorted_ok = False
                    break
            last_key = keys[-1]
            grp = pdf.groupby("bucket")["l_orderkey"]
            for bkt, (n, mn, mx) in (
                grp.agg(["count", "min", "max"]).iterrows()
            ):
                cur = stats.setdefault(int(bkt), [0, mn, mx])
                cur[0] += int(n)
                cur[1] = min(cur[1], mn)
                cur[2] = max(cur[2], mx)
        yield pd.DataFrame(
            {
                "bucket": list(stats),
                "n_rows": [v[0] for v in stats.values()],
                "min_orderkey": [v[1] for v in stats.values()],
                "max_orderkey": [v[2] for v in stats.values()],
                "is_sorted": [sorted_ok] * len(stats),
            }
        ).astype(
            {
                "bucket": "int32",
                "n_rows": "int64",
                "min_orderkey": "int64",
                "max_orderkey": "int64",
            }
        )

    return bucketed.mapInPandas(
        _witness,
        "bucket int, n_rows bigint, min_orderkey bigint, "
        "max_orderkey bigint, is_sorted boolean",
    )


@query(
    "set_union_by_name",
    survey_id="SET-1",
    oracle="""
        SELECT COUNT(*)               AS n_rows,
               COUNT(l_quantity)      AS n_qty,
               COUNT(l_extendedprice) AS n_price
        FROM (
            SELECT l_orderkey, l_quantity, NULL::DOUBLE AS l_extendedprice FROM lineitem
            UNION ALL
            SELECT l_orderkey, NULL::DOUBLE AS l_quantity, l_extendedprice FROM lineitem
        )
    """,
)
def set_union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    """unionByName with allowMissingColumns — schema-drift-tolerant append
    (the reference's multi-survey batch union: later batches add columns)."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    batch_a = lineitem.select("l_orderkey", "l_quantity")
    batch_b = lineitem.select("l_orderkey", "l_extendedprice")
    return batch_a.unionByName(batch_b, allowMissingColumns=True).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("l_quantity").alias("n_qty"),
        F.count("l_extendedprice").alias("n_price"),
    )


@query(
    "set_intersect",
    survey_id="SET-2",
    oracle="""
        SELECT DISTINCT user_id FROM events WHERE event_type = 'click'
        INTERSECT
        SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'
    """,
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set intersect: users who both clicked and purchased."""
    events = load_table(spark, sf_dir, "events")
    clickers = events.filter(F.col("event_type") == "click").select("user_id")
    buyers = events.filter(F.col("event_type") == "purchase").select("user_id")
    return clickers.intersect(buyers)


@query(
    "set_except_distinct",
    survey_id="SET-3",
    oracle="""
        SELECT DISTINCT user_id FROM events
        EXCEPT
        SELECT DISTINCT user_id FROM events
        WHERE event_type = 'purchase' AND value > 150
    """,
)
def set_except_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set difference + distinct: users who never made a high-value
    purchase (threshold chosen so both sides are non-empty at every sf)."""
    events = load_table(spark, sf_dir, "events")
    all_users = events.select("user_id").distinct()
    big_buyers = (
        events.filter((F.col("event_type") == "purchase") & (F.col("value") > 150))
        .select("user_id")
        .distinct()
    )
    return all_users.exceptAll(big_buyers)


@query(
    "set_intersect_all",
    survey_id="SET-2",
    oracle="""
        SELECT user_id FROM (
            SELECT user_id FROM events WHERE event_type = 'click'
        ) INTERSECT ALL
        SELECT user_id FROM (
            SELECT user_id FROM events WHERE event_type = 'purchase'
        )
    """,
)
def set_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL — multiset semantics: a user appears min(#clicks,
    #purchases) times, not once. The bag-vs-set distinction matters when
    the multiplicity IS the signal (e.g. per-interaction sampling weight);
    both engines implement it as a per-key min of the two counts, so the
    shuffle still carries counts, never row duplicates."""
    events = load_table(spark, sf_dir, "events")
    clickers = events.filter(F.col("event_type") == "click").select("user_id")
    buyers = events.filter(F.col("event_type") == "purchase").select("user_id")
    return clickers.intersectAll(buyers)


@query(
    "set_except_all",
    survey_id="SET-3",
    oracle="""
        SELECT user_id FROM (
            SELECT user_id FROM events WHERE event_type = 'view'
        ) EXCEPT ALL
        SELECT user_id FROM (
            SELECT user_id FROM events WHERE event_type = 'purchase'
        )
    """,
)
def set_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL — multiset difference: each user keeps
    max(0, #views − #purchases) occurrences (the 'unconverted view
    events' bag). Same count-based execution as INTERSECT ALL — the
    multiplicities are computed per key, never materialized as
    duplicated rows mid-plan."""
    events = load_table(spark, sf_dir, "events")
    viewers = events.filter(F.col("event_type") == "view").select("user_id")
    buyers = events.filter(F.col("event_type") == "purchase").select("user_id")
    return viewers.exceptAll(buyers)


@query(
    "srt_nulls_ordering",
    survey_id="SRT-1",
    oracle="""
        SELECT o_orderkey,
               CASE WHEN o_orderstatus = 'P' THEN NULL
                    ELSE ROUND(o_totalprice, 2) END AS price_or_null
        FROM orders
        ORDER BY price_or_null DESC NULLS LAST, o_orderkey
        LIMIT 100
    """,
)
def srt_nulls_ordering(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit NULL placement in sorts: nullable measure sorted DESC with
    NULLS LAST (+ unique tiebreak) — engines DISAGREE by default on where
    nulls sort (Spark: nulls first on asc; DuckDB: nulls last), so
    portable pipelines must always state it. Plans as TakeOrderedAndProject
    like any top-k."""
    orders = load_table(spark, sf_dir, "orders")
    price_or_null = F.when(
        F.col("o_orderstatus") == "P", F.lit(None).cast("double")
    ).otherwise(F.round("o_totalprice", 2))
    return (
        orders.select("o_orderkey", price_or_null.alias("price_or_null"))
        .orderBy(
            F.col("price_or_null").desc_nulls_last(), F.col("o_orderkey")
        )
        .limit(100)
    )
