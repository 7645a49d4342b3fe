"""UDF / UDAF / UDTF surface (SURVEY.md §2.12, UDF-1..UDF-6).

Every entry is Arrow-vectorized (pandas batches), never row-at-a-time
Python — the 10-100× rule (SURVEY §0.4). These exist to prove the escape
hatch works; graded relational paths elsewhere stay 100% JVM-side.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf, udtf

from ..registry import query
from ..sources import load_table


@pandas_udf(T.DoubleType())
def log1p_value(v: pd.Series) -> pd.Series:
    """UDF-1: vectorized scalar pandas UDF (numpy on Arrow batches)."""
    return np.log1p(v)


@query(
    "udf_vectorized_scalar",
    survey_id="UDF-1",
    oracle="""
        SELECT event_id, ROUND(ln(1 + value), 6) AS log1p_value
        FROM events
    """,
)
def udf_vectorized_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar pandas UDF: log1p over the value column, one Arrow batch per
    partition chunk — compare-checked against the SQL reformulation."""
    events = load_table(spark, sf_dir, "events")
    return events.select(
        "event_id", F.round(log1p_value("value"), 6).alias("log1p_value")
    )


@pandas_udf(T.DoubleType())
def geometric_mean(v: pd.Series) -> float:
    """UDF-2: grouped-agg pandas UDF (series → scalar per group)."""
    return float(np.exp(np.log(v).mean()))


@query(
    "udf_grouped_agg",
    survey_id="UDF-2",
    oracle="""
        SELECT event_type, ROUND(exp(avg(ln(value))), 6) AS geo_mean
        FROM events GROUP BY event_type
    """,
)
def udf_grouped_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom aggregate (geometric mean) as a GROUPED_AGG pandas UDF —
    the oracle is the exp(avg(ln)) identity."""
    events = load_table(spark, sf_dir, "events")
    return events.groupBy("event_type").agg(
        F.round(geometric_mean("value"), 6).alias("geo_mean")
    )


ZSCORE_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("z_value", T.DoubleType()),
    ]
)


def _zscore_group(pdf: pd.DataFrame) -> pd.DataFrame:
    """UDF-3: per-group pandas transform (z-score within event_type);
    ddof=1 matches SQL stddev_samp."""
    z = (pdf["value"] - pdf["value"].mean()) / pdf["value"].std(ddof=1)
    return pd.DataFrame(
        {
            "event_id": pdf["event_id"],
            "event_type": pdf["event_type"],
            "z_value": z.round(6),
        }
    )


@query(
    "udf_grouped_map",
    survey_id="UDF-3",
    oracle="""
        SELECT event_id, event_type,
               ROUND((value - AVG(value) OVER (PARTITION BY event_type))
                     / stddev_samp(value) OVER (PARTITION BY event_type), 6)
                   AS z_value
        FROM events
    """,
)
def udf_grouped_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """applyInPandas grouped-map: whole group as one pandas frame, z-score
    normalize — oracle is the window-function reformulation."""
    events = load_table(spark, sf_dir, "events")
    return events.groupBy("event_type").applyInPandas(_zscore_group, ZSCORE_SCHEMA)


MAPINPANDAS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("value_scaled", T.DoubleType()),
    ]
)


def _scale_batches(batches):
    """UDF-4: whole-partition iterator transform — state can persist across
    batches of one partition (model handles, encoders); here a pure scale."""
    for pdf in batches:
        yield pd.DataFrame(
            {"event_id": pdf["event_id"], "value_scaled": pdf["value"] * 2.0}
        )


@query(
    "udf_map_in_pandas",
    survey_id="UDF-4",
    oracle="SELECT event_id, value * 2.0 AS value_scaled FROM events",
)
def udf_map_in_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInPandas batch featurizer (exact ×2 keeps the oracle trivial;
    the shape is the batch-inference harness of LLM-10)."""
    events = load_table(spark, sf_dir, "events")
    return events.select("event_id", "value").mapInPandas(
        _scale_batches, MAPINPANDAS_SCHEMA
    )


@udtf(
    returnType=T.StructType(
        [
            T.StructField("shingle", T.StringType()),
            T.StructField("pos", T.IntegerType()),
        ]
    )
)
class ShingleGenerator:
    """UDF-5: Python UDTF — explode-with-logic table function emitting
    word k-shingles with positions (the shingle generator of LLM-2 as a
    SQL-callable lateral table function)."""

    def eval(self, text: str, k: int):
        if text is None:  # null docs expand to zero shingles, not a crash
            return
        words = text.lower().split()
        for i in range(len(words) - k + 1):
            yield " ".join(words[i : i + k]), i


@query(
    "udf_python_udtf",
    survey_id="UDF-5",
    oracle=r"""
        SELECT doc_id,
               array_to_string(w[i+1:i+6], ' ') AS shingle,
               i                                AS pos
        FROM (
            SELECT doc_id, string_split_regex(lower(text), '\s+') AS w,
                   unnest(range(len(string_split_regex(lower(text), '\s+')) - 5)) AS i
            FROM documents
            WHERE doc_id < 50 AND len(string_split_regex(lower(text), '\s+')) >= 6
        )
    """,
)
def udf_python_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UDTF via SQL LATERAL join: every doc row expands through the
    registered table function (the oracle is the unnest reformulation)."""
    spark.udtf.register("shingle_gen", ShingleGenerator)
    load_table(spark, sf_dir, "documents").createOrReplaceTempView("documents_v")
    return spark.sql(
        """
        SELECT d.doc_id, s.shingle, s.pos
        FROM documents_v d, LATERAL shingle_gen(d.text, 6) s
        WHERE d.doc_id < 50
        """
    )


@query(
    "udf_sql_registration",
    survey_id="UDF-6",
    oracle="""
        SELECT event_id, ROUND(ln(1 + value), 6) AS log1p_value
        FROM events WHERE event_type = 'purchase'
    """,
)
def udf_sql_registration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Register the pandas UDF for SQL entry and call it from a SQL string —
    both dialects hit the same Arrow-vectorized implementation."""
    spark.udf.register("log1p_value_sql", log1p_value)
    load_table(spark, sf_dir, "events").createOrReplaceTempView("events_v")
    return spark.sql(
        """
        SELECT event_id, ROUND(log1p_value_sql(value), 6) AS log1p_value
        FROM events_v WHERE event_type = 'purchase'
        """
    )


INFER_WEIGHT_MOD = 1_000_000


@query(
    "udf_model_batch_inference",
    survey_id="UDF-4/LLM-9",
    oracle=rf"""
        WITH toks AS (
            SELECT doc_id,
                   unnest(string_split_regex(lower(text), '\s+')) AS w
            FROM documents
        )
        SELECT doc_id,
               (SUM(('0x' || substring(md5('w|' || w), 1, 8))::BIGINT
                    % {INFER_WEIGHT_MOD}) // COUNT(*)) / {INFER_WEIGHT_MOD}.0
                   AS score,
               CAST(2 * SUM(('0x' || substring(md5('w|' || w), 1, 8))::BIGINT
                            % {INFER_WEIGHT_MOD})
                    >= COUNT(*) * {INFER_WEIGHT_MOD} AS INT) AS keep
        FROM toks WHERE w <> ''
        GROUP BY doc_id
    """,
)
def udf_model_batch_inference(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batched model inference over documents — the pattern every
    classifier-gated training pipeline runs (fastText quality filters,
    toxicity scorers, reward models): ``mapInPandas`` streams Arrow
    batches through a per-worker MODEL HANDLE that loads once and caches
    across batches, here a deterministic bag-of-words scorer standing in
    for the real weights file (no ML runtime in this container; the md5
    token weights make the stand-in exactly oracle-checkable, which an
    opaque model never is).

    The inference-serving mechanics are the real content: lazy one-time
    weight init per Python worker (not per batch, not per row), a
    token→weight cache that persists across batches (the embedding-table
    / tokenizer-vocab pattern), score + thresholded keep-decision per
    doc. The reported score is ENGINE-PROOF by construction: token
    weights live on the 1e-6 integer lattice, so the kernel keeps the
    per-doc sum in integer micro-units and reports
    ``(sum_micro // n_tokens) / 1e6`` — exact integer floor-division on
    both engines, then one identical IEEE division. A float
    ``ROUND(AVG(..), 6)`` here lands exactly on .xxxxxx5 half-boundaries
    (every weight is a 6-dp lattice point) where Spark and DuckDB
    rounding flip — the measured wn_bollinger_bands trap; the advisor
    caught doc_id 4689 at sf0.1 differing by 1e-6. The keep decision is
    the exact integer compare ``2*sum_micro >= n*1e6``, never a float
    threshold. Scale: Arrow batch size bounds worker memory
    (spark.sql.execution.arrow.maxRecordsPerBatch); the stage is
    map-only — scores land next to the doc ids with zero shuffle; at
    real-model sizes the handle loads from shared storage once per
    executor, exactly as here."""
    import re

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")

    def infer_batches(batches):
        import hashlib

        weights: dict[str, int] = {}  # lazy model state, lives across batches

        def weight_micro(token: str) -> int:
            w = weights.get(token)
            if w is None:
                h = int(hashlib.md5(f"w|{token}".encode()).hexdigest()[:8], 16)
                w = h % INFER_WEIGHT_MOD  # integer micro-units, exact
                weights[token] = w
            return w

        for pdf in batches:
            ids, scores, keeps = [], [], []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                # a null/empty/whitespace-only doc has no tokens: the oracle's
                # WHERE w <> '' GROUP BY drops it, so the kernel must too
                toks = (
                    [t for t in re.split(r"\s+", text.lower()) if t]
                    if text is not None
                    else []
                )
                if not toks:
                    continue
                sum_micro = sum(weight_micro(t) for t in toks)
                n = len(toks)
                ids.append(doc_id)
                # exact integer floor-div, then one IEEE division — both
                # engines produce the identical double bit pattern
                scores.append((sum_micro // n) / INFER_WEIGHT_MOD)
                keeps.append(int(2 * sum_micro >= n * INFER_WEIGHT_MOD))
            yield pd.DataFrame(
                {"doc_id": ids, "score": scores, "keep": keeps}
            ).astype({"doc_id": "int64", "score": "float64", "keep": "int32"})

    return docs.mapInPandas(
        infer_batches, "doc_id bigint, score double, keep int"
    )
