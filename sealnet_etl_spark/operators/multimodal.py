"""Multimodal column handling (SURVEY.md §2.10 LLM-10, SRC-4).

Images/audio/video are opaque ``binary`` columns with typed metadata
columns beside them. The Spark-side plumbing — binaryFile ingest, schema,
partition-sized Arrow batches into Python, feature-row output schema — is
real and tested; the actual media decode is stubbed behind
``decode_image`` (no imaging libraries in this container), exactly where
a PIL/libvips/ffmpeg call would slot in on a real cluster.

Scale notes: binary payloads ride the normal columnar path (parquet
BYTE_ARRAY); keep per-file payloads under a few hundred MB so a row fits
an Arrow batch, and repartition by size before the decode stage so one
executor core handles a bounded byte volume per task.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..registry import query


def decode_image(content: bytes) -> object:
    """Stub for the real image decode (PIL.Image.open / cv2.imdecode).

    The container ships no imaging libraries; on a real deployment this
    returns a decoded array for feature extraction. Everything AROUND this
    call (Arrow batching, schema, partitioning) is real and exercised.
    """
    raise NotImplementedError(
        "image decode requires an imaging library not present in this "
        "environment; byte-level features below are the deterministic stand-in"
    )


FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("file_name", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("head_hex", T.StringType()),
        T.StructField("mean_byte", T.DoubleType()),
        T.StructField("n_zero_bytes", T.LongType()),
    ]
)


def extract_byte_features(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """mapInPandas featurizer over (path, content) Arrow batches: computes
    deterministic byte-level features per file — the stand-in for a real
    decode→resize→embed stage with the identical batch shape."""
    for pdf in batches:
        rows = []
        for path, content in zip(pdf["path"], pdf["content"]):
            data = bytes(content)
            rows.append(
                {
                    "file_name": path.rsplit("/", 1)[-1],
                    "n_bytes": len(data),
                    "head_hex": data[:8].hex(),
                    "mean_byte": (sum(data[:4096]) / min(len(data), 4096)) if data else 0.0,
                    "n_zero_bytes": data[:4096].count(0),
                }
            )
        yield pd.DataFrame(rows, columns=[f.name for f in FEATURE_SCHEMA.fields])


@query("llm_multimodal_features", survey_id="LLM-10", oracle=None)
def llm_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-file ingest → Arrow-batched Python feature extraction
    (mapInPandas) over the testdata parquet files as stand-in media blobs.
    Rows-only check (byte contents aren't SQL-comparable); schema and
    determinism are asserted in tests."""
    files = spark.read.format("binaryFile").load(f"{sf_dir}/*.parquet")
    return files.select("path", "content").mapInPandas(
        extract_byte_features, FEATURE_SCHEMA
    )
