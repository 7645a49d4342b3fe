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


@query(
    "llm_multimodal_features",
    survey_id="LLM-10",
    oracle="""
        WITH blobs AS (
            SELECT regexp_extract(filename, '([^/]+)$', 1) AS file_name,
                   size, lower(hex(content)) AS h
            FROM read_blob('/root/testdata/sf0.01/*.parquet')
        ), bytes AS (
            SELECT file_name, size, h,
                   list_transform(range(least(size, 4096)),
                       i -> ('0x' || substring(h, 1 + i * 2, 2))::INT) AS head
            FROM blobs
        )
        SELECT file_name,
               CAST(size AS BIGINT) AS n_bytes,
               substring(h, 1, 16) AS head_hex,
               CASE WHEN size = 0 THEN 0.0
                    ELSE list_sum(head)::DOUBLE / least(size, 4096)
               END AS mean_byte,
               CAST(len(list_filter(head, v -> v = 0)) AS BIGINT)
                   AS n_zero_bytes
        FROM bytes
    """,
)
def llm_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-file ingest → Arrow-batched Python feature extraction
    (mapInPandas) over the testdata parquet files as stand-in media blobs.

    Hash-checked since round 4 via the read_blob technique proven on
    llm_multimodal_frame_sample: every byte-level feature (n_bytes,
    head_hex, mean of the first 4096 bytes, zero-byte count) is
    recomputed in DuckDB over hex(content) slices, so the whole
    binaryFile → Arrow → kernel → schema path is certified
    byte-for-byte. mean_byte stays engine-proof because both engines
    divide the identical integer sum by the identical integer count —
    one IEEE division, no rounding. The oracle reads the graded sf0.01
    directory (the driver's t2 scale); the Spark side honors whatever
    sf_dir it is given. Determinism is additionally asserted in tests."""
    files = spark.read.format("binaryFile").load(f"{sf_dir}/*.parquet")
    return files.select("path", "content").mapInPandas(
        extract_byte_features, FEATURE_SCHEMA
    )


FRAME_N = 4
FRAME_BYTES = 1024

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("file_name", T.StringType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame_off", T.LongType()),
        T.StructField("frame_md5", T.StringType()),
    ]
)


def sample_frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas frame sampler over (path, content) batches: FRAME_N
    fixed-stride byte windows per blob — the exact batch shape of a video
    frame-sample → per-frame-embed stage, with a deterministic fingerprint
    (md5 of the window's lowercase hex) standing in for the decoded frame.
    One output row per (file, frame); memory is bounded by FRAME_BYTES ×
    batch rows, not by blob size."""
    import hashlib

    for pdf in batches:
        rows = []
        for path, content in zip(pdf["path"], pdf["content"]):
            data = bytes(content)
            stride = len(data) // FRAME_N
            for i in range(FRAME_N):
                off = i * stride
                window = data[off : off + min(FRAME_BYTES, len(data) - off)]
                rows.append(
                    {
                        "file_name": path.rsplit("/", 1)[-1],
                        "frame_idx": i,
                        "frame_off": off,
                        "frame_md5": hashlib.md5(
                            window.hex().lower().encode()
                        ).hexdigest(),
                    }
                )
        yield pd.DataFrame(rows, columns=[f.name for f in FRAME_SCHEMA.fields])


@query(
    "llm_multimodal_frame_sample",
    survey_id="LLM-10/SRC-4",
    oracle=f"""
        WITH blobs AS (
            SELECT regexp_extract(filename, '([^/]+)$', 1) AS file_name,
                   size, lower(hex(content)) AS h
            FROM read_blob('/root/testdata/sf0.01/*.parquet')
        )
        SELECT file_name,
               CAST(i.i AS INT)                          AS frame_idx,
               CAST(i.i * (size // {FRAME_N}) AS BIGINT) AS frame_off,
               md5(substring(h, 1 + i.i * (size // {FRAME_N}) * 2,
                             2 * least({FRAME_BYTES},
                                       size - i.i * (size // {FRAME_N}))))
                                                         AS frame_md5
        FROM blobs CROSS JOIN (SELECT unnest(range({FRAME_N})) AS i) i
    """,
)
def llm_multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling over binary media columns: binaryFile ingest →
    mapInPandas → one row per (file, fixed-stride frame) with a
    deterministic window fingerprint. This is the HASH-CHECKED multimodal
    path (vs the rows-only featurizer above): the DuckDB oracle recomputes
    the same windows via read_blob + hex slicing, proving the Spark-side
    plumbing (ingest, Arrow batching, explode-shaped output, schema)
    byte-for-byte. The oracle reads the graded sf0.01 directory — the
    driver's t2 correctness scale (SURVEY.md §0.2); the Spark side honors
    whatever sf_dir it is given.

    Scale note: a real video pipeline swaps the fingerprint for
    decode-at-offset (pyav/ffmpeg seek); the per-row output keeps frames
    independent so downstream per-frame embedding parallelizes freely,
    and FRAME_BYTES bounds worker memory regardless of blob size.
    """
    files = spark.read.format("binaryFile").load(f"{sf_dir}/*.parquet")
    return files.select("path", "content").mapInPandas(sample_frames, FRAME_SCHEMA)


@query(
    "llm_multimodal_exact_dedup",
    survey_id="LLM-10/LLM-1",
    oracle=r"""
        WITH f AS MATERIALIZED (
            SELECT regexp_extract(filename, '([^/]+)$', 1) AS file_name,
                   md5(lower(hex(content))) AS content_md5,
                   CAST(size AS BIGINT) AS n_bytes
            FROM read_blob('/root/testdata/sf0.01/*.parquet')
        ), bth AS MATERIALIZED (
            SELECT *, 'a' AS ingest_tag FROM f
            UNION ALL
            SELECT *, 'b' AS ingest_tag FROM f
        ), stats AS (
            SELECT content_md5, CAST(COUNT(*) AS BIGINT) AS n_copies,
                   MIN(ingest_tag || '|' || file_name) AS canon
            FROM bth GROUP BY 1
        )
        SELECT b.file_name, b.ingest_tag, b.content_md5, b.n_bytes,
               s.n_copies,
               (b.ingest_tag || '|' || b.file_name) = s.canon AS is_canonical
        FROM bth b JOIN stats s USING (content_md5)
    """,
)
def llm_multimodal_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup of BINARY blobs by content hash — the image-corpus twin
    of llm_exact_dedup: a re-ingested mirror ('a'/'b' tags over the same
    binaryFile scan) stands in for a re-crawl that re-delivered identical
    bytes, and every blob resolves to one canonical copy (min (tag, name))
    plus its copy count.

    The content key is md5 over the lowercase hex of the bytes (DuckDB's
    md5 is VARCHAR-only, so both engines hash the identical hex text —
    the digest never leaves the executor/oracle as raw binary). Oracle
    reads the graded sf0.01 directory, the llm_multimodal_features
    convention; the Spark side honors whatever sf_dir it is given.

    Scale shape: hashing rides the binaryFile scan (map-side, content
    never shuffles — only 32-char digests and names reach the exchange);
    the per-digest stats table is one partial-agg shuffle of digests and
    joins back broadcast. At 100 TB of imagery this is THE first dedup
    pass (cheap, exact) before any perceptual/embedding near-dup stage."""
    files = spark.read.format("binaryFile").load(f"{sf_dir}/*.parquet")
    base = files.select(
        F.regexp_extract(F.col("path"), r"([^/]+)$", 1).alias("file_name"),
        F.md5(F.lower(F.hex(F.col("content")))).alias("content_md5"),
        F.col("length").alias("n_bytes"),
    ).persist()  # digests only — without this, the mirror tags and the
    # stats side would each re-read and re-hash every blob (review
    # finding: the "one scan" claim requires materializing the digests)
    both = base.withColumn("ingest_tag", F.lit("a")).unionByName(
        base.withColumn("ingest_tag", F.lit("b"))
    )
    stats = both.groupBy("content_md5").agg(
        F.count(F.lit(1)).alias("n_copies"),
        F.min(F.concat_ws("|", "ingest_tag", "file_name")).alias("__canon"),
    )
    return both.join(F.broadcast(stats), "content_md5").select(
        "file_name",
        "ingest_tag",
        "content_md5",
        "n_bytes",
        "n_copies",
        (
            F.concat_ws("|", "ingest_tag", "file_name") == F.col("__canon")
        ).alias("is_canonical"),
    )
