"""Source/sink operators (SURVEY.md §2.1, SRC-1..SRC-6).

The reference ingests dirty per-survey annotation CSVs and image files and
loads PostgreSQL; here every ingest path is a typed DataFrame reader with
explicit schema, quarantine semantics for bad rows, and deterministic
partitioned parquet sinks.

SRC-6 (JDBC sink) is design-only per SURVEY: the load step of the reference
maps to ``df.write.jdbc(url, table, properties)`` — same DataFrame, same
partitioned parallel writers; not graded because no database exists in the
test environment.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..registry import query
from .tables import load_table

#: Scratch area for sink round-trips (inside the repo; per-SF subdirs).
SCRATCH_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(__file__))), ".scratch")


def _scratch(sf_dir: str, name: str) -> str:
    tag = os.path.basename(os.path.normpath(sf_dir))
    return os.path.join(SCRATCH_DIR, tag, name)


@query(
    "src_parquet_scan",
    survey_id="SRC-1",
    oracle="SELECT r_regionkey, r_name FROM region",
)
def src_parquet_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed parquet scan, schema from the footer — identity check that the
    vectorized reader surfaces exactly what DuckDB sees."""
    return load_table(spark, sf_dir, "region").select("r_regionkey", "r_name")


CSV_SCHEMA = T.StructType(
    [
        T.StructField("c_custkey", T.LongType()),
        T.StructField("c_name", T.StringType()),
        T.StructField("c_mktsegment", T.StringType()),
        T.StructField("acctbal", T.DoubleType()),
        T.StructField("_corrupt", T.StringType()),
    ]
)


def read_csv_quarantine(spark: SparkSession, path: str) -> DataFrame:
    """Dirty-CSV ingest: explicit schema, PERMISSIVE mode, bad rows captured
    in ``_corrupt`` instead of silently dropped (the reference's per-survey
    annotation-CSV shape)."""
    return spark.read.csv(
        path,
        schema=CSV_SCHEMA,
        header=True,
        mode="PERMISSIVE",
        columnNameOfCorruptRecord="_corrupt",
    )


@query(
    "src_csv_ingest",
    survey_id="SRC-2",
    oracle="""
        SELECT c_custkey, c_name, c_mktsegment, ROUND(c_acctbal, 2) AS acctbal
        FROM customer
    """,
)
def src_csv_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV round-trip: customer → CSV files → schema-typed ingest. The
    oracle is the original parquet table, so the hash proves the text
    round-trip is lossless (2-decimal money survives exactly)."""
    path = _scratch(sf_dir, "customer_csv")
    customer = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_mktsegment", F.round("c_acctbal", 2).alias("acctbal")
    )
    customer.write.mode("overwrite").option("header", True).csv(path)
    # cache() materializes the parsed rows: Spark refuses plans whose pruned
    # column set is ONLY the corrupt-record column (e.g. a count() over this
    # query), per the documented UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD
    # restriction on raw CSV scans.
    parsed = read_csv_quarantine(spark, path).cache()
    return parsed.where(F.col("_corrupt").isNull()).select(
        "c_custkey", "c_name", "c_mktsegment", "acctbal"
    )


@query(
    "src_json_decode",
    survey_id="SRC-3",
    oracle="""
        SELECT event_id,
               CAST(json_extract(props, '$.k') AS INT) AS k,
               event_type
        FROM events
    """,
)
def src_json_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-string column → typed struct column (from_json with explicit
    schema) — the canonical semi-structured ingest path."""
    events = load_table(spark, sf_dir, "events")
    return events.select(
        "event_id",
        F.from_json("props", "k INT").getField("k").alias("k"),
        "event_type",
    )


@query(
    "src_binary_files",
    survey_id="SRC-4",
    oracle="""
        SELECT regexp_extract(filename, '([^/]+)\\.parquet$', 1)
                   AS table_name,
               CAST(size AS BIGINT) AS n_bytes,
               chr(('0x' || substring(hex(content), 1, 2))::INT)
                   || chr(('0x' || substring(hex(content), 3, 2))::INT)
                   || chr(('0x' || substring(hex(content), 5, 2))::INT)
                   || chr(('0x' || substring(hex(content), 7, 2))::INT)
                   AS magic
        FROM read_blob('/root/testdata/sf0.01/*.parquet')
    """,
)
def src_binary_files(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal/binary file source: files → (path, length, content:binary)
    rows with filename-derived metadata — the reference's imagery ingest
    (flight/camera/timestamp encoded in filenames). Hash-checked since
    round 4 via the read_blob technique (llm_multimodal_frame_sample's):
    DuckDB re-reads the same files' size and 4-byte magic (every parquet
    file leads with ASCII 'PAR1'), so the binaryFile scan's length and
    content head are value-certified, not merely counted. The oracle
    reads the graded sf0.01 directory; the Spark side honors sf_dir.
    LLM-10 builds on this."""
    files = spark.read.format("binaryFile").load(f"{sf_dir}/*.parquet")
    return files.select(
        F.regexp_extract(F.col("path"), r"([^/]+)\.parquet$", 1).alias("table_name"),
        F.col("length").alias("n_bytes"),
        F.substring(F.col("content"), 1, 4).cast("string").alias("magic"),
    )


@query(
    "src_parquet_sink_partitioned",
    survey_id="SRC-5",
    oracle="""
        SELECT l_returnflag, COUNT(*) AS n_rows, ROUND(SUM(l_quantity), 2) AS total_qty
        FROM lineitem GROUP BY l_returnflag
    """,
)
def src_parquet_sink_partitioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partitioned parquet sink + re-scan: write lineitem partitioned by
    l_returnflag, read it back, aggregate per partition value. Hash-matching
    the original table proves the write→read round trip loses nothing and
    partition values survive directory encoding. At scale this layout gives
    static partition pruning on the filter column for free."""
    path = _scratch(sf_dir, "lineitem_by_flag")
    lineitem = load_table(spark, sf_dir, "lineitem")
    written = lineitem.select("l_orderkey", "l_quantity", "l_returnflag")
    written.write.mode("overwrite").partitionBy("l_returnflag").parquet(path)
    # explicit schema: a zero-row write leaves no footers to infer from
    # (empty source partitions are routine at scale — must not error)
    return (
        spark.read.schema(written.schema).parquet(path)
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.round(F.sum("l_quantity"), 2).alias("total_qty"),
        )
    )


COMPACT_TARGET_BYTES = 16 * 1024 * 1024  # per-file target for the demo layout


@query(
    "src_compact_small_files",
    survey_id="SRC-5/ETL-6",
    oracle="""
        SELECT CAST(COUNT(*) AS BIGINT)      AS n_rows,
               CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
        FROM documents
    """,
)
def src_compact_small_files(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction — the operational chore every long-running
    100 TB lake needs: a fragmented landing directory (simulated here by
    writing documents as 64 splinter files) is rewritten into
    ceil(total_bytes / target) right-sized files. File count comes from
    the real on-disk layout, the target from measured input bytes — the
    same arithmetic a nightly compaction job runs. The result re-scans the
    COMPACTED copy and proves rows and keys survived the rewrite
    bit-for-bit (hash-checked against the source table), because a
    compaction that loses or duplicates rows is worse than the small
    files it fixes.

    Scale shape: one repartition shuffle sized by data volume (not a
    `coalesce(1)` driver bottleneck — coalesce would serialize the write
    through few tasks and skip the size-aware split)."""
    import glob
    import os as _os

    frag_path = _scratch(sf_dir, "documents_fragmented")
    compact_path = _scratch(sf_dir, "documents_compacted")
    docs = load_table(spark, sf_dir, "documents")
    docs.repartition(64).write.mode("overwrite").parquet(frag_path)
    frag_files = glob.glob(f"{frag_path}/part-*.parquet")
    total_bytes = sum(_os.path.getsize(f) for f in frag_files)
    n_target = max(1, -(-total_bytes // COMPACT_TARGET_BYTES))
    (
        spark.read.parquet(frag_path)
        .repartition(n_target)
        .write.mode("overwrite")
        .parquet(compact_path)
    )
    compacted = spark.read.parquet(compact_path)
    return compacted.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count_distinct("doc_id").alias("n_docs"),
    )


CLUSTER_EPOCH = "1995-01-01"
CLUSTER_BUCKET_DAYS = 90


@query(
    "src_clustered_layout",
    survey_id="SRC-5/SRT-3",
    oracle=f"""
        SELECT (date_diff('day', DATE '{CLUSTER_EPOCH}', l_shipdate::DATE)
                // {CLUSTER_BUCKET_DAYS})      AS ship_bucket,
               CAST(COUNT(*) AS BIGINT)        AS n_rows,
               MIN(l_shipdate::DATE)           AS min_ship,
               MAX(l_shipdate::DATE)           AS max_ship
        FROM lineitem
        GROUP BY 1
    """,
)
def src_clustered_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-skipping clustered layout: lineitem is rewritten clustered on
    ship date — fixed 90-day buckets become physical partitions
    (directory-level pruning) and rows inside each file are sorted by
    l_shipdate, so parquet row-group min/max stats are tight and a
    date-predicate scan skips everything else. The query re-scans the
    CLUSTERED copy and reports per-bucket row counts + min/max — the
    exact stats the optimizer's pruning would consult, hash-checked
    against the logical (layout-invariant) answer.

    Scale: explicit arithmetic buckets, not repartitionByRange — sampled
    range bounds drift run-to-run, content-derived buckets are stable
    under re-runs and incremental appends (append a new day → exactly one
    bucket's files rewritten). One shuffle on the bucket key, each bucket
    written by one task, sortWithinPartitions is a spillable local sort."""
    clustered_path = _scratch(sf_dir, "lineitem_clustered")
    li = load_table(spark, sf_dir, "lineitem")
    bucket = F.floor(
        F.datediff(F.to_date("l_shipdate"), F.lit(CLUSTER_EPOCH).cast("date"))
        / CLUSTER_BUCKET_DAYS
    )
    written = li.withColumn("ship_bucket", bucket)
    (
        written.repartition(F.col("ship_bucket"))
        .sortWithinPartitions("l_shipdate")
        .write.mode("overwrite")
        .partitionBy("ship_bucket")
        .parquet(clustered_path)
    )
    return (
        spark.read.schema(written.schema).parquet(clustered_path)
        .groupBy("ship_bucket")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min(F.to_date("l_shipdate")).alias("min_ship"),
            F.max(F.to_date("l_shipdate")).alias("max_ship"),
        )
        .select(
            F.col("ship_bucket").cast("bigint").alias("ship_bucket"),
            "n_rows",
            "min_ship",
            "max_ship",
        )
    )


ZORDER_GRID_BITS = 8  # each dim normalized to a 256-cell grid
ZORDER_BUCKET_SHIFT = 2 * ZORDER_GRID_BITS - 5  # top 5 z-bits → 32 buckets


def _zorder_oracle() -> str:
    """DuckDB mirror of the z-value arithmetic (integer-only, so both
    engines agree bit-for-bit)."""
    terms = " + ".join(
        f"((xg >> {i} & 1) << {2 * i}) + ((yg >> {i} & 1) << {2 * i + 1})"
        for i in range(ZORDER_GRID_BITS)
    )
    return f"""
        WITH bounds AS (
            SELECT MIN(o_custkey) AS xmin, MAX(o_custkey) AS xmax,
                   MIN(o_orderdate::DATE) AS dmin, MAX(o_orderdate::DATE) AS dmax
            FROM orders
        ), grid AS (
            SELECT o_orderkey, o_custkey, o_orderdate::DATE AS o_date,
                   ((o_custkey - xmin) * 256) // (xmax - xmin + 1) AS xg,
                   (date_diff('day', dmin, o_orderdate::DATE) * 256)
                       // (date_diff('day', dmin, dmax) + 1)        AS yg
            FROM orders, bounds
        )
        SELECT ({terms}) >> {ZORDER_BUCKET_SHIFT} AS z_bucket,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               MIN(o_custkey)           AS min_cust,
               MAX(o_custkey)           AS max_cust,
               MIN(o_date)              AS min_date,
               MAX(o_date)              AS max_date
        FROM grid
        GROUP BY 1
    """


@query("src_zorder_layout", survey_id="SRC-5/SRT-3", oracle=_zorder_oracle())
def src_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) multi-dimensional clustering — the OPTIMIZE
    ZORDER BY of lakehouse table formats, built from first principles:
    each dimension is normalized onto a 256-cell grid between its exact
    min/max, the two grid coordinates' bits are interleaved into a
    z-value, and the table is laid down bucketed+sorted by it. Unlike the
    single-dimension clustered layout (src_clustered_layout), EVERY
    bucket is narrow in BOTH customer and date — so file-level min/max
    stats prune scans filtered on either dimension (locality asserted in
    tests/test_trainprep.py). The query re-scans the written layout and
    reports per-bucket stats.

    Scale: the bounds pass is a 1-row exact aggregate (like the IVF
    centroid table, trivially collected); the z-value is pure integer
    codegen arithmetic; ONE shuffle on the bucket key writes the layout.
    Integer-only math (DIV, bit ops) keeps the oracle bit-identical."""
    zpath = _scratch(sf_dir, "orders_zorder")
    orders = load_table(spark, sf_dir, "orders")
    b = orders.agg(
        F.min("o_custkey").alias("xmin"),
        F.max("o_custkey").alias("xmax"),
        F.min(F.to_date("o_orderdate")).alias("dmin"),
        F.max(F.to_date("o_orderdate")).alias("dmax"),
    ).collect()[0]
    if b.xmax is None:
        # schema-only input: no bounds, no layout to write
        return spark.createDataFrame(
            [],
            "z_bucket bigint, n_rows bigint, min_cust bigint, "
            "max_cust bigint, min_date date, max_date date",
        )
    xspan = b.xmax - b.xmin + 1
    dspan = (b.dmax - b.dmin).days + 1
    xg = F.expr(f"CAST(((o_custkey - {b.xmin}) * 256) DIV {xspan} AS BIGINT)")
    yg = F.expr(
        f"CAST((datediff(to_date(o_orderdate), DATE '{b.dmin}') * 256) "
        f"DIV {dspan} AS BIGINT)"
    )
    z = None
    for i in range(ZORDER_GRID_BITS):
        term = F.shiftleft(F.shiftright(F.col("xg"), i).bitwiseAND(1), 2 * i) + (
            F.shiftleft(F.shiftright(F.col("yg"), i).bitwiseAND(1), 2 * i + 1)
        )
        z = term if z is None else z + term
    (
        orders.withColumn("xg", xg)
        .withColumn("yg", yg)
        .withColumn("z_bucket", F.shiftright(z, ZORDER_BUCKET_SHIFT))
        .repartition(F.col("z_bucket"))
        .sortWithinPartitions("xg", "yg")
        .write.mode("overwrite")
        .partitionBy("z_bucket")
        .parquet(zpath)
    )
    return (
        spark.read.parquet(zpath)
        .groupBy(F.col("z_bucket").cast("bigint").alias("z_bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("o_custkey").alias("min_cust"),
            F.max("o_custkey").alias("max_cust"),
            F.min(F.to_date("o_orderdate")).alias("min_date"),
            F.max(F.to_date("o_orderdate")).alias("max_date"),
        )
    )


EVOLUTION_CUTOFF_DOC = 250  # docs below = generation 1, rest = generation 2


@query(
    "src_schema_evolution",
    survey_id="SRC-1/ETL-1",
    oracle=f"""
        SELECT CASE WHEN doc_id < {EVOLUTION_CUTOFF_DOC} THEN 1 ELSE 2 END
                   AS generation,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(COUNT(CASE WHEN doc_id >= {EVOLUTION_CUTOFF_DOC}
                                THEN 1 END) AS BIGINT) AS n_with_quality,
               CAST(SUM(CASE WHEN doc_id >= {EVOLUTION_CUTOFF_DOC}
                             THEN n_chars % 100 END) AS BIGINT) AS sum_quality
        FROM documents
        GROUP BY 1
    """,
)
def src_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema evolution across parquet generations: generation 1 was
    written before a `quality` column existed; generation 2 carries it.
    A `mergeSchema` read unions the footers into one schema and
    null-fills the legacy rows — the additive-evolution contract every
    long-lived lake table depends on (new columns never break old
    readers or require rewriting history). The query re-scans the merged
    table and proves: both generations present, `quality` populated only
    where it was written, values intact.

    Scale: schema merging is a footer-only operation (one small task per
    file footer at planning time) — data files are untouched; the read
    itself remains a normal pruned columnar scan."""
    path = _scratch(sf_dir, "documents_evolving")
    import shutil as _shutil

    _shutil.rmtree(path, ignore_errors=True)
    docs = load_table(spark, sf_dir, "documents")
    gen1 = docs.filter(F.col("doc_id") < EVOLUTION_CUTOFF_DOC).select(
        "doc_id", "source", "n_chars"
    )
    gen2 = docs.filter(F.col("doc_id") >= EVOLUTION_CUTOFF_DOC).select(
        "doc_id",
        "source",
        "n_chars",
        (F.col("n_chars") % 100).alias("quality"),
    )
    gen1.write.mode("append").parquet(path)
    gen2.write.mode("append").parquet(path)
    merged = spark.read.option("mergeSchema", "true").parquet(path)
    return (
        merged.groupBy(
            F.when(F.col("doc_id") < EVOLUTION_CUTOFF_DOC, 1)
            .otherwise(2)
            .alias("generation")
        )
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.count("quality").alias("n_with_quality"),
            F.sum("quality").alias("sum_quality"),
        )
    )


@query(
    "src_orc_roundtrip",
    survey_id="SRC-1/SRC-5",
    oracle="""
        SELECT source,
               CAST(COUNT(*) AS BIGINT)     AS n_docs,
               CAST(SUM(n_chars) AS BIGINT) AS total_chars,
               CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs
        FROM documents
        GROUP BY source
    """,
)
def src_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second columnar format: the documents table round-trips through
    ORC (Spark-native, zstd-compressed) and is re-aggregated off the ORC
    copy — proving the engine isn't parquet-bound (ORC carries the same
    schema, stats and predicate-pushdown machinery; a reference user's
    ORC lake reads with a one-word change). The aggregate matching the
    parquet-derived oracle proves the round-trip is lossless.

    Scale: same columnar pruned-scan properties as parquet; the write is
    one narrow pass (no repartition needed for a like-for-like copy)."""
    path = _scratch(sf_dir, "documents_orc")
    docs = load_table(spark, sf_dir, "documents")
    docs.write.mode("overwrite").option("compression", "zstd").orc(path)
    return (
        spark.read.orc(path)
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.count_distinct("lang").alias("n_langs"),
        )
    )


@query(
    "src_jsonl_roundtrip",
    survey_id="SRC-1/SRC-3/SRC-5",
    oracle="""
        SELECT event_type,
               COUNT(*)                      AS n_events,
               ROUND(SUM(value), 2)          AS total_value,
               MIN(epoch_us(ts::TIMESTAMP))  AS first_ts_us,
               MAX(epoch_us(ts::TIMESTAMP))  AS last_ts_us
        FROM events
        GROUP BY event_type
    """,
)
def src_jsonl_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Line-delimited JSON as a real file format: events round-trip
    through gzipped JSONL and re-aggregate off the JSONL copy — the
    interchange format most ingestion partners actually deliver. The
    aggregate matching the parquet-derived oracle proves the trip is
    lossless.

    Two deliberate choices carry the 100 TB lesson: timestamps travel as
    integer microseconds (ts_us) because bare JSON has no timestamp type
    and string round-trips invite timezone drift; and the read-back pins
    an EXPLICIT schema — schema inference on JSON is a full extra pass
    over the data before the real one, the classic doubled-scan mistake
    at scale. gzip keeps the text format splittable-per-file; production
    layouts size files so per-file parallelism suffices."""
    path = _scratch(sf_dir, "events_jsonl")
    events = load_table(spark, sf_dir, "events")
    events.select(
        "event_id",
        F.unix_micros("ts").alias("ts_us"),
        "user_id",
        "event_type",
        "value",
        "props",
    ).write.mode("overwrite").option("compression", "gzip").json(path)
    back = spark.read.schema(
        "event_id bigint, ts_us bigint, user_id bigint, "
        "event_type string, value double, props string"
    ).json(path)
    return back.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 2).alias("total_value"),
        F.min("ts_us").alias("first_ts_us"),
        F.max("ts_us").alias("last_ts_us"),
    )


@query(
    "src_jdbc_roundtrip",
    survey_id="SRC-6",
    oracle="""
        SELECT n_regionkey,
               CAST(COUNT(*) AS BIGINT)  AS n_nations,
               MIN(n_name)               AS first_name
        FROM nation
        GROUP BY n_regionkey
    """,
)
def src_jdbc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JDBC sink + source (SRC-6, closed in round 4): write the nation
    dim through ``df.write.format("jdbc")`` into an embedded Derby
    database (the one JDBC driver Spark itself ships, so the path runs
    with zero extra jars), read it back through the JDBC source with a
    pushed-down filter, and aggregate — hash-matching the original table
    proves values, types, and strings survive the SQL round trip.

    The read side demonstrates the options that matter at scale even
    though the demo DB is tiny: Spark's JDBC source pushes filters and
    column pruning into the remote SQL (`pushDownPredicate`, on by
    default — the WHERE clause below executes in the database), and a
    production read of a LARGE table adds `partitionColumn` +
    `lowerBound`/`upperBound`/`numPartitions` so executors open parallel
    range-bounded cursors instead of one serial result set. The write
    side's production knobs are `batchsize` (rows per INSERT batch),
    `numPartitions` (parallel connections — size to what the RDBMS
    tolerates, not to the cluster), `isolationLevel`, and `truncate`
    (reuse the table on overwrite instead of DROP). Embedded Derby is a
    driver-local file DB, fine for local[n] where executors share the
    JVM; a real cluster points the url at a networked RDBMS reachable
    from every executor. The db path is keyed per sf_dir under scratch;
    mode("overwrite") keeps reruns idempotent."""
    db_path = _scratch(sf_dir, "jdbc_derby_db")
    url = f"jdbc:derby:{db_path};create=true"
    driver = "org.apache.derby.jdbc.EmbeddedDriver"
    nation = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    (
        nation.write.mode("overwrite")
        .format("jdbc")
        .option("url", url)
        .option("dbtable", "nation_rt")
        .option("driver", driver)
        .option("batchsize", 1000)
        .save()
    )
    back = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", "nation_rt")
        .option("driver", driver)
        .load()
        .filter(F.col("n_nationkey") >= 0)  # pushed into Derby's SQL
    )
    return back.groupBy("n_regionkey").agg(
        F.count(F.lit(1)).alias("n_nations"),
        F.min("n_name").alias("first_name"),
    )


MANIFEST_SHARDS = 4


@query(
    "src_parquet_manifest",
    survey_id="SRC-5/ETL-6",
    oracle=f"""
        SELECT doc_id % {MANIFEST_SHARDS}        AS shard,
               CAST(1 AS BIGINT)                 AS n_files,
               CAST(COUNT(*) AS BIGINT)          AS n_rows,
               MIN(doc_id)                       AS min_id,
               MAX(doc_id)                       AS max_id
        FROM documents
        GROUP BY shard
    """,
)
def src_parquet_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-manifest audit of a freshly written sharded dataset — the
    lake-ops check every publish step should run (Delta/Iceberg keep a
    manifest natively; on plain parquet you derive it from the files).
    Documents are written as one directory per ``doc_id % 4`` shard with
    the rows of each shard hash-routed into ONE task, then the manifest
    is derived from the REAL on-disk layout via the ``_metadata`` hidden
    column (file_path per row — Spark's file-source metadata, no driver
    filesystem walk): files per shard, rows, id bounds. Hash-matching
    the planned layout proves the writer produced exactly one file per
    shard with the right members — a publish that silently splits,
    duplicates, or drops a shard fails the audit.

    Scale shape: the write is one hash shuffle on the shard key; the
    audit is a scan of the written files aggregating (shard, file) —
    metadata-cheap because _metadata is populated per split, and the
    groupBy output is one row per shard. At real scale shards map to
    downstream consumers (one file per training-data reader)."""
    path = _scratch(sf_dir, "documents_manifest_shards")
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    sharded = docs.withColumn(
        "shard", F.pmod(F.col("doc_id"), F.lit(MANIFEST_SHARDS))
    )
    (
        sharded.repartition(MANIFEST_SHARDS, "shard")
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(path)
    )
    back = spark.read.schema("doc_id bigint, shard int").parquet(path).select(
        "doc_id", "shard", F.col("_metadata.file_path").alias("file_path")
    )
    return back.groupBy(F.col("shard").cast("bigint").alias("shard")).agg(
        F.countDistinct("file_path").alias("n_files"),
        F.count(F.lit(1)).alias("n_rows"),
        F.min("doc_id").alias("min_id"),
        F.max("doc_id").alias("max_id"),
    )


@query(
    "src_file_provenance",
    survey_id="SRC-1/ETL-6",
    oracle=r"""
        SELECT 'documents' AS table_name,
               regexp_extract(filename, '([^/]+)$', 1) AS file_name,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               MIN((SELECT CAST(b.size AS BIGINT) FROM
                read_blob('/root/testdata/sf0.01/documents.parquet') b
                WHERE b.filename = t.filename))
                   AS file_size,
               CAST(MIN(doc_id) AS BIGINT) AS min_key,
               CAST(MAX(doc_id) AS BIGINT) AS max_key
        FROM read_parquet('/root/testdata/sf0.01/documents.parquet',
                          filename=true) t
        GROUP BY 2
        UNION ALL
        SELECT 'orders', regexp_extract(filename, '([^/]+)$', 1),
               CAST(COUNT(*) AS BIGINT),
               MIN((SELECT CAST(b.size AS BIGINT) FROM
                read_blob('/root/testdata/sf0.01/orders.parquet') b
                WHERE b.filename = t.filename)),
               CAST(MIN(o_orderkey) AS BIGINT),
               CAST(MAX(o_orderkey) AS BIGINT)
        FROM read_parquet('/root/testdata/sf0.01/orders.parquet',
                          filename=true) t
        GROUP BY 2
        UNION ALL
        SELECT 'embeddings', regexp_extract(filename, '([^/]+)$', 1),
               CAST(COUNT(*) AS BIGINT),
               MIN((SELECT CAST(b.size AS BIGINT) FROM
                read_blob('/root/testdata/sf0.01/embeddings.parquet') b
                WHERE b.filename = t.filename)),
               CAST(MIN(vec_id) AS BIGINT),
               CAST(MAX(vec_id) AS BIGINT)
        FROM read_parquet('/root/testdata/sf0.01/embeddings.parquet',
                          filename=true) t
        GROUP BY 2
    """,
)
def src_file_provenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-row FILE LINEAGE via Spark's hidden ``_metadata`` scan column
    (file_path + file_size ride every parquet row for free — no
    input_file_name() UDF call, stays inside codegen): roll each table up
    to per-file (row count, byte size, key range). This is the takedown /
    audit primitive — 'which physical file holds doc X, and what else is
    in it' — answered from scan metadata alone, no manifest table to
    drift out of date.

    Oracle: DuckDB re-derives the same rollup with read_parquet(filename=
    true) and read_blob sizes over the graded sf0.01 directory (the
    multimodal read-only-path convention); the Spark side honors whatever
    sf_dir it is given. Scale: _metadata adds O(1) per scan task; the
    rollup is one partial agg keyed by file — at 100 TB this is the cheap
    first pass of any incident response, proportional to file COUNT, not
    bytes."""
    def one(name: str, key: str) -> DataFrame:
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        return (
            df.select(
                F.col(key).alias("k"),
                F.col("_metadata.file_path").alias("fp"),
                F.col("_metadata.file_size").alias("fsz"),
            )
            .groupBy("fp", "fsz")
            .agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.min("k").cast("long").alias("min_key"),
                F.max("k").cast("long").alias("max_key"),
            )
            .select(
                F.lit(name).alias("table_name"),
                F.regexp_extract("fp", r"([^/]+)$", 1).alias("file_name"),
                "n_rows",
                F.col("fsz").cast("long").alias("file_size"),
                "min_key",
                "max_key",
            )
        )

    return (
        one("documents", "doc_id")
        .unionByName(one("orders", "o_orderkey"))
        .unionByName(one("embeddings", "vec_id"))
    )
