"""sealnet-etl-spark: a PySpark-native analytics/ETL engine.

A from-scratch, Spark-first re-expression of the capabilities of the
reference ETL repo (``readicculus/sealnet-ETL``; see SURVEY.md §0 for
provenance — the reference mount was empty, so the operative spec is the
driver contract plus SURVEY.md §2's operator inventory).

Layout:
    session.py    engine SparkSession configuration (UTC, nanos flag, AQE, Arrow)
    registry.py   query/oracle registry that backs ``__spark_entry__``
    sources/      table loaders, CSV/JSON/binary ingest, parquet sinks
    operators/    relational + ETL + LLM-pipeline operators
    functions/    scalar function families (string/date/math/array/json/hash)
    plans/        flagship multi-operator query plans (TPC-H-shaped)
    streaming/    Structured Streaming pipelines + batch-equivalent forms
"""

__version__ = "0.1.0"


def __getattr__(name):  # noqa: D105 — lazy public API
    """Lazy re-exports of the composable operator layer.

    Imports are deferred so ``import sealnet_etl_spark`` stays cheap (no
    py4j / pandas import cost until an operator is touched) and so the
    registry's catalog import cannot cycle through this module.
    """
    from importlib import import_module

    home = {
        # session + IO
        "get_spark": ".session",
        "apply_runtime_confs": ".session",
        "load_table": ".sources.tables",
        "load_tables": ".sources.tables",
        "register_views": ".sources.tables",
        # relational building blocks
        "asof_join": ".operators.joins",
        # ETL compositions (the reference's own surface)
        "conform_schema": ".operators.etl",
        "validate_rules": ".operators.etl",
        "train_test_split": ".operators.etl",
        "latest_record": ".operators.etl",
        "incremental_merge": ".operators.etl",
        # dedup / similarity toolkit
        "connected_components": ".operators.dedup",
        "minhash_near_dup_pairs": ".operators.dedup",
        "jaccard": ".operators.dedup",
        "word_shingles": ".operators.dedup",
        "normalized_words": ".operators.dedup",
        "dot": ".operators.similarity",
        "l2_norm": ".operators.similarity",
        "cosine": ".operators.similarity",
        # graded surface
        "all_queries": ".registry",
        "all_oracles": ".registry",
    }
    if name in home:
        if name in ("all_queries", "all_oracles"):
            from . import catalog  # noqa: F401 — populate the registry first
        return getattr(import_module(home[name], __name__), name)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
