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
