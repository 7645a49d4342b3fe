"""Query/oracle registry backing the driver contract (``__spark_entry__``).

Every operator from SURVEY.md §2 registers here as a named query callable
``(spark, sf_dir) -> DataFrame`` plus (where SQL-expressible) a DuckDB
oracle SQL string. The driver compares both sides by row-count + schema +
order-insensitive value-hash, so registered queries must follow the
canonicalization discipline of SURVEY.md §5.3 (alias every computed column,
round float aggregates, µs timestamps, total-order tiebreaks for window /
limit queries).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None
    survey_id: str  # SURVEY.md §2 row, e.g. "AG-1"
    doc: str = field(default="")


QUERIES: dict[str, QuerySpec] = {}


def query(name: str, survey_id: str, oracle: str | None = None):
    """Decorator: register a (spark, sf_dir) -> DataFrame query.

    ``oracle`` is the equivalent DuckDB ANSI SQL over the pre-registered
    views (region nation customer supplier part orders lineitem events
    documents embeddings); None → driver records a rows-only check.
    """

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = QuerySpec(
            name=name, fn=fn, oracle=oracle, survey_id=survey_id, doc=fn.__doc__ or ""
        )
        return fn

    return deco


def all_queries() -> dict[str, QueryFn]:
    from . import catalog  # noqa: F401  (imports register everything)

    return {name: spec.fn for name, spec in QUERIES.items()}


def all_oracles() -> dict[str, str]:
    from . import catalog  # noqa: F401

    return {
        name: spec.oracle for name, spec in QUERIES.items() if spec.oracle is not None
    }
