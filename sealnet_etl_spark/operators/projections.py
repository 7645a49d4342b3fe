"""Projections, filters, predicates, casts (SURVEY.md §2.2, PF-1..PF-5).

All predicates here are sargable built-in expressions, so Catalyst pushes
them into the parquet scan (PushedFilters) and prunes columns (ReadSchema)
— at 100 TB that's the difference between scanning terabytes and scanning
the row groups that survive min/max skipping.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..sources import load_table


@query(
    "pf_project_derive",
    survey_id="PF-1",
    oracle="""
        SELECT l_orderkey, l_linenumber,
               ROUND(l_extendedprice * (1 - l_discount), 4) AS net_price,
               ROUND(l_extendedprice * l_tax, 4)            AS tax_amount,
               l_quantity
        FROM lineitem
    """,
)
def pf_project_derive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column select + arithmetic derivation (narrow, no shuffle).

    Per-row products of 2-decimal inputs are rounded at 4 decimals — their
    exact decimal content — because a product like 74721.525 sits exactly on
    a 2-decimal rounding boundary where Spark (HALF_UP on decimal repr) and
    DuckDB (nearest-double) disagree. Rounding at the exact precision is
    boundary-free on both engines (SURVEY.md §5.3 discipline, sharpened).
    """
    lineitem = load_table(spark, sf_dir, "lineitem")
    return lineitem.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias(
            "net_price"
        ),
        F.round(F.col("l_extendedprice") * F.col("l_tax"), 4).alias("tax_amount"),
        "l_quantity",
    )


@query(
    "pf_filter_predicates",
    survey_id="PF-2",
    oracle="""
        SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag, l_discount
        FROM lineitem
        WHERE l_quantity BETWEEN 10 AND 20
          AND l_returnflag IN ('R', 'A')
          AND l_discount > 0.05
          AND l_shipdate >= TIMESTAMP '1996-01-01'
    """,
)
def pf_filter_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conjunctive range / IN / comparison predicates — all pushed to scan."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    return lineitem.filter(
        F.col("l_quantity").between(10, 20)
        & F.col("l_returnflag").isin("R", "A")
        & (F.col("l_discount") > 0.05)
        & (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
    ).select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag", "l_discount")


@query(
    "pf_regex_extract",
    survey_id="PF-3",
    oracle=r"""
        SELECT c_custkey,
               CAST(regexp_extract(c_name, 'Customer#(\d+)', 1) AS BIGINT) AS name_id,
               c_mktsegment
        FROM customer
        WHERE regexp_matches(c_name, '^Customer#')
    """,
)
def pf_regex_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex extract + match filter (the reference's filename→fields parsing
    shape: structured identifiers encoded in strings)."""
    customer = load_table(spark, sf_dir, "customer")
    return customer.filter(F.col("c_name").rlike("^Customer#")).select(
        "c_custkey",
        F.regexp_extract("c_name", r"Customer#(\d+)", 1).cast("bigint").alias("name_id"),
        "c_mktsegment",
    )


@query(
    "pf_null_normalize",
    survey_id="PF-4",
    oracle="""
        SELECT l_orderkey, l_linenumber,
               COALESCE(NULLIF(l_returnflag, 'N'), 'NONE')                         AS flag_norm,
               COALESCE(CASE WHEN l_discount < 0.01 THEN NULL ELSE l_discount END,
                        -1.0)                                                      AS disc_norm
        FROM lineitem
    """,
)
def pf_null_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null handling: nullif / coalesce / na.fill (CSV-cleaning shape)."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    return (
        lineitem.select(
            "l_orderkey",
            "l_linenumber",
            F.coalesce(F.nullif(F.col("l_returnflag"), F.lit("N")), F.lit("NONE")).alias(
                "flag_norm"
            ),
            F.when(F.col("l_discount") < 0.01, None)
            .otherwise(F.col("l_discount"))
            .alias("disc_norm"),
        )
        .na.fill({"disc_norm": -1.0})
    )


@query(
    "pf_type_casts",
    survey_id="PF-5",
    oracle="""
        SELECT CAST(o_orderkey AS VARCHAR)               AS okey_str,
               CAST(FLOOR(o_totalprice) AS BIGINT)       AS price_floor,
               CAST(strftime(o_orderdate, '%Y') AS INT)  AS order_year,
               strptime(strftime(o_orderdate, '%Y-%m-%d'), '%Y-%m-%d') AS date_roundtrip
        FROM orders
    """,
)
def pf_type_casts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type casts: num→str, double→int (explicit floor — Spark CAST truncates
    while DuckDB CAST rounds, so the graded form floors on both sides),
    ts→str→ts roundtrip."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.select(
        F.col("o_orderkey").cast("string").alias("okey_str"),
        F.floor("o_totalprice").cast("bigint").alias("price_floor"),
        F.date_format("o_orderdate", "yyyy").cast("int").alias("order_year"),
        F.to_timestamp(F.date_format("o_orderdate", "yyyy-MM-dd")).alias(
            "date_roundtrip"
        ),
    )
