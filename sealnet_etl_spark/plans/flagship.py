"""Flagship multi-operator plans (TPC-H-shaped, adapted to the testdata).

These exercise the full scan → filter → multi-way join → aggregate → sort
pipeline and are the headline bench queries. Adaptations vs. real TPC-H
(per FIXTURES.md): no partsupp / shippriority / commitdate columns, and no
``c_nationkey = s_nationkey`` constraint (customer and supplier nations are
independent in this data).

Scale design: dimension joins are pinned broadcast (region/nation/supplier
stay tiny at any SF — a 100 TB fact table still joins them map-side with no
shuffle of the big side); the fact→orders join shuffles on the join key and
AQE handles skew/coalescing. Aggregates are partial+final (map-side combine)
automatically. Float aggregates are rounded per SURVEY.md §5.3 so the
order-insensitive value-hash matches the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..sources import load_table


def _disc_price() -> F.Column:
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


@query(
    "q1_pricing_summary",
    survey_id="AG-1",
    oracle="""
        SELECT
            l_returnflag,
            l_linestatus,
            ROUND(SUM(l_quantity), 2)                                    AS sum_qty,
            ROUND(SUM(l_extendedprice), 2)                               AS sum_base_price,
            ROUND(SUM(l_extendedprice * (1 - l_discount)), 2)            AS sum_disc_price,
            ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
            ROUND(AVG(l_quantity), 6)                                    AS avg_qty,
            ROUND(AVG(l_extendedprice), 6)                               AS avg_price,
            ROUND(AVG(l_discount), 6)                                    AS avg_disc,
            COUNT(*)                                                     AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: scan + filter + hash group-by with 8 aggregates.

    The filter is sargable so parquet row-group skipping applies; the
    group-by has 6 groups, so the partial (map-side) aggregate reduces each
    scan partition to ≤6 rows before the shuffle — at 100 TB the shuffle
    carries kilobytes.
    """
    lineitem = load_table(spark, sf_dir, "lineitem")
    charge = _disc_price() * (1 + F.col("l_tax"))
    return (
        lineitem.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(_disc_price()), 2).alias("sum_disc_price"),
            F.round(F.sum(charge), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@query(
    "q3_shipping_priority",
    survey_id="JN-1",
    oracle="""
        SELECT
            l_orderkey,
            ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
            o_orderdate,
            o_orderpriority
        FROM customer
        JOIN orders   ON c_custkey = o_custkey
        JOIN lineitem ON o_orderkey = l_orderkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1997-03-15'
          AND l_shipdate  > TIMESTAMP '1997-03-15'
        GROUP BY l_orderkey, o_orderdate, o_orderpriority
        ORDER BY revenue DESC, o_orderdate, l_orderkey
        LIMIT 10
    """,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: 3-way join + agg + global top-10.

    ORDER BY ends with the unique l_orderkey tiebreak so the LIMIT is
    deterministic on both engines (SURVEY.md §5.3). Spark plans the final
    sort+limit as TakeOrderedAndProject — no global sort materialized.
    """
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    cutoff = F.lit("1997-03-15").cast("timestamp")
    return (
        customer.filter(F.col("c_mktsegment") == "BUILDING")
        .join(orders, F.col("c_custkey") == F.col("o_custkey"))
        .filter(F.col("o_orderdate") < cutoff)
        .join(lineitem, F.col("o_orderkey") == F.col("l_orderkey"))
        .filter(F.col("l_shipdate") > cutoff)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.round(F.sum(_disc_price()), 2).alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), F.col("o_orderdate"), F.col("l_orderkey"))
        .limit(10)
    )


@query(
    "q5_revenue_by_nation",
    survey_id="JN-3",
    oracle="""
        SELECT
            n_name,
            ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM lineitem
        JOIN orders   ON l_orderkey  = o_orderkey
        JOIN customer ON o_custkey   = c_custkey
        JOIN supplier ON l_suppkey   = s_suppkey
        JOIN nation   ON s_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'
          AND o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate <  TIMESTAMP '1997-01-01'
        GROUP BY n_name
        ORDER BY revenue DESC, n_name
    """,
)
def q5_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 5-way star join + agg + sort (the flagship).

    supplier/nation/region are pinned broadcast — the fact side never
    shuffles for them; only the lineitem⋈orders equi-join shuffles, on the
    order key. AQE may further reorder/coalesce at runtime.
    """
    lineitem = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(F.round(F.sum(_disc_price()), 2).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("n_name"))
    )


@query(
    "q14_promo_revenue",
    survey_id="JN-2/AG-1/FN-5",
    oracle="""
        SELECT ROUND(100.00 * SUM(CASE WHEN p_type LIKE 'PROMO%'
                                       THEN l_extendedprice * (1 - l_discount)
                                       ELSE 0 END)
                     / SUM(l_extendedprice * (1 - l_discount)), 4)
                   AS promo_revenue_pct,
               ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1996-04-01'
    """,
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: promotion revenue share for one quarter — fact scan
    with a pushed date-range filter, broadcast part join, conditional
    aggregate ratio. The CASE lives INSIDE the sum (one pass), and the
    part dim broadcasts, so the plan is scan → BHJ → partial agg →
    1-row final agg regardless of fact size."""
    lineitem = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    part = load_table(spark, sf_dir, "part")
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type").like("PROMO%"), disc).otherwise(F.lit(0.0))
    return (
        lineitem.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            F.round(100.0 * F.sum(promo) / F.sum(disc), 4).alias(
                "promo_revenue_pct"
            ),
            F.round(F.sum(disc), 2).alias("total_revenue"),
        )
    )


@query(
    "q10_returned_items",
    survey_id="JN-3/AG-1/SRT-2",
    oracle="""
        SELECT c_custkey, c_name, n_name,
               ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM customer
        JOIN orders   ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        JOIN nation   ON c_nationkey = n_nationkey
        WHERE l_returnflag = 'R'
          AND o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate < TIMESTAMP '1996-07-01'
        GROUP BY c_custkey, c_name, n_name
        ORDER BY revenue DESC, c_custkey
        LIMIT 20
    """,
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: top-20 customers by revenue lost to returns in a
    half-year window — returned-lineitem filter pushed to the fact scan,
    date filter pushed to orders, nation broadcast, group-by-customer agg,
    TakeOrderedAndProject top-20 with the §5.3 unique tiebreak."""
    lineitem = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp"))
    )
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.round(F.sum(disc), 2).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


@query(
    "q6_forecast_revenue",
    survey_id="PF-2/AG-4",
    oracle="""
        SELECT ROUND(SUM(l_extendedprice * l_discount), 2) AS revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate <  TIMESTAMP '1997-01-01'
          AND l_discount >= 0.05 AND l_discount <= 0.07
          AND l_quantity < 24
    """,
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: pure filter + global aggregate, zero joins.

    Every predicate is sargable, so the whole WHERE pushes into the parquet
    scan (row-group skipping on shipdate/discount/quantity stats) and only
    3 columns are read — at 100 TB this query's cost is the scan of the
    surviving row groups, nothing else. The global SUM is partial+final:
    one double per partition crosses the wire.
    """
    lineitem = load_table(spark, sf_dir, "lineitem")
    return (
        lineitem.filter(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1997-01-01")
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias(
                "revenue"
            )
        )
    )


@query(
    "q4_order_priority",
    survey_id="JN-5/AG-1",
    oracle="""
        SELECT o_orderpriority, COUNT(*) AS order_count
        FROM orders o
        WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
          AND o.o_orderdate <  TIMESTAMP '1996-04-01'
          AND EXISTS (
              SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey
                AND l.l_shipdate > o.o_orderdate
          )
        GROUP BY o_orderpriority
    """,
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: correlated EXISTS decorrelated into a LEFT SEMI join
    (adapted: 'shipped after the order date' stands in for the missing
    commit/receipt columns, FIXTURES.md).

    The semi join carries the non-equi correlate (l_shipdate > o_orderdate)
    as a join residual, deduplicates matches for free (no DISTINCT pass),
    and the date filter on orders prunes the probe side BEFORE the join —
    the shape Catalyst produces for EXISTS subqueries, written directly.
    """
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1996-04-01")
    )
    lineitem = load_table(spark, sf_dir, "lineitem")
    shipped_late = orders.join(
        lineitem,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (F.col("l_shipdate") > F.col("o_orderdate")),
        "left_semi",
    )
    return shipped_late.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("order_count")
    )


@query(
    "q12_priority_class",
    survey_id="JN-1/FN-5/AG-1",
    oracle="""
        SELECT l_linestatus,
               CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                        THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
               CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                        THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate <  TIMESTAMP '1997-01-01'
        GROUP BY l_linestatus
    """,
)
def q12_priority_class(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: fact–fact equi join + conditional (CASE) counts
    (adapted: l_linestatus stands in for the missing l_shipmode).

    Both sides shuffle on the order key; the lineitem date filter runs
    before the shuffle so only one year of the fact table moves. The
    conditional aggregation is two branch-free SUM(CASE)s — one pass,
    no second join or union.
    """
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1997-01-01")
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        orders.join(lineitem, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@query(
    "q18_large_orders",
    survey_id="AG-1/JN-1/SRT-2",
    oracle="""
        WITH big AS (
            SELECT l_orderkey, SUM(l_quantity) AS qty
            FROM lineitem
            GROUP BY l_orderkey
            HAVING SUM(l_quantity) > 200
        )
        SELECT c_name, c_custkey, o_orderkey, o_orderdate,
               ROUND(o_totalprice, 2) AS total_price,
               ROUND(qty, 2)          AS total_qty
        FROM big
        JOIN orders   ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
        ORDER BY o_totalprice DESC, o_orderkey
        LIMIT 100
    """,
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: HAVING-filtered aggregate feeding a join chain,
    global top-100 by price.

    The quantity rollup reduces lineitem to one row per order BEFORE any
    join (the only full-fact shuffle); the HAVING cut then shrinks it to
    the rare heavy orders, so both joins move only survivors. The final
    ORDER BY + LIMIT plans as TakeOrderedAndProject — per-partition heaps,
    no global sort — with o_orderkey as tiebreak so the cut is total.
    """
    lineitem = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    big = (
        lineitem.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 200)
    )
    return (
        big.join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(customer, F.col("c_custkey") == F.col("o_custkey"))
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(100)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            F.round("o_totalprice", 2).alias("total_price"),
            F.round("qty", 2).alias("total_qty"),
        )
    )


@query(
    "q19_disjunctive_revenue",
    survey_id="JN-1/PF-2/AG-4",
    oracle="""
        SELECT ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
               AND l_quantity BETWEEN 1 AND 11)
           OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25
               AND l_quantity BETWEEN 10 AND 20)
           OR (p_brand = 'Brand#15' AND p_size BETWEEN 1 AND 35
               AND l_quantity BETWEEN 20 AND 30)
    """,
)
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: broadcast join with a disjunctive (OR-of-ANDs)
    predicate mixing columns from both sides (Brand#15 replaces the
    absent Brand#34, FIXTURES.md).

    Catalyst extracts the single-side conjuncts it can (l_quantity ∈
    [1,30] covers all arms; part arms prune the build side) and pushes
    them below the join, so the OR only evaluates on rows that already
    survived the cheap per-side cuts — the textbook reason to keep
    predicates declarative instead of pre-splitting with a union.
    """
    lineitem = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    joined = lineitem.join(
        F.broadcast(part), F.col("p_partkey") == F.col("l_partkey")
    )
    arm = lambda brand, smax, qlo, qhi: (  # noqa: E731
        (F.col("p_brand") == brand)
        & F.col("p_size").between(1, smax)
        & F.col("l_quantity").between(qlo, qhi)
    )
    return joined.filter(
        arm("Brand#12", 15, 1, 11) | arm("Brand#23", 25, 10, 20) | arm("Brand#15", 35, 20, 30)
    ).agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
            "revenue"
        )
    )
