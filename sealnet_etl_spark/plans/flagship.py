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


# ---------------------------------------------------------------------------
# Round-2 flagship additions: the remaining classic TPC-H shapes expressible
# on this star schema (no partsupp / l_commitdate / l_receiptdate, per
# FIXTURES.md — Q2/Q9/Q11/Q16/Q20 substitute lineitem-observed supply pairs
# or documented cost proxies; Q21 is not expressible without receipt dates).
# ---------------------------------------------------------------------------


@query(
    "q2_min_cost_supplier",
    survey_id="JN-1/WN-1/SRT-2",
    oracle="""
        WITH supply AS (
            SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
        ), euro AS (
            SELECT s_suppkey, s_name, s_acctbal, n_name
            FROM supplier
            JOIN nation ON s_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            WHERE r_name = 'EUROPE'
        )
        SELECT p_partkey, p_name, s_suppkey, s_name,
               ROUND(s_acctbal, 2) AS acctbal, n_name
        FROM part
        JOIN supply ON p_partkey = l_partkey
        JOIN euro   ON s_suppkey = l_suppkey
        WHERE p_type = 'SMALL' AND p_size <= 15
        QUALIFY ROW_NUMBER() OVER (
            PARTITION BY p_partkey ORDER BY s_acctbal, s_suppkey
        ) = 1
        ORDER BY acctbal DESC, p_partkey
        LIMIT 100
    """,
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: per-part best supplier via a correlated-min, over
    the supply relation observed in lineitem (the schema has no partsupp;
    min s_acctbal stands in for min ps_supplycost, FIXTURES.md).

    The correlated MIN subquery of the original is expressed as a
    rank-1-per-key window — one shuffle on p_partkey instead of a
    re-aggregating self-join; (s_acctbal, s_suppkey) ordering makes the
    pick total, and the final top-100 has the unique p_partkey tiebreak
    (one row per part survives the window). Dim side (suppliers × nation ×
    region) is broadcast; only the distinct supply pairs shuffle.
    """
    from pyspark.sql.window import Window

    supply = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey")
        .distinct()
    )
    euro = (
        load_table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(load_table(spark, sf_dir, "nation")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .join(
            F.broadcast(load_table(spark, sf_dir, "region")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .filter(F.col("r_name") == "EUROPE")
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_type") == "SMALL") & (F.col("p_size") <= 15)
    )
    w = Window.partitionBy("p_partkey").orderBy("s_acctbal", "s_suppkey")
    return (
        part.join(supply, F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(euro), F.col("s_suppkey") == F.col("l_suppkey"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "p_partkey", "p_name", "s_suppkey", "s_name",
            F.round("s_acctbal", 2).alias("acctbal"), "n_name",
        )
        .orderBy(F.col("acctbal").desc(), "p_partkey")
        .limit(100)
    )


@query(
    "q7_volume_shipping",
    survey_id="JN-3/AG-1",
    oracle="""
        SELECT supp_nation, cust_nation, l_year,
               ROUND(SUM(volume), 2) AS revenue
        FROM (
            SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                   CAST(year(l_shipdate) AS INT) AS l_year,
                   l_extendedprice * (1 - l_discount) AS volume
            FROM supplier
            JOIN lineitem ON s_suppkey = l_suppkey
            JOIN orders   ON o_orderkey = l_orderkey
            JOIN customer ON c_custkey = o_custkey
            JOIN nation n1 ON s_nationkey = n1.n_nationkey
            JOIN nation n2 ON c_nationkey = n2.n_nationkey
            WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
                OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
              AND l_shipdate BETWEEN TIMESTAMP '1996-01-01'
                                 AND TIMESTAMP '1997-12-31'
        ) shipping
        GROUP BY supp_nation, cust_nation, l_year
    """,
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: bilateral trade volume between two nations by year.

    Both nation joins are broadcast (25 rows); the nation-pair disjunction
    sits ABOVE them so Catalyst can still push each side's IsNotNull and
    the date range into the scans. Fact tables join on their natural keys
    (one shuffle each); the final (nation, nation, year) aggregate is 8
    groups — partial agg collapses it before the last exchange.
    """
    supplier = load_table(spark, sf_dir, "supplier")
    lineitem = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate").between("1996-01-01", "1997-12-31")
    )
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    n1 = F.broadcast(
        nation.select(
            F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
        )
    )
    n2 = F.broadcast(
        nation.select(
            F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
        )
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        lineitem.join(F.broadcast(supplier), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(customer, F.col("c_custkey") == F.col("o_custkey"))
        .join(n1, F.col("s_nationkey") == F.col("n1_key"))
        .join(n2, F.col("c_nationkey") == F.col("n2_key"))
        .filter(pair)
        .groupBy(
            "supp_nation", "cust_nation",
            F.year("l_shipdate").cast("int").alias("l_year"),
        )
        .agg(F.round(F.sum(_disc_price()), 2).alias("revenue"))
    )


@query(
    "q8_market_share",
    survey_id="JN-3/FN-5/AG-1",
    oracle="""
        SELECT o_year,
               ROUND(SUM(CASE WHEN supp_nation = 'NATION_5' THEN volume
                              ELSE 0 END) / SUM(volume), 6) AS mkt_share
        FROM (
            SELECT CAST(year(o_orderdate) AS INT) AS o_year,
                   l_extendedprice * (1 - l_discount) AS volume,
                   n1.n_name AS supp_nation
            FROM part
            JOIN lineitem ON p_partkey = l_partkey
            JOIN supplier ON s_suppkey = l_suppkey
            JOIN orders   ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN nation n2 ON c_nationkey = n2.n_nationkey
            JOIN region   ON n2.n_regionkey = r_regionkey
            JOIN nation n1 ON s_nationkey = n1.n_nationkey
            WHERE r_name = 'ASIA' AND p_type = 'ECONOMY'
              AND o_orderdate BETWEEN TIMESTAMP '1996-01-01'
                                  AND TIMESTAMP '1997-12-31'
        ) all_nations
        GROUP BY o_year
    """,
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: one nation's share of a region's import market by
    year — a 7-way star join feeding a conditional-ratio aggregate.

    Every dimension (part after its type filter, supplier, both nation
    roles, region) broadcasts; the two fact tables shuffle once each on
    their join keys. The share is SUM(CASE)/SUM — one pass, no self-join
    of the yearly totals.
    """
    part = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    lineitem = load_table(spark, sf_dir, "lineitem")
    supplier = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate").between("1996-01-01", "1997-12-31")
    )
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n1 = nation.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_regionkey").alias("n2_region")
    )
    volume = _disc_price()
    return (
        lineitem.join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(supplier), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .join(F.broadcast(region), F.col("n2_region") == F.col("r_regionkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .groupBy(F.year("o_orderdate").cast("int").alias("o_year"))
        .agg(
            F.round(
                F.sum(F.when(F.col("supp_nation") == "NATION_5", volume).otherwise(0.0))
                / F.sum(volume),
                6,
            ).alias("mkt_share")
        )
    )


@query(
    "q9_product_profit",
    survey_id="JN-3/AG-1",
    oracle="""
        SELECT nation, o_year, ROUND(SUM(amount), 2) AS sum_profit
        FROM (
            SELECT n_name AS nation,
                   CAST(year(o_orderdate) AS INT) AS o_year,
                   l_extendedprice * (1 - l_discount)
                       - 0.2 * p_retailprice * l_quantity AS amount
            FROM part
            JOIN lineitem ON p_partkey = l_partkey
            JOIN supplier ON s_suppkey = l_suppkey
            JOIN orders   ON l_orderkey = o_orderkey
            JOIN nation   ON s_nationkey = n_nationkey
            WHERE p_name LIKE '%bolt%'
        ) profit
        GROUP BY nation, o_year
    """,
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit per supplier-nation per year for a part
    family. The schema has no ps_supplycost, so cost is the documented
    proxy 0.2 × p_retailprice × l_quantity (FIXTURES.md adaptation) — the
    plan shape (substring part filter, 5-way join, two-key agg) is Q9's.

    The '%bolt%' LIKE cannot prune parquet pages but runs on the broadcast
    build side (20k parts), never against the fact scan; lineitem and
    orders shuffle once each.
    """
    part = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%bolt%"))
    lineitem = load_table(spark, sf_dir, "lineitem")
    supplier = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders")
    nation = load_table(spark, sf_dir, "nation")
    amount = _disc_price() - 0.2 * F.col("p_retailprice") * F.col("l_quantity")
    return (
        lineitem.join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(supplier), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("o_year"),
        )
        .agg(F.round(F.sum(amount), 2).alias("sum_profit"))
    )


@query(
    "q11_important_stock",
    survey_id="AG-1/JN-5",
    oracle="""
        WITH natl AS (
            SELECT l_partkey, l_extendedprice * l_quantity AS value
            FROM lineitem
            JOIN supplier ON s_suppkey = l_suppkey
            JOIN nation   ON s_nationkey = n_nationkey
            WHERE n_name = 'NATION_3'
        )
        SELECT l_partkey AS p_partkey, ROUND(SUM(value), 2) AS stock_value
        FROM natl
        GROUP BY l_partkey
        HAVING SUM(value) > (SELECT SUM(value) * 0.001 FROM natl)
    """,
)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: per-part inventory value for one nation's
    suppliers, kept only when above a fraction of the nation's TOTAL — a
    HAVING over a global scalar subquery (lineitem value stands in for the
    absent partsupp availqty × supplycost).

    The scalar total is a one-row aggregate broadcast into the HAVING
    filter (crossJoin of a 1-row frame — no driver collect, no second
    scan: Spark reuses the shuffled partials via the cached frame).
    """
    lineitem = load_table(spark, sf_dir, "lineitem")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name") == "NATION_3"
    )
    natl = (
        lineitem.join(F.broadcast(supplier), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select(
            "l_partkey",
            (F.col("l_extendedprice") * F.col("l_quantity")).alias("value"),
        )
    )
    per_part = natl.groupBy("l_partkey").agg(F.sum("value").alias("part_value"))
    threshold = natl.agg((F.sum("value") * 0.001).alias("cutoff"))
    return (
        per_part.join(F.broadcast(threshold))
        .filter(F.col("part_value") > F.col("cutoff"))
        .select(
            F.col("l_partkey").alias("p_partkey"),
            F.round("part_value", 2).alias("stock_value"),
        )
    )


@query(
    "q13_customer_distribution",
    survey_id="JN-4/AG-1",
    oracle="""
        SELECT c_count, COUNT(*) AS custdist
        FROM (
            SELECT c_custkey, COUNT(o_orderkey) AS c_count
            FROM customer
            LEFT OUTER JOIN orders
              ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
            GROUP BY c_custkey
        ) c_orders
        GROUP BY c_count
    """,
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: customer order-count distribution — an outer join
    with a join-level residual predicate, then two stacked aggregations.

    The filter lives in the JOIN CONDITION, not a WHERE (a WHERE would
    turn the outer join inner and drop zero-order customers). First agg
    shuffles on c_custkey; the second input is (count) with ~tens of
    distinct values, so its exchange carries almost nothing.
    """
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    per_cust = (
        customer.join(
            orders,
            (F.col("c_custkey") == F.col("o_custkey"))
            & (F.col("o_orderpriority") != "1-URGENT"),
            "left_outer",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@query(
    "q15_top_supplier",
    survey_id="AG-1/JN-1",
    oracle="""
        WITH revenue AS (
            SELECT l_suppkey AS supplier_no,
                   ROUND(SUM(l_extendedprice * (1 - l_discount)), 2)
                       AS total_revenue
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1997-01-01'
              AND l_shipdate <  TIMESTAMP '1997-04-01'
            GROUP BY l_suppkey
        )
        SELECT s_suppkey, s_name, total_revenue
        FROM supplier JOIN revenue ON s_suppkey = supplier_no
        WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: quarterly revenue view + suppliers hitting the
    global maximum (scalar-subquery equality, ties kept).

    Comparing on the ROUNDED revenue makes the equality engine-portable
    (raw float sums differ in last-ulp across accumulation orders). The
    max is a 1-row broadcast; the revenue frame is computed once and
    reused for both sides of the comparison.
    """
    lineitem = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1997-04-01")
    )
    supplier = load_table(spark, sf_dir, "supplier")
    revenue = lineitem.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.round(F.sum(_disc_price()), 2).alias("total_revenue")
    )
    top = revenue.agg(F.max("total_revenue").alias("max_revenue"))
    return (
        supplier.join(revenue, F.col("s_suppkey") == F.col("supplier_no"))
        .join(F.broadcast(top))
        .filter(F.col("total_revenue") == F.col("max_revenue"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


@query(
    "q16_supplier_part_count",
    survey_id="JN-6/AG-2",
    oracle="""
        SELECT p_brand, p_type, p_size,
               COUNT(DISTINCT l_suppkey) AS supplier_cnt
        FROM lineitem
        JOIN part ON p_partkey = l_partkey
        WHERE p_brand <> 'Brand#15'
          AND p_type <> 'PROMO'
          AND p_size IN (1, 14, 23, 45)
          AND l_suppkey NOT IN (
              SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
          )
        GROUP BY p_brand, p_type, p_size
    """,
)
def q16_supplier_part_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: supplier diversity per (brand, type, size) with a
    NOT-IN supplier exclusion (negative acctbal stands in for the absent
    'complaints' comment filter, FIXTURES.md).

    The NOT IN compiles to a broadcast LEFT ANTI join against the (tiny)
    excluded-supplier set — null-safe here because s_suppkey is a
    non-null key. COUNT(DISTINCT) runs as the standard two-phase expand;
    the part filters prune the broadcast build side.
    """
    lineitem = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#15")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 14, 23, 45)
    )
    excluded = load_table(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < 0
    ).select("s_suppkey")
    return (
        lineitem.join(
            F.broadcast(excluded),
            F.col("l_suppkey") == F.col("s_suppkey"),
            "left_anti",
        )
        .join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


@query(
    "q17_small_qty_revenue",
    survey_id="JN-1/AG-4",
    oracle="""
        SELECT ROUND(SUM(l_extendedprice) / 7.0, 2) AS avg_yearly
        FROM lineitem l1
        JOIN part ON p_partkey = l1.l_partkey
        WHERE p_brand = 'Brand#15'
          AND l1.l_quantity < (
              SELECT 0.5 * AVG(l2.l_quantity)
              FROM lineitem l2 WHERE l2.l_partkey = l1.l_partkey
          )
    """,
)
def q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: revenue from small-quantity orders of one brand —
    a correlated per-part average threshold.

    The correlated subquery decorrelates into a per-part AVG aggregate
    joined back on l_partkey (computed over ALL parts' lineitems, as the
    correlation demands, then cut to the brand via the part join). One
    extra shuffle of (partkey, avg) pairs instead of a re-scan per row.
    """
    lineitem = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#15")
    thresholds = lineitem.groupBy(F.col("l_partkey").alias("t_partkey")).agg(
        (F.avg("l_quantity") * 0.5).alias("qty_cut")
    )
    return (
        lineitem.join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .join(thresholds, F.col("l_partkey") == F.col("t_partkey"))
        .filter(F.col("l_quantity") < F.col("qty_cut"))
        .agg(F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"))
    )


@query(
    "q20_excess_shippers",
    survey_id="JN-5/AG-1",
    oracle="""
        WITH shipped AS (
            SELECT l_suppkey, SUM(l_quantity) AS qty
            FROM lineitem
            JOIN part ON p_partkey = l_partkey
            WHERE p_name LIKE '%bolt%'
              AND l_shipdate >= TIMESTAMP '1997-01-01'
              AND l_shipdate <  TIMESTAMP '1998-01-01'
            GROUP BY l_suppkey
        )
        SELECT s_suppkey, s_name, n_name
        FROM supplier
        JOIN nation ON s_nationkey = n_nationkey
        WHERE s_suppkey IN (
            SELECT l_suppkey FROM shipped
            WHERE qty > (SELECT 0.5 * MAX(qty) FROM shipped)
        )
    """,
)
def q20_excess_shippers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: suppliers who moved outsized volume of a part
    family in one year — nested aggregate subqueries feeding a semi-join
    (shipped quantity vs half the max stands in for the absent partsupp
    availqty comparison, FIXTURES.md).

    Inner pipeline: one filtered fact aggregate; its MAX is a 1-row
    broadcast; qualifying suppkeys semi-join the supplier dim. Nothing
    wide ever shuffles twice.
    """
    lineitem = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1998-01-01")
    )
    part = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%bolt%"))
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    shipped = (
        lineitem.join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("qty"))
    )
    cutoff = shipped.agg((F.max("qty") * 0.5).alias("qty_cut"))
    qualifying = (
        shipped.join(F.broadcast(cutoff))
        .filter(F.col("qty") > F.col("qty_cut"))
        .select("l_suppkey")
    )
    return (
        supplier.join(
            qualifying, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi"
        )
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "s_name", "n_name")
    )


@query(
    "q22_sales_opportunity",
    survey_id="JN-6/AG-1",
    oracle="""
        WITH eligible AS (
            SELECT c_custkey, c_nationkey, c_acctbal
            FROM customer
            WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')
              AND c_acctbal > (
                  SELECT AVG(c_acctbal) FROM customer WHERE c_acctbal > 0.0
              )
        )
        SELECT n_name, COUNT(*) AS numcust, ROUND(SUM(c_acctbal), 2) AS totacctbal
        FROM eligible
        JOIN nation ON c_nationkey = n_nationkey
        WHERE NOT EXISTS (
            SELECT 1 FROM orders WHERE o_custkey = c_custkey
        )
        GROUP BY n_name
    """,
)
def q22_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: well-funded customers who never ordered, by nation
    (market segments stand in for the absent phone country codes).

    Three classic pieces in one plan: a global scalar subquery (positive
    average balance, 1-row broadcast), a NOT EXISTS (left anti join
    against orders — the probe side is the small eligible set, so the
    anti join broadcasts IT and streams orders), and a dim-broadcast
    aggregate.
    """
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    nation = load_table(spark, sf_dir, "nation")
    avg_bal = customer.filter(F.col("c_acctbal") > 0.0).agg(
        F.avg("c_acctbal").alias("avg_bal")
    )
    eligible = (
        customer.filter(F.col("c_mktsegment").isin("BUILDING", "MACHINERY"))
        .join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
    )
    return (
        eligible.join(
            orders, F.col("c_custkey") == F.col("o_custkey"), "left_anti"
        )
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
    )


@query(
    "q21_waiting_supplier",
    survey_id="JN-5/JN-6",
    oracle="""
        WITH late AS (
            SELECT l_orderkey, l_suppkey
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            WHERE o_orderstatus = 'F'
              AND l_shipdate > o_orderdate + INTERVAL 60 DAY
        )
        SELECT s_name, COUNT(*) AS numwait
        FROM late l1
        JOIN supplier ON s_suppkey = l1.l_suppkey
        JOIN nation   ON n_nationkey = s_nationkey
        WHERE n_name = 'NATION_7'
          AND EXISTS (
              SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey
          )
          AND NOT EXISTS (
              SELECT 1 FROM late l3
              WHERE l3.l_orderkey = l1.l_orderkey
                AND l3.l_suppkey <> l1.l_suppkey
          )
        GROUP BY s_name
        ORDER BY numwait DESC, s_name
        LIMIT 100
    """,
)
def q21_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: suppliers who were the SOLE late supplier on a
    finished multi-supplier order — EXISTS + NOT EXISTS over the same fact,
    decorrelated into one semi and one anti join (adapted: 'shipped more
    than 60 days after the order date' stands in for the missing
    commit/receipt date pair, FIXTURES.md).

    The lateness set is computed once (orders filtered to 'F' before the
    fact join, so only final orders shuffle) and drives both correlates:
    EXISTS 'another supplier on the order' is a left semi join against the
    full fact keyed on order, NOT EXISTS 'another LATE supplier' a left
    anti join against the same late set. Both correlates carry the
    different-supplier residual on the join, so no DISTINCT or count
    subquery materializes. Supplier and nation pin broadcast; the final
    aggregate is per supplier name with a deterministic (numwait DESC,
    s_name) top-100.

    Scale note (100 TB): three shuffles of the fact — the orders join and
    the two order-keyed correlates — each carrying only (orderkey, suppkey)
    after the first projection; a hot order (thousands of lineitems) is an
    AQE skew-split case, not an explosion, because semi/anti joins emit at
    most one row per probe-side row.
    """
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    )
    lineitem = load_table(spark, sf_dir, "lineitem")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name") == "NATION_7"
    )
    late = (
        lineitem.join(
            orders.select("o_orderkey", "o_orderdate"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .filter(
            F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
        )
        .select("l_orderkey", "l_suppkey")
    )
    others = lineitem.select(
        F.col("l_orderkey").alias("ok2"), F.col("l_suppkey").alias("sk2")
    )
    late_others = late.select(
        F.col("l_orderkey").alias("ok3"), F.col("l_suppkey").alias("sk3")
    )
    sole_late = late.join(
        others,
        (F.col("l_orderkey") == F.col("ok2")) & (F.col("l_suppkey") != F.col("sk2")),
        "left_semi",
    ).join(
        late_others,
        (F.col("l_orderkey") == F.col("ok3")) & (F.col("l_suppkey") != F.col("sk3")),
        "left_anti",
    )
    return (
        sole_late.join(
            F.broadcast(
                supplier.join(
                    F.broadcast(nation),
                    F.col("s_nationkey") == F.col("n_nationkey"),
                ).select("s_suppkey", "s_name")
            ),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(100)
    )


_Q3_SQL = """
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
"""


@query("q3_shipping_priority_sql", survey_id="JN-1/API", oracle=_Q3_SQL)
def q3_shipping_priority_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The pure-SQL API surface: the exact ANSI text the DuckDB oracle
    runs is executed by ``spark.sql`` over temp views — proving a
    reference user can bring their SQL untranslated (one engine-portable
    string is both the query and its oracle). Catalyst compiles it to the
    same physical plan as the DataFrame q3 (broadcast joins, pushed
    filters, TakeOrderedAndProject), because DataFrame and SQL share one
    logical plan representation — there is no separate SQL slow path."""
    for t in ("customer", "orders", "lineitem"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(_Q3_SQL)
