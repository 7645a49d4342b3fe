"""Window-function operators (SURVEY.md §2.5, WN-1..WN-6).

Every window's ORDER BY ends in a unique column so ranking is a total
order — rank ties are where cross-engine hash comparisons die
(SURVEY.md §5.3). Windows partitioned by a key scale linearly (one
shuffle on the key); the two global windows (WN-5) are flagged in their
docstrings — a global sort is the non-scalable shape, kept only as the
API demo with the scale alternative noted.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..registry import query
from ..sources import load_table


@query(
    "wn_keep_first",
    survey_id="WN-1",
    oracle="""
        SELECT event_id, user_id, ts::TIMESTAMP AS first_ts, event_type
        FROM events
        QUALIFY ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) = 1
    """,
)
def wn_keep_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    """row_number keep-first per key — the canonical dedup-keep-first
    (first event per user; event_id tiebreak for determinism)."""
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        events.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("event_id", "user_id", F.col("ts").alias("first_ts"), "event_type")
    )


@query(
    "wn_topk_per_group",
    survey_id="WN-2",
    oracle="""
        SELECT o_custkey, o_orderkey, ROUND(o_totalprice, 2) AS total_price
        FROM orders
        QUALIFY ROW_NUMBER() OVER (
            PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey
        ) <= 3
    """,
)
def wn_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k per group as rank-then-filter — written so Spark's
    InferWindowGroupLimit rule pushes the k-limit below the sort (each
    partition keeps a k-sized heap instead of fully sorting)."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select(
            "o_custkey",
            "o_orderkey",
            F.round("o_totalprice", 2).alias("total_price"),
        )
    )


@query(
    "wn_lag_gap",
    survey_id="WN-3",
    oracle="""
        SELECT event_id, user_id,
               epoch_us(ts::TIMESTAMP)
                 - LAG(epoch_us(ts::TIMESTAMP)) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                   ) AS gap_us
        FROM events
    """,
)
def wn_lag_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag: inter-event gap per user in integer microseconds (exact — no
    float drift; the reference's sequential image pairing shape)."""
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros("ts")
    return events.select(
        "event_id",
        "user_id",
        (us - F.lag(us).over(w)).alias("gap_us"),
    )


@query(
    "wn_rolling_sum",
    survey_id="WN-4",
    oracle="""
        SELECT event_id, user_id,
               ROUND(SUM(value) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN 5 PRECEDING AND CURRENT ROW
               ), 2) AS rolling_value
        FROM events
    """,
)
def wn_rolling_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling frame aggregate: 6-row trailing sum per user."""
    events = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-5, Window.currentRow)
    )
    return events.select(
        "event_id",
        "user_id",
        F.round(F.sum("value").over(w), 2).alias("rolling_value"),
    )


@query(
    "wn_ntile_percent_rank",
    survey_id="WN-5",
    oracle="""
        SELECT c_custkey,
               NTILE(10) OVER (ORDER BY c_acctbal, c_custkey)                 AS decile,
               ROUND(PERCENT_RANK() OVER (ORDER BY c_acctbal, c_custkey), 6) AS pct_rank
        FROM customer
    """,
)
def wn_ntile_percent_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decile bucketing for split assignment. NOTE: an unpartitioned window
    forces all rows through one partition — fine for a 15k-row dim, wrong at
    100 TB, where the scale path is approx-quantile cut points (ETL-3 uses a
    hash-mod split which needs no sort at all)."""
    customer = load_table(spark, sf_dir, "customer")
    w = Window.orderBy("c_acctbal", "c_custkey")
    return customer.select(
        "c_custkey",
        F.ntile(10).over(w).alias("decile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
    )


@query(
    "wn_ntile_scalable",
    survey_id="WN-5",
    oracle="""
        SELECT c_custkey,
               NTILE(10) OVER (ORDER BY c_acctbal, c_custkey)                 AS decile,
               ROUND(PERCENT_RANK() OVER (ORDER BY c_acctbal, c_custkey), 6) AS pct_rank
        FROM customer
    """,
)
def wn_ntile_scalable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact global ntile/percent_rank WITHOUT a single-partition window —
    the 100 TB path wn_ntile_percent_rank's docstring promises.

    Classic distributed two-phase rank: range-repartition on the sort key
    (sampled bounds, every partition holds a contiguous key range), count
    rows per partition (≤ shuffle-partition rows — collected like the IVF
    centroid table, trivially bounded), prefix-sum those counts into
    per-partition global offsets, then global rank = offset +
    within-partition row_number. The only full-data movements are the
    range exchange and the per-partition-id window shuffle; no task ever
    sees more than ~N/partitions rows, versus the unpartitioned window
    that drags all N through one task. NTILE bucket and percent_rank are
    then pure arithmetic on the exact rank, matching the oracle's window
    formulation value-for-value (ties impossible: c_custkey is unique).
    """
    k = 10
    customer = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_acctbal"
    )
    ranked, total = two_phase_global_rank(
        customer, ["c_acctbal", "c_custkey"]
    )
    # NTILE semantics: base = N//k, and the first N%k buckets get one extra
    base, rem = total // k, total % k
    cutoff = rem * (base + 1)
    decile = F.when(
        F.col("rank") <= cutoff, (F.col("rank") - 1) / (base + 1)
    ).otherwise(rem + (F.col("rank") - cutoff - 1) / base)
    # PERCENT_RANK of a single row is 0 by definition — (rank-1)/(total-1)
    # would be 0/0 → NULL (review finding); the decile arithmetic is safe
    # for total < k because cutoff == total there (no row reaches the
    # base-divisor branch)
    pct = (
        F.lit(0.0)
        if total <= 1
        else F.round((F.col("rank") - 1) / (total - 1), 6)
    )
    return ranked.select(
        "c_custkey",
        (F.floor(decile) + 1).cast("int").alias("decile"),
        pct.alias("pct_rank"),
    )


def two_phase_global_rank(
    df: DataFrame, order_cols: list[str], num_partitions: int = 32
) -> tuple[DataFrame, int]:
    """Distributed exact global rank without a single-partition window:
    range-repartition on the (total-order) sort key, count rows per
    partition (≤ num_partitions rows collected — trivially bounded),
    prefix-sum into per-partition offsets, then global 1-based ``rank`` =
    offset + within-partition row_number. Returns (ranked df, total rows).

    At 100 TB no task sees more than ~N/num_partitions rows; the only
    full-data movements are the range exchange and the per-partition
    window sort. The rank values depend only on the total order — the
    sampled range bounds shift run-to-run, the ranks never do.

    CORRECTNESS REQUIREMENT (review finding): ``ranged`` MUST be
    persisted before the counts collect. The offsets are keyed by
    physical partition id, and repartitionByRange samples its bounds
    per execution — without the persist, the counts job and the later
    rank job could draw DIFFERENT bounds once partitions exceed the
    range-sampler's per-partition sample size, silently misaligning
    offsets with partitions (duplicated/gapped "exact" ranks). The
    persist pins one physical partitioning that both jobs reuse.

    Implemented as two_phase_global_cumsum with a constant weight of 1
    (rank IS the cumulative count), so exactly ONE implementation owns
    the persist-before-collect requirement (review finding)."""
    ranked, total, _ = two_phase_global_cumsum(
        df, [F.col(c) for c in order_cols], F.lit(1), num_partitions
    )
    return ranked.drop("cum_sum"), total


SESSION_GAP_MINUTES = 30


def events_with_session_ids(
    events: DataFrame,
    keys: tuple = ("user_id",),
    gap_minutes: int = SESSION_GAP_MINUTES,
) -> DataFrame:
    """Append ``session_id``: a gap longer than ``gap_minutes`` opens a
    new session (lag -> new-session flag -> cumulative sum). THE single
    gaps-and-islands definition — wn_sessionize_events,
    wn_session_conversion, wn_event_paths (default 30-min user sessions)
    and wn_alert_debounce (5-min (user, type) bursts) all derive from it,
    so burst/session semantics can never desynchronize. One shuffle on
    the key tuple; both window passes share the partitioning."""
    w_order = Window.partitionBy(*keys).orderBy("ts", "event_id")
    w_cum = w_order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    gap_us = gap_minutes * 60 * 1_000_000
    prev_us = F.lag(F.unix_micros("ts")).over(w_order)
    is_new = F.when(
        prev_us.isNull() | (F.unix_micros("ts") - prev_us > gap_us), 1
    ).otherwise(0)
    return events.withColumn("session_id", F.sum(is_new).over(w_cum))


@query(
    "wn_sessionize_events",
    survey_id="WN-6",
    oracle=f"""
        WITH flagged AS (
            SELECT user_id, ts::TIMESTAMP AS ts, value,
                   CASE WHEN ts::TIMESTAMP
                          - LAG(ts::TIMESTAMP) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                          > INTERVAL {SESSION_GAP_MINUTES} MINUTE
                        OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                        THEN 1 ELSE 0 END AS is_new
            FROM events
        ), numbered AS (
            SELECT user_id, ts, value,
                   CAST(SUM(is_new) OVER (
                       PARTITION BY user_id ORDER BY ts
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS BIGINT) AS session_id
            FROM flagged
        )
        SELECT user_id, session_id,
               COUNT(*)             AS n_events,
               ROUND(SUM(value), 2) AS session_value,
               MIN(ts)              AS session_start
        FROM numbered
        GROUP BY user_id, session_id
    """,
)
def wn_sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-min inactivity closes a session):
    lag → new-session flag → cumulative sum = session id → per-session agg
    (the shared events_with_session_ids helper)."""
    events = load_table(spark, sf_dir, "events")
    return (
        events_with_session_ids(events)
        .groupBy("user_id", "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("session_value"),
            F.min("ts").alias("session_start"),
        )
    )


@query(
    "wn_range_frame",
    survey_id="WN-4",
    oracle="""
        SELECT event_id,
               ROUND(SUM(value) OVER (
                   PARTITION BY user_id ORDER BY epoch(ts::TIMESTAMP)
                   RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW), 2)
                   AS rolling_1h_value
        FROM events
    """,
)
def wn_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-RANGE window frame: per user, the sum of event values in the
    trailing hour — a true range frame over epoch seconds (every row whose
    ts is within 3600s), not a row-count frame. Same single shuffle on
    user_id as any window; the frame bound is evaluated on the sorted run."""
    events = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts") / 1_000_000)
        .rangeBetween(-3600, 0)
    )
    return events.select(
        "event_id",
        F.round(F.sum("value").over(w), 2).alias("rolling_1h_value"),
    )


@query(
    "wn_first_last_nth",
    survey_id="WN-1/WN-3",
    oracle="""
        SELECT event_id, user_id,
               first_value(event_type) OVER w AS first_type,
               last_value(event_type)  OVER w AS latest_type,
               nth_value(event_type, 2) OVER w AS second_type
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
)
def wn_first_last_nth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first/last/nth value over a running frame: each event sees the
    user's first event type, its own (last in the running frame), and the
    second ever — the 'how did this user start vs. now' enrichment. The
    explicit ROWS frame makes last_value well-defined (the default RANGE
    frame's last row is the current peer group — a classic silent-bug)."""
    events = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return events.select(
        "event_id",
        "user_id",
        F.first("event_type").over(w).alias("first_type"),
        F.last("event_type").over(w).alias("latest_type"),
        F.nth_value("event_type", 2).over(w).alias("second_type"),
    )


FUNNEL_ORACLE_SQL = """
        WITH v AS (
            SELECT user_id, MIN(ts) AS v_ts FROM events
            WHERE event_type = 'view' GROUP BY user_id
        ), c AS (
            SELECT e.user_id, MIN(e.ts) AS c_ts
            FROM events e JOIN v USING (user_id)
            WHERE e.event_type = 'click' AND e.ts > v.v_ts
            GROUP BY e.user_id
        ), p AS (
            SELECT e.user_id, MIN(e.ts) AS p_ts
            FROM events e JOIN c USING (user_id)
            WHERE e.event_type = 'purchase' AND e.ts > c.c_ts
            GROUP BY e.user_id
        )
        SELECT u.user_id,
               epoch_us(v.v_ts::TIMESTAMP) AS view_us,
               epoch_us(c.c_ts::TIMESTAMP) AS click_us,
               epoch_us(p.p_ts::TIMESTAMP) AS purchase_us,
               CASE WHEN p.p_ts IS NOT NULL THEN 3
                    WHEN c.c_ts IS NOT NULL THEN 2
                    WHEN v.v_ts IS NOT NULL THEN 1
                    ELSE 0 END AS funnel_stage
        FROM (SELECT DISTINCT user_id FROM events) u
        LEFT JOIN v USING (user_id)
        LEFT JOIN c USING (user_id)
        LEFT JOIN p USING (user_id)
    """


@query(
    "wn_event_funnel",
    survey_id="WN-7",
    oracle=FUNNEL_ORACLE_SQL,
)
def wn_event_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered event funnel per user: first view, first click AFTER that
    view, first purchase AFTER that click — the staged-minimum shape every
    product-analytics engine ships (strictly ordered, not bag-of-events).

    Scale: the oracle's three joins collapse into three chained window
    minima over ONE partitioning — a single Exchange on user_id feeds all
    three Window operators plus the final per-user aggregate (Spark reuses
    the hash partitioning), so at 100 TB this is exactly one shuffle of the
    events table, versus three shuffled self-joins in the naive plan."""
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id")
    ts = F.col("ts")
    with_v = events.withColumn(
        "v_ts", F.min(F.when(F.col("event_type") == "view", ts)).over(w)
    )
    with_c = with_v.withColumn(
        "c_ts",
        F.min(
            F.when((F.col("event_type") == "click") & (ts > F.col("v_ts")), ts)
        ).over(w),
    )
    with_p = with_c.withColumn(
        "p_ts",
        F.min(
            F.when(
                (F.col("event_type") == "purchase") & (ts > F.col("c_ts")), ts
            )
        ).over(w),
    )
    stage = (
        F.when(F.col("purchase_us").isNotNull(), 3)
        .when(F.col("click_us").isNotNull(), 2)
        .when(F.col("view_us").isNotNull(), 1)
        .otherwise(0)
    )
    return (
        with_p.groupBy("user_id")
        .agg(
            F.min(F.unix_micros("v_ts")).alias("view_us"),
            F.min(F.unix_micros("c_ts")).alias("click_us"),
            F.min(F.unix_micros("p_ts")).alias("purchase_us"),
        )
        .withColumn("funnel_stage", stage)
    )


@query(
    "wn_retention_cohorts",
    survey_id="WN-8",
    oracle="""
        WITH weekly AS (
            SELECT DISTINCT user_id,
                   date_trunc('week', ts::TIMESTAMP)::DATE AS active_week
            FROM events
        ), cohort AS (
            SELECT user_id, MIN(active_week) AS cohort_week
            FROM weekly GROUP BY user_id
        )
        SELECT c.cohort_week,
               CAST(date_diff('day', c.cohort_week, w.active_week) / 7 AS INT)
                   AS week_offset,
               COUNT(DISTINCT w.user_id) AS n_users
        FROM weekly w JOIN cohort c USING (user_id)
        GROUP BY 1, 2
    """,
)
def wn_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retention cohort matrix: users bucketed by first-active ISO week,
    counted in every later week they return — the triangle chart behind
    'week-N retention'.

    Scale: distinct (user, week) first (the big reduction — bounded by
    users × weeks, not by raw events), then the per-user cohort aggregate
    and the cohort join both run on user_id — the groupBy output is
    already hash-partitioned on the join key, so the join adds no new
    shuffle of the large side; the final (cohort, offset) aggregate is a
    cells-sized rollup."""
    events = load_table(spark, sf_dir, "events")
    weekly = events.select(
        "user_id", F.to_date(F.date_trunc("week", "ts")).alias("active_week")
    ).distinct()
    cohort = weekly.groupBy("user_id").agg(
        F.min("active_week").alias("cohort_week")
    )
    return (
        weekly.join(cohort, "user_id")
        .select(
            "cohort_week",
            (F.datediff("active_week", "cohort_week") / 7)
            .cast("int")
            .alias("week_offset"),
            "user_id",
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.count_distinct("user_id").alias("n_users"))
    )


TS_PROBE_USERS = (1, 2, 3)
TS_MIN_COMMON_DAYS = 10
TS_TOP_K = 5


@query(
    "wn_timeseries_similarity",
    survey_id="WN-8/LLM-4",
    oracle=f"""
        WITH series AS (
            SELECT user_id, ts::DATE AS day,
                   SUM(value) AS v
            FROM events GROUP BY 1, 2
        ), pairs AS (
            SELECT p.user_id AS probe_id, s.user_id AS other_id,
                   ROUND(corr(p.v, s.v), 6) AS corr_v,
                   COUNT(*)                 AS n_common
            FROM series p
            JOIN series s ON p.day = s.day AND p.user_id <> s.user_id
            WHERE p.user_id IN {TS_PROBE_USERS!r}
            GROUP BY 1, 2
            HAVING COUNT(*) >= {TS_MIN_COMMON_DAYS}
        )
        SELECT probe_id, other_id, corr_v, n_common
        FROM pairs
        QUALIFY ROW_NUMBER() OVER (
            PARTITION BY probe_id ORDER BY corr_v DESC, other_id
        ) <= {TS_TOP_K}
    """,
)
def wn_timeseries_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series similarity search (the distributed-streaming-similarity
    shape of EDBT'19): per-user daily activity series, then the top-k
    most-correlated users for each PROBE series over their aligned active days.

    Scale: the all-pairs correlation matrix is quadratic in users and is
    never built — probes are a fixed small set, so the probe series
    BROADCASTS and the corpus series streams through a map-side equi-join
    on the day key (no corpus shuffle for the join; one shuffle for the
    per-pair corr aggregate, which is map-side combined on the co-moment
    partials). Growing the probe set scales cost linearly, not
    quadratically."""
    events = load_table(spark, sf_dir, "events")
    series = events.groupBy(
        "user_id", F.to_date("ts").alias("day")
    ).agg(F.sum("value").alias("v"))
    probes = series.filter(F.col("user_id").isin(*TS_PROBE_USERS)).select(
        F.col("user_id").alias("probe_id"),
        "day",
        F.col("v").alias("pv"),
    )
    pairs = (
        series.join(F.broadcast(probes), "day")
        .filter(F.col("user_id") != F.col("probe_id"))
        .groupBy("probe_id", F.col("user_id").alias("other_id"))
        .agg(
            F.round(F.corr("pv", "v"), 6).alias("corr_v"),
            F.count(F.lit(1)).alias("n_common"),
        )
        .filter(F.col("n_common") >= TS_MIN_COMMON_DAYS)
    )
    w = Window.partitionBy("probe_id").orderBy(
        F.col("corr_v").desc(), F.col("other_id")
    )
    return (
        pairs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= TS_TOP_K)
        .select("probe_id", "other_id", "corr_v", "n_common")
    )


@query(
    "wn_activity_streaks",
    survey_id="WN-8/WN-3",
    oracle="""
        WITH days AS (
            SELECT DISTINCT user_id, ts::DATE AS day FROM events
        ), islands AS (
            SELECT user_id, day,
                   day - CAST(ROW_NUMBER() OVER (
                       PARTITION BY user_id ORDER BY day
                   ) AS INT) AS island
            FROM days
        ), streaks AS (
            SELECT user_id,
                   CAST(COUNT(*) AS BIGINT) AS streak_days,
                   MIN(day)                 AS streak_start
            FROM islands GROUP BY user_id, island
        )
        SELECT user_id, streak_days, streak_start
        FROM streaks
        QUALIFY ROW_NUMBER() OVER (
            PARTITION BY user_id ORDER BY streak_days DESC, streak_start
        ) = 1
    """,
)
def wn_activity_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: each user's LONGEST run of consecutive active
    days (the engagement-streak metric). The classic trick — day minus
    its per-user rank is constant within a consecutive run — turns streak
    detection into a plain groupBy, no self-join or iterative logic.

    Scale: distinct (user, day) first (the users×days reduction), then
    ONE exchange on user_id feeds the rank window, the island aggregate
    and the final keep-longest window — three keyed passes, one shuffle."""
    events = load_table(spark, sf_dir, "events")
    days = events.select("user_id", F.to_date("ts").alias("day")).distinct()
    w_rank = Window.partitionBy("user_id").orderBy("day")
    islands = days.withColumn(
        "island", F.date_sub("day", F.row_number().over(w_rank))
    )
    streaks = islands.groupBy("user_id", "island").agg(
        F.count(F.lit(1)).alias("streak_days"),
        F.min("day").alias("streak_start"),
    )
    w_best = Window.partitionBy("user_id").orderBy(
        F.col("streak_days").desc(), F.col("streak_start")
    )
    return (
        streaks.withColumn("rn", F.row_number().over(w_best))
        .filter(F.col("rn") == 1)
        .select("user_id", "streak_days", "streak_start")
    )


@query(
    "wn_period_over_period",
    survey_id="WN-3/AG-1",
    oracle="""
        WITH daily AS (
            SELECT ts::DATE AS day, event_type,
                   ROUND(SUM(value), 2) AS daily_value
            FROM events GROUP BY 1, 2
        )
        SELECT day, event_type, daily_value,
               ROUND(daily_value - LAG(daily_value) OVER (
                   PARTITION BY event_type ORDER BY day
               ), 2) AS dod_change,
               ROUND((daily_value - LAG(daily_value, 7) OVER (
                   PARTITION BY event_type ORDER BY day
               )) / LAG(daily_value, 7) OVER (
                   PARTITION BY event_type ORDER BY day
               ), 6) AS wow_pct
        FROM daily
    """,
)
def wn_period_over_period(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Period-over-period deltas: day-over-day absolute change and
    week-over-week percent change of daily value per event type — the
    trend panel of every metrics dashboard.

    Scale: the fact table reduces to the (days × types) series FIRST
    (map-side combined aggregate); both lag windows then run on that
    calendar-sized table partitioned by type — window-over-aggregate,
    never window-over-fact."""
    events = load_table(spark, sf_dir, "events")
    daily = events.groupBy(
        F.to_date("ts").alias("day"), "event_type"
    ).agg(F.round(F.sum("value"), 2).alias("daily_value"))
    w = Window.partitionBy("event_type").orderBy("day")
    prev_day = F.lag("daily_value").over(w)
    prev_week = F.lag("daily_value", 7).over(w)
    return daily.select(
        "day",
        "event_type",
        "daily_value",
        F.round(F.col("daily_value") - prev_day, 2).alias("dod_change"),
        F.round((F.col("daily_value") - prev_week) / prev_week, 6).alias(
            "wow_pct"
        ),
    )


@query(
    "wn_session_conversion",
    survey_id="WN-6/AG-1",
    oracle=f"""
        WITH flagged AS (
            SELECT user_id, event_id, event_type, ts,
                   CASE WHEN ts::TIMESTAMP
                          - LAG(ts::TIMESTAMP) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                          > INTERVAL {SESSION_GAP_MINUTES} MINUTE
                        OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                        THEN 1 ELSE 0 END AS is_new
            FROM events
        ), numbered AS (
            SELECT user_id, event_type,
                   CAST(SUM(is_new) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS BIGINT) AS session_id
            FROM flagged
        ), sessions AS (
            SELECT user_id, session_id,
                   MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                       AS converted
            FROM numbered GROUP BY user_id, session_id
        )
        SELECT user_id,
               CAST(COUNT(*) AS BIGINT)       AS n_sessions,
               CAST(SUM(converted) AS BIGINT) AS n_converted,
               ROUND(SUM(converted) / COUNT(*)::DOUBLE, 6) AS conversion_rate
        FROM sessions
        GROUP BY user_id
    """,
)
def wn_session_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session conversion rate: share of a user's sessions that contain a
    purchase — sessionization (WN-6) composed with per-session outcome
    aggregation, the metric behind 'X% of visits convert'.

    Scale: the session numbering and both aggregates all key on user_id —
    one exchange feeds the lag window, the cumulative-sum window, the
    per-session reduce and the per-user rollup. Session ids come from the
    shared events_with_session_ids helper (one session definition)."""
    events = load_table(spark, sf_dir, "events")
    sessions = (
        events_with_session_ids(events)
        .groupBy("user_id", "session_id")
        .agg(
            F.max(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            ).alias("converted")
        )
    )
    return sessions.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.sum("converted").cast("bigint").alias("n_converted"),
        F.round(
            F.sum("converted") / F.count(F.lit(1)).cast("double"), 6
        ).alias("conversion_rate"),
    )


@query(
    "wn_ranking_semantics",
    survey_id="WN-2/WN-5",
    oracle="""
        SELECT l_orderkey, l_linenumber, l_quantity,
               RANK()       OVER w AS qty_rank,
               DENSE_RANK() OVER w AS qty_dense_rank,
               ROW_NUMBER() OVER (
                   PARTITION BY l_orderkey
                   ORDER BY l_quantity DESC, l_linenumber
               ) AS qty_row_number
        FROM lineitem
        WINDOW w AS (PARTITION BY l_orderkey ORDER BY l_quantity DESC)
    """,
)
def wn_ranking_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The three ranking functions side-by-side on a tie-prone measure:
    rank() leaves gaps after ties, dense_rank() doesn't, row_number()
    breaks ties (and therefore NEEDS the unique tiebreak column — the
    other two are deterministic on ties by construction, which is why
    only row_number's window carries l_linenumber). Choosing wrongly is
    a classic silent-dedup/top-k bug; this query pins all three
    semantics against the oracle at once."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    w_ties = Window.partitionBy("l_orderkey").orderBy(F.col("l_quantity").desc())
    w_total = Window.partitionBy("l_orderkey").orderBy(
        F.col("l_quantity").desc(), F.col("l_linenumber")
    )
    return lineitem.select(
        "l_orderkey",
        "l_linenumber",
        "l_quantity",
        F.rank().over(w_ties).alias("qty_rank"),
        F.dense_rank().over(w_ties).alias("qty_dense_rank"),
        F.row_number().over(w_total).alias("qty_row_number"),
    )


@query(
    "wn_transition_matrix",
    survey_id="WN-3",
    oracle="""
        WITH seq AS (
            SELECT event_type,
                   LEAD(event_type) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                   ) AS next_type
            FROM events
        )
        SELECT event_type, next_type,
               COUNT(*) AS n_transitions,
               ROUND(COUNT(*) * 1.0
                     / SUM(COUNT(*)) OVER (PARTITION BY event_type),
                     6) AS p_transition
        FROM seq
        WHERE next_type IS NOT NULL
        GROUP BY event_type, next_type
    """,
)
def wn_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event sequences:
    P(next_type | event_type), the standard behavioural-model / anomaly
    baseline over clickstreams.

    Scale shape: ONE shuffle for the per-user lead() window (key-partitioned,
    linear per group), then the pair counts collapse to |event_type|² rows —
    at most a few hundred — so the row-normalising window over `event_type`
    runs on a trivially small aggregate, not on events. At 100 TB nothing
    after the first window touches more than the matrix itself."""
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    counts = (
        events.select(
            "event_type", F.lead("event_type").over(w).alias("next_type")
        )
        .filter(F.col("next_type").isNotNull())
        .groupBy("event_type", "next_type")
        .agg(F.count("*").alias("n_transitions"))
    )
    row_total = Window.partitionBy("event_type")
    return counts.select(
        "event_type",
        "next_type",
        "n_transitions",
        F.round(
            F.col("n_transitions") / F.sum("n_transitions").over(row_total), 6
        ).alias("p_transition"),
    )


@query(
    "wn_attribution_last_touch",
    survey_id="WN-3/JN-8",
    oracle="""
        WITH clicks AS (
            SELECT user_id, ts, MAX(event_id) AS click_id
            FROM events WHERE event_type = 'click'
            GROUP BY user_id, ts
        ), purchases AS (
            SELECT event_id, user_id, ts, ROUND(value, 2) AS purchase_value
            FROM events WHERE event_type = 'purchase'
        )
        SELECT p.event_id AS purchase_id,
               p.user_id  AS user_id,
               p.purchase_value,
               c.click_id AS attributed_click_id,
               epoch_us(p.ts::TIMESTAMP) - epoch_us(c.ts::TIMESTAMP)
                   AS click_to_purchase_us
        FROM purchases p
        ASOF LEFT JOIN clicks c
          ON p.user_id = c.user_id AND p.ts >= c.ts
    """,
)
def wn_attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch attribution: every purchase is credited to the same
    user's most recent click at-or-before it (purchases with no prior
    click kept, unattributed) — the canonical marketing-attribution shape,
    and a second consumer of the generic as-of join.

    Scale shape: identical to jn_asof_event_order — clicks are pre-deduped
    to one row per (user, ts) (max event_id wins ties, mirroring the
    oracle), then the union-window composition does ONE shuffle on
    user_id and a single ordered pass; no range-candidate explosion at any
    scale. The oracle cross-checks against DuckDB's native ASOF LEFT JOIN."""
    from .joins import asof_join

    events = load_table(spark, sf_dir, "events")
    clicks = (
        events.filter(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("click_id"))
        .withColumn("click_ts", F.col("ts"))  # carried through the as-of
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", F.round("value", 2).alias("purchase_value")
    )
    joined = asof_join(
        purchases, clicks, key="user_id", left_ts="ts", right_ts="ts",
        value_cols=["click_id", "click_ts"],
    )
    return joined.select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        "purchase_value",
        F.col("asof_click_id").alias("attributed_click_id"),
        (F.unix_micros("ts") - F.unix_micros("asof_click_ts")).alias(
            "click_to_purchase_us"
        ),
    )


@query(
    "wn_gap_fill_locf",
    survey_id="WN-4/ETL-6",
    oracle="""
        WITH daily AS (
            SELECT user_id,
                   (date_trunc('day', ts::TIMESTAMP))::DATE AS day,
                   ROUND(SUM(value), 2) AS day_value
            FROM events GROUP BY 1, 2
        ), span AS (
            SELECT user_id, MIN(day) AS d0, MAX(day) AS d1 FROM daily GROUP BY 1
        ), spine AS (
            SELECT user_id,
                   unnest(generate_series(d0::TIMESTAMP, d1::TIMESTAMP,
                                          INTERVAL 1 DAY))::DATE AS day
            FROM span
        )
        SELECT s.user_id, s.day, d.day_value,
               LAST_VALUE(d.day_value IGNORE NULLS) OVER (
                   PARTITION BY s.user_id ORDER BY s.day
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS filled_value,
               d.day_value IS NULL AS is_gap
        FROM spine s LEFT JOIN daily d USING (user_id, day)
    """,
)
def wn_gap_fill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap fill: densify each user's daily value series over
    their own [first_day, last_day] span and forward-fill missing days
    with the last observation carried forward (LOCF) — the standard
    regularisation step before feature windows or resampling.

    Scale shape: the daily pre-aggregate collapses events to ≤ users×days
    rows BEFORE any spine work, the per-user span is a cheap second agg of
    that, and sequence()+explode densifies without a driver loop. Fill is
    last(ignorenulls) over a user-partitioned window — ONE shuffle on
    user_id shared by join and window. Spine size is bounded by span×users,
    not by raw event count, so at 100 TB the heavy table is touched once."""
    events = load_table(spark, sf_dir, "events")
    daily = events.groupBy(
        "user_id", F.date_trunc("day", "ts").cast("date").alias("day")
    ).agg(F.round(F.sum("value"), 2).alias("day_value"))
    spine = (
        daily.groupBy("user_id")
        .agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
        .select(
            "user_id",
            F.explode(F.expr("sequence(d0, d1, interval 1 day)")).alias("day"),
        )
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        spine.join(daily, ["user_id", "day"], "left")
        .select(
            "user_id",
            "day",
            "day_value",
            F.last("day_value", ignorenulls=True).over(w).alias("filled_value"),
            F.col("day_value").isNull().alias("is_gap"),
        )
    )


def two_phase_global_cumsum(
    df: DataFrame, order_exprs: list, value_col, num_partitions: int = 32
):
    """two_phase_global_rank's pattern extended to running SUMS: range-
    repartition on the total order, reduce each partition to (row count,
    value sum) — ≤ num_partitions rows collected — prefix-sum BOTH into
    per-partition offsets, then global rank = offset + row_number and
    global cumulative sum = sum offset + within-partition running sum.
    Returns (df + rank/cum columns, total_rows, total_sum).

    Same pin-before-collect requirement as two_phase_global_rank
    (range bounds are sampled per execution, so the offsets job and the
    window job must see ONE physical partitioning). The pin is a
    lineage-truncating checkpoint, NOT ``.persist()``: a persist here has
    no reachable unpersist site (callers never see the handle), so every
    invocation would pin a fresh InMemoryRelation in the CacheManager
    until session end (round-8 review finding — the exact leak class the
    dedup-rate-trend rewrite removed). The checkpointed blocks are
    instead reclaimed by the ContextCleaner once the frame goes out of
    scope. No task ever holds more than ~N/num_partitions rows."""
    from .dedup import _truncate_lineage

    ranged = _truncate_lineage(
        df.repartitionByRange(num_partitions, *order_exprs).withColumn(
            "__pid", F.spark_partition_id()
        )
    )
    parts = {
        r["__pid"]: (r["n"], r["s"])
        for r in ranged.groupBy("__pid")
        .agg(F.count(F.lit(1)).alias("n"), F.sum(value_col).alias("s"))
        .collect()
    }
    total_n = sum(n for n, _ in parts.values())
    total_s = sum(s for _, s in parts.values())
    n_off, s_off, acc_n, acc_s = {}, {}, 0, 0.0
    for pid in sorted(parts):
        n_off[pid], s_off[pid] = acc_n, acc_s
        acc_n += parts[pid][0]
        acc_s += parts[pid][1]
    if parts:
        n_map = F.create_map(*[F.lit(v) for kv in n_off.items() for v in kv])
        s_map = F.create_map(*[F.lit(v) for kv in s_off.items() for v in kv])
    else:
        # empty input: a bare map() literal is VOID-typed and fails the
        # lookup's analysis — use typed empty maps so the (rowless) plan
        # still resolves and downstream consumers see the right schema
        n_map = F.lit(None).cast("map<int,bigint>")
        s_map = F.lit(None).cast("map<int,double>")
    w = Window.partitionBy("__pid").orderBy(*order_exprs)
    w_cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    out = (
        ranged.withColumn(
            "rank", F.row_number().over(w) + n_map[F.col("__pid")]
        )
        .withColumn(
            "cum_sum", F.sum(value_col).over(w_cum) + s_map[F.col("__pid")]
        )
        .drop("__pid")
    )
    return out, total_n, total_s


@query(
    "wn_pareto_share",
    survey_id="WN-5/AG-1",
    oracle="""
        WITH rev AS (
            SELECT o_custkey, ROUND(SUM(o_totalprice), 2) AS revenue
            FROM orders GROUP BY o_custkey
        ), r AS (
            SELECT o_custkey, revenue,
                   ROW_NUMBER() OVER (ORDER BY revenue DESC, o_custkey)
                       AS rev_rank,
                   SUM(revenue) OVER (ORDER BY revenue DESC, o_custkey
                                      ROWS UNBOUNDED PRECEDING) AS cum_rev,
                   SUM(revenue) OVER () AS tot
            FROM rev
        )
        SELECT o_custkey, revenue, rev_rank,
               ROUND(cum_rev / tot, 6) AS cum_share,
               ROUND((cum_rev - revenue) / tot, 6) < 0.8 AS is_pareto_head
        FROM r
    """,
)
def wn_pareto_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto / Lorenz concentration analysis: customers ranked by total
    revenue with their CUMULATIVE revenue share, flagging the minimal
    head set covering 80% of revenue — the 'which 20% of customers pay
    for everything' report, and the revenue twin of data-skew triage
    (etl_skew_report asks the same question of join keys).

    The global running sum CANNOT use a single-partition window at scale;
    this is the two-phase pattern extended from ranks to sums
    (two_phase_global_cumsum): per-customer revenues reduce first, range-
    repartition on (revenue DESC, custkey), per-partition (count, sum)
    offsets collect (≤32 rows), and rank + cumulative sum are offset +
    within-partition window — no task holds more than ~1/32 of customers.
    Revenues are pre-rounded so both engines accumulate identical values;
    the head flag uses the PRE-row share (a customer is head if the total
    BEFORE them is still under 80%), rounded before comparison."""
    orders = load_table(spark, sf_dir, "orders")
    rev = orders.groupBy("o_custkey").agg(
        F.round(F.sum("o_totalprice"), 2).alias("revenue")
    )
    ranked, _, total_rev = two_phase_global_cumsum(
        rev, [F.col("revenue").desc(), F.col("o_custkey")], "revenue"
    )
    return ranked.select(
        "o_custkey",
        "revenue",
        F.col("rank").alias("rev_rank"),
        F.round(F.col("cum_sum") / F.lit(total_rev), 6).alias("cum_share"),
        (
            F.round(
                (F.col("cum_sum") - F.col("revenue")) / F.lit(total_rev), 6
            )
            < 0.8
        ).alias("is_pareto_head"),
    )


@query(
    "wn_event_paths",
    survey_id="WN-3/WN-6",
    oracle=f"""
        WITH flagged AS (
            SELECT user_id, ts, event_id, event_type,
                   CASE WHEN ts::TIMESTAMP
                          - LAG(ts::TIMESTAMP) OVER w > INTERVAL {SESSION_GAP_MINUTES} MINUTE
                        OR LAG(ts) OVER w IS NULL
                        THEN 1 ELSE 0 END AS is_new
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ), sess AS (
            SELECT user_id, ts, event_id, event_type,
                   SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                     ROWS UNBOUNDED PRECEDING) AS session_id
            FROM flagged
        ), paths AS (
            SELECT event_type || '>' || LEAD(event_type, 1) OVER w2
                       || '>' || LEAD(event_type, 2) OVER w2 AS path
            FROM sess
            WINDOW w2 AS (PARTITION BY user_id, session_id ORDER BY ts, event_id)
        )
        SELECT path, COUNT(*) AS n_occurrences
        FROM paths WHERE path IS NOT NULL
        GROUP BY path
    """,
)
def wn_event_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session path mining: every 3-step event-type path users walk
    WITHIN a session, with occurrence counts — the Sankey/flow-diagram
    feed and the n-step generalization of wn_transition_matrix (which
    sees only adjacent pairs and ignores session boundaries).

    Derives sessions from events_with_session_ids — the SINGLE session
    definition shared with sessionize/conversion, so path and session
    analytics can never disagree on boundaries. Scale: the two lead()
    calls share one (user, session)-keyed window pass (one shuffle,
    linear per group); paths then collapse to the |event_types|³-bounded
    path vocabulary in a partial-agg shuffle of counts."""
    events = load_table(spark, sf_dir, "events")
    sess = events_with_session_ids(events)
    w = Window.partitionBy("user_id", "session_id").orderBy("ts", "event_id")
    path = F.concat_ws(
        ">",
        F.col("event_type"),
        F.lead("event_type", 1).over(w),
        F.lead("event_type", 2).over(w),
    )
    # concat_ws skips nulls (no 3-step suffix at session tails); require
    # the full 3 steps like the oracle's || which nulls out instead
    return (
        sess.select(
            path.alias("path"),
            F.lead("event_type", 2).over(w).isNotNull().alias("__full"),
        )
        .filter(F.col("__full"))
        .groupBy("path")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
    )


@query(
    "wn_seasonal_residual_anomaly",
    survey_id="WN-4/ETL-6",
    oracle="""
        WITH base AS (
            SELECT dayofweek(ts::TIMESTAMP) + 1 AS dow,
                   hour(ts::TIMESTAMP)           AS hod,
                   AVG(value)                    AS mean_value,
                   stddev_samp(value)            AS sd_value
            FROM events GROUP BY 1, 2
        )
        SELECT e.event_id, e.event_type,
               ROUND(e.value, 2) AS value,
               b.dow, b.hod,
               ROUND((e.value - b.mean_value) / b.sd_value, 6) AS residual_z
        FROM events e
        JOIN base b ON dayofweek(e.ts::TIMESTAMP) + 1 = b.dow
                   AND hour(e.ts::TIMESTAMP) = b.hod
        WHERE abs((e.value - b.mean_value) / b.sd_value) > 3.0
    """,
)
def wn_seasonal_residual_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-baseline anomaly detection: each event is compared to the
    mean/stddev of ITS OWN day-of-week × hour-of-day cell (the
    ag_seasonality_profile baseline), and events beyond |3σ| of their
    seasonal norm are flagged — 'is this value strange FOR a Tuesday
    3 am?', the question a global or per-type gate (etl_anomaly_zscore)
    cannot ask. Same dayofweek off-by-one pin as the profile.

    Scale: the baseline is ≤168 cells from one partial-agg shuffle,
    BROADCAST back onto the stream so flagging is a narrow filter — the
    classic reduce-then-rejoin shape; a per-cell window would shuffle
    every event into at most 168 partitions (max skew) for no gain.
    stddev is used (not MAD) deliberately: per-cell populations are large
    and the baseline wants sensitivity to variance shifts; the robust
    alternative is one agg swap away."""
    events = load_table(spark, sf_dir, "events")
    keyed = events.withColumn("dow", F.dayofweek("ts")).withColumn(
        "hod", F.hour("ts")
    )
    base = keyed.groupBy("dow", "hod").agg(
        F.avg("value").alias("mean_value"),
        F.stddev_samp("value").alias("sd_value"),
    )
    z = (F.col("value") - F.col("mean_value")) / F.col("sd_value")
    return (
        keyed.join(F.broadcast(base), ["dow", "hod"])
        .filter(F.abs(z) > 3.0)
        .select(
            "event_id",
            "event_type",
            F.round("value", 2).alias("value"),
            "dow",
            "hod",
            F.round(z, 6).alias("residual_z"),
        )
    )


DEBOUNCE_GAP_MINUTES = 5


@query(
    "wn_alert_debounce",
    survey_id="WN-6/WN-1",
    oracle=f"""
        WITH flagged AS (
            SELECT user_id, event_type, ts, event_id,
                   CASE WHEN ts::TIMESTAMP - LAG(ts::TIMESTAMP) OVER w
                          > INTERVAL {DEBOUNCE_GAP_MINUTES} MINUTE
                        OR LAG(ts) OVER w IS NULL
                        THEN 1 ELSE 0 END AS is_new
            FROM events
            WINDOW w AS (PARTITION BY user_id, event_type ORDER BY ts, event_id)
        ), bursts AS (
            SELECT *, SUM(is_new) OVER (
                PARTITION BY user_id, event_type ORDER BY ts, event_id
                ROWS UNBOUNDED PRECEDING) AS session_id
            FROM flagged
        )
        SELECT user_id, event_type, session_id::BIGINT AS burst_id,
               MIN(event_id) AS first_event_id,
               MIN(ts::TIMESTAMP) AS burst_start,
               COUNT(*) - 1 AS n_suppressed
        FROM bursts
        GROUP BY user_id, event_type, session_id
    """,
)
def wn_alert_debounce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Alert debouncing / burst suppression: repeats of the same
    (user, event_type) within a rolling 5-minute CHAIN collapse into one
    burst — emit the first event plus the suppressed count, the paging
    dedup every ops pipeline needs. Note the semantics: a burst extends
    as long as each repeat is within 5 min of the PREVIOUS one (true
    debounce), which a fixed 5-minute tumbling bucket gets wrong at
    bucket edges — so this derives from the shared gaps-and-islands
    helper with a (user, type) key and a 5-min gap, not from date
    truncation.

    Scale: identical to sessionization — ONE shuffle on the (user, type)
    key shared by the lag, the cumulative burst id, and the final
    per-burst aggregate."""
    events = load_table(spark, sf_dir, "events")
    bursts = events_with_session_ids(
        events, keys=("user_id", "event_type"), gap_minutes=DEBOUNCE_GAP_MINUTES
    )
    return bursts.groupBy(
        "user_id", "event_type", F.col("session_id").alias("burst_id")
    ).agg(
        F.min("event_id").alias("first_event_id"),
        F.min("ts").alias("burst_start"),
        (F.count(F.lit(1)) - 1).alias("n_suppressed"),
    )


@query(
    "wn_rolling_median",
    survey_id="WN-4/AG-7",
    oracle="""
        SELECT event_id, user_id, ROUND(value, 2) AS value,
               lst[(len(lst) + 1) // 2] AS rolling_median
        FROM (
            SELECT event_id, user_id, value,
                   list_sort(list(ROUND(value, 2)) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN 6 PRECEDING AND CURRENT ROW
                   )) AS lst
            FROM events
        )
    """,
)
def wn_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling MEDIAN smoother: the lower median of each user's trailing
    7 values — the robust de-noiser for spiky telemetry (one outlier
    shifts a rolling mean for 7 rows; the rolling median shrugs it off,
    which is why wn_rolling_sum and this ship side by side).

    Neither engine supports percentile functions over window frames, so
    both compute the DISCRETE lower median the same way: collect the
    bounded frame (≤7 values, pre-rounded so the sort keys are
    identical), sort, index (n+1)÷2 — cross-engine exact because the
    result is always an actual data value, never an interpolation. Scale:
    one shuffle on user_id like every keyed window; the per-row cost is
    sorting ≤7 elements, and the frame bound (not data volume) caps
    memory. For wide frames the production swap is a running two-heap
    sketch inside applyInPandasWithState — noted, not needed at frame 7."""
    events = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-6, Window.currentRow)
    )
    lst = F.sort_array(F.collect_list(F.round("value", 2)).over(w))
    return events.select(
        "event_id",
        "user_id",
        F.round("value", 2).alias("value"),
        # collect_list drops nulls, so an all-null frame leaves an EMPTY
        # list and index (0+1)/2 = 0 — Spark throws INVALID_INDEX_OF_ZERO
        # (even via try_element_at) where DuckDB's lst[0] is NULL; the
        # lazy CASE produces the oracle's NULL instead (round-6 strict
        # collect() sweep finding on the nulled-payload fixture)
        F.when(
            F.size(lst) > 0,
            F.element_at(lst, F.floor((F.size(lst) + 1) / 2).cast("int")),
        ).alias("rolling_median"),
    )


EMA_ALPHA = 0.3
EMA_SPAN = 10
#: Exact double weights alpha*(1-alpha)^age, age 0 (current) .. span-1 —
#: precomputed in Python and embedded as IDENTICAL literals in both
#: engines: computing pow() independently per engine differs in the last
#: ulp for some exponents, which flips 6-dp rounding at boundaries.
_EMA_WEIGHTS = [EMA_ALPHA * (1 - EMA_ALPHA) ** k for k in range(EMA_SPAN)]
_EMA_WEIGHTS_SQL = "[" + ", ".join(repr(w) for w in _EMA_WEIGHTS) + "]"


@query(
    "wn_ema_smoothing",
    survey_id="WN-4",
    oracle=f"""
        SELECT event_id, user_id,
               ROUND(list_sum(list_transform(lst,
                   (x, i) -> x * ({_EMA_WEIGHTS_SQL})[len(lst) - i + 1])), 6)
                   AS ema_value
        FROM (
            SELECT event_id, user_id,
                   list(ROUND(value, 2)) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN {EMA_SPAN - 1} PRECEDING AND CURRENT ROW
                   ) AS lst
            FROM events
        )
    """,
)
def wn_ema_smoothing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Truncated exponential moving average: per user, each value smoothed
    as α·Σ(1−α)^age over its trailing 10-row frame — the recency-weighted
    smoother between the uniform rolling mean and the robust rolling
    median. True EMA is a per-row recursion no window frame can express;
    truncating at span 10 leaves a ≤(1−α)^10 ≈ 2.8% tail, the standard
    practical cut, and makes the operator a pure frame computation.

    Cross-engine exactness: the α(1−α)^age weights are precomputed ONCE
    in Python and embedded as identical double literals in both engines
    (independent pow() evaluation differs in the last ulp — measured —
    and flips 6-dp rounding); the ordered frame then folds
    position-for-position (DuckDB's (x, i) lambda is 1-based, Spark's
    0-based — both index age via list length minus position). Scale: one
    keyed shuffle; per-row cost is a ≤10-element array fold. The
    untruncated production form is the applyInPandasWithState running
    recursion (STR-6's machinery)."""
    events = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-(EMA_SPAN - 1), Window.currentRow)
    )
    lst = F.collect_list(F.round("value", 2)).over(w)
    n = F.size(lst)
    weights = F.array(*[F.lit(wt) for wt in _EMA_WEIGHTS])

    ema = F.aggregate(
        F.transform(
            lst, lambda x, i: x * F.element_at(weights, n - i)
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    return events.select(
        "event_id",
        "user_id",
        F.round(ema, 6).alias("ema_value"),
    )


@query(
    "wn_max_drawdown",
    survey_id="WN-4",
    oracle="""
        WITH flow AS (
            SELECT user_id, ts, event_id,
                   CASE WHEN event_type IN ('purchase', 'signup')
                        THEN ROUND(value, 2) ELSE -ROUND(value, 2) END AS net
            FROM events
        ), cum AS (
            SELECT user_id, ts, event_id,
                   SUM(net) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       AS bal
            FROM flow
        ), dd AS (
            SELECT user_id, bal,
                   MAX(bal) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       - bal AS drawdown
            FROM cum
        )
        SELECT user_id,
               ROUND(MAX(drawdown), 4) AS max_drawdown,
               ROUND(MIN(bal), 4)      AS min_balance,
               ROUND(MAX(bal), 4)      AS peak_balance
        FROM dd
        GROUP BY user_id
    """,
)
def wn_max_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximum drawdown per user: running net balance (purchases/signups
    credit, clicks/views/errors debit), tracked against its running peak —
    the largest peak-to-trough fall is THE risk statistic for any
    cumulative series (budgets, account balances, model-reward curves).

    Determinism: the running sum folds values sequentially in (ts,
    event_id) order on both engines, so the IEEE accumulation order is
    identical; inputs are pre-rounded to 2 dp so both engines fold the
    same doubles. Scale: one shuffle on user_id feeds BOTH stacked
    windows (same partitioning + ordering → Catalyst plans a single
    Window node chain over one sort, no second exchange) and the final
    per-user aggregate reuses the same partitioning."""
    events = load_table(spark, sf_dir, "events")
    net = F.when(
        F.col("event_type").isin("purchase", "signup"), F.round("value", 2)
    ).otherwise(-F.round("value", 2))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    bal = F.sum(net).over(run)
    flow = events.select("user_id", "ts", "event_id", bal.alias("bal"))
    dd = flow.select(
        "user_id",
        "bal",
        (F.max("bal").over(run) - F.col("bal")).alias("drawdown"),
    )
    return dd.groupBy("user_id").agg(
        F.round(F.max("drawdown"), 4).alias("max_drawdown"),
        F.round(F.min("bal"), 4).alias("min_balance"),
        F.round(F.max("bal"), 4).alias("peak_balance"),
    )


@query(
    "wn_change_point",
    survey_id="WN-4/AG-1",
    oracle="""
        WITH daily AS (
            SELECT event_type, CAST(ts::TIMESTAMP AS DATE) AS d,
                   ROUND(SUM(value), 4) AS day_sum,
                   CAST(COUNT(*) AS BIGINT) AS day_cnt
            FROM events GROUP BY 1, 2
        ), run AS (
            SELECT event_type, d,
                   SUM(day_sum) OVER w AS pre_sum,
                   SUM(day_cnt) OVER w AS pre_cnt
            FROM daily
            WINDOW w AS (PARTITION BY event_type ORDER BY d
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        ), pre AS (
            SELECT event_type, d, pre_sum, pre_cnt,
                   LAST_VALUE(pre_sum) OVER p AS tot_sum,
                   LAST_VALUE(pre_cnt) OVER p AS tot_cnt
            FROM run
            WINDOW p AS (PARTITION BY event_type ORDER BY d
                         ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND UNBOUNDED FOLLOWING)
        ), scored AS (
            SELECT event_type, d AS split_day,
                   ROUND(pre_sum / pre_cnt, 6) AS mean_before,
                   ROUND((tot_sum - pre_sum) / (tot_cnt - pre_cnt), 6)
                       AS mean_after,
                   ROUND(ABS(pre_sum / pre_cnt
                             - (tot_sum - pre_sum) / (tot_cnt - pre_cnt)), 6)
                       AS shift
            FROM pre WHERE pre_cnt < tot_cnt
        )
        SELECT * FROM scored
        QUALIFY ROW_NUMBER() OVER (
            PARTITION BY event_type ORDER BY shift DESC, split_day
        ) = 1
    """,
)
def wn_change_point(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change-point detection (binary segmentation, step 1): per event
    type, the split day that maximizes the |mean before − mean after|
    shift of the daily value series — where a metric's level actually
    moved, which is the question behind every "did the deploy change
    things" incident review.

    Scale: the raw stream reduces to a calendar-sized daily table FIRST
    (one keyed agg); all window work — running sums, totals via
    LAST_VALUE of the same running sum, O(days) candidate scoring —
    happens on that tiny series. Totals deliberately reuse the
    sequentially-accumulated running sum's final value instead of a
    second SUM whose accumulation order could differ between engines;
    day sums are pre-rounded so both engines fold identical doubles
    (SURVEY §5.3)."""
    events = load_table(spark, sf_dir, "events")
    daily = events.groupBy(
        "event_type", F.to_date("ts").alias("d")
    ).agg(
        F.round(F.sum("value"), 4).alias("day_sum"),
        F.count(F.lit(1)).alias("day_cnt"),
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("d")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    p = (
        Window.partitionBy("event_type")
        .orderBy("d")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    pre = daily.select(
        "event_type",
        "d",
        F.sum("day_sum").over(w).alias("pre_sum"),
        F.sum("day_cnt").over(w).alias("pre_cnt"),
    ).select(
        "event_type",
        "d",
        "pre_sum",
        "pre_cnt",
        F.last("pre_sum").over(p).alias("tot_sum"),
        F.last("pre_cnt").over(p).alias("tot_cnt"),
    )
    mean_before = F.col("pre_sum") / F.col("pre_cnt")
    mean_after = (F.col("tot_sum") - F.col("pre_sum")) / (
        F.col("tot_cnt") - F.col("pre_cnt")
    )
    scored = pre.filter(F.col("pre_cnt") < F.col("tot_cnt")).select(
        "event_type",
        F.col("d").alias("split_day"),
        F.round(mean_before, 6).alias("mean_before"),
        F.round(mean_after, 6).alias("mean_after"),
        F.round(F.abs(mean_before - mean_after), 6).alias("shift"),
    )
    pick = Window.partitionBy("event_type").orderBy(
        F.col("shift").desc(), F.col("split_day")
    )
    return (
        scored.withColumn("rn", F.row_number().over(pick))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )


@query(
    "wn_skyline_pareto",
    survey_id="WN-2/JN-6",
    oracle="""
        WITH pts AS (
            SELECT s.s_suppkey,
                   CAST(ROUND(SUM(l.l_extendedprice * (1 - l.l_discount))
                              * 100) AS BIGINT) AS rev_cents,
                   ROUND(s.s_acctbal, 2) AS acctbal
            FROM supplier s JOIN lineitem l ON s.s_suppkey = l.l_suppkey
            GROUP BY s.s_suppkey, s.s_acctbal
        )
        SELECT s_suppkey, rev_cents, acctbal FROM pts a
        WHERE NOT EXISTS (
            SELECT 1 FROM pts b
            WHERE b.rev_cents >= a.rev_cents AND b.acctbal >= a.acctbal
              AND (b.rev_cents > a.rev_cents OR b.acctbal > a.acctbal)
        )
    """,
)
def wn_skyline_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skyline / Pareto-frontier query: suppliers not dominated on
    (revenue, account balance) — no other supplier is ≥ on both axes and
    > on one. The classic multi-objective shortlist ("best trade-offs,
    no scalarization") from the OLAP skyline literature.

    The oracle states dominance declaratively (NOT EXISTS — a quadratic
    anti-join); the engine computes the same frontier in O(n log n)
    WITHOUT a global window: points range-partition on x, each partition
    window-computes max(y) over its own strictly-greater-x rows
    (integer-cent RANGE frame makes "strictly" expressible), and the
    cross-partition remainder comes from a ≤ num_partitions suffix-max
    table collected and broadcast back (the two-phase rank/cumsum
    doctrine applied to a suffix aggregate — no task ever holds more
    than ~n/partitions points, so a FACT-sized skyline runs unchanged).
    Same-x ties are co-located by the range partitioner, so the same-x
    max is a partition-local window too. A point survives iff neither
    max exceeds its y."""
    sup = load_table(spark, sf_dir, "supplier")
    li = load_table(spark, sf_dir, "lineitem")
    pts = (
        li.join(sup, li.l_suppkey == sup.s_suppkey)
        .groupBy("s_suppkey", "s_acctbal")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))) * 100)
            .cast("bigint")
            .alias("rev_cents")
        )
        .select(
            "s_suppkey", "rev_cents", F.round("s_acctbal", 2).alias("acctbal")
        )
    )
    ranged = (
        pts.repartitionByRange(32, "rev_cents")
        .withColumn("__pid", F.spark_partition_id())
        .persist()  # pins ONE sampled partitioning for both jobs (two-phase rule)
    )
    part_max = {
        r["__pid"]: r["m"]
        for r in ranged.groupBy("__pid")
        .agg(F.max("acctbal").alias("m"))
        .collect()
    }
    # suffix max over LATER partitions (all their x are strictly greater)
    suffix, acc = {}, None
    for pid in sorted(part_max, reverse=True):
        suffix[pid] = acc
        acc = part_max[pid] if acc is None else max(acc, part_max[pid])
    if part_max:
        later_map = F.create_map(
            *[
                c
                for pid, m in suffix.items()
                for c in (F.lit(pid), F.lit(m).cast("double"))
            ]
        )
    else:
        later_map = F.lit(None).cast("map<int,double>")
    w_gt = (
        Window.partitionBy("__pid")
        .orderBy("rev_cents")
        .rangeBetween(1, Window.unboundedFollowing)
    )
    w_same = Window.partitionBy("__pid", "rev_cents")
    flagged = ranged.select(
        "s_suppkey",
        "rev_cents",
        "acctbal",
        F.greatest(
            F.coalesce(F.max("acctbal").over(w_gt), F.lit(float("-inf"))),
            F.coalesce(later_map[F.col("__pid")], F.lit(float("-inf"))),
        ).alias("max_y_gt"),
        F.max("acctbal").over(w_same).alias("max_y_same"),
    )
    return flagged.filter(
        (F.col("max_y_gt") < F.col("acctbal"))
        & (F.col("max_y_same") <= F.col("acctbal"))
    ).select("s_suppkey", "rev_cents", "acctbal")


@query(
    "wn_time_weighted_average",
    survey_id="WN-3/WN-4",
    oracle="""
        WITH seq AS (
            SELECT user_id, CAST(ts::TIMESTAMP AS DATE) AS d, value,
                   COALESCE(
                       LEAD(epoch_us(ts::TIMESTAMP)) OVER w,
                       epoch_us((CAST(ts::TIMESTAMP AS DATE)
                                 + INTERVAL 1 DAY)::TIMESTAMP)
                   ) - epoch_us(ts::TIMESTAMP) AS dur_us
            FROM events
            WINDOW w AS (PARTITION BY user_id, CAST(ts::TIMESTAMP AS DATE)
                         ORDER BY ts, event_id)
        )
        SELECT user_id, d, CAST(COUNT(*) AS BIGINT) AS n_obs,
               ROUND(SUM(value * dur_us) / SUM(dur_us), 6) AS twap
        FROM seq GROUP BY 1, 2
    """,
)
def wn_time_weighted_average(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average (TWAP): each observation weighted by how long
    it remained the current value — per user per day, the last value
    holding until midnight. The irregular-sampling average every
    hypertable engine ships (a sensor reporting once an hour must not
    count like one reporting every second, which is exactly what a plain
    AVG gets wrong).

    Durations are integer µs differences (lead minus current, computed
    identically on both engines under the UTC session), so the only
    float work is the final weighted sum. Scale: one shuffle on
    (user_id, day) feeds both the LEAD window and the final aggregate —
    the same single-exchange stacking as the funnel and drawdown
    operators."""
    events = load_table(spark, sf_dir, "events")
    day = F.to_date("ts")
    w = Window.partitionBy("user_id", day).orderBy("ts", "event_id")
    day_end_us = F.unix_micros(F.date_add(day, 1).cast("timestamp"))
    dur_us = (
        F.coalesce(F.lead(F.unix_micros("ts")).over(w), day_end_us)
        - F.unix_micros("ts")
    )
    seq = events.select(
        "user_id", day.alias("d"), "value", dur_us.alias("dur_us")
    )
    return seq.groupBy("user_id", "d").agg(
        F.count(F.lit(1)).alias("n_obs"),
        F.round(F.sum(F.col("value") * F.col("dur_us")) / F.sum("dur_us"), 6).alias(
            "twap"
        ),
    )


BOLLINGER_WINDOW = 20
BOLLINGER_K = 2


@query(
    "wn_bollinger_bands",
    survey_id="WN-4/AG-7",
    oracle=f"""
        WITH cents AS (
            SELECT event_id, user_id, ts,
                   CAST(ROUND(value * 100) AS BIGINT) AS c
            FROM events
        ), w AS (
            SELECT event_id, user_id, c / 100.0 AS v,
                   SUM(c) OVER fr / (COUNT(*) OVER fr * 100.0) AS ma,
                   (SUM(c) OVER fr * 100) // (COUNT(*) OVER fr) AS ma_t4,
                   STDDEV_SAMP(c / 100.0) OVER fr AS sd,
                   COUNT(*) OVER fr AS nw
            FROM cents
            WINDOW fr AS (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS BETWEEN {BOLLINGER_WINDOW - 1} PRECEDING
                                   AND CURRENT ROW)
        )
        SELECT event_id, user_id, v,
               ma_t4 / 10000.0 AS ma,
               CASE WHEN nw >= 2 THEN ROUND(ma + {BOLLINGER_K} * sd, 4) END
                   AS upper_band,
               CASE WHEN nw >= 2 THEN ROUND(ma - {BOLLINGER_K} * sd, 4) END
                   AS lower_band,
               CAST(CASE WHEN nw >= 2 AND (v > ma + {BOLLINGER_K} * sd
                                OR v < ma - {BOLLINGER_K} * sd)
                         THEN 1 ELSE 0 END AS INT) AS breakout
        FROM w
    """,
)
def wn_bollinger_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bollinger bands: trailing 20-observation mean ± 2σ per user, with
    a breakout flag when the current value escapes the band — the
    volatility-adaptive anomaly envelope (a fixed threshold misfires on
    both calm and noisy users; ±2σ tracks each user's own regime),
    completing the smoother family (rolling mean/median/EMA) with its
    dispersion companion.

    The first frame row has undefined sample stddev — both engines NULL
    the bands there (nw ≥ 2 gate) rather than emitting a zero-width
    band. The reported moving average is TRUNCATED to 4 dp via integer
    division of cent sums, not rounded: means of 2-dp money land exactly
    on .xxxx5 rounding boundaries, where Spark's round (HALF_UP on the
    double's SHORTEST decimal repr, BigDecimal.valueOf semantics) and
    DuckDB's round (on the exact binary value, which sits just below)
    systematically disagree — measured 8 flips in 10k rows; integer
    floor is engine-proof. Band edges keep normal rounding (ma ± 2σ is
    never an exact decimal). Scale: the one user_id exchange feeds
    mean, stddev, count and the flag from a single bounded frame
    pass."""
    events = load_table(spark, sf_dir, "events")
    fr = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-(BOLLINGER_WINDOW - 1), Window.currentRow)
    )
    cents = F.round(F.col("value") * 100).cast("bigint")
    events = (
        events.withColumn("c", cents)
        .withColumn("sum_c", F.sum("c").over(fr))
        .withColumn("nw", F.count(F.lit(1)).over(fr))
    )
    v = F.col("c") / 100.0
    ma = F.col("sum_c") / (F.col("nw") * 100.0)
    sd = F.stddev_samp(F.col("c") / 100.0).over(fr)
    upper = ma + BOLLINGER_K * sd
    lower = ma - BOLLINGER_K * sd
    has_band = F.col("nw") >= 2
    return events.select(
        "event_id",
        "user_id",
        v.alias("v"),
        (F.expr("(sum_c * 100L) div nw") / 10000.0).alias("ma"),
        F.when(has_band, F.round(upper, 4)).alias("upper_band"),
        F.when(has_band, F.round(lower, 4)).alias("lower_band"),
        F.when(has_band & ((v > upper) | (v < lower)), 1)
        .otherwise(0)
        .cast("int")
        .alias("breakout"),
    )


CUSUM_TARGET = 50.0
CUSUM_THRESHOLD = 500.0


@query(
    "wn_cusum_drift",
    survey_id="WN-6/UDF-3",
    oracle=f"""
        WITH RECURSIVE seq AS (
            SELECT user_id, ts::TIMESTAMP AS ts, event_id,
                   ROUND(value, 2) AS v,
                   ROW_NUMBER() OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS rn
            FROM events
        ),
        walk(user_id, rn, s, peak, n_alarms, first_alarm) AS (
            SELECT user_id, rn,
                   CASE WHEN GREATEST(0, v - {CUSUM_TARGET})
                             > {CUSUM_THRESHOLD}
                        THEN 0 ELSE GREATEST(0, v - {CUSUM_TARGET}) END,
                   GREATEST(0, v - {CUSUM_TARGET}),
                   CASE WHEN GREATEST(0, v - {CUSUM_TARGET})
                             > {CUSUM_THRESHOLD} THEN 1 ELSE 0 END,
                   CASE WHEN GREATEST(0, v - {CUSUM_TARGET})
                             > {CUSUM_THRESHOLD} THEN ts END
            FROM seq WHERE rn = 1
            UNION ALL
            SELECT w.user_id, q.rn,
                   CASE WHEN GREATEST(0, w.s + q.v - {CUSUM_TARGET})
                             > {CUSUM_THRESHOLD}
                        THEN 0
                        ELSE GREATEST(0, w.s + q.v - {CUSUM_TARGET}) END,
                   GREATEST(w.peak,
                            GREATEST(0, w.s + q.v - {CUSUM_TARGET})),
                   w.n_alarms
                       + CASE WHEN GREATEST(0, w.s + q.v - {CUSUM_TARGET})
                                   > {CUSUM_THRESHOLD} THEN 1 ELSE 0 END,
                   COALESCE(w.first_alarm,
                            CASE WHEN GREATEST(0, w.s + q.v
                                               - {CUSUM_TARGET})
                                      > {CUSUM_THRESHOLD} THEN q.ts END)
            FROM walk w JOIN seq q
              ON q.user_id = w.user_id AND q.rn = w.rn + 1
        )
        SELECT user_id,
               CAST(MAX(rn) AS BIGINT)              AS n_events,
               CAST(arg_max(n_alarms, rn) AS BIGINT) AS n_alarms,
               ROUND(arg_max(peak, rn), 2)          AS max_cusum,
               CAST(arg_max(first_alarm, rn) AS TIMESTAMP)
                   AS first_alarm_ts
        FROM walk GROUP BY user_id
    """,
)
def wn_cusum_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM drift/alarm detection: the sequential change-detection chart —
    per user, accumulate positive deviations from target (s = max(0,
    s + v − target)), alarm and reset when s crosses the threshold.
    Genuinely RECURSIVE per-row state (each step depends on the
    previous), which no window frame can express: the engine runs it as
    an Arrow grouped-map kernel (one pass per user group), and the
    oracle is DuckDB's recursive CTE walking the same chain — the only
    operator family where both engines must simulate, not aggregate.

    Cross-engine exactness: values are pre-rounded JVM-side to 2 dp (the
    kernel never rounds — pandas is half-even), so both simulations fold
    identical doubles in identical order; state stays an exact multiple
    of 0.01 throughout. Scale: one shuffle on user_id; each group
    streams through the kernel with O(1) state — the batch twin of the
    applyInPandasWithState streaming funnel, and the batch backfill path
    for the same alert definition."""
    import pandas as pd

    events = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", F.round("value", 2).alias("v")
    )

    def cusum_group(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["ts", "event_id"])
        s = peak = 0.0
        alarms = 0
        first = None
        for v, ts in zip(pdf["v"], pdf["ts"]):
            raw = s + v - CUSUM_TARGET
            if raw < 0.0:
                raw = 0.0
            if raw > peak:
                peak = raw
            if raw > CUSUM_THRESHOLD:
                alarms += 1
                s = 0.0
                if first is None:
                    first = ts
            else:
                s = raw
        return pd.DataFrame(
            {
                "user_id": [pdf["user_id"].iloc[0]],
                "n_events": [len(pdf)],
                "n_alarms": [alarms],
                "max_cusum": [round(peak * 100) / 100.0],
                "first_alarm_ts": [first],
            }
        )

    return events.groupBy("user_id").applyInPandas(
        cusum_group,
        "user_id bigint, n_events bigint, n_alarms bigint, "
        "max_cusum double, first_alarm_ts timestamp",
    )


RRF_K = 60  # the standard reciprocal-rank-fusion damping constant
RRF_TOP = 20


@query(
    "wn_rrf_rank_fusion",
    survey_id="WN-2/LLM-5",
    oracle=f"""
        WITH r1 AS (
            SELECT doc_id, ROW_NUMBER() OVER
                (ORDER BY length(text) DESC, doc_id) AS rank1
            FROM documents
        ), r2 AS (
            SELECT doc_id, ROW_NUMBER() OVER
                (ORDER BY ('0x' || substring(md5('rrf|' || doc_id::VARCHAR),
                                             1, 8))::BIGINT, doc_id) AS rank2
            FROM documents
        ), fused AS (
            SELECT r1.doc_id, rank1, rank2,
                   1.0 / ({RRF_K} + rank1) + 1.0 / ({RRF_K} + rank2) AS rrf
            FROM r1 JOIN r2 ON r1.doc_id = r2.doc_id
        )
        SELECT doc_id, CAST(rank1 AS BIGINT) AS rank1,
               CAST(rank2 AS BIGINT) AS rank2, rrf
        FROM fused
        ORDER BY rrf DESC, doc_id
        LIMIT {RRF_TOP}
    """,
)
def wn_rrf_rank_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal-rank fusion of two independent document rankings —
    the standard hybrid-retrieval merge (BM25 list + vector list, or any
    N retrievers): score = Σ 1/(k + rank_i), k=60, robust to
    incomparable raw scores because only RANKS enter. Here ranking 1 is
    text length (a real signal) and ranking 2 an md5-derived stand-in
    for a second retriever, so both engines fuse identical lists.

    Engine-proofing: each 1/(k+rank) term is one IEEE division of exact
    integers and the sum has a FIXED two-term association, so the fused
    doubles are bit-identical across engines — no rounding needed; the
    final cut breaks rrf ties by doc_id.

    Scale shape: each ranking is a global sort of (id, key) pairs — at
    real scale per-retriever rankings arrive pre-cut to their own top-N
    (RRF only needs each list's head), so the fusion input is N·lists
    rows, the join key is doc_id, and the final TakeOrdered top-20 never
    materializes a full sort. The window ranks here follow the
    wn_ntile_scalable doctrine at toy scale."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    w1 = Window.orderBy(F.length("text").desc(), "doc_id")
    w2 = Window.orderBy(
        F.conv(
            F.substring(F.md5(F.concat(F.lit("rrf|"), F.col("doc_id").cast("string"))), 1, 8),
            16,
            10,
        ).cast("bigint"),
        "doc_id",
    )
    r1 = docs.select("doc_id", F.row_number().over(w1).alias("rank1"))
    r2 = docs.select("doc_id", F.row_number().over(w2).alias("rank2"))
    fused = (
        r1.join(r2, "doc_id")
        .select(
            "doc_id",
            F.col("rank1").cast("bigint").alias("rank1"),
            F.col("rank2").cast("bigint").alias("rank2"),
            (
                F.lit(1.0) / (F.lit(RRF_K) + F.col("rank1"))
                + F.lit(1.0) / (F.lit(RRF_K) + F.col("rank2"))
            ).alias("rrf"),
        )
    )
    return fused.orderBy(F.col("rrf").desc(), "doc_id").limit(RRF_TOP)


@query(
    "wn_gap_fill_interpolate",
    survey_id="WN-4/ETL-6",
    oracle="""
        WITH daily AS (
            SELECT user_id,
                   (date_trunc('day', ts::TIMESTAMP))::DATE AS day,
                   ROUND(SUM(value), 2) AS day_value
            FROM events GROUP BY 1, 2
        ), span AS (
            SELECT user_id, MIN(day) AS d0, MAX(day) AS d1 FROM daily GROUP BY 1
        ), spine AS (
            SELECT user_id,
                   unnest(generate_series(d0::TIMESTAMP, d1::TIMESTAMP,
                                          INTERVAL 1 DAY))::DATE AS day
            FROM span
        ), walled AS (
            SELECT s.user_id, s.day, d.day_value,
                   LAST_VALUE(d.day_value IGNORE NULLS) OVER (
                       PARTITION BY s.user_id ORDER BY s.day
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS pv,
                   LAST_VALUE(CASE WHEN d.day_value IS NOT NULL
                                   THEN s.day END IGNORE NULLS) OVER (
                       PARTITION BY s.user_id ORDER BY s.day
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS pd,
                   FIRST_VALUE(d.day_value IGNORE NULLS) OVER (
                       PARTITION BY s.user_id ORDER BY s.day
                       ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING
                   ) AS nv,
                   FIRST_VALUE(CASE WHEN d.day_value IS NOT NULL
                                    THEN s.day END IGNORE NULLS) OVER (
                       PARTITION BY s.user_id ORDER BY s.day
                       ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING
                   ) AS nd
            FROM spine s LEFT JOIN daily d USING (user_id, day)
        )
        SELECT user_id, day, day_value,
               CASE WHEN day_value IS NOT NULL THEN day_value
                    ELSE ROUND(pv + (nv - pv)
                         * (date_diff('day', pd, day)::DOUBLE
                            / date_diff('day', pd, nd)), 6)
               END AS interp_value,
               day_value IS NULL AS is_gap
        FROM walled
    """,
)
def wn_gap_fill_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap fill by LINEAR INTERPOLATION — the sibling of
    wn_gap_fill_locf on the identical per-user daily spine: interior
    missing days take pv + (nv - pv) * elapsed/total between their
    bracketing observations instead of carrying the last one forward
    (the fill you want for continuous signals — sensor drift, balances —
    where LOCF introduces staircase bias). Because the spine spans each
    user's own [first, last] OBSERVED day, every gap is interior and
    both brackets always exist — no edge policy needed by construction.

    Cross-engine float discipline: the bracketing values are already on
    the 2 dp lattice, day distances are exact integers, and both engines
    evaluate the literally identical expression shape
    ``pv + (nv-pv) * (elapsed/total)`` before one 6 dp round.

    Scale: identical to LOCF — events collapse to ≤ users×days rows
    first, and all four bracket columns ride ONE user_id shuffle (two
    frame directions over the same sorted partition, no extra
    exchange)."""
    events = load_table(spark, sf_dir, "events")
    daily = events.groupBy(
        "user_id", F.date_trunc("day", "ts").cast("date").alias("day")
    ).agg(F.round(F.sum("value"), 2).alias("day_value"))
    spine = (
        daily.groupBy("user_id")
        .agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
        .select(
            "user_id",
            F.explode(F.expr("sequence(d0, d1, interval 1 day)")).alias("day"),
        )
    )
    w_back = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_fwd = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    obs_day = F.when(F.col("day_value").isNotNull(), F.col("day"))
    walled = (
        spine.join(daily, ["user_id", "day"], "left")
        .withColumn("pv", F.last("day_value", ignorenulls=True).over(w_back))
        .withColumn("pd", F.last(obs_day, ignorenulls=True).over(w_back))
        .withColumn("nv", F.first("day_value", ignorenulls=True).over(w_fwd))
        .withColumn("nd", F.first(obs_day, ignorenulls=True).over(w_fwd))
    )
    frac = F.datediff(F.col("day"), F.col("pd")).cast("double") / F.datediff(
        F.col("nd"), F.col("pd")
    )
    return walled.select(
        "user_id",
        "day",
        "day_value",
        F.when(F.col("day_value").isNotNull(), F.col("day_value"))
        .otherwise(
            F.round(F.col("pv") + (F.col("nv") - F.col("pv")) * frac, 6)
        )
        .alias("interp_value"),
        F.col("day_value").isNull().alias("is_gap"),
    )


@query(
    "wn_hampel_filter",
    survey_id="WN-4/AG-7",
    oracle="""
        WITH base AS (
            SELECT user_id, event_id,
                   epoch_ns(ts) // 1000 AS ts_us,
                   CAST(ROUND(value * 1000000.0) AS BIGINT) AS v
            FROM events WHERE value IS NOT NULL
        ), fr AS (
            SELECT user_id, event_id, v,
                   list_sort(list(v) OVER (
                       PARTITION BY user_id ORDER BY ts_us, event_id
                       ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)) AS arr
            FROM base
        ), m AS (
            SELECT user_id, event_id, v,
                   2 * arr[4] AS med2,
                   2 * list_sort(
                       list_transform(arr, x -> abs(2 * x - 2 * arr[4]))
                   )[4] AS mad4
            FROM fr WHERE len(arr) = 7
        )
        SELECT user_id, event_id,
               v    AS v_micro,
               med2 AS med_micro_x2,
               mad4 AS mad_micro_x4,
               20000 * abs(2 * v - med2) > 44478 * mad4 AS is_outlier
        FROM m
    """,
)
def wn_hampel_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hampel outlier filter per user value series: a point is anomalous
    when it sits more than 3 scaled MADs (3 x 1.4826 = 4.4478) from the
    rolling 7-point median — THE standard robust despiker (mean/stddev
    z-scores let one spike inflate its own gate; median/MAD don't).

    Exactness discipline: values integerize to micro-units once, then
    median and MAD live in DOUBLED/QUADRUPLED integer units (the
    Mann-Whitney doubled-rank trick) and the 4.4478 threshold becomes the
    integer comparison 20000*|2v - med2| > 44478*mad4 — no float exists
    anywhere, so both engines flag identical rows. Frame ordering is
    total: (microsecond-truncated ts, event_id) on BOTH engines — the
    testdata carries sub-microsecond residue, so the oracle truncates
    epoch_ns//1000 to match Spark's µs timestamps instead of ordering by
    raw nanos.

    Scale shape: one user-keyed exchange; the frame median uses
    collect_list over a CONSTANT 7-row frame (49 ints of state per row,
    not a percentile sketch); edge rows with partial frames are excluded
    by definition. At 100 TB this is the same single-window-pass class as
    wn_rolling_median."""
    events = load_table(spark, sf_dir, "events")
    base = events.filter(F.col("value").isNotNull()).select(
        "user_id",
        "event_id",
        "ts",
        F.round(F.col("value") * F.lit(1000000.0)).cast("bigint").alias("v"),
    )
    w7 = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-3, 3)
    )
    fr = base.withColumn(
        "arr", F.sort_array(F.collect_list("v").over(w7))
    ).filter(F.size("arr") == 7)
    med2 = 2 * F.element_at("arr", 4)
    dev2_sorted = F.sort_array(
        F.transform(F.col("arr"), lambda x: F.abs(2 * x - med2))
    )
    mad4 = 2 * F.element_at(dev2_sorted, 4)
    return fr.select(
        "user_id",
        "event_id",
        F.col("v").alias("v_micro"),
        med2.alias("med_micro_x2"),
        mad4.alias("mad_micro_x4"),
        (20000 * F.abs(2 * F.col("v") - med2) > 44478 * mad4).alias(
            "is_outlier"
        ),
    )
