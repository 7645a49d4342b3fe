"""Property/randomized tests (SURVEY.md §5.2.4): seeded adversarial
micro-tables — nulls, duplicate keys, timestamp ties, empty groups, single
rows — run through the engine's generic operator compositions and compared
against an independent implementation (DuckDB SQL or plain Python).

These catch exactly the drift the fixed testdata cannot: tie-break rules,
inclusive/exclusive boundary semantics, empty-partition behavior.
Hypothesis drives generation with a fixed derandomized profile so failures
reproduce; example counts stay small because every example is a Spark job.
"""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

PROP_SETTINGS = settings(
    max_examples=12,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)

# --- as-of join --------------------------------------------------------------

asof_inputs = st.tuples(
    # left: (key, ts, id) — ids unique via index later
    st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 20)), min_size=1, max_size=25
    ),
    # right: (key, ts, value)
    st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 20), st.integers(100, 999)),
        min_size=0,
        max_size=25,
    ),
)


@PROP_SETTINGS
@given(asof_inputs)
def test_asof_join_matches_duckdb(spark, data):
    """asof_join == DuckDB ASOF LEFT JOIN for every generated table,
    including: keys with no right rows (nulls), exact ts ties (inclusive
    boundary), duplicate right (key, ts) pre-deduplicated to max value —
    the same discipline the graded query uses."""
    from sealnet_etl_spark.operators.joins import asof_join

    left_rows, right_rows = data
    left_rows = [(k, ts, i) for i, (k, ts) in enumerate(left_rows)]
    # deterministic right side: one row per (key, ts), max value wins
    dedup: dict[tuple[int, int], int] = {}
    for k, ts, v in right_rows:
        dedup[(k, ts)] = max(dedup.get((k, ts), -1), v)
    right_rows = [(k, ts, v) for (k, ts), v in sorted(dedup.items())]

    left = spark.createDataFrame(left_rows, "k int, ts int, row_id int")
    right = spark.createDataFrame(
        right_rows or [(None, None, None)], "k int, rts int, val int"
    )
    if not right_rows:
        right = right.filter(F.col("k").isNotNull())
    got = {
        (r.row_id, r.asof_val)
        for r in asof_join(
            left, right, key="k", left_ts="ts", right_ts="rts", value_cols=["val"]
        ).collect()
    }

    con = duckdb.connect()
    con.execute("CREATE TABLE l (k INT, ts INT, row_id INT)")
    con.execute("CREATE TABLE r (k INT, rts INT, val INT)")
    con.executemany("INSERT INTO l VALUES (?, ?, ?)", left_rows)
    if right_rows:
        con.executemany("INSERT INTO r VALUES (?, ?, ?)", right_rows)
    want = set(
        con.execute(
            "SELECT l.row_id, r.val FROM l ASOF LEFT JOIN r"
            " ON l.k = r.k AND l.ts >= r.rts"
        ).fetchall()
    )
    assert got == want


# --- keep-first dedup (WN-1 tie-break discipline) ----------------------------

dedup_rows = st.lists(
    st.tuples(st.integers(0, 2), st.integers(0, 5), st.integers(0, 99)),
    min_size=1,
    max_size=30,
)


@PROP_SETTINGS
@given(dedup_rows)
def test_keep_first_matches_duckdb(spark, rows):
    """row_number keep-first with a TOTAL order (ord, then unique id) must
    match DuckDB QUALIFY under arbitrary duplicate keys and tied orderings —
    the §5.3 rule that every window orderBy carries a unique tiebreak."""
    from pyspark.sql.window import Window

    rows = [(k, o, i) for i, (k, o, _) in enumerate(rows)]
    df = spark.createDataFrame(rows, "k int, ord int, uid int")
    w = Window.partitionBy("k").orderBy(F.col("ord"), F.col("uid"))
    got = {
        tuple(r)
        for r in df.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("k", "ord", "uid")
        .collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE t (k INT, ord INT, uid INT)")
    con.executemany("INSERT INTO t VALUES (?, ?, ?)", rows)
    want = set(
        con.execute(
            "SELECT k, ord, uid FROM t QUALIFY"
            " ROW_NUMBER() OVER (PARTITION BY k ORDER BY ord, uid) = 1"
        ).fetchall()
    )
    assert got == want


# --- gap sessionization ------------------------------------------------------

session_rows = st.lists(
    st.tuples(st.integers(0, 2), st.integers(0, 300)), min_size=1, max_size=30
)


@PROP_SETTINGS
@given(session_rows)
def test_sessionize_matches_duckdb(spark, rows):
    """lag+cumsum sessionization (gap > 30) assigns the same session ids as
    the identical SQL formulation in DuckDB — boundary case gap == 30 stays
    in-session on both engines."""
    from pyspark.sql.window import Window

    rows = [(k, ts, i) for i, (k, ts) in enumerate(rows)]
    df = spark.createDataFrame(rows, "k int, ts int, uid int")
    w = Window.partitionBy("k").orderBy("ts", "uid")
    got = {
        tuple(r)
        for r in df.withColumn("prev", F.lag("ts").over(w))
        .withColumn(
            "new_s",
            F.when(
                F.col("prev").isNull() | (F.col("ts") - F.col("prev") > 30), 1
            ).otherwise(0),
        )
        .withColumn(
            "session_id",
            F.sum("new_s").over(w.rowsBetween(Window.unboundedPreceding, 0)),
        )
        .select("k", "uid", "session_id")
        .collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE t (k INT, ts INT, uid INT)")
    con.executemany("INSERT INTO t VALUES (?, ?, ?)", rows)
    want = set(
        con.execute(
            """
            SELECT k, uid,
                   SUM(new_s) OVER (PARTITION BY k ORDER BY ts, uid
                                    ROWS UNBOUNDED PRECEDING) AS session_id
            FROM (
                SELECT k, ts, uid,
                       CASE WHEN lag(ts) OVER (PARTITION BY k ORDER BY ts, uid)
                                 IS NULL
                              OR ts - lag(ts) OVER (PARTITION BY k ORDER BY ts, uid)
                                 > 30
                            THEN 1 ELSE 0 END AS new_s
                FROM t
            )
            """
        ).fetchall()
    )
    assert got == want


# --- connected components ----------------------------------------------------

edge_lists = st.lists(
    st.tuples(st.integers(0, 15), st.integers(0, 15)), min_size=1, max_size=30
)


def _union_find(edges: list[tuple[int, int]]) -> dict[int, int]:
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


@PROP_SETTINGS
@given(edge_lists)
def test_connected_components_matches_union_find(spark, edges):
    """Bounded min-id propagation == classic union-find on arbitrary graphs
    (self-loops, parallel edges, long chains up to the iteration bound:
    16 nodes → diameter ≤ 15 → ceil(log2)+slack iterations suffice)."""
    from sealnet_etl_spark.operators.dedup import connected_components

    df = spark.createDataFrame(edges, "a int, b int")
    got = {
        (r.node, r.cluster_id)
        for r in connected_components(df, "a", "b", max_iter=5).collect()
    }
    want = set(_union_find(edges).items())
    assert got == want


# --- incremental merge -------------------------------------------------------

merge_inputs = st.tuples(
    st.lists(st.tuples(st.integers(0, 9), st.integers(0, 99)), max_size=20),
    st.lists(st.tuples(st.integers(0, 9), st.integers(100, 199)), max_size=20),
)


@PROP_SETTINGS
@given(merge_inputs)
def test_incremental_merge_is_dict_upsert(spark, data):
    """incremental_merge == plain dict upsert: batch rows replace snapshot
    rows on key collision, unmatched rows of both sides survive. Duplicate
    keys WITHIN a side are pre-deduplicated (latest wins) to mirror the
    operator's one-row-per-key contract."""
    from sealnet_etl_spark.operators.etl import incremental_merge

    snap_rows, batch_rows = data
    snap = {k: v for k, v in snap_rows}
    batch = {k: v for k, v in batch_rows}
    want = {**snap, **batch}
    snap_df = spark.createDataFrame(
        list(snap.items()) or [(None, None)], "k int, v int"
    ).filter(F.col("k").isNotNull())
    batch_df = spark.createDataFrame(
        list(batch.items()) or [(None, None)], "k int, v int"
    ).filter(F.col("k").isNotNull())
    got = {
        r.k: r.v for r in incremental_merge(snap_df, batch_df, ["k"]).collect()
    }
    assert got == want


# --- train/test split --------------------------------------------------------

split_rows = st.lists(
    st.tuples(st.integers(0, 50), st.integers(0, 9)), min_size=1, max_size=40
)


@PROP_SETTINGS
@given(split_rows)
def test_train_test_split_is_deterministic_and_leak_free(spark, rows):
    """Every row of a group lands in the same split (leak-freeness), and
    re-running produces the identical assignment (determinism) — the two
    properties that make a split trustworthy across pipeline re-runs."""
    from sealnet_etl_spark.operators.etl import train_test_split

    rows = [(g, i) for i, (g, _) in enumerate(rows)]
    df = spark.createDataFrame(rows, "grp int, row_id int")
    a = {(r.grp, r.row_id): r.split for r in train_test_split(df, "grp").collect()}
    b = {(r.grp, r.row_id): r.split for r in train_test_split(df, "grp").collect()}
    assert a == b
    by_group: dict[int, set] = {}
    for (g, _), split in a.items():
        by_group.setdefault(g, set()).add(split)
    assert all(len(s) == 1 for s in by_group.values()), by_group


# --- SCD2 history ------------------------------------------------------------

scd2_inputs = st.lists(
    # (key, ts, state) — tiebreak id assigned by index
    st.tuples(st.integers(0, 2), st.integers(0, 15), st.sampled_from("abc")),
    min_size=1,
    max_size=25,
)


@PROP_SETTINGS
@given(rows=scd2_inputs)
def test_scd2_matches_python_reference(spark, rows):
    """SCD2 on adversarial logs (timestamp ties, repeated states, single
    rows) must equal an independent plain-Python run-length scan of the
    same (ts, id)-ordered log — covering run collapsing, interval
    contiguity, and the single open current version all at once."""
    from sealnet_etl_spark.operators.etl import scd2_history

    df = spark.createDataFrame(
        [(k, t, s, i) for i, (k, t, s) in enumerate(rows)],
        "key int, ts int, state string, id int",
    )
    out = sorted(
        (r.key, r.state, r.valid_from, r.valid_to, r.is_current)
        for r in scd2_history(
            df, key_cols=["key"], state_col="state", ts_col="ts", tiebreak_col="id"
        ).collect()
    )

    expected = []
    for key in {k for k, _, _ in rows}:
        log = sorted((t, i, s) for i, (k, t, s) in enumerate(rows) if k == key)
        vers: list[list] = []
        for t, _i, s in log:
            if not vers or vers[-1][0] != s:
                vers.append([s, t, None])
        for a, b in zip(vers, vers[1:]):
            a[2] = b[1]
        expected += [
            (key, s, vf, vt, int(vt is None)) for s, vf, vt in vers
        ]
    assert out == sorted(expected)


@given(
    st.lists(st.integers(min_value=0, max_value=30), min_size=1, max_size=400),
    st.integers(min_value=2, max_value=8),
    st.integers(min_value=1, max_value=5),
)
def test_misra_gries_superset_guarantee(stream, k, n_batches):
    """The property ag_heavy_hitters' candidate pruning stands on: for ANY
    batch split, every item with total frequency > n/(k+1) survives in at
    least one batch summary (union of survivors ⊇ true heavy hitters),
    and each surviving counter undercounts by at most n_batch/(k+1)."""
    from collections import Counter

    from sealnet_etl_spark.operators.aggregates import misra_gries

    n = len(stream)
    bounds = [round(i * n / n_batches) for i in range(n_batches + 1)]
    batches = [stream[bounds[i]:bounds[i + 1]] for i in range(n_batches)]
    summaries = [misra_gries(b, k) for b in batches]
    survivors = set().union(*[set(s) for s in summaries])
    exact = Counter(stream)
    for item, cnt in exact.items():
        if cnt > n / (k + 1):
            assert item in survivors, (item, cnt, n, k)
    for batch, summary in zip(batches, summaries):
        local = Counter(batch)
        for item, est in summary.items():
            assert est <= local[item]
            assert local[item] - est <= len(batch) / (k + 1)


def test_count_min_sketch_overestimate_guarantee(spark):
    """CMS never under-estimates, and error stays within eps*N with the
    (1 - (1/2)^depth) confidence that depth-4 makes near-certain here:
    with width 256 >> distinct keys at this SF, every probe should in
    fact be exact, and the >= bound is structural."""
    from sealnet_etl_spark.operators.aggregates import CMS_WIDTH
    from sealnet_etl_spark.registry import all_queries

    from .conftest import SMOKE_SF_DIR

    rows = all_queries()["ag_count_min_sketch"](spark, SMOKE_SF_DIR).collect()
    assert rows, "probe set must be non-empty"
    n_total = sum(r.true_count for r in rows)  # lower bound on stream size
    for r in rows:
        assert r.cms_estimate >= r.true_count, r
        # e/width bound with generous slack (true N includes non-probes)
        assert r.cms_estimate - r.true_count <= max(1, 10 * n_total // CMS_WIDTH), r


# --- skyline dominance -------------------------------------------------------

skyline_points = st.lists(
    st.tuples(st.integers(0, 6), st.integers(0, 6)), min_size=1, max_size=20
)


@PROP_SETTINGS
@given(skyline_points)
def test_skyline_windows_match_bruteforce(spark, pts):
    """The two-window skyline formulation (max y over strictly-greater x +
    max y within same x) must equal brute-force NOT-EXISTS dominance for
    every generated point set — including duplicate points (both kept:
    neither dominates the other) and x-ties with different y (lower y
    dominated). Exercises the tie logic far beyond the fixture's spread."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    rows = [(i, x, y) for i, (x, y) in enumerate(pts)]
    df = spark.createDataFrame(rows, "id int, x long, y long")
    w_gt = Window.orderBy("x").rangeBetween(1, Window.unboundedFollowing)
    w_same = Window.partitionBy("x")
    flagged = df.select(
        "id", "x", "y",
        F.max("y").over(w_gt).alias("max_y_gt"),
        F.max("y").over(w_same).alias("max_y_same"),
    )
    got = {
        r.id
        for r in flagged.filter(
            (F.col("max_y_gt").isNull() | (F.col("max_y_gt") < F.col("y")))
            & (F.col("max_y_same") <= F.col("y"))
        ).collect()
    }
    expect = {
        i
        for i, (x, y) in enumerate(pts)
        if not any(
            bx >= x and by >= y and (bx > x or by > y) for bx, by in pts
        )
    }
    assert got == expect, (pts, got, expect)


# --- hierarchy pointer doubling ---------------------------------------------

parent_draws = st.lists(st.integers(0, 10_000), min_size=1, max_size=30)


@PROP_SETTINGS
@given(parent_draws)
def test_pointer_doubling_depth_matches_sequential_walk(spark, draws):
    """Pointer doubling must return the exact sequential-walk depth for
    every generated tree: node i (1-based, root=1) gets parent
    (draw[i] % (i-1)) + 1 — always a smaller id, so chains terminate.
    Covers chains (max depth), stars, and mixed shapes."""
    from pyspark.sql import functions as F
    from sealnet_etl_spark.operators.dedup import _truncate_lineage

    n = len(draws) + 1  # ids 1..n, id 1 is the root
    parent = {i: (draws[i - 2] % (i - 1)) + 1 for i in range(2, n + 1)}
    expect = {1: 0}
    for i in range(2, n + 1):
        d, node = 0, i
        while node != 1:
            node = parent[node]
            d += 1
        expect[i] = d
    if not parent:
        return
    state = _truncate_lineage(
        spark.createDataFrame(
            [(i, p, 1) for i, p in parent.items()], "id long, anc long, dist int"
        )
    )
    for _ in range(8):
        if state.filter(F.col("anc") != 1).limit(1).count() == 0:
            break
        hop = state.select(
            F.col("id").alias("t_id"),
            F.col("anc").alias("t_anc"),
            F.col("dist").alias("t_dist"),
        )
        state = _truncate_lineage(
            state.join(hop, state.anc == hop.t_id, "left").select(
                "id",
                F.coalesce("t_anc", "anc").alias("anc"),
                (F.col("dist") + F.coalesce("t_dist", F.lit(0))).alias("dist"),
            )
        )
    got = {r.id: r.dist for r in state.collect()}
    got[1] = 0
    assert got == expect, (parent, got, expect)


# --- perceptual gradient hash (round 6) --------------------------------------

phash_inputs = st.tuples(
    st.binary(min_size=130, max_size=4096),  # blob (>= PHASH_BLOCKS + edit room)
    st.integers(0, 3800),  # edit offset
    st.integers(1, 64),  # edit length
    st.binary(min_size=1, max_size=64),  # replacement bytes
)


@given(phash_inputs)
@settings(max_examples=200, deadline=None, derandomize=True)
def test_phash_bits_locality_bound(case):
    """The whole near-dup margin rests on LOCALITY: a contiguous byte edit
    may only flip gradient bits whose adjacent-block comparison touches an
    edited block — at most (blocks spanned by the edit) + 1 bits, plus
    nothing anywhere else. Pure-Python property (no Spark job), so it runs
    at full hypothesis depth. Also pins determinism and the 32-bit range
    of each signature half."""
    from sealnet_etl_spark.operators.multimodal import (
        PHASH_BLOCKS,
        PHASH_SAMP,
        _phash_bits,
    )

    data, off, ln, repl = case
    off = min(off, len(data) - 1)
    repl = (repl * ((ln // len(repl)) + 1))[:ln]
    edited = data[:off] + repl + data[off + ln :]
    if len(edited) != len(data):  # keep sizes equal so blocks align
        edited = (edited + data[len(edited) :])[: len(data)]

    lo_a, hi_a = _phash_bits(data)
    assert (lo_a, hi_a) == _phash_bits(data)  # deterministic
    assert 0 <= lo_a < (1 << 32) and 0 <= hi_a < (1 << 32)

    lo_b, hi_b = _phash_bits(edited)
    diff = (lo_a ^ lo_b) | ((hi_a ^ hi_b) << 32)

    stride = len(data) // PHASH_BLOCKS
    # blocks whose SAMPLED region [j*stride, j*stride + PHASH_SAMP) meets
    # the edited byte range [off, off + len(repl))
    touched = {
        j
        for j in range(PHASH_BLOCKS)
        if j * stride < off + len(repl)
        and off < j * stride + min(PHASH_SAMP, len(data) - j * stride)
    }
    # bit j compares blocks j and j+1
    allowed = 0
    for j in range(PHASH_BLOCKS - 1):
        if j in touched or (j + 1) in touched:
            allowed |= 1 << j
    assert diff & ~allowed == 0, (
        f"edit at [{off},{off+len(repl)}) flipped non-adjacent bits: "
        f"{bin(diff & ~allowed)}"
    )
