"""Training-data preparation operators (SURVEY.md §2.13a round-3 tier):
the corpus-to-training-run steps that sit BETWEEN dedup/quality filtering
(dedup.py, textstats.py) and the sharded sink (etl.py) in an LLM data
pipeline — sequence packing, mixture sampling, canonical-duplicate
selection, incremental corpus dedup, and unigram LM quality scoring.

Shared discipline: every sampling / assignment decision hashes CONTENT
KEYS through the md5-hex-prefix integerization that etl_shard_assign
introduced (cross-engine deterministic — both Spark's ``conv(substring(
md5(x),1,8),16,10)`` and DuckDB's ``('0x'||substring(md5(x),1,8))::BIGINT``
integerize the same 32-bit prefix), so re-runs, insertions, and the DuckDB
oracle all agree row-for-row. No RNG, no row_number-over-nothing.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..registry import query
from ..sources import load_table
from .dedup import NEW_BATCH_SOURCES, normalized_words
from .etl import N_SHARDS as _N_SHARDS
from .textstats import TOKEN_PATTERN, token_counts


def md5_bucket(key: Column, salt: str, mod: int | Column) -> Column:
    """Deterministic uniform bucket in [0, mod): integerize the first 8 hex
    chars of md5(salt || key). The salt decorrelates independent decisions
    (shard vs. sample vs. split) made on the same key. ``mod`` may be a
    Column for row-dependent ranges (e.g. the hierarchy parent draw)."""
    return (
        F.conv(F.substring(F.md5(F.concat(F.lit(salt), key)), 1, 8), 16, 10)
        .cast("bigint")
        % mod
    )


def _md5_bucket_sql(key_expr: str, salt: str, mod: int) -> str:
    return (
        f"('0x' || substring(md5('{salt}' || {key_expr}), 1, 8))::BIGINT % {mod}"
    )


# ---------------------------------------------------------------------------
# Sequence packing
# ---------------------------------------------------------------------------

SEQ_LEN = 2048
PACK_SHARDS = 8


@query(
    "llm_sequence_pack",
    survey_id="LLM-11",
    oracle=rf"""
        WITH toks AS (
            SELECT doc_id,
                   {_md5_bucket_sql("doc_id::VARCHAR", "pack:", PACK_SHARDS)}
                       AS shard,
                   len(regexp_extract_all(lower(text), '{TOKEN_PATTERN}'))
                       AS n_tokens
            FROM documents
        )
        , offsets AS (
            SELECT doc_id, shard, n_tokens,
                   CAST(COALESCE(SUM(n_tokens) OVER (
                       PARTITION BY shard ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                   ), 0) AS BIGINT) AS start_offset
            FROM toks
            WHERE n_tokens > 0
        )
        SELECT doc_id, shard, n_tokens, start_offset,
               start_offset // {SEQ_LEN}                  AS first_seq,
               (start_offset + n_tokens - 1) // {SEQ_LEN} AS last_seq
        FROM offsets
    """,
)
def llm_sequence_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GPT-style sequence packing layout: concatenate each shard's docs in
    a deterministic order and cut the token stream into SEQ_LEN training
    sequences; emit every doc's byte-exact placement (start offset, first /
    last sequence index). This is the addressing step of "pack the corpus
    into fixed-length samples with documents crossing boundaries" — the
    writer then slices exactly [first_seq, last_seq] per doc.

    Scale: token counting is a shuffle-free narrow pass; the only shuffle
    is the hash exchange on the md5 shard key, and the running-sum window
    is per-shard (shards are the parallel unit — at 100 TB you raise
    PACK_SHARDS to O(cluster cores), each holding a contiguous token
    stream; assignment stays deterministic because the shard key is
    content-hashed, not monotonic)."""
    toks = (
        token_counts(spark, sf_dir)
        .select(
            "doc_id",
            md5_bucket(
                F.col("doc_id").cast("string"), "pack:", PACK_SHARDS
            ).alias("shard"),
            "n_tokens",
        )
        .filter(F.col("n_tokens") > 0)
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offset = F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    return toks.select(
        "doc_id",
        "shard",
        "n_tokens",
        offset.alias("start_offset"),
        F.floor(offset / SEQ_LEN).alias("first_seq"),
        F.floor((offset + F.col("n_tokens") - 1) / SEQ_LEN).alias("last_seq"),
    )


# ---------------------------------------------------------------------------
# Domain-mixture sampling
# ---------------------------------------------------------------------------

MIX_DENOM = 10_000
#: per-language keep rates ×10⁴ — the "target mixture" a data recipe fixes
#: (e.g. downsample dominant English, keep the rest at a higher rate).
MIX_RATES = {"en": 5_500, "de": 9_000, "fr": 9_000}
MIX_DEFAULT = 8_000


def mixture_keep_rate() -> Column:
    """The configured per-language keep-rate (×1/MIX_DENOM) as a column —
    THE single mixture definition, shared by llm_mixture_sample and the
    llm_pipeline_e2e capstone so the two can't desynchronize."""
    rate = F.lit(MIX_DEFAULT)
    for lang, r in MIX_RATES.items():
        rate = F.when(F.col("lang") == lang, r).otherwise(rate)
    return rate


def keep_best_window() -> Window:
    """Keep-best-duplicate ranking window (quality key: n_chars desc,
    doc_id tiebreak) over the content hash — shared by
    llm_keep_best_duplicate and the capstone."""
    return Window.partitionBy("content_hash").orderBy(
        F.col("n_chars").desc(), "doc_id"
    )


@query(
    "llm_mixture_sample",
    survey_id="LLM-9/LLM-11",
    oracle=f"""
        SELECT doc_id, lang, source
        FROM documents
        WHERE {_md5_bucket_sql("doc_id::VARCHAR", "mix:", MIX_DENOM)}
              < CASE lang WHEN 'en' THEN {MIX_RATES['en']}
                          WHEN 'de' THEN {MIX_RATES['de']}
                          WHEN 'fr' THEN {MIX_RATES['fr']}
                          ELSE {MIX_DEFAULT} END
    """,
)
def llm_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic domain-mixture sampling: each language (domain) gets a
    target keep-rate and every doc keeps/drops by comparing its salted
    md5 bucket against that rate — the reproducible version of "downsample
    web-English to 55%, keep curated domains at 80-90%" in training-data
    recipes. Unlike ``df.sample``, membership is a pure function of doc_id,
    so incremental re-runs and audits reproduce the exact sample.

    Scale: shuffle-free — a narrow filter the parquet scan evaluates
    per-row; no sort, no sampling pass, no driver state."""
    docs = load_table(spark, sf_dir, "documents")
    keep = (
        md5_bucket(F.col("doc_id").cast("string"), "mix:", MIX_DENOM)
        < mixture_keep_rate()
    )
    return docs.filter(keep).select("doc_id", "lang", "source")


# ---------------------------------------------------------------------------
# Canonical-duplicate selection (keep-best, not keep-first)
# ---------------------------------------------------------------------------


@query(
    "llm_keep_best_duplicate",
    survey_id="LLM-1/LLM-9",
    oracle="""
        WITH hashed AS (
            SELECT doc_id, source, n_chars,
                   md5(lower(text)) AS content_hash,
                   COUNT(*) OVER (PARTITION BY md5(lower(text))) AS group_size
            FROM documents
        )
        SELECT content_hash, doc_id, source, n_chars, group_size
        FROM hashed
        QUALIFY ROW_NUMBER() OVER (
            PARTITION BY content_hash ORDER BY n_chars DESC, doc_id
        ) = 1
    """,
)
def llm_keep_best_duplicate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical document selection: among exact duplicates (same
    normalized-content hash), keep the BEST copy by a quality key (here
    n_chars, doc_id tiebreak) instead of the arbitrary min-id that
    llm_exact_dedup keeps — the difference matters when duplicates differ
    in trailing boilerplate or truncation and you want the fullest copy.

    Scale: one shuffle on the 16-byte content hash; the window computes
    group size and the keep-rank in the same partitioned pass (a single
    Exchange feeds both), and only hashes move — never document text."""
    docs = load_table(spark, sf_dir, "documents")
    hashed = docs.select(
        F.md5(F.lower("text")).alias("content_hash"),
        "doc_id",
        "source",
        "n_chars",
    )
    wg = Window.partitionBy("content_hash")
    return (
        hashed.withColumn("group_size", F.count(F.lit(1)).over(wg))
        .withColumn("rn", F.row_number().over(keep_best_window()))
        .filter(F.col("rn") == 1)
        .select("content_hash", "doc_id", "source", "n_chars", "group_size")
    )


# ---------------------------------------------------------------------------
# Incremental corpus dedup (new crawl batch vs. existing corpus)
# ---------------------------------------------------------------------------

@query(
    "llm_incremental_dedup",
    survey_id="LLM-1/ETL-5",
    oracle=f"""
        SELECT n.doc_id, n.source, md5(lower(n.text)) AS content_hash
        FROM documents n
        WHERE n.source IN {NEW_BATCH_SOURCES!r}
          AND NOT EXISTS (
              SELECT 1 FROM documents prior
              WHERE prior.source NOT IN {NEW_BATCH_SOURCES!r}
                AND md5(lower(prior.text)) = md5(lower(n.text))
          )
    """,
)
def llm_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental corpus dedup: a new crawl batch (sources src1/src2
    stand in for "this week's crawl") is admitted only where its content
    hash does NOT already exist in the prior corpus — the continuous-
    ingestion counterpart of one-shot exact dedup.

    Scale: left-anti join on the 16-byte content hash with both sides
    projected to (hash[, ids]) BEFORE the join, so the shuffle carries
    hashes, not text. At 100 TB the prior-corpus side is a persisted
    hash-only table (bucketed on the hash), making each nightly batch a
    co-located anti join instead of a full-corpus rescan."""
    docs = load_table(spark, sf_dir, "documents")
    is_new = F.col("source").isin(*NEW_BATCH_SOURCES)
    hashed = docs.select(
        "doc_id", "source", F.md5(F.lower("text")).alias("content_hash")
    )
    new_batch = hashed.filter(is_new)
    prior = hashed.filter(~is_new).select("content_hash")
    return new_batch.join(prior, "content_hash", "left_anti").select(
        "doc_id", "source", "content_hash"
    )


# ---------------------------------------------------------------------------
# Unigram LM quality scoring
# ---------------------------------------------------------------------------

#: Words must appear at least this often corpus-wide to enter the scoring
#: vocabulary — the filter that keeps the broadcast table bounded at scale.
UNIGRAM_MIN_COUNT = 2


@query(
    "llm_unigram_logprob",
    survey_id="LLM-9/LLM-11",
    oracle=rf"""
        WITH words AS (
            SELECT doc_id,
                   unnest(string_split_regex(lower(text), '\s+')) AS w
            FROM documents
        ), counts AS (
            SELECT w, COUNT(*) AS c FROM words GROUP BY w
        ), total AS (
            SELECT SUM(c)::DOUBLE AS n FROM counts
        ), vocab AS (
            SELECT w, c FROM counts WHERE c >= {UNIGRAM_MIN_COUNT}
        )
        SELECT words.doc_id,
               COUNT(*)                         AS n_words,
               ROUND(AVG(-ln(vocab.c / total.n)), 6) AS avg_neg_logprob
        FROM words JOIN vocab USING (w) CROSS JOIN total
        GROUP BY words.doc_id
    """,
)
def llm_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram language-model quality score: fit corpus unigram
    frequencies, then score each document by its mean token surprisal
    (−ln p(w)) — the cheap stand-in for the KenLM-perplexity gate that
    training-data pipelines run (unnaturally low OR high surprisal both
    flag junk). Two aggregate passes over the exploded corpus.

    Scale: pass 1 (vocab counts) is a map-side-combining word aggregate;
    pass 2 scores docs through a BROADCAST join against the MIN-COUNT-
    FILTERED vocab (hapax legomena — the long tail that makes the raw
    vocabulary grow with corpus size — are dropped from scoring, exactly
    as real LM gates do; what remains is MBs even at 100 TB), so the
    scoring pass is map-only: no shuffle of the exploded corpus on the
    heavily skewed word key — stopwords would make that join the skew
    worst-case. Out-of-vocab words simply don't contribute to a doc's
    mean surprisal (n_words counts in-vocab tokens). The corpus total
    stays the UNFILTERED token count so kept-word probabilities remain
    true corpus frequencies; it rides along as a 1-row scalar cross join
    (the one BNLJ shape the repo's plan guard allows)."""
    docs = load_table(spark, sf_dir, "documents")
    words = docs.select(
        "doc_id", F.explode(normalized_words(F.col("text"))).alias("w")
    )
    counts = words.groupBy("w").agg(F.count(F.lit(1)).alias("c"))
    total = counts.agg(F.sum("c").cast("double").alias("n"))
    vocab = counts.filter(F.col("c") >= UNIGRAM_MIN_COUNT)
    return (
        words.join(F.broadcast(vocab), "w")
        .crossJoin(F.broadcast(total))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.round(F.avg(-F.log(F.col("c") / F.col("n"))), 6).alias(
                "avg_neg_logprob"
            ),
        )
    )


CHUNK_WORDS = 100
CHUNK_STRIDE = 80  # 20-word overlap between consecutive chunks


@query(
    "llm_doc_chunking",
    survey_id="LLM-11/LLM-7",
    oracle=rf"""
        WITH words AS (
            SELECT doc_id, string_split_regex(lower(text), '\s+') AS w
            FROM documents
        )
        SELECT doc_id,
               CAST(s / {CHUNK_STRIDE} AS BIGINT)     AS chunk_idx,
               len(w[s+1:s+{CHUNK_WORDS}])            AS n_chunk_words,
               array_to_string(w[s+1:s+{CHUNK_WORDS}], ' ') AS chunk_text
        FROM words, unnest(range(0, len(w), {CHUNK_STRIDE})) AS t(s)
        WHERE len(w) > 0
    """,
)
def llm_doc_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping document chunking — the RAG/embedding-prep step that
    splits long documents into CHUNK_WORDS-word windows every
    CHUNK_STRIDE words (20-word overlap preserves context across cuts),
    emitting one addressable chunk row per window. Downstream this feeds
    the embedding featurizer (LLM-4/5) and the multimodal batch harness.

    Scale: pure narrow explode — split, windowed slices, and re-joining
    are all JVM higher-order array functions evaluated per row at scan
    speed; no shuffle, no UDF. Output size is input × (1/overlap factor),
    the expected blow-up of any chunker."""
    docs = load_table(spark, sf_dir, "documents")
    words = docs.select(
        "doc_id", normalized_words(F.col("text")).alias("w")
    ).filter(F.size("w") > 0)
    starts = F.sequence(
        F.lit(0), F.size("w") - 1, F.lit(CHUNK_STRIDE)
    )
    return (
        words.select("doc_id", "w", F.explode(starts).alias("s"))
        .select(
            "doc_id",
            F.floor(F.col("s") / CHUNK_STRIDE).alias("chunk_idx"),
            F.size(F.slice("w", F.col("s") + 1, CHUNK_WORDS)).alias(
                "n_chunk_words"
            ),
            F.concat_ws(" ", F.slice("w", F.col("s") + 1, CHUNK_WORDS)).alias(
                "chunk_text"
            ),
        )
    )


BALANCED_N = 10


@query(
    "llm_balanced_sample",
    survey_id="ETL-3/LLM-9",
    oracle=rf"""
        SELECT doc_id, lang
        FROM documents
        QUALIFY ROW_NUMBER() OVER (
            PARTITION BY lang
            ORDER BY md5('bal:' || doc_id::VARCHAR), doc_id
        ) <= {BALANCED_N}
    """,
)
def llm_balanced_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-N balanced sampling: exactly BALANCED_N documents per
    language, chosen by rank in salted-md5 order — the reproducible way
    to build a class-balanced eval set (fraction-based sampling gives
    only EXPECTED counts; hash-ordering gives exact counts, no RNG, and
    stable membership under re-runs until the underlying pool changes).

    Scale: one shuffle on the stratum key; Spark's InferWindowGroupLimit
    turns the rank-filter into a per-partition N-sized heap, so no group
    is ever fully sorted."""
    docs = load_table(spark, sf_dir, "documents")
    order_key = F.md5(F.concat(F.lit("bal:"), F.col("doc_id").cast("string")))
    w = Window.partitionBy("lang").orderBy(order_key, "doc_id")
    return (
        docs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= BALANCED_N)
        .select("doc_id", "lang")
    )


NEG_PER_ANCHOR = 4
_NEG_J_VALUES = ", ".join(f"({j})" for j in range(1, NEG_PER_ANCHOR + 1))


@query(
    "llm_negative_sampling",
    survey_id="LLM-4/LLM-11",
    oracle=rf"""
        WITH ranked AS (
            SELECT vec_id, label,
                   ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS pos
            FROM embeddings
        ), n AS (
            SELECT COUNT(*) AS total FROM embeddings
        ), probes AS (
            SELECT a.vec_id AS anchor_id, a.label AS anchor_label, j.j,
                   ('0x' || substring(
                        md5('neg:' || a.vec_id::VARCHAR || ':' || j.j::VARCHAR),
                        1, 8))::BIGINT % n.total AS cand_pos
            FROM embeddings a
            CROSS JOIN (VALUES {_NEG_J_VALUES}) AS j(j)
            CROSS JOIN n
        )
        SELECT p.anchor_id, p.j, r.vec_id AS negative_id, r.label AS negative_label
        FROM probes p JOIN ranked r ON r.pos = p.cand_pos
        WHERE r.label <> p.anchor_label
    """,
)
def llm_negative_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic negative sampling for contrastive training: each
    anchor draws NEG_PER_ANCHOR probe positions from the corpus via
    salted md5 (reproducible — the training set is a pure function of
    the data, unlike RNG sampling), keeping probes whose label differs
    from the anchor's (same-label collisions are simply dropped, so an
    anchor yields UP TO K negatives — the standard in-batch-negatives
    trade).

    Scale: positions come from the distributed two-phase global rank
    (never a one-partition window); probes explode to N×K (anchor, pos)
    pairs of ids only and equi-join the rank table on position — one
    shuffle of 8-byte keys, no embedding vectors move."""
    from .windows import two_phase_global_rank

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "label")
    ranked, total = two_phase_global_rank(emb, ["vec_id"])
    ranked = ranked.select(
        F.col("vec_id").alias("negative_id"),
        F.col("label").alias("negative_label"),
        (F.col("rank") - 1).alias("pos"),
    )
    probes = (
        emb.select(F.col("vec_id").alias("anchor_id"), F.col("label").alias("anchor_label"))
        .select(
            "anchor_id",
            "anchor_label",
            F.explode(
                F.sequence(F.lit(1), F.lit(NEG_PER_ANCHOR))
            ).alias("j"),
        )
        .withColumn(
            "cand_pos",
            md5_bucket(
                F.concat(
                    F.col("anchor_id").cast("string"),
                    F.lit(":"),
                    F.col("j").cast("string"),
                ),
                "neg:",
                total,
            ),
        )
    )
    return (
        probes.join(ranked, probes.cand_pos == ranked.pos)
        .filter(F.col("negative_label") != F.col("anchor_label"))
        .select("anchor_id", "j", "negative_id", "negative_label")
    )


PIPE_MIN_CHARS = 200


@query(
    "llm_pipeline_e2e",
    survey_id="LLM-9/LLM-11/ETL-3",
    oracle=f"""
        WITH gated AS (
            SELECT doc_id, lang, n_chars, lower(text) AS norm_text
            FROM documents
            WHERE n_chars >= {PIPE_MIN_CHARS}
        ), canonical AS (
            SELECT doc_id, lang, n_chars
            FROM gated
            QUALIFY ROW_NUMBER() OVER (
                PARTITION BY md5(norm_text) ORDER BY n_chars DESC, doc_id
            ) = 1
        ), sampled AS (
            SELECT doc_id, lang, n_chars
            FROM canonical
            WHERE {_md5_bucket_sql("doc_id::VARCHAR", "mix:", MIX_DENOM)}
                  < CASE lang WHEN 'en' THEN {MIX_RATES['en']}
                              WHEN 'de' THEN {MIX_RATES['de']}
                              WHEN 'fr' THEN {MIX_RATES['fr']}
                              ELSE {MIX_DEFAULT} END
        )
        SELECT ('0x' || substring(md5(doc_id::VARCHAR), 1, 8))::BIGINT % {_N_SHARDS}
                   AS shard,
               CAST(COUNT(*) AS BIGINT)     AS n_docs,
               CAST(SUM(n_chars) AS BIGINT) AS total_chars
        FROM sampled
        GROUP BY 1
    """,
)
def llm_pipeline_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The capstone composition: quality gate → keep-best exact dedup →
    domain-mixture sample → training-shard assignment, chained as ONE
    lazy plan — the end-to-end skeleton of a training-data build,
    proving the individual operators compose (one Catalyst plan, shared
    scan, no materialization between stages).

    Scale: the whole chain is a narrow filter + one content-hash window
    + a narrow hash filter + one shard aggregate — two shuffles total for
    four pipeline stages, because every sampling/assignment decision is a
    pure hash function (no RNG, no recomputation drift between stages)."""
    docs = load_table(spark, sf_dir, "documents")
    gated = docs.filter(F.col("n_chars") >= PIPE_MIN_CHARS).select(
        "doc_id", "lang", "n_chars", F.md5(F.lower("text")).alias("content_hash")
    )
    canonical = (
        gated.withColumn("rn", F.row_number().over(keep_best_window()))
        .filter(F.col("rn") == 1)
        .drop("rn", "content_hash")
    )
    sampled = canonical.filter(
        md5_bucket(F.col("doc_id").cast("string"), "mix:", MIX_DENOM)
        < mixture_keep_rate()
    )
    shard = md5_bucket(F.col("doc_id").cast("string"), "", _N_SHARDS)
    return sampled.groupBy(shard.alias("shard")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("total_chars"),
    )


VOCAB_SIZE = 500


@query(
    "llm_vocab_induction",
    survey_id="LLM-9/LLM-11",
    oracle=rf"""
        WITH counts AS (
            SELECT w, COUNT(*) AS freq
            FROM (SELECT unnest(string_split_regex(lower(text), '\s+')) AS w
                  FROM documents)
            GROUP BY w
        )
        SELECT w AS token, freq,
               ROW_NUMBER() OVER (ORDER BY freq DESC, w) - 1 AS token_id
        FROM counts
        QUALIFY ROW_NUMBER() OVER (ORDER BY freq DESC, w) <= {VOCAB_SIZE}
    """,
)
def llm_vocab_induction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary induction: the top-V corpus words with stable,
    frequency-ranked token ids — the artifact-build step before unigram
    scoring / tokenization (word-level stand-in for BPE merges; the
    frequency table IS what BPE's first iteration consumes).

    Scale: one map-side-combined word count, then the top-V cut is a
    TakeOrdered heap over (freq, word) — the full vocabulary is never
    globally sorted; ids are dense ranks of the V-sized result (V is
    thousands — driver-safe by construction)."""
    docs = load_table(spark, sf_dir, "documents")
    counts = (
        docs.select(F.explode(normalized_words(F.col("text"))).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    top = counts.orderBy(F.col("freq").desc(), F.col("token")).limit(VOCAB_SIZE)
    w = Window.orderBy(F.col("freq").desc(), F.col("token"))
    # the rank window runs on the V-sized result, not the vocabulary
    return top.select(
        "token", "freq", (F.row_number().over(w) - 1).cast("bigint").alias("token_id")
    )


@query(
    "llm_vocab_growth",
    survey_id="LLM-7/ETL-6",
    oracle=r"""
        WITH tok AS (
            SELECT CAST(regexp_extract(source, '([0-9]+)$', 1) AS BIGINT)
                       AS batch_no,
                   unnest(string_split_regex(lower(text), '\s+')) AS w
            FROM documents
        ), first_seen AS (
            SELECT w, MIN(batch_no) AS batch_no FROM tok GROUP BY w
        ), totals AS (
            SELECT batch_no,
                   COUNT(*) AS n_tokens,
                   CAST(COUNT(DISTINCT w) AS BIGINT) AS n_types
            FROM tok GROUP BY batch_no
        )
        SELECT t.batch_no, t.n_tokens, t.n_types,
               CAST(COALESCE(f.n_new, 0) AS BIGINT) AS n_new_types,
               CAST(COALESCE(f.n_new, 0) * 1000000 // t.n_types AS BIGINT)
                   AS novelty_rate_micro
        FROM totals t LEFT JOIN (
            SELECT batch_no, CAST(COUNT(*) AS BIGINT) AS n_new
            FROM first_seen GROUP BY batch_no
        ) f USING (batch_no)
    """,
)
def llm_vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary-growth (Heaps' law) monitor over arriving batches — the
    third panel of the crawl-monitoring trio (llm_dedup_rate_trend counts
    re-collected DOCUMENTS, llm_quality_trend gate drift; this counts new
    WORD TYPES): per batch (the source's numeric suffix, arrival order),
    total tokens, distinct types, how many types were NEVER seen in any
    earlier batch, and that novelty rate in micro-units. A collapsing
    novelty curve is the classic diminishing-marginal-data signal — the
    vocabulary view of "this source is mined out", which document-level
    dedup can miss when new docs recombine old language.

    Scale: one token explode (the llm_vocab_induction cost class), then
    two map-side-combinable aggregates — (word → min batch) and per-batch
    token/type counts. Both shuffle on the word key; the skewed-head
    words ("the") are exactly the ones map-side combine collapses to one
    row per partition, the epoch-budget precedent. Output is |batches|
    rows. First batch reads novelty 10⁶ by construction (every type is
    new) — the causality witness the test pins."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        F.regexp_extract("source", r"([0-9]+)$", 1)
        .cast("bigint")
        .alias("batch_no"),
        F.explode(normalized_words(F.col("text"))).alias("w"),
    )
    first_seen = tok.groupBy("w").agg(F.min("batch_no").alias("batch_no"))
    new_types = first_seen.groupBy("batch_no").agg(
        F.count(F.lit(1)).alias("n_new")
    )
    totals = tok.groupBy("batch_no").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.count_distinct("w").alias("n_types"),
    )
    return (
        totals.join(new_types, "batch_no", "left")
        .withColumn("n_new_types", F.coalesce("n_new", F.lit(0)).cast("bigint"))
        .select(
            "batch_no",
            "n_tokens",
            "n_types",
            "n_new_types",
            F.expr("n_new_types * 1000000 div n_types").alias(
                "novelty_rate_micro"
            ),
        )
    )


PMI_MIN_PAIR = 5


@query(
    "llm_bigram_pmi",
    survey_id="LLM-7/LLM-11",
    oracle=rf"""
        WITH words AS (
            SELECT string_split_regex(lower(text), '\s+') AS w FROM documents
        ), bigrams AS (
            SELECT w[i] AS a, w[i+1] AS b
            FROM words, unnest(range(1, len(w))) AS t(i)
        ), pair_counts AS (
            SELECT a, b, COUNT(*) AS n_ab FROM bigrams GROUP BY a, b
        ), uni_a AS (
            SELECT a, COUNT(*) AS n_a FROM bigrams GROUP BY a
        ), uni_b AS (
            SELECT b, COUNT(*) AS n_b FROM bigrams GROUP BY b
        ), total AS (
            SELECT SUM(n_ab)::DOUBLE AS n_pairs FROM pair_counts
        )
        SELECT p.a, p.b, CAST(p.n_ab AS BIGINT) AS n_ab,
               ROUND(ln(p.n_ab * t.n_pairs / (ua.n_a * ub.n_b)), 6) AS pmi
        FROM pair_counts p
        JOIN uni_a ua USING (a)
        JOIN uni_b ub USING (b)
        CROSS JOIN total t
        WHERE p.n_ab >= {PMI_MIN_PAIR}
    """,
)
def llm_bigram_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram pointwise mutual information over the corpus — the
    collocation statistic behind phrase detection (word2vec's phrase
    pass) and embedding-pretraining co-occurrence inputs: PMI(a,b) =
    ln(c_ab·N / (c_a·c_b)) over adjacent word pairs, min-count filtered.

    Scale: bigram generation is a narrow array-zip explode; pair and
    unigram counts are map-side combined; the unigram table (vocab-sized,
    MBs after min-count) BROADCASTS into the pair scoring — the pair
    table never shuffles on the skewed word key. The pair total is the
    1-row scalar shape."""
    docs = load_table(spark, sf_dir, "documents")
    w = normalized_words(F.col("text"))
    bigrams = (
        docs.select(
            F.explode(
                F.arrays_zip(
                    F.slice(w, 1, F.size(w) - 1).alias("a"),
                    F.slice(w, 2, F.size(w) - 1).alias("b"),
                )
            ).alias("p")
        )
        .select(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
    )
    pair_counts = bigrams.groupBy("a", "b").agg(F.count(F.lit(1)).alias("n_ab"))
    # directed-PMI marginals: P(a, ·) over first positions, P(·, b) over
    # second positions — the textbook denominators for bigram PMI
    ua = F.broadcast(bigrams.groupBy("a").agg(F.count(F.lit(1)).alias("n_a")))
    ub = F.broadcast(bigrams.groupBy("b").agg(F.count(F.lit(1)).alias("n_b")))
    total = pair_counts.agg(F.sum("n_ab").cast("double").alias("n_pairs"))
    return (
        pair_counts.filter(F.col("n_ab") >= PMI_MIN_PAIR)
        .join(ua, "a")
        .join(ub, "b")
        .crossJoin(F.broadcast(total))
        .select(
            "a",
            "b",
            F.col("n_ab").cast("bigint").alias("n_ab"),
            F.round(
                F.log(F.col("n_ab") * F.col("n_pairs") / (F.col("n_a") * F.col("n_b"))),
                6,
            ).alias("pmi"),
        )
    )


#: MUST divide 2^32: md5_bucket integerizes 8 hex chars (32 bits), so a
#: non-divisor modulus (e.g. 1e9) leaves a ~25% density step in the
#: low residues and the draw is no longer uniform (review finding).
_WSAMP_DENOM = 1 << 30
_WSAMP_K = 100


@query(
    "llm_weighted_sample",
    survey_id="LLM-9/ETL-3",
    oracle=f"""
        WITH keyed AS (
            SELECT doc_id, lang, n_chars,
                   ROUND(ln(({_md5_bucket_sql('doc_id', 'wsamp:', _WSAMP_DENOM)}
                             + 0.5) / {float(_WSAMP_DENOM)})
                         / n_chars, 12) AS priority
            FROM documents
        )
        SELECT doc_id, lang, n_chars, priority
        FROM keyed
        ORDER BY priority DESC, doc_id
        LIMIT {_WSAMP_K}
    """,
)
def llm_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement
    (Efraimidis–Spirakis A-ES): each doc draws a reproducible uniform
    u ∈ (0,1) from its salted md5 bucket and gets priority ln(u)/weight
    (monotone with u^(1/w)); the global top-k by priority IS a weighted
    sample without replacement — here weight = n_chars, the 'prefer
    longer documents' mixing heuristic.

    Unlike df.sample or rand(), membership is a pure function of doc_id,
    so re-runs, audits, and incremental extensions reproduce the exact
    sample (same property llm_mixture_sample relies on, same salted-hash
    helper, property-tested for uniformity). Scale: priorities are a
    narrow per-row projection; top-k plans as TakeOrderedAndProject —
    per-partition k-heaps, no global sort, no shuffle of non-winners."""
    docs = load_table(spark, sf_dir, "documents")
    u = (
        md5_bucket(F.col("doc_id").cast("string"), "wsamp:", _WSAMP_DENOM)
        + F.lit(0.5)
    ) / F.lit(float(_WSAMP_DENOM))
    keyed = docs.select(
        "doc_id",
        "lang",
        "n_chars",
        F.round(F.log(u) / F.col("n_chars"), 12).alias("priority"),
    )
    return keyed.orderBy(F.desc("priority"), "doc_id").limit(_WSAMP_K)


_LSPLIT_MOD = 16      # power of two: unbiased residues on the 32-bit hash
_LSPLIT_TRAIN = 13    # 13/16 ≈ 81% train / 19% test


def _leakage_split_oracle() -> str:
    from .dedup import _CLUSTER_CTES, _CLUSTER_LABEL_SELECT

    root = "COALESCE(l.cluster_id, d.doc_id)"
    bucket = _md5_bucket_sql(root, "lsplit:", _LSPLIT_MOD)
    return f"""
        WITH RECURSIVE {_CLUSTER_CTES},
        labels AS ({_CLUSTER_LABEL_SELECT})
        SELECT d.doc_id,
               {root} AS cluster_root,
               CASE WHEN {bucket} < {_LSPLIT_TRAIN}
                    THEN 'train' ELSE 'test' END AS split
        FROM documents d LEFT JOIN labels l USING (doc_id)
    """


@query(
    "llm_leakage_free_split",
    survey_id="ETL-3/LLM-3",
    oracle=_leakage_split_oracle(),
)
def llm_leakage_free_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup-aware train/test split: every document is assigned by the
    salted hash of its DEDUP-CLUSTER root (singletons root at themselves),
    so two near-duplicate documents can never land on opposite sides of
    the split — closing the eval-leakage hole a doc-hash split (ETL-3)
    leaves open whenever near-dups survive upstream dedup. By
    construction, membership is reproducible and appending new corpus
    batches never reshuffles existing assignments unless clustering
    itself links them.

    Scale: the only addition over llm_dedup_clusters is a left join of
    the (near-dup-density-bounded) label table onto the doc-id spine and
    a narrow hash projection — the split itself is shuffle-free. The
    hash modulus is a power of two (the 32-bit-hash uniformity rule the
    weighted sampler pins)."""
    from .dedup import llm_dedup_clusters

    labels = llm_dedup_clusters(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    root = F.coalesce(F.col("cluster_id"), F.col("doc_id"))
    return (
        docs.join(labels, "doc_id", "left")
        .select(
            "doc_id",
            root.alias("cluster_root"),
            F.when(
                md5_bucket(root.cast("string"), "lsplit:", _LSPLIT_MOD)
                < _LSPLIT_TRAIN,
                "train",
            )
            .otherwise("test")
            .alias("split"),
        )
    )


# ---------------------------------------------------------------------------
# Bigram LM quality scoring (the order-2 sibling of llm_unigram_logprob)
# ---------------------------------------------------------------------------


@query(
    "llm_bigram_logprob",
    survey_id="LLM-9/LLM-11",
    oracle=rf"""
        WITH words AS (
            SELECT doc_id, string_split_regex(lower(text), '\s+') AS w
            FROM documents
        ), toks AS (
            SELECT doc_id, t.i AS pos, w[t.i + 1] AS w1, w[t.i + 2] AS w2
            FROM words, unnest(range(len(w) - 1)) AS t(i)
        ), uni AS (
            SELECT w1 AS w, COUNT(*) AS c FROM (
                SELECT doc_id, unnest(w) AS w1 FROM words
            ) GROUP BY w1 HAVING COUNT(*) >= {UNIGRAM_MIN_COUNT}
        ), v AS (
            SELECT COUNT(*)::DOUBLE AS vsize FROM uni
        ), bi AS (
            SELECT w1, w2, COUNT(*) AS c2 FROM toks GROUP BY w1, w2
        )
        SELECT toks.doc_id,
               COUNT(*) AS n_bigrams,
               ROUND(AVG(-ln((COALESCE(bi.c2, 0) + 1)
                             / (u1.c + v.vsize))), 6) AS avg_neg_logprob
        FROM toks
        JOIN uni u1 ON toks.w1 = u1.w
        JOIN uni u2 ON toks.w2 = u2.w
        LEFT JOIN bi ON toks.w1 = bi.w1 AND toks.w2 = bi.w2
        CROSS JOIN v
        GROUP BY toks.doc_id
    """,
)
def llm_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram language-model quality score with add-1 smoothing — the
    order-2 upgrade of llm_unigram_logprob's KenLM-style perplexity
    gate: each document scores the mean surprisal of its in-vocabulary
    word bigrams, p(w2|w1) = (c(w1,w2)+1)/(c(w1)+|V|), so repeated
    improbable transitions (shuffled text, gibberish interleave) score
    high where the unigram gate is blind.

    The vocabulary discipline mirrors the unigram operator exactly:
    only bigrams whose BOTH words pass the corpus min-count filter are
    scored (the filter is what keeps the broadcast tables bounded at
    100 TB — the raw bigram table grows with the corpus, but the
    min-count vocab saturates), and an in-vocab bigram never seen in
    the corpus smooths to c2=0 rather than being dropped, which is the
    whole point of smoothing. Plan shape: one exploded-bigram pass,
    counts via map-side-combining aggregates, scoring through TWO
    broadcast joins (vocab, vocab-filtered observed-bigram counts) plus
    the 1-row |V| scalar — the scoring pass itself is map-only, no
    shuffle of the exploded corpus on skewed word keys. The in-vocab
    bigram table is the one term that still grows (sub-linearly) with
    the corpus; when it outgrows broadcast, production either prunes
    low-count bigrams KenLM-style (accepting approximate smoothing) or
    shuffles the scoring join on (w1, w2) — a well-distributed compound
    key, unlike the stopword-skewed unigram key."""
    docs = load_table(spark, sf_dir, "documents")
    words = docs.select("doc_id", normalized_words(F.col("text")).alias("w"))
    toks = words.select(
        "doc_id",
        F.posexplode(
            F.when(
                F.size("w") >= 2,
                F.zip_with(
                    F.slice("w", 1, F.size("w") - 1),
                    F.slice("w", 2, F.size("w") - 1),
                    lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
                ),
            ).otherwise(F.array()),
        ).alias("pos", "bg"),
    ).select("doc_id", F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))
    uni = (
        docs.select(F.explode(normalized_words(F.col("text"))).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") >= UNIGRAM_MIN_COUNT)
    )
    vsize = uni.agg(F.count(F.lit(1)).cast("double").alias("vsize"))
    u1 = uni.select(F.col("w").alias("w1"), F.col("c").alias("c1"))
    u2 = uni.select(F.col("w").alias("w2"))
    # the broadcast bigram table carries ONLY in-vocab pairs (a scored
    # pair's count is the same either way — filtering the table by key
    # membership never changes c2); OOV-keyed counts would otherwise
    # grow the broadcast with the corpus tail
    bi = (
        toks.groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c2"))
        .join(F.broadcast(u1.select("w1")), "w1", "left_semi")
        .join(F.broadcast(u2), "w2", "left_semi")
    )
    return (
        toks.join(F.broadcast(u1), "w1")
        .join(F.broadcast(u2), "w2")
        .join(F.broadcast(bi), ["w1", "w2"], "left")
        .crossJoin(F.broadcast(vsize))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(
                F.avg(
                    -F.log(
                        (F.coalesce(F.col("c2"), F.lit(0)) + 1)
                        / (F.col("c1") + F.col("vsize"))
                    )
                ),
                6,
            ).alias("avg_neg_logprob"),
        )
    )


# ---------------------------------------------------------------------------
# Source-mixture temperature weights
# ---------------------------------------------------------------------------

MIXTURE_ALPHA = 0.5  # temperature exponent: 1.0 = proportional, 0 = uniform


@query(
    "llm_mixture_temperature_weights",
    survey_id="LLM-11",
    oracle=rf"""
        WITH per_source AS (
            SELECT source,
                   CAST(COUNT(*) AS BIGINT) AS n_docs,
                   CAST(SUM(len(list_filter(
                       string_split_regex(lower(text), '\s+'),
                       x -> x <> ''))) AS BIGINT) AS n_tokens
            FROM documents GROUP BY source
        ), powed AS (
            SELECT source, n_docs, n_tokens,
                   ROUND(pow(n_tokens, {MIXTURE_ALPHA}), 9) AS p_raw
            FROM per_source
        )
        SELECT source, n_docs, n_tokens,
               ROUND(p_raw / SUM(p_raw) OVER (), 6) AS sample_weight
        FROM powed
    """,
)
def llm_mixture_temperature_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled source-mixture sampling weights — the standard
    multilingual/multi-source rebalancing step (the alpha-sampling of
    mBERT/XLM-R and the motivation for UniMax): each source's sampling
    probability is n_tokens^alpha normalized over sources, so alpha=1
    reproduces natural proportions and alpha→0 flattens toward uniform,
    boosting low-resource sources. Downstream, llm_mixture_sample /
    llm_weighted_sample consume exactly such per-source weights.

    Cross-engine float discipline: pow() is the one non-algebraic term
    (libm implementations may differ in the last ulp), so the raw power
    is PRE-ROUNDED at 9 dp on both engines before normalization — the
    llm_pagerank discipline — and the normalized weight reported at
    6 dp; magnitudes here (hundreds) leave 9 dp far above ulp noise.

    Scale: one map-side-combining aggregate over documents (token
    counts), then the weight arithmetic runs on one row per source —
    dozens of rows at any corpus size; the window-normalization is a
    single-partition pass over that tiny table, never over data."""
    docs = load_table(spark, sf_dir, "documents")
    per_source = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(
            F.size(F.filter(normalized_words(F.col("text")), lambda x: x != ""))
        ).alias("n_tokens"),
    )
    powed = per_source.select(
        "source",
        "n_docs",
        "n_tokens",
        F.round(F.pow(F.col("n_tokens"), F.lit(MIXTURE_ALPHA)), 9).alias("p_raw"),
    )
    w = Window.partitionBy()
    return powed.select(
        "source",
        "n_docs",
        "n_tokens",
        F.round(F.col("p_raw") / F.sum("p_raw").over(w), 6).alias("sample_weight"),
    )


#: Interleave-schedule horizon: how many training steps the schedule
#: report plans ahead. A constant — the plan frame is N x |sources| rows
#: regardless of corpus size.
SCHEDULE_STEPS = 240


@query(
    "llm_mixture_schedule",
    survey_id="LLM-3/ETL-3",
    oracle=f"""
        WITH w AS (
            SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY source
        ), slots AS (
            SELECT source,
                   CAST(j AS BIGINT)                       AS k,
                   CAST(((2 * j - 1) * 1000000000000) // n_docs
                        AS BIGINT)                         AS slot_key
            FROM w, generate_series(1, {SCHEDULE_STEPS}) AS t(j)
        ), ranked AS (
            SELECT CAST(ROW_NUMBER() OVER (ORDER BY slot_key, source, k)
                        AS BIGINT) AS step,
                   source, k, slot_key
            FROM slots
        )
        SELECT step, source, k, slot_key FROM ranked
        WHERE step <= {SCHEDULE_STEPS}
    """,
)
def llm_mixture_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weighted interleave of sources into a training-step
    order — the schedule a data loader follows so every source is spread
    evenly through the epoch in proportion to its weight (here: doc
    count), instead of clumping (which biases early training toward
    whichever source a naive concat puts first). Classic error-diffusion
    /Bresenham interleave: source s's k-th emission sits at rational
    position (2k-1)/(2*w_s), and the global order is the merge of those
    ladders — over any prefix of length L, source s appears
    round(L*w_s/W) +- 1 times. One row per step: the source to draw
    from, its per-source emission index k, and the slot key.

    All-integer: the slot key is an exact floor in pico-units
    ((2k-1)*1e12 div w_s — magnitudes <= ~5e14, no overflow), ties
    broken (slot_key, source, k), so the oracle matches bit-for-bit.
    Scale: the weight table is |sources| rows from one map-side agg; the
    ladder explode and the single-partition row_number run on a constant
    N x |sources| plan frame — never on data. The schedule horizon is a
    plan constant; a full-epoch schedule at 100 TB would instead assign
    steps arithmetically per source (step s.t. the ladder inequality
    holds), which this report's prefix verifies."""
    docs = load_table(spark, sf_dir, "documents")
    w = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n_docs"))
    slots = w.select(  # see schedule_step_of for the closed-form inverse
        "source",
        F.explode(F.sequence(F.lit(1), F.lit(SCHEDULE_STEPS))).alias("k"),
        "n_docs",
    ).select(
        "source",
        F.col("k").cast("bigint").alias("k"),
        F.expr(
            "(cast(2 * k - 1 as bigint) * 1000000000000) div n_docs"
        ).alias("slot_key"),
    )
    win = Window.orderBy("slot_key", "source", "k")
    return (
        slots.withColumn("step", F.row_number().over(win).cast("bigint"))
        .filter(F.col("step") <= SCHEDULE_STEPS)
        .select("step", "source", "k", "slot_key")
    )


@query(
    "llm_schedule_evenness",
    survey_id="LLM-3/ETL-6",
    oracle=f"""
        WITH w AS (
            SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY source
        ), slots AS (
            SELECT source,
                   CAST(j AS BIGINT)                       AS k,
                   CAST(((2 * j - 1) * 1000000000000) // n_docs
                        AS BIGINT)                         AS slot_key
            FROM w, generate_series(1, {SCHEDULE_STEPS}) AS t(j)
        ), ranked AS (
            SELECT CAST(ROW_NUMBER() OVER (ORDER BY slot_key, source, k)
                        AS BIGINT) AS step,
                   source
            FROM slots
        ), sched AS (
            SELECT step, source FROM ranked WHERE step <= {SCHEDULE_STEPS}
        ), gaps AS (
            SELECT source, step,
                   step - LAG(step) OVER (
                       PARTITION BY source ORDER BY step) AS gap
            FROM sched
        )
        SELECT source,
               COUNT(*)                          AS n_emissions,
               CAST(MIN(gap) AS BIGINT)          AS min_gap,
               CAST(MAX(gap) AS BIGINT)          AS max_gap,
               CAST({SCHEDULE_STEPS} * 1000000 // COUNT(*)
                    AS BIGINT)                   AS ideal_gap_micro,
               CAST(MAX(gap) * COUNT(*) * 1000000 // {SCHEDULE_STEPS}
                    AS BIGINT)                   AS clump_micro
        FROM gaps
        GROUP BY source
    """,
)
def llm_schedule_evenness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spacing audit of the mixture interleave schedule — the check that
    the error-diffusion ladder actually delivers its anti-clumping
    claim: per source, the emission count inside the horizon, the
    min/max gap between consecutive emissions, the ideal gap (N/count,
    micro-units), and clump_micro = max_gap/ideal — a schedule is
    well-spread when every source's clump factor stays near 1.0×10⁶,
    and a naive concat (all of source A, then all of B) would read
    ~count×10⁶. This is the acceptance test a data-loader team runs
    BEFORE wiring a schedule into training, stated as a query.

    Scale: the schedule itself is a plan-constant N×|sources| frame
    (llm_mixture_schedule's doctrine); the audit adds one per-source
    lag window and an agg over those same N rows — corpus cost stays
    one map-side source-count aggregate. All-integer columns with
    exact floor divisions — bit-exact against the oracle."""
    sched = llm_mixture_schedule(spark, sf_dir).select("step", "source")
    w_src = Window.partitionBy("source").orderBy("step")
    gaps = sched.withColumn(
        "gap", F.col("step") - F.lag("step").over(w_src)
    )
    agged = gaps.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_emissions"),
        F.min("gap").cast("bigint").alias("min_gap"),
        F.max("gap").cast("bigint").alias("max_gap"),
    )
    return agged.select(
        "source",
        "n_emissions",
        "min_gap",
        "max_gap",
        F.expr(
            f"cast({SCHEDULE_STEPS} * 1000000 div n_emissions as bigint)"
        ).alias("ideal_gap_micro"),
        F.expr(
            f"cast(max_gap * n_emissions * 1000000 div {SCHEDULE_STEPS}"
            " as bigint)"
        ).alias("clump_micro"),
    )


_SLOT_SCALE = 1_000_000_000_000


def schedule_step_of(source: str, k: int, weights: dict) -> int:
    """Closed-form inverse of llm_mixture_schedule: the global step at
    which ``source`` emits for the k-th time, by EXACT integer counting —
    no merge, no sort, O(|sources|) per lookup. This is the docstring's
    100 TB shape made code: a full-epoch schedule never materializes the
    merged ladder; each loader computes its own steps arithmetically.

    step = 1 + Σ_t #{j : key_t(j) < K} + Σ_{t<source} #{j : key_t(j) = K}
    with key_t(j) = (2j-1)*S div w_t and K = key_source(k); ties break
    (slot_key, source, k) exactly as the registered query's window does.
    Both floor-inequality counts have closed forms:
    key < K  ⟺  (2j-1)*S ≤ K*w - 1  ⟺  j ≤ ((K*w - 1) div S + 1) div 2,
    and the equal-count is the ≤-count at K+1 minus the <-count at K.
    Pinned equal to the query's step column for every row by
    test_mixture_schedule_arithmetic_inverse_matches."""

    def n_below(key: int, w: int) -> int:
        # j with (2j-1)*S div w < key, i.e. (2j-1)*S <= key*w - 1
        if key <= 0:
            return 0
        return max(0, ((key * w - 1) // _SLOT_SCALE + 1) // 2)

    key = (2 * k - 1) * _SLOT_SCALE // weights[source]
    step = 1
    for t, w in weights.items():
        if t == source:
            # Own earlier emissions ALWAYS rank before the k-th one: for
            # j < k, key(j) <= key(k), and an equal key breaks the tie on
            # the k column. Counting k-1 directly (instead of
            # n_below(key, w)) stays exact even when w > 2*_SLOT_SCALE
            # makes consecutive own keys collide (round-8 review finding:
            # past ~2e12 docs/source the strictly-increasing assumption
            # the old n_below shortcut leaned on fails).
            step += k - 1
        elif t < source:
            step += n_below(key + 1, w)  # ties at K rank before
        else:
            step += n_below(key, w)
    return step


# ---------------------------------------------------------------------------
# Data-constrained epoch budgeting
# ---------------------------------------------------------------------------

#: Training token budget as a fraction of the unique corpus:
#: 9/4 = 2.25 epochs-equivalent — deliberately BETWEEN the low tier's
#: 2-epoch cap and the high tier's 4, so rounds 1-2 fund fully, round 3
#: pro-rates, and round 4 goes unfunded (every allocator branch exercised
#: at every SF).
EPOCH_BUDGET_NUM = 9
EPOCH_BUDGET_DEN = 4
EPOCHS_HIGH = 4  # repeat cap for above-median-TTR sources
EPOCHS_LOW = 2  # repeat cap for the rest (Muennighoff et al. 2023: value
#                 decays with repetition; lower-quality data decays faster)


#: Shared oracle CTE block for the epoch allocator — the plan query and
#: its apply twin build on exactly this, so their oracles cannot drift
#: (the _SUBSTR_CTES precedent). Ends with an ``alloc`` CTE equal to
#: llm_epoch_budget's output.
_EPOCH_BUDGET_CTES = rf"""
        per_source AS MATERIALIZED (
            SELECT source,
                   CAST(COUNT(*) AS BIGINT)              AS n_tokens,
                   CAST(COUNT(DISTINCT word) AS BIGINT)  AS n_types
            FROM (SELECT source,
                         unnest(list_filter(
                             string_split_regex(lower(text), '\s+'),
                             x -> x <> '')) AS word
                  FROM documents)
            GROUP BY source
        ), tiered AS MATERIALIZED (
            SELECT source, n_tokens,
                   (n_types * 1000000) // n_tokens AS ttr_micro,
                   CASE WHEN ROW_NUMBER() OVER (
                            ORDER BY (n_types * 1000000) // n_tokens DESC,
                                     source)
                             <= (COUNT(*) OVER ()) // 2
                        THEN {EPOCHS_HIGH} ELSE {EPOCHS_LOW}
                   END AS max_epochs
            FROM per_source
        ), exploded AS MATERIALIZED (
            SELECT source, n_tokens, ttr_micro, max_epochs,
                   unnest(range(1, max_epochs + 1)) AS r
            FROM tiered
        ), funded AS MATERIALIZED (
            SELECT r, CAST(SUM(n_tokens) AS BIGINT) AS round_total,
                   CAST(LEAST(
                       SUM(n_tokens),
                       GREATEST(
                           (SELECT ({EPOCH_BUDGET_NUM} * SUM(n_tokens))
                                   // {EPOCH_BUDGET_DEN} FROM per_source)
                           - COALESCE(SUM(SUM(n_tokens)) OVER (
                                 ORDER BY r ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND 1 PRECEDING), 0),
                           0)) AS BIGINT) AS funded_tokens
            FROM exploded GROUP BY r
        ), alloc AS MATERIALIZED (
            SELECT e.source, e.n_tokens, e.ttr_micro,
                   CAST(e.max_epochs AS BIGINT) AS max_epochs,
                   CAST(SUM((f.funded_tokens * e.n_tokens) // f.round_total)
                        AS BIGINT) AS alloc_tokens,
                   CAST((SUM((f.funded_tokens * e.n_tokens) // f.round_total)
                         * 1000000) // e.n_tokens AS BIGINT) AS epochs_micro
            FROM exploded e JOIN funded f USING (r)
            GROUP BY e.source, e.n_tokens, e.ttr_micro, e.max_epochs
        )
"""


@query(
    "llm_epoch_budget",
    survey_id="LLM-11",
    oracle=f"""
        WITH {_EPOCH_BUDGET_CTES}
        SELECT source, n_tokens, ttr_micro, max_epochs, alloc_tokens,
               epochs_micro
        FROM alloc
    """,
)
def llm_epoch_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-constrained epoch allocation (Muennighoff et al. 2023,
    "Scaling Data-Constrained Language Models"): given a training token
    budget smaller than max-repeats × corpus, decide how many epochs of
    each SOURCE to train on. Repetition value decays, and decays faster
    for lower-quality data — so sources are tiered by type-token ratio
    (micro-unit integer; above-median TTR ⇒ cap EPOCHS_HIGH, rest
    EPOCHS_LOW, median split tie-broken by source name) and the budget
    is poured in epoch ROUNDS: round r takes every source whose cap
    allows an r-th epoch; a round funds fully while budget remains,
    the marginal round pro-rates by token count, later rounds get 0.
    Output per source: unique tokens, ttr_micro, the cap, allocated
    tokens, and the resulting (fractional) epochs in micro-units.

    Integer-exact end-to-end: token counts, the TTR, the 9/4 budget,
    cumulative round totals, and the pro-rata share
    ``funded·n_tokens div round_total`` are all BIGINT ops (floor
    division on non-negative values — identical on both engines; the
    full-funding case reduces to exactly n_tokens, so one formula
    covers every branch). No float exists anywhere in the operator, so
    the oracle hash-matches by construction. At 100 TB token counts
    (~10¹⁴ per source) the pro-rata product needs decimal(38,0) — a
    one-line cast; magnitudes at graded SFs sit far inside int64.

    Scale: one map-side-combining (source, word) distinct-count
    aggregate over documents — the only data-sized shuffle, and the
    honest exact form of a per-source vocabulary count (the 100 TB
    path swaps COUNT(DISTINCT word) for approx_count_distinct, the
    same trade ag_approx_count_distinct documents). Everything after
    runs on ONE ROW PER SOURCE (dozens at any corpus size): the tier
    window, the 4-row round ledger, the broadcast joins — allocator
    cost is corpus-size-independent by design."""
    docs = load_table(spark, sf_dir, "documents")
    words = F.filter(normalized_words(F.col("text")), lambda x: x != "")
    per_source = (
        docs.select("source", F.explode(words).alias("word"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.countDistinct("word").alias("n_types"),
        )
    )
    tiered = per_source.select(
        "source",
        "n_tokens",
        F.expr("(n_types * 1000000) div n_tokens").alias("ttr_micro"),
        F.when(
            F.row_number().over(
                Window.orderBy(
                    F.expr("(n_types * 1000000) div n_tokens").desc(),
                    "source",
                )
            )
            <= F.expr(f"count(*) over () div 2"),
            F.lit(EPOCHS_HIGH),
        )
        .otherwise(F.lit(EPOCHS_LOW))
        .alias("max_epochs"),
        F.expr(
            f"({EPOCH_BUDGET_NUM} * sum(n_tokens) over ())"
            f" div {EPOCH_BUDGET_DEN}"
        ).alias("budget"),
    )
    exploded = tiered.select(
        "source",
        "n_tokens",
        "ttr_micro",
        "max_epochs",
        "budget",
        F.explode(F.sequence(F.lit(1), F.col("max_epochs"))).alias("r"),
    )
    funded = (
        exploded.groupBy("r")
        .agg(
            F.sum("n_tokens").alias("round_total"),
            F.max("budget").alias("budget"),
        )
        .select(
            "r",
            "round_total",
            F.expr(
                "least(round_total, greatest(budget - "
                "coalesce(sum(round_total) over (order by r rows between "
                "unbounded preceding and 1 preceding), 0), 0))"
            ).alias("funded_tokens"),
        )
    )
    return (
        exploded.join(F.broadcast(funded), "r")
        .groupBy("source", "n_tokens", "ttr_micro", "max_epochs")
        .agg(
            F.sum(
                F.expr("(funded_tokens * n_tokens) div round_total")
            ).alias("alloc_tokens")
        )
        .select(
            "source",
            "n_tokens",
            "ttr_micro",
            F.col("max_epochs").cast("long").alias("max_epochs"),
            "alloc_tokens",
            F.expr("(alloc_tokens * 1000000) div n_tokens").alias(
                "epochs_micro"
            ),
        )
    )


@query(
    "llm_epoch_budget_apply",
    survey_id="LLM-11",
    oracle=rf"""
        WITH {_EPOCH_BUDGET_CTES},
        reps AS MATERIALIZED (
            SELECT d.doc_id, d.source,
                   a.epochs_micro // 1000000
                   + CASE WHEN {_md5_bucket_sql(
                       "d.doc_id::VARCHAR", "epoch:", 1_000_000)}
                          < a.epochs_micro % 1000000
                     THEN 1 ELSE 0 END AS n_repeats
            FROM documents d JOIN alloc a USING (source)
        )
        SELECT doc_id, source,
               CAST(q.i AS BIGINT)         AS repeat_idx,
               CAST(n_repeats AS BIGINT)   AS n_repeats
        FROM reps, unnest(range(n_repeats)) AS q(i)
    """,
)
def llm_epoch_budget_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MATERIALIZE the epoch allocation — the apply twin of
    llm_epoch_budget (the plan→apply pattern of llm_substring_dedup_*):
    emit one row per (document, repeat) the training run will actually
    see. Whole epochs replicate every doc of the source
    (floor(epochs_micro/10⁶) copies); the FRACTIONAL epoch is realized
    as a deterministic per-doc Bernoulli at exactly the fractional
    rate — include one extra copy iff md5('epoch:'||doc_id) mod 10⁶ <
    epochs_micro mod 10⁶ (the md5-integerization discipline: no RNG,
    re-runs and the oracle agree row-for-row, and the realized rate is
    exact in expectation with hash-uniform deviation). Consumes
    llm_epoch_budget as a frame and shares its oracle CTE block, so
    plan and apply can never disagree about the allocation.

    Scale: the allocation is dozens of rows — a broadcast join onto the
    doc stream; the explode emits exactly the output (Σ repeats ≈
    budget/avg-doc-tokens rows), never more. Replicating doc IDS (not
    text) is the point: the downstream writer joins text back per
    shard, so the multiplied stream is 16 B/row wide."""
    alloc = llm_epoch_budget(spark, sf_dir).select("source", "epochs_micro")
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    reps = (
        docs.join(F.broadcast(alloc), "source")
        .select(
            "doc_id",
            "source",
            (
                F.expr("epochs_micro div 1000000")
                + F.when(
                    md5_bucket(
                        F.col("doc_id").cast("string"), "epoch:", 1_000_000
                    )
                    < F.col("epochs_micro") % 1_000_000,
                    F.lit(1),
                ).otherwise(F.lit(0))
            ).alias("n_repeats"),
        )
        .filter(F.col("n_repeats") > 0)
    )
    return reps.select(
        "doc_id",
        "source",
        F.explode(
            F.sequence(F.lit(0), F.col("n_repeats") - 1)
        ).alias("repeat_idx"),
        F.col("n_repeats").cast("long").alias("n_repeats"),
    ).select(
        "doc_id",
        "source",
        F.col("repeat_idx").cast("long").alias("repeat_idx"),
        "n_repeats",
    )


# ---------------------------------------------------------------------------
# Curriculum ordering
# ---------------------------------------------------------------------------

CURRICULUM_PHASES = 10


@query(
    "llm_curriculum_order",
    survey_id="LLM-11",
    oracle=rf"""
        WITH phased AS (
            SELECT doc_id,
                   NTILE({CURRICULUM_PHASES}) OVER
                       (ORDER BY n_chars, doc_id) AS phase,
                   {_md5_bucket_sql("doc_id::VARCHAR", "curr:", 1_000_000)}
                       AS shuffle_key
            FROM documents
        )
        SELECT doc_id, CAST(phase AS INT) AS phase,
               CAST(ROW_NUMBER() OVER
                   (PARTITION BY phase ORDER BY shuffle_key, doc_id)
                   AS BIGINT) AS ord
        FROM phased
    """,
)
def llm_curriculum_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum ordering: assign each document a training phase by
    difficulty decile (length-based curriculum — short/easy first, the
    classic Bengio et al. schedule) and a deterministic within-phase
    shuffle position, so the training loader can stream phase 1..10 in
    order while each phase arrives well-mixed. The shuffle key is the
    md5 integerization (no RNG — re-runs and the oracle agree exactly;
    ties broken by doc_id).

    Scale: difficulty uses the PRE-COMPUTED n_chars column (no text
    scan). The graded form's global NTILE is the toy-scale shape; at
    100 TB phase boundaries come from an approx-quantile pass over
    n_chars (the wn_ntile_scalable two-phase doctrine) and the
    within-phase order is (shuffle_key, doc_id) — already a total
    order, so the loader sorts each phase's shard files independently
    and no global window ever runs."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    phased = docs.select(
        "doc_id",
        F.ntile(CURRICULUM_PHASES)
        .over(Window.orderBy("n_chars", "doc_id"))
        .alias("phase"),
        md5_bucket(F.col("doc_id").cast("string"), "curr:", 1_000_000).alias(
            "shuffle_key"
        ),
    )
    return phased.select(
        "doc_id",
        F.col("phase").cast("int").alias("phase"),
        F.row_number()
        .over(Window.partitionBy("phase").orderBy("shuffle_key", "doc_id"))
        .cast("bigint")
        .alias("ord"),
    )


# ---------------------------------------------------------------------------
# Span-corruption planning (T5-style denoising objective)
# ---------------------------------------------------------------------------

CORRUPT_BLOCK = 20  # tokens per block; one span corrupted per full block
CORRUPT_SPAN = 3  # tokens masked per span (mean span length in T5)


@query(
    "llm_span_corruption_plan",
    survey_id="LLM-11",
    oracle=rf"""
        WITH words AS (
            SELECT doc_id,
                   len(list_filter(string_split_regex(lower(text), '\s+'),
                       x -> x <> '')) AS n_tokens
            FROM documents
        )
        SELECT doc_id,
               CAST(b.i AS INT) AS span_idx,
               CAST(b.i * {CORRUPT_BLOCK}
                    + ('0x' || substring(md5('span:' || doc_id::VARCHAR
                          || '|' || b.i::VARCHAR), 1, 8))::BIGINT
                      % {CORRUPT_BLOCK - CORRUPT_SPAN + 1} AS BIGINT)
                   AS start_pos,
               CAST({CORRUPT_SPAN} AS INT) AS span_len
        FROM words, unnest(range(n_tokens // {CORRUPT_BLOCK})) AS b(i)
    """,
)
def llm_span_corruption_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Span-corruption plan — the T5/UL2 denoising-objective prep step:
    decide which token spans each document masks BEFORE tokenized
    shards are written, so the same corruption is reproducible across
    epochs and engines. Deterministic variant of T5's random policy:
    each full 20-token block hosts exactly one 3-token span (15%
    corruption rate, mean span 3 — the T5 defaults) at an md5-drawn
    offset within the block, which guarantees spans never overlap and
    never cross block boundaries — the two invariants the random
    sampler enforces with rejection. One output row per span
    (doc_id, span_idx, start_pos, span_len), the layout a masking
    kernel consumes by merge-joining on doc_id.

    Scale: map-only — token count per doc then a bounded explode
    (n_tokens/20 rows per doc, proportional to output); no shuffle, no
    state, trivially parallel at any corpus size."""
    docs = load_table(spark, sf_dir, "documents")
    words = docs.select(
        "doc_id",
        F.size(
            F.filter(normalized_words(F.col("text")), lambda x: x != "")
        ).alias("n_tokens"),
    )
    n_off = CORRUPT_BLOCK - CORRUPT_SPAN + 1
    return (
        # the >= block filter guards Spark's sequence(): with start > stop
        # it produces a DESCENDING [0, -1], not the empty set DuckDB's
        # range(0) yields — sub-block docs must never reach the explode
        words.filter(F.col("n_tokens") >= CORRUPT_BLOCK)
        .select(
            "doc_id",
            F.explode(
                F.sequence(
                    F.lit(0), F.floor(F.col("n_tokens") / CORRUPT_BLOCK) - 1
                )
            ).alias("i"),
        )
        .select(
            "doc_id",
            F.col("i").cast("int").alias("span_idx"),
            (
                F.col("i") * CORRUPT_BLOCK
                + md5_bucket(
                    F.concat(
                        F.col("doc_id").cast("string"),
                        F.lit("|"),
                        F.col("i").cast("string"),
                    ),
                    "span:",
                    n_off,
                )
            )
            .cast("bigint")
            .alias("start_pos"),
            F.lit(CORRUPT_SPAN).cast("int").alias("span_len"),
        )
    )


# ---------------------------------------------------------------------------
# BPE tokenizer training (iterative merge loop)
# ---------------------------------------------------------------------------

BPE_MERGES = 5


def _bpe_oracle_sql() -> str:
    """Fully unrolled 5-merge BPE twin: the same word-frequency table,
    the same adjacent-pair counts, the same (count DESC, pair ASC)
    argmax, the same greedy left-to-right fold rewrite, stage by stage.

    The rewrite is a `list_reduce` fold over the symbol tokens that
    merges the current token into the accumulator's tail whenever
    (tail, current) equals the chosen pair — EXACT canonical greedy
    non-overlapping merging, because a just-merged tail token l||r can
    never equal l again (r is non-empty), so a fold never re-consumes
    its own output within a pass (' a a a a a ' -> ' aa aa a ', where a
    replace()-based rewrite yields ' aa a aa '; ADVICE r4). Tokens
    contain no spaces, so ends_with(acc, ' '||l) holds iff the last
    token is exactly l."""
    ctes = [
        r"""words AS (
            SELECT w, CAST(COUNT(*) AS BIGINT) AS freq FROM (
                SELECT unnest(string_split_regex(lower(text), '\s+')) AS w
                FROM documents
            ) WHERE w <> '' GROUP BY w
        ), seq0 AS (
            SELECT ' ' || array_to_string(string_split_regex(w, ''), ' ')
                   || ' </w> ' AS s, freq
            FROM words
        )"""
    ]
    for k in range(1, BPE_MERGES + 1):
        rewrite = (
            f"""list_reduce(
                list_prepend('', string_split(trim(s), ' ')),
                (acc, x) -> CASE
                    WHEN x = b{k}.r AND ends_with(acc, ' ' || b{k}.l)
                        THEN left(acc, len(acc) - len(b{k}.l))
                             || b{k}.l || b{k}.r
                    ELSE acc || ' ' || x END
            ) || ' '"""
        )
        ctes.append(
            f"""pc{k} AS (
            SELECT a[t.i + 1] AS l, a[t.i + 2] AS r, SUM(freq) AS cnt
            FROM (SELECT string_split_regex(trim(s), ' ') AS a, freq
                  FROM seq{k - 1}),
                 unnest(range(len(a) - 1)) AS t(i)
            GROUP BY l, r
        ), b{k} AS (
            SELECT l, r, cnt FROM pc{k} ORDER BY cnt DESC, l, r LIMIT 1
        ), seq{k} AS (
            SELECT {rewrite} AS s, freq FROM seq{k - 1} CROSS JOIN b{k}
        )"""
        )
    finals = " UNION ALL ".join(
        f"SELECT {k} AS merge_rank, l AS sym_left, r AS sym_right,"
        f" l || r AS merged, CAST(cnt AS BIGINT) AS pair_count FROM b{k}"
        for k in range(1, BPE_MERGES + 1)
    )
    return "WITH " + ", ".join(ctes) + " " + finals


@query("llm_bpe_train", survey_id="LLM-11/LLM-7", oracle=_bpe_oracle_sql())
def llm_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE tokenizer TRAINING — the iterative merge loop itself (the
    sibling llm_bpe_merge_candidates scores one step; this runs the
    algorithm): start from characters + an end-of-word marker over the
    corpus word-frequency table, and 5 times (a) count
    frequency-weighted adjacent symbol pairs, (b) take the most frequent
    pair (ties by symbol order — the determinism rule), (c) merge every
    occurrence. Output is the learned merge table
    (rank, left, right, merged, count) — exactly what a tokenizer ships.

    Scale: classic BPE never touches raw text after the first pass —
    training runs on the BOUNDED word-frequency table (vocabulary
    saturates; GPT-2's BPE trained on exactly such a table), so each
    iteration is an explode of per-word symbol arrays (vocab × word
    length rows), a map-side-combined pair count, and a TakeOrdered(1)
    argmax whose single row is collected as the merge decision — the
    same bounded-collect class as the CC fixpoint witness (one scalar
    decision per iteration, never data). The rewrite is a greedy
    left-to-right fold over the symbol tokens (F.aggregate /
    list_reduce — exact canonical BPE merging even on odd runs of the
    merged symbol; see _bpe_oracle_sql for the argument), identical in
    the unrolled DuckDB oracle."""
    docs = load_table(spark, sf_dir, "documents")
    words = (
        docs.select(F.explode(normalized_words(F.col("text"))).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    seqdf = words.select(
        F.concat(
            F.lit(" "),
            F.array_join(F.split(F.col("w"), ""), " "),
            F.lit(" </w> "),
        ).alias("s"),
        "freq",
    ).cache()
    merges: list[tuple] = []
    for rank in range(1, BPE_MERGES + 1):
        arr = F.split(F.trim(F.col("s")), " ")
        pairs = seqdf.select(
            "freq",
            F.explode(
                F.zip_with(
                    F.slice(arr, 1, F.size(arr) - 1),
                    F.slice(arr, 2, F.size(arr) - 1),
                    lambda a, b: F.struct(a.alias("l"), b.alias("r")),
                )
            ).alias("p"),
        )
        counts = pairs.groupBy("p.l", "p.r").agg(F.sum("freq").alias("cnt"))
        best = counts.orderBy(
            F.col("cnt").desc(), F.col("l"), F.col("r")
        ).limit(1).collect()
        if not best:
            break
        left, right, cnt = best[0].l, best[0].r, best[0].cnt
        merges.append((rank, left, right, left + right, cnt))
        folded = F.aggregate(
            F.split(F.trim(F.col("s")), " "),
            F.lit(""),
            lambda acc, x: F.when(
                (x == F.lit(right)) & F.endswith(acc, F.lit(" " + left)),
                F.concat(
                    F.left(acc, F.length(acc) - F.lit(len(left))),
                    F.lit(left + right),
                ),
            ).otherwise(F.concat(acc, F.lit(" "), x)),
        )
        new_s = F.concat(folded, F.lit(" "))
        nxt = seqdf.select(new_s.alias("s"), "freq").cache()
        seqdf.unpersist()
        seqdf = nxt
    seqdf.unpersist()
    return spark.createDataFrame(
        merges,
        "merge_rank int, sym_left string, sym_right string, "
        "merged string, pair_count bigint",
    )


# ---------------------------------------------------------------------------
# Packed-sequence lineage (the inverse mapping of llm_sequence_pack)
# ---------------------------------------------------------------------------


@query(
    "llm_pack_lineage",
    survey_id="LLM-11",
    oracle=rf"""
        WITH toks AS (
            SELECT doc_id,
                   {_md5_bucket_sql("doc_id::VARCHAR", "pack:", PACK_SHARDS)}
                       AS shard,
                   len(regexp_extract_all(lower(text), '{TOKEN_PATTERN}'))
                       AS n_tokens
            FROM documents
        ), offsets AS (
            SELECT doc_id, shard, n_tokens,
                   CAST(COALESCE(SUM(n_tokens) OVER (
                       PARTITION BY shard ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                   ), 0) AS BIGINT) AS start_offset
            FROM toks WHERE n_tokens > 0
        )
        SELECT doc_id, shard,
               CAST(q.seq AS BIGINT) AS seq_idx,
               CAST(GREATEST(start_offset, q.seq * {SEQ_LEN})
                    - q.seq * {SEQ_LEN} AS BIGINT)      AS seq_start,
               CAST(LEAST(start_offset + n_tokens, (q.seq + 1) * {SEQ_LEN})
                    - GREATEST(start_offset, q.seq * {SEQ_LEN})
                    AS BIGINT)                           AS n_tokens_in_seq
        FROM offsets,
             unnest(range(start_offset // {SEQ_LEN},
                          (start_offset + n_tokens - 1) // {SEQ_LEN} + 1))
                 AS q(seq)
    """,
)
def llm_pack_lineage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Packed-sequence LINEAGE — the inverse mapping of llm_sequence_pack:
    one row per (doc, training sequence it touches) with the doc's token
    span inside that sequence. This is the table data governance needs
    ("which documents fed sample N?" for takedown/contamination tracing)
    and the writer needs to slice per-sequence attention-mask boundaries.
    Pure integer arithmetic over the same deterministic pack layout, so
    both engines derive identical spans; a doc crossing K boundaries
    explodes into K+1 rows — output-proportional, never more.

    Scale: identical to the pack itself (one shard-key shuffle + per-shard
    running sum), plus a bounded explode of ceil(n_tokens/SEQ_LEN) rows
    per doc. The lineage table is the artifact to PERSIST bucketed by
    seq_idx at production scale, so takedown queries are point lookups."""
    toks = (
        token_counts(spark, sf_dir)
        .select(
            "doc_id",
            md5_bucket(
                F.col("doc_id").cast("string"), "pack:", PACK_SHARDS
            ).alias("shard"),
            "n_tokens",
        )
        .filter(F.col("n_tokens") > 0)
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = toks.withColumn(
        "start_offset", F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    )
    first_seq = F.floor(F.col("start_offset") / SEQ_LEN)
    last_seq = F.floor((F.col("start_offset") + F.col("n_tokens") - 1) / SEQ_LEN)
    exploded = offsets.select(
        "doc_id",
        "shard",
        "start_offset",
        "n_tokens",
        F.explode(F.sequence(first_seq, last_seq)).alias("seq_idx"),
    )
    span_lo = F.greatest(F.col("start_offset"), F.col("seq_idx") * SEQ_LEN)
    span_hi = F.least(
        F.col("start_offset") + F.col("n_tokens"),
        (F.col("seq_idx") + 1) * SEQ_LEN,
    )
    return exploded.select(
        "doc_id",
        "shard",
        F.col("seq_idx").cast("bigint").alias("seq_idx"),
        (span_lo - F.col("seq_idx") * SEQ_LEN).cast("bigint").alias("seq_start"),
        (span_hi - span_lo).cast("bigint").alias("n_tokens_in_seq"),
    )


#: Shared by llm_pack_bins and llm_pack_efficiency (which aggregates the
#: identical packing): the next-fit recursion as a recursive CTE.
_PACK_BINS_ORACLE = rf"""
        WITH RECURSIVE toks AS (
            SELECT doc_id,
                   {_md5_bucket_sql("doc_id::VARCHAR", "pack:", PACK_SHARDS)}
                       AS shard,
                   len(regexp_extract_all(lower(text), '{TOKEN_PATTERN}'))
                       AS n_tokens
            FROM documents
        ), rows_n AS (
            SELECT doc_id, shard,
                   CAST(LEAST(n_tokens, {SEQ_LEN}) AS BIGINT) AS eff,
                   CASE WHEN n_tokens > {SEQ_LEN} THEN 1 ELSE 0 END
                       AS truncated,
                   ROW_NUMBER() OVER (PARTITION BY shard ORDER BY doc_id)
                       AS rn
            FROM toks WHERE n_tokens > 0
        ), rec AS (
            SELECT doc_id, shard, eff, truncated, rn,
                   CAST(0 AS BIGINT) AS bin_idx, eff AS fill
            FROM rows_n WHERE rn = 1
            UNION ALL
            SELECT r.doc_id, r.shard, r.eff, r.truncated, r.rn,
                   CASE WHEN p.fill + r.eff <= {SEQ_LEN}
                        THEN p.bin_idx ELSE p.bin_idx + 1 END,
                   CASE WHEN p.fill + r.eff <= {SEQ_LEN}
                        THEN p.fill + r.eff ELSE r.eff END
            FROM rows_n r JOIN rec p
              ON r.shard = p.shard AND r.rn = p.rn + 1
        )
        SELECT doc_id, shard, bin_idx,
               fill - eff                  AS offset_in_bin,
               eff                         AS n_tokens_packed,
               CAST(truncated AS INT)      AS truncated
        FROM rec
"""


@query("llm_pack_bins", survey_id="LLM-11/UDF-3", oracle=_PACK_BINS_ORACLE)
def llm_pack_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boundary-respecting sequence packing (pad-and-pack): NEXT-FIT bin
    packing of whole documents into SEQ_LEN-token training bins — no
    document ever crosses a bin boundary (the layout used when samples
    must not mix attention across documents and the writer pads each
    bin's tail instead of splitting; llm_sequence_pack is the
    concat-and-cut alternative). Docs longer than SEQ_LEN are truncated
    to one full bin and flagged. Output per doc: its bin, offset, packed
    token count, and the truncation flag — per-bin padding is
    SEQ_LEN − MAX(offset+packed) by construction.

    Packing is ORDER-DEPENDENT state (bin fill carries across rows), so
    no window expresses it: within each md5 shard the docs stream
    through ``applyInPandas`` in doc_id order and a 10-line sequential
    loop assigns bins — the honest shape, because next-fit is
    inherently sequential PER STREAM and embarrassingly parallel ACROSS
    streams. The oracle is the same recursion as a recursive CTE
    (depth = max docs/shard). Scale: one hash shuffle on the shard key;
    shards are the parallel unit and a shard's (doc_id, count) pairs —
    not its text — are what the worker holds. MEASURED (r8, VERDICT r7
    #5): at sf10 the row is ~90% the TOKEN_PATTERN count scan, so
    PACK_SHARDS 8 → 32 moves nothing (24.10 → 24.25 s) — the lever
    governs only the sequential packing stage, which matters once the
    token counts are precomputed and reused across consumers (the
    production layout; isolation numbers in SCALE.md). Re-bucketing
    never changes a doc's packed length/truncation/bin capacity
    (test_pack_bins_shard_count_only_rebuckets). All-integer state, so
    the oracle matches exactly."""
    return _pack_bins(spark, sf_dir, shards=PACK_SHARDS)


def _pack_bins(spark: SparkSession, sf_dir: str, shards: int) -> DataFrame:
    """llm_pack_bins' plan with the shard count exposed: PACK_SHARDS is
    the parallelism lever (shards = O(cores) at scale), and changing it
    must only RE-BUCKET — every doc keeps its packed length and
    truncation flag, every bin stays ≤ SEQ_LEN — which the knob test
    pins (VERDICT r7 #5). Threaded as an argument, not a patched module
    global, because executors re-import the module."""
    import pandas as pd

    toks = (
        token_counts(spark, sf_dir)
        .select(
            "doc_id",
            md5_bucket(F.col("doc_id").cast("string"), "pack:", shards).alias(
                "shard"
            ),
            "n_tokens",
        )
        .filter(F.col("n_tokens") > 0)
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id").reset_index(drop=True)
        out_bin, out_off, out_eff, out_trunc = [], [], [], []
        bin_idx, fill = 0, 0
        for n in pdf["n_tokens"]:
            eff = min(int(n), SEQ_LEN)
            if fill + eff > SEQ_LEN and fill > 0:
                bin_idx, fill = bin_idx + 1, 0
            out_bin.append(bin_idx)
            out_off.append(fill)
            out_eff.append(eff)
            out_trunc.append(1 if int(n) > SEQ_LEN else 0)
            fill += eff
        return pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "shard": pdf["shard"],
                "bin_idx": out_bin,
                "offset_in_bin": out_off,
                "n_tokens_packed": out_eff,
                "truncated": out_trunc,
            }
        )

    return toks.groupBy("shard").applyInPandas(
        pack,
        "doc_id bigint, shard bigint, bin_idx bigint, "
        "offset_in_bin bigint, n_tokens_packed bigint, truncated int",
    )


@query(
    "llm_pack_efficiency",
    survey_id="LLM-11/ETL-6",
    oracle=rf"""
        WITH packed AS ({_PACK_BINS_ORACLE})
        SELECT shard,
               COUNT(*)                                  AS n_docs,
               MAX(bin_idx) + 1                          AS n_bins,
               CAST(SUM(n_tokens_packed) AS BIGINT)      AS tokens_packed,
               CAST((MAX(bin_idx) + 1) * {SEQ_LEN}
                    - SUM(n_tokens_packed) AS BIGINT)    AS padding_tokens,
               CAST(((MAX(bin_idx) + 1) * {SEQ_LEN} - SUM(n_tokens_packed))
                    * 1000000
                    // ((MAX(bin_idx) + 1) * {SEQ_LEN}) AS BIGINT)
                                                         AS padding_rate_micro,
               CAST(SUM(truncated) AS BIGINT)            AS n_truncated
        FROM packed
        GROUP BY shard
    """,
)
def llm_pack_efficiency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Packing-efficiency / padding-waste report over llm_pack_bins — the
    first number a pretraining-infra user asks of a pad-and-pack layout:
    how much of the token budget is PADDING. Per shard: docs packed, bins
    consumed, tokens packed, padding tokens (bins·SEQ_LEN − packed), the
    padding rate in micro-units, and how many docs were truncated. The
    writer's wasted compute is padding_rate × bins; a rising rate is the
    signal to re-sort by length or switch to the concat-and-cut layout
    (llm_sequence_pack).

    All-integer: counts, sums, and the rate as an exact integer floor —
    (padding · 10⁶) div capacity with both terms non-negative, so Spark's
    div and DuckDB's // agree. Scale: the report consumes the packing's
    (shard, bin, count) rows — never text — and aggregates to PACK_SHARDS
    output rows; one hash shuffle on the shard key that the packing
    already paid, then a map-side-combinable agg."""
    packed = llm_pack_bins(spark, sf_dir)
    agged = packed.groupBy("shard").agg(
        F.count(F.lit(1)).alias("n_docs"),
        (F.max("bin_idx") + F.lit(1)).alias("n_bins"),
        F.sum("n_tokens_packed").alias("tokens_packed"),
        F.sum("truncated").cast("bigint").alias("n_truncated"),
    )
    capacity = F.col("n_bins") * SEQ_LEN
    return agged.select(
        "shard",
        "n_docs",
        "n_bins",
        "tokens_packed",
        (capacity - F.col("tokens_packed")).alias("padding_tokens"),
        # decimal(38,0) scale-up (the fertility_micro guard): padding is
        # a per-shard TOKEN quantity — int64 survives 100 TB by only ~3x
        # (wraps at ~9e12 padding tokens/shard) while the oracle's
        # HUGEINT never does; same exact floor either way.
        F.expr(
            f"cast(cast(n_bins * {SEQ_LEN} - tokens_packed as"
            f" decimal(38,0)) * 1000000"
            f" div (n_bins * {SEQ_LEN}) as bigint)"
        ).alias("padding_rate_micro"),
        "n_truncated",
    )


@query(
    "llm_shard_skew_report",
    survey_id="ETL-6/LLM-11",
    oracle=rf"""
        WITH toks AS (
            SELECT {_md5_bucket_sql("doc_id::VARCHAR", "pack:", PACK_SHARDS)}
                       AS shard,
                   len(regexp_extract_all(lower(text), '{TOKEN_PATTERN}'))
                       AS n_tokens
            FROM documents
        ), per AS (
            SELECT shard, CAST(SUM(n_tokens) AS BIGINT) AS tokens
            FROM toks WHERE n_tokens > 0 GROUP BY shard
        )
        SELECT COUNT(*)                    AS n_shards,
               CAST(MIN(tokens) AS BIGINT) AS min_tokens,
               CAST(MAX(tokens) AS BIGINT) AS max_tokens,
               CAST(SUM(tokens) AS BIGINT) AS total_tokens,
               CAST(MAX(tokens) * COUNT(*) * 1000000
                    // SUM(tokens) AS BIGINT) AS skew_micro
        FROM per
    """,
)
def llm_shard_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pre-launch shard-balance check for the packing sharding: per-shard
    token totals reduced to one row — shard count, min/max/total tokens,
    and the skew factor max/avg in micro-units (avg = total/n_shards, so
    skew_micro = max·n·10⁶ div total, an exact integer). The number to
    read BEFORE raising PACK_SHARDS to O(cores) on a real cluster: the
    packing stage's wall-clock is its slowest stream, so a skew of 1.5×
    means a third of the fleet idles. md5 bucketing should hold this
    near 1.0 at any corpus size — a drift upward means skewed document
    LENGTHS (a few giant docs), which re-bucketing cannot fix and
    length-aware assignment can.

    Scale: one narrow token-count pass, one map-side-combinable agg to
    PACK_SHARDS rows, one single-row reduce. No join, no window."""
    toks = (
        token_counts(spark, sf_dir)
        .select(
            md5_bucket(
                F.col("doc_id").cast("string"), "pack:", PACK_SHARDS
            ).alias("shard"),
            "n_tokens",
        )
        .filter(F.col("n_tokens") > 0)
    )
    per = toks.groupBy("shard").agg(F.sum("n_tokens").alias("tokens"))
    return per.agg(
        F.count(F.lit(1)).alias("n_shards"),
        F.min("tokens").alias("min_tokens"),
        F.max("tokens").alias("max_tokens"),
        F.sum("tokens").alias("total_tokens"),
    ).select(
        "n_shards",
        "min_tokens",
        "max_tokens",
        "total_tokens",
        # decimal(38,0), not int64 (the fertility_micro wraparound
        # guard): max_tokens is a per-shard TOKEN sum — at the 100 TB
        # design point (~2.5e13 corpus tokens / 8 shards) the int64
        # product max·n·1e6 ≈ 2.5e19 silently wraps with ANSI off while
        # the DuckDB oracle promotes to HUGEINT.
        F.expr(
            "cast(cast(max_tokens as decimal(38,0)) * n_shards * 1000000"
            " div total_tokens as bigint)"
        ).alias("skew_micro"),
    )


# ---------------------------------------------------------------------------
# DSIR-style importance weighting (data selection for language models)
# ---------------------------------------------------------------------------

#: Hashed-feature dimensionality for the DSIR bucket distributions. 256
#: buckets keeps the lambda table broadcast-trivial at any corpus size
#: (the table has exactly B rows no matter how many tokens feed it).
_DSIR_BUCKETS = 256

#: The "target" slice standing in for a high-quality reference corpus
#: (the role Wikipedia+books play in the DSIR paper): a fixed 20% of the
#: synthetic sources. Content-defined, so re-runs are deterministic.
DSIR_TARGET_SOURCES = ("src0", "src1", "src2", "src3")


@query(
    "llm_dsir_importance",
    survey_id="LLM-9",
    oracle=rf"""
        WITH toks AS (
            SELECT doc_id, source,
                   ('0x' || substring(md5('dsir:' || w), 1, 8))::BIGINT
                       % {_DSIR_BUCKETS} AS bucket
            FROM (
                SELECT doc_id, source,
                       unnest(string_split_regex(lower(text), '\s+')) AS w
                FROM documents
            ) WHERE w <> ''
        ), db AS (
            SELECT doc_id, source, bucket, COUNT(*) AS cnt
            FROM toks GROUP BY 1, 2, 3
        ), raw AS (
            SELECT bucket, SUM(cnt) AS raw_cnt FROM db GROUP BY 1
        ), tgt AS (
            SELECT bucket, SUM(cnt) AS tgt_cnt FROM db
            WHERE source IN ('src0', 'src1', 'src2', 'src3')
            GROUP BY 1
        ), tot AS (
            SELECT (SELECT SUM(raw_cnt) FROM raw) AS raw_tot,
                   (SELECT COALESCE(SUM(tgt_cnt), 0) FROM tgt) AS tgt_tot
        ), lam AS (
            SELECT r.bucket,
                   CAST(FLOOR(1000000.0 * (
                       ln((COALESCE(t.tgt_cnt, 0) + 1)::DOUBLE
                          / (tot.tgt_tot + {_DSIR_BUCKETS}))
                     - ln((r.raw_cnt + 1)::DOUBLE
                          / (tot.raw_tot + {_DSIR_BUCKETS}))
                   )) AS BIGINT) AS lam_micro
            FROM raw r LEFT JOIN tgt t USING (bucket) CROSS JOIN tot
        )
        SELECT db.doc_id, db.source,
               CAST(SUM(db.cnt) AS BIGINT)                  AS n_toks,
               CAST(SUM(db.cnt * lam.lam_micro) AS BIGINT)  AS score_micro,
               CAST(SUM(db.cnt * lam.lam_micro) AS BIGINT) > 0 AS target_like
        FROM db JOIN lam USING (bucket)
        GROUP BY db.doc_id, db.source
    """,
)
def llm_dsir_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style importance weight per document (Xie et al. 2023, "Data
    Selection for Language Models via Importance Resampling", public
    arXiv:2302.03169): hash every token into B=256 buckets, fit add-one-
    smoothed bucket unigram distributions for a fixed TARGET slice (the
    high-quality-reference role) and for the RAW corpus, and score each
    doc by its log-likelihood ratio sum(cnt_b * ln(p_tgt_b / p_raw_b)).
    Docs that look more target-like than corpus-average score positive.

    Cross-engine discipline: the per-bucket log-ratio is floored ONCE into
    integer micro-units (the udf_model_batch_inference precedent), so the
    per-doc reduction is an exact integer dot product — no float-sum
    ordering hazard ever touches the per-doc aggregation; the only float
    step is 2*B ln() calls on exact integer ratios, identical on both
    engines.

    Scale shape: one partial-agg shuffle of (doc_id, bucket) token counts;
    both distributions re-aggregate FROM that table (tokens are never
    re-read); the lambda table is exactly B=256 rows regardless of corpus
    size, so it broadcasts back onto the doc-bucket stream and the final
    per-doc sum reuses the same shuffle key prefix. At 100 TB this is two
    narrow scans' worth of explode + a single wide exchange — the same
    shape the DSIR paper runs over the Pile with hashed n-grams."""
    docs = load_table(spark, sf_dir, "documents")
    toks = (
        docs.select(
            "doc_id",
            "source",
            F.explode(normalized_words(F.col("text"))).alias("w"),
        )
        .filter(F.col("w") != "")
        .select(
            "doc_id",
            "source",
            md5_bucket(F.col("w"), "dsir:", _DSIR_BUCKETS).alias("bucket"),
        )
    )
    db = toks.groupBy("doc_id", "source", "bucket").agg(
        F.count(F.lit(1)).alias("cnt")
    ).persist()  # three consumers (raw, tgt, the final join) — without
    # this Catalyst pushes the tgt source-filter below the agg and runs
    # the token explode twice (profiled); db rows are (ids, bucket, cnt)
    # — ~256x smaller than the token stream it summarizes
    raw = db.groupBy("bucket").agg(F.sum("cnt").alias("raw_cnt"))
    tgt = (
        db.filter(F.col("source").isin(*DSIR_TARGET_SOURCES))
        .groupBy("bucket")
        .agg(F.sum("cnt").alias("tgt_cnt"))
    )
    tot = raw.agg(F.sum("raw_cnt").alias("raw_tot")).crossJoin(
        tgt.agg(F.coalesce(F.sum("tgt_cnt"), F.lit(0)).alias("tgt_tot"))
    )
    lam = (
        raw.join(tgt, "bucket", "left")
        .na.fill({"tgt_cnt": 0})
        .crossJoin(F.broadcast(tot))
        .select(
            "bucket",
            F.floor(
                F.lit(1000000.0)
                * (
                    F.log(
                        (F.col("tgt_cnt") + F.lit(1)).cast("double")
                        / (F.col("tgt_tot") + F.lit(_DSIR_BUCKETS))
                    )
                    - F.log(
                        (F.col("raw_cnt") + F.lit(1)).cast("double")
                        / (F.col("raw_tot") + F.lit(_DSIR_BUCKETS))
                    )
                )
            )
            .cast("bigint")
            .alias("lam_micro"),
        )
    )
    score = F.sum(F.col("cnt") * F.col("lam_micro"))
    return (
        db.join(F.broadcast(lam), "bucket")
        .groupBy("doc_id", "source")
        .agg(
            F.sum("cnt").cast("bigint").alias("n_toks"),
            score.cast("bigint").alias("score_micro"),
            (score > 0).alias("target_like"),
        )
    )
