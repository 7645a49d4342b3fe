"""Semantic/property tests for the round-11 work — Unicode-whitespace
parity of the Arrow shingle kernel (ADVICE r10) plus invariants for the
round-11 IVF additions; streaming IVF index-append idempotency lives in
tests/test_streaming_restart.py."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from sealnet_etl_spark.registry import all_queries

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def queries():
    return all_queries()


def test_shingle_kernel_unicode_whitespace_parity(spark):
    """ADVICE r10 (medium): the kernel's tokenizer must use re.ASCII so
    Python's \\s matches Java's default \\s EXACTLY ([ \\t\\n\\x0B\\f\\r]).
    This fixture contains the divergence triggers — U+00A0 NBSP, U+2028
    LINE SEP, U+2029 PARA SEP, U+3000 ideographic space — which Unicode
    \\s would treat as separators but the Catalyst form (Java \\s) keeps
    inside tokens, plus Latin-1 case-mapping chars to exercise the
    lower() path. Kernel posting set must equal the Catalyst
    explode(word_shingles(normalized_words(...))) set bit-for-bit."""
    from sealnet_etl_spark.operators.dedup import (
        normalized_words,
        shingle_postings,
        word_shingles,
    )

    k = 3
    nbsp, lsep, psep, ideo = " ", " ", " ", "　"
    texts = [
        # NBSP-joined pair: ONE token under Java \s, two under Unicode \s
        (1, f"alpha{nbsp}beta gamma delta epsilon zeta"),
        # line/para separators mid-word: tokens under Unicode \s only
        (2, f"one{lsep}two three{psep}four five six seven"),
        # ideographic space (non-separator both sides) + tab/CR/LF
        # (real separators both sides)
        (3, f"a{ideo}b c\td\re\nf g h"),
        # vertical tab IS a separator in both (Java \x0B == Python \v)
        (4, "p\x0bq r s t u"),
        # Latin-1 case chars where Python/JVM lowercase agree
        (5, "ÄPFEL Über STRASSE Naïve ÉCOLE seven"),
        (6, None),  # NULL text: dropped by both forms
        (7, "too short"),  # < k words after split: dropped by both
    ]
    docs = spark.createDataFrame(texts, "doc_id long, text string")
    kernel = set(
        map(tuple, shingle_postings(spark, docs, k, fan_out=False).collect())
    )
    catalyst = set(
        map(
            tuple,
            docs.withColumn("__w", normalized_words(F.col("text")))
            .filter(F.size("__w") >= k)
            .select(
                "doc_id",
                F.explode(word_shingles(F.col("__w"), k)).alias("sh"),
            )
            .collect(),
        )
    )
    assert kernel == catalyst and kernel
    # the load-bearing bits: exotic whitespace stayed INSIDE tokens
    assert any(nbsp in sh for (_, sh) in kernel)
    assert any(lsep in sh for (_, sh) in kernel)
    assert any(ideo in sh for (_, sh) in kernel)
