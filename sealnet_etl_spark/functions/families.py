"""Scalar function families (SURVEY.md §2.8, FN-1..FN-9).

One registered query per family, exercising every listed function in a
single projection so the oracle hashes them all at once. All functions are
built-in pyspark.sql.functions — JVM-side, whole-stage-codegen'd, never
Python UDFs — so these projections fuse into the scan stage at any scale.

Cross-engine traps handled here (SURVEY.md §5.3):
- DuckDB regexp_replace needs the 'g' flag to match Spark's replace-all.
- Spark dayofweek (1=Sun) vs DuckDB dayofweek (0=Sun): use ISO weekday.
- pmod has no DuckDB twin: ((x % m) + m) % m on the oracle side.
- libm transcendentals (exp/ln/sqrt) can differ in the last ulp: round(6).
- Spark-only hashes (xxhash64, murmur3 hash) are demoed rows-only, not
  graded: no DuckDB equivalent exists (fn_hash_spark_native).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..sources import load_table


@query(
    "fn_string",
    survey_id="FN-1",
    oracle="""
        SELECT p_partkey,
               lower(p_name)                                   AS name_lower,
               upper(p_brand)                                  AS brand_upper,
               length(p_name)                                  AS name_len,
               trim(concat(' ', p_name, ' '))                  AS name_trim,
               ltrim(concat('xx', p_name), 'x')                AS name_ltrim,
               rtrim(concat(p_name, 'yy'), 'y')                AS name_rtrim,
               substring(p_name, 1, 5)                         AS name_sub,
               concat_ws('-', p_brand, p_type)                 AS brand_type,
               string_split(p_name, ' ')[1]                    AS first_word,
               regexp_replace(p_name, 'o', '0', 'g')           AS name_zero,
               lpad(CAST(p_size AS VARCHAR), 3, '0')           AS size_pad,
               strpos(p_name, 'e')                             AS e_pos
        FROM part
    """,
)
def fn_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String family: case/trim/pad/substring/split/regex/search — the
    reference's label-normalization toolkit."""
    part = load_table(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.lower("p_name").alias("name_lower"),
        F.upper("p_brand").alias("brand_upper"),
        F.length("p_name").alias("name_len"),
        F.trim(F.concat(F.lit(" "), F.col("p_name"), F.lit(" "))).alias("name_trim"),
        F.ltrim(F.concat(F.lit("xx"), F.col("p_name")), F.lit("x")).alias("name_ltrim"),
        F.rtrim(F.concat(F.col("p_name"), F.lit("yy")), F.lit("y")).alias("name_rtrim"),
        F.substring("p_name", 1, 5).alias("name_sub"),
        F.concat_ws("-", "p_brand", "p_type").alias("brand_type"),
        F.split("p_name", " ").getItem(0).alias("first_word"),
        F.regexp_replace("p_name", "o", "0").alias("name_zero"),
        F.lpad(F.col("p_size").cast("string"), 3, "0").alias("size_pad"),
        F.instr("p_name", "e").alias("e_pos"),
    )


@query(
    "fn_string_similarity",
    survey_id="FN-2",
    oracle="""
        SELECT c_custkey,
               levenshtein(c_mktsegment, 'BUILDING') AS lev_building,
               levenshtein(c_mktsegment, c_name)     AS lev_name
        FROM customer
    """,
)
def fn_string_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance similarity (the reference's species-typo matching)."""
    customer = load_table(spark, sf_dir, "customer")
    return customer.select(
        "c_custkey",
        F.levenshtein("c_mktsegment", F.lit("BUILDING")).alias("lev_building"),
        F.levenshtein("c_mktsegment", "c_name").alias("lev_name"),
    )


@query(
    "fn_datetime",
    survey_id="FN-3",
    oracle="""
        SELECT o_orderkey,
               year(o_orderdate)                                    AS o_year,
               month(o_orderdate)                                   AS o_month,
               isodow(o_orderdate)                                  AS o_isodow,
               CAST(date_trunc('month', o_orderdate) AS TIMESTAMP)  AS month_start,
               CAST(o_orderdate AS DATE) + 30                       AS plus_30d,
               date_diff('day', CAST(o_orderdate AS DATE), DATE '2000-01-01') AS days_to_y2k,
               CAST(epoch(o_orderdate) AS BIGINT)                   AS epoch_sec,
               last_day(CAST(o_orderdate AS DATE))                  AS month_end,
               make_date(year(o_orderdate), 12, 31)                 AS year_end
        FROM orders
    """,
)
def fn_datetime(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time family (filename-timestamp parsing shape). Session TZ is
    UTC on both engines; ISO weekday avoids the Sun=1 vs Sun=0 mismatch."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        F.year("o_orderdate").alias("o_year"),
        F.month("o_orderdate").alias("o_month"),
        (F.weekday("o_orderdate") + 1).alias("o_isodow"),
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        F.date_add(F.col("o_orderdate").cast("date"), 30).alias("plus_30d"),
        F.datediff(
            F.lit("2000-01-01").cast("date"), F.col("o_orderdate").cast("date")
        ).alias("days_to_y2k"),
        F.unix_timestamp("o_orderdate").alias("epoch_sec"),
        F.last_day("o_orderdate").alias("month_end"),
        F.make_date(F.year("o_orderdate"), F.lit(12), F.lit(31)).alias("year_end"),
    )


@query(
    "fn_math",
    survey_id="FN-4",
    oracle="""
        SELECT s_suppkey,
               abs(s_acctbal)                                        AS bal_abs,
               CAST(ceil(s_acctbal) AS BIGINT)                       AS bal_ceil,
               CAST(floor(s_acctbal) AS BIGINT)                      AS bal_floor,
               CAST(sign(s_acctbal) AS DOUBLE)                       AS bal_sign,
               ROUND(sqrt(abs(s_acctbal)), 6)                        AS bal_sqrt,
               ROUND(exp(s_acctbal / 10000), 6)                      AS bal_exp,
               ROUND(ln(abs(s_acctbal) + 1), 6)                      AS bal_ln,
               ROUND(pow(s_acctbal / 1000, 2), 6)                    AS bal_pow2,
               greatest(s_acctbal, 0.0)                              AS bal_pos,
               least(s_acctbal, 0.0)                                 AS bal_neg,
               ((CAST(floor(s_acctbal) AS BIGINT) % 7) + 7) % 7      AS bal_pmod7
        FROM supplier
    """,
)
def fn_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math family over a column with negative values (s_acctbal), so sign /
    floor-vs-truncation / positive-modulo semantics are actually exercised.

    Dtype parity (CORRECTNESS_r01 hash-fail fix): Spark ``ceil``/``floor``
    return BIGINT and ``signum`` returns DOUBLE, while DuckDB's return DOUBLE
    and INT respectively — the oracle casts its side to Spark's types so the
    driver's dtype-sensitive hash agrees."""
    supplier = load_table(spark, sf_dir, "supplier")
    bal = F.col("s_acctbal")
    return supplier.select(
        "s_suppkey",
        F.abs(bal).alias("bal_abs"),
        F.ceil(bal).alias("bal_ceil"),
        F.floor(bal).alias("bal_floor"),
        F.signum(bal).alias("bal_sign"),
        F.round(F.sqrt(F.abs(bal)), 6).alias("bal_sqrt"),
        F.round(F.exp(bal / 10000), 6).alias("bal_exp"),
        F.round(F.log(F.abs(bal) + 1), 6).alias("bal_ln"),
        F.round(F.pow(bal / 1000, 2), 6).alias("bal_pow2"),
        F.greatest(bal, F.lit(0.0)).alias("bal_pos"),
        F.least(bal, F.lit(0.0)).alias("bal_neg"),
        F.pmod(F.floor(bal).cast("bigint"), F.lit(7)).alias("bal_pmod7"),
    )


@query(
    "fn_conditional",
    survey_id="FN-5",
    oracle="""
        SELECT o_orderkey,
               CASE o_orderstatus WHEN 'O' THEN 'open'
                                  WHEN 'F' THEN 'finished'
                                  ELSE 'other' END                   AS status_label,
               CASE WHEN o_totalprice > 150000 THEN 'big' ELSE 'small' END AS size_label,
               COALESCE(NULLIF(o_orderstatus, 'P'), 'pending-replaced')    AS status_norm,
               CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END AS is_rush
        FROM orders
    """,
)
def fn_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional family: CASE/when, if, nullif/coalesce recoding (the
    reference's quality-flag recoding)."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        F.when(F.col("o_orderstatus") == "O", "open")
        .when(F.col("o_orderstatus") == "F", "finished")
        .otherwise("other")
        .alias("status_label"),
        F.when(F.col("o_totalprice") > 150000, "big")
        .otherwise("small")
        .alias("size_label"),
        F.coalesce(
            F.nullif(F.col("o_orderstatus"), F.lit("P")), F.lit("pending-replaced")
        ).alias("status_norm"),
        F.when(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1)
        .otherwise(0)
        .alias("is_rush"),
    )


#: Serialize a float array to a fixed-point integer CSV. Array-typed output
#: columns crash the driver's canonicalizer ('unhashable numpy.ndarray',
#: CORRECTNESS_r01), so graded queries emit arrays as strings; the integer
#: scaling (exact float→double cast, double multiply, floor) is bit-portable
#: across Spark and DuckDB, unlike engine-specific float-to-string repr.
def _csv_fixed_point(arr):
    return F.concat_ws(
        ",", F.transform(arr, lambda x: F.floor(x.cast("double") * 10000).cast("bigint"))
    )


#: DuckDB side of _csv_fixed_point.
#: COALESCE matches Spark's concat_ws, which returns '' (not NULL) for an
#: empty array — DuckDB's array_to_string returns NULL there.
_DUCK_CSV_FP = (
    "COALESCE(array_to_string(list_transform({0}, "
    "x -> CAST(floor(CAST(x AS DOUBLE) * 10000) AS BIGINT)), ','), '')"
)


@query(
    "fn_array",
    survey_id="FN-6",
    oracle=f"""
        SELECT vec_id,
               len(embedding)                                       AS dim,
               {_DUCK_CSV_FP.format("list_slice(embedding, 1, 4)")} AS head4,
               {_DUCK_CSV_FP.format("list_sort(list_slice(embedding, 1, 4))")}
                                                                    AS head4_sorted,
               ROUND(CAST(embedding[1] AS DOUBLE), 6)               AS first_elem,
               {_DUCK_CSV_FP.format(
                   "list_transform(list_slice(embedding, 1, 4), x -> CAST(x AS DOUBLE) * 2)"
               )}                                                   AS head4_doubled,
               {_DUCK_CSV_FP.format(
                   "list_filter(list_slice(embedding, 1, 8), x -> x > 0)"
               )}                                                   AS head8_pos,
               ROUND(list_aggregate(list_transform(embedding, x -> CAST(x AS DOUBLE)),
                                    'sum'), 4)                      AS vec_sum
        FROM embeddings
    """,
)
def fn_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array family over the embedding column: size/slice/sort/index/
    transform/filter/aggregate — the building blocks of the similarity
    operators (§2.10), all JVM-side higher-order functions. Array results
    are serialized via _csv_fixed_point for driver-canonicalizer parity;
    the higher-order array ops still run on real arrays upstream."""
    embeddings = load_table(spark, sf_dir, "embeddings")
    head4 = F.slice("embedding", 1, 4)
    return embeddings.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        _csv_fixed_point(head4).alias("head4"),
        _csv_fixed_point(F.sort_array(head4)).alias("head4_sorted"),
        F.round(F.col("embedding").getItem(0).cast("double"), 6).alias("first_elem"),
        _csv_fixed_point(
            F.transform(head4, lambda x: x.cast("double") * 2)
        ).alias("head4_doubled"),
        _csv_fixed_point(
            F.filter(F.slice("embedding", 1, 8), lambda x: x > 0)
        ).alias("head8_pos"),
        F.round(
            F.aggregate(
                "embedding", F.lit(0.0), lambda acc, x: acc + x.cast("double")
            ),
            4,
        ).alias("vec_sum"),
    )


@query(
    "fn_map",
    survey_id="FN-7",
    oracle="""
        SELECT l_orderkey, l_linenumber,
               l_quantity          AS qty_val,
               array_to_string(['disc', 'qty'], ',') AS mkeys,
               2                   AS msize
        FROM lineitem
    """,
)
def fn_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map family: create_map / element_at / map_keys / size. The oracle
    states the expected *scalar-ized* results (DuckDB MAP surfaces differ),
    so the hash still verifies every map operation end-to-end."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    m = F.create_map(
        F.lit("qty"), F.col("l_quantity"), F.lit("disc"), F.col("l_discount")
    )
    return lineitem.select(
        "l_orderkey",
        "l_linenumber",
        F.element_at(m, "qty").alias("qty_val"),
        F.concat_ws(",", F.sort_array(F.map_keys(m))).alias("mkeys"),
        F.size(m).alias("msize"),
    )


@query(
    "fn_json",
    survey_id="FN-8",
    oracle="""
        SELECT event_id,
               json_extract_string(props, '$.k')      AS k_str,
               CAST(json_extract(props, '$.k') AS INT) AS k_int,
               CAST(json_extract(props, '$.k') AS INT) + 1 AS k_plus,
               CAST(json_extract(props, '$.missing') AS INT) AS k_missing
        FROM events
    """,
)
def fn_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON family on events.props: path extraction (string + typed) and
    schema-struct decode via from_json (the typed column is the engine's
    canonical JSON-ingest path, SRC-3)."""
    events = load_table(spark, sf_dir, "events")
    parsed = F.from_json("props", "k INT")
    return events.select(
        "event_id",
        F.get_json_object("props", "$.k").alias("k_str"),
        parsed.getField("k").alias("k_int"),
        (parsed.getField("k") + 1).alias("k_plus"),
        F.get_json_object("props", "$.missing").cast("int").alias("k_missing"),
    )


@query(
    "fn_hash_encode",
    survey_id="FN-9",
    oracle="""
        SELECT doc_id,
               md5(text)                      AS text_md5,
               sha256(text)                   AS text_sha256,
               to_base64(encode(lang))        AS lang_b64,
               md5(concat(lang, '|', source)) AS key_md5
        FROM documents
    """,
)
def fn_hash_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash/encode family — the dedup-key toolkit (LLM-1 builds on this).
    md5/sha256/base64 agree across engines; Spark-specific xxhash64 and
    murmur3 live in fn_hash_spark_native (rows-only)."""
    documents = load_table(spark, sf_dir, "documents")
    return documents.select(
        "doc_id",
        F.md5("text").alias("text_md5"),
        F.sha2("text", 256).alias("text_sha256"),
        F.base64(F.col("lang").cast("binary")).alias("lang_b64"),
        F.md5(F.concat_ws("|", "lang", "source")).alias("key_md5"),
    )


@query("fn_hash_spark_native", survey_id="FN-9", oracle=None)
def fn_hash_spark_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark-native hash functions with no DuckDB equivalent: xxhash64 (the
    fast 64-bit partitioning/dedup hash) and murmur3 (`hash`). Rows-only
    check; determinism across runs is asserted in unit tests."""
    documents = load_table(spark, sf_dir, "documents")
    return documents.select(
        "doc_id",
        F.xxhash64("text").alias("text_xxhash64"),
        F.hash("text").alias("text_murmur3"),
        F.crc32(F.col("text").cast("binary")).alias("text_crc32"),
    )


@query(
    "fn_bitwise",
    survey_id="FN-4",
    oracle="""
        SELECT event_id,
               user_id & 255                AS and_mask,
               user_id | 4096               AS or_flag,
               xor(user_id, event_id)       AS xor_mix,
               user_id << 4                 AS shl4,
               user_id >> 2                 AS shr2,
               bit_count(user_id)           AS popcount,
               ~user_id                     AS complement
        FROM events
    """,
)
def fn_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise family — the flag-mask/bit-pack toolkit (SimHash LLM-2 and
    the LSH probe keys build on these): and/or/xor, shifts, popcount,
    complement. All JVM-codegen'd integer ops."""
    events = load_table(spark, sf_dir, "events")
    return events.select(
        "event_id",
        F.col("user_id").bitwiseAND(F.lit(255)).alias("and_mask"),
        F.col("user_id").bitwiseOR(F.lit(4096)).alias("or_flag"),
        F.col("user_id").bitwiseXOR(F.col("event_id")).alias("xor_mix"),
        F.shiftleft("user_id", 4).alias("shl4"),
        F.shiftright("user_id", 2).alias("shr2"),
        F.bit_count("user_id").alias("popcount"),
        F.bitwise_not("user_id").alias("complement"),
    )


@query(
    "fn_struct",
    survey_id="FN-6/FN-7",
    oracle="""
        SELECT o_orderkey,
               {'status': o_orderstatus,
                'price': ROUND(o_totalprice, 2)}.status       AS status_field,
               {'status': o_orderstatus,
                'price': ROUND(o_totalprice, 2)}.price        AS price_field,
               CAST(ROW(o_orderkey, o_custkey) = ROW(o_orderkey, o_custkey)
                    AS INT)                                   AS self_eq
        FROM orders
    """,
)
def fn_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Struct family: build a named struct, project fields back out, and
    compare structs as values (ordered field-wise comparison) — the
    complex-type surface that nested survey records round-trip through.
    Completes FN coverage alongside the array/map/json families."""
    orders = load_table(spark, sf_dir, "orders")
    s = F.named_struct(
        F.lit("status"), F.col("o_orderstatus"),
        F.lit("price"), F.round("o_totalprice", 2),
    )
    pair = F.struct(F.col("o_orderkey"), F.col("o_custkey"))
    return orders.select(
        "o_orderkey",
        s.getField("status").alias("status_field"),
        s.getField("price").alias("price_field"),
        (pair == pair).cast("int").alias("self_eq"),
    )


@query(
    "fn_url",
    survey_id="FN-1/FN-10",
    oracle="""
        WITH urls AS (
            SELECT doc_id,
                   'https://' || source || '.example.com/docs/' || doc_id
                       || '?lang=' || lang AS url
            FROM documents
        )
        SELECT doc_id,
               regexp_extract(url, '^([a-z]+)://', 1)          AS protocol,
               regexp_extract(url, '^[a-z]+://([^/]+)', 1)     AS host,
               regexp_extract(url, '^[a-z]+://[^/]+(/[^?]*)', 1) AS path,
               regexp_extract(url, 'lang=([a-z]+)', 1)         AS lang_param
        FROM urls
    """,
)
def fn_url(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL function family: protocol/host/path/named-query-param
    extraction with Spark's native ``parse_url`` over deterministic
    synthesized URLs (the crawl-metadata shape every web-corpus pipeline
    parses for domain-level filtering and dedup keys). The oracle
    re-derives each component with regexes — two independent parsers
    agreeing. ``parse_url`` is JVM codegen, so at 100 TB the extraction
    runs at scan speed like every other FN family."""
    docs = load_table(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://"),
        F.col("source"),
        F.lit(".example.com/docs/"),
        F.col("doc_id").cast("string"),
        F.lit("?lang="),
        F.col("lang"),
    )
    return docs.select(
        "doc_id",
        F.parse_url(url, F.lit("PROTOCOL")).alias("protocol"),
        F.parse_url(url, F.lit("HOST")).alias("host"),
        F.parse_url(url, F.lit("PATH")).alias("path"),
        F.parse_url(url, F.lit("QUERY"), F.lit("lang")).alias("lang_param"),
    )


@query(
    "fn_variant_extract",
    survey_id="FN-8",
    oracle="""
        SELECT o_orderkey,
               o_orderpriority       AS pri,
               o_totalprice          AS total,
               CAST(NULL AS DOUBLE)  AS missing
        FROM orders
    """,
)
def fn_variant_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 VARIANT semi-structured round trip: serialize typed columns
    to JSON, parse_json into an open VARIANT value, then pull typed fields
    back out with variant_get (string leaf, double leaf, and a missing
    path that must surface as NULL, not an error). VARIANT is the
    engine's answer to schemaless ingest — the binary encoding keeps
    shredded access O(field) instead of re-parsing text per access.

    The oracle states the LOSSLESSNESS claim directly: extracting
    '$.meta.p' / '$.meta.t' from the variant must reproduce the original
    columns exactly (doubles survive because to_json emits
    shortest-round-trip representations and variant_get parses them back
    to the identical bits). Scale: parse + extract are per-row JVM
    expressions inside whole-stage codegen — no shuffle, no Python."""
    orders = load_table(spark, sf_dir, "orders")
    v = F.expr(
        "parse_json(to_json(struct(o_orderkey AS k, "
        "struct(o_orderpriority AS p, o_totalprice AS t) AS meta)))"
    )
    return orders.withColumn("__v", v).select(
        "o_orderkey",
        F.expr("variant_get(__v, '$.meta.p', 'string')").alias("pri"),
        F.expr("variant_get(__v, '$.meta.t', 'double')").alias("total"),
        F.expr("variant_get(__v, '$.meta.absent', 'double')").alias("missing"),
    )
