"""Scalar function families — string, date/time, math, array, map, JSON.

Everything here is built-in ``pyspark.sql.functions``: JVM-evaluated,
inside whole-stage codegen, vectorized over the parquet reader's
columnar batches. No Python on the hot path.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from target_s3_parquet_spark.operators._util import t
from target_s3_parquet_spark.registry import query


@query(
    "scalar_string",
    """
    SELECT p_partkey,
           UPPER(p_name) AS name_upper,
           LOWER(p_brand) AS brand_lower,
           SUBSTRING(p_type, 1, 5) AS type_prefix,
           CONCAT(p_brand, ':', p_type) AS brand_type,
           TRIM(p_name) AS name_trim,
           LENGTH(p_name) AS name_len,
           REPLACE(p_type, ' ', '_') AS type_snake,
           regexp_extract(p_name, '([a-z]+)', 1) AS first_word,
           CONTAINS(p_type, 'BRASS') AS is_brass,
           LPAD(CAST(p_size AS VARCHAR), 4, '0') AS size_padded
    FROM part
    """,
)
def scalar_string(spark, sf_dir):
    p = t(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.lower("p_brand").alias("brand_lower"),
        F.substring("p_type", 1, 5).alias("type_prefix"),
        F.concat(F.col("p_brand"), F.lit(":"), F.col("p_type")).alias("brand_type"),
        F.trim("p_name").alias("name_trim"),
        F.length("p_name").cast("long").alias("name_len"),
        F.replace(F.col("p_type"), F.lit(" "), F.lit("_")).alias("type_snake"),
        F.regexp_extract("p_name", "([a-z]+)", 1).alias("first_word"),
        F.contains(F.col("p_type"), F.lit("BRASS")).alias("is_brass"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_padded"),
    )


@query(
    "scalar_string_split",
    """
    SELECT p_partkey,
           array_to_string(string_split(p_name, ' '), '|') AS name_tokens,
           len(string_split(p_name, ' ')) AS n_tokens
    FROM part
    """,
)
def scalar_string_split(spark, sf_dir):
    # tokens serialized for output: the driver comparator can't hash
    # list cells (see tools/check_correctness.py docstring)
    p = t(spark, sf_dir, "part")
    toks = F.split(F.col("p_name"), " ")
    return p.select(
        "p_partkey",
        F.array_join(toks, "|").alias("name_tokens"),
        F.size(toks).cast("long").alias("n_tokens"),
    )


@query(
    "scalar_date",
    """
    SELECT o_orderkey,
           CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS order_month,
           CAST(year(o_orderdate) AS BIGINT) AS order_year,
           CAST(month(o_orderdate) AS BIGINT) AS order_mm,
           CAST(day(o_orderdate) AS BIGINT) AS order_dd,
           CAST(dayofweek(o_orderdate) AS BIGINT) AS order_dow,
           o_orderdate + INTERVAL 30 DAY AS due_date,
           CAST(date_diff('day', o_orderdate, TIMESTAMP '1998-12-31 00:00:00') AS BIGINT)
             AS days_to_eoy,
           CAST(quarter(o_orderdate) AS BIGINT) AS order_q
    FROM orders
    """,
)
def scalar_date(spark, sf_dir):
    """date_trunc/extract/add/diff. DuckDB's dayofweek is 0=Sunday,
    Spark's is 1=Sunday — the Spark side subtracts 1 to align."""
    o = t(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.date_trunc("month", "o_orderdate").alias("order_month"),
        F.year("o_orderdate").cast("long").alias("order_year"),
        F.month("o_orderdate").cast("long").alias("order_mm"),
        F.dayofmonth("o_orderdate").cast("long").alias("order_dd"),
        (F.dayofweek("o_orderdate") - 1).cast("long").alias("order_dow"),
        (F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")).alias("due_date"),
        F.datediff(
            F.lit("1998-12-31").cast("timestamp"), F.col("o_orderdate")
        ).cast("long").alias("days_to_eoy"),
        F.quarter("o_orderdate").cast("long").alias("order_q"),
    )


@query(
    "scalar_math",
    """
    SELECT l_orderkey, l_linenumber,
           ROUND(l_extendedprice, 1) AS price_r1,
           ABS(l_discount - 0.05) AS disc_dev,
           CAST(CEIL(l_quantity) AS BIGINT) AS qty_ceil,
           CAST(FLOOR(l_quantity) AS BIGINT) AS qty_floor,
           POW(l_discount, 2) AS disc_sq,
           SQRT(l_quantity) AS qty_sqrt,
           MOD(l_orderkey, 7) AS key_mod7,
           CAST(SIGN(l_discount - 0.05) AS DOUBLE) AS disc_sign
    FROM lineitem
    """,
)
def scalar_math(spark, sf_dir):
    l = t(spark, sf_dir, "lineitem")
    return l.select(
        "l_orderkey",
        "l_linenumber",
        F.round("l_extendedprice", 1).alias("price_r1"),
        F.abs(F.col("l_discount") - 0.05).alias("disc_dev"),
        F.ceil("l_quantity").alias("qty_ceil"),
        F.floor("l_quantity").alias("qty_floor"),
        F.pow("l_discount", F.lit(2)).alias("disc_sq"),
        # ln/log10 are deliberately absent: glibc (Spark/JVM) and DuckDB
        # libm disagree in the final ulp, so they can't be hash-compared
        # cross-engine. sqrt/pow(x,2) are IEEE-exact.
        F.sqrt("l_quantity").alias("qty_sqrt"),
        (F.col("l_orderkey") % 7).alias("key_mod7"),
        F.signum(F.col("l_discount") - 0.05).alias("disc_sign"),
    )


@query(
    "scalar_conditional",
    """
    SELECT o_orderkey,
           CASE WHEN o_totalprice > 300000.0 THEN 'high'
                WHEN o_totalprice > 100000.0 THEN 'mid'
                ELSE 'low' END AS price_band,
           COALESCE(NULLIF(o_orderstatus, 'O'), 'open') AS status_or_open,
           IF(o_orderpriority LIKE '1-%', 1, 0) AS is_urgent,
           GREATEST(o_totalprice, 50000.0) AS floor_50k,
           LEAST(o_totalprice, 500000.0) AS cap_500k
    FROM orders
    """,
)
def scalar_conditional(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") > 300000.0, "high")
        .when(F.col("o_totalprice") > 100000.0, "mid")
        .otherwise("low")
        .alias("price_band"),
        F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("O")), F.lit("open")).alias(
            "status_or_open"
        ),
        F.when(F.col("o_orderpriority").like("1-%"), 1)
        .otherwise(0)
        .cast("int")
        .alias("is_urgent"),
        F.greatest(F.col("o_totalprice"), F.lit(50000.0)).alias("floor_50k"),
        F.least(F.col("o_totalprice"), F.lit(500000.0)).alias("cap_500k"),
    )


@query(
    "scalar_array",
    """
    WITH toks AS (
      SELECT p_partkey, string_split(p_name, ' ') AS words FROM part
    )
    SELECT p_partkey,
           len(words) AS n_words,
           array_contains(words, 'green') AS has_green,
           array_to_string(list_sort(words), '|') AS words_sorted,
           array_to_string(list_transform(words, w -> UPPER(w)), '|')
             AS words_upper,
           COALESCE(array_to_string(list_filter(words, w -> LENGTH(w) > 4),
                                    '|'), '') AS long_words,
           array_to_string(words, '-') AS joined
    FROM toks
    """,
)
def scalar_array(spark, sf_dir):
    """Array ops incl. higher-order lambdas (transform/filter run inside
    codegen — no UDF). Array-valued intermediates are serialized with
    array_join for output: the driver comparator hashes through pandas,
    which cannot hash list cells (same constraint as agg_collect_list)."""
    p = t(spark, sf_dir, "part")
    words = F.split(F.col("p_name"), " ")
    return p.select(
        "p_partkey",
        F.size(words).cast("long").alias("n_words"),
        F.array_contains(words, "green").alias("has_green"),
        F.array_join(F.sort_array(words), "|").alias("words_sorted"),
        F.array_join(F.transform(words, lambda w: F.upper(w)), "|").alias(
            "words_upper"
        ),
        F.array_join(F.filter(words, lambda w: F.length(w) > 4), "|").alias(
            "long_words"
        ),
        F.array_join(words, "-").alias("joined"),
    )


@query(
    "scalar_array_explode",
    """
    WITH toks AS (
      SELECT p_partkey, UNNEST(string_split(p_name, ' ')) AS word FROM part
    )
    SELECT word, COUNT(*) AS n FROM toks GROUP BY word
    """,
)
def scalar_array_explode(spark, sf_dir):
    """explode → word frequency (the flatten side of array handling)."""
    p = t(spark, sf_dir, "part")
    return (
        p.select(F.explode(F.split(F.col("p_name"), " ")).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@query(
    "scalar_map",
    """
    WITH m AS (
      SELECT p_partkey,
             MAP {'brand': p_brand, 'type': p_type} AS attrs
      FROM part
    )
    SELECT p_partkey,
           array_to_string(map_keys(attrs), ',') AS ks,
           map_extract(attrs, 'brand')[1] AS brand,
           cardinality(attrs) AS n_entries
    FROM m
    """,
)
def scalar_map(spark, sf_dir):
    """MapType construction + access. (Reference has no map support at
    all — SURVEY §1.3 'map: not supported anywhere'; extension.)
    map_keys output is serialized to a string for the pandas-based
    comparator; construction order is the literal order in both
    engines, so no sort is needed."""
    p = t(spark, sf_dir, "part")
    attrs = F.create_map(
        F.lit("brand"), F.col("p_brand"), F.lit("type"), F.col("p_type")
    )
    return p.select(
        "p_partkey",
        F.array_join(F.map_keys(attrs), ",").alias("ks"),
        attrs.getItem("brand").alias("brand"),
        F.size(attrs).cast("long").alias("n_entries"),
    )


@query(
    "scalar_json",
    """
    SELECT event_id,
           CAST(json_extract(props, '$.k') AS BIGINT) AS k,
           json_extract_string(props, '$.missing') AS missing_field
    FROM events
    """,
)
def scalar_json(spark, sf_dir):
    """JSON extraction from the events.props string column (missing paths
    yield NULL in both engines)."""
    e = t(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("long").alias("k"),
        F.get_json_object("props", "$.missing").alias("missing_field"),
    )


@query(
    "scalar_json_struct",
    """
    SELECT event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(CAST(json_extract(props, '$.k') AS BIGINT) AS DECIMAL(38,6))) AS DOUBLE)
             AS sum_k
    FROM events
    GROUP BY event_type
    """,
)
def scalar_json_struct(spark, sf_dir):
    """from_json into a typed struct, then aggregate over the parsed
    field — schema-on-read for semi-structured columns."""
    e = t(spark, sf_dir, "events")
    schema = T.StructType([T.StructField("k", T.LongType())])
    parsed = e.withColumn("p", F.from_json("props", schema))
    return parsed.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("p.k").cast("decimal(38,6)")).cast("double").alias("sum_k"),
    )


@query(
    "scalar_cast_formats",
    """
    SELECT o_orderkey,
           CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR) AS price_dec,
           CAST(o_orderkey AS VARCHAR) AS key_str,
           CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS date_str,
           strftime(o_orderdate, '%Y-%m') AS ym
    FROM orders
    """,
)
def scalar_cast_formats(spark, sf_dir):
    # price_dec lands as a 2-dp STRING: a DECIMAL output column would
    # materialize as Decimal('149041.30') in Spark's pandas but float64
    # 149041.3 in DuckDB's — stringifying in-engine keeps the fixed
    # scale on both sides (and is itself a cast-format case)
    o = t(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.col("o_totalprice").cast("decimal(18,2)").cast("string").alias("price_dec"),
        F.col("o_orderkey").cast("string").alias("key_str"),
        F.col("o_orderdate").cast("date").cast("string").alias("date_str"),
        F.date_format("o_orderdate", "yyyy-MM").alias("ym"),
    )


@query(
    "scalar_posexplode",
    """
    SELECT doc_id, i - 1 AS pos, words[i] AS word
    FROM (SELECT doc_id,
                 string_split(lower(text), ' ') AS words
          FROM documents WHERE doc_id < 16),
         LATERAL (SELECT UNNEST(range(1, len(words) + 1)) AS i) t
    """,
)
def scalar_posexplode(spark, sf_dir):
    """Positional explode (LATERAL VIEW posexplode): token with its
    0-based offset — the tokenizer-output shape. A generator
    projection: rows stream out of the scan, no shuffle."""
    d = t(spark, sf_dir, "documents").filter(F.col("doc_id") < 16)
    return d.select(
        "doc_id",
        F.posexplode(F.split(F.lower(F.col("text")), " ")).alias("pos", "word"),
    ).select("doc_id", F.col("pos").cast("long"), "word")


@query(
    "scalar_bitwise",
    """
    SELECT event_id,
           event_id & 255 AS low_byte,
           event_id | 4096 AS with_flag,
           xor(event_id, user_id) AS xored,
           event_id << 2 AS shifted_l,
           event_id >> 3 AS shifted_r
    FROM events WHERE event_id < 512
    """,
)
def scalar_bitwise(spark, sf_dir):
    """Bitwise family (AND/OR/XOR/shifts) — exact integer ops, the
    building blocks of the Z-order and banding keys elsewhere."""
    e = t(spark, sf_dir, "events").filter(F.col("event_id") < 512)
    return e.select(
        "event_id",
        F.col("event_id").bitwiseAND(F.lit(255)).alias("low_byte"),
        F.col("event_id").bitwiseOR(F.lit(4096)).alias("with_flag"),
        F.col("event_id").bitwiseXOR(F.col("user_id")).alias("xored"),
        F.shiftleft("event_id", 2).alias("shifted_l"),
        F.shiftright("event_id", 3).alias("shifted_r"),
    )


@query(
    "limit_offset_pagination",
    """
    SELECT o_orderkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 25 OFFSET 50
    """,
)
def limit_offset_pagination(spark, sf_dir):
    """Keyless pagination (ORDER BY + LIMIT/OFFSET). Works, but OFFSET
    still sorts-and-skips the whole prefix — deep pagination at scale
    should be keyset-based instead (WHERE (price, key) < last_seen
    ORDER BY ... LIMIT n), which prunes rather than skips."""
    o = t(spark, sf_dir, "orders")
    return (
        o.orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .offset(50)
        .limit(25)
        .select("o_orderkey", "o_totalprice")
    )


@query(
    "scalar_regexp",
    """
    SELECT doc_id,
           len(regexp_extract_all(text, '[A-Za-z]+')) AS n_words,
           regexp_extract(text, '[0-9]+') AS first_num,
           substring(regexp_replace(text, '[0-9]+', '#', 'g'), 1, 40)
             AS masked_prefix,
           regexp_matches(text, 'data') AS mentions_data
    FROM documents
    """,
)
def scalar_regexp(spark, sf_dir):
    """Regexp scalar family: extract-all (+ count), first-match
    extract, global replace, and boolean match. Patterns stay in the
    RE2-compatible common subset (character classes, no backrefs or
    lookaround) so Java regex (Spark) and RE2 (DuckDB/many engines)
    agree; Spark's regexp_replace is global by default where DuckDB
    needs the 'g' flag. All JVM-side codegen — a regex over 100 TB of
    text is scan-bound, not Python-bound."""
    d = t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.size(F.regexp_extract_all("text", F.lit("[A-Za-z]+"), 0))
        .cast("long")
        .alias("n_words"),
        F.regexp_extract("text", "[0-9]+", 0).alias("first_num"),
        F.substring(
            F.regexp_replace("text", "[0-9]+", "#"), 1, 40
        ).alias("masked_prefix"),
        F.col("text").rlike("data").alias("mentions_data"),
    )


@query(
    "scalar_url_parse",
    """
    WITH u AS (
      SELECT doc_id,
             'https://' || source || '.example.com/docs/' || doc_id
               || '?lang=' || lang || '&v=2' AS url
      FROM documents
    )
    SELECT doc_id,
           regexp_extract(url, '^[a-z]+://([^/]+)', 1) AS host,
           regexp_extract(url, '^[a-z]+://[^/]+(/[^?#]*)', 1) AS path,
           regexp_extract(url, '\\?([^#]*)', 1) AS query,
           regexp_extract(url, '[?&]lang=([^&#]*)', 1) AS lang_param,
           regexp_extract(url, '^([a-z]+)://', 1) AS protocol
    FROM u
    """,
)
def scalar_url_parse(spark, sf_dir):
    """URL decomposition with the built-in `parse_url` — host, path,
    query, a single query parameter, protocol — over URLs synthesized
    from document metadata (the log-parsing staple: clickstreams,
    referrer analysis, CDN logs). JVM-side and codegen'd; the DuckDB
    oracle restates each component as an anchored regexp, pinning the
    exact semantics (no decoding, query excludes '?', path starts at
    first '/')."""
    d = t(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://"), F.col("source"), F.lit(".example.com/docs/"),
        F.col("doc_id"), F.lit("?lang="), F.col("lang"), F.lit("&v=2"),
    )
    u = d.select("doc_id", url.alias("url"))
    return u.select(
        "doc_id",
        F.parse_url("url", F.lit("HOST")).alias("host"),
        F.parse_url("url", F.lit("PATH")).alias("path"),
        F.parse_url("url", F.lit("QUERY")).alias("query"),
        F.parse_url("url", F.lit("QUERY"), F.lit("lang")).alias("lang_param"),
        F.parse_url("url", F.lit("PROTOCOL")).alias("protocol"),
    )


@query(
    "search_multi_term_rank",
    """
    WITH scored AS (
      SELECT p_partkey, p_name,
             (CASE WHEN p_name LIKE '%small%' THEN 1 ELSE 0 END
              + CASE WHEN p_name LIKE '%gear%' THEN 1 ELSE 0 END
              + CASE WHEN p_name LIKE '%red%' THEN 1 ELSE 0 END)
               AS n_terms
      FROM part
    )
    SELECT p_partkey, p_name, n_terms FROM scored WHERE n_terms >= 2
    """,
)
def search_multi_term_rank(spark, sf_dir):
    """Multi-term keyword search with match-count ranking — the
    LIKE-based retrieval baseline (each term is a pushdown-friendly
    contains; the score is how many matched, filtered to ≥2). The scan
    evaluates all terms in one codegen'd pass with no shuffle; at
    100 TB this shape is what a search over a token-inverted index
    must beat, and the engine-side fallback when no index exists.
    Scoring by term count (not position) keeps it exactly restatable;
    the TF-IDF key covers weighted relevance."""
    p = t(spark, sf_dir, "part")
    score = sum(
        F.col("p_name").contains(term).cast("int")
        for term in ("small", "gear", "red")
    )
    return (
        p.select("p_partkey", "p_name", score.alias("n_terms"))
        .filter(F.col("n_terms") >= 2)
    )


@query(
    "scalar_csv_parse",
    """
    SELECT o_orderkey,
           o_orderkey AS parsed_key,
           o_orderstatus AS parsed_status,
           o_totalprice AS parsed_price
    FROM orders
    """,
)
def scalar_csv_parse(spark, sf_dir):
    """Embedded-CSV parsing (`to_csv`/`from_csv` as SCALAR functions,
    not file I/O): each row is serialized to a CSV line and parsed
    back under an explicit schema inside one projection — the shape
    for CSV-in-a-column payloads (message queues and log envelopes
    love them). Round-trip identity is the oracle: parsing recovers
    exactly the source columns, proving the codec pair is lossless
    for these types (doubles survive via shortest-repr, same contract
    as the file-level `scan_csv_roundtrip`). Pure codegen, no
    shuffle, no Python."""
    o = t(spark, sf_dir, "orders")
    line = F.to_csv(
        F.struct("o_orderkey", "o_orderstatus", "o_totalprice")
    )
    parsed = F.from_csv(
        line, "k LONG, s STRING, p DOUBLE"
    )
    return o.select(
        "o_orderkey",
        parsed.getField("k").alias("parsed_key"),
        parsed.getField("s").alias("parsed_status"),
        parsed.getField("p").alias("parsed_price"),
    )


@query(
    "search_inverted_index_build",
    """
    WITH toks AS (
      SELECT DISTINCT doc_id, tok
      FROM (SELECT doc_id,
                   UNNEST(string_split_regex(lower(text), '[^a-z]+')) AS tok
            FROM documents)
      WHERE tok <> ''
    )
    SELECT tok AS token,
           COUNT(*) AS doc_freq,
           array_to_string(list_sort(list(doc_id))[1:20], ',')
             AS posting_head
    FROM toks
    GROUP BY tok
    """,
)
def search_inverted_index_build(spark, sf_dir):
    """Inverted-index CONSTRUCTION — the build side of the retrieval
    story whose query side is `search_multi_term_rank`/TF-IDF: one
    (token, doc_id) posting per distinct term occurrence, rolled up to
    per-token document frequency plus the first 20 postings (sorted,
    serialized — the comparator hashes strings, and a real index stores
    heads inline with long tails spilled to posting shards anyway).

    Distributed shape: tokenize map-side, ONE shuffle of (token,
    doc_id) pairs into a combinable distinct+groupBy; document bodies
    never move. Stop-word tokens are the classic hot keys — the cap on
    the serialized head bounds the OUTPUT, and at 100 TB the posting
    list itself shards as (token, bucket) exactly like the salted-join
    pattern (`join_skew_salted`), keeping every task's postings
    bounded. This build is the batch bootstrap; incremental appends
    merge new postings with `dedup_incremental_registry`'s shape.

    Reference scope check: codeG12/target-s3-parquet has no query
    surface (605-LoC Singer->Parquet sink); this key belongs to the
    LLM-data-pipeline extension surface (SURVEY.md §2C)."""
    d = t(spark, sf_dir, "documents")
    toks = (
        d.select(
            "doc_id",
            F.explode(
                F.split(F.lower(F.col("text")), "[^a-z]+")
            ).alias("token"),
        )
        .filter(F.col("token") != "")
        .distinct()
    )
    return toks.groupBy("token").agg(
        F.count(F.lit(1)).alias("doc_freq"),
        F.array_join(
            F.slice(F.sort_array(F.collect_list("doc_id")), 1, 20), ","
        ).alias("posting_head"),
    )


# ---------------------------------------------------------------------------
# Shared BM25 scoring (rational-odds form) for the fixed 3-term query
# {merge, vector, scan} — used verbatim by `search_bm25_topk` here and
# by `search_rrf_fusion`'s lexical arm (operators/similarity.py), so
# the scoring can never silently diverge between the standalone
# ranking and the fused one.
# ---------------------------------------------------------------------------
_BM25_TERMS = ("merge", "vector", "scan")

# toks -> per_doc -> corpus CTE prefix shared by both oracles.
BM25_CORE_SQL = """
    WITH toks AS (
      SELECT doc_id, tok
      FROM (SELECT doc_id,
                   UNNEST(string_split_regex(lower(text), '[^a-z]+')) AS tok
            FROM documents)
      WHERE tok <> ''
    ),
    per_doc AS MATERIALIZED (
      SELECT doc_id, count(*) AS dl,
             count(*) FILTER (WHERE tok = 'merge')  AS tf1,
             count(*) FILTER (WHERE tok = 'vector') AS tf2,
             count(*) FILTER (WHERE tok = 'scan')   AS tf3
      FROM toks GROUP BY doc_id
    ),
    corpus AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(SUM(dl) AS BIGINT) AS tt,
             CAST(count(*) FILTER (WHERE tf1 > 0) AS BIGINT) AS df1,
             CAST(count(*) FILTER (WHERE tf2 > 0) AS BIGINT) AS df2,
             CAST(count(*) FILTER (WHERE tf3 > 0) AS BIGINT) AS df3
      FROM per_doc
    )"""

# the fixed left-to-right 3-term score chain (rational odds, k1=6/5,
# b=3/4 cleared to BIGINT rationals — see search_bm25_topk docstring).
BM25_SCORE_SQL = """CAST(2*n - 2*df1 + 1 AS DOUBLE) / CAST(2*df1 + 1 AS DOUBLE)
             * (CAST(22*tf1*tt AS DOUBLE)
                / CAST(10*tf1*tt + 3*tt + 9*n*dl AS DOUBLE))
           + CAST(2*n - 2*df2 + 1 AS DOUBLE) / CAST(2*df2 + 1 AS DOUBLE)
             * (CAST(22*tf2*tt AS DOUBLE)
                / CAST(10*tf2*tt + 3*tt + 9*n*dl AS DOUBLE))
           + CAST(2*n - 2*df3 + 1 AS DOUBLE) / CAST(2*df3 + 1 AS DOUBLE)
             * (CAST(22*tf3*tt AS DOUBLE)
                / CAST(10*tf3*tt + 3*tt + 9*n*dl AS DOUBLE))"""


def bm25_scored(spark, sf_dir):
    """Per-doc BM25-scored frame (doc_id, dl, tf1..tf3, score) for the
    fixed 3-term query — the Spark twin of BM25_CORE_SQL +
    BM25_SCORE_SQL. One combinable groupBy, a 1-row corpus broadcast,
    map-side scoring."""
    d = t(spark, sf_dir, "documents")
    toks = (
        d.select(
            "doc_id",
            F.explode(F.split(F.lower(F.col("text")), "[^a-z]+")).alias(
                "tok"
            ),
        )
        .filter(F.col("tok") != "")
    )
    per_doc = toks.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("dl"),
        *[
            F.sum(F.when(F.col("tok") == term, 1).otherwise(0))
            .cast("long")
            .alias(f"tf{i}")
            for i, term in enumerate(_BM25_TERMS, 1)
        ],
    )
    corpus = per_doc.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("dl").cast("long").alias("tt"),
        *[
            F.sum(F.when(F.col(f"tf{i}") > 0, 1).otherwise(0))
            .cast("long")
            .alias(f"df{i}")
            for i in range(1, 4)
        ],
    )

    def term_score(i: int):
        tf, df = F.col(f"tf{i}"), F.col(f"df{i}")
        n, tt, dl = F.col("n"), F.col("tt"), F.col("dl")
        idf = (2 * n - 2 * df + 1).cast("double") / (2 * df + 1).cast(
            "double"
        )
        w = (22 * tf * tt).cast("double") / (
            10 * tf * tt + 3 * tt + 9 * n * dl
        ).cast("double")
        return idf * w

    return per_doc.crossJoin(F.broadcast(corpus)).select(
        "doc_id",
        "dl",
        "tf1",
        "tf2",
        "tf3",
        (term_score(1) + term_score(2) + term_score(3)).alias("score"),
    )


@query(
    "search_bm25_topk",
    BM25_CORE_SQL
    + """
    SELECT doc_id, dl, tf1, tf2, tf3,
           """
    + BM25_SCORE_SQL
    + """
             AS score
    FROM per_doc CROSS JOIN corpus
    ORDER BY score DESC, doc_id LIMIT 10
    """,
)
def search_bm25_topk(spark, sf_dir):
    """BM25-ranked retrieval (Robertson-Sparck Jones; k1=1.2, b=0.75)
    over the 3-term query {merge, vector, scan} — the ranking tier the
    retrieval family builds to (`search_multi_term_rank` is the LIKE
    baseline, `search_inverted_index_build` the index,
    `text_tokenize_tfidf` the linear-weight scorer).

    Cross-engine exactness without libm: the log-idf is replaced by
    the raw Robertson odds (2N-2df+1)/(2df+1) — same document
    ordering for a fixed query term, no ln() — and with k1=6/5,
    b=3/4, avgdl=TT/N the tf normalization clears to the BIGINT
    rational 22*tf*TT / (10*tf*TT + 3*TT + 9*N*dl). Each term's score
    is two correctly-rounded float divisions and one multiply on
    identical operands in both engines; the 3-term sum is a FIXED
    left-to-right chain (never a float SUM aggregate), so every score
    is bit-identical and the (score DESC, doc_id) top-10 is
    deterministic. tf=0 collapses the term to exactly 0.0.

    Distributed shape: tokenize map-side, ONE combinable groupBy to
    (doc, dl, per-term tf), a 1-row corpus-stats broadcast, map-side
    scoring, and orderBy+limit = TakeOrderedAndProject (per-partition
    top-K + driver merge of K*parts rows) — no global sort, no second
    shuffle. At 100 TB the per-doc aggregate is the posting scan of
    the 3 query terms against the inverted index; the plan here is
    its full-scan restatement with identical scoring."""
    return (
        bm25_scored(spark, sf_dir)
        .orderBy(F.col("score").desc(), "doc_id")
        .limit(10)
    )


@query(
    "search_phrase_proximity",
    """
    WITH toks AS (
      SELECT doc_id,
             UNNEST(toks) AS tok,
             UNNEST(range(1, len(toks) + 1)) AS pos
      FROM (SELECT doc_id, string_split(lower(text), ' ') AS toks
            FROM documents)
    ),
    pa AS (SELECT doc_id, pos FROM toks WHERE tok = 'data'),
    pb AS (SELECT doc_id, pos FROM toks WHERE tok = 'table'),
    prox AS (
      SELECT pa.doc_id,
             CAST(MIN(ABS(pa.pos - pb.pos)) AS BIGINT) AS min_dist,
             CAST(COUNT(DISTINCT pa.pos) AS BIGINT) AS n_a,
             CAST(COUNT(DISTINCT pb.pos) AS BIGINT) AS n_b
      FROM pa JOIN pb ON pb.doc_id = pa.doc_id
      GROUP BY pa.doc_id
    )
    SELECT doc_id, min_dist, n_a, n_b,
           1000000 // (1 + min_dist) AS proximity_score
    FROM prox
    ORDER BY proximity_score DESC, doc_id LIMIT 20
    """,
)
def search_phrase_proximity(spark, sf_dir):
    """PHRASE-PROXIMITY search scoring: for the two-term query
    ('data', 'table'), rank documents containing BOTH terms by the
    minimum token distance between any occurrence pair —
    score = 1e6 // (1 + min_dist) — the positional-index ranking
    signal BM25 cannot express (bag-of-words scores \"data ... table\"
    pages the same whether the words are adjacent or paragraphs
    apart); completes the search family next to
    `search_inverted_index_build` / `search_bm25_topk` /
    `search_multi_term_rank`.

    Exactness: token positions are exact integers from the
    deterministic whitespace tokenization; the min-distance and the
    floor-rational score are pure integer arithmetic; top-20 breaks
    ties on doc_id.

    Distributed shape: ONE posexplode pass builds the positional
    postings; the per-document occurrence join is co-partitioned on
    doc_id (per-doc occurrence lists are bounded by document length);
    top-20 is TakeOrderedAndProject. At 100 TB this is exactly a
    positional inverted index probe: postings shuffle on (term ->
    doc), never documents.

    Reference scope check: codeG12/target-s3-parquet has no query
    surface (605-LoC Singer->Parquet sink); this key belongs to the
    LLM-data-pipeline extension surface (SURVEY.md §2C)."""
    d = t(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        F.posexplode(F.split(F.lower(F.col("text")), " ")).alias(
            "pos", "tok"
        ),
    )
    pa = toks.filter(F.col("tok") == "data").select(
        "doc_id", F.col("pos").alias("pos_a")
    )
    pb = toks.filter(F.col("tok") == "table").select(
        "doc_id", F.col("pos").alias("pos_b")
    )
    prox = (
        pa.join(pb, "doc_id")
        .groupBy("doc_id")
        .agg(
            F.min(F.abs(F.col("pos_a") - F.col("pos_b")))
            .cast("long")
            .alias("min_dist"),
            F.countDistinct("pos_a").cast("long").alias("n_a"),
            F.countDistinct("pos_b").cast("long").alias("n_b"),
        )
    )
    return (
        prox.select(
            "doc_id",
            "min_dist",
            "n_a",
            "n_b",
            F.expr("CAST(1000000 AS BIGINT) div (1 + min_dist)").alias(
                "proximity_score"
            ),
        )
        .orderBy(F.col("proximity_score").desc(), "doc_id")
        .limit(20)
    )
