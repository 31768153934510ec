"""Round-3 extension operators.

Semi-structured VARIANT access (Spark 4), dynamic-filter join pruning,
URL-canonicalization dedup, benchmark decontamination by n-gram
overlap, int8 embedding quantization, SQL PIVOT/UNPIVOT round trip,
tolerance-bounded as-of join, and a bigram language-model scorer —
each with a DuckDB oracle twin and the 100 TB plan shape documented on
the operator.

Reference scope note: none of these exist in the reference target
(`/root/reference` is a 605-LoC Singer→parquet sink); they extend the
engine's query surface per SURVEY.md §2B's LLM-data-pipeline charter.
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from target_s3_parquet_spark.operators._util import DEC, t
from target_s3_parquet_spark.registry import query


# ---------------------------------------------------------------------------
# Semi-structured: VARIANT (Spark 4) over the events.props JSON column
# ---------------------------------------------------------------------------
@query(
    "scalar_variant_json",
    """
    SELECT event_id,
           CAST(json_extract(props, '$.k') AS INTEGER) AS k_int,
           CAST(json_extract(props, '$.k') AS DOUBLE) * 1.5 AS k_scaled,
           CAST(json_extract(props, '$.k') AS INTEGER) IS NULL AS k_absent,
           CASE WHEN CAST(json_extract(props, '$.k') AS INTEGER) >= 50
                THEN 'hi' ELSE 'lo' END AS k_bucket
    FROM events
    WHERE event_id % 7 = 0
    """,
)
def scalar_variant_json(spark, sf_dir):
    """Spark 4 VARIANT path: `parse_json` once into a binary variant,
    then typed `variant_get` extractions — the open-schema
    semi-structured story (shredded variant scans at scale) instead of
    per-access string re-parsing with `get_json_object`. The oracle is
    DuckDB's JSON extraction over the same column; both engines parse
    the document once per row and widen `k` identically."""
    e = t(spark, sf_dir, "events").filter(F.col("event_id") % 7 == 0)
    v = F.parse_json(F.col("props"))
    k_int = F.try_variant_get(v, "$.k", "int")
    return e.select(
        "event_id",
        k_int.alias("k_int"),
        (F.try_variant_get(v, "$.k", "double") * 1.5).alias("k_scaled"),
        k_int.isNull().alias("k_absent"),
        F.when(k_int >= 50, F.lit("hi")).otherwise(F.lit("lo")).alias("k_bucket"),
    )


# ---------------------------------------------------------------------------
# Dynamic-filter join pruning (runtime min/max semi-join filter)
# ---------------------------------------------------------------------------
@query(
    "join_dynamic_range_prune",
    """
    SELECT l.l_returnflag AS returnflag,
           COUNT(*) AS n_items,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(38,6))) AS DOUBLE)
             AS total_price
    FROM lineitem l
    WHERE l.l_orderkey IN (
      SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT'
    )
    GROUP BY l.l_returnflag
    """,
)
def join_dynamic_range_prune(spark, sf_dir):
    """Runtime dynamic-filter pattern: the selective dim predicate's
    key range (min/max of urgent orderkeys — a 1-row broadcast) is
    applied to the fact scan BEFORE the exact semi join, so at 100 TB
    the fact side is range-pruned at the parquet reader (row-group
    zone maps) instead of shuffling every row into the join. This is
    what Spark's InjectRuntimeFilter/DPP does for partitioned keys;
    the explicit form covers unpartitioned fact columns. The final
    semi join keeps the result EXACT — the range filter only discards
    rows that could never match (the oracle is the plain semi join)."""
    o = t(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    ).select("o_orderkey")
    bounds = o.agg(
        F.min("o_orderkey").alias("k_min"), F.max("o_orderkey").alias("k_max")
    )
    li = t(spark, sf_dir, "lineitem")
    pruned = li.join(
        F.broadcast(bounds),
        (F.col("l_orderkey") >= F.col("k_min"))
        & (F.col("l_orderkey") <= F.col("k_max")),
    )
    return (
        pruned.join(o, F.col("l_orderkey") == F.col("o_orderkey"), "left_semi")
        .groupBy(F.col("l_returnflag").alias("returnflag"))
        .agg(
            F.count("*").alias("n_items"),
            F.sum(F.col("l_extendedprice").cast(DEC))
            .cast("double")
            .alias("total_price"),
        )
    )


# ---------------------------------------------------------------------------
# URL-canonicalization dedup over documents
# ---------------------------------------------------------------------------
_URL_EXPR = (
    "concat('HTTPS://', source, '.Example.COM:443/p/', "
    "CAST(doc_id % 50 AS STRING), '?utm_source=feed&ref=', "
    "CAST(doc_id AS STRING))"
)
_URL_EXPR_DUCK = (
    "concat('HTTPS://', source, '.Example.COM:443/p/', "
    "CAST(doc_id % 50 AS VARCHAR), '?utm_source=feed&ref=', "
    "CAST(doc_id AS VARCHAR))"
)


@query(
    "docs_url_dedup",
    f"""
    WITH u AS (
      SELECT doc_id, {_URL_EXPR_DUCK} AS url FROM documents
    ),
    canon AS (
      SELECT doc_id,
             regexp_replace(lower(string_split(url, '?')[1]),
                            ':443/', '/') AS canonical_url
      FROM u
    )
    SELECT canonical_url,
           MIN(doc_id) AS keep_doc_id,
           COUNT(*) - 1 AS n_dropped
    FROM canon
    GROUP BY canonical_url
    HAVING COUNT(*) > 1
    """,
)
def docs_url_dedup(spark, sf_dir):
    """URL-canonicalization dedup, the first pass of a web-corpus
    pipeline: normalize scheme/host case, strip default ports and
    tracking query params, then keep the lowest doc_id per canonical
    URL. One hash shuffle on the canonical key — bodies never move.
    (The synthetic table has no URL column, so a deterministic URL is
    derived from (source, doc_id) identically in both engines; the
    canonicalization logic — lowercase, de-port, de-query — is the
    operator under test.)"""
    d = t(spark, sf_dir, "documents")
    url = F.expr(_URL_EXPR)
    canonical = F.regexp_replace(
        F.lower(F.split(url, r"\?").getItem(0)), ":443/", "/"
    )
    return (
        d.select("doc_id", canonical.alias("canonical_url"))
        .groupBy("canonical_url")
        .agg(
            F.min("doc_id").alias("keep_doc_id"),
            (F.count("*") - 1).alias("n_dropped"),
        )
        .filter(F.col("n_dropped") >= 1)
    )


# ---------------------------------------------------------------------------
# Benchmark decontamination by n-gram overlap
# ---------------------------------------------------------------------------
_DECON_N = 4  # demo n-gram size; production uses 13-grams (GPT-3/Pile policy)
_DECON_BENCH_SRC = "src19"


@query(
    "corpus_decontam_ngram",
    f"""
    WITH w AS (
      SELECT doc_id, source, string_split(lower(text), ' ') AS ws
      FROM documents
    ),
    g AS (
      SELECT doc_id, source,
             array_to_string(list_slice(ws, i, i + {_DECON_N - 1}), ' ') AS gram
      FROM w, LATERAL (SELECT unnest(range(1, len(ws) - {_DECON_N - 2})) AS i) t
      WHERE len(ws) >= {_DECON_N}
    ),
    bench AS (
      SELECT DISTINCT gram FROM g WHERE source = '{_DECON_BENCH_SRC}'
    ),
    train AS (
      SELECT DISTINCT doc_id, gram FROM g WHERE source <> '{_DECON_BENCH_SRC}'
    )
    SELECT doc_id, COUNT(*) AS n_contaminated_ngrams
    FROM train JOIN bench USING (gram)
    GROUP BY doc_id
    """,
)
def corpus_decontam_ngram(spark, sf_dir):
    """Benchmark decontamination: flag training documents sharing any
    word n-gram with the held-out benchmark slice (source=src19 stands
    in for the eval set; N=4 here, N=13 in the GPT-3/Pile policy —
    the plan is N-invariant). Scale shape: the benchmark's distinct
    n-gram set is small by construction (eval sets are), so it
    BROADCASTS into a map-side hash probe of the training n-gram
    stream — the 100 TB training corpus is never shuffled, and the
    only aggregation runs on the (rare) hits."""
    d = t(spark, sf_dir, "documents")
    words = F.split(F.lower(F.col("text")), " ")
    grams = F.when(
        F.size(words) >= _DECON_N,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(0), F.size(words) - _DECON_N),
                lambda i: F.concat_ws(" ", F.slice(words, i + 1, _DECON_N)),
            )
        ),
    ).otherwise(F.array().cast("array<string>"))
    g = d.select("doc_id", "source", F.explode(grams).alias("gram"))
    bench = (
        g.filter(F.col("source") == _DECON_BENCH_SRC).select("gram").distinct()
    )
    train = g.filter(F.col("source") != _DECON_BENCH_SRC).select(
        "doc_id", "gram"
    )
    return (
        train.join(F.broadcast(bench), "gram")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_contaminated_ngrams"))
    )


# ---------------------------------------------------------------------------
# Int8 embedding quantization (scalar min/max, per-dimension)
# ---------------------------------------------------------------------------
_QDIM = 64


def _q_minmax_sql() -> str:
    mins = ", ".join(f"MIN(v[{i + 1}]) AS mn{i}" for i in range(_QDIM))
    maxs = ", ".join(f"MAX(v[{i + 1}]) AS mx{i}" for i in range(_QDIM))
    return mins + ", " + maxs


@query(
    "emb_quantize_int8",
    f"""
    WITH v AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings
    ),
    s AS (SELECT {_q_minmax_sql()} FROM v)
    SELECT vec_id,
           array_to_string(
             list_transform(range(1, {_QDIM} + 1),
               i -> CAST(CAST(FLOOR(
                 CASE WHEN ([{", ".join(f"mx{i}" for i in range(_QDIM))}][i]
                           - [{", ".join(f"mn{i}" for i in range(_QDIM))}][i]) = 0
                      THEN 0.0
                      ELSE (v[i] - [{", ".join(f"mn{i}" for i in range(_QDIM))}][i])
                           * 255.0
                           / ([{", ".join(f"mx{i}" for i in range(_QDIM))}][i]
                              - [{", ".join(f"mn{i}" for i in range(_QDIM))}][i])
                 END + 0.5) AS INTEGER) AS VARCHAR)),
             ',') AS codes
    FROM v, s
    """,
)
def emb_quantize_int8(spark, sf_dir):
    """Scalar int8 quantization of the embedding column — the memory
    lever that makes 100 TB ANN serving feasible (4× smaller vectors,
    SIMD-friendly codes). Two passes: (1) one partial-aggregated
    min/max per dimension (a single 1-row result that BROADCASTS), (2)
    a map-side encode `floor((x-mn)*255/(mx-mn)+0.5)`. `floor(x+0.5)`
    rather than `round()` because both engines floor identically while
    round() half-way policies differ. Codes are emitted as a CSV
    string (the driver comparator cannot hash arrays)."""
    e = t(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.col("embedding").cast("array<double>").alias("v"),
    )
    stats = e.agg(
        *[F.min(F.col("v")[i]).alias(f"mn{i}") for i in range(_QDIM)],
        *[F.max(F.col("v")[i]).alias(f"mx{i}") for i in range(_QDIM)],
    )
    mn = F.array(*[F.col(f"mn{i}") for i in range(_QDIM)])
    mx = F.array(*[F.col(f"mx{i}") for i in range(_QDIM)])
    code = F.transform(
        F.sequence(F.lit(1), F.lit(_QDIM)),
        lambda i: F.when(mx[i - 1] - mn[i - 1] == 0, F.lit(0.0)).otherwise(
            (F.col("v")[i - 1] - mn[i - 1]) * 255.0 / (mx[i - 1] - mn[i - 1])
        )
        + F.lit(0.5),
    )
    codes_str = F.array_join(
        F.transform(code, lambda x: F.floor(x).cast("int").cast("string")), ","
    )
    return e.crossJoin(F.broadcast(stats)).select(
        "vec_id", codes_str.alias("codes")
    )


# ---------------------------------------------------------------------------
# SQL PIVOT / UNPIVOT round trip
# ---------------------------------------------------------------------------
@query(
    "sql_pivot_unpivot",
    """
    SELECT user_id % 10 AS bucket, event_type, COUNT(*) AS n
    FROM events
    GROUP BY user_id % 10, event_type
    """,
)
def sql_pivot_unpivot(spark, sf_dir):
    """SQL PIVOT → UNPIVOT round trip: events are pivoted to one
    column per event_type (wide form), then unpivoted back to long
    form. Net result equals the plain group-by (the oracle), proving
    both rewrites lossless (UNPIVOT's default NULL-exclusion exactly
    drops PIVOT's empty cells). Both legs stay one hash-aggregate
    shuffle — PIVOT with a literal IN list is partial-aggregated
    map-side like any groupBy, no per-category scan."""
    e = t(spark, sf_dir, "events")
    e.createOrReplaceTempView("ext_events_pivot_src")
    return spark.sql(
        """
        SELECT bucket, event_type, n FROM (
          SELECT * FROM (
            SELECT user_id % 10 AS bucket, event_type
            FROM ext_events_pivot_src
          )
          PIVOT (COUNT(*) FOR event_type
                 IN ('click', 'view', 'purchase', 'signup', 'error'))
        )
        UNPIVOT (n FOR event_type IN (click, view, purchase, signup, error))
        """
    )


# ---------------------------------------------------------------------------
# Tolerance-bounded as-of join
# ---------------------------------------------------------------------------
@query(
    "join_asof_tolerance",
    """
    SELECT purchase_id, user_id, view_id, view_ts FROM (
      SELECT p.event_id AS purchase_id, p.user_id AS user_id,
             v.event_id AS view_id, v.ts AS view_ts,
             ROW_NUMBER() OVER (PARTITION BY p.event_id
                                ORDER BY v.ts DESC, v.event_id DESC) AS rn
      FROM (SELECT event_id, user_id, ts FROM events
            WHERE event_type = 'purchase') p
      LEFT JOIN (SELECT event_id, user_id, ts FROM events
                 WHERE event_type = 'view') v
        ON v.user_id = p.user_id AND v.ts <= p.ts
       AND v.ts >= p.ts - INTERVAL 30 MINUTE)
    WHERE rn = 1
    """,
)
def join_asof_tolerance(spark, sf_dir):
    """As-of join with a staleness tolerance (the feature-store
    variant: a feature older than the tolerance must NOT be served).
    Same union-window single-shuffle plan as `join_asof` — the carried
    last-view struct is simply nulled when it falls outside the 30 min
    window, so the tolerance adds zero shuffles (the oracle's bounded
    range join would still be quadratic per user at scale)."""
    e = t(spark, sf_dir, "events")
    views = e.filter(F.col("event_type") == "view").select(
        "user_id", "ts", F.lit(0).alias("side"), "event_id"
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.lit(1).alias("side"), "event_id"
    )
    tagged = views.unionAll(purchases)
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "side", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    view_struct = F.when(
        F.col("side") == 0, F.struct(F.col("event_id"), F.col("ts"))
    )
    carried = tagged.withColumn(
        "last_view", F.last(view_struct, ignorenulls=True).over(w)
    )
    fresh = F.when(
        F.col("last_view.ts") >= F.col("ts") - F.expr("INTERVAL 30 MINUTES"),
        F.col("last_view"),
    )
    return (
        carried.filter(F.col("side") == 1)
        .withColumn("fresh_view", fresh)
        .select(
            F.col("event_id").alias("purchase_id"),
            "user_id",
            F.col("fresh_view.event_id").alias("view_id"),
            F.col("fresh_view.ts").alias("view_ts"),
        )
    )


# ---------------------------------------------------------------------------
# Bigram language-model scoring (perplexity-style quality filter)
# ---------------------------------------------------------------------------
@query(
    "text_bigram_lm_score",
    """
    WITH w AS (
      SELECT doc_id, string_split(lower(text), ' ') AS ws FROM documents
    ),
    bg AS (
      SELECT doc_id, ws[i] AS w1, ws[i + 1] AS w2
      FROM w, LATERAL (SELECT unnest(range(1, len(ws))) AS i) t
      WHERE len(ws) >= 2
    ),
    uni AS (SELECT w1, COUNT(*) AS c1 FROM bg GROUP BY w1),
    bi  AS (SELECT w1, w2, COUNT(*) AS c12 FROM bg GROUP BY w1, w2),
    model AS (
      SELECT bi.w1, bi.w2,
             CAST(bi.c12 AS DOUBLE) / uni.c1 AS p
      FROM bi JOIN uni ON bi.w1 = uni.w1
    )
    SELECT bg.doc_id,
           COUNT(*) AS n_bigrams,
           CAST(SUM(CAST(m.p AS DECIMAL(38,6))) AS DOUBLE) AS sum_p
    FROM bg JOIN model m ON bg.w1 = m.w1 AND bg.w2 = m.w2
    GROUP BY bg.doc_id
    """,
)
def text_bigram_lm_score(spark, sf_dir):
    """Corpus-trained bigram LM quality score: P(w2|w1) estimated from
    the corpus itself, each document scored by the sum of its bigram
    probabilities (the arithmetic-mean-likelihood cousin of a
    perplexity filter, kept log-free so every arithmetic op is
    IEEE-exact cross-engine; probabilities are summed as
    DECIMAL(38,6) for order-independence). Scale shape: the model is
    two hash aggregations over the bigram stream; scoring re-joins the
    stream to the model on (w1, w2) — all shuffles carry short string
    pairs, never documents, and the vocabulary-sized model could
    broadcast when it fits."""
    d = t(spark, sf_dir, "documents")
    words = F.split(F.lower(F.col("text")), " ")
    bg = (
        d.select("doc_id", words.alias("ws"))
        .filter(F.size("ws") >= 2)
        .select(
            "doc_id",
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), F.size("ws") - 2),
                    lambda i: F.struct(
                        F.col("ws")[i].alias("w1"),
                        F.col("ws")[i + 1].alias("w2"),
                    ),
                )
            ).alias("b"),
        )
        .select("doc_id", "b.w1", "b.w2")
    )
    uni = bg.groupBy("w1").agg(F.count("*").alias("c1"))
    bi = bg.groupBy("w1", "w2").agg(F.count("*").alias("c12"))
    model = bi.join(uni, "w1").select(
        "w1", "w2", (F.col("c12").cast("double") / F.col("c1")).alias("p")
    )
    return (
        bg.join(model, ["w1", "w2"])
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_bigrams"),
            F.sum(F.col("p").cast(DEC)).cast("double").alias("sum_p"),
        )
    )


# ---------------------------------------------------------------------------
# argmax/argmin aggregation (max_by / min_by)
# ---------------------------------------------------------------------------
@query(
    "agg_max_by_min_by",
    """
    SELECT event_type,
           arg_max(user_id, CAST(FLOOR(value * 1000) AS BIGINT) * 1000000
                            + user_id) AS top_user,
           arg_min(user_id, CAST(FLOOR(value * 1000) AS BIGINT) * 1000000
                            + user_id) AS bottom_user,
           CAST(FLOOR(MAX(value) * 1000) AS BIGINT) AS max_value_milli
    FROM events
    GROUP BY event_type
    """,
)
def agg_max_by_min_by(spark, sf_dir):
    """Argmax/argmin aggregation (`max_by`/`min_by`): the user behind
    each event type's highest/lowest value — one partial-aggregated
    hash agg, no window or self-join. The ordering key folds user_id
    into the low bits so ties are impossible: cross-engine argmax is
    only deterministic when the ordering key is unique (FLOOR rather
    than a bigint cast because DuckDB's cast rounds while Spark's
    truncates)."""
    e = t(spark, sf_dir, "events")
    ord_key = (
        F.floor(F.col("value") * 1000).cast("bigint") * 1000000
        + F.col("user_id")
    )
    return e.groupBy("event_type").agg(
        F.max_by("user_id", ord_key).alias("top_user"),
        F.min_by("user_id", ord_key).alias("bottom_user"),
        F.floor(F.max("value") * 1000).cast("bigint").alias("max_value_milli"),
    )


# ---------------------------------------------------------------------------
# Error-safe arithmetic (try_* family)
# ---------------------------------------------------------------------------
@query(
    "scalar_try_arithmetic",
    """
    SELECT event_id,
           CASE WHEN user_id % 5 = 0 THEN NULL
                ELSE value / (user_id % 5) END AS safe_div,
           CASE WHEN user_id % 3 = 0 THEN NULL
                ELSE CAST(event_id % 100 AS BIGINT) % (user_id % 3)
           END AS safe_mod,
           TRY_CAST(substr(event_type, 1, 1) AS INTEGER) AS not_a_number
    FROM events
    WHERE event_id % 11 = 0
    """,
)
def scalar_try_arithmetic(spark, sf_dir):
    """ANSI-mode error-safe arithmetic: `try_divide`/`try_mod`/
    `try_cast` return NULL where strict ANSI evaluation would abort
    the job (divide-by-zero, bad casts) — the row-level quarantine
    discipline for dirty data at scale, where one poisoned row must
    not kill a 100 TB pass. The oracle spells out the same semantics
    with CASE guards."""
    e = t(spark, sf_dir, "events").filter(F.col("event_id") % 11 == 0)
    return e.select(
        "event_id",
        F.try_divide(F.col("value"), F.col("user_id") % 5).alias("safe_div"),
        F.try_mod(
            (F.col("event_id") % 100).cast("bigint"), F.col("user_id") % 3
        ).alias("safe_mod"),
        F.expr("TRY_CAST(substr(event_type, 1, 1) AS INT)").alias(
            "not_a_number"
        ),
    )


# ---------------------------------------------------------------------------
# Shuffled-hash join strategy
# ---------------------------------------------------------------------------
@query(
    "join_shuffled_hash",
    """
    SELECT o.o_orderpriority, COUNT(*) AS n_lines,
           CAST(SUM(CAST(l.l_quantity AS DECIMAL(38,6))) AS DOUBLE)
             AS total_qty
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderpriority
    """,
)
def join_shuffled_hash(spark, sf_dir):
    """Shuffled-hash join, explicitly hinted: both sides shuffle on the
    key but the smaller side builds an in-memory hash table per
    partition instead of both sides sorting (SMJ). The right strategy
    when the build side fits per-partition memory but is too big to
    broadcast — it skips two sorts, and unlike SMJ keeps no sort-order
    contract downstream. At 100 TB: pick SHJ for fact-to-mid-dim joins
    where AQE's stats show a small-but-not-broadcastable side; keep
    SMJ where spill-safety matters more than the sort cost."""
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders").hint("shuffle_hash")
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_lines"),
            F.sum(F.col("l_quantity").cast(DEC)).cast("double").alias(
                "total_qty"
            ),
        )
    )


# ---------------------------------------------------------------------------
# Cross-document repeated n-gram spans (exact-substring dedup primitive)
# ---------------------------------------------------------------------------
_SPAN_N = 5  # demo span length; the published policy dedups ~50-token repeats


@query(
    "text_repeated_ngram_spans",
    f"""
    WITH w AS (
      SELECT doc_id, string_split(lower(text), ' ') AS ws FROM documents
    ),
    g AS (
      SELECT DISTINCT doc_id,
             array_to_string(list_slice(ws, i, i + {_SPAN_N - 1}), ' ') AS gram
      FROM w, LATERAL (SELECT unnest(range(1, len(ws) - {_SPAN_N - 2})) AS i) t
      WHERE len(ws) >= {_SPAN_N}
    )
    SELECT gram, COUNT(*) AS n_docs,
           MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
    FROM g
    GROUP BY gram
    HAVING COUNT(*) >= 2
    """,
)
def text_repeated_ngram_spans(spark, sf_dir):
    """Cross-document repeated-span detection — the discovery pass of
    exact-substring dedup (the 'dedup 50-token repeats' policy from
    the published training-data dedup literature, N=5 words here so
    the synthetic corpus produces spans): every word n-gram occurring
    in ≥2 distinct documents, with its spread. Plan shape at 100 TB:
    one map-side distinct-shingle projection, one hash shuffle on the
    gram — bodies never move, and the output is bounded by the
    repeated-span vocabulary, not the corpus. The removal pass (cut
    the span from all but one doc) is a join of these spans back
    against the shingle stream."""
    d = t(spark, sf_dir, "documents")
    words = F.split(F.lower(F.col("text")), " ")
    grams = F.when(
        F.size(words) >= _SPAN_N,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(0), F.size(words) - _SPAN_N),
                lambda i: F.concat_ws(" ", F.slice(words, i + 1, _SPAN_N)),
            )
        ),
    ).otherwise(F.array().cast("array<string>"))
    return (
        d.select("doc_id", F.explode(grams).alias("gram"))
        .groupBy("gram")
        .agg(
            F.count("*").alias("n_docs"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
        .filter(F.col("n_docs") >= 2)
    )


# ---------------------------------------------------------------------------
# Collation-aware string comparison (Spark 4 collations)
# ---------------------------------------------------------------------------
@query(
    "scalar_string_collation",
    """
    SELECT lower(o_orderpriority) AS priority_ci,
           COUNT(*) AS n,
           MIN(o_orderpriority) AS sample_raw
    FROM orders
    GROUP BY lower(o_orderpriority)
    """,
)
def scalar_string_collation(spark, sf_dir):
    """Spark 4 collation surface: `collate(col, 'UNICODE_CI')` makes
    comparisons/grouping case-insensitive AT THE TYPE LEVEL — the
    engine-native form of the lower()-normalization the oracle spells
    out (same groups, same counts; the output key is lowercased so
    both engines emit identical group labels). At scale the collated
    comparison avoids materializing a normalized copy of the column
    and keeps pushdown-friendly semantics."""
    o = t(spark, sf_dir, "orders")
    ci = F.collate(F.col("o_orderpriority"), "UNICODE_CI")
    return (
        o.groupBy(ci.alias("g"))
        .agg(
            F.count("*").alias("n"),
            F.min("o_orderpriority").alias("sample_raw"),
        )
        .select(
            F.lower(F.col("g").cast("string")).alias("priority_ci"),
            "n",
            "sample_raw",
        )
    )


# ---------------------------------------------------------------------------
# Higher-order map functions
# ---------------------------------------------------------------------------
@query(
    "scalar_map_higher_order",
    """
    WITH counts AS (
      SELECT user_id, event_type, COUNT(*) AS n
      FROM events
      WHERE user_id % 17 = 0
      GROUP BY user_id, event_type
    )
    SELECT user_id,
           string_agg(event_type || ':' || CAST(n * 2 AS VARCHAR), '|'
                      ORDER BY event_type) AS doubled_counts
    FROM counts
    GROUP BY user_id
    """,
)
def scalar_map_higher_order(spark, sf_dir):
    """Map-typed higher-order functions end-to-end: per-user event
    counts become a MAP via `map_from_entries(array_sort(...))`,
    `transform_values` doubles each count map-side, and `map_entries`
    + `transform` serialize the result deterministically. The map is a
    first-class columnar value between the two aggregations — no
    explode/re-group round trip — and the oracle reproduces the final
    serialized form relationally (map ops must be a lossless detour)."""
    e = t(spark, sf_dir, "events").filter(F.col("user_id") % 17 == 0)
    counts = e.groupBy("user_id", "event_type").agg(F.count("*").alias("n"))
    as_map = counts.groupBy("user_id").agg(
        F.map_from_entries(
            F.array_sort(
                F.collect_list(F.struct("event_type", "n"))
            )
        ).alias("m")
    )
    doubled = as_map.select(
        "user_id",
        F.transform_values(F.col("m"), lambda k, v: v * 2).alias("m2"),
    )
    return doubled.select(
        "user_id",
        F.array_join(
            F.transform(
                F.map_entries("m2"),
                lambda kv: F.concat_ws(
                    ":", kv["key"], kv["value"].cast("string")
                ),
            ),
            "|",
        ).alias("doubled_counts"),
    )


# ---------------------------------------------------------------------------
# Array set algebra (union / intersect / except, distinct semantics)
# ---------------------------------------------------------------------------
@query(
    "scalar_array_setops",
    """
    WITH w AS (
      SELECT doc_id, string_split(lower(text), ' ') AS ws FROM documents
      WHERE len(string_split(text, ' ')) >= 8 AND doc_id % 13 = 0
    ),
    ab AS (
      SELECT doc_id, ws[1:5] AS a, ws[3:8] AS b FROM w
    )
    SELECT doc_id,
           COALESCE(array_to_string(list_sort(list_distinct(list_cat(a, b))),
                    ','), '') AS union_sorted,
           COALESCE(array_to_string(list_sort(list_distinct(
             list_filter(a, x -> list_contains(b, x)))), ','), '')
             AS intersect_sorted,
           COALESCE(array_to_string(list_sort(list_distinct(
             list_filter(a, x -> NOT list_contains(b, x)))), ','), '')
             AS except_sorted
    FROM ab
    """,
)
def scalar_array_setops(spark, sf_dir):
    """Array set algebra on token arrays: union/intersect/except with
    DISTINCT semantics (Spark's array_* set functions dedup; the
    oracle spells the same algebra out with list_filter/list_distinct).
    Results are sorted + serialized so output is independent of the
    engines' internal element order (COALESCE on the oracle side:
    DuckDB's array_to_string of an empty list is NULL where Spark's
    array_join is '' — caught by the sf0.1 gate). All map-side — the shuffle-free
    building block the n-gram/Jaccard operators compose."""
    d = t(spark, sf_dir, "documents").filter(
        (F.size(F.split(F.col("text"), " ")) >= 8) & (F.col("doc_id") % 13 == 0)
    )
    ws = F.split(F.lower(F.col("text")), " ")
    ab = d.select(
        "doc_id",
        F.slice(ws, 1, 5).alias("a"),
        F.slice(ws, 3, 6).alias("b"),
    )
    ser = lambda c: F.array_join(F.array_sort(c), ",")  # noqa: E731
    return ab.select(
        "doc_id",
        ser(F.array_union("a", "b")).alias("union_sorted"),
        ser(F.array_intersect("a", "b")).alias("intersect_sorted"),
        ser(F.array_except("a", "b")).alias("except_sorted"),
    )


@query(
    "text_collocation_lift_topk",
    """
    WITH w AS (
      SELECT doc_id, string_split(lower(text), ' ') AS ws FROM documents
    ),
    bg AS (
      SELECT ws[i] AS w1, ws[i + 1] AS w2
      FROM w, LATERAL (SELECT unnest(range(1, len(ws))) AS i) s
      WHERE len(ws) >= 2
    ),
    bi AS (SELECT w1, w2, COUNT(*) AS c12 FROM bg GROUP BY w1, w2),
    u1 AS (SELECT w1, COUNT(*) AS c1 FROM bg GROUP BY w1),
    u2 AS (SELECT w2, COUNT(*) AS c2 FROM bg GROUP BY w2),
    n AS (SELECT COUNT(*) AS nb FROM bg)
    SELECT bi.w1, bi.w2, bi.c12,
           CAST(nb AS DOUBLE) * bi.c12 / (CAST(u1.c1 AS DOUBLE) * u2.c2)
             AS lift
    FROM bi JOIN u1 USING (w1) JOIN u2 USING (w2) CROSS JOIN n
    WHERE bi.c12 >= 5
    ORDER BY lift DESC, bi.w1, bi.w2
    LIMIT 50
    """,
)
def text_collocation_lift_topk(spark, sf_dir):
    """Top-50 collocations by LIFT — the log-free monotone twin of
    PMI (PMI = log lift, so the ranking is identical): bigrams whose
    observed count beats the independence expectation c1*c2/N most.
    Collocation mining feeds tokenizer vocab candidates and phrase-
    aware dedup shingles in a training-data pipeline. The score is the
    `market_basket_pairs` discipline — integer counts with one
    identical-tree double expression — so both engines rank every pair
    identically; the total order (lift DESC, w1, w2) makes the top-50
    boundary deterministic.

    Distributed shape: the bigram stream is aggregated three ways
    (combinable groupBys); the marginal tables join back on their
    natural keys; min-support c12 >= 5 prunes before the join; the
    top-50 is TakeOrderedAndProject (never a global sort).

    Reference scope check: codeG12/target-s3-parquet has no query
    surface (605-LoC Singer->Parquet sink); this key belongs to the
    LLM-data-pipeline extension surface (SURVEY.md §2C)."""
    d = t(spark, sf_dir, "documents")
    words = F.split(F.lower(F.col("text")), " ")
    bg = (
        d.select(words.alias("ws"))
        .filter(F.size("ws") >= 2)
        .select(
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), F.size("ws") - 2),
                    lambda i: F.struct(
                        F.col("ws")[i].alias("w1"),
                        F.col("ws")[i + 1].alias("w2"),
                    ),
                )
            ).alias("b")
        )
        .select("b.w1", "b.w2")
    )
    bi = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12")).filter(
        F.col("c12") >= 5
    )
    u1 = bg.groupBy("w1").agg(F.count(F.lit(1)).alias("c1"))
    u2 = bg.groupBy("w2").agg(F.count(F.lit(1)).alias("c2"))
    n = bg.agg(F.count(F.lit(1)).alias("nb"))
    lift = (
        F.col("nb").cast("double") * F.col("c12")
        / (F.col("c1").cast("double") * F.col("c2"))
    )
    return (
        bi.join(u1, "w1")
        .join(u2, "w2")
        .crossJoin(F.broadcast(n))
        .select("w1", "w2", "c12", lift.alias("lift"))
        .orderBy(F.col("lift").desc(), "w1", "w2")
        .limit(50)
    )


@query(
    "text_hapax_ratio_by_lang",
    """
    WITH toks AS (
      SELECT lang, t AS token
      FROM (SELECT lang,
                   UNNEST(string_split_regex(lower(text), '[^a-z]+')) AS t
            FROM documents)
      WHERE t <> ''
    ),
    freq AS (
      SELECT lang, token, COUNT(*) AS c FROM toks GROUP BY lang, token
    )
    SELECT lang,
           CAST(SUM(c) AS BIGINT) AS n_tokens,
           COUNT(*) AS vocab,
           CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS hapax,
           CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS DOUBLE)
             / COUNT(*) AS hapax_vocab_ratio,
           CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS DOUBLE)
             / SUM(c) AS hapax_token_ratio
    FROM freq GROUP BY lang
    """,
)
def text_hapax_ratio_by_lang(spark, sf_dir):
    """Hapax legomena ratio per language — the vocabulary-richness /
    OCR-noise signal corpus linguists check first: a natural corpus
    runs ~40-60% hapax of vocab (Zipf's tail); far above flags noisy
    tokenization or OCR garbage, far below flags boilerplate or
    deduplication debt. Pure integer counts and two identical-tree
    double ratios — nothing to drift.

    Distributed shape: tokenize map-side, ONE combinable groupBy to
    per-(lang, token) counts, one combinable rollup to per-lang rows.
    At 100 TB the token-frequency shuffle is the cost and is the same
    shuffle every vocab/TF-IDF build already pays.

    Reference scope check: codeG12/target-s3-parquet has no query
    surface (605-LoC Singer->Parquet sink); this key belongs to the
    LLM-data-pipeline extension surface (SURVEY.md §2C)."""
    d = t(spark, sf_dir, "documents")
    toks = (
        d.select(
            "lang",
            F.explode(
                F.split(F.lower(F.col("text")), "[^a-z]+")
            ).alias("token"),
        )
        .filter(F.col("token") != "")
    )
    freq = toks.groupBy("lang", "token").agg(F.count(F.lit(1)).alias("c"))
    hapax = F.sum(F.when(F.col("c") == 1, 1).otherwise(0))
    return freq.groupBy("lang").agg(
        F.sum("c").cast("long").alias("n_tokens"),
        F.count(F.lit(1)).alias("vocab"),
        hapax.cast("long").alias("hapax"),
        (hapax.cast("double") / F.count(F.lit(1))).alias("hapax_vocab_ratio"),
        (hapax.cast("double") / F.sum("c")).alias("hapax_token_ratio"),
    )


@query(
    "text_kneser_ney_bigram_top",
    """
    WITH w AS (
      SELECT doc_id, string_split(lower(text), ' ') AS ws FROM documents
    ),
    bg AS (
      SELECT ws[i] AS w1, ws[i + 1] AS w2
      FROM w, LATERAL (SELECT unnest(range(1, len(ws))) AS i) t
      WHERE len(ws) >= 2
    ),
    bi AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c12
           FROM bg GROUP BY w1, w2),
    ctx AS (SELECT w1, CAST(SUM(c12) AS BIGINT) AS c1,
                   CAST(COUNT(*) AS BIGINT) AS n_after
            FROM bi GROUP BY w1),
    cont AS (SELECT w2, CAST(COUNT(*) AS BIGINT) AS n_before
             FROM bi GROUP BY w2),
    tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_bi FROM bi),
    model AS (
      SELECT bi.w1, bi.w2, bi.c12,
             GREATEST(CAST(bi.c12 AS DOUBLE) - 0.75, 0.0) / ctx.c1
             + (0.75 * ctx.n_after / ctx.c1)
               * (CAST(cont.n_before AS DOUBLE) / tot.n_bi) AS p_kn
      FROM bi
      JOIN ctx ON ctx.w1 = bi.w1
      JOIN cont ON cont.w2 = bi.w2
      CROSS JOIN tot
    )
    SELECT w1, w2, c12, p_kn FROM model
    ORDER BY p_kn DESC, w1, w2 LIMIT 20
    """,
)
def text_kneser_ney_bigram_top(spark, sf_dir):
    """KNESER-NEY smoothed bigram model (interpolated, absolute
    discount d = 0.75 — the smoothing every n-gram LM quality filter
    and every KenLM-style scorer actually ships): p_KN(w2|w1) =
    max(c12 - d, 0)/c1 + (d * N1+(w1,.)/c1) * (N1+(., w2)/|bigrams|),
    where the continuation probability counts CONTEXTS (how many
    distinct words precede w2), not occurrences — the insight that
    separates KN from the `text_bigram_lm_score` MLE baseline
    (\"Francisco\" is frequent but only ever follows \"San\"). Top-20
    bigrams by smoothed probability.

    Exactness: all counts (c12, c1, distinct-continuation N1+,
    bigram-type total) are exact integers; d = 0.75 is an exactly-
    representable literal, so max(c12 - 0.75, 0) is exact; p_KN is
    one identical-tree IEEE expression per bigram; top-20 ordering
    breaks ties on (w1, w2).

    Distributed shape: two combinable aggregations over the bigram
    stream (type counts, then context/continuation margins), a join
    back on vocabulary-sized keys (broadcastable), and a
    TakeOrderedAndProject top-20 — shuffles carry short string pairs,
    never documents.

    Reference scope check: codeG12/target-s3-parquet has no query
    surface (605-LoC Singer->Parquet sink); this key belongs to the
    LLM-data-pipeline extension surface (SURVEY.md §2C)."""
    d = t(spark, sf_dir, "documents")
    words = F.split(F.lower(F.col("text")), " ")
    bg = (
        d.select("doc_id", words.alias("ws"))
        .filter(F.size("ws") >= 2)
        .select(F.posexplode("ws").alias("i", "w1"), "ws")
        .withColumn("w2", F.get(F.col("ws"), F.col("i") + 1))
        .filter(F.col("w2").isNotNull())
        .select("w1", "w2")
    )
    bi = bg.groupBy("w1", "w2").agg(
        F.count(F.lit(1)).cast("long").alias("c12")
    )
    ctx = bi.groupBy("w1").agg(
        F.sum("c12").cast("long").alias("c1"),
        F.count(F.lit(1)).cast("long").alias("n_after"),
    )
    cont = bi.groupBy("w2").agg(
        F.count(F.lit(1)).cast("long").alias("n_before")
    )
    tot = bi.agg(F.count(F.lit(1)).cast("long").alias("n_bi"))
    model = (
        bi.join(ctx, "w1")
        .join(cont, "w2")
        .crossJoin(F.broadcast(tot))
        .select(
            "w1",
            "w2",
            "c12",
            (
                F.greatest(
                    F.col("c12").cast("double") - 0.75, F.lit(0.0)
                )
                / F.col("c1")
                + (F.lit(0.75) * F.col("n_after") / F.col("c1"))
                * (F.col("n_before").cast("double") / F.col("n_bi"))
            ).alias("p_kn"),
        )
    )
    return model.orderBy(
        F.col("p_kn").desc(), "w1", "w2"
    ).limit(20)
