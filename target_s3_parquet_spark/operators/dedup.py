"""Deduplication operators over ``documents``: exact, MinHash-LSH,
SimHash, and n-gram Jaccard near-dup.

Design notes for 100 TB:
- Exact dedup is a hash-groupBy on a 256-bit content hash — one shuffle
  of (hash, doc_id), never of the document bodies.
- MinHash/LSH: per-doc signature is a map-side projection; the only
  shuffle is the band-bucket join on short keys. No all-pairs product —
  candidate pairs are generated per bucket, verified by exact Jaccard.
- All hashing is md5-based so the DuckDB oracle can reproduce every
  stage bit-for-bit (Spark's murmur `F.hash` has no cross-engine twin).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from target_s3_parquet_spark.operators._util import t
from target_s3_parquet_spark.registry import query


@query(
    "text_exact_dedup",
    """
    SELECT sha256(text) AS content_hash,
           MIN(doc_id) AS keep_doc_id,
           COUNT(*) AS n_copies
    FROM documents
    GROUP BY sha256(text)
    """,
)
def text_exact_dedup(spark, sf_dir):
    """Exact dedup: group on sha256(text), keep the lowest doc_id.
    The deterministic keep-rule matters at scale — `dropDuplicates` keeps
    an arbitrary row; MIN over the key column is reproducible."""
    d = t(spark, sf_dir, "documents")
    return (
        d.groupBy(F.sha2(F.col("text"), 256).alias("content_hash"))
        .agg(
            F.min("doc_id").alias("keep_doc_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


@query(
    "text_exact_dedup_rows",
    """
    SELECT doc_id, lang, source, n_chars
    FROM (
      SELECT doc_id, lang, source, n_chars,
             ROW_NUMBER() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
      FROM documents
    ) WHERE rn = 1
    """,
)
def text_exact_dedup_rows(spark, sf_dir):
    """The surviving-row form of exact dedup (what a pipeline keeps)."""
    from pyspark.sql import Window as W

    d = t(spark, sf_dir, "documents")
    w = W.partitionBy(F.md5("text")).orderBy("doc_id")
    return (
        d.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", "lang", "source", "n_chars")
    )


def _word_set(col):
    """Distinct lowercase word set of a text column (shared by the
    Jaccard verifiers)."""
    return F.array_distinct(F.split(F.lower(col), " "))


@query(
    "text_ngram_jaccard_dup",
    """
    WITH sets AS (
      SELECT doc_id,
             list_sort(list_distinct(
               list_transform(range(1, len(string_split(lower(text), ' ')) - 1),
                              i -> array_to_string(string_split(lower(text), ' ')[i:i+2], ' '))
             )) AS grams
      FROM documents
    ),
    pairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             len(list_intersect(a.grams, b.grams)) AS inter,
             len(a.grams) + len(b.grams) - len(list_intersect(a.grams, b.grams)) AS uni
      FROM sets a JOIN sets b ON a.doc_id < b.doc_id
      WHERE a.doc_id < 64 AND b.doc_id < 64
    )
    SELECT doc_a, doc_b,
           CAST(inter AS DOUBLE) / uni AS jaccard
    FROM pairs
    WHERE CAST(inter AS DOUBLE) / uni >= 0.2
    """,
)
def text_ngram_jaccard_dup(spark, sf_dir):
    """Word-3-gram Jaccard similarity above a threshold, on a bounded
    doc_id window (the unbounded version goes through LSH banding —
    `text_near_dedup_minhash` — never an open cross join)."""
    d = t(spark, sf_dir, "documents").filter(F.col("doc_id") < 64)
    words = F.split(F.lower(F.col("text")), " ")
    # Guard: Spark's sequence(0, n) with n<0 counts DOWN; short docs must
    # yield an empty gram set like DuckDB's range() does.
    grams = F.when(F.size(words) >= 3,
        F.array_sort(
            F.array_distinct(
                F.transform(
                    F.sequence(F.lit(0), F.size(words) - 3),
                    lambda i: F.concat_ws(" ", F.slice(words, i + 1, 3)),
                )
            )
        ),
    ).otherwise(F.array().cast("array<string>"))
    sets = d.select("doc_id", grams.alias("grams"))
    a = sets.alias("a")
    b = sets.alias("b")
    inter = F.size(F.array_intersect(F.col("a.grams"), F.col("b.grams")))
    uni = F.size(F.col("a.grams")) + F.size(F.col("b.grams")) - inter
    jac = inter.cast("double") / uni
    return (
        a.join(b, F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            jac.alias("jaccard"),
        )
        .filter(F.col("jaccard") >= 0.2)
    )
