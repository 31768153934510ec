"""Measured ADC recall: plain PQ layout vs the OPQ variance-balanced
permutation (`emb_opq_permute_assign` / Ge et al. CVPR'13 parametric
variant).

Protocol (`emb_pq_adc_search`'s split with a wider query set):
codebooks seeded from vec_id < K, queries are the NQ=16 vectors in
[K, K+16), corpus is vec_id >= K+16. For EACH layout, corpus vectors
are encoded to their
per-subspace argmin codes, each query builds its M×K LUT, candidates
rank by the M-way ADC sum, and recall@5 is measured against the exact
squared-L2 top-5 over the raw vectors (layout-invariant: a permutation
preserves L2, so both layouts share one ground truth).

Two profiles are recorded, matching the registered keys' own
parameter discussion (`sim_ann_ivfpq_search` docstring): the WIDE
M=8/dsub=8 profile of `emb_pq_*` (seeded codebooks degenerate there —
the recall floor is the honest number) and the NARROW M=32/dsub=2
profile where seeded-codebook ADC recall is meaningful and the
permutation's effect is visible. Folded into bench.py extras as
`opq_recall` next to the distortion-ratio key
(`emb_opq_distortion_gain`).

    python tools/bench_opq.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TOPK = 5
NQ = 16  # wider than the registered keys' 4-query split: 16*5 = 80
#        ground-truth pairs, so one flipped neighbor moves recall by
#        0.0125, not 0.05 — the lift number is signal, not noise


def _l2(a, b, dsub):
    from pyspark.sql import functions as F

    d = None
    for i in range(1, dsub + 1):
        term = (F.element_at(a, i) - F.element_at(b, i)) * (
            F.element_at(a, i) - F.element_at(b, i)
        )
        d = term if d is None else d + term
    return d


def _adc_top5(pv, dsub: int):
    """Top-5 ADC neighbors per query from a [vec_id, sub, sv] layout."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from target_s3_parquet_spark.operators.similarity import _PQ_K

    cb = pv.filter(F.col("vec_id") < _PQ_K).select(
        F.col("vec_id").alias("code"), "sub", F.col("sv").alias("cv")
    )
    corpus = pv.filter(F.col("vec_id") >= _PQ_K + NQ)
    assigned = (
        corpus.join(F.broadcast(cb), "sub")
        .withColumn("d", _l2("sv", "cv", dsub))
        .groupBy("vec_id", "sub")
        .agg(F.min_by("code", F.struct("d", "code")).alias("code"))
    )
    q = pv.filter(
        (F.col("vec_id") >= _PQ_K) & (F.col("vec_id") < _PQ_K + NQ)
    ).select(F.col("vec_id").alias("query_id"), "sub", F.col("sv").alias("qv"))
    lut = q.join(F.broadcast(cb), "sub").select(
        "query_id", "sub", "code", _l2("qv", "cv", dsub).alias("pd")
    )
    adc = (
        assigned.join(F.broadcast(lut), ["sub", "code"])
        .groupBy("query_id", "vec_id")
        .agg(F.sum("pd").alias("adc_dist"))
    )
    w = W.partitionBy("query_id").orderBy("adc_dist", "vec_id")
    return (
        adc.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= TOPK)
        .select("query_id", F.col("vec_id").alias("neighbor_id"))
    )


def run_opq_recall(spark, sf_dir: str) -> dict:
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from target_s3_parquet_spark.operators._util import t
    from target_s3_parquet_spark.operators.similarity import (
        _EMB_DIM,
        _PQ_K,
        _opq_perm_subvectors,
        _vec_d,
    )

    v = t(spark, sf_dir, "embeddings").select(
        "vec_id", _vec_d(F.col("embedding")).alias("v")
    )

    # exact squared-L2 top-5 ground truth (permutation-invariant)
    q = v.filter(
        (F.col("vec_id") >= _PQ_K) & (F.col("vec_id") < _PQ_K + NQ)
    ).select(F.col("vec_id").alias("query_id"), F.col("v").alias("qv"))
    corpus = v.filter(F.col("vec_id") >= _PQ_K + NQ)
    d2 = F.aggregate(
        F.zip_with("qv", "v", lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    w = W.partitionBy("query_id").orderBy("d2", "neighbor_id")
    exact = (
        F.broadcast(q)
        .join(corpus, F.col("query_id") != F.col("vec_id"))
        .select("query_id", F.col("vec_id").alias("neighbor_id"), d2.alias("d2"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= TOPK)
        .select("query_id", "neighbor_id")
        .cache()
    )
    n_q = exact.select("query_id").distinct().count()

    out: dict = {"topk": TOPK, "n_queries": NQ, "sf_dir": sf_dir}
    for m in (8, 32):
        dsub = _EMB_DIM // m
        subs = F.array(*[F.slice("v", s * dsub + 1, dsub) for s in range(m)])
        plain = (
            v.select("vec_id", F.posexplode(subs))
            .withColumnRenamed("pos", "sub")
            .withColumnRenamed("col", "sv")
        )
        permuted = _opq_perm_subvectors(spark, sf_dir, m=m)
        for tag, layout in (("pq", plain), ("opq", permuted)):
            approx = _adc_top5(layout, dsub)
            hits = exact.join(approx, ["query_id", "neighbor_id"], "leftsemi")
            out[f"recall_{tag}_m{m}"] = round(hits.count() / (n_q * TOPK), 4)
        out[f"recall_lift_m{m}"] = round(
            out[f"recall_opq_m{m}"] - out[f"recall_pq_m{m}"], 4
        )
    exact.unpersist()
    spark.catalog.clearCache()
    return out


def main() -> None:
    from target_s3_parquet_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("bench-opq")
    print(json.dumps(run_opq_recall(spark, sf_dir)))


if __name__ == "__main__":
    main()
