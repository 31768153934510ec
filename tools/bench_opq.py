"""Measured ADC recall: plain PQ layout vs the OPQ LPT
variance-balanced permutation (`emb_opq_permute_assign` / Ge et al.
CVPR'13 parametric variant), with the OPQ transform SELECTED per
profile on a held-out validation query set.

Selection rationale (the r7→r8 finding): on this corpus a dimension
permutation helps at fine quantization (M=32, dsub=2) and HURTS at
coarse quantization (M=8, dsub=8) — adjacent-dim grouping wins when a
subspace is wide. Measured seeded-codebook distortion MISRANKS the
layouts at M=8 (the permuted layout has lower distortion but lower
recall), so distortion cannot drive the choice; held-out recall can.
Ge et al.'s alternating optimization likewise starts from R = I and
keeps a transform only when it improves the objective — identity is
always in the search space, so the selected transform never does
worse than plain PQ by construction of the selection, and honestly
reports 0 lift where a permutation has nothing to offer.

Protocol:
- codebooks seeded from vec_id < K (both layouts, permuted the same
  way);
- EVAL queries are the NQ_EVAL=16 vectors in [K, K+16), corpus
  vec_id >= K+16 — unchanged from the r7 protocol so the recorded
  recalls stay round-comparable;
- VALIDATION queries are the NQ_VAL=48 vectors in [K+16, K+64),
  corpus vec_id >= K+64 — disjoint from the eval queries, so the
  selection never sees the eval ground truth;
- for each profile (M=8/dsub=8, M=32/dsub=2): measure validation
  recall@5 for identity and LPT, select the argmax (tie -> identity,
  the no-op transform), then report EVAL recall for plain PQ, raw
  LPT, and the selected transform; `recall_lift_m{M}` is
  selected-vs-plain on the eval set.

Folded into bench.py extras as `opq_recall` next to the
distortion-ratio key (`emb_opq_distortion_gain`).

    python tools/bench_opq.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TOPK = 5
NQ_EVAL = 16   # r7's eval split: 16*5 = 80 ground-truth pairs
NQ_VAL = 48    # selection split: 48*5 = 240 pairs, disjoint queries


def _l2(a, b, dsub):
    from pyspark.sql import functions as F

    d = None
    for i in range(1, dsub + 1):
        term = (F.element_at(a, i) - F.element_at(b, i)) * (
            F.element_at(a, i) - F.element_at(b, i)
        )
        d = term if d is None else d + term
    return d


def _adc_top5(pv, dsub: int, q_lo: int, q_hi: int, corpus_lo: int):
    """Top-5 ADC neighbors per query from a [vec_id, sub, sv] layout,
    for queries vec_id in [q_lo, q_hi) against corpus vec_id >=
    corpus_lo."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from target_s3_parquet_spark.operators.similarity import _PQ_K

    cb = pv.filter(F.col("vec_id") < _PQ_K).select(
        F.col("vec_id").alias("code"), "sub", F.col("sv").alias("cv")
    )
    corpus = pv.filter(F.col("vec_id") >= corpus_lo)
    assigned = (
        corpus.join(F.broadcast(cb), "sub")
        .withColumn("d", _l2("sv", "cv", dsub))
        .groupBy("vec_id", "sub")
        .agg(F.min_by("code", F.struct("d", "code")).alias("code"))
    )
    q = pv.filter(
        (F.col("vec_id") >= q_lo) & (F.col("vec_id") < q_hi)
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


def _exact_top5(v, q_lo: int, q_hi: int, corpus_lo: int):
    """Exact squared-L2 top-5 ground truth (permutation-invariant)."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    q = v.filter(
        (F.col("vec_id") >= q_lo) & (F.col("vec_id") < q_hi)
    ).select(F.col("vec_id").alias("query_id"), F.col("v").alias("qv"))
    corpus = v.filter(F.col("vec_id") >= corpus_lo)
    d2 = F.aggregate(
        F.zip_with("qv", "v", lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    w = W.partitionBy("query_id").orderBy("d2", "neighbor_id")
    return (
        F.broadcast(q)
        .join(corpus, F.col("query_id") != F.col("vec_id"))
        .select("query_id", F.col("vec_id").alias("neighbor_id"), d2.alias("d2"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= TOPK)
        .select("query_id", "neighbor_id")
    )


def _recall(exact, approx) -> float:
    n_q = exact.select("query_id").distinct().count()
    hits = exact.join(approx, ["query_id", "neighbor_id"], "leftsemi")
    return round(hits.count() / (n_q * TOPK), 4)


def run_opq_recall(spark, sf_dir: str) -> dict:
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

    eval_q = (_PQ_K, _PQ_K + NQ_EVAL, _PQ_K + NQ_EVAL)          # r7 split
    val_q = (_PQ_K + NQ_EVAL, _PQ_K + NQ_EVAL + NQ_VAL,
             _PQ_K + NQ_EVAL + NQ_VAL)

    exact_eval = _exact_top5(v, *eval_q).cache()
    exact_val = _exact_top5(v, *val_q).cache()

    out: dict = {
        "topk": TOPK,
        "n_queries": NQ_EVAL,
        "n_val_queries": NQ_VAL,
        "sf_dir": sf_dir,
    }
    for m in (8, 32):
        dsub = _EMB_DIM // m
        subs = F.array(*[F.slice("v", s * dsub + 1, dsub) for s in range(m)])
        plain = (
            v.select("vec_id", F.posexplode(subs))
            .withColumnRenamed("pos", "sub")
            .withColumnRenamed("col", "sv")
        )
        permuted = _opq_perm_subvectors(spark, sf_dir, m=m)

        # 1) selection on the held-out validation split
        val = {
            tag: _recall(exact_val, _adc_top5(layout, dsub, *val_q))
            for tag, layout in (("identity", plain), ("lpt", permuted))
        }
        selected = "lpt" if val["lpt"] > val["identity"] else "identity"
        out[f"val_recall_pq_m{m}"] = val["identity"]
        out[f"val_recall_lpt_m{m}"] = val["lpt"]
        out[f"selected_m{m}"] = selected

        # 2) eval recall for plain, raw LPT, and the selected transform
        r_pq = _recall(exact_eval, _adc_top5(plain, dsub, *eval_q))
        r_lpt = _recall(exact_eval, _adc_top5(permuted, dsub, *eval_q))
        out[f"recall_pq_m{m}"] = r_pq
        out[f"recall_lpt_m{m}"] = r_lpt
        out[f"recall_opq_m{m}"] = r_lpt if selected == "lpt" else r_pq
        out[f"recall_lift_m{m}"] = round(out[f"recall_opq_m{m}"] - r_pq, 4)
    exact_eval.unpersist()
    exact_val.unpersist()
    spark.catalog.clearCache()
    return out


def main() -> None:
    from target_s3_parquet_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("bench-opq")
    print(json.dumps(run_opq_recall(spark, sf_dir)))


if __name__ == "__main__":
    main()
