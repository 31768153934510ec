"""Round-6 operator invariants: the _prod twins of the global-window
keys must be BIT-IDENTICAL to their exact single-sort references (not
just gate-green against the same oracle), the closed-form NTILE must
agree with the window function on adversarial (n, k) shapes, and the
two-phase rank/prefix-sum helper must be a pure function of the row
set (partition-count independent)."""

import os

from pyspark.sql import Window as W
from pyspark.sql import functions as F

SF = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def _rows(df, *order_cols):
    return [tuple(r) for r in df.orderBy(*order_cols).collect()]


def test_window_ntile_prod_matches_exact(spark):
    from target_s3_parquet_spark.operators.windows import (
        window_ntile,
        window_ntile_prod,
    )

    exact = _rows(window_ntile(spark, SF), "decile")
    prod = _rows(window_ntile_prod(spark, SF), "decile")
    assert prod == exact


def test_rfm_prod_matches_exact(spark):
    from target_s3_parquet_spark.operators.pipeline import (
        customer_rfm_segments,
        customer_rfm_segments_prod,
    )

    exact = _rows(customer_rfm_segments(spark, SF), "c_custkey")
    prod = _rows(customer_rfm_segments_prod(spark, SF), "c_custkey")
    assert prod == exact


def test_pareto_prod_matches_exact(spark):
    from target_s3_parquet_spark.operators.pipeline import (
        pareto_revenue_share,
        pareto_revenue_share_prod,
    )

    exact = _rows(pareto_revenue_share(spark, SF), "rnk")
    prod = _rows(pareto_revenue_share_prod(spark, SF), "rnk")
    assert prod == exact


def test_ntile_closed_form_equals_window_function(spark):
    """The closed form must reproduce NTILE's bucket-assignment contract
    (first n mod k buckets take the extra row) on the shapes where
    naive floor((rank-1)*k/n)+1 formulas diverge: n not divisible by k,
    n < k, n == k, and k == 1."""
    from target_s3_parquet_spark.operators._util import ntile_from_rank

    for n, k in [(12, 10), (7, 10), (10, 10), (9973, 10), (100, 1), (23, 5)]:
        df = spark.range(1, n + 1).withColumnRenamed("id", "v")
        w = W.orderBy("v")
        expected = df.select(
            "v", F.ntile(k).over(w).alias("b")
        )
        total = df.agg(F.count(F.lit(1)).alias("_n"))
        got = (
            df.crossJoin(F.broadcast(total))
            .select(
                "v",
                F.row_number().over(w).alias("rnk"),
            )
            .crossJoin(F.broadcast(total))
            .select(
                "v", ntile_from_rank(F.col("rnk"), F.col("_n"), k).alias("b")
            )
        )
        mismatch = (
            expected.alias("e")
            .join(got.alias("g"), "v")
            .filter(F.col("e.b") != F.col("g.b"))
            .count()
        )
        assert mismatch == 0, f"(n={n}, k={k})"


def test_two_phase_rank_partition_count_independent(spark):
    """rank and running sum are pure functions of the row set: any
    nparts gives the same result, and both match the naive global
    window."""
    from target_s3_parquet_spark.operators._util import two_phase_rank

    df = (
        spark.range(1, 501)
        .select(
            (F.col("id") % 97).alias("a"),
            F.col("id").alias("key"),
            (F.col("id") % 13).cast("decimal(38,6)").alias("m"),
        )
    )
    w = W.orderBy(F.col("a").desc(), "key")
    naive = df.select(
        "key",
        F.row_number().over(w).alias("rnk"),
        F.sum("m").over(w.rowsBetween(W.unboundedPreceding, 0)).alias("cum"),
    )
    expected = _rows(naive, "key")
    for nparts in (1, 3, 32):
        got = two_phase_rank(
            df, [F.col("a").desc(), "key"], sum_col="m", nparts=nparts
        ).select("key", "rnk", "cum")
        assert _rows(got, "key") == expected, f"nparts={nparts}"


def test_prod_plans_have_no_data_global_window(spark):
    """The only unpartitioned ORDER BY window in each _prod plan is the
    num-partitions-row offsets cumsum — structurally: every Sort in the
    plan is non-global except inside the offsets subtree, asserted here
    by checking the plan has NO single-partition sort over the fact
    input. We check the physical plan for 'Exchange SinglePartition'
    feeding a Window whose input is NOT the tiny offsets aggregate by
    bounding how many single-partition exchanges appear: the offsets
    window needs exactly one per two_phase_rank call."""
    from target_s3_parquet_spark.operators.pipeline import (
        customer_rfm_segments_prod,
        pareto_revenue_share_prod,
    )
    from target_s3_parquet_spark.operators.windows import window_ntile_prod
    from target_s3_parquet_spark.plans.planflags import plan_of

    import re

    # (key, number of two_phase_rank calls = allowed SinglePartition
    # exchanges for the bounded offsets windows)
    for fn, n_calls in [
        (window_ntile_prod, 1),
        (pareto_revenue_share_prod, 1),
        (customer_rfm_segments_prod, 3),
    ]:
        plan = plan_of(fn(spark, SF))
        single = len(re.findall(r"Exchange SinglePartition", plan))
        assert single <= n_calls, (
            f"{fn.__name__}: {single} single-partition exchanges "
            f"(> {n_calls} offsets windows) — a data-sized global "
            f"sort crept in\n{plan}"
        )


def test_ppjoin_suffix_funnel_invariants(spark):
    """Tier monotonicity and completeness: true <= suffix <= positional
    <= prefix, with the prefix tier non-vacuous. Strict suffix-tier
    gains show at sf0.01+ (positional 27 -> suffix 25) and sf0.1
    (119,907 -> 101,765); the sf0.001 fixture's 28 positional
    candidates are all true pairs, so there is nothing left to prune
    and equality is correct there."""
    from target_s3_parquet_spark.operators.dedup import (
        text_ppjoin_suffix_stats,
    )

    row = text_ppjoin_suffix_stats(spark, SF).collect()[0]
    assert (
        row["true_pairs"]
        <= row["suffix_cand_pairs"]
        <= row["positional_cand_pairs"]
        <= row["prefix_cand_pairs"]
    ), row
    assert row["prefix_cand_pairs"] > row["positional_cand_pairs"], row
    assert row["true_pairs"] > 0, "fixture must contain true near-dups"


def test_bpe_fertility_accounting(spark):
    """Per-lang fertility table must tie out against the corpus: doc
    counts sum to the corpus size, merges never grow token counts, and
    the scaled ratio is exactly the floor rational of its own totals."""
    from target_s3_parquet_spark.functions.text_analysis import (
        text_bpe_fertility_by_lang,
    )
    from target_s3_parquet_spark.operators._util import t

    out = text_bpe_fertility_by_lang(spark, SF)
    rows = out.collect()
    n_docs_total = t(spark, SF, "documents").count()
    assert sum(r["n_docs"] for r in rows) == n_docs_total
    for r in rows:
        assert 0 < r["total_tokens"] <= r["total_words"], r
        assert (
            r["fertility_scaled"]
            == r["total_tokens"] * 1_000_000 // r["total_words"]
        ), r


def test_gram_matrix_prod_matches_exact_and_numpy(spark):
    """The mapInPandas partial-Gram form must equal the relational form
    BIT-FOR-BIT (integer grid — no float accumulation anywhere), and
    both must equal a driver-side numpy reference on the same grid."""
    import numpy as np

    from target_s3_parquet_spark.operators._util import t
    from target_s3_parquet_spark.operators.similarity import (
        emb_gram_matrix_exact,
        emb_gram_matrix_prod,
    )

    exact = _rows(emb_gram_matrix_exact(spark, SF), "i", "j")
    prod = _rows(emb_gram_matrix_prod(spark, SF), "i", "j")
    assert prod == exact
    emb = [
        np.asarray(r["embedding"], dtype=np.float64)
        for r in t(spark, SF, "embeddings").select("embedding").collect()
    ]
    q = np.trunc(np.stack(emb) * 1_000_000.0).astype(np.int64)
    g = q.T @ q
    ref = {
        (i + 1, j + 1): int(g[i, j])
        for i in range(g.shape[0])
        for j in range(i, g.shape[0])
    }
    got = {(r[0], r[1]): r[2] for r in exact}
    assert got == ref


def test_bm25_scores_monotone_and_bounded(spark):
    """Sanity invariants of the BM25 scorer: scores are positive for
    docs matching at least one term, the returned rows are the global
    top-10 by (score desc, doc_id), and every returned doc matches at
    least one query term (idf > 0 on this corpus)."""
    from target_s3_parquet_spark.functions.scalars import search_bm25_topk

    rows = search_bm25_topk(spark, SF).collect()
    assert len(rows) == 10
    scores = [r["score"] for r in rows]
    assert scores == sorted(scores, reverse=True)
    for r in rows:
        assert r["tf1"] + r["tf2"] + r["tf3"] > 0, r
        assert r["score"] > 0, r


def test_quality_calibration_ties_out(spark):
    """Decile table must tie out against the per-doc scorer: doc counts
    sum to the corpus, accepted counts sum to the scorer's accepted
    total, equi-depth bucket sizes differ by at most 1, and logit
    bounds are non-decreasing across deciles."""
    from target_s3_parquet_spark.functions.text_analysis import (
        docs_quality_calibration,
        docs_quality_model_score,
    )

    rows = sorted(
        docs_quality_calibration(spark, SF).collect(),
        key=lambda r: r["decile"],
    )
    scored = docs_quality_model_score(spark, SF)
    n_docs = scored.count()
    n_acc = scored.filter("accepted").count()
    assert sum(r["n_docs"] for r in rows) == n_docs
    assert sum(r["n_accepted"] for r in rows) == n_acc
    sizes = [r["n_docs"] for r in rows]
    assert max(sizes) - min(sizes) <= 1
    for a, b in zip(rows, rows[1:]):
        assert a["hi_logit"] <= b["lo_logit"]


def test_dup_source_matrix_ties_out(spark):
    """The matrix's pair total must equal the AllPairs exact true-pair
    count, the symmetric key must be ordered (lo <= hi), and n_within
    only populates diagonal cells."""
    from target_s3_parquet_spark.operators.dedup import (
        docs_dup_source_matrix,
        text_allpairs_prefix_join,
    )

    rows = docs_dup_source_matrix(spark, SF).collect()
    n_true = text_allpairs_prefix_join(spark, SF).count()
    assert sum(r["n_dup_pairs"] for r in rows) == n_true
    for r in rows:
        assert r["source_lo"] <= r["source_hi"], r
        if r["source_lo"] != r["source_hi"]:
            assert r["n_within"] == 0, r
        else:
            assert r["n_within"] == r["n_dup_pairs"], r


def test_weighted_median_against_python_reference(spark):
    """The weighted median per group must equal a naive per-row Python
    reference (sort by value, walk cumulative weight to half-total)."""
    from collections import defaultdict

    from target_s3_parquet_spark.operators._util import t
    from target_s3_parquet_spark.operators.aggregates import (
        agg_weighted_median,
    )

    rows = (
        t(spark, SF, "lineitem")
        .select("l_returnflag", "l_extendedprice", "l_quantity")
        .collect()
    )
    groups = defaultdict(list)
    for r in rows:
        groups[r["l_returnflag"]].append(
            (r["l_extendedprice"], int(r["l_quantity"]))
        )
    expected = {}
    for flag, vw in groups.items():
        vw.sort()
        tot = sum(w for _, w in vw)
        cw = 0
        for v, w in vw:
            cw += w
            if 2 * cw >= tot:
                expected[flag] = (v, tot)
                break
    got = {
        r["l_returnflag"]: (r["weighted_median_price"], r["total_weight"])
        for r in agg_weighted_median(spark, SF).collect()
    }
    assert got == expected


def test_pit_audit_total_coverage(spark):
    """Every source event must resolve to EXACTLY one history version
    (the intervals partition each entity's timeline), and the
    consistent/leakage split must cover all matches."""
    from target_s3_parquet_spark.operators._util import t
    from target_s3_parquet_spark.operators.pipeline import (
        cdc_scd2_point_in_time_audit,
    )

    row = cdc_scd2_point_in_time_audit(spark, SF).collect()[0]
    n_orders = t(spark, SF, "orders").count()
    assert row["n_orders_matched"] == n_orders
    assert row["n_consistent"] + row["n_leakage"] == n_orders
    assert row["n_consistent"] > 0


def test_stream_scd2_converges_to_batch(spark):
    """The incremental (foreachBatch) SCD2 table must be IDENTICAL to
    the one-shot batch build — convergence of incremental maintenance
    to batch semantics, checked Spark-vs-Spark (the oracle pins both
    against DuckDB separately)."""
    from target_s3_parquet_spark.operators.pipeline import cdc_scd2_history
    from target_s3_parquet_spark.streaming.stream_queries import (
        stream_cdc_scd2,
    )

    batch = sorted(
        tuple(r) for r in cdc_scd2_history(spark, SF).collect()
    )
    streamed = sorted(
        tuple(r) for r in stream_cdc_scd2(spark, SF).collect()
    )
    assert streamed == batch


def test_ivf_cell_stats_ties_out(spark):
    """Cell sizes must sum to the corpus (every vector lands in exactly
    one cell), shares must sum to ~1e6 (floor rationals), and the
    imbalance factor must be share * K exactly."""
    from target_s3_parquet_spark.operators._util import t
    from target_s3_parquet_spark.operators.similarity import (
        _IVF_K,
        sim_ann_ivf_cell_stats,
    )

    rows = sim_ann_ivf_cell_stats(spark, SF).collect()
    n_corpus = (
        t(spark, SF, "embeddings").filter(f"vec_id >= {_IVF_K}").count()
    )
    total = sum(r["cell_size"] for r in rows)
    assert total == n_corpus
    assert len(rows) <= _IVF_K
    for r in rows:
        assert r["share_scaled"] == r["cell_size"] * 1_000_000 // total
        assert (
            r["imbalance_scaled"]
            == r["cell_size"] * _IVF_K * 1_000_000 // total
        )


def test_emb_dim_stats_vs_numpy(spark):
    """Per-dim integer-grid stats must equal a driver-side numpy
    reference exactly."""
    import numpy as np

    from target_s3_parquet_spark.operators._util import t
    from target_s3_parquet_spark.operators.similarity import emb_dim_stats

    emb = np.stack(
        [
            np.asarray(r["embedding"], dtype=np.float64)
            for r in t(spark, SF, "embeddings").select("embedding").collect()
        ]
    )
    q = np.trunc(emb * 1_000_000.0).astype(np.int64)
    got = {
        r["dim"]: (r["n"], r["sum_q"], r["ssq_q"], r["min_q"], r["max_q"])
        for r in emb_dim_stats(spark, SF).collect()
    }
    for d in range(q.shape[1]):
        col = q[:, d]
        assert got[d + 1] == (
            len(col),
            int(col.sum()),
            int((col.astype(object) ** 2).sum()),
            int(col.min()),
            int(col.max()),
        ), d
