"""Invariant tests for the round-7 operator work: keyed-incremental
SCD2 merge, the suffix-filter zero-length guard, the shared BPE merge
cache, and the widened global rank."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import Window as W
from pyspark.sql import functions as F




def _d(day):
    return datetime.date(1995, 1, day)


@pytest.fixture()
def scd2_w():
    return W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")


SCD2_SCHEMA = (
    "o_custkey long, o_orderpriority string, "
    "o_orderdate date, o_orderkey long"
)


def test_scd2_merge_increment_does_not_rewindow_untouched(spark, scd2_w):  # noqa: F811
    """The r6 design note's fix, pinned: an UNTOUCHED entity's state
    rows must pass through an epoch byte-identical — proven by planting
    a NON-canonical pair (two consecutive change rows with the same
    priority, which any re-window's lag-dedup would collapse) for an
    entity the batch does not touch, and asserting it survives."""
    from target_s3_parquet_spark.streaming.stream_queries import (
        scd2_merge_increment,
    )

    prev = spark.createDataFrame(
        [
            (1, "HIGH", _d(1), 10),
            # entity 2: same priority twice = NOT a canonical change-point
            # table; survives iff the merge never re-windows entity 2.
            (2, "LOW", _d(1), 20),
            (2, "LOW", _d(2), 21),
        ],
        SCD2_SCHEMA,
    )
    batch = spark.createDataFrame([(1, "URGENT", _d(3), 11)], SCD2_SCHEMA)
    out = scd2_merge_increment(prev, batch, scd2_w).collect()
    ent2 = sorted(
        (r.o_orderdate, r.o_orderpriority, r.o_orderkey)
        for r in out
        if r.o_custkey == 2
    )
    assert ent2 == [(_d(1), "LOW", 20), (_d(2), "LOW", 21)], ent2
    ent1 = sorted(
        (r.o_orderdate, r.o_orderpriority) for r in out if r.o_custkey == 1
    )
    assert ent1 == [(_d(1), "HIGH"), (_d(3), "URGENT")], ent1


def test_scd2_merge_increment_dedups_touched_entity(spark, scd2_w):  # noqa: F811
    """A touched entity's batch row with an UNCHANGED priority is a
    non-change and must be dropped by the re-window of that entity."""
    from target_s3_parquet_spark.streaming.stream_queries import (
        scd2_merge_increment,
    )

    prev = spark.createDataFrame([(1, "HIGH", _d(1), 10)], SCD2_SCHEMA)
    batch = spark.createDataFrame(
        [(1, "HIGH", _d(2), 11), (1, "LOW", _d(3), 12)], SCD2_SCHEMA
    )
    out = sorted(
        (r.o_orderdate, r.o_orderpriority)
        for r in scd2_merge_increment(prev, batch, scd2_w).collect()
    )
    assert out == [(_d(1), "HIGH"), (_d(3), "LOW")], out


def test_scd2_merge_increment_first_epoch_no_state(spark, scd2_w):  # noqa: F811
    from target_s3_parquet_spark.streaming.stream_queries import (
        scd2_merge_increment,
    )

    batch = spark.createDataFrame(
        [(1, "HIGH", _d(1), 10), (1, "HIGH", _d(2), 11)], SCD2_SCHEMA
    )
    out = scd2_merge_increment(None, batch, scd2_w).collect()
    assert [(r.o_orderdate, r.o_orderpriority) for r in out] == [
        (_d(1), "HIGH")
    ]


def test_ppjoin_suffix_probe_survives_empty_suffix(spark):  # noqa: F811
    """The ADVICE-flagged latent crash: element_at(suf_a, 0) raises
    INVALID_INDEX_OF_ZERO when len_a == 0. Replicate the guarded probe
    expression shape on a row with an empty suffix and assert it
    evaluates (NULL m, empty filters) instead of raising."""
    df = spark.createDataFrame(
        [(0, [], []), (2, ["a", "b"], ["a", "c"])],
        "len_a int, suf_a array<string>, suf_b array<string>",
    )
    probed = (
        df.withColumn(
            "m",
            F.when(
                F.col("len_a") > 0,
                F.expr("element_at(suf_a, CAST((len_a + 1) DIV 2 AS INT))"),
            ),
        )
        .withColumn("sal", F.expr("size(filter(suf_a, x -> x < m))"))
        .collect()
    )
    by_len = {r.len_a: r for r in probed}
    assert by_len[0].m is None and by_len[0].sal == 0
    assert by_len[2].m == "a" and by_len[2].sal == 0


def test_bpe_merges_cached_per_session(spark):  # noqa: F811
    """The learned merge list must be derived once per (app, sf_dir)
    and be a plain driver-side literal list of the expected shape."""
    from target_s3_parquet_spark.functions.text_analysis import (
        _BPE_ITERS,
        _BPE_MERGES,
        _bpe_learn_merges,
    )

    sf = "/root/testdata/sf0.001"
    m1 = _bpe_learn_merges(spark, sf)
    m2 = _bpe_learn_merges(spark, sf)
    assert m1 is m2  # memo hit, no retraining
    assert len(m1) == _BPE_ITERS
    assert [s for s, _, _ in m1] == list(range(1, _BPE_ITERS + 1))
    assert all(isinstance(b, str) and " " in b for _, b, _ in m1)
    key = (spark.sparkContext.applicationId, sf)
    assert _BPE_MERGES[key] is m1


def test_two_phase_rank_emits_long(spark):  # noqa: F811
    """32-bit global ranks overflow at the scale the prod twins target;
    the helper must emit LongType (ADVICE r6)."""
    from target_s3_parquet_spark.operators._util import two_phase_rank

    df = spark.range(100).withColumnRenamed("id", "v")
    out = two_phase_rank(df, ["v"])
    assert dict(out.dtypes)["rnk"] == "bigint"
    rows = out.orderBy("v").collect()
    assert [r.rnk for r in rows] == list(range(1, 101))


def test_sample_ledger_fresh_and_ordering_front_loads_never_sampled():
    """VERDICT r6 item 5: the generated ledger must cover every
    CORRECTNESS_r*.json artifact in the repo, and queries() must order
    all never-driver-sampled keys before any sampled key so the
    driver's rolling 50-key sample eventually touches every key."""
    import glob
    import json
    import os

    from target_s3_parquet_spark._sample_ledger import LATEST_RED, SAMPLED
    from target_s3_parquet_spark.registry import get_queries

    repo = os.path.join(os.path.dirname(__file__), "..")
    ledger_max = max((r for v in SAMPLED.values() for r in v), default=0)
    expect: dict[str, set[int]] = {}
    for path in sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))):
        rnd = int(path.rsplit("_r", 1)[1].split(".")[0])
        if rnd > ledger_max:
            # the driver writes CORRECTNESS_r{N}.json AFTER the round
            # that generated this ledger — a newer artifact is not
            # staleness, it is the next round's regen input (the
            # builder's key-addition checklist regenerates it)
            continue
        for key in json.load(open(path)):
            expect.setdefault(key, set()).add(rnd)
    # ledger is exactly the union of the artifacts it was built from
    # (a ledger missing any artifact <= its own max round IS stale)
    assert {k: set(v) for k, v in SAMPLED.items()} == expect

    keys = list(get_queries())
    # latest-red keys (most recent driver record not fully green) form
    # a strict prefix — their fixes are in-tree and the next driver
    # sample must self-correct the external record (VERDICT r8 item 1)
    n_red = sum(1 for k in keys if k in LATEST_RED)
    assert all(k in LATEST_RED for k in keys[:n_red])
    assert not any(k in LATEST_RED for k in keys[n_red:])
    latest = [max(SAMPLED.get(k, ()), default=0) for k in keys[n_red:]]
    # beyond the red prefix: never-sampled (latest 0) keys lead, then
    # the round of the most recent driver sample is non-decreasing —
    # pure least-recently-sampled (VERDICT r9 item 1), so the rolling
    # 50-key window always refreshes the stalest external evidence
    assert latest == sorted(latest), (
        "ordering must ascend by most-recent-sample round"
    )


def test_opq_permutation_is_balanced_bijection(spark):  # noqa: F811
    """The OPQ LPT allocation must be a bijection dims -> (sub, slot)
    with every subspace receiving exactly one dimension from each
    variance block (the balance property that IS the operator)."""
    from target_s3_parquet_spark.operators.similarity import (
        _EMB_DIM,
        _PQ_DSUB,
        _PQ_M,
        _opq_perm_subvectors,
    )

    pv = _opq_perm_subvectors(spark, "/root/testdata/sf0.001")
    rows = pv.collect()
    by_vec: dict = {}
    for r in rows:
        by_vec.setdefault(r.vec_id, {})[r.sub] = list(r.sv)
    for vec_id, subs in list(by_vec.items())[:5]:
        # every vector regroups into exactly M subspaces of DSUB dims
        assert sorted(subs) == list(range(_PQ_M)), (vec_id, sorted(subs))
        assert all(len(sv) == _PQ_DSUB for sv in subs.values())
        # bijection: the multiset of values is preserved (permutation
        # moves doubles, never computes) — compare against the raw row
        flat = sorted(x for sv in subs.values() for x in sv)
        assert len(flat) == _EMB_DIM
    # cross-check one vector's values against the raw embedding
    import pyspark.sql.functions as F

    from target_s3_parquet_spark.operators._util import t
    from target_s3_parquet_spark.operators.similarity import _vec_d

    vid = min(by_vec)
    raw = (
        t(spark, "/root/testdata/sf0.001", "embeddings")
        .filter(F.col("vec_id") == vid)
        .select(_vec_d(F.col("embedding")).alias("v"))
        .collect()[0]
        .v
    )
    flat = sorted(x for sv in by_vec[vid].values() for x in sv)
    assert flat == sorted(raw)


def test_opq_distortion_gain_is_single_sane_row(spark):  # noqa: F811
    from target_s3_parquet_spark.registry import get_queries

    row = get_queries()["emb_opq_distortion_gain"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert len(row) == 1
    r = row[0]
    assert r.sum_sq_err_pq > 0 and r.sum_sq_err_opq > 0
    assert abs(r.err_ratio - r.sum_sq_err_opq / r.sum_sq_err_pq) < 1e-12


SF001 = "/root/testdata/sf0.001"


def test_kmv_sketch_invariants(spark):  # noqa: F811
    from target_s3_parquet_spark.operators.aggregates import _KMV_K
    from target_s3_parquet_spark.registry import get_queries

    rows = get_queries()["agg_kmv_distinct_union"](spark, SF001).collect()
    by_type = {r.event_type: r for r in rows}
    assert "__union__" in by_type
    u = by_type["__union__"]
    for r in rows:
        assert r.k_eff <= _KMV_K
        # KMV with k=32 has relative sigma ~1/sqrt(k-1) ~ 0.18; a 3x
        # band catches wiring bugs (off-by-2^52, wrong order statistic)
        # without flaking on estimator variance
        assert 0.33 < r.err_ratio < 3.0, (r.event_type, r.err_ratio)
        # each group's distinct users are a subset of the union's
        assert r.n_exact <= u.n_exact


def test_bloom_fpp_invariants(spark):  # noqa: F811
    from target_s3_parquet_spark.operators.aggregates import (
        _BLOOM_J,
        _BLOOM_M,
    )
    from target_s3_parquet_spark.registry import get_queries

    r = get_queries()["agg_bloom_fpp_measured"](spark, SF001).collect()[0]
    assert r.m_bits == _BLOOM_M and r.j_hashes == _BLOOM_J
    assert 0 < r.n_bits_set <= min(_BLOOM_M, r.n_members * _BLOOM_J)
    assert 0 <= r.n_false_pos <= r.n_probes
    assert abs(r.fpp_measured - r.n_false_pos / r.n_probes) < 1e-12


def test_chi2_and_gini_invariants(spark):  # noqa: F811
    from target_s3_parquet_spark.registry import get_queries

    qs = get_queries()
    c = qs["ab_test_chi2_independence"](spark, SF001).collect()[0]
    assert c.chi2 >= 0
    assert c.dof == (c.n_langs - 1) * (c.n_sources - 1)

    g = qs["feature_split_gini"](spark, SF001).collect()
    assert len(g) == 4
    n = g[0].n_left + g[0].n_right
    for r in g:
        assert r.n_left + r.n_right == n
        assert r.n_pos_left <= r.n_left and r.n_pos_right <= r.n_right
        # binary-label weighted gini is bounded by 0.5
        assert 0.0 <= r.gini_split <= 0.5


def test_spearman_and_auc_invariants(spark):  # noqa: F811
    from target_s3_parquet_spark.registry import get_queries

    qs = get_queries()
    s = qs["agg_corr_spearman"](spark, SF001).collect()[0]
    # quantity and extendedprice are positively related by construction
    assert -1.0 <= s.rho_spearman <= 1.0
    assert s.n_rows > 0

    a = qs["eval_auc_rank_sum"](spark, SF001).collect()[0]
    assert 0.0 <= a.auc <= 1.0
    assert a.u_stat2 <= 2.0 * a.n_pos * a.n_neg
    assert abs(a.auc - a.u_stat2 / (2.0 * a.n_pos * a.n_neg)) < 1e-12


def test_theta_sketch_invariants(spark):  # noqa: F811
    from target_s3_parquet_spark.operators.aggregates import _KMV_K
    from target_s3_parquet_spark.registry import get_queries

    r = get_queries()["agg_theta_sketch_intersect"](spark, SF001).collect()[0]
    assert 0 < r.k_eff <= _KMV_K
    assert 0 <= r.k_inter <= r.k_eff
    assert r.n_inter_exact <= r.n_union_exact
    assert abs(r.jaccard_est - r.k_inter / r.k_eff) < 1e-12
    # below-capacity sketch degenerates to the exact union count
    if r.k_eff < _KMV_K:
        assert r.union_est == float(r.n_union_exact)


def test_bfs_hops_invariants(spark):  # noqa: F811
    from target_s3_parquet_spark.registry import get_queries
    from target_s3_parquet_spark.session import load_table

    rows = get_queries()["graph_shortest_path_bfs"](spark, SF001).collect()
    hops = {r.nationkey: r.hop for r in rows}
    seeds = {
        r.n_nationkey
        for r in load_table(spark, SF001, "nation")
        .filter("n_regionkey = 0")
        .collect()
    }
    # every seed is at hop 0, and hop levels are contiguous from 0
    assert seeds <= set(hops) and all(hops[s] == 0 for s in seeds)
    levels = sorted(set(hops.values()))
    assert levels == list(range(len(levels)))


def test_t_closeness_invariants(spark):  # noqa: F811
    from target_s3_parquet_spark.registry import get_queries

    rows = get_queries()["privacy_t_closeness_audit"](spark, SF001).collect()
    assert rows
    for r in rows:
        # EMD over normalized CDFs is bounded by 1 after the (m-1) norm
        assert 0.0 <= r.t_emd <= 1.0, (r.c_nationkey, r.c_mktsegment, r.t_emd)
        assert r.n_class > 0


def test_benford_invariants(spark):  # noqa: F811
    from target_s3_parquet_spark.registry import get_queries

    rows = get_queries()["dq_benford_digit_audit"](spark, SF001).collect()
    assert sorted(r.digit for r in rows) == list(range(1, 10))
    assert abs(sum(r.p_benford for r in rows) - 1.0) < 1e-12
    assert abs(sum(r.p_observed for r in rows) - 1.0) < 1e-9
    assert all(r.chi2_term >= 0 for r in rows)


def test_acf_and_recursive_invariants(spark):  # noqa: F811
    from target_s3_parquet_spark.registry import get_queries

    qs = get_queries()
    acf = qs["ts_acf_lags"](spark, SF001).collect()
    assert sorted(r.lag for r in acf) == [1, 2, 3, 7]
    for r in acf:
        assert -1.0 <= r.acf <= 1.0 and r.n_pairs > 0

    roll = qs["sql_recursive_hierarchy_rollup"](spark, SF001).collect()
    by_node = {r.node_id: r for r in roll}
    assert all(r.node_id < 100000 for r in roll)
    # parent subtree strictly contains child subtrees (digit tree)
    for node, r in by_node.items():
        # single-digit nodes are their own roots (the walk stops at
        # anc >= 10), so containment only holds for nodes >= 10
        parent = node // 10
        if node >= 10 and parent in by_node:
            p = by_node[parent]
            assert p.n_desc >= r.n_desc
            assert p.subtree_cents >= r.subtree_cents


def test_ks_and_covariance_invariants(spark):  # noqa: F811
    from target_s3_parquet_spark.registry import get_queries

    qs = get_queries()
    k = qs["agg_ks_test_two_sample"](spark, SF001).collect()[0]
    assert 0.0 <= k.ks_d <= 1.0
    assert abs(k.ks_d - k.d_numer / (k.n_a * k.n_b)) < 1e-12

    cov = qs["agg_covariance_matrix"](spark, SF001).collect()
    assert len(cov) == 10
    m = {(r.var_x, r.var_y): r.cov for r in cov}
    # diagonal entries are variances: non-negative
    for v in ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]:
        assert m[(v, v)] >= 0
    # Cauchy-Schwarz on a sample pair
    assert (
        m[("l_quantity", "l_extendedprice")] ** 2
        <= m[("l_quantity", "l_quantity")]
        * m[("l_extendedprice", "l_extendedprice")] * (1 + 1e-9)
    )


def test_collocation_and_balanced_sample(spark):  # noqa: F811
    from target_s3_parquet_spark.registry import get_queries
    from target_s3_parquet_spark.session import load_table

    qs = get_queries()
    top = qs["text_collocation_lift_topk"](spark, SF001).collect()
    assert 0 < len(top) <= 50
    assert all(t.c12 >= 5 and t.lift > 0 for t in top)
    # descending lift with the declared tie-break
    lifts = [t.lift for t in top]
    assert lifts == sorted(lifts, reverse=True)

    bal = qs["sample_balanced_class"](spark, SF001).collect()
    from collections import Counter
    by_lang = Counter(r.lang for r in bal)
    n_min = min(
        r.cnt
        for r in load_table(spark, SF001, "documents")
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    )
    assert set(by_lang.values()) == {n_min}


def test_stream_kmv_chunk_invariance(spark):  # noqa: F811
    """The streaming sketch must equal the batch sketch's per-group
    rows exactly — mergeability means chunking cannot matter."""
    from target_s3_parquet_spark.registry import get_queries

    qs = get_queries()
    stream = {
        r.event_type: (r.k_eff, r.kmv_est)
        for r in qs["stream_kmv_distinct"](spark, SF001).collect()
    }
    batch = {
        r.event_type: (r.k_eff, r.kmv_est)
        for r in qs["agg_kmv_distinct_union"](spark, SF001).collect()
        if r.event_type != "__union__"
    }
    assert set(stream) == set(batch)
    for et, (k_eff, est) in batch.items():
        assert stream[et][0] == k_eff, et
        # est trees agree exactly when the sketch is at capacity; the
        # below-capacity branch uses n_exact (batch) vs k_eff (stream),
        # which coincide when every distinct hash is in the sketch
        assert stream[et][1] == est, et


def test_pseudonymize_matches_raw_rollup(spark):  # noqa: F811
    """Referential integrity through the pseudonym: the segment rollup
    over tokens must equal the raw-key rollup."""
    from target_s3_parquet_spark.registry import get_queries
    from target_s3_parquet_spark.session import load_table

    got = {
        r.c_mktsegment: (r.n_customers, r.n_orders)
        for r in get_queries()["pii_pseudonymize_hmac"](
            spark, SF001
        ).collect()
    }
    c = load_table(spark, SF001, "customer")
    o = load_table(spark, SF001, "orders")
    raw = {
        r.c_mktsegment: (r.n_customers, r.n_orders)
        for r in c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_mktsegment")
        .agg(
            F.countDistinct("c_custkey").alias("n_customers"),
            F.count("o_orderkey").alias("n_orders"),
        )
        .collect()
    }
    assert got == raw


def test_sql_vars_and_scripting(spark):  # noqa: F811
    from target_s3_parquet_spark.registry import get_queries
    from target_s3_parquet_spark.session import load_table

    qs = get_queries()
    rows = qs["sql_session_variables"](spark, SF001).collect()
    assert rows and all(r.n_above > 0 for r in rows)

    s = qs["sql_scripting_control_flow"](spark, SF001).collect()[0]
    o = load_table(spark, SF001, "orders").agg(
        F.min("o_totalprice").alias("mn"), F.max("o_totalprice").alias("mx")
    ).collect()[0]
    # the loop's postcondition: lo = mn * 2^k, lo <= mx < lo * 2
    assert s.final_value == o.mn * (2.0 ** s.doublings)
    assert s.final_value <= o.mx < s.final_value * 2
    # scripting conf restored to its pre-key effective value (the
    # Spark 4.1 session default is 'true'; the key's snapshot/restore
    # must hand back exactly what the no-default get saw)
    assert spark.conf.get("spark.sql.scripting.enabled") == "true"


def test_vacuum_and_pairing_invariants(spark):  # noqa: F811
    import pytest as _pytest

    from target_s3_parquet_spark.registry import get_queries

    qs = get_queries()
    rows = {r.phase: r for r in qs["txlog_vacuum_retention"](spark, SF001).collect()}
    assert rows["pre"].n_rows == rows["post"].n_rows
    assert rows["pre"].total == rows["post"].total
    assert rows["pre"].n_dirs_on_disk == 5 and rows["post"].n_dirs_on_disk == 1

    aud = qs["emb_text_pairing_audit"](spark, SF001).collect()
    r0 = aud[0]
    # 1:1 pairing on this corpus: every doc embedded, every vector used
    assert r0.n_paired == r0.n_docs == r0.n_vecs
    assert sum(r.n_pairs for r in aud) == r0.n_paired


def test_vacuum_breaks_old_time_travel(spark):  # noqa: F811
    """After vacuum(retain=1), reading a pre-compaction version must
    fail (its dirs are gone) while the latest version stays intact."""
    import tempfile

    import pytest as _pytest

    from target_s3_parquet_spark.session import load_table
    from target_s3_parquet_spark.sources.txlog import (
        commit,
        latest_version,
        optimize_compact,
        read_table,
        vacuum,
    )

    o = load_table(spark, SF001, "orders").limit(100)
    with tempfile.TemporaryDirectory(prefix="vac_t_") as tmp:
        root = f"{tmp}/tbl"
        commit(o, root)
        commit(o, root)
        assert latest_version(root) == 1  # two commits
        optimize_compact(spark, root, target_partitions=1)
        removed = vacuum(root, retain_versions=1, retention_seconds=0)
        assert removed
        assert read_table(spark, root).count() == 200
        with _pytest.raises(Exception):
            read_table(spark, root, version=0).collect()


def test_anova_hapax_funnel_invariants(spark):  # noqa: F811
    from target_s3_parquet_spark.registry import get_queries

    qs = get_queries()
    a = qs["ab_test_anova_f"](spark, SF001).collect()[0]
    assert a.f_stat >= 0 and a.k_groups == 7 and a.n_rows > 0

    hx = qs["text_hapax_ratio_by_lang"](spark, SF001).collect()
    for r in hx:
        assert r.hapax <= r.vocab <= r.n_tokens
        assert 0.0 <= r.hapax_vocab_ratio <= 1.0
        assert r.hapax_token_ratio <= r.hapax_vocab_ratio + 1e-12

    fn = {r.stage: r for r in qs["funnel_time_to_convert"](spark, SF001).collect()}
    assert set(fn) == {"view->click", "click->purchase"}
    for r in fn.values():
        # discrete quantiles are actual observed gaps, monotone, >= 0
        assert 0 <= r.p25_us <= r.p50_us <= r.p90_us
        assert r.n_users > 0
