"""Brute-force / invariant pins for the round-9 breadth keys:
categorical effect size (Cramér's V), threshold average precision,
robust trimmed/winsorized means, RRF hybrid-search fusion, additive
seasonal decomposition, and the log-free numeric drift divergences."""

from __future__ import annotations

import datetime
import math
import os
import random

from tests.conftest import SF_SMALL


def test_cramers_v_matches_bruteforce(spark, tmp_path):
    """chi2 / phi2 / V / bias-corrected V vs direct contingency math on
    a small customer fixture — including EMPTY grid cells, which must
    contribute their expected counts."""
    from target_s3_parquet_spark.operators.aggregates import (
        agg_cramers_v_effect_size,
    )

    rng = random.Random(9)
    segs = ["AUTOMOBILE", "BUILDING", "FURNITURE"]
    rows = []
    for i in range(200):
        seg = rng.choice(segs)
        # nation depends on segment so V > 0; nation 3 never pairs with
        # FURNITURE -> guaranteed empty cell
        nat = rng.choice([0, 1, 2] if seg == "FURNITURE" else [0, 1, 2, 3])
        rows.append((i, seg, nat))
    sf = str(tmp_path / "sf_cv")
    spark.createDataFrame(
        rows, "c_custkey long, c_mktsegment string, c_nationkey long"
    ).coalesce(1).write.parquet(os.path.join(sf, "customer.parquet"))

    got = agg_cramers_v_effect_size(spark, sf).collect()[0]

    from collections import Counter

    o = Counter((seg, nat) for _, seg, nat in rows)
    rlv = sorted({seg for _, seg, _ in rows})
    clv = sorted({nat for _, _, nat in rows})
    n = len(rows)
    rt = {s: sum(o[(s, c)] for c in clv) for s in rlv}
    ct = {c: sum(o[(s, c)] for s in rlv) for c in clv}
    chi2 = sum(
        (o[(s, c)] - rt[s] * ct[c] / n) ** 2 / (rt[s] * ct[c] / n)
        for s in rlv
        for c in clv
    )
    r, c_ = len(rlv), len(clv)
    assert (got.n, got.r_levels, got.c_levels) == (n, r, c_)
    assert got.dof == (r - 1) * (c_ - 1)
    assert abs(got.chi2 - chi2) < 1e-9
    phi2 = chi2 / n
    assert abs(got.phi2 - phi2) < 1e-12
    assert abs(got.cramers_v - math.sqrt(phi2 / min(r - 1, c_ - 1))) < 1e-12
    phi2c = max(0.0, phi2 - (r - 1) * (c_ - 1) / (n - 1))
    rc = r - (r - 1) ** 2 / (n - 1)
    cc = c_ - (c_ - 1) ** 2 / (n - 1)
    assert (
        abs(got.cramers_v_corrected - math.sqrt(phi2c / min(rc - 1, cc - 1)))
        < 1e-12
    )


def test_average_precision_matches_sklearn_definition(spark, tmp_path):
    """AP vs the direct Σ (R_k − R_{k-1})·P_k over distinct descending
    thresholds (sklearn's average_precision_score), on a tie-heavy
    fixture so the per-threshold form actually differs from naive
    per-row AP."""
    from target_s3_parquet_spark.operators.aggregates import (
        eval_average_precision,
    )

    rng = random.Random(41)
    rows = [
        (
            i,
            float(rng.choice([10.0, 20.0, 30.0, 40.0, 50.0])),  # heavy ties
            rng.choice(["1-URGENT", "3-MEDIUM", "5-LOW", "2-HIGH"]),
        )
        for i in range(150)
    ]
    sf = str(tmp_path / "sf_ap")
    spark.createDataFrame(
        rows, "o_orderkey long, o_totalprice double, o_orderpriority string"
    ).coalesce(1).write.parquet(os.path.join(sf, "orders.parquet"))

    got = eval_average_precision(spark, sf).collect()[0]

    labeled = [
        (s, 1 if p in ("1-URGENT", "2-HIGH") else 0) for _, s, p in rows
    ]
    pos_total = sum(y for _, y in labeled)
    ap = 0.0
    cum_p = cum_t = 0
    for s in sorted({s for s, _ in labeled}, reverse=True):
        p_s = sum(y for v, y in labeled if v == s)
        t_s = sum(1 for v, _ in labeled if v == s)
        cum_p += p_s
        cum_t += t_s
        ap += (p_s / pos_total) * (cum_p / cum_t)
    assert (got.n, got.n_pos) == (len(rows), pos_total)
    assert got.n_thresholds == len({s for s, _ in labeled})
    assert abs(got.average_precision - ap) < 1e-12


def test_trimmed_winsorized_matches_bruteforce(spark, tmp_path):
    """10% two-sided trimmed and winsorized means vs sorted-list brute
    force, with outliers planted at both tails so the robust means
    visibly diverge from the plain mean."""
    from target_s3_parquet_spark.operators.aggregates import (
        agg_trimmed_winsorized_mean,
    )

    rng = random.Random(5)
    vals = [round(rng.uniform(100, 200), 2) for _ in range(44)]
    vals += [1.0, 2.0, 3.0, 9000.0, 9500.0, 9999.0]  # tails
    rows = [
        (i, "1-URGENT", v) for i, v in enumerate(vals)
    ]
    sf = str(tmp_path / "sf_tw")
    spark.createDataFrame(
        rows, "o_orderkey long, o_orderpriority string, o_totalprice double"
    ).coalesce(1).write.parquet(os.path.join(sf, "orders.parquet"))

    got = agg_trimmed_winsorized_mean(spark, sf).collect()[0]

    xs = sorted(vals)
    n = len(xs)
    k = n // 10
    mid = xs[k : n - k]
    trimmed = sum(mid) / (n - 2 * k)
    winsor = (k * xs[k] + sum(mid) + k * xs[n - k - 1]) / n
    assert (got.n, got.k) == (n, k)
    assert abs(got.mean - sum(xs) / n) < 1e-9
    assert abs(got.trimmed_mean - trimmed) < 1e-9
    assert abs(got.winsorized_mean - winsor) < 1e-9
    # the planted tails must move the plain mean away from the robust pair
    assert abs(got.mean - got.trimmed_mean) > 100.0


def test_rrf_fusion_consistency(spark):
    """On the real sf0.001 tables: RRF scores decompose exactly into
    1/(60+r) terms, ranks are valid (1..100, 0 = absent from that
    arm's top-100), ordering is (rrf DESC, doc_id), and the lexical
    arm agrees with search_bm25_topk's published top-10."""
    from target_s3_parquet_spark.functions.scalars import search_bm25_topk
    from target_s3_parquet_spark.operators.similarity import (
        search_rrf_fusion,
    )

    rows = search_rrf_fusion(spark, SF_SMALL).collect()
    assert len(rows) == 20
    prev = None
    for r in rows:
        want = (1.0 / (60 + r.lex_rank) if r.lex_rank else 0.0) + (
            1.0 / (60 + r.vec_rank) if r.vec_rank else 0.0
        )
        assert r.rrf_score == want
        assert 0 <= r.lex_rank <= 100 and 0 <= r.vec_rank <= 100
        assert r.lex_rank > 0 or r.vec_rank > 0
        key = (-r.rrf_score, r.doc_id)
        assert prev is None or key > prev
        prev = key
    # lexical-arm parity: rank r in the fused table == position in the
    # standalone BM25 top-10 (same scoring, same tie-break)
    bm = [r.doc_id for r in search_bm25_topk(spark, SF_SMALL).collect()]
    lex_rank = {r.doc_id: r.lex_rank for r in rows}
    for pos, doc in enumerate(bm, 1):
        if doc in lex_rank and lex_rank[doc] > 0:
            assert lex_rank[doc] == pos


def test_seasonal_decompose_matches_bruteforce(spark, tmp_path):
    """Per-dow seasonal indices vs direct centered-MA decomposition on
    a planted weekly pattern, with a calendar GAP whose straddling
    windows must be excluded (the contiguity predicate, not the row
    frame, decides validity)."""
    from target_s3_parquet_spark.operators.timeseries import (
        ts_seasonal_decompose_ma,
    )

    base = datetime.date(1995, 1, 1)
    season = [100, 200, 300, 400, 500, 600, 700]  # by d % 7
    rows = []
    for d in range(60):
        if d == 30:  # calendar gap
            continue
        amount = 1000 + 10 * d + season[d % 7]  # trend + weekly pattern
        rows.append((d, base + datetime.timedelta(days=d), float(amount)))
    sf = str(tmp_path / "sf_sd")
    spark.createDataFrame(
        [(i, dt, v) for i, (_, dt, v) in enumerate(rows)],
        "o_orderkey long, o_orderdate date, o_totalprice double",
    ).coalesce(1).write.parquet(os.path.join(sf, "orders.parquet"))

    got = {
        r.dow: r for r in ts_seasonal_decompose_ma(spark, sf).collect()
    }

    series = {d: int(round(v * 100)) for d, _, v in rows}
    detr = {}
    for d in series:
        win = [series.get(d + o) for o in range(-3, 4)]
        if any(w is None for w in win):
            continue  # edge or gap-straddling window
        detr[d] = series[d] - sum(win) / 7.0
    by_dow = {}
    for d, v in detr.items():
        by_dow.setdefault(d % 7, []).append(v)
    assert set(got) == set(by_dow)
    for dow, vs in by_dow.items():
        r = got[dow]
        assert r.n_valid == len(vs)
        seas = sum(vs) / len(vs)
        assert abs(r.seasonal_cents - seas) < 1e-6
        mar = sum(abs(v - seas) for v in vs) / len(vs)
        assert abs(r.mean_abs_residual_cents - mar) < 1e-6
    # days 27..33 straddle the gap at 30 -> none may contribute
    assert sum(r.n_valid for r in got.values()) == len(detr)
    assert all(d not in detr for d in range(28, 34))


def test_numeric_drift_chi2_matches_bruteforce(spark, tmp_path):
    """chi2 divergence / triangular discrimination / TV distance vs
    direct per-bin arithmetic, including a zero-reference bin that
    must be excluded from chi2 and counted in n_bins_zero_ref."""
    from target_s3_parquet_spark.operators.pipeline import (
        dq_numeric_drift_chi2,
    )

    rng = random.Random(13)
    rows = []
    for i in range(400):
        day = rng.randint(1, 30)
        side = 0 if day <= 15 else 1
        # side 1 shifts upward; bin 12 (value >= 300) only on side 1
        v = rng.uniform(0, 250) if side == 0 else rng.uniform(50, 400)
        rows.append(
            (i, datetime.datetime(2024, 1, day, 12, 0, 0), float(v))
        )
    sf = str(tmp_path / "sf_drift")
    spark.createDataFrame(
        rows, "event_id long, ts timestamp, value double"
    ).coalesce(1).write.parquet(os.path.join(sf, "events.parquet"))

    got = dq_numeric_drift_chi2(spark, sf).collect()[0]

    from collections import Counter

    a, b = Counter(), Counter()
    for _, ts, v in rows:
        binno = min(int(v // 25), 12)
        (a if ts.day <= 15 else b)[binno] += 1
    bins = sorted(set(a) | set(b))
    na, nb = sum(a.values()), sum(b.values())
    chi2 = sum(
        (b[x] / nb - a[x] / na) ** 2 / (a[x] / na)
        for x in bins
        if a[x] > 0
    )
    tri = sum(
        (a[x] / na - b[x] / nb) ** 2 / (a[x] / na + b[x] / nb)
        for x in bins
        if a[x] + b[x] > 0
    )
    tv = sum(abs(a[x] / na - b[x] / nb) for x in bins) / 2
    assert (got.na, got.nb, got.n_bins) == (na, nb, len(bins))
    assert got.n_bins_zero_ref == sum(1 for x in bins if a[x] == 0)
    assert got.n_bins_zero_ref >= 1  # the planted high bin
    assert abs(got.chi2_divergence - chi2) < 1e-9
    assert abs(got.triangular_disc - tri) < 1e-9
    assert abs(got.tv_dist - tv) < 1e-12
