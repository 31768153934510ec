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


def test_mann_whitney_u_matches_bruteforce(spark, tmp_path):
    """U and tie-corrected z vs direct pair counting on a tie-heavy
    fixture (scipy's asymptotic method without continuity
    correction)."""
    from target_s3_parquet_spark.operators.aggregates import (
        ab_test_mann_whitney_u,
    )

    rng = random.Random(23)
    rows = []
    for i in range(160):
        flag = rng.choice(["A", "R", "N"])  # N must be ignored
        q = float(rng.randint(1, 9) + (1 if flag == "A" else 0))
        rows.append((i, flag, q))
    sf = str(tmp_path / "sf_mwu")
    spark.createDataFrame(
        rows, "l_orderkey long, l_returnflag string, l_quantity double"
    ).coalesce(1).write.parquet(os.path.join(sf, "lineitem.parquet"))

    got = ab_test_mann_whitney_u(spark, sf).collect()[0]

    a = [q for _, f, q in rows if f == "A"]
    b = [q for _, f, q in rows if f == "R"]
    u = sum(
        1.0 if x > y else (0.5 if x == y else 0.0) for x in a for y in b
    )
    n = len(a) + len(b)
    from collections import Counter

    cnt = Counter(a + b)
    tie3 = sum(t**3 - t for t in cnt.values())
    var = len(a) * len(b) * (n**3 - n - tie3) / (12 * n * (n - 1))
    z = (u - len(a) * len(b) / 2) / math.sqrt(var)
    assert (got.n_a, got.n_b) == (len(a), len(b))
    assert got.u_stat == u
    assert abs(got.var_u - var) < 1e-6
    assert abs(got.z_score - z) < 1e-9


def test_confusion_metrics_match_bruteforce(spark, tmp_path):
    """All six derived metrics vs direct confusion-cell arithmetic."""
    from target_s3_parquet_spark.operators.aggregates import (
        eval_confusion_matrix_metrics,
    )

    rng = random.Random(31)
    rows = [
        (
            i,
            float(rng.uniform(50000, 250000)),
            rng.choice(["1-URGENT", "2-HIGH", "3-MEDIUM", "5-LOW"]),
        )
        for i in range(180)
    ]
    sf = str(tmp_path / "sf_cm")
    spark.createDataFrame(
        rows, "o_orderkey long, o_totalprice double, o_orderpriority string"
    ).coalesce(1).write.parquet(os.path.join(sf, "orders.parquet"))

    got = eval_confusion_matrix_metrics(spark, sf).collect()[0]

    tp = fp = fn = tn = 0
    for _, s, p in rows:
        yhat = 1 if s >= 150000.0 else 0
        y = 1 if p in ("1-URGENT", "2-HIGH") else 0
        tp += y * yhat
        fp += (1 - y) * yhat
        fn += y * (1 - yhat)
        tn += (1 - y) * (1 - yhat)
    assert (got.tp, got.fp, got.fn, got.tn) == (tp, fp, fn, tn)
    assert abs(got.accuracy - (tp + tn) / len(rows)) < 1e-12
    assert abs(got.precision_ - tp / (tp + fp)) < 1e-12
    assert abs(got.recall_ - tp / (tp + fn)) < 1e-12
    assert abs(got.f1 - 2 * tp / (2 * tp + fp + fn)) < 1e-12
    assert (
        abs(
            got.balanced_accuracy
            - (tp / (tp + fn) + tn / (tn + fp)) / 2
        )
        < 1e-12
    )
    mcc = (tp * tn - fp * fn) / math.sqrt(
        (tp + fp) * (tp + fn) * (tn + fp) * (tn + fn)
    )
    assert abs(got.mcc - mcc) < 1e-12


def test_simpson_diversity_matches_bruteforce(spark, tmp_path):
    """Unbiased Simpson / inverse-Simpson / Berger-Parker vs direct
    token counting."""
    from target_s3_parquet_spark.functions.text_analysis import (
        vocab_simpson_diversity,
    )

    docs = [
        (0, "the cat sat on the mat"),
        (1, "the dog ate the bone and the cat"),
        (2, "a cat a dog a bird"),
    ]
    sf = str(tmp_path / "sf_simp")
    spark.createDataFrame(docs, "doc_id long, text string").coalesce(
        1
    ).write.parquet(os.path.join(sf, "documents.parquet"))

    got = vocab_simpson_diversity(spark, sf).collect()[0]

    import re
    from collections import Counter

    cnt = Counter(
        tok
        for _, txt in docs
        for tok in re.split("[^a-z]+", txt.lower())
        if tok
    )
    n = sum(cnt.values())
    lam = sum(c * (c - 1) for c in cnt.values()) / (n * (n - 1))
    assert (got.n_tokens, got.vocab_size) == (n, len(cnt))
    assert abs(got.simpson_lambda - lam) < 1e-12
    assert abs(got.simpson_diversity - (1 - lam)) < 1e-12
    assert abs(got.effective_vocab - n * n / sum(c * c for c in cnt.values())) < 1e-12
    assert abs(got.berger_parker_dominance - max(cnt.values()) / n) < 1e-12


def test_hhi_concentration_matches_bruteforce(spark, tmp_path):
    """HHI panel vs direct share arithmetic on planted revenue."""
    from target_s3_parquet_spark.operators.pipeline import (
        agg_hhi_concentration,
    )

    rng = random.Random(3)
    custs = [(c, c % 4) for c in range(20)]  # 4 nations
    orders = [
        (i, rng.choice(range(20)), round(rng.uniform(100, 9000), 2))
        for i in range(120)
    ]
    sf = str(tmp_path / "sf_hhi")
    spark.createDataFrame(
        custs, "c_custkey long, c_nationkey long"
    ).coalesce(1).write.parquet(os.path.join(sf, "customer.parquet"))
    spark.createDataFrame(
        orders, "o_orderkey long, o_custkey long, o_totalprice double"
    ).coalesce(1).write.parquet(os.path.join(sf, "orders.parquet"))

    got = agg_hhi_concentration(spark, sf).collect()[0]

    nation_of = dict(custs)
    rev = {}
    for _, cust, price in orders:
        cents = int(round(price * 100))
        rev[nation_of[cust]] = rev.get(nation_of[cust], 0) + cents
    total = sum(rev.values())
    hhi = sum(r * r for r in rev.values()) / total**2
    k = len(rev)
    assert got.n_groups == k
    assert abs(got.hhi - hhi) < 1e-15
    assert abs(got.hhi_normalized - (hhi - 1 / k) / (1 - 1 / k)) < 1e-12
    assert abs(got.effective_n - 1 / hhi) < 1e-9
    assert abs(got.top_share - max(rev.values()) / total) < 1e-15


def test_forecast_eval_naive_matches_bruteforce(spark, tmp_path):
    """WAPE / MAE / bias / MASE vs direct arithmetic on a planted
    series with a gap: evaluation days require BOTH lag-7 and lag-1."""
    from target_s3_parquet_spark.operators.timeseries import (
        ts_forecast_eval_naive,
    )

    base = datetime.date(1995, 1, 1)
    rows = []
    series = {}
    for d in range(30):
        if d == 20:  # gap: days 21 (lag-1) and 27 (lag-7) drop out
            continue
        v = 100.0 + 7 * (d % 7) + d  # weekly-ish + trend
        series[d] = int(round(v * 100))
        rows.append((d, base + datetime.timedelta(days=d), v))
    sf = str(tmp_path / "sf_fc")
    spark.createDataFrame(
        [(i, dt, v) for i, (_, dt, v) in enumerate(rows)],
        "o_orderkey long, o_orderdate date, o_totalprice double",
    ).coalesce(1).write.parquet(os.path.join(sf, "orders.parquet"))

    got = ts_forecast_eval_naive(spark, sf).collect()[0]

    ev = [
        d for d in series if d - 7 in series and d - 1 in series
    ]
    sae = sum(abs(series[d] - series[d - 7]) for d in ev)
    se = sum(series[d] - series[d - 7] for d in ev)
    say = sum(abs(series[d]) for d in ev)
    sae1 = sum(abs(series[d] - series[d - 1]) for d in ev)
    assert got.n_eval == len(ev)
    assert 21 not in ev and 27 not in ev
    assert abs(got.wape - sae / say) < 1e-15
    assert abs(got.mae_dollars - sae / len(ev) / 100) < 1e-12
    assert abs(got.bias - se / say) < 1e-15
    assert abs(got.mase_vs_naive1 - sae / sae1) < 1e-15


def test_ndcg_matches_bruteforce(spark, tmp_path):
    """DCG/IDCG/NDCG@10 vs direct computation with ties at the rank-10
    boundary resolved by the deterministic id tie-break."""
    from target_s3_parquet_spark.operators.aggregates import eval_ndcg_at_k

    rng = random.Random(8)
    rows = [
        (
            i,
            float(rng.choice([100.0, 200.0, 300.0])),  # boundary ties
            rng.choice(["1-URGENT", "2-HIGH", "3-MEDIUM", "5-LOW"]),
        )
        for i in range(40)
    ]
    sf = str(tmp_path / "sf_ndcg")
    spark.createDataFrame(
        rows, "o_orderkey long, o_totalprice double, o_orderpriority string"
    ).coalesce(1).write.parquet(os.path.join(sf, "orders.parquet"))

    got = eval_ndcg_at_k(spark, sf).collect()[0]

    gain = {"1-URGENT": 7, "2-HIGH": 3, "3-MEDIUM": 1, "5-LOW": 0}
    disc = [1.0 / math.log2(i + 1) for i in range(1, 11)]
    by_score = sorted(rows, key=lambda r: (-r[1], r[0]))[:10]
    by_gain = sorted(rows, key=lambda r: (-gain[r[2]], r[0]))[:10]
    dcg = sum(gain[r[2]] * disc[i] for i, r in enumerate(by_score))
    idcg = sum(gain[r[2]] * disc[i] for i, r in enumerate(by_gain))
    assert abs(got.dcg_at_10 - dcg) < 1e-12
    assert abs(got.idcg_at_10 - idcg) < 1e-12
    assert abs(got.ndcg_at_10 - dcg / idcg) < 1e-12
    assert got.ndcg_at_10 < 1.0  # the random ranking is not ideal


def test_two_proportion_z_matches_bruteforce(spark, tmp_path):
    """p1/p2/lift/odds-ratio/pooled z vs direct arithmetic."""
    from target_s3_parquet_spark.operators.aggregates import (
        ab_test_two_proportion_z,
    )

    rng = random.Random(55)
    rows = [
        (
            i,
            # arm 0 converts ~30%, arm 1 ~20%
            "purchase"
            if rng.random() < (0.3 if i % 2 == 0 else 0.2)
            else "view",
        )
        for i in range(500)
    ]
    sf = str(tmp_path / "sf_2p")
    spark.createDataFrame(
        rows, "event_id long, event_type string"
    ).coalesce(1).write.parquet(os.path.join(sf, "events.parquet"))

    got = ab_test_two_proportion_z(spark, sf).collect()[0]

    n1 = sum(1 for i, _ in rows if i % 2 == 0)
    c1 = sum(1 for i, t_ in rows if i % 2 == 0 and t_ == "purchase")
    n2 = len(rows) - n1
    c2 = sum(1 for i, t_ in rows if i % 2 == 1 and t_ == "purchase")
    p1, p2 = c1 / n1, c2 / n2
    pp = (c1 + c2) / (n1 + n2)
    z = (p1 - p2) / math.sqrt(pp * (1 - pp) * (1 / n1 + 1 / n2))
    assert (got.n1, got.c1, got.n2, got.c2) == (n1, c1, n2, c2)
    assert abs(got.p1 - p1) < 1e-15 and abs(got.p2 - p2) < 1e-15
    assert abs(got.lift_abs - (p1 - p2)) < 1e-15
    assert abs(got.odds_ratio - (c1 * (n2 - c2)) / (c2 * (n1 - c1))) < 1e-12
    assert abs(got.z_score - z) < 1e-12


def test_cohens_kappa_matches_bruteforce(spark, tmp_path):
    """kappa vs the textbook (p_o - p_e)/(1 - p_e) on planted cells."""
    from target_s3_parquet_spark.operators.aggregates import (
        eval_cohens_kappa,
    )

    rng = random.Random(66)
    rows = [
        (
            i,
            float(rng.uniform(50000, 250000)),
            rng.choice(["1-URGENT", "2-HIGH", "3-MEDIUM", "5-LOW"]),
        )
        for i in range(200)
    ]
    sf = str(tmp_path / "sf_kappa")
    spark.createDataFrame(
        rows, "o_orderkey long, o_totalprice double, o_orderpriority string"
    ).coalesce(1).write.parquet(os.path.join(sf, "orders.parquet"))

    got = eval_cohens_kappa(spark, sf).collect()[0]

    tp = fp = fn = tn = 0
    for _, s, p in rows:
        yhat = 1 if s >= 150000.0 else 0
        y = 1 if p in ("1-URGENT", "2-HIGH") else 0
        tp += y * yhat
        fp += (1 - y) * yhat
        fn += y * (1 - yhat)
        tn += (1 - y) * (1 - yhat)
    n = len(rows)
    po = (tp + tn) / n
    pe = ((tp + fp) * (tp + fn) + (fn + tn) * (fp + tn)) / n**2
    kappa = (po - pe) / (1 - pe)
    assert (got.tp, got.fp, got.fn, got.tn) == (tp, fp, fn, tn)
    assert abs(got.p_observed - po) < 1e-15
    assert abs(got.p_expected - pe) < 1e-15
    assert abs(got.kappa - kappa) < 1e-12


def test_seasonal_decompose_pre_anchor_dates_keep_seven_dows(spark, tmp_path):
    """Review-pass regression pin: orders dated BEFORE the 1995-01-01
    anchor produce negative day indices; plain % would emit dow in
    -6..-1 and split each weekday in two. pmod keeps exactly 7 buckets
    and the per-dow means must match brute force across the anchor."""
    from target_s3_parquet_spark.operators.timeseries import (
        ts_seasonal_decompose_ma,
    )

    base = datetime.date(1995, 1, 1)
    rows = []
    for d in range(-21, 21):  # 3 weeks before + 3 after the anchor
        v = 500.0 + 100 * (((d % 7) + 7) % 7)
        rows.append((d, base + datetime.timedelta(days=d), v))
    sf = str(tmp_path / "sf_preanchor")
    spark.createDataFrame(
        [(i, dt, v) for i, (_, dt, v) in enumerate(rows)],
        "o_orderkey long, o_orderdate date, o_totalprice double",
    ).coalesce(1).write.parquet(os.path.join(sf, "orders.parquet"))

    got = {r.dow: r for r in ts_seasonal_decompose_ma(spark, sf).collect()}

    assert set(got) <= set(range(7)) and len(got) == 7
    series = {d: int(round(v * 100)) for d, _, v in rows}
    by_dow = {}
    for d in series:
        win = [series.get(d + o) for o in range(-3, 4)]
        if any(w is None for w in win):
            continue
        by_dow.setdefault(((d % 7) + 7) % 7, []).append(
            series[d] - sum(win) / 7.0
        )
    for dow, vs in by_dow.items():
        assert got[dow].n_valid == len(vs)
        assert abs(got[dow].seasonal_cents - sum(vs) / len(vs)) < 1e-6


def test_brier_score_matches_bruteforce(spark, tmp_path):
    """Brier + per-class conditionals vs direct arithmetic, including
    the probability cap at price >= 300000."""
    from target_s3_parquet_spark.operators.aggregates import (
        eval_brier_score,
    )

    rng = random.Random(77)
    rows = [
        (
            i,
            float(rng.choice([50000.0, 150000.0, 299999.99, 350000.0])),
            rng.choice(["1-URGENT", "2-HIGH", "3-MEDIUM", "5-LOW"]),
        )
        for i in range(120)
    ]
    sf = str(tmp_path / "sf_brier")
    spark.createDataFrame(
        rows, "o_orderkey long, o_totalprice double, o_orderpriority string"
    ).coalesce(1).write.parquet(os.path.join(sf, "orders.parquet"))

    got = eval_brier_score(spark, sf).collect()[0]

    terms = []
    for _, price, pr in rows:
        p = min(price, 300000.0) / 300000.0
        y = 1 if pr in ("1-URGENT", "2-HIGH") else 0
        terms.append((p, y))
    brier = sum((p - y) ** 2 for p, y in terms) / len(terms)
    pos = [(p - 1) ** 2 for p, y in terms if y == 1]
    neg = [p**2 for p, y in terms if y == 0]
    assert (got.n, got.n_pos) == (len(terms), len(pos))
    assert abs(got.brier_score - brier) < 1e-9
    assert abs(got.brier_pos - sum(pos) / len(pos)) < 1e-9
    assert abs(got.brier_neg - sum(neg) / len(neg)) < 1e-9


def test_runs_test_matches_bruteforce(spark, tmp_path):
    """Runs count / mu / var / z vs direct computation on a planted
    regime-switching series (few runs -> strongly negative z)."""
    from target_s3_parquet_spark.operators.timeseries import (
        ts_runs_test_median,
    )

    base = datetime.date(1995, 1, 1)
    # 15 low days, then 15 high days, interleaved noise in each half
    vals = [100.0 + i for i in range(15)] + [900.0 + i for i in range(15)]
    rows = [
        (d, base + datetime.timedelta(days=d), vals[d]) for d in range(30)
    ]
    sf = str(tmp_path / "sf_runs")
    spark.createDataFrame(
        [(i, dt, v) for i, (_, dt, v) in enumerate(rows)],
        "o_orderkey long, o_orderdate date, o_totalprice double",
    ).coalesce(1).write.parquet(os.path.join(sf, "orders.parquet"))

    got = ts_runs_test_median(spark, sf).collect()[0]

    series = [int(round(v * 100)) for _, _, v in rows]
    med = sorted(series)[(len(series) + 1) // 2 - 1]
    seq = [1 if s > med else 0 for s in series if s != med]
    n1, n2 = sum(seq), len(seq) - sum(seq)
    r = 1 + sum(1 for a, b in zip(seq, seq[1:]) if a != b)
    mu = 2 * n1 * n2 / (n1 + n2) + 1
    var = (
        2 * n1 * n2 * (2 * n1 * n2 - n1 - n2)
        / ((n1 + n2) ** 2 * (n1 + n2 - 1))
    )
    assert (got.n1, got.n2, got.n_runs) == (n1, n2, r)
    assert abs(got.mu_runs - mu) < 1e-12
    assert abs(got.var_runs - var) < 1e-12
    assert abs(got.z_score - (r - mu) / math.sqrt(var)) < 1e-9
    assert got.z_score < -3  # two regimes -> far too few runs


def test_fano_burstiness_counts_zero_days(spark, tmp_path):
    """Fano / burstiness vs brute force with a type that is SILENT on
    most days — zero-count days must enter the variance."""
    from target_s3_parquet_spark.operators.timeseries import (
        ts_fano_burstiness,
    )

    rows = []
    eid = 0
    for day in range(1, 11):  # 10 calendar days (every day has 'view')
        for _ in range(5):
            rows.append((eid, datetime.datetime(2024, 1, day, 9), "view"))
            eid += 1
    for _ in range(30):  # 'burst' fires on ONE day only
        rows.append((eid, datetime.datetime(2024, 1, 4, 12), "burst"))
        eid += 1
    sf = str(tmp_path / "sf_fano")
    spark.createDataFrame(
        rows, "event_id long, ts timestamp, event_type string"
    ).coalesce(1).write.parquet(os.path.join(sf, "events.parquet"))

    got = {r.event_type: r for r in ts_fano_burstiness(spark, sf).collect()}

    # view: constant 5/day -> var 0, fano 0, burstiness -1
    assert got["view"].n_days == 10
    assert got["view"].var_daily == 0.0
    assert got["view"].fano_factor == 0.0
    assert got["view"].burstiness_b == -1.0
    # burst: [30,0,...,0] over 10 days
    cs = [30] + [0] * 9
    n = len(cs)
    mean = sum(cs) / n
    var = sum((c - mean) ** 2 for c in cs) / n
    b = got["burst"]
    assert b.n_days == 10 and b.n_events == 30
    assert abs(b.mean_daily - mean) < 1e-12
    assert abs(b.var_daily - var) < 1e-9
    assert abs(b.fano_factor - var / mean) < 1e-9
    assert abs(
        b.burstiness_b
        - (math.sqrt(var) - mean) / (math.sqrt(var) + mean)
    ) < 1e-12


def test_privacy_sensitivity_audit_matches_bruteforce(spark, tmp_path):
    """L1 sensitivity / clipping columns vs direct per-user counting,
    with one heavy user planted over the cap."""
    from target_s3_parquet_spark.operators.pipeline import (
        privacy_sensitivity_audit,
    )

    rows, eid = [], 0
    for u in range(8):
        for _ in range(3):  # 3 clicks per normal user
            rows.append((eid, u, "click")); eid += 1
    for _ in range(25):  # one heavy user: 25 clicks
        rows.append((eid, 99, "click")); eid += 1
    sf = str(tmp_path / "sf_sens")
    spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string"
    ).coalesce(1).write.parquet(os.path.join(sf, "events.parquet"))

    got = privacy_sensitivity_audit(spark, sf).collect()
    assert len(got) == 1
    r = got[0]
    assert (r.n_users, r.n_rows, r.l1_sensitivity) == (9, 49, 25)
    assert abs(r.mean_contribution - 49 / 9) < 1e-12
    assert r.rows_clipped_at_10 == 15  # 25 - 10
    assert r.users_over_cap == 1


def test_ece_matches_bruteforce(spark, tmp_path):
    """ECE / MCE vs direct 10-bin reliability arithmetic."""
    from target_s3_parquet_spark.operators.aggregates import (
        eval_expected_calibration_error,
    )

    rng = random.Random(99)
    rows = [
        (
            i,
            float(rng.uniform(10000, 350000)),
            rng.choice(["1-URGENT", "2-HIGH", "3-MEDIUM", "5-LOW"]),
        )
        for i in range(300)
    ]
    sf = str(tmp_path / "sf_ece")
    spark.createDataFrame(
        rows, "o_orderkey long, o_totalprice double, o_orderpriority string"
    ).coalesce(1).write.parquet(os.path.join(sf, "orders.parquet"))

    got = eval_expected_calibration_error(spark, sf).collect()[0]

    from collections import defaultdict

    bins = defaultdict(list)
    for _, price, pr in rows:
        cents = min(int(round(price * 100)), 30000000)
        y = 1 if pr in ("1-URGENT", "2-HIGH") else 0
        b = min(cents * 10 // 30000000, 9)
        bins[b].append((cents / 30000000, y))
    n = len(rows)
    ece = sum(
        len(v) / n * abs(sum(p for p, _ in v) / len(v)
                         - sum(y for _, y in v) / len(v))
        for v in bins.values()
    )
    mce = max(
        abs(sum(p for p, _ in v) / len(v) - sum(y for _, y in v) / len(v))
        for v in bins.values()
    )
    assert (got.n, got.n_bins) == (n, len(bins))
    assert abs(got.ece - ece) < 1e-9
    assert abs(got.mce - mce) < 1e-9


def test_feature_scaling_params_match_bruteforce(spark, tmp_path):
    """min/max/mean/population-std per feature vs direct arithmetic."""
    from target_s3_parquet_spark.operators.pipeline import (
        feature_scaling_params,
    )

    rng = random.Random(17)
    rows = [
        (
            i,
            float(rng.randint(1, 50)),
            round(rng.uniform(900.0, 90000.0), 2),
            round(rng.choice([0.0, 0.05, 0.1]), 2),
            round(rng.choice([0.0, 0.04, 0.08]), 2),
        )
        for i in range(200)
    ]
    sf = str(tmp_path / "sf_scale")
    spark.createDataFrame(
        rows,
        "l_orderkey long, l_quantity double, l_extendedprice double, "
        "l_discount double, l_tax double",
    ).coalesce(1).write.parquet(os.path.join(sf, "lineitem.parquet"))

    got = {r.feature: r for r in feature_scaling_params(spark, sf).collect()}

    cols = {
        "l_quantity": [r[1] for r in rows],
        "l_extendedprice": [r[2] for r in rows],
        "l_discount": [r[3] for r in rows],
        "l_tax": [r[4] for r in rows],
    }
    assert set(got) == set(cols)
    for name, xs in cols.items():
        cents = [int(round(x * 100)) for x in xs]
        n = len(cents)
        mean = sum(cents) / (100 * n)
        var_num = n * sum(c * c for c in cents) - sum(cents) ** 2
        std = math.sqrt(var_num) / (100 * n)
        r = got[name]
        assert r.n == n
        assert r.min_v == min(xs) and r.max_v == max(xs)
        assert abs(r.mean_v - mean) < 1e-12
        assert abs(r.std_v - std) < 1e-9
