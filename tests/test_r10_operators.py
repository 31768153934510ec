"""Round-10 operator tests: brute-force pins for the survival /
rank-sketch / community-detection batch, each on a planted fixture an
independent pure-Python computation reproduces exactly."""

import datetime
import os
import random


def test_kaplan_meier_matches_bruteforce(spark, tmp_path):
    """KM curve + Nelson-Aalen hazard vs a direct product-limit
    computation on planted first/second-order dates with real
    censoring (a third of customers never reorder)."""
    from target_s3_parquet_spark.operators.timeseries import (
        survival_kaplan_meier,
    )

    rng = random.Random(10)
    base = datetime.date(1995, 1, 1)
    rows = []
    durations = {}  # cust -> (weeks, event)
    orders = []
    for c in range(60):
        fd = base + datetime.timedelta(days=rng.randrange(0, 200))
        orders.append((c, fd))
        if rng.random() < 2 / 3:
            sd = fd + datetime.timedelta(days=rng.randrange(1, 120))
            orders.append((c, sd))
            # extra later orders must not affect the curve
            if rng.random() < 0.5:
                orders.append((c, sd + datetime.timedelta(days=30)))
    last = max(d for _, d in orders)
    for i, (c, d) in enumerate(orders):
        rows.append((i, c, datetime.datetime.combine(d, datetime.time())))
    sf = str(tmp_path / "sf_km")
    spark.createDataFrame(
        rows, "o_orderkey long, o_custkey long, o_orderdate timestamp"
    ).coalesce(1).write.parquet(os.path.join(sf, "orders.parquet"))

    # brute force: per customer first date and first STRICTLY-later
    # date (the key's `d > fd` semantics), week bucket, KM fold
    by_cust: dict = {}
    for c, d in orders:
        by_cust.setdefault(c, []).append(d)
    for c, ds in by_cust.items():
        fd = min(ds)
        later = [d for d in ds if d > fd]
        sd = min(later) if later else None
        durations[c] = (
            ((sd if sd is not None else last) - fd).days // 7,
            sd is not None,
        )
    weeks = sorted({w for w, e in durations.values() if e})
    at_risk = lambda t: sum(1 for w, _ in durations.values() if w >= t)
    surv, haz, expect = 1.0, 0.0, {}
    for w in weeks:
        n = at_risk(w)
        d = sum(1 for ww, e in durations.values() if ww == w and e)
        c = sum(1 for ww, e in durations.values() if ww == w and not e)
        surv *= (n - d) / n
        haz += d / n
        expect[w] = (n, d, c, surv, haz)

    got = {r.t_week: r for r in survival_kaplan_meier(spark, sf).collect()}
    assert set(got) == set(expect)
    for w, (n, d, c, s_, h) in expect.items():
        r = got[w]
        assert (r.n_risk, r.n_events, r.n_censored) == (n, d, c), w
        assert abs(r.survival_km - s_) < 1e-12, w
        assert abs(r.cum_hazard_na - h) < 1e-12, w


def test_mergeable_rank_sketch_matches_simulation(spark, tmp_path):
    """The stride sketch vs a pure-Python simulation of the same
    compaction (hash-bucket, sort, every-64th with covered weight),
    plus the a-priori rank-error bound on every quantile."""
    from target_s3_parquet_spark.operators.aggregates import (
        agg_mergeable_rank_sketch,
    )

    rng = random.Random(11)
    prices = [round(rng.uniform(1.0, 90000.0), 2) for _ in range(5000)]
    sf = str(tmp_path / "sf_sk")
    spark.createDataFrame(
        [(i, p) for i, p in enumerate(prices)],
        "o_orderkey long, o_totalprice double",
    ).coalesce(1).write.parquet(os.path.join(sf, "orders.parquet"))

    cents = [int(str((__import__("decimal").Decimal(str(p))
                      * 100).quantize(__import__("decimal").Decimal("1"))))
             for p in prices]
    P, S = 32, 64
    buckets: dict = {}
    for v in cents:
        buckets.setdefault((v * 2654435761) % 4294967296 % P, []).append(v)
    kept = []  # (value, bucket, rank, weight)
    for b, vs in buckets.items():
        vs.sort()
        for r in range(1, len(vs) + 1, S):
            kept.append((vs[r - 1], b, r, min(S, len(vs) - r + 1)))
    kept.sort()
    n = len(cents)
    svals = sorted(cents)
    got = {r.q_pct: r for r in agg_mergeable_rank_sketch(spark, sf).collect()}
    assert set(got) == {25, 50, 75, 90, 99}
    for q, r in got.items():
        target = (q * n + 99) // 100
        cw = 0
        for v, _, _, w in kept:
            cw += w
            if cw >= target:
                est = v
                break
        assert r.target_rank == target
        assert r.est_cents == est, q
        assert r.cnt_lt == sum(1 for v in cents if v < est)
        assert r.cnt_le == sum(1 for v in cents if v <= est)
        assert r.n == n and r.err_bound == P * (S - 1)
        lo, hi = r.cnt_lt + 1, r.cnt_le
        expect_err = max(0, lo - target, target - hi)
        assert r.rank_err == expect_err
        assert r.rank_err <= r.err_bound
        # the estimate is a real element with the claimed rank window
        assert svals[lo - 1] == est == svals[hi - 1]


def _plant_trade_graph(spark, tmp_path, flows):
    """Build the 5-table fixture whose nation->nation lineitem counts
    are exactly `flows` = {(src, dst): weight}."""
    nations = sorted({n for e in flows for n in e})
    sf = str(tmp_path / "sf_lpa")
    spark.createDataFrame(
        [(n, f"N{n}") for n in nations], "n_nationkey int, n_name string"
    ).coalesce(1).write.parquet(os.path.join(sf, "nation.parquet"))
    spark.createDataFrame(
        [(n, n) for n in nations], "c_custkey long, c_nationkey int"
    ).coalesce(1).write.parquet(os.path.join(sf, "customer.parquet"))
    spark.createDataFrame(
        [(n, n) for n in nations], "s_suppkey long, s_nationkey int"
    ).coalesce(1).write.parquet(os.path.join(sf, "supplier.parquet"))
    orders, lines, ok, lk = [], [], 0, 0
    for (src, dst), w in flows.items():
        orders.append((ok, src))
        for _ in range(w):
            lines.append((ok, dst, lk))
            lk += 1
        ok += 1
    spark.createDataFrame(
        orders, "o_orderkey long, o_custkey long"
    ).coalesce(1).write.parquet(os.path.join(sf, "orders.parquet"))
    spark.createDataFrame(
        lines, "l_orderkey long, l_suppkey long, l_linenumber long"
    ).coalesce(1).write.parquet(os.path.join(sf, "lineitem.parquet"))
    return sf, nations


def _lpa_bruteforce(flows, nations, iters=3):
    """Pure-Python twin: sparsify (2*n*w > 3*S), 3 synchronous rounds,
    (score DESC, label ASC) tie-break."""
    pairs = {}
    for (s, d), w in flows.items():
        if s != d:
            a, b = min(s, d), max(s, d)
            pairs[(a, b)] = pairs.get((a, b), 0) + w
    n, S = len(pairs), sum(pairs.values())
    strong = {e: w for e, w in pairs.items() if 2 * n * w > 3 * S}
    nbrs: dict = {v: {} for v in nations}
    for (a, b), w in strong.items():
        nbrs[a][b] = nbrs[a].get(b, 0) + w
        nbrs[b][a] = nbrs[b].get(a, 0) + w
    lab = {v: v for v in nations}
    for _ in range(iters):
        nxt = {}
        for v in nations:
            scores: dict = {}
            for u, w in nbrs[v].items():
                scores[lab[u]] = scores.get(lab[u], 0) + w
            nxt[v] = (
                min(scores, key=lambda L: (-scores[L], L))
                if scores
                else lab[v]
            )
        lab = nxt
    return strong, lab


def test_label_propagation_matches_bruteforce(spark, tmp_path):
    """3-round synchronous weighted LPA on a planted two-cluster graph
    with a weak bridge (sparsified away) and an isolated node."""
    from target_s3_parquet_spark.operators.graph import (
        graph_label_propagation,
    )

    flows = {
        # cluster A: triangle 0-1-2 heavily tied
        (0, 1): 50, (1, 2): 50, (2, 0): 50,
        # cluster B: triangle 3-4-5 heavily tied
        (3, 4): 60, (3, 5): 60, (4, 5): 60,
        # light noise edges pull the mean down so the heavy edges
        # survive the 1.5x-mean sparsifier while these (and the weak
        # A-B bridge) are cut
        (6, 7): 1, (7, 8): 1, (8, 9): 1, (6, 9): 1,
        (2, 3): 2,
        # node 10 trades only with itself (self-loop drops out)
        (10, 10): 30,
    }
    sf, nations = _plant_trade_graph(spark, tmp_path, flows)
    strong, expect = _lpa_bruteforce(flows, nations)
    assert (2, 3) not in strong  # the bridge really is sparsified away
    got = {
        r.nationkey: r.community
        for r in graph_label_propagation(spark, sf).collect()
    }
    assert got == expect
    assert got[10] == 10  # isolated node keeps its own label
    assert len({got[0], got[1], got[2]}) == 1  # cluster A converged
    assert len({got[3], got[4], got[5]}) == 1  # cluster B converged
    assert got[0] != got[3]  # clusters stay separate
    assert got[6] == 6 and got[9] == 9  # noise edges were sparsified


def test_lpa_modularity_matches_bruteforce(spark, tmp_path):
    """Modularity panel vs direct Q computation on the same planted
    partition."""
    from target_s3_parquet_spark.operators.graph import (
        graph_lpa_modularity,
    )

    flows = {
        (0, 1): 50, (1, 2): 50, (2, 0): 50,
        (3, 4): 60, (3, 5): 60, (4, 5): 60,
        (6, 7): 1, (7, 8): 1, (8, 9): 1, (6, 9): 1,
        (2, 3): 2,
        (10, 10): 30,
    }
    sf, nations = _plant_trade_graph(spark, tmp_path, flows)
    strong, lab = _lpa_bruteforce(flows, nations)
    m = sum(strong.values())
    deg: dict = {v: 0 for v in nations}
    for (a, b), w in strong.items():
        deg[a] += w
        deg[b] += w
    comms: dict = {}
    for v in nations:
        comms.setdefault(lab[v], []).append(v)
    w_in = {
        c: sum(w for (a, b), w in strong.items()
               if lab[a] == c and lab[b] == c)
        for c in comms
    }
    q = sum(
        w_in[c] / m - (sum(deg[v] for v in comms[c]) / (2 * m)) ** 2
        for c in comms
    )
    got = graph_lpa_modularity(spark, sf).collect()[0]
    assert got.n_communities == len(comms)
    assert got.largest_community == max(len(vs) for vs in comms.values())
    assert got.total_weight == m
    assert got.intra_weight == sum(w_in.values())
    assert abs(got.modularity - q) < 1e-12


def _plant_scored_orders(spark, tmp_path, n=300, seed=12):
    """Orders fixture for the eval-family keys: varied prices (some
    above the 300k cap), priorities correlated with price."""
    rng = random.Random(seed)
    rows = []
    for i in range(n):
        price = round(rng.uniform(10.0, 400000.0), 2)
        pri = (
            rng.choice(["1-URGENT", "2-HIGH"])
            if rng.random() < min(0.9, price / 300000.0)
            else rng.choice(["3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"])
        )
        rows.append((i, price, pri))
    sf = str(tmp_path / "sf_ev")
    spark.createDataFrame(
        rows, "o_orderkey long, o_totalprice double, o_orderpriority string"
    ).coalesce(1).write.parquet(os.path.join(sf, "orders.parquet"))
    import decimal

    ranked = sorted(
        (
            min(
                int(
                    (decimal.Decimal(str(p)) * 100).quantize(
                        decimal.Decimal("1")
                    )
                ),
                30000000,
            ),
            k,
            1 if pri in ("1-URGENT", "2-HIGH") else 0,
        )
        for k, p, pri in rows
    )
    # rank order: score DESC, key ASC
    ranked = sorted(ranked, key=lambda t: (-t[0], t[1]))
    return sf, [y for _, _, y in ranked]


def test_lift_gains_decile_matches_bruteforce(spark, tmp_path):
    from target_s3_parquet_spark.operators.aggregates import (
        eval_lift_gains_decile,
    )

    sf, ys = _plant_scored_orders(spark, tmp_path, n=297)  # 297 % 10 != 0
    n, pos = len(ys), sum(ys)
    q, m = divmod(n, 10)
    sizes = [q + 1 if d < m else q for d in range(10)]
    got = sorted(eval_lift_gains_decile(spark, sf).collect(),
                 key=lambda r: r.decile)
    cum_n = cum_pos = 0
    i = 0
    for d, r in enumerate(got, 1):
        take = ys[i : i + sizes[d - 1]]
        i += sizes[d - 1]
        cum_n += len(take)
        cum_pos += sum(take)
        assert (r.decile, r.n_dec, r.pos_dec) == (d, len(take), sum(take))
        assert (r.cum_n, r.cum_pos) == (cum_n, cum_pos)
        assert abs(r.cum_gain - cum_pos / pos) < 1e-15
        assert abs(r.cum_lift - (cum_pos * n) / (cum_n * pos)) < 1e-15
    assert (cum_n, cum_pos) == (n, pos)


def test_precision_recall_at_k_matches_bruteforce(spark, tmp_path):
    from target_s3_parquet_spark.operators.aggregates import (
        eval_precision_recall_at_k,
    )

    sf, ys = _plant_scored_orders(spark, tmp_path, n=600, seed=13)
    pos = sum(ys)
    got = {r.k: r for r in eval_precision_recall_at_k(spark, sf).collect()}
    assert set(got) == {10, 50, 100, 500}
    for k, r in got.items():
        hits = sum(ys[:k])
        assert r.n_hits == hits and r.n_pos == pos
        assert abs(r.precision_at_k - hits / k) < 1e-15
        assert abs(r.recall_at_k - hits / pos) < 1e-15
        assert abs(r.f1_at_k - 2 * hits / (k + pos)) < 1e-15


def test_completeness_profile_counts_planted_nulls(spark, tmp_path):
    from target_s3_parquet_spark.operators.pipeline import (
        dq_completeness_profile,
    )

    rows = [
        (1, 10, "O", 5.0, datetime.datetime(1995, 1, 1), "1-URGENT"),
        (2, 10, None, 5.0, datetime.datetime(1995, 1, 2), "5-LOW"),
        (3, None, "F", None, None, "5-LOW"),
        (4, 11, "F", 7.5, datetime.datetime(1995, 1, 2), None),
    ]
    sf = str(tmp_path / "sf_dq")
    spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    ).coalesce(1).write.parquet(os.path.join(sf, "orders.parquet"))
    got = {r.col_name: r for r in dq_completeness_profile(spark, sf).collect()}
    expect = {
        "o_orderkey": (4, 4), "o_custkey": (3, 2), "o_orderstatus": (3, 2),
        "o_totalprice": (3, 2), "o_orderdate": (3, 2),
        "o_orderpriority": (3, 2),
    }
    assert set(got) == set(expect)
    for c, (nn, nd) in expect.items():
        r = got[c]
        assert (r.n_rows, r.n_nonnull, r.n_distinct) == (4, nn, nd), c
        assert abs(r.completeness - nn / 4) < 1e-15
        assert abs(r.uniqueness - nd / nn) < 1e-15


def test_budget_apportionment_is_exact_hamilton(spark, tmp_path):
    from target_s3_parquet_spark.operators.pipeline import (
        corpus_budget_apportionment,
    )

    chars = {"en": 333333, "de": 333333, "fr": 333334, "zh": 1, "es": 7}
    docs = [
        (i, lang, c)
        for i, (lang, c) in enumerate(chars.items())
    ]
    sf = str(tmp_path / "sf_bud")
    spark.createDataFrame(
        docs, "doc_id long, lang string, n_chars long"
    ).coalesce(1).write.parquet(os.path.join(sf, "documents.parquet"))
    got = {r.lang: r for r in corpus_budget_apportionment(spark, sf).collect()}
    B, W = 1000000, sum(chars.values())
    base = {l: B * c // W for l, c in chars.items()}
    rem = {l: B * c % W for l, c in chars.items()}
    left = B - sum(base.values())
    order = sorted(chars, key=lambda l: (-rem[l], l))
    extra = {l: 1 if order.index(l) < left else 0 for l in chars}
    assert set(got) == set(chars)
    for l in chars:
        r = got[l]
        assert (r.chars, r.base_alloc, r.extra, r.allocation) == (
            chars[l], base[l], extra[l], base[l] + extra[l]), l
    assert sum(r.allocation for r in got.values()) == B
    # every allocation within 1 unit of the real-valued quota
    for l in chars:
        assert abs(got[l].allocation - B * chars[l] / W) < 1.0


def test_kcore_peels_pendants_keeps_core(spark, tmp_path):
    """2-core peeling on a planted triangle + pendant chain: the chain
    peels over successive rounds even though its first node starts at
    degree 2; the triangle survives."""
    from target_s3_parquet_spark.operators.graph import (
        graph_kcore_decomposition,
    )

    flows = {
        # triangle 0-1-2 (heavy, survives sparsifier, 2-core)
        (0, 1): 50, (1, 2): 50, (2, 0): 50,
        # chain 2-3-4 (heavy edges, but degree-1 endpoints peel)
        (2, 3): 50, (3, 4): 50,
        # light noise so the sparsifier keeps the heavy edges
        (5, 6): 1, (6, 7): 1, (7, 8): 1, (5, 8): 1,
    }
    sf, nations = _plant_trade_graph(spark, tmp_path, flows)
    strong, _ = _lpa_bruteforce(flows, nations, iters=0)
    # brute-force peel
    deg0: dict = {v: 0 for v in nations}
    for a, b in strong:
        deg0[a] += 1
        deg0[b] += 1
    alive = set(nations)
    for _ in range(3):
        deg = {v: 0 for v in alive}
        for a, b in strong:
            if a in alive and b in alive:
                deg[a] += 1
                deg[b] += 1
        alive = {v for v in alive if deg[v] >= 2}
    got = {r.nationkey: r for r in graph_kcore_decomposition(spark, sf).collect()}
    assert set(got) == set(nations)
    for v in nations:
        assert got[v].degree_initial == deg0[v], v
        assert got[v].in_2core == (1 if v in alive else 0), v
    # semantic spot checks
    assert {v for v in nations if got[v].in_2core} == {0, 1, 2}
    assert got[3].degree_initial == 2  # chain midpoint starts at 2...
    assert got[3].in_2core == 0  # ...but peels once node 4 is gone


def test_survival_landmarks_match_curve(spark, tmp_path):
    """The churn panel vs landmarks read directly off the KM curve."""
    from target_s3_parquet_spark.operators.timeseries import (
        survival_kaplan_meier,
        survival_median_landmarks,
    )

    rng = random.Random(14)
    base = datetime.date(1995, 1, 1)
    orders = []
    for c in range(80):
        fd = base + datetime.timedelta(days=rng.randrange(0, 100))
        orders.append((c, fd))
        if rng.random() < 0.7:
            orders.append(
                (c, fd + datetime.timedelta(days=rng.randrange(1, 500)))
            )
    rows = [
        (i, c, datetime.datetime.combine(d, datetime.time()))
        for i, (c, d) in enumerate(orders)
    ]
    sf = str(tmp_path / "sf_lm")
    spark.createDataFrame(
        rows, "o_orderkey long, o_custkey long, o_orderdate timestamp"
    ).coalesce(1).write.parquet(os.path.join(sf, "orders.parquet"))

    curve = sorted(
        survival_kaplan_meier(spark, sf).collect(), key=lambda r: r.t_week
    )
    got = survival_median_landmarks(spark, sf).collect()[0]
    below = [r.t_week for r in curve if r.survival_km <= 0.5]
    assert got.median_week == (min(below) if below else None)
    for wk in (4, 12, 26, 52):
        pts = [r for r in curve if r.t_week <= wk]
        expect = pts[-1].survival_km if pts else 1.0
        assert getattr(got, f"s_{wk}w") == expect, wk
    assert got.final_survival == curve[-1].survival_km
    assert got.n_curve_points == len(curve)
    assert got.total_events == sum(r.n_events for r in curve)


def test_cuped_matches_bruteforce(spark, tmp_path):
    """CUPED theta / adjusted means / variance reduction vs direct
    computation on planted pre/post revenues."""
    from target_s3_parquet_spark.operators.aggregates import (
        ab_test_cuped_adjustment,
    )

    rng = random.Random(15)
    custs = list(range(40))
    orders = []
    ok = 0
    xs, ys = {}, {}
    for c in custs:
        xs[c] = ys[c] = 0
        for _ in range(rng.randrange(0, 4)):  # pre-period orders
            p = round(rng.uniform(100, 50000), 2)
            orders.append((ok, c, p, datetime.datetime(1997, 6, 1)))
            xs[c] += round(p * 100)
            ok += 1
        for _ in range(rng.randrange(0, 4)):  # experiment-period orders
            p = round(rng.uniform(100, 50000), 2)
            # group-1 customers get a lift correlated with pre-period
            orders.append((ok, c, p, datetime.datetime(1999, 6, 1)))
            ys[c] += round(p * 100)
            ok += 1
    sf = str(tmp_path / "sf_cuped")
    spark.createDataFrame(
        [(c,) for c in custs], "c_custkey long"
    ).coalesce(1).write.parquet(os.path.join(sf, "customer.parquet"))
    spark.createDataFrame(
        orders,
        "o_orderkey long, o_custkey long, o_totalprice double, "
        "o_orderdate timestamp",
    ).coalesce(1).write.parquet(os.path.join(sf, "orders.parquet"))

    n = len(custs)
    sx, sy = sum(xs.values()), sum(ys.values())
    sxx = sum(v * v for v in xs.values())
    sxy = sum(xs[c] * ys[c] for c in custs)
    syy = sum(v * v for v in ys.values())
    num, dx, dy = n * sxy - sx * sy, n * sxx - sx * sx, n * syy - sy * sy
    theta = num / dx
    mean_x_all = sx / n
    got = {r.grp: r for r in ab_test_cuped_adjustment(spark, sf).collect()}
    assert set(got) == {0, 1}
    for grp in (0, 1):
        members = [c for c in custs if c % 2 == grp]
        ng = len(members)
        my = sum(ys[c] for c in members) / ng
        mx = sum(xs[c] for c in members) / ng
        r = got[grp]
        assert r.n_units == ng
        assert abs(r.mean_y_cents - my) < 1e-9
        assert abs(r.mean_x_cents - mx) < 1e-9
        assert abs(r.adj_mean_y_cents - (my - theta * (mx - mean_x_all))) < 1e-5
        assert abs(r.theta - theta) < 1e-11
        assert abs(r.var_reduction - num * num / (dx * dy)) < 1e-11
        assert 0.0 <= r.var_reduction <= 1.0


def test_referential_integrity_counts_planted_orphans(spark, tmp_path):
    from target_s3_parquet_spark.operators.pipeline import (
        dq_referential_integrity_audit,
    )

    sf = str(tmp_path / "sf_fk")
    spark.createDataFrame(
        [(1,), (2,)], "c_custkey long"
    ).coalesce(1).write.parquet(os.path.join(sf, "customer.parquet"))
    spark.createDataFrame(
        [(10,), (11,)], "s_suppkey long"
    ).coalesce(1).write.parquet(os.path.join(sf, "supplier.parquet"))
    spark.createDataFrame(
        [(100,), (101,)], "p_partkey long"
    ).coalesce(1).write.parquet(os.path.join(sf, "part.parquet"))
    # orders: 1 ok, 1 orphan cust, 1 null cust
    spark.createDataFrame(
        [(1000, 1), (1001, 99), (1002, None)],
        "o_orderkey long, o_custkey long",
    ).coalesce(1).write.parquet(os.path.join(sf, "orders.parquet"))
    # lineitem: order fk -> {ok, orphan}, supp fk -> {ok, orphan, null},
    # part fk all ok
    spark.createDataFrame(
        [
            (1000, 10, 100),
            (1000, 99, 100),
            (9999, None, 101),
        ],
        "l_orderkey long, l_suppkey long, l_partkey long",
    ).coalesce(1).write.parquet(os.path.join(sf, "lineitem.parquet"))

    got = {r.fk: r for r in dq_referential_integrity_audit(spark, sf).collect()}
    e = got["orders.o_custkey->customer"]
    assert (e.n_child, e.n_null_fk, e.n_orphans) == (3, 1, 1)
    assert abs(e.integrity_ratio - 1 / 3) < 1e-15
    e = got["lineitem.l_orderkey->orders"]
    assert (e.n_child, e.n_null_fk, e.n_orphans) == (3, 0, 1)
    e = got["lineitem.l_suppkey->supplier"]
    assert (e.n_child, e.n_null_fk, e.n_orphans) == (3, 1, 1)
    e = got["lineitem.l_partkey->part"]
    assert (e.n_child, e.n_null_fk, e.n_orphans) == (3, 0, 0)
    assert e.integrity_ratio == 1.0


def test_neyman_allocation_matches_bruteforce(spark, tmp_path):
    import math

    from target_s3_parquet_spark.operators.pipeline import (
        sample_neyman_allocation,
    )

    rng = random.Random(16)
    custs = []
    bals: dict = {}
    ck = 0
    # stratum 0: high variance; 1: low variance; 2: constant (weight 0)
    for nation, (lo, hi) in {0: (0, 9000), 1: (4000, 4100), 2: (5, 5)}.items():
        for _ in range(30):
            bal = round(rng.uniform(lo, hi), 2)
            custs.append((ck, nation, bal))
            bals.setdefault(nation, []).append(round(bal * 100))
            ck += 1
    sf = str(tmp_path / "sf_ney")
    spark.createDataFrame(
        custs, "c_custkey long, c_nationkey int, c_acctbal double"
    ).coalesce(1).write.parquet(os.path.join(sf, "customer.parquet"))

    B = 10000
    wq = {}
    for n, xs in bals.items():
        num = len(xs) * sum(x * x for x in xs) - sum(xs) ** 2
        wq[n] = int(math.floor(math.sqrt(num)))
    W = sum(wq.values())
    base = {n: B * w // W for n, w in wq.items()}
    rem = {n: B * w % W for n, w in wq.items()}
    left = B - sum(base.values())
    order = sorted(wq, key=lambda n: (-rem[n], n))
    got = {r.nation: r for r in sample_neyman_allocation(spark, sf).collect()}
    assert set(got) == set(wq)
    for n in wq:
        r = got[n]
        assert (r.n_units, r.sigma_weight, r.base_alloc) == (
            30, wq[n], base[n]), n
        assert r.extra == (1 if order.index(n) < left else 0)
        assert r.allocation == base[n] + r.extra
    assert sum(r.allocation for r in got.values()) == B
    assert got[2].sigma_weight == 0 and got[2].allocation == 0
    assert got[0].allocation > got[1].allocation  # variance drives budget


def test_rank_sketch_merge_stays_in_doubled_bound(spark, tmp_path):
    """Two-shard sketch + union-merge vs a pure-Python simulation of
    the same two compactions; every estimate inside 2*P*(s-1)."""
    from target_s3_parquet_spark.operators.aggregates import (
        agg_rank_sketch_merge_check,
    )

    rng = random.Random(17)
    P, S = 32, 64
    rows, shard = [], {0: [], 1: []}
    import datetime as dt
    import decimal

    for i in range(6000):
        p = round(rng.uniform(1.0, 90000.0), 2)
        h = rng.randrange(2)
        d = dt.datetime(1997, 6, 1) if h == 0 else dt.datetime(2000, 6, 1)
        rows.append((i, p, d))
        shard[h].append(
            int((decimal.Decimal(str(p)) * 100).quantize(decimal.Decimal("1")))
        )
    sf = str(tmp_path / "sf_mg")
    spark.createDataFrame(
        rows, "o_orderkey long, o_totalprice double, o_orderdate timestamp"
    ).coalesce(1).write.parquet(os.path.join(sf, "orders.parquet"))

    merged = []  # (value, half, bucket, rank, weight)
    for h, vals in shard.items():
        buckets: dict = {}
        for v in vals:
            buckets.setdefault((v * 2654435761) % 4294967296 % P, []).append(v)
        for b, vs in buckets.items():
            vs.sort()
            for r in range(1, len(vs) + 1, S):
                merged.append((vs[r - 1], h, b, r, min(S, len(vs) - r + 1)))
    merged.sort()
    allv = sorted(shard[0] + shard[1])
    n = len(allv)
    got = {r.q_pct: r for r in agg_rank_sketch_merge_check(spark, sf).collect()}
    assert set(got) == {25, 50, 75, 90, 99}
    for q, r in got.items():
        target = (q * n + 99) // 100
        cw = 0
        for v, _, _, _, w in merged:
            cw += w
            if cw >= target:
                est = v
                break
        assert (r.target_rank, r.est_cents) == (target, est), q
        assert r.n == n and r.n_summary == len(merged)
        assert r.err_bound == 2 * P * (S - 1)
        assert r.rank_err <= r.err_bound
        lo = sum(1 for v in allv if v < est) + 1
        hi = sum(1 for v in allv if v <= est)
        assert r.rank_err == max(0, lo - target, target - hi)


def test_cohort_ltv_matches_bruteforce(spark, tmp_path):
    import decimal

    from target_s3_parquet_spark.operators.timeseries import (
        cohort_ltv_curves,
    )

    rng = random.Random(18)
    orders = []
    ok = 0
    for c in range(50):
        first = rng.randrange(0, 12)
        for _ in range(rng.randrange(1, 6)):
            m = first + rng.randrange(0, 24)
            p = round(rng.uniform(10, 5000), 2)
            orders.append((ok, c, p, datetime.datetime(1995 + m // 12,
                                                       m % 12 + 1, 15)))
            ok += 1
        # guarantee the first-month order exists
        orders.append((ok, c, 100.0,
                       datetime.datetime(1995 + first // 12,
                                         first % 12 + 1, 1)))
        ok += 1
    sf = str(tmp_path / "sf_ltv")
    spark.createDataFrame(
        orders,
        "o_orderkey long, o_custkey long, o_totalprice double, "
        "o_orderdate timestamp",
    ).coalesce(1).write.parquet(os.path.join(sf, "orders.parquet"))

    cents = lambda p: int(
        (decimal.Decimal(str(p)) * 100).quantize(decimal.Decimal("1"))
    )
    midx = lambda d: (d.year - 1995) * 12 + d.month - 1
    first_m: dict = {}
    for _, c, _, d in orders:
        first_m[c] = min(first_m.get(c, 10**9), midx(d))
    per: dict = {}
    for _, c, p, d in orders:
        key = (first_m[c], midx(d) - first_m[c])
        rev, users = per.get(key, (0, set()))
        users = users | {c}
        per[key] = (rev + cents(p), users)
    sizes: dict = {}
    for c, m in first_m.items():
        sizes[m] = sizes.get(m, 0) + 1
    got = {(r.cohort_m, r.age): r for r in cohort_ltv_curves(spark, sf).collect()}
    assert set(got) == set(per)
    for (cm, age), (rev, users) in per.items():
        r = got[(cm, age)]
        assert (r.n_active, r.revenue_cents) == (len(users), rev)
        cum = sum(v for (c2, a2), (v, _) in per.items()
                  if c2 == cm and a2 <= age)
        assert r.cum_revenue_cents == cum
        assert r.cohort_size == sizes[cm]
        assert abs(r.ltv_cents_per_customer - cum / sizes[cm]) < 1e-9


def test_pareto_skyline_matches_bruteforce(spark, tmp_path):
    import decimal

    from target_s3_parquet_spark.operators.pipeline import (
        pareto_frontier_skyline,
    )

    rng = random.Random(19)
    orders, ok = [], 0
    counts: dict = {}
    for c in range(120):
        n = rng.randrange(1, 9)
        counts[c] = n
        for _ in range(n):
            # price inversely related to order count, so count and
            # revenue genuinely trade off and the frontier is multi-point
            orders.append((ok, c, round(rng.uniform(10, 20000 / n), 2)))
            ok += 1
    sf = str(tmp_path / "sf_sky")
    spark.createDataFrame(
        orders, "o_orderkey long, o_custkey long, o_totalprice double"
    ).coalesce(1).write.parquet(os.path.join(sf, "orders.parquet"))

    rev: dict = {}
    for _, c, p in orders:
        rev[c] = rev.get(c, 0) + int(
            (decimal.Decimal(str(p)) * 100).quantize(decimal.Decimal("1"))
        )
    pts = {c: (rev[c], counts[c]) for c in rev}
    frontier = {
        c
        for c, (r_, n_) in pts.items()
        if not any(
            (r2 >= r_ and n2 >= n_ and (r2 > r_ or n2 > n_))
            for c2, (r2, n2) in pts.items()
            if c2 != c
        )
    }
    got = {r.custkey: r for r in pareto_frontier_skyline(spark, sf).collect()}
    assert set(got) == frontier
    assert len(frontier) >= 2  # fixture produces a real multi-point front
    for c in frontier:
        assert (got[c].revenue_cents, got[c].n_orders) == pts[c]


def test_path_trigrams_match_bruteforce(spark, tmp_path):
    from target_s3_parquet_spark.operators.timeseries import (
        events_path_trigrams,
    )

    rng = random.Random(20)
    types = ["view", "click", "purchase"]
    rows, eid = [], 0
    seqs: dict = {}
    t0 = datetime.datetime(2024, 1, 1)
    for u in range(25):
        seq = [rng.choice(types) for _ in range(rng.randrange(1, 12))]
        seqs[u] = seq
        for i, ty in enumerate(seq):
            # duplicate timestamps inside a user: event_id breaks the tie
            ts = t0 + datetime.timedelta(minutes=i // 2)
            rows.append((eid, ts, u, ty))
            eid += 1
    sf = str(tmp_path / "sf_path")
    spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    ).coalesce(1).write.parquet(os.path.join(sf, "events.parquet"))

    # brute force: per-user order is (ts, event_id) == insertion order
    occ: dict = {}
    users: dict = {}
    for u, seq in seqs.items():
        for i in range(len(seq) - 2):
            p = ">".join(seq[i : i + 3])
            occ[p] = occ.get(p, 0) + 1
            users.setdefault(p, set()).add(u)
    top = sorted(occ, key=lambda p: (-occ[p], p))[:20]
    got = events_path_trigrams(spark, sf).collect()
    assert [r.path for r in got] == top or {r.path for r in got} == set(top)
    for r in got:
        assert r.n_occurrences == occ[r.path]
        assert r.n_users == len(users[r.path])


def test_candidate_key_audit_counts(spark, tmp_path):
    from target_s3_parquet_spark.operators.pipeline import (
        dq_candidate_key_audit,
    )

    rows = [
        (1, 10, datetime.datetime(1995, 1, 1), 5.0),
        (2, 10, datetime.datetime(1995, 1, 1), 5.0),  # same (cust, date, price)
        (3, 10, datetime.datetime(1995, 1, 2), 7.0),
        (4, 11, datetime.datetime(1995, 1, 1), 5.0),
    ]
    sf = str(tmp_path / "sf_ck")
    spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderdate timestamp, "
        "o_totalprice double",
    ).coalesce(1).write.parquet(os.path.join(sf, "orders.parquet"))
    got = {r.candidate: r for r in dq_candidate_key_audit(spark, sf).collect()}
    expect = {
        "o_orderkey": (4, 0, 1),
        "o_custkey": (2, 2, 0),
        "o_custkey,o_orderdate": (3, 1, 0),
        "o_custkey,o_orderdate,o_totalprice": (3, 1, 0),
    }
    assert set(got) == set(expect)
    for cand, (nd, viol, is_key) in expect.items():
        r = got[cand]
        assert (r.n_rows, r.n_distinct, r.n_violations, r.is_key) == (
            4, nd, viol, is_key), cand


def test_dup_cluster_histogram_counts(spark, tmp_path):
    from target_s3_parquet_spark.operators.dedup import (
        docs_dup_cluster_histogram,
    )

    texts = (
        ["unique %d" % i for i in range(6)]  # 6 singletons
        + ["pair"] * 2 + ["pair2"] * 2       # 2 clusters of 2
        + ["triple"] * 3                     # 1 cluster of 3
    )
    sf = str(tmp_path / "sf_dh")
    spark.createDataFrame(
        [(i, s) for i, s in enumerate(texts)], "doc_id long, text string"
    ).coalesce(1).write.parquet(os.path.join(sf, "documents.parquet"))
    got = {r.cluster_size: r for r in
           docs_dup_cluster_histogram(spark, sf).collect()}
    n = len(texts)
    assert set(got) == {1, 2, 3}
    assert (got[1].n_clusters, got[1].n_docs_in_bin, got[1].n_removable) == (6, 6, 0)
    assert (got[2].n_clusters, got[2].n_docs_in_bin, got[2].n_removable) == (2, 4, 2)
    assert (got[3].n_clusters, got[3].n_docs_in_bin, got[3].n_removable) == (1, 3, 2)
    for sz, r in got.items():
        assert abs(r.doc_share - r.n_docs_in_bin / n) < 1e-15


def test_ljung_box_matches_bruteforce(spark, tmp_path):
    """Q statistic vs direct global-mean gap-aware ACF computation on
    a planted daily series with calendar gaps."""
    from target_s3_parquet_spark.operators.timeseries import (
        ts_ljung_box_q,
    )

    rng = random.Random(21)
    base = datetime.date(1995, 1, 1)
    series = {}
    d = 0
    for _ in range(120):
        series[d] = rng.randrange(100, 100000)  # cents
        d += rng.choice([1, 1, 1, 1, 2, 3])  # occasional calendar gaps
    rows = []
    for i, (day, cents) in enumerate(series.items()):
        rows.append(
            (i, cents / 100.0,
             datetime.datetime.combine(
                 base + datetime.timedelta(days=day), datetime.time()))
        )
    sf = str(tmp_path / "sf_lb")
    spark.createDataFrame(
        rows, "o_orderkey long, o_totalprice double, o_orderdate timestamp"
    ).coalesce(1).write.parquet(os.path.join(sf, "orders.parquet"))

    xs = series
    n = len(xs)
    xbar = sum(xs.values()) / n
    c0 = sum((v - xbar) ** 2 for v in xs.values())
    got = ts_ljung_box_q(spark, sf).collect()[0]
    assert got.n_days == n
    q = 0.0
    for k, col in [(1, "acf1"), (2, "acf2"), (3, "acf3"), (7, "acf7")]:
        pairs = [(xs[d], xs[d - k]) for d in xs if d - k in xs]
        m = len(pairs)
        r = sum((a - xbar) * (b - xbar) for a, b in pairs) / c0
        assert abs(getattr(got, col) - r) < 1e-9, k
        q += r * r / m
        if k == 1:
            assert got.m1 == m
    assert abs(got.q_stat - n * (n + 2) * q) < 1e-6
