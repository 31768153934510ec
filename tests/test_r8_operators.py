"""Invariant tests for the round-8 ADVICE fixes: the ANOVA weekday
pivot must keep pre-anchor dates, the funnel must emit NO row for an
empty stage, the scripting doubling loop must terminate on
non-positive minima, and the bench overflow path must still print a
parseable headline."""

from __future__ import annotations

import datetime
import json
import os

import duckdb
import pytest
from pyspark.sql import functions as F


def _write_parquet(spark, df, path):
    df.coalesce(1).write.mode("overwrite").parquet(path)


EVENTS_SCHEMA = (
    "event_id long, ts timestamp, user_id long, "
    "event_type string, value double, props string"
)


def _ts(minute):
    return datetime.datetime(2024, 1, 1, 0, minute)


@pytest.fixture()
def degenerate_sf(spark, tmp_path):
    """A tiny sf_dir whose funnel has view->click users but ZERO
    click->purchase conversions, and whose orders include a
    pre-1995-01-01 date plus a non-positive minimum price."""
    sf = str(tmp_path / "sf_degenerate")
    events = spark.createDataFrame(
        [
            (1, _ts(0), 100, "view", 1.0, "{}"),
            (2, _ts(5), 100, "click", 1.0, "{}"),
            (3, _ts(0), 200, "view", 1.0, "{}"),
            # a purchase BEFORE any click never converts
            (4, _ts(1), 200, "purchase", 1.0, "{}"),
        ],
        EVENTS_SCHEMA,
    )
    _write_parquet(spark, events, os.path.join(sf, "events.parquet"))
    orders = spark.createDataFrame(
        [
            # pre-anchor date: dividend-sign % yields a NEGATIVE slot
            (1, 1, "O", 100.0, datetime.datetime(1994, 12, 30), "1-URGENT"),
            (2, 1, "O", 0.0, datetime.datetime(1995, 6, 1), "1-URGENT"),
            (3, 2, "O", 250.0, datetime.datetime(1995, 6, 2), "1-URGENT"),
        ],
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    )
    _write_parquet(spark, orders, os.path.join(sf, "orders.parquet"))
    return sf


def _oracle(sf, sql):
    con = duckdb.connect()
    for name in ("events", "orders"):
        path = os.path.join(sf, f"{name}.parquet")
        if os.path.exists(path):
            con.execute(
                f"CREATE VIEW {name} AS SELECT * FROM parquet_scan('{path}/*.parquet')"
            )
    return con.execute(sql).fetchall()


def test_funnel_empty_stage_emits_no_row(spark, degenerate_sf):
    """ADVICE r7: an empty click->purchase stage must produce NO row on
    BOTH engines (Spark's global agg over an empty stage used to emit
    one all-NULL row while the oracle's GROUP BY emitted none)."""
    from target_s3_parquet_spark.operators.timeseries import (
        funnel_time_to_convert,
    )
    from target_s3_parquet_spark.registry import get_oracles

    rows = funnel_time_to_convert(spark, degenerate_sf).collect()
    assert [r.stage for r in rows] == ["view->click"], rows
    assert rows[0].n_users == 1 and rows[0].p50_us == 5 * 60 * 1_000_000

    oracle = _oracle(degenerate_sf, get_oracles()["funnel_time_to_convert"])
    assert len(oracle) == 1 and oracle[0][0] == "view->click", oracle


def test_anova_pre_anchor_dates_stay_in_pivot(spark, degenerate_sf):
    """ADVICE r7: a date before the 1995-01-01 anchor must land in a
    valid 0..6 slot (pmod), not silently drop from the 7-slot pivot
    while still counting in nn/ss/q — and both engines must agree."""
    from target_s3_parquet_spark.operators.aggregates import ab_test_anova_f
    from target_s3_parquet_spark.registry import get_oracles

    row = ab_test_anova_f(spark, degenerate_sf).collect()[0]
    assert row.n_rows == 3
    # with every row in-pivot, the group sums reproduce the total:
    # a finite F (3 rows in 3 distinct weekday slots -> within-SS 0,
    # but the guard is simply that the statistic is not NULL/NaN)
    oracle = _oracle(degenerate_sf, get_oracles()["ab_test_anova_f"])
    assert oracle[0][0] == 3
    sp = row.f_stat
    du = oracle[0][2]
    assert (sp is None) == (du is None)
    if sp is not None:
        assert sp == pytest.approx(du, abs=0.0), (sp, du)


def test_scripting_loop_guards_nonpositive_minimum(spark, degenerate_sf):
    """ADVICE r7: MIN(o_totalprice) == 0 used to spin the WHILE loop
    forever (doubling 0 stays 0). The lo > 0 guard exits with k = 0;
    the recursive-CTE oracle agrees."""
    from target_s3_parquet_spark.operators.relational import (
        sql_scripting_control_flow,
    )
    from target_s3_parquet_spark.registry import get_oracles

    row = sql_scripting_control_flow(spark, degenerate_sf).collect()[0]
    assert row.doublings == 0 and row.final_value == 0.0

    oracle = _oracle(
        degenerate_sf, get_oracles()["sql_scripting_control_flow"]
    )
    assert oracle == [(0, 0.0)], oracle


def test_bench_overflow_prints_truncated_headline(monkeypatch, capsys):
    """ADVICE r7: an oversize headline must still print a parseable
    (truncated) stdout line BEFORE raising, not lose the artifact."""
    import bench

    headline = {
        "metric": "headline_total",
        "value": 1.0,
        "unit": "sec",
        "sf": 0.1,
        "queries": {f"q{i}": 0.001 for i in range(400)},
    }
    final_line = json.dumps(headline)
    assert len(final_line) >= 1900  # the overflow premise

    # replicate bench.py's emission tail in isolation
    if len(final_line) >= 1900:
        fallback = json.dumps(
            {k: v for k, v in headline.items() if k != "queries"}
        )
        print(fallback, flush=True)
    out = capsys.readouterr().out.strip().splitlines()[-1]
    parsed = json.loads(out)
    assert parsed["metric"] == "headline_total" and "queries" not in parsed
    assert len(out) < 1900
    # and the in-repo source actually contains the fallback path
    src = open(os.path.join(os.path.dirname(bench.__file__), "bench.py")).read()
    assert "fallback" in src and "raise AssertionError" in src


def test_rank_caches_release_keeps_storage_flat(spark):
    """VERDICT r7 #4: repeated two_phase_rank invocations must not
    accumulate cached RDDs once the harness releases them — the
    flat-storage-memory invariant, asserted via the JVM's storage
    status."""
    from target_s3_parquet_spark.operators import _util as U

    # reset to a known storage baseline: other suites in the shared
    # session may legitimately hold caches of their own
    spark.catalog.clearCache()
    U.release_rank_caches()  # drain handles other tests registered
    jsc = spark.sparkContext._jsc.sc()
    baseline = len(jsc.getRDDStorageInfo())
    df = spark.range(1000).withColumnRenamed("id", "k")
    for _ in range(3):
        out = U.two_phase_rank(df, ["k"], rank_name="rn")
        assert out.count() == 1000  # materialize before release
    assert len(U._RANK_CACHES) == 3
    assert len(jsc.getRDDStorageInfo()) > baseline, "caches live pre-release"
    released = U.release_rank_caches()
    assert released == 3 and not U._RANK_CACHES
    assert len(jsc.getRDDStorageInfo()) == baseline, "storage must drain"
    # idempotent
    assert U.release_rank_caches() == 0


def test_session_memo_caps_per_application():
    """session_memo must FIFO-evict within one application once the
    per-app cap is reached (the unbounded-snapshot-dict residual)."""
    from target_s3_parquet_spark._snapshot import session_memo

    cache: dict = {}
    for i in range(10):
        session_memo(cache, ("app", f"k{i}"), lambda i=i: i, cap=4)
    assert len(cache) == 4
    assert list(cache) == [("app", f"k{i}") for i in (6, 7, 8, 9)]
    # hit does not evict, miss from another app clears the stale ones
    assert session_memo(cache, ("app", "k9"), lambda: -1, cap=4) == 9
    session_memo(cache, ("app2", "x"), lambda: 42, cap=4)
    assert list(cache) == [("app2", "x")]


def test_replay_duplicate_heavy_no_order_col(spark):
    """VERDICT r7 #6: a duplicate-heavy source through the hash-chunk
    (no order_col) path. Duplicates co-locate per chunk by
    construction; an update-mode running count emits exactly one row
    per DATA-carrying micro-batch, so the row count of the sink pins
    the epoch structure and the max pins completeness."""
    from target_s3_parquet_spark.streaming.replay import replay_stream

    n_chunks = 4
    src = spark.createDataFrame(
        [(i % 6, f"doc{i % 6}") for i in range(60)], "k long, txt string"
    )
    # expected data-carrying chunks: distinct xxhash64 buckets
    expected_chunks = (
        src.select(
            F.pmod(
                F.xxhash64(F.struct(F.col("k"), F.col("txt"))),
                F.lit(n_chunks),
            ).alias("c")
        )
        .distinct()
        .count()
    )

    out = replay_stream(
        spark,
        src,
        lambda r: r.groupBy().count(),
        output_mode="update",
        n_chunks=n_chunks,
    ).collect()
    # one update row per data batch; empty hash buckets emit nothing
    assert len(out) == expected_chunks, (len(out), expected_chunks)
    assert max(r["count"] for r in out) == 60


def test_replay_tiny_source_clamps_chunk_count(spark):
    """The order_col split must clamp n_chunks to the row count so
    every written chunk carries data (the flush-rides-a-data-batch
    contract): 3 rows through n_chunks=8 must yield exactly 3
    micro-batches of one row each."""
    from target_s3_parquet_spark.streaming.replay import replay_stream

    src = spark.createDataFrame([(1,), (2,), (3,)], "k long")
    out = replay_stream(
        spark,
        src,
        lambda r: r.groupBy().count(),
        output_mode="update",
        n_chunks=8,
        order_col="k",
    ).collect()
    counts = sorted(r["count"] for r in out)
    assert counts == [1, 2, 3], counts


def test_kendall_tau_matches_brute_force(spark, tmp_path):
    """agg_corr_kendall_tau vs an O(n^2) brute force on a small skewed
    sample with heavy ties in both variables (the tie terms n1/n2/EW
    and the bucketed C/D decomposition all exercised)."""
    import math
    import random

    from target_s3_parquet_spark.operators.aggregates import (
        agg_corr_kendall_tau,
    )

    rng = random.Random(8)
    rows = [
        (
            i,
            rng.randint(1, 7),           # quantity: few values, many ties
            float(rng.randint(1, 40)),   # price: heavy ties too
        )
        for i in range(300)
    ]
    sf = str(tmp_path / "sf_tau")
    spark.createDataFrame(
        [(r[0], r[1] * 1.0, r[2]) for r in rows],
        "l_orderkey long, l_quantity double, l_extendedprice double",
    ).coalesce(1).write.parquet(os.path.join(sf, "lineitem.parquet"))

    got = agg_corr_kendall_tau(spark, sf).collect()[0]

    n = len(rows)
    c = d = 0
    for i in range(n):
        for j in range(i + 1, n):
            s = (rows[i][1] - rows[j][1]) * (rows[i][2] - rows[j][2])
            if rows[i][1] != rows[j][1] and rows[i][2] != rows[j][2]:
                if s > 0:
                    c += 1
                else:
                    d += 1
    from collections import Counter

    cx = Counter(r[1] for r in rows)
    cy = Counter(r[2] for r in rows)
    n0 = n * (n - 1) // 2
    n1 = sum(v * (v - 1) // 2 for v in cx.values())
    n2 = sum(v * (v - 1) // 2 for v in cy.values())
    tau = (c - d) / (math.sqrt(n0 - n1) * math.sqrt(n0 - n2))
    assert (got.n_rows, got.n_concordant, got.n_discordant) == (n, c, d)
    assert got.tau_b == pytest.approx(tau, abs=1e-9)


def test_reservoir_sample_uses_window_group_limit(spark):
    """sample_reservoir_per_group's rank<=k filter must compile to
    WindowGroupLimit (map-side per-group top-k heap) — the property
    that bounds the shuffle to groups x k at any scale — and the draw
    must be deterministic across invocations."""
    from target_s3_parquet_spark.operators.pipeline import (
        sample_reservoir_per_group,
    )

    sf = "/root/testdata/sf0.001"
    df = sample_reservoir_per_group(spark, sf)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan, plan[:500]
    a = sorted(map(tuple, df.collect()))
    b = sorted(map(tuple, sample_reservoir_per_group(spark, sf).collect()))
    assert a == b and len(a) == 20  # 5 priorities x k=4, replayable
    ranks = {}
    for r in a:
        ranks.setdefault(r[0], []).append(r[1])
    assert all(sorted(v) == [1, 2, 3, 4] for v in ranks.values())


def test_stream_asof_join_picks_latest_view(spark, tmp_path):
    """The chained interval-join + event-time argmax must select the
    LATEST qualifying view per purchase with the deterministic
    (v_ts, view_id) tie-break — pinned on a replayed micro-batch
    stream whose purchase has three candidate views, two tied on ts."""
    import datetime
    import os as _os

    from target_s3_parquet_spark.streaming.stream_queries import (
        stream_asof_join,
    )

    def ev(eid, minute, uid, typ):
        return (
            eid,
            datetime.datetime(2024, 1, 1, 10, minute),
            uid,
            typ,
            1.0,
            "{}",
        )

    rows = [
        ev(1, 0, 7, "view"),
        ev(2, 30, 7, "view"),
        ev(3, 30, 7, "view"),     # tie on ts with event 2 -> pick id 3
        ev(4, 45, 7, "purchase"),
        ev(5, 50, 8, "purchase"),  # user 8 has no view -> no row
    ]
    sf = str(tmp_path / "asof_sf")
    spark.createDataFrame(rows, EVENTS_SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(_os.path.join(sf, "events.parquet"))
    out = stream_asof_join(spark, sf).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.purchase_id, r.user_id, r.asof_view_id) == (4, 7, 3)
    assert r.asof_view_ts == datetime.datetime(2024, 1, 1, 10, 30)


def test_kruskal_wallis_matches_reference(spark, tmp_path):
    """agg_kruskal_wallis_h vs a direct midrank-formula reference on a
    small tie-heavy dataset (the doubled-rank algebra, tie correction,
    and decimal channel all exercised)."""
    import random

    from target_s3_parquet_spark.operators.aggregates import (
        agg_kruskal_wallis_h,
    )

    rng = random.Random(88)
    rows = [
        (
            i,
            1,
            "O",
            float(rng.randint(1, 30)),  # heavy ties
            datetime.datetime(1995, 6, 1),
            rng.choice(["1-URGENT", "2-HIGH", "3-MEDIUM"]),
        )
        for i in range(400)
    ]
    sf = str(tmp_path / "sf_kw")
    spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    ).coalesce(1).write.parquet(os.path.join(sf, "orders.parquet"))

    got = agg_kruskal_wallis_h(spark, sf).collect()[0]

    # reference: classic midrank H with tie correction
    vals = sorted(round(r[3] * 100) for r in rows)
    from collections import Counter

    cnt = Counter(vals)
    below = {}
    run = 0
    for v in sorted(cnt):
        below[v] = run
        run += cnt[v]
    midrank = {v: below[v] + (cnt[v] + 1) / 2 for v in cnt}
    n = len(rows)
    groups = {}
    for r in rows:
        groups.setdefault(r[5], []).append(midrank[round(r[3] * 100)])
    h = (12.0 / (n * (n + 1))) * sum(
        len(g) * (sum(g) / len(g) - (n + 1) / 2) ** 2
        for g in groups.values()
    )
    c = 1 - sum(t**3 - t for t in cnt.values()) / (n**3 - n)
    expected = h / c
    assert got.n_rows == n and got.k_groups == 3
    # the operator quantizes through DECIMAL(24,8); the reference is
    # unrounded, so compare at that grid
    assert got.h_stat == pytest.approx(expected, abs=5.1e-9)


def test_cross_correlation_lag_alignment(spark, tmp_path):
    """ts_cross_correlation_lags pairs today's COUNT with the revenue
    L days EARLIER — pinned on a 4-day series where the direction of
    the shift flips the sign of the lag-1 correlation."""
    from target_s3_parquet_spark.operators.timeseries import (
        ts_cross_correlation_lags,
    )

    # day: n orders, each 1.00 -> count c_d, revenue 100*c_d cents
    plan = {1: 1, 2: 5, 3: 2, 4: 6}
    rows = []
    k = 0
    for day, m in plan.items():
        for _ in range(m):
            k += 1
            rows.append(
                (k, 1, "O", 1.0, datetime.datetime(1995, 1, day), "1-URGENT")
            )
    sf = str(tmp_path / "sf_xc")
    spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    ).coalesce(1).write.parquet(os.path.join(sf, "orders.parquet"))

    out = {r.lag: r for r in ts_cross_correlation_lags(spark, sf).collect()}
    # lag 0: count vs own-day revenue = perfect correlation
    assert out[0].n_pairs == 4 and out[0].xcorr == pytest.approx(1.0)
    # lag 1: x=(c2,c3,c4)=(5,2,6) vs y=(rev1,rev2,rev3)=(100,500,200)
    import math

    x, y = [5, 2, 6], [100, 500, 200]
    n = 3
    sx, sy = sum(x), sum(y)
    num = n * sum(a * b for a, b in zip(x, y)) - sx * sy
    den = math.sqrt(n * sum(a * a for a in x) - sx * sx) * math.sqrt(
        n * sum(b * b for b in y) - sy * sy
    )
    assert out[1].n_pairs == 3
    assert out[1].xcorr == pytest.approx(num / den, rel=1e-9)
    assert 7 not in out  # no pairs 7 days apart in a 4-day series


def test_stream_reservoir_converges_to_batch_draw(spark):
    """The streaming bottom-k reservoir's final state must equal the
    one-shot batch hash draw row-for-row (the mergeability proof:
    bottom-k(bottom-k(S) U B) = bottom-k(S U B)), regardless of the
    content-hash chunking."""
    from pyspark.sql import Window as W

    from target_s3_parquet_spark.operators._util import t as _t
    from target_s3_parquet_spark.streaming.stream_queries import (
        stream_reservoir_sample,
    )

    sf = "/root/testdata/sf0.001"
    got = sorted(map(tuple, stream_reservoir_sample(spark, sf).collect()))
    h = F.expr(
        "CAST(conv(substring(md5(CAST(event_id AS STRING)), 1, 13),"
        " 16, 10) AS BIGINT)"
    )
    w = W.partitionBy("event_type").orderBy("hash52", "event_id")
    ref = sorted(
        map(
            tuple,
            _t(spark, sf, "events")
            .select("event_type", "event_id", "user_id", h.alias("hash52"))
            .withColumn("sample_rank", F.row_number().over(w).cast("long"))
            .filter(F.col("sample_rank") <= 4)
            .select(
                "event_type", "sample_rank", "event_id", "user_id", "hash52"
            )
            .collect(),
        )
    )
    assert got == ref and len(got) == 20


def test_mann_kendall_matches_brute_force(spark, tmp_path):
    """ts_trend_mann_kendall vs a direct O(days^2) sign-sum on a small
    series with a deliberate tie (the tie-corrected variance and the
    z channel both exercised)."""
    import math

    from target_s3_parquet_spark.operators.timeseries import (
        ts_trend_mann_kendall,
    )

    # daily revenue per day: one order of amount a_d on day d
    series = {1: 10.0, 2: 30.0, 3: 20.0, 4: 30.0, 5: 50.0}
    rows = [
        (d, 1, "O", amt, datetime.datetime(1995, 1, d), "1-URGENT")
        for d, amt in series.items()
    ]
    sf = str(tmp_path / "sf_mk")
    spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    ).coalesce(1).write.parquet(os.path.join(sf, "orders.parquet"))

    got = ts_trend_mann_kendall(spark, sf).collect()[0]

    vals = [series[d] for d in sorted(series)]
    s = sum(
        (v2 > v1) - (v2 < v1)
        for i, v1 in enumerate(vals)
        for v2 in vals[i + 1 :]
    )
    n = len(vals)
    from collections import Counter

    ties = Counter(vals)
    tie_term = sum(
        t * (t - 1) * (2 * t + 5) for t in ties.values() if t > 1
    )
    var18 = n * (n - 1) * (2 * n + 5) - tie_term
    z = s / math.sqrt(var18 / 18.0)
    assert (got.n_days, got.s_stat, got.var_numer18) == (n, s, var18)
    assert got.z_score == pytest.approx(z, abs=1e-11)


def test_theil_sen_matches_brute_force(spark, tmp_path):
    """ts_trend_theil_sen vs a direct pairwise-slope median on a small
    series with a gross outlier day (the robustness the estimator
    exists for: the outlier must not drag the slope)."""
    from target_s3_parquet_spark.operators.timeseries import (
        ts_trend_theil_sen,
    )

    series = {1: 10.0, 2: 12.0, 3: 14.0, 4: 990.0, 5: 18.0, 6: 20.0}
    rows = [
        (d, 1, "O", amt, datetime.datetime(1995, 1, d), "1-URGENT")
        for d, amt in series.items()
    ]
    sf = str(tmp_path / "sf_sen")
    spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    ).coalesce(1).write.parquet(os.path.join(sf, "orders.parquet"))

    got = ts_trend_theil_sen(spark, sf).collect()[0]

    days = sorted(series)
    cents = {d: round(series[d] * 100) for d in days}
    slopes = sorted(
        (
            (cents[dj] - cents[di]) / (dj - di),
            di - 1,  # da is days-since-1995-01-01 = day - 1
            dj - 1,
        )
        for i, di in enumerate(days)
        for dj in days[i + 1 :]
    )
    n = len(slopes)
    import math

    median = slopes[math.ceil(0.5 * n) - 1][0]
    assert got.n_pairs == n
    assert got.sen_slope_cents_per_day == pytest.approx(median, abs=5.1e-9)
    # robustness: the outlier day must not drag the slope toward it
    assert got.sen_slope_cents_per_day == pytest.approx(200.0, abs=1e-6)
