"""Landing tests for the r11 breadth keys: each pinned against an
independent pure-Python (or DuckDB-assisted) brute-force reference,
plus the ordered-fold edge-case property suite (VERDICT r10 item 8)."""

import datetime
import hashlib
import math
import os

import pytest
from hypothesis import example, given, settings
from hypothesis import strategies as st

from tests.conftest import SF_SMALL

GRID = 1099511627776.0  # 2^40


def _q(x: float) -> float:
    return math.floor(x * GRID) / GRID


# ---------------------------------------------------------------- HITS


def test_hits_matches_pure_python(spark, duck):
    from target_s3_parquet_spark.operators.graph import graph_hits_scores

    edges = duck.sql(
        """
        SELECT c.c_nationkey AS src, s.s_nationkey AS dst, COUNT(*) AS w
        FROM orders o
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        GROUP BY 1, 2
        """
    ).fetchall()
    nodes = sorted(
        r[0] for r in duck.sql("SELECT n_nationkey FROM nation").fetchall()
    )
    tw = float(sum(w for _, _, w in edges))
    wn = {(s, d): w / tw for s, d, w in edges}

    def half(scores, transpose):
        raw = {n: 0.0 for n in nodes}
        for (s, d), e in wn.items():
            src, dst = (d, s) if transpose else (s, d)
            raw[dst] += _q(e * scores[src])
        nrm = math.sqrt(sum(_q(v * v) for v in raw.values()))
        if nrm > 0:
            return {n: v / nrm for n, v in raw.items()}
        return {n: 0.0 for n in raw}

    h = {n: 1.0 for n in nodes}
    for _ in range(2):
        a = half(h, transpose=False)
        h = half(a, transpose=True)

    got = {
        r["nationkey"]: (r["hub"], r["authority"])
        for r in graph_hits_scores(spark, SF_SMALL).collect()
    }
    assert set(got) == set(nodes)
    for n in nodes:
        assert got[n][0] == h[n], (n, got[n][0], h[n])
        assert got[n][1] == a[n], (n, got[n][1], a[n])
    # normalized score vectors have (near-)unit L2 norm
    assert abs(sum(v * v for v, _ in got.values()) - 1.0) < 1e-7
    assert abs(sum(v * v for _, v in got.values()) - 1.0) < 1e-7


# -------------------------------------------------- bitext margin kNN


def test_bitext_margin_matches_bruteforce(spark, duck):
    from target_s3_parquet_spark.operators.similarity import (
        sim_bitext_margin_knn,
    )

    rows = duck.sql(
        "SELECT vec_id, embedding FROM embeddings ORDER BY vec_id"
    ).fetchall()
    vecs = {vid: [float(x) for x in emb] for vid, emb in rows}
    qs = sorted(v for v in vecs if v % 2 == 0 and v < 48)
    ys = sorted(v for v in vecs if v % 2 == 1)

    def dot(a, b):
        acc = 0.0
        for x, yv in zip(a, b):
            acc += x * yv
        return acc

    cos = {}
    for qi in qs:
        for yi in ys:
            cos[(qi, yi)] = dot(vecs[qi], vecs[yi]) / (
                math.sqrt(dot(vecs[qi], vecs[qi]))
                * math.sqrt(dot(vecs[yi], vecs[yi]))
            )
    k = 4
    mx = {}
    for qi in qs:
        top = sorted(ys, key=lambda yi: (-cos[(qi, yi)], yi))[:k]
        mx[qi] = sum(_q(cos[(qi, yi)]) for yi in top) / k
    my = {}
    for yi in ys:
        top = sorted(qs, key=lambda qi: (-cos[(qi, yi)], qi))[:k]
        my[yi] = sum(_q(cos[(qi, yi)]) for qi in top) / k
    marg = {
        (qi, yi): (
            cos[(qi, yi)] / ((mx[qi] + my[yi]) / 2)
            if (mx[qi] + my[yi]) != 0
            else 0.0
        )
        for qi in qs
        for yi in ys
    }
    fwd = {
        qi: min(ys, key=lambda yi: (-marg[(qi, yi)], yi)) for qi in qs
    }
    rev = {
        yi: min(qs, key=lambda qi: (-marg[(qi, yi)], qi)) for yi in ys
    }

    got = {
        r["query_id"]: r for r in sim_bitext_margin_knn(spark, SF_SMALL).collect()
    }
    assert sorted(got) == qs
    for qi in qs:
        yi = fwd[qi]
        assert got[qi]["matched_id"] == yi
        assert got[qi]["cosine"] == cos[(qi, yi)]
        assert got[qi]["margin"] == marg[(qi, yi)]
        assert got[qi]["mutual"] == (1 if rev[yi] == qi else 0)


# ------------------------------------------------------- DSIR weights


def _dsir_reference(docs, b=256, ngrams=24, scale=10**9, cap=10**15):
    """Pure-Python DSIR fold: docs = [(doc_id, text, lang)]."""
    feats = []  # (doc_id, pos, bucket, lang)
    for doc_id, text, lang in docs:
        toks = text.lower().split(" ")[:ngrams]
        for pos, g in enumerate(toks):
            h = int(hashlib.md5(g.encode()).hexdigest()[:7], 16) % b
            feats.append((doc_id, pos, h, lang))
    raw, tgt = {}, {}
    for _, _, h, lang in feats:
        raw[h] = raw.get(h, 0) + 1
        if lang == "en":
            tgt[h] = tgt.get(h, 0) + 1
    rtot = len(feats)
    ttot = sum(1 for f in feats if f[3] == "en")
    rq = {
        h: max(
            64,
            min(
                1024,
                (256 * (tgt.get(h, 0) + 1) * (rtot + b))
                // ((r + 1) * (ttot + b)),
            ),
        )
        for h, r in raw.items()
    }
    out = {}
    for doc_id, text, lang in docs:
        acc = scale
        toks = text.lower().split(" ")[:ngrams]
        for g in toks:
            h = int(hashlib.md5(g.encode()).hexdigest()[:7], 16) % b
            acc = max(1, min(cap, (acc * rq[h]) // 256))
        out[doc_id] = acc
    tot = sum(out.values())
    return {d: (w, w / tot) for d, w in out.items()}


def test_dsir_weights_match_pure_python(spark, duck):
    from target_s3_parquet_spark.operators.pipeline import (
        corpus_dsir_importance_weights,
    )

    docs = duck.sql("SELECT doc_id, text, lang FROM documents").fetchall()
    ref = _dsir_reference(docs)
    got = {
        r["doc_id"]: (r["w_scaled"], r["weight"])
        for r in corpus_dsir_importance_weights(spark, SF_SMALL).collect()
    }
    assert set(got) == set(ref)
    for d in ref:
        assert got[d][0] == ref[d][0], (d, got[d], ref[d])
        assert got[d][1] == pytest.approx(ref[d][1], abs=1e-15)
    # the resampling property: weights sum to 1 within one ulp per doc
    assert abs(sum(w for _, w in got.values()) - 1.0) < 1e-12 * len(got)


def test_dsir_edge_cases_empty_and_short_docs(spark, tmp_path):
    from target_s3_parquet_spark.operators.pipeline import (
        corpus_dsir_importance_weights,
    )

    docs = [
        (0, "", "en"),  # empty text -> 1 empty-string token
        (1, "hello", "en"),  # single token
        (2, " ".join(["tok"] * 40), "de"),  # beyond the 24-gram cap
        (3, "hello world hello world", "de"),
    ]
    sf = str(tmp_path / "sf_dsir")
    spark.createDataFrame(
        [(d, t_, lg, "src0", len(t_)) for d, t_, lg in docs],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(1).write.parquet(os.path.join(sf, "documents.parquet"))
    ref = _dsir_reference(docs)
    got = {
        r["doc_id"]: (r["w_scaled"], r["weight"])
        for r in corpus_dsir_importance_weights(spark, sf).collect()
    }
    assert set(got) == set(ref)
    for d in ref:
        assert got[d][0] == ref[d][0], (d, got[d], ref[d])
    assert abs(sum(w for _, w in got.values()) - 1.0) < 1e-12


# ------------------- KM/Nelson-Aalen ordered-fold edge-case properties


def _km_reference(cohort, base):
    """Pure-Python KM/NA over (weeks, event) cohorts derived the way
    `_km_curve` derives them from an orders table where every customer's
    first order lands on `base`."""
    # censored customers run to the global max date
    dates = [base]
    for w, evt in cohort:
        if evt:
            dates.append(base + datetime.timedelta(days=7 * w))
    md = max(dates)
    durations = []
    for w, evt in cohort:
        if evt:
            durations.append((w, 1))
        else:
            durations.append(((md - base).days // 7, 0))
    wk = {}
    for w, evt in durations:
        d, c = wk.get(w, (0, 0))
        wk[w] = (d + evt, c + (1 - evt))
    weeks = sorted(wk)
    out = []
    surv, haz = 1.0, 0.0
    for i, w in enumerate(weeks):
        d, c = wk[w]
        n = sum(dd + cc for ww, (dd, cc) in wk.items() if ww >= w)
        if d > 0:
            surv = surv * ((float(n) - float(d)) / float(n))
            haz = haz + (float(d) / float(n))
            out.append((w, n, d, c, surv, haz))
    return out


@given(
    st.lists(
        st.tuples(st.integers(0, 10), st.booleans()),
        min_size=1,
        max_size=25,
    )
)
@example([(3, False), (5, False)])  # all censored -> empty curve
@example([(4, True)])  # single-event cohort
@example([(2, True), (2, True), (2, False), (7, True)])  # same-week ties
@settings(max_examples=10, deadline=None)
def test_km_fold_matches_python_reference(spark, tmp_path_factory, raw):
    """VERDICT r10 item 8: the ordered-fold exactness channel on KM /
    Nelson-Aalen edge cases — all-censored cohorts, same-week ties,
    single-event cohorts — Spark fold vs pure-Python, bit-exact."""
    from target_s3_parquet_spark.operators.timeseries import (
        survival_kaplan_meier,
    )

    base = datetime.date(2000, 1, 3)
    rows = []
    oid = 0
    for cust, (w, evt) in enumerate(raw):
        rows.append(
            (oid, cust, datetime.datetime.combine(base, datetime.time()))
        )
        oid += 1
        if evt:
            sd = base + datetime.timedelta(days=7 * w)
            rows.append(
                (oid, cust, datetime.datetime.combine(sd, datetime.time()))
            )
            oid += 1
    sf = str(tmp_path_factory.mktemp("sf_kmprop"))
    spark.createDataFrame(
        rows, "o_orderkey long, o_custkey long, o_orderdate timestamp"
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(sf, "orders.parquet")
    )

    # reference cohort: an event at week 0 (sd == fd + 0..6 days) is
    # only an event if sd > fd; w=0+event means a later order within
    # the first week -- we place sd exactly 7*w days out, so w=0 events
    # have sd == fd and are NOT second orders; treat them as censored
    cohort = [(w, evt and w > 0) for w, evt in raw]
    ref = _km_reference(cohort, base)
    got = [
        (
            r["t_week"],
            r["n_risk"],
            r["n_events"],
            r["n_censored"],
            r["survival_km"],
            r["cum_hazard_na"],
        )
        for r in survival_kaplan_meier(spark, sf)
        .orderBy("t_week")
        .collect()
    ]
    assert got == ref, (got, ref)


# ----------------------------------------------------- batch-2 pins


def test_mrr_matches_bruteforce(spark, duck):
    from target_s3_parquet_spark.operators.pipeline import eval_mrr_at_k

    rows = duck.sql(
        """SELECT o_custkey,
                  LEAST(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                             AS BIGINT), 30000000) AS cents,
                  o_orderkey,
                  CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
                       THEN 1 ELSE 0 END AS y
           FROM orders"""
    ).fetchall()
    by_cust = {}
    for ck, cents, ok, y in rows:
        by_cust.setdefault(ck, []).append((-cents, ok, y))
    fr = {}
    for ck, lst in by_cust.items():
        for r, (_, _, y) in enumerate(sorted(lst), start=1):
            if y == 1:
                fr[ck] = r
                break
    nq = len(by_cust)
    got = {r["k"]: r for r in eval_mrr_at_k(spark, SF_SMALL).collect()}
    for k in (1, 3, 5, 10):
        hits = [r for r in fr.values() if r <= k]
        assert got[k]["n_queries"] == nq
        assert got[k]["n_hit"] == len(hits)
        assert got[k]["mrr"] == sum(2520 // r for r in hits) / (2520 * nq)


def test_bootstrap_ci_matches_bruteforce(spark, duck):
    from target_s3_parquet_spark.operators.pipeline import (
        _BOOT_B,
        _BOOT_THRESH,
        eval_bootstrap_ci_hash,
    )

    rows = duck.sql(
        """SELECT c_custkey, c_nationkey,
                  CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)
           FROM customer"""
    ).fetchall()

    def weight(ck, b):
        h = int(hashlib.md5(f"{ck}:{b}".encode()).hexdigest()[:7], 16)
        for w, t_ in enumerate(_BOOT_THRESH):
            if h < t_:
                return w
        return 9

    reps = {}
    pts = {}
    for ck, nat, cents in rows:
        pts.setdefault(nat, []).append(cents)
        for b in range(1, _BOOT_B + 1):
            w = weight(ck, b)
            s, n = reps.get((nat, b), (0, 0))
            reps[(nat, b)] = (s + w * cents, n + w)
    got = {
        r["nationkey"]: r
        for r in eval_bootstrap_ci_hash(spark, SF_SMALL).collect()
    }
    for nat in pts:
        means = sorted(
            (s / n / 100.0, b)
            for (na, b), (s, n) in reps.items()
            if na == nat and n > 0
        )
        assert got[nat]["point_mean"] == sum(pts[nat]) / len(pts[nat]) / 100.0
        assert got[nat]["n_rows"] == len(pts[nat])
        assert got[nat]["ci_lo"] == means[1][0]
        assert got[nat]["ci_hi"] == means[len(means) - 2][0]


def test_moments_merge_is_exact_everywhere(spark):
    from target_s3_parquet_spark.operators.pipeline import (
        agg_moments_merge_check,
    )

    rows = agg_moments_merge_check(spark, SF_SMALL).collect()
    assert len(rows) == 5  # TPC-H priorities
    assert all(r["merge_exact"] == 1 for r in rows)
    assert all(r["pop_variance"] >= 0 for r in rows)


def test_bradley_terry_matches_pure_python(spark, duck):
    from target_s3_parquet_spark.operators.pipeline import (
        eval_bradley_terry_strength,
    )

    duels = duck.sql(
        """
        WITH ord_nat AS (
          SELECT l.l_orderkey AS ok, s.s_nationkey AS nat,
                 CAST(SUM(CAST(CAST(l.l_extendedprice AS DECIMAL(18,2))
                               * 100 AS BIGINT)) AS BIGINT) AS cents
          FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
          GROUP BY 1, 2
        )
        SELECT CASE WHEN a.cents > b.cents THEN a.nat ELSE b.nat END,
               CASE WHEN a.cents > b.cents THEN b.nat ELSE a.nat END
        FROM ord_nat a JOIN ord_nat b
          ON a.ok = b.ok AND a.nat < b.nat AND a.cents <> b.cents
        """
    ).fetchall()
    nodes = sorted(
        r[0] for r in duck.sql("SELECT n_nationkey FROM nation").fetchall()
    )
    n = len(duels)
    wins, gm = {}, {}
    for w, l in duels:
        wins[w] = wins.get(w, 0) + 1
        k = (min(w, l), max(w, l))
        gm[k] = gm.get(k, 0) + 1
    grid, grid20 = 1099511627776.0, 1048576.0
    pd_ = {}
    for (a, b), g in gm.items():
        pd_[(a, b)] = g / n
        pd_[(b, a)] = g / n
    sv = {i: 1.0 for i in nodes}
    for _ in range(3):
        dsum = {i: 0.0 for i in nodes}
        for (i, j), p in pd_.items():
            dsum[i] += math.floor(p / (sv[i] + sv[j]) * grid) / grid
        sp = {
            i: (sv[i] if dsum[i] == 0 else (wins.get(i, 0) / n) / dsum[i])
            for i in nodes
        }
        tot = sum(math.floor(v * grid20) / grid20 for v in sp.values())
        sv = {i: max(0.015625, min(64.0, 25.0 * v / tot)) for i, v in sp.items()}
    games = {i: 0 for i in nodes}
    for (a, b), g in gm.items():
        games[a] += g
        games[b] += g
    got = {
        r["nationkey"]: r
        for r in eval_bradley_terry_strength(spark, SF_SMALL).collect()
    }
    assert set(got) == set(nodes)
    for i in nodes:
        assert got[i]["n_wins"] == wins.get(i, 0)
        assert got[i]["n_games"] == games[i]
        assert got[i]["bt_strength"] == sv[i], (i, got[i], sv[i])


def test_heaps_curve_matches_bruteforce(spark, duck):
    from target_s3_parquet_spark.operators.pipeline import vocab_heaps_curve

    docs = duck.sql(
        "SELECT doc_id, text FROM documents ORDER BY doc_id"
    ).fetchall()
    seen, first = set(), {}
    r = 0
    for _, text in docs:
        for tok in text.lower().split(" "):
            r += 1
            if tok not in seen:
                seen.add(tok)
                first[tok] = r
    n_tok = r
    got = {
        row["checkpoint"]: row
        for row in vocab_heaps_curve(spark, SF_SMALL).collect()
    }
    for cp in (1000, 2000, 4000, 8000, 16000):
        types = sum(1 for v in first.values() if v <= cp)
        assert got[cp]["n_tokens_seen"] == min(cp, n_tok)
        assert got[cp]["n_types"] == types
        assert got[cp]["type_token_ratio"] == types / min(cp, n_tok)


def test_pacf_is_durbin_levinson_of_acf(spark):
    from target_s3_parquet_spark.operators.timeseries import (
        ts_pacf_durbin_levinson,
    )
    from decimal import ROUND_HALF_UP, Decimal

    def guard(x):
        return float(
            Decimal(repr(x)).quantize(Decimal("1e-12"), ROUND_HALF_UP)
        )

    rows = {
        r["lag"]: r
        for r in ts_pacf_durbin_levinson(spark, SF_SMALL).collect()
    }
    r1, r2, r3 = (rows[k]["acf"] for k in (1, 2, 3))
    p11 = r1
    p22 = (r2 - r1 * r1) / (1.0 - r1 * r1)
    p21 = p11 - p22 * p11
    p33 = (r3 - p21 * r2 - p22 * r1) / (1.0 - p21 * r1 - p22 * r2)
    assert rows[1]["pacf"] == guard(p11)
    assert rows[2]["pacf"] == guard(p22)
    assert rows[3]["pacf"] == guard(p33)
    # ACF at lag 1 must be in [-1, 1]; PACF(1) == ACF(1) by definition
    assert -1.0 <= r1 <= 1.0


def test_freshness_audit_matches_duckdb_dates(spark, duck):
    from target_s3_parquet_spark.operators.pipeline import dq_freshness_audit

    got = {r["tbl"]: r for r in dq_freshness_audit(spark, SF_SMALL).collect()}
    assert set(got) == {"orders", "lineitem", "events"}
    asof = max(
        duck.sql(
            "SELECT GREATEST((SELECT MAX(CAST(o_orderdate AS DATE)) FROM orders),"
            " (SELECT MAX(CAST(l_shipdate AS DATE)) FROM lineitem),"
            " (SELECT MAX(CAST(ts AS DATE)) FROM events))"
        ).fetchall()
    )[0]
    for tbl, col, src in (
        ("orders", "o_orderdate", "orders"),
        ("lineitem", "l_shipdate", "lineitem"),
        ("events", "ts", "events"),
    ):
        n, lo, hi = duck.sql(
            f"SELECT COUNT(*), MIN(CAST({col} AS DATE)),"
            f" MAX(CAST({col} AS DATE)) FROM {src}"
        ).fetchall()[0]
        assert got[tbl]["n_rows"] == n
        assert got[tbl]["first_date"] == str(lo)
        assert got[tbl]["last_date"] == str(hi)
        assert got[tbl]["staleness_days"] == (asof - hi).days


def test_pca_loading_is_unit_and_rayleigh_dominant(spark, duck):
    from target_s3_parquet_spark.operators.similarity import (
        emb_pca_power_iteration,
    )

    rows = emb_pca_power_iteration(spark, SF_SMALL).collect()
    assert len(rows) == 64
    x = [r["loading"] for r in sorted(rows, key=lambda r: r["dim"])]
    ray = rows[0]["rayleigh"]
    assert all(r["rayleigh"] == ray for r in rows)
    # unit loading vector (within grid quantization)
    assert abs(sum(v * v for v in x) - 1.0) < 1e-5
    # Rayleigh quotient of the trace-normalized Gram sits in (0, 1]
    # and must dominate the average eigenvalue 1/64
    assert 1.0 / 64.0 < ray <= 1.0 + 1e-9


# ----------------------------------------------------- wave-3 pins


def test_ra_linkpred_matches_bruteforce(spark, duck):
    from target_s3_parquet_spark.operators.graph import (
        _RA_LCM,
        graph_link_prediction_ra,
    )

    strong = duck.sql(
        """
        WITH edges AS (
          SELECT c.c_nationkey AS src, s.s_nationkey AS dst, COUNT(*) AS w
          FROM orders o
          JOIN customer c ON o.o_custkey = c.c_custkey
          JOIN lineitem l ON l.l_orderkey = o.o_orderkey
          JOIN supplier s ON l.l_suppkey = s.s_suppkey
          GROUP BY 1, 2
        ),
        pairs AS (
          SELECT LEAST(src, dst) AS a, GREATEST(src, dst) AS b, SUM(w) AS w
          FROM edges WHERE src <> dst GROUP BY 1, 2
        ),
        tot AS (SELECT COUNT(*) AS n, SUM(w) AS s FROM pairs)
        SELECT a, b FROM pairs, tot WHERE 2 * tot.n * pairs.w > 3 * tot.s
        """
    ).fetchall()
    adj = {}
    for a, b in strong:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    edges = {(a, b) for a, b in strong}
    got = {
        (r["a"], r["b"]): r
        for r in graph_link_prediction_ra(spark, SF_SMALL).collect()
    }
    exp = {}
    for a in adj:
        for b in adj:
            if a < b and (a, b) not in edges:
                cn = adj[a] & adj[b]
                if cn:
                    exp[(a, b)] = (
                        len(cn),
                        sum(_RA_LCM // len(adj[z]) for z in cn),
                    )
    assert set(got) == set(exp)
    for k, (cn, ra) in exp.items():
        assert got[k]["common_nbrs"] == cn
        assert got[k]["ra_scaled"] == ra
        assert got[k]["ra_index"] == ra / _RA_LCM


def test_priority_sample_matches_bruteforce(spark, duck):
    from target_s3_parquet_spark.operators.pipeline import sample_priority_wor

    rows = duck.sql(
        """SELECT c_custkey,
                  ABS(CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100
                           AS BIGINT)) + 1
           FROM customer"""
    ).fetchall()
    pri = []
    for ck, w in rows:
        h = int(hashlib.md5(f"pri:{ck}".encode()).hexdigest()[:7], 16) + 1
        pri.append((-((w << 28) // h), ck, w))
    pri.sort()
    tau = -pri[100][0]
    exp = {ck: (w, -q) for q, ck, w in pri[:100]}
    got = {
        r["c_custkey"]: r
        for r in sample_priority_wor(spark, SF_SMALL).collect()
    }
    assert set(got) == set(exp)
    for ck, (w, q) in exp.items():
        assert got[ck]["w_cents"] == w
        assert got[ck]["priority_scaled"] == q
        assert got[ck]["est_weight_cents"] == max(float(w), float(tau))
    # Duffield-Lund-Thorup HT totals are unbiased for the population
    # sum; with k=100 the deterministic-hash realization should land
    # well within ±25% of the true total.
    true_total = sum(w for _, w in rows)
    ht_total = sum(r["est_weight_cents"] for r in got.values())
    assert 0.75 * true_total < ht_total < 1.25 * true_total


def test_dsir_resample_selects_highest_priorities(spark):
    from target_s3_parquet_spark.operators.pipeline import (
        corpus_dsir_importance_weights,
        corpus_dsir_resample_apply,
    )

    w = {
        r["doc_id"]: r["w_scaled"]
        for r in corpus_dsir_importance_weights(spark, SF_SMALL).collect()
    }
    pri = []
    for d, ws in w.items():
        h = int(hashlib.md5(f"dsir:{d}".encode()).hexdigest()[:7], 16) + 1
        pri.append((-(ws / h), d))
    pri.sort()
    exp = {d for _, d in pri[:50]}
    got = corpus_dsir_resample_apply(spark, SF_SMALL).collect()
    assert len(got) == 50
    assert {r["doc_id"] for r in got} == exp
    for r in got:
        assert r["w_scaled"] == w[r["doc_id"]]
        assert r["est_weight_scaled"] >= r["w_scaled"] - 1e-9


def test_markov_attribution_invariants(spark, duck):
    from target_s3_parquet_spark.operators.timeseries import (
        events_markov_attribution,
    )

    rows = events_markov_attribution(spark, SF_SMALL).collect()
    assert {r["channel"] for r in rows} == {"click", "error", "signup", "view"}
    base = rows[0]["base_conv_prob"]
    assert all(r["base_conv_prob"] == base for r in rows)
    assert 0.0 < base <= 1.0
    for r in rows:
        # removing a channel can only reduce conversion probability
        assert r["removal_conv_prob"] <= base + 1e-12
        assert r["removal_effect"] >= -1e-12
    # attribution shares sum to 1 (all effects positive on this data)
    assert abs(sum(r["attribution"] for r in rows) - 1.0) < 1e-9


def test_pc1_share_cross_checks_rayleigh(spark):
    from target_s3_parquet_spark.operators.similarity import (
        emb_pc1_removal_variance,
    )

    row = emb_pc1_removal_variance(spark, SF_SMALL).collect()[0]
    assert row["n_vectors"] == 500
    assert 0.0 < row["pc1_share"] <= 1.0
    assert abs(row["pc1_share"] + row["residual_share"] - 1.0) < 1e-12
    # the applied share and the trained Rayleigh quotient estimate the
    # same eigenvalue; 4 power-iteration rounds get them close
    assert abs(row["pc1_share"] - row["rayleigh_trained"]) < 0.05


# ----------------------------------------------------- wave-4 pins


def test_kneser_ney_matches_bruteforce(spark, duck):
    from target_s3_parquet_spark.operators.extensions import (
        text_kneser_ney_bigram_top,
    )

    docs = duck.sql("SELECT text FROM documents").fetchall()
    bi = {}
    for (text,) in docs:
        ws = text.lower().split(" ")
        for a, b in zip(ws, ws[1:]):
            bi[(a, b)] = bi.get((a, b), 0) + 1
    c1, n_after, n_before = {}, {}, {}
    for (a, b), c in bi.items():
        c1[a] = c1.get(a, 0) + c
        n_after[a] = n_after.get(a, 0) + 1
        n_before[b] = n_before.get(b, 0) + 1
    n_bi = len(bi)
    scored = [
        (
            max(c - 0.75, 0.0) / c1[a]
            + (0.75 * n_after[a] / c1[a]) * (n_before[b] / n_bi),
            a,
            b,
            c,
        )
        for (a, b), c in bi.items()
    ]
    top = sorted(scored, key=lambda x: (-x[0], x[1], x[2]))[:20]
    got = text_kneser_ney_bigram_top(spark, SF_SMALL).collect()
    assert len(got) == 20
    for row, (p, a, b, c) in zip(got, top):
        assert (row["w1"], row["w2"], row["c12"]) == (a, b, c)
        assert row["p_kn"] == p
    # the KN probability conditional on any context sums to ~1
    some_w1 = got[0]["w1"]
    tot = sum(
        max(c - 0.75, 0.0) / c1[some_w1]
        + (0.75 * n_after[some_w1] / c1[some_w1]) * (n_before[b] / n_bi)
        for (a, b), c in bi.items()
        if a == some_w1
    )
    # interpolated mass only covers observed continuations here, so
    # the observed sum is <= 1 and close when coverage is dense
    assert tot <= 1.0 + 1e-9


def test_rbo_matches_bruteforce(spark, duck):
    from target_s3_parquet_spark.operators.pipeline import (
        eval_rank_biased_overlap,
    )

    rev = duck.sql(
        """SELECT l_partkey,
                  CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
                                * 100 AS BIGINT)) AS BIGINT)
           FROM lineitem GROUP BY 1"""
    ).fetchall()
    qty = duck.sql(
        """SELECT l_partkey, CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT)
           FROM lineitem GROUP BY 1"""
    ).fetchall()

    def ranks(rows):
        out = {}
        for r, (_, pk) in enumerate(
            sorted(((-m, pk) for pk, m in rows)), start=1
        ):
            out[pk] = r
        return out

    ra, rb = ranks(rev), ranks(qty)
    grid = 1099511627776.0
    rbo = 0.0
    for d in range(1, 51):
        x = sum(1 for pk in ra if max(ra[pk], rb.get(pk, 10**9)) <= d)
        pw = 1.0
        for _ in range(d - 1):
            pw = pw * 0.9
        rbo += math.floor(pw * (x / d) * grid) / grid
    rbo *= 0.1
    row = eval_rank_biased_overlap(spark, SF_SMALL).collect()[0]
    assert row["depth"] == 50
    assert row["rbo"] == rbo
    assert 0.0 <= row["rbo"] <= 1.0
    x10 = sum(1 for pk in ra if max(ra[pk], rb.get(pk, 10**9)) <= 10)
    assert row["overlap_at_10"] == x10 / 10


def test_sax_symbols_match_zscore_breakpoints(spark):
    from target_s3_parquet_spark.operators.timeseries import ts_sax_symbols

    rows = ts_sax_symbols(spark, SF_SMALL).collect()
    assert len(rows) > 50
    for r in rows:
        z = r["paa_z"]
        exp = "a" if z < -0.6745 else "b" if z < 0 else "c" if z < 0.6745 else "d"
        assert r["symbol"] == exp
        assert 1 <= r["n_days"] <= 7
    # z-normalized PAA must straddle zero over a multi-year series
    assert {r["symbol"] for r in rows} >= {"b", "c"}


def test_phrase_proximity_matches_bruteforce(spark, duck):
    from target_s3_parquet_spark.functions.scalars import (
        search_phrase_proximity,
    )

    docs = duck.sql("SELECT doc_id, text FROM documents").fetchall()
    exp = {}
    for doc_id, text in docs:
        ws = text.lower().split(" ")
        pa = [i for i, w in enumerate(ws) if w == "data"]
        pb = [i for i, w in enumerate(ws) if w == "table"]
        if pa and pb:
            md = min(abs(i - j) for i in pa for j in pb)
            exp[doc_id] = (md, len(pa), len(pb), 1000000 // (1 + md))
    top = sorted(exp.items(), key=lambda kv: (-kv[1][3], kv[0]))[:20]
    got = search_phrase_proximity(spark, SF_SMALL).collect()
    assert len(got) == min(20, len(exp))
    for row, (doc_id, (md, na, nb, sc)) in zip(got, top):
        assert row["doc_id"] == doc_id
        assert row["min_dist"] == md
        assert row["n_a"] == na
        assert row["n_b"] == nb
        assert row["proximity_score"] == sc
