"""Landing tests for the r12 breadth keys: each pinned against an
independent pure-Python (or DuckDB-assisted) brute-force reference."""

import hashlib

from tests.conftest import SF_SMALL

# ------------------------------------------------------------- UniMax


def _greedy_unimax(caps: dict, budget: int) -> dict:
    """The literal UniMax greedy loop (Chung et al. 2023): while the
    smallest remaining capacity is no more than the uniform share of
    the remaining budget, allocate that language its full cap; then
    split the rest uniformly with the integer remainder handed out one
    unit each in language-code order."""
    remaining = dict(caps)
    alloc = {}
    budget_left = budget
    while remaining:
        m = len(remaining)
        share = budget_left // m
        lang, cap = min(remaining.items(), key=lambda kv: (kv[1], kv[0]))
        if cap <= share:
            alloc[lang] = cap
            budget_left -= cap
            del remaining[lang]
        else:
            rem = budget_left % m
            for i, lg in enumerate(sorted(remaining)):
                alloc[lg] = share + (1 if i < rem else 0)
            break
    return alloc


def test_unimax_matches_greedy_waterfilling(spark, duck):
    from target_s3_parquet_spark.operators.pipeline import (
        corpus_unimax_mixture,
    )

    rows = duck.sql(
        "SELECT lang, CAST(SUM(n_chars) AS BIGINT) FROM documents"
        " GROUP BY lang"
    ).fetchall()
    chars = dict(rows)
    caps = {lg: 2 * c for lg, c in chars.items()}
    budget = (139 * sum(chars.values())) // 100
    exp = _greedy_unimax(caps, budget)

    got = {r["lang"]: r for r in corpus_unimax_mixture(spark, SF_SMALL).collect()}
    assert set(got) == set(exp)
    for lg, a in exp.items():
        r = got[lg]
        assert r["allocation"] == a
        assert r["chars"] == chars[lg]
        assert r["cap_chars"] == caps[lg]
        assert r["capped"] == (1 if a == caps[lg] else 0)
        assert r["allocation"] <= r["cap_chars"]
        assert abs(r["epochs"] - a / chars[lg]) == 0.0
    # the apportionment property: the budget is hit EXACTLY
    assert sum(r["allocation"] for r in got.values()) == budget


# ----------------------------------------------------------- t-digest


def test_tdigest_rank_errors_within_bound(spark, duck):
    from target_s3_parquet_spark.operators.aggregates import (
        _TD_B,
        _TD_QS,
        agg_tdigest_quantiles,
    )

    cents = sorted(
        r[0]
        for r in duck.sql(
            "SELECT CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100"
            " AS BIGINT) FROM lineitem"
        ).fetchall()
    )
    n = len(cents)
    rows = {r["q_pct"]: r for r in agg_tdigest_quantiles(spark, SF_SMALL).collect()}
    assert set(rows) == set(_TD_QS)
    for q, r in rows.items():
        assert r["n"] == n
        assert r["target_rank"] == (q * n + 99) // 100
        # exact verify counts recomputed independently
        assert r["cnt_lt"] == sum(1 for c in cents if c < r["est_cents"])
        assert r["cnt_le"] == sum(1 for c in cents if c <= r["est_cents"])
        assert r["rank_err"] == max(
            0,
            r["cnt_lt"] + 1 - r["target_rank"],
            r["target_rank"] - r["cnt_le"],
        )
        # the t-digest guarantee: error bounded by the covering
        # cluster's size (exact thousandths of n, + tie slack)
        ci = r["cluster_id"]
        width = (_TD_B[ci + 1] - _TD_B[ci]) * n
        assert r["cluster_weight"] * 1000 <= width + 1000
        assert r["rank_err"] <= r["err_bound"]
    # the scale-function shape: tail clusters are FINER than the middle
    assert rows[1]["cluster_weight"] < rows[50]["cluster_weight"]
    assert rows[99]["cluster_weight"] < rows[50]["cluster_weight"]


def test_tdigest_merge_conserves_weight_and_bounds_error(spark):
    from target_s3_parquet_spark.operators.aggregates import (
        _TD_QS,
        agg_tdigest_merge_check,
    )

    rows = agg_tdigest_merge_check(spark, SF_SMALL).collect()
    assert {r["q_pct"] for r in rows} == set(_TD_QS)
    for r in rows:
        # merging two digests loses no weight
        assert r["merged_total"] == r["n"]
        assert r["rank_err"] <= r["err_bound"]
        assert r["cluster_weight"] >= 1


def test_tdigest_merge_tracks_single_digest(spark):
    """Merged-digest estimates must stay within the combined error
    budget of the single-pass digest: same target ranks, and each
    merged rank error within its own (wider) bound but in the same
    ballpark as the base digest's error."""
    from target_s3_parquet_spark.operators.aggregates import (
        agg_tdigest_merge_check,
        agg_tdigest_quantiles,
    )

    base = {r["q_pct"]: r for r in agg_tdigest_quantiles(spark, SF_SMALL).collect()}
    merged = {
        r["q_pct"]: r for r in agg_tdigest_merge_check(spark, SF_SMALL).collect()
    }
    for q, m in merged.items():
        assert m["target_rank"] == base[q]["target_rank"]
        assert m["rank_err"] <= m["err_bound"]


# ------------------------------------------------- SimHash pigeonhole


def test_simhash_prod_matches_allpairs_bruteforce(spark, duck):
    """Pigeonhole banding at Hamming <= 3 with 4 blocks has NO false
    negatives (a pair differing in <= 3 bits can touch at most 3
    blocks), and the exact verify removes every false positive — so
    the key's output must EQUAL the all-pairs brute force."""
    from target_s3_parquet_spark.operators.dedup import (
        _SHP_BITS,
        _SHP_K,
        text_simhash_hamming_prod,
    )

    docs = duck.sql("SELECT doc_id, lower(text) FROM documents").fetchall()
    sig = {}
    for doc_id, text in docs:
        votes = [0] * _SHP_BITS
        for w in set(text.split(" ")):
            h = int(hashlib.md5(w.encode()).hexdigest()[:15], 16)
            for b in range(_SHP_BITS):
                votes[b] += 1 if (h >> b) & 1 else -1
        sig[doc_id] = sum(1 << b for b in range(_SHP_BITS) if votes[b] > 0)

    exp = {}
    ids = sorted(sig)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            d = bin(sig[a] ^ sig[b]).count("1")
            if d <= _SHP_K:
                exp[(a, b)] = d

    out = text_simhash_hamming_prod(spark, SF_SMALL).collect()
    got = {(r["doc_a"], r["doc_b"]): r["hamming"] for r in out}
    assert got == exp
    # the funnel is honest: candidates cover at least every kept pair
    if out:
        assert out[0]["n_candidates"] >= len(got)
        assert all(r["n_candidates"] == out[0]["n_candidates"] for r in out)


# ---------------------------------------------------------- Good-Turing


def test_good_turing_matches_bruteforce(spark, duck):
    from target_s3_parquet_spark.operators.pipeline import (
        vocab_good_turing_counts,
    )

    import collections
    import re

    texts = duck.sql("SELECT lower(text) FROM documents").fetchall()
    wc = collections.Counter()
    for (txt,) in texts:
        for tok in re.split(r"[^a-z]+", txt):
            if tok:
                wc[tok] += 1
    ff = collections.Counter(wc.values())
    n_tokens = sum(wc.values())
    n1 = ff.get(1, 0)
    got = {r["freq"]: r for r in vocab_good_turing_counts(spark, SF_SMALL).collect()}
    assert set(got) == set(ff)
    for r_, n_types in ff.items():
        row = got[r_]
        assert row["n_types"] == n_types
        assert row["n_tokens_at_freq"] == r_ * n_types
        assert row["r_star"] == ((r_ + 1) * ff.get(r_ + 1, 0)) / n_types
        assert row["mass_share"] == (r_ * n_types) / n_tokens
        assert row["unseen_mass"] == n1 / n_tokens
    # masses over observed classes + nothing else account for all tokens
    assert sum(r["n_tokens_at_freq"] for r in got.values()) == n_tokens


# ------------------------------------------------------------ conformal


def test_conformal_coverage_matches_bruteforce(spark, duck):
    from target_s3_parquet_spark.operators.pipeline import (
        eval_conformal_interval,
    )

    rows = duck.sql(
        """SELECT o_orderkey, o_orderpriority,
                  CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
           FROM orders"""
    ).fetchall()
    import collections

    cal = collections.defaultdict(list)
    tst = collections.defaultdict(list)
    for ok, grp, cents in rows:
        (cal if ok % 2 == 0 else tst)[grp].append((ok, cents))
    got = {r["priority"]: r for r in eval_conformal_interval(spark, SF_SMALL).collect()}
    assert set(got) == set(cal)
    for grp, crows in cal.items():
        n_cal = len(crows)
        pred = sum(c for _, c in crows) // n_cal
        scores = sorted(
            (abs(c - pred), ok) for ok, c in crows
        )
        k = min(n_cal, ((n_cal + 1) * 9 + 9) // 10)
        qhat = scores[k - 1][0]
        trows = tst[grp]
        covered = sum(1 for _, c in trows if abs(c - pred) <= qhat)
        r = got[grp]
        assert r["n_cal"] == n_cal
        assert r["n_test"] == len(trows)
        assert r["predicted_cents"] == pred
        assert r["qhat_cents"] == qhat
        assert r["covered"] == covered
        assert r["coverage"] == covered / len(trows)


# --------------------------------------------------- PCA top-2 deflation


def test_pca_top2_orthogonal_and_consistent_with_base(spark):
    from target_s3_parquet_spark.operators.similarity import (
        emb_pca_power_iteration,
        emb_pca_top2_deflation,
    )

    base = {
        r["dim"]: r for r in emb_pca_power_iteration(spark, SF_SMALL).collect()
    }
    two = {r["dim"]: r for r in emb_pca_top2_deflation(spark, SF_SMALL).collect()}
    assert set(two) == set(range(64))
    r0 = two[0]
    # component 1 is bit-identical to the base key's component
    for d in range(64):
        assert two[d]["loading1"] == base[d]["loading"]
    assert r0["rayleigh1"] == base[0]["rayleigh"]
    # projection deflation keeps v2 orthogonal BY CONSTRUCTION
    assert abs(r0["ortho_dot"]) < 1e-6
    # the second Rayleigh quotient is a positive variance share below
    # the first (dominant) one
    assert 0.0 < r0["rayleigh2"] <= r0["rayleigh1"] + 1e-12
    # v2 is unit-norm up to quantization
    n2 = sum(two[d]["loading2"] ** 2 for d in range(64))
    assert abs(n2 - 1.0) < 1e-6


# ------------------------------------------------------- Fellegi-Sunter


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


def test_fellegi_sunter_matches_pure_python_em(spark, duck):
    import math

    from target_s3_parquet_spark.functions.text_analysis import (
        er_fellegi_sunter_weights,
    )

    rows = duck.sql(
        """SELECT c_custkey, c_name, c_nationkey, c_mktsegment,
                  CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)
           FROM customer"""
    ).fetchall()
    import collections

    blocks = collections.defaultdict(list)
    for k, nm, nat, mkt, cents in rows:
        blocks[nat].append((k, nm, mkt, cents))
    pat = collections.Counter()
    def _bracket(cents):
        # both engines' integer div TRUNCATES toward zero (negative
        # balances exist) — Python's // floors, so mirror the
        # truncation explicitly
        return cents // 100000 if cents >= 0 else -((-cents) // 100000)

    for recs in blocks.values():
        recs.sort()
        for i, (ka, nma, mkta, ca) in enumerate(recs):
            for kb, nmb, mktb, cb in recs[i + 1 :]:
                g = (
                    1 if mkta == mktb else 0,
                    1 if _bracket(ca) == _bracket(cb) else 0,
                    1 if _lev(nma, nmb) <= 2 else 0,
                )
                pat[g] += 1
    nn = sum(pat.values())
    grid20 = 1048576.0

    def clamp(x):
        return max(0.0009765625, min(0.9990234375, x))

    p, m, u = 0.125, [0.875] * 3, [0.125] * 3
    for _ in range(5):
        tw = tu = 0.0
        mw, uw = [0.0] * 3, [0.0] * 3
        for g, n in pat.items():
            pm, pu = p, 1.0 - p
            for i in range(3):
                pm = pm * (m[i] if g[i] else 1.0 - m[i])
                pu = pu * (u[i] if g[i] else 1.0 - u[i])
            w = pm / (pm + pu)
            qw = math.floor(n * w * grid20) / grid20
            qu = math.floor(n * (1.0 - w) * grid20) / grid20
            tw += qw
            tu += qu
            for i in range(3):
                if g[i]:
                    mw[i] += qw
                    uw[i] += qu
        p = clamp(tw / nn)
        m = [clamp(mw[i] / tw) for i in range(3)]
        u = [clamp(uw[i] / tu) for i in range(3)]

    got = {r["feature"]: r for r in er_fellegi_sunter_weights(spark, SF_SMALL).collect()}
    names = ["mktsegment", "balance_bracket", "name_lev2"]
    for i, nm in enumerate(names):
        r = got[nm]
        assert r["m"] == m[i]
        assert r["u"] == u[i]
        assert r["match_share"] == p
        assert r["n_pairs"] == nn
        # agreement must be MORE likely under the match class
        assert r["m"] > r["u"]
        assert r["agree_weight_ratio"] > 1.0


# --------------------------------------------------------- CDC chunking


def test_cdc_chunking_matches_python_reference(spark, duck):
    from target_s3_parquet_spark.operators.dedup import (
        docs_cdc_chunk_dedup,
    )

    import collections

    docs = duck.sql("SELECT doc_id, source, text FROM documents").fetchall()
    per = collections.defaultdict(lambda: {"docs": 0, "chunks": [], "fps": {}})
    for _, source, text in docs:
        per[source]["docs"] += 1
        cuts = [1]
        if len(text) >= 9:
            for p in range(2, len(text) - 6):
                h = int(
                    hashlib.md5(text[p - 1 : p + 7].encode()).hexdigest()[:7],
                    16,
                )
                if h % 64 == 0:
                    cuts.append(p)
        cuts.append(len(text) + 1)
        for a, b in zip(cuts, cuts[1:]):
            chunk = text[a - 1 : b - 1]
            per[source]["chunks"].append(chunk)
            per[source]["fps"][hashlib.md5(chunk.encode()).hexdigest()] = len(
                chunk
            )

    got = {r["source"]: r for r in docs_cdc_chunk_dedup(spark, SF_SMALL).collect()}
    assert set(got) == set(per)
    for src, d in per.items():
        r = got[src]
        total = sum(len(c) for c in d["chunks"])
        distinct = sum(d["fps"].values())
        assert r["n_docs"] == d["docs"]
        assert r["n_chunks"] == len(d["chunks"])
        assert r["n_distinct_chunks"] == len(d["fps"])
        assert r["total_chars"] == total
        assert r["distinct_chars"] == distinct
        assert r["dedup_ratio"] == distinct / total
        # chunks reassemble the documents exactly: totals match the
        # source's total characters
        assert total == sum(len(t) for _, s2, t in docs if s2 == src)


# -------------------------------------------------------- matrix profile


def test_matrix_profile_matches_numpy_bruteforce(spark, duck):
    import math

    from target_s3_parquet_spark.operators.timeseries import (
        ts_matrix_profile_lite,
    )

    daily = duck.sql(
        """SELECT CAST(o_orderdate AS DATE) AS d,
                  CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                           AS BIGINT)) AS BIGINT) AS v
           FROM orders GROUP BY 1 ORDER BY 1"""
    ).fetchall()
    vals = [float(v) for _, v in daily]
    n = len(vals)
    grid = 1099511627776.0

    def zwin(i):  # 0-based start
        w = vals[i : i + 7]
        mu = sum(w) / 7
        var = 0.0
        for e in w:
            var += (e - mu) * (e - mu)
        sd = math.sqrt(var / 7)
        return [(e - mu) / sd if sd > 0 else 0.0 for e in w]

    zs = {i: zwin(i) for i in range(n - 6)}
    exp = {}
    for i in zs:
        best = None
        for j in zs:
            if abs(i - j) < 4:
                continue
            acc = 0.0
            for k in range(7):
                dkk = zs[i][k] - zs[j][k]
                acc += math.floor(dkk * dkk * grid) / grid
            dd = math.sqrt(acc)
            cand = (dd, j + 1)
            if best is None or cand < best:
                best = cand
        exp[i + 1] = best

    got = {r["pos"]: r for r in ts_matrix_profile_lite(spark, SF_SMALL).collect()}
    assert set(got) == set(exp)
    md = min(d for d, _ in exp.values())
    for pos, (dd, nnp) in exp.items():
        r = got[pos]
        assert r["mp_dist"] == dd
        assert r["nn_pos"] == nnp
        assert r["is_motif"] == (1 if dd == md else 0)
        assert r["window_start"] == str(daily[pos - 1][0])
    # at least one motif pair flagged (both directions)
    assert sum(r["is_motif"] for r in got.values()) >= 2


# ------------------------------------------------ Murphy decomposition


def test_murphy_decomposition_reconstructs_binned_brier(spark, duck):
    import math

    from target_s3_parquet_spark.operators.aggregates import (
        eval_brier_murphy_decomposition,
    )

    rows = duck.sql(
        """SELECT LEAST(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                             AS BIGINT), 30000000),
                  CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                       THEN 1 ELSE 0 END
           FROM orders"""
    ).fetchall()
    import collections

    CAP, grid = 30000000, 1099511627776.0
    bins = collections.defaultdict(lambda: [0, 0, 0])
    for cents, y in rows:
        k = min(cents * 10 // CAP, 9)
        bins[k][0] += 1
        bins[k][1] += cents
        bins[k][2] += y
    n = sum(v[0] for v in bins.values())
    ybar = sum(v[2] for v in bins.values()) / n
    rel = res = 0.0
    for nb, sc, sy in bins.values():
        fk = sc / (CAP * nb)
        ok = sy / nb
        rel += math.floor(nb / n * ((fk - ok) * (fk - ok)) * grid) / grid
        res += math.floor(nb / n * ((ok - ybar) * (ok - ybar)) * grid) / grid
    unc = ybar * (1.0 - ybar)
    r = eval_brier_murphy_decomposition(spark, SF_SMALL).collect()[0]
    assert r["n"] == n
    assert r["n_bins"] == len(bins)
    assert r["base_rate"] == ybar
    assert r["reliability"] == rel
    assert r["resolution"] == res
    assert r["uncertainty"] == unc
    assert r["brier_decomposed"] == rel - res + unc
    # Murphy's inequality: resolution never exceeds uncertainty
    assert r["resolution"] <= r["uncertainty"] + 1e-12
    assert r["reliability"] >= 0.0


# ---------------------------------------------------- isotonic (PAVA)


def _pava(values, weights):
    """Classical sequential pool-adjacent-violators."""
    blocks = [[w * v, w] for v, w in zip(values, weights)]
    out = [[s, w] for s, w in blocks]
    merged = []
    for s, w in out:
        merged.append([s, w])
        while len(merged) > 1 and (
            merged[-2][0] / merged[-2][1] > merged[-1][0] / merged[-1][1]
        ):
            s2, w2 = merged.pop()
            merged[-1][0] += s2
            merged[-1][1] += w2
    fit = []
    for s, w in merged:
        fit.extend([s / w] * 1)
    # expand back to per-block values
    expanded = []
    i = 0
    for s, w in merged:
        total_w = w
        # count how many original blocks this merged block covers
        cw = 0
        k = i
        while cw < total_w:
            cw += weights[k]
            k += 1
        expanded.extend([s / w] * (k - i))
        i = k
    return expanded


def test_isotonic_matches_sequential_pava(spark, duck):
    from target_s3_parquet_spark.operators.aggregates import (
        eval_isotonic_calibration,
    )

    rows = duck.sql(
        """SELECT LEAST(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                             AS BIGINT), 30000000),
                  CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                       THEN 1 ELSE 0 END
           FROM orders"""
    ).fetchall()
    import collections

    CAP = 30000000
    bins = collections.defaultdict(lambda: [0, 0])
    for cents, y in rows:
        k = min(cents * 10 // CAP, 9)
        bins[k][0] += 1
        bins[k][1] += y
    order = sorted(bins)
    weights = [bins[k][0] for k in order]
    raw = [bins[k][1] / bins[k][0] for k in order]
    fit = _pava(raw, weights)

    got = {r["bin"]: r for r in eval_isotonic_calibration(spark, SF_SMALL).collect()}
    assert set(got) == set(order)
    viols = sum(1 for a, b in zip(raw, raw[1:]) if b < a)
    prev = -1.0
    for k, f in zip(order, fit):
        r = got[k]
        assert abs(r["iso_rate"] - f) < 1e-9, (k, r["iso_rate"], f)
        assert r["raw_rate"] == raw[order.index(k)]
        assert r["raw_violations"] == viols
        # isotonic output is nondecreasing
        assert r["iso_rate"] >= prev - 1e-12
        prev = r["iso_rate"]


# ----------------------------------------------------------- Chao1


def test_chao1_matches_bruteforce(spark, duck):
    import collections
    import re

    from target_s3_parquet_spark.operators.pipeline import (
        vocab_chao1_richness,
    )

    texts = duck.sql("SELECT lower(text) FROM documents").fetchall()
    wc = collections.Counter()
    for (txt,) in texts:
        ws = [w for w in re.split(r"[^a-z]+", txt) if w]
        for i in range(len(ws) - 2):
            wc[" ".join(ws[i : i + 3])] += 1
    s_obs = len(wc)
    n_tokens = sum(wc.values())
    ff = collections.Counter(wc.values())
    n1, n2 = ff.get(1, 0), ff.get(2, 0)
    r = vocab_chao1_richness(spark, SF_SMALL).collect()[0]
    assert r["s_obs"] == s_obs
    assert r["n_tokens"] == n_tokens
    assert r["n1"] == n1
    assert r["n2"] == n2
    assert r["chao1_estimate"] == s_obs + (n1 * (n1 - 1)) / (2 * (n2 + 1))
    assert r["good_coverage"] == 1.0 - n1 / n_tokens
    # richness extrapolates BEYOND the observed count when singletons
    # exist (the estimator's whole point on an open phrase space)
    if n1 > 1:
        assert r["chao1_estimate"] > s_obs


# ------------------------------------------------- permutation test


def test_permutation_test_matches_bruteforce(spark, duck):
    from target_s3_parquet_spark.operators.aggregates import (
        ab_test_permutation_hash,
    )

    rows = duck.sql(
        """SELECT event_id, user_id,
                  CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
           FROM events WHERE event_type = 'purchase'"""
    ).fetchall()

    def arm(prefix, key):
        return int(hashlib.md5(f"{prefix}{key}".encode()).hexdigest()[:8], 16) % 2

    na = nb = sa = sb = 0
    for eid, uid, cents in rows:
        if arm("ab:", uid) == 0:
            na += 1
            sa += cents
        else:
            nb += 1
            sb += cents
    dobs = abs(sa / na - sb / nb)
    n_ext = 0
    for b in range(40):
        n0 = n1 = s0 = s1 = 0
        for eid, uid, cents in rows:
            if arm(f"perm:{b}:", eid) == 0:
                n0 += 1
                s0 += cents
            else:
                n1 += 1
                s1 += cents
        stat = abs(s0 / n0 - s1 / n1) if n0 and n1 else 0.0
        if stat >= dobs:
            n_ext += 1

    r = ab_test_permutation_hash(spark, SF_SMALL).collect()[0]
    assert r["n_a"] == na and r["n_b"] == nb
    assert r["mean_a"] == sa / na
    assert r["mean_b"] == sb / nb
    assert r["diff_obs"] == dobs
    assert r["n_extreme"] == n_ext
    assert r["p_value"] == (1 + n_ext) / 41
    assert 0.0 < r["p_value"] <= 1.0


# --------------------------------------------- personalized pagerank


def test_ppr_matches_pure_python_and_localizes(spark, duck):
    import math

    from target_s3_parquet_spark.operators.graph import (
        graph_personalized_pagerank,
    )

    edges = duck.sql(
        """SELECT c.c_nationkey, s.s_nationkey, COUNT(*)
           FROM orders o
           JOIN customer c ON o.o_custkey = c.c_custkey
           JOIN lineitem l ON l.l_orderkey = o.o_orderkey
           JOIN supplier s ON l.l_suppkey = s.s_suppkey
           GROUP BY 1, 2"""
    ).fetchall()
    seeds = {
        r[0]
        for r in duck.sql(
            """SELECT n.n_nationkey FROM nation n
               JOIN region r ON n.n_regionkey = r.r_regionkey
               WHERE r.r_name = 'ASIA'"""
        ).fetchall()
    }
    nodes = sorted(
        r[0] for r in duck.sql("SELECT n_nationkey FROM nation").fetchall()
    )
    outw = {}
    for src, dst, w in edges:
        outw[src] = outw.get(src, 0) + w
    grid = 1099511627776.0
    ns = len(seeds)
    pr = {v: (1.0 / ns if v in seeds else 0.0) for v in nodes}
    for _ in range(3):
        s = {v: 0.0 for v in nodes}
        for src, dst, w in edges:
            s[dst] += math.floor(pr[src] * w / outw[src] * grid) / grid
        pr = {
            v: (0.15 / ns if v in seeds else 0.0) + 0.85 * s[v]
            for v in nodes
        }
    got = {r["nationkey"]: r for r in graph_personalized_pagerank(spark, SF_SMALL).collect()}
    assert set(got) == set(nodes)
    for v in nodes:
        assert got[v]["ppr"] == pr[v]
        assert got[v]["is_seed"] == (1 if v in seeds else 0)
    # personalization localizes: seed nations average strictly above
    # non-seed nations
    seed_avg = sum(pr[v] for v in seeds) / len(seeds)
    rest_avg = sum(pr[v] for v in nodes if v not in seeds) / (
        len(nodes) - len(seeds)
    )
    assert seed_avg > rest_avg


# --------------------------------------------------- count-sketch


def test_count_sketch_matches_bruteforce(spark, duck):
    import collections

    from target_s3_parquet_spark.operators.aggregates import (
        _CS_D,
        _CS_PROBES,
        _CS_W,
        agg_count_sketch_estimate,
    )

    keys = [
        r[0]
        for r in duck.sql(
            "SELECT CAST(l_suppkey AS BIGINT) FROM lineitem"
        ).fetchall()
    ]

    def h(prefix, r, k):
        return int(
            hashlib.md5(f"{prefix}{r}:{k}".encode()).hexdigest()[:7], 16
        )

    cells = collections.Counter()
    for k in keys:
        for r in range(_CS_D):
            sgn = h("css:", r, k) % 2 * 2 - 1
            cells[(r, h("csb:", r, k) % _CS_W)] += sgn
    exact = collections.Counter(keys)
    f2 = sum(c * c for c in exact.values())
    import math

    bound = math.floor(3.0 * math.sqrt(f2 / _CS_W)) + 1
    got = {r["test_key"]: r for r in agg_count_sketch_estimate(spark, SF_SMALL).collect()}
    probe_keys = {k for k in exact if 1 <= k <= _CS_PROBES}
    assert set(got) == probe_keys
    for k in probe_keys:
        ests = sorted(
            (h("css:", r, k) % 2 * 2 - 1)
            * cells.get((r, h("csb:", r, k) % _CS_W), 0)
            for r in range(_CS_D)
        )
        est = ests[2]
        r = got[k]
        assert r["exact_count"] == exact[k]
        assert r["cs_estimate"] == est
        assert r["abs_err"] == abs(est - exact[k])
        assert r["err_bound"] == bound
        assert r["within_bound"] == (1 if abs(est - exact[k]) <= bound else 0)


# -------------------------------------------------------- containment


def test_containment_matches_bruteforce_on_candidates(spark, duck):
    from target_s3_parquet_spark.operators.dedup import (
        _CONT_THRESHOLD,
        docs_minhash_containment,
    )

    sets = {}
    for doc_id, text in duck.sql(
        "SELECT doc_id, lower(text) FROM documents"
    ).fetchall():
        ws = text.split(" ")
        grams = {
            " ".join(ws[i : i + 3]) for i in range(len(ws) - 2)
        } if len(ws) >= 3 else set()
        if grams:
            sets[doc_id] = grams

    got = docs_minhash_containment(spark, SF_SMALL).collect()
    for r in got:
        a, b = sets[r["doc_a"]], sets[r["doc_b"]]
        inter = len(a & b)
        assert r["inter"] == inter
        assert r["n_grams_a"] == len(a)
        assert r["n_grams_b"] == len(b)
        assert r["containment_a"] == inter / len(a)
        assert r["containment_b"] == inter / len(b)
        assert r["jaccard"] == inter / len(a | b)
        assert max(r["containment_a"], r["containment_b"]) >= _CONT_THRESHOLD
    # candidates at full containment exist in this corpus (exact dups)
    assert any(r["containment_a"] == 1.0 for r in got)


# ---------------------------------------------------------- closeness


def test_closeness_matches_python_apsp(spark, duck):
    import collections

    from target_s3_parquet_spark.operators.graph import (
        graph_closeness_centrality,
    )

    pairs = duck.sql(
        """WITH edges AS (
             SELECT c.c_nationkey AS src, s.s_nationkey AS dst,
                    COUNT(*) AS w
             FROM orders o
             JOIN customer c ON o.o_custkey = c.c_custkey
             JOIN lineitem l ON l.l_orderkey = o.o_orderkey
             JOIN supplier s ON l.l_suppkey = s.s_suppkey
             GROUP BY 1, 2),
           p AS (SELECT LEAST(src, dst) a, GREATEST(src, dst) b,
                        SUM(w) w
                 FROM edges WHERE src <> dst GROUP BY 1, 2),
           t AS (SELECT COUNT(*) n, SUM(w) s FROM p)
           SELECT a, b FROM p, t WHERE 2 * t.n * p.w > 3 * t.s"""
    ).fetchall()
    nodes = sorted(
        r[0] for r in duck.sql("SELECT n_nationkey FROM nation").fetchall()
    )
    adj = collections.defaultdict(set)
    for a, b in pairs:
        adj[a].add(b)
        adj[b].add(a)
    got = {r["nationkey"]: r for r in graph_closeness_centrality(spark, SF_SMALL).collect()}
    assert set(got) == set(nodes)
    for v in nodes:
        # BFS from v, hop-bounded at 8 like the key
        dist = {v: 0}
        frontier = [v]
        for hop in range(1, 9):
            nxt = []
            for u in frontier:
                for w in adj[u]:
                    if w not in dist:
                        dist[w] = hop
                        nxt.append(w)
            frontier = nxt
        reach = {u: d for u, d in dist.items() if d > 0}
        r = got[v]
        assert r["n_reachable"] == len(reach)
        assert r["eccentricity"] == (max(reach.values()) if reach else 0)
        hs = sum(840 // d for d in reach.values())
        assert r["harmonic_scaled"] == hs
        assert r["harmonic_centrality"] == hs / 840.0


# -------------------------------------------------- Hanley-McNeil CI


def test_hanley_ci_matches_formula(spark, duck):
    import math

    from target_s3_parquet_spark.operators.aggregates import (
        eval_auc_hanley_ci,
        eval_auc_rank_sum,
    )

    base = eval_auc_rank_sum(spark, SF_SMALL).collect()[0]
    a, np_, nn = base["auc"], base["n_pos"], base["n_neg"]
    q1 = a / (2.0 - a)
    q2 = 2.0 * a * a / (1.0 + a)
    se = math.sqrt(
        (a * (1.0 - a) + (np_ - 1) * (q1 - a * a) + (nn - 1) * (q2 - a * a))
        / (float(np_) * nn)
    )
    r = eval_auc_hanley_ci(spark, SF_SMALL).collect()[0]
    assert r["n_pos"] == np_ and r["n_neg"] == nn
    assert r["auc"] == a
    assert r["se_hanley"] == se
    assert r["ci_lo"] == max(0.0, a - 1.96 * se)
    assert r["ci_hi"] == min(1.0, a + 1.96 * se)
    assert r["ci_lo"] < r["auc"] < r["ci_hi"]


# ---------------------------------------------------------- McNemar


def test_mcnemar_matches_bruteforce(spark, duck):
    import collections

    from target_s3_parquet_spark.operators.aggregates import (
        eval_mcnemar_paired,
    )

    lines = collections.Counter(
        r[0]
        for r in duck.sql("SELECT l_orderkey FROM lineitem").fetchall()
    )
    rows = duck.sql(
        """SELECT o_orderkey, o_orderpriority,
                  CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
           FROM orders"""
    ).fetchall()
    n = bc = bw = b = c = 0
    for ok, pri, cents in rows:
        y = 1 if pri in ("1-URGENT", "2-HIGH") else 0
        pa = 1 if cents >= 25000000 else 0
        pb = 1 if lines.get(ok, 0) >= 4 else 0
        n += 1
        if pa == y and pb == y:
            bc += 1
        elif pa != y and pb != y:
            bw += 1
        elif pa == y:
            b += 1
        else:
            c += 1
    r = eval_mcnemar_paired(spark, SF_SMALL).collect()[0]
    assert (r["n"], r["both_correct"], r["both_wrong"]) == (n, bc, bw)
    assert (r["b_only_a"], r["c_only_b"]) == (b, c)
    assert r["mcnemar_chi2"] == ((b - c) ** 2) / (b + c)
    assert r["mcnemar_chi2_cc"] == ((abs(b - c) - 1) ** 2) / (b + c)
    # the four cells partition the sample
    assert bc + bw + b + c == n


# ----------------------------------------------------- Fleiss kappa


def test_fleiss_kappa_matches_literal_formula(spark, duck):
    """Pin against the LITERAL Fleiss 1971 formula: per-subject
    pairwise agreement P_i averaged, marginal chance sum p_j^2 —
    computed rater-by-rater in Python, no algebraic restatement."""
    import collections

    from fractions import Fraction

    from target_s3_parquet_spark.operators.aggregates import (
        eval_fleiss_kappa,
    )

    lines = collections.Counter(
        r[0]
        for r in duck.sql("SELECT l_orderkey FROM lineitem").fetchall()
    )
    rows = duck.sql(
        """SELECT o_orderkey, o_orderpriority,
                  CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
           FROM orders"""
    ).fetchall()
    n_raters = 3
    subjects = []
    for ok, pri, cents in rows:
        votes = (
            (1 if cents >= 25000000 else 0)
            + (1 if lines.get(ok, 0) >= 4 else 0)
            + (1 if pri in ("1-URGENT", "2-HIGH") else 0)
        )
        subjects.append(votes)
    big_n = len(subjects)
    p_bar = Fraction(
        sum(
            v * v + (n_raters - v) * (n_raters - v) - n_raters
            for v in subjects
        ),
        big_n * n_raters * (n_raters - 1),
    )
    c1 = sum(subjects)
    c0 = n_raters * big_n - c1
    p_e = Fraction(c1 * c1 + c0 * c0, (n_raters * big_n) ** 2)
    kappa = (p_bar - p_e) / (1 - p_e)

    r = eval_fleiss_kappa(spark, SF_SMALL).collect()[0]
    assert r["n_subjects"] == big_n
    assert r["c_urgent"] == c1
    assert r["c_not"] == c0
    assert r["s_sq_sum"] == sum(
        v * v + (3 - v) * (3 - v) for v in subjects
    )
    # the exact rational agrees to the last ulp of one IEEE division
    assert abs(r["p_bar"] - float(p_bar)) < 1e-15
    assert abs(r["p_e"] - float(p_e)) < 1e-15
    assert abs(r["fleiss_kappa"] - float(kappa)) < 1e-12
    # kappa is bounded ((P_bar - P_e)/(1 - P_e) with P_bar in [0,1]);
    # on this synthetic corpus the trio lands essentially at chance
    # (|kappa| ~ 0.02), so pin the bound, not a sign
    assert -1.0 <= r["fleiss_kappa"] <= 1.0


# ------------------------------------------------- Cochran-Armitage


def test_cochran_armitage_matches_group_formula(spark, duck):
    """Pin against the classical GROUPWISE form: T = sum s_j (r_j -
    n_j R/N), Var = (R/N)(1-R/N)(sum n_j s_j^2 - (sum n_j s_j)^2/N),
    in exact Fractions over the per-dose contingency table."""
    import collections

    from fractions import Fraction

    from target_s3_parquet_spark.operators.aggregates import (
        ab_test_cochran_armitage_trend,
    )

    lines = collections.Counter(
        r[0]
        for r in duck.sql("SELECT l_orderkey FROM lineitem").fetchall()
    )
    rows = duck.sql(
        "SELECT o_orderkey, o_orderpriority FROM orders"
    ).fetchall()
    tab = collections.Counter()
    for ok, pri in rows:
        nl = lines.get(ok, 0)
        s = 0 if nl <= 2 else 1 if nl <= 4 else 2 if nl <= 6 else 3
        y = 1 if pri in ("1-URGENT", "2-HIGH") else 0
        tab[(s, y)] += 1
    big_n = sum(tab.values())
    big_r = sum(v for (s, y), v in tab.items() if y == 1)
    t_stat = sum(
        s
        * (
            Fraction(tab.get((s, 1), 0))
            - Fraction(
                (tab.get((s, 0), 0) + tab.get((s, 1), 0)) * big_r, big_n
            )
        )
        for s in range(4)
    )
    a1 = sum(s * (tab.get((s, 0), 0) + tab.get((s, 1), 0)) for s in range(4))
    a2 = sum(
        s * s * (tab.get((s, 0), 0) + tab.get((s, 1), 0)) for s in range(4)
    )
    var = (
        Fraction(big_r, big_n)
        * (1 - Fraction(big_r, big_n))
        * (a2 - Fraction(a1 * a1, big_n))
    )
    chi2 = t_stat * t_stat / var

    r = ab_test_cochran_armitage_trend(spark, SF_SMALL).collect()[0]
    assert r["n"] == big_n
    assert r["r_pos"] == big_r
    assert r["a1_score_sum"] == a1
    assert r["a2_score_sq_sum"] == a2
    assert r["b_score_pos_sum"] == sum(
        s * tab.get((s, 1), 0) for s in range(4)
    )
    assert abs(r["chi2_trend"] - float(chi2)) < 1e-9 * max(
        1.0, float(chi2)
    )
    assert abs(r["z_trend"] * r["z_trend"] - r["chi2_trend"]) == 0.0
    # bigger orders should trend MORE urgent is not guaranteed by the
    # generator — but the z direction must match the exact T's sign
    assert (r["z_trend"] > 0) == (t_stat > 0) or t_stat == 0


# -------------------------------------------------------- Wald SPRT


def test_sprt_matches_sequential_scan(spark, duck):
    """Pin against a literal one-event-at-a-time sequential scan with
    the same full-repr log-constants."""
    from target_s3_parquet_spark.operators.aggregates import (
        ab_test_sequential_sprt,
    )

    rows = duck.sql(
        "SELECT event_id, event_type FROM events ORDER BY event_id"
    ).fetchall()
    l1, l0 = 0.20067069546215124, -0.050010420574661305
    up = 2.9444389791664403
    n = k = 0
    cross_up = cross_lo = 0
    for _eid, etype in rows:
        n += 1
        k += 1 if etype == "purchase" else 0
        llr = float(k) * l1 + float(n - k) * l0
        if llr >= up and cross_up == 0:
            cross_up = n
        if llr <= -up and cross_lo == 0:
            cross_lo = n
    r = ab_test_sequential_sprt(spark, SF_SMALL).collect()[0]
    assert r["n_total"] == n
    assert r["k_total"] == k
    assert r["llr_final"] == float(k) * l1 + float(n - k) * l0
    assert r["cross_upper_n"] == cross_up
    assert r["cross_lower_n"] == cross_lo
    if cross_up and (not cross_lo or cross_up < cross_lo):
        assert r["decision"] == "accept_h1"
        assert r["cross_n"] == cross_up
    elif cross_lo:
        assert r["decision"] == "accept_h0"
        assert r["cross_n"] == cross_lo
    else:
        assert r["decision"] == "continue"
        assert r["cross_n"] == 0


# -------------------------------------------------- Hodges-Lehmann


def test_hodges_lehmann_matches_bruteforce(spark, duck):
    """Pin against the textbook estimator: median over the explicit
    list of Walsh averages (x_i + x_j)/2, i <= j, in exact Fractions."""
    import collections

    from fractions import Fraction

    from target_s3_parquet_spark.operators.aggregates import (
        agg_hodges_lehmann_location,
    )

    rows = duck.sql(
        """SELECT o_orderpriority,
                  CAST(FLOOR(CAST(datediff('day', DATE '1995-01-01',
                                           CAST(o_orderdate AS DATE))
                                  AS DOUBLE) / 7.0) AS BIGINT),
                  CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
           FROM orders"""
    ).fetchall()
    weekly = collections.defaultdict(int)
    for pri, w, cents in rows:
        weekly[(pri, w)] += cents
    bygrp = collections.defaultdict(list)
    for (pri, _w), cents in weekly.items():
        bygrp[pri].append(cents)

    def median(vals):
        vs = sorted(vals)
        m = len(vs)
        return Fraction(vs[(m - 1) // 2] + vs[m // 2], 2)

    got = {
        r["pri"]: r
        for r in agg_hodges_lehmann_location(spark, SF_SMALL).collect()
    }
    assert set(got) == set(bygrp)
    for pri, vals in bygrp.items():
        walsh = [
            Fraction(a + b, 2)
            for i, a in enumerate(vals)
            for b in vals[i:]
        ]
        r = got[pri]
        assert r["n_weeks"] == len(vals)
        assert r["n_pairs"] == len(vals) * (len(vals) + 1) // 2
        assert r["median_weekly_cents"] == float(median(vals))
        assert r["hl_weekly_cents"] == float(median(walsh))
        # HL lands inside the data range, like any location estimate
        assert min(vals) <= r["hl_weekly_cents"] <= max(vals)


# ------------------------------------------------------ Betweenness


def test_betweenness_matches_path_enumeration(spark, duck):
    """Independent pin: ENUMERATE every shortest path explicitly (DFS
    over the BFS layered DAG) and count paths through each middle
    node — the Freeman definition — then apply the key's exact
    quantization. Verifies the Brandes sigma-product identity
    sigma(s,v)*sigma(v,t) = #paths through v."""
    import collections

    from target_s3_parquet_spark.operators.graph import (
        graph_betweenness_centrality,
    )

    pairs = duck.sql(
        """
        WITH edges AS (
          SELECT c.c_nationkey AS src, s.s_nationkey AS dst,
                 COUNT(*) AS w
          FROM orders o
          JOIN customer c ON o.o_custkey = c.c_custkey
          JOIN lineitem l ON l.l_orderkey = o.o_orderkey
          JOIN supplier s ON l.l_suppkey = s.s_suppkey
          GROUP BY c.c_nationkey, s.s_nationkey
        ),
        pairs AS (
          SELECT LEAST(src, dst) AS a, GREATEST(src, dst) AS b,
                 SUM(w) AS w
          FROM edges WHERE src <> dst GROUP BY 1, 2
        ),
        tot AS (SELECT COUNT(*) AS n, SUM(w) AS s FROM pairs)
        SELECT a, b FROM pairs, tot WHERE 2 * tot.n * pairs.w > 3 * tot.s
        """
    ).fetchall()
    nodes = sorted(
        r[0] for r in duck.sql("SELECT n_nationkey FROM nation").fetchall()
    )
    adj = collections.defaultdict(set)
    for a, b in pairs:
        adj[a].add(b)
        adj[b].add(a)

    def bfs(s):
        d = {s: 0}
        order = [s]
        for u in order:
            if d[u] >= 8:
                continue
            for w in sorted(adj[u]):
                if w not in d:
                    d[w] = d[u] + 1
                    order.append(w)
        return d

    def all_shortest_paths(s, t, d):
        # walk the layered DAG backwards from t
        paths = []

        def back(u, acc):
            if u == s:
                paths.append([s] + acc)
                return
            for p in adj[u]:
                if d.get(p, 99) == d[u] - 1:
                    back(p, [u] + acc)

        back(t, [])
        return paths

    bc_scaled = collections.Counter()
    n_pair_paths = collections.Counter()
    for s in nodes:
        d = bfs(s)
        for t_ in d:
            if t_ == s:
                continue
            paths = all_shortest_paths(s, t_, d)
            through = collections.Counter(
                v for p in paths for v in p[1:-1]
            )
            for v, cnt in through.items():
                bc_scaled[v] += (cnt * 1048576) // len(paths)
                n_pair_paths[v] += 1

    got = {
        r["nationkey"]: r
        for r in graph_betweenness_centrality(spark, SF_SMALL).collect()
    }
    assert set(got) == set(nodes)
    for v in nodes:
        r = got[v]
        assert r["bc_scaled"] == bc_scaled.get(v, 0)
        assert r["n_pair_paths"] == n_pair_paths.get(v, 0)
        assert r["betweenness"] == bc_scaled.get(v, 0) / 2097152.0
    # endpoints never count themselves; some node must broker
    assert any(r["bc_scaled"] > 0 for r in got.values())


# --------------------------------------------------------------- DTW


def test_dtw_matches_column_major_dp(spark, duck):
    """Pin against an independently-structured DP (column-major,
    rolling arrays instead of the key's row-major dict), plus the
    textbook dominance property DTW <= lockstep when n == m (lockstep
    is one feasible alignment)."""
    import collections

    from target_s3_parquet_spark.operators.timeseries import (
        ts_dtw_alignment_distance,
    )

    rows = duck.sql(
        """SELECT CAST(FLOOR(CAST(datediff('day', DATE '1995-01-01',
                                           CAST(o_orderdate AS DATE))
                                  AS DOUBLE) / 7.0) AS BIGINT),
                  o_orderpriority,
                  CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
           FROM orders
           WHERE o_orderpriority IN ('1-URGENT', '5-LOW')"""
    ).fetchall()
    weekly = collections.defaultdict(int)
    for w, pri, cents in rows:
        weekly[(pri, w)] += cents
    a = [v for (_, v) in sorted(
        (w, c) for (p, w), c in weekly.items() if p == "1-URGENT"
    )]
    b = [v for (_, v) in sorted(
        (w, c) for (p, w), c in weekly.items() if p == "5-LOW"
    )]
    n, m = len(a), len(b)
    band = 10 + abs(n - m)
    big = 1 << 62
    # column-major rolling DP: prev[i] = D(i, j-1), cur[i] = D(i, j)
    prev = [big] * (n + 1)
    for j in range(1, m + 1):
        cur = [big] * (n + 1)
        for i in range(max(1, j - band), min(n, j + band) + 1):
            c = abs(a[i - 1] - b[j - 1])
            if i == 1 and j == 1:
                cur[1] = c
            else:
                best = min(
                    cur[i - 1],          # D(i-1, j)
                    prev[i],             # D(i, j-1)
                    prev[i - 1],         # D(i-1, j-1)
                )
                cur[i] = c + best
        prev = cur
    dtw = prev[n]
    lockstep = sum(abs(a[i] - b[i]) for i in range(min(n, m)))

    r = ts_dtw_alignment_distance(spark, SF_SMALL).collect()[0]
    assert r["n_a"] == n and r["n_b"] == m
    assert r["band_w"] == band
    assert r["dtw_cost_cents"] == dtw
    assert r["lockstep_cost_cents"] == lockstep
    if n == m:
        assert r["dtw_cost_cents"] <= r["lockstep_cost_cents"]
    assert r["dtw_vs_lockstep"] == (
        0.0 if lockstep == 0 else dtw / lockstep
    )


# --------------------------------------------------------- Yannakakis


def test_yannakakis_counts_match_set_computation(spark, duck):
    """Pin every stage count against a literal Python-set semijoin
    program, plus the Yannakakis guarantees: back-pass counts equal
    the distinct keys of the FULL join (dangling-free), and every
    reduction is monotone."""
    from target_s3_parquet_spark.operators.joins import (
        join_yannakakis_program,
    )

    asia = {
        r[0]
        for r in duck.sql(
            """SELECT n_nationkey FROM nation
               JOIN region ON n_regionkey = r_regionkey
               WHERE r_name = 'ASIA'"""
        ).fetchall()
    }
    cust = duck.sql(
        "SELECT c_custkey, c_nationkey FROM customer"
    ).fetchall()
    orders = duck.sql("SELECT o_orderkey, o_custkey FROM orders").fetchall()
    litems = duck.sql("SELECT l_orderkey FROM lineitem").fetchall()

    c_semi = {ck for ck, nk in cust if nk in asia}
    o_semi = {(ok, ck) for ok, ck in orders if ck in c_semi}
    o_semi_keys = {ok for ok, _ in o_semi}
    l_semi = [ok for (ok,) in litems if ok in o_semi_keys]
    l_keys = set(l_semi)
    o_back = {(ok, ck) for ok, ck in o_semi if ok in l_keys}
    o_back_cust = {ck for _, ck in o_back}
    c_back = {ck for ck in c_semi if ck in o_back_cust}

    r = join_yannakakis_program(spark, SF_SMALL).collect()[0]
    assert r["n_customer_base"] == len(cust)
    assert r["n_customer_semi"] == len(c_semi)
    assert r["n_orders_base"] == len(orders)
    assert r["n_orders_semi"] == len(o_semi)
    assert r["n_lineitem_base"] == len(litems)
    assert r["n_lineitem_semi"] == len(l_semi)
    assert r["n_orders_back"] == len(o_back)
    assert r["n_customer_back"] == len(c_back)
    # monotone reduction chain
    assert r["n_customer_semi"] >= r["n_customer_back"]
    assert r["n_orders_semi"] >= r["n_orders_back"]
    # dangling-free guarantee: back-pass orders == orders appearing
    # in the final join, and every surviving customer has an order
    joined_orders = {
        ok for ok, ck in o_semi if ok in l_keys and ck in c_semi
    }
    assert r["n_orders_back"] == len(joined_orders)
    assert r["asia_revenue"] > 0


# ------------------------------------------------------ Burrows Delta


def test_burrows_delta_matches_unquantized_reference(spark, duck):
    """Independent pin: recompute Delta in exact Fractions with NO
    quantization (the textbook formula) and require agreement within
    the accumulated 2^-30 grid error; plus the structural properties
    (non-negativity, full pair coverage, triangle-ish sanity)."""
    import collections
    import math
    import re

    from fractions import Fraction

    from target_s3_parquet_spark.operators.pipeline import (
        text_burrows_delta,
    )

    rows = duck.sql(
        "SELECT doc_id, source, lower(text) FROM documents"
    ).fetchall()
    doc_toks = {}
    for doc_id, source, txt in rows:
        toks = [w for w in re.split(r"[^a-z]+", txt) if w]
        if toks:
            doc_toks[doc_id] = (source, toks)
    wc = collections.Counter()
    for _, (_, toks) in doc_toks.items():
        wc.update(toks)
    top20 = sorted(wc, key=lambda k: (-wc[k], k))[:20]

    by_src = collections.defaultdict(list)
    for _, (src, toks) in doc_toks.items():
        by_src[src].append(toks)
    mean_f = {}
    for src, docs in by_src.items():
        for tk in top20:
            s = sum(
                Fraction(sum(1 for w in toks if w == tk), len(toks))
                for toks in docs
            )
            mean_f[(src, tk)] = s / len(docs)
    srcs = sorted(by_src)
    z = {}
    for tk in top20:
        vals = [mean_f[(s, tk)] for s in srcs]
        mu = sum(vals) / len(vals)
        var = sum(v * v for v in vals) / len(vals) - mu * mu
        sd = math.sqrt(float(var)) if var > 0 else 0.0
        for s in srcs:
            z[(s, tk)] = (
                float(mean_f[(s, tk)] - mu) / sd if sd > 0 else 0.0
            )
    exp = {}
    for i, a in enumerate(srcs):
        for b in srcs[i + 1 :]:
            exp[(a, b)] = sum(
                abs(z[(a, tk)] - z[(b, tk)]) for tk in top20
            ) / 20.0

    got = {
        (r["src_a"], r["src_b"]): r["delta_burrows"]
        for r in text_burrows_delta(spark, SF_SMALL).collect()
    }
    assert set(got) == set(exp)
    for pair, d in got.items():
        assert d >= 0.0
        # 2^-30 per-step grids, amplified by the 1/sd z-division on
        # low-variance tokens, land within ~1e-5 of the exact value
        assert abs(d - exp[pair]) < 1e-4, (pair, d, exp[pair])
    # styles differ somewhere across 20 sources
    assert max(got.values()) > 0.0
