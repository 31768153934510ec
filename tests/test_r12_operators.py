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
