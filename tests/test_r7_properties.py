"""Property-based checks of the round-7 exact-statistic identities,
against naive pure-Python references on randomized inputs. These pin
the DESIGN theorems the operators rely on — bottom-k mergeability, the
Mann-Whitney/AUC rank-sum identity, the KS cross-product rational, and
the doubled-midrank integer channel — independent of any engine."""

import hashlib
from fractions import Fraction

from hypothesis import given, settings
from hypothesis import strategies as st

K = 8  # small sketch capacity so hypothesis exercises the boundary


def _h52(s: str) -> int:
    """The operators' 52-bit md5 hex-grid hash."""
    return int(hashlib.md5(s.encode()).hexdigest()[:13], 16)


def _bottom_k(hashes):
    return sorted(set(hashes))[:K]


@given(
    st.sets(st.text(min_size=1, max_size=6), max_size=30),
    st.sets(st.text(min_size=1, max_size=6), max_size=30),
)
@settings(max_examples=50, deadline=None)
def test_bottom_k_mergeability(a, b):
    """bottom-k(bottom-k(A) ∪ bottom-k(B)) == bottom-k(A ∪ B) — the
    theorem that makes `agg_kmv_distinct_union`'s union row and
    `stream_kmv_distinct`'s epoch merge EXACT, not approximate."""
    ha = [_h52(x) for x in a]
    hb = [_h52(x) for x in b]
    merged = _bottom_k(_bottom_k(ha) + _bottom_k(hb))
    direct = _bottom_k(ha + hb)
    assert merged == direct


@given(
    st.lists(
        st.tuples(st.integers(min_value=0, max_value=50), st.booleans()),
        min_size=2,
        max_size=60,
    )
)
@settings(max_examples=50, deadline=None)
def test_auc_rank_sum_identity(rows):
    """2U from per-score (p, cum-neg-below, n) == the naive pairwise
    sum of 2*[pos > neg] + 1*[tie] — `eval_auc_rank_sum`'s identity."""
    pos = [s for s, y in rows if y]
    neg = [s for s, y in rows if not y]
    if not pos or not neg:
        return
    naive_2u = sum(
        2 if p > n else (1 if p == n else 0) for p in pos for n in neg
    )
    by_score = {}
    for s, y in rows:
        p, ng = by_score.get(s, (0, 0))
        by_score[s] = (p + y, ng + (not y))
    cum_below, channel_2u = 0, 0
    for s in sorted(by_score):
        p, ng = by_score[s]
        channel_2u += p * (2 * cum_below + ng)
        cum_below += ng
    assert channel_2u == naive_2u
    assert 0 <= Fraction(channel_2u, 2 * len(pos) * len(neg)) <= 1


@given(
    st.lists(
        st.tuples(st.integers(min_value=0, max_value=30), st.booleans()),
        min_size=2,
        max_size=60,
    )
)
@settings(max_examples=50, deadline=None)
def test_ks_cross_product_identity(rows):
    """max |CA*nb - CB*na| / (na*nb) == max |F_a(v) - F_b(v)| — the
    integer channel `agg_ks_test_two_sample` decides its max in."""
    a = sorted(s for s, y in rows if y)
    b = sorted(s for s, y in rows if not y)
    if not a or not b:
        return
    na, nb = len(a), len(b)
    values = sorted(set(a) | set(b))
    naive = max(
        abs(
            Fraction(sum(1 for x in a if x <= v), na)
            - Fraction(sum(1 for x in b if x <= v), nb)
        )
        for v in values
    )
    ca = cb = 0
    best = 0
    for v in values:
        ca += sum(1 for x in a if x == v)
        cb += sum(1 for x in b if x == v)
        best = max(best, abs(ca * nb - cb * na))
    assert Fraction(best, na * nb) == naive


@given(st.lists(st.integers(min_value=0, max_value=10), min_size=1, max_size=50))
@settings(max_examples=50, deadline=None)
def test_doubled_midrank_channel(xs):
    """2r = 2*(strictly below) + ties + 1 equals twice the classical
    average-of-positions midrank — `agg_corr_spearman`'s integer
    channel (doubling keeps tie midpoints integral)."""
    n = len(xs)
    order = sorted(range(n), key=lambda i: xs[i])
    pos_of = {}
    for rank, i in enumerate(order, start=1):
        pos_of.setdefault(xs[i], []).append(rank)
    for v, positions in pos_of.items():
        classical_mid = Fraction(sum(positions), len(positions))
        below = sum(1 for x in xs if x < v)
        ties = len(positions)
        assert 2 * classical_mid == 2 * below + ties + 1
    # midranks preserve the total: sum(2r * count) == n*(n+1)
    total = sum(
        (2 * sum(1 for x in xs if x < v) + len(p) + 1) * len(p)
        for v, p in pos_of.items()
    )
    assert total == n * (n + 1)
