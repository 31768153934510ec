"""MinHash-LSH (B, R) parameter sweep: measured candidate volume and
recall per profile, validating SCALE.md's R-growth rule with numbers
instead of theory. (Sibling of `tools/bench_lsh.py`, the r2 sign-LSH
plane sweep over embeddings — this one sweeps the word-shingle
MinHash banding over `documents`.)

    python tools/bench_lsh_minhash.py [sf_dir]   # default /root/testdata/sf0.1

For each (bands B, rows-per-band R) profile the sweep records:
  n_candidates : distinct candidate pairs out of the banded bucket join
  n_verified   : candidates surviving the exact-Jaccard >= tau verify
  recall       : n_verified / reference true-pair count
  seconds      : wall-clock for the candidate+verify pipeline

The recall denominator comes from a REFERENCE profile with R=1 and
B=16 bands: a true pair at Jaccard j >= tau is missed with probability
(1-j)^16 <= (1-tau)^16 (~1.5e-5 at tau=0.5), so its verified pairs are
the ground truth up to that bound — exhaustive all-pairs verification
is exactly what LSH exists to avoid, and at sf0.1 it would dominate
the sweep. The reference run's verified pairs are also checked to be a
SUPERSET of every profile's (banding only ever loses candidates).

The documented scale story this measures (SCALE.md, minhash section):
raising R sharpens per-band selectivity (bucket match probability
j^R), collapsing candidate volume at the cost of recall on
low-similarity pairs; raising B buys the recall back at H = B*R
hashing cost. The per-round bench (`bench.py`) folds a 4-profile
subset into its extras as `lsh_sweep`.
"""

from __future__ import annotations

import json
import sys
import time

# Profiles swept by the CLI; bench.py uses the first four to bound its
# per-round cost. H = B*R stays <= 32 (the prod signature width).
PROFILES = [(4, 1), (4, 2), (4, 3), (4, 8), (8, 2), (8, 4), (16, 1), (16, 2)]
REFERENCE = (16, 1)  # near-exhaustive: miss prob (1-tau)^16 at threshold
TAU = 0.5


def _verified_pairs(spark, sf_dir, bands: int, rows: int):
    """Exact-verified pair set for one profile, as a {(a, b)} set —
    pair counts at sf0.1 are a few hundred, so collecting is bounded."""
    from target_s3_parquet_spark.operators.dedup import (
        _minhash_docs,
        minhash_candidates,
        near_dedup_minhash,
    )

    docs = _minhash_docs(spark, sf_dir)
    n_cand = minhash_candidates(docs, bands, rows).count()
    pairs = {
        (r.doc_a, r.doc_b)
        for r in near_dedup_minhash(
            spark, sf_dir, bands=bands, rows_per_band=rows, threshold=TAU
        ).collect()
    }
    return n_cand, pairs


def run_lsh(spark, sf_dir: str, profiles=None) -> dict:
    """Sweep the profiles; returns {"profiles": [...], "reference": ...}."""
    profiles = profiles or PROFILES
    t0 = time.time()
    _, truth = _verified_pairs(spark, sf_dir, *REFERENCE)
    ref_sec = round(time.time() - t0, 3)
    out = {
        "tau": TAU,
        "reference": {
            "bands": REFERENCE[0],
            "rows": REFERENCE[1],
            "true_pairs": len(truth),
            "seconds": ref_sec,
        },
        "profiles": [],
    }
    # First pass: collect every profile's verified pairs. The (16,1)
    # reference is near-exhaustive, not exhaustive: a profile with R>1
    # bands over hashes mh16.. that the reference never consults, so it
    # can legitimately verify a true pair the reference missed (prob
    # ~(1-tau)^16 per pair). Recall is therefore computed against the
    # UNION of all profiles' verified pairs, and reference misses are
    # reported, never asserted away.
    measured = []
    for bands, rows in profiles:
        t0 = time.time()
        n_cand, pairs = _verified_pairs(spark, sf_dir, bands, rows)
        sec = round(time.time() - t0, 3)
        measured.append((bands, rows, n_cand, pairs, sec))
        spark.catalog.clearCache()
    truth_all = set(truth)
    for _, _, _, pairs, _ in measured:
        truth_all |= pairs
    out["reference"]["missed_pairs"] = len(truth_all - truth)
    out["reference"]["true_pairs_union"] = len(truth_all)
    for bands, rows, n_cand, pairs, sec in measured:
        out["profiles"].append(
            {
                "bands": bands,
                "rows": rows,
                "n_hashes": bands * rows,
                "n_candidates": n_cand,
                "n_verified": len(pairs),
                "recall": (
                    round(len(pairs) / len(truth_all), 4) if truth_all else 1.0
                ),
                "seconds": sec,
            }
        )
    return out


def main() -> None:
    sys.path.insert(0, "/root/repo")
    from target_s3_parquet_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("bench_lsh")
    res = run_lsh(spark, sf_dir)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
