"""Round-8 OPQ LPT permutation invariants: the Spark driver-side
greedy and the DuckDB recursive-CTE greedy must produce the SAME
(dim -> sub, slot) mapping, and the mapping must be variance-balanced
in the LPT sense."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def dvar_rows(spark):
    from target_s3_parquet_spark.operators._util import t
    from target_s3_parquet_spark.operators.similarity import _vec_d

    v = t(spark, SF, "embeddings").select(
        "vec_id", _vec_d(F.col("embedding")).alias("v")
    )
    dims = v.select("vec_id", F.posexplode("v")).select(
        "vec_id", (F.col("pos") + 1).alias("dim"), F.col("col").alias("x")
    )
    return (
        dims.select("dim", F.expr("CAST(x * 1000000 AS BIGINT)").alias("xi"))
        .groupBy("dim")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("xi").alias("s1"),
            F.sum(F.expr("xi * xi")).alias("s2"),
        )
        .select(
            "dim",
            (
                F.col("n").cast("decimal(38,0)")
                * F.col("s2").cast("decimal(38,0)")
                - F.col("s1").cast("decimal(38,0)")
                * F.col("s1").cast("decimal(38,0)")
            ).alias("var_num"),
        )
        .collect()
    )


def _oracle_perm():
    """Run the registered oracle's recursive-CTE greedy standalone."""
    from target_s3_parquet_spark.operators.similarity import _OPQ_CTES

    ctes = _OPQ_CTES.replace(
        "FROM embeddings",
        f"FROM parquet_scan('{SF}/embeddings.parquet')",
    )
    rows = duckdb.sql(
        f"WITH RECURSIVE {ctes} SELECT dim, sub, slot FROM perm"
    ).fetchall()
    return {d: (s, sl) for d, s, sl in rows}


def test_lpt_mapping_matches_oracle_cte(dvar_rows):
    """Bit-for-bit agreement between the Spark-side Python greedy and
    the oracle's recursive CTE — the exactness contract that makes the
    permuted keys hash-comparable."""
    from target_s3_parquet_spark.operators.similarity import (
        _PQ_DSUB,
        _PQ_M,
        _opq_lpt_mapping,
    )

    py = {
        dim: (sub, slot)
        for dim, sub, slot in _opq_lpt_mapping(dvar_rows, _PQ_M, _PQ_DSUB)
    }
    assert py == _oracle_perm()


def test_lpt_mapping_is_lpt_balanced(dvar_rows):
    """The greedy's defining properties: every subspace gets exactly
    dsub dims with slots 0..dsub-1, and no single reassignment of a
    dimension from the heaviest subspace to the lightest one could
    narrow the load spread (the local-optimality LPT guarantees)."""
    from target_s3_parquet_spark.operators.similarity import (
        _PQ_DSUB,
        _PQ_M,
        _opq_lpt_mapping,
    )

    var = {r.dim: int(r.var_num) for r in dvar_rows}
    mapping = _opq_lpt_mapping(dvar_rows, _PQ_M, _PQ_DSUB)
    by_sub: dict = {}
    for dim, sub, slot in mapping:
        by_sub.setdefault(sub, []).append((slot, dim))
    assert sorted(by_sub) == list(range(_PQ_M))
    loads = {}
    for sub, items in by_sub.items():
        assert sorted(s for s, _ in items) == list(range(_PQ_DSUB))
        loads[sub] = sum(var[d] for _, d in items)
    spread = max(loads.values()) - min(loads.values())
    # moving the SMALLEST item off the heaviest subspace must not beat
    # the current spread (greedy local optimality on this data)
    heavy = max(loads, key=loads.get)
    light = min(loads, key=loads.get)
    smallest = min(var[d] for _, d in by_sub[heavy])
    moved = dict(loads)
    moved[heavy] -= smallest
    moved[light] += smallest
    new_spread = max(moved.values()) - min(moved.values())
    assert spread <= new_spread, (spread, new_spread, loads)
    # and the balance is tight in relative terms on this corpus
    assert spread / max(loads.values()) < 0.2, loads


def test_bench_opq_selection_contract():
    """The bench must always include identity in the candidate set and
    derive the lift from the SELECTED transform (so the recorded lift
    can only be negative if selection itself misranks on validation)."""
    import tools.bench_opq as bo

    src = open(bo.__file__).read()
    assert '("identity", plain)' in src and '("lpt", permuted)' in src
    assert bo.NQ_EVAL == 16  # r7-comparable eval split
    # validation queries disjoint from eval queries
    assert "selected" in src and "val_recall" in src
