"""User-defined functions: scalar Python UDF (compat demo), vectorized
Pandas UDF, grouped-agg Pandas UDAF, and a table function via
``mapInPandas``.

Scale discipline: the Pandas variants move data via Arrow in columnar
batches (~10-100× the row-at-a-time path). The plain Python UDF exists
because the surface demands it (SURVEY §2B `udf_python`) — it is the
documented slow path, never used by other operators.

Determinism discipline: UDAF arithmetic is integer-exact (cents), so
results are independent of row order / partitioning — same property the
decimal-sum trick gives the built-in aggregates.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from target_s3_parquet_spark.operators._util import t
from target_s3_parquet_spark.registry import query


@query(
    "udf_python",
    """
    SELECT o_orderkey,
           CASE WHEN o_totalprice >= 300000.0 THEN 'platinum'
                WHEN o_totalprice >= 150000.0 THEN 'gold'
                ELSE 'standard' END AS tier
    FROM orders
    """,
)
def udf_python(spark, sf_dir):
    """Row-at-a-time Python UDF (the compat slow path)."""

    @F.udf("string")
    def tier(price: float) -> str:
        if price >= 300000.0:
            return "platinum"
        if price >= 150000.0:
            return "gold"
        return "standard"

    o = t(spark, sf_dir, "orders")
    return o.select("o_orderkey", tier("o_totalprice").alias("tier"))


@query(
    "udf_pandas_scalar",
    """
    SELECT l_orderkey, l_linenumber,
           l_extendedprice * (1 - l_discount) * 1.0625 AS taxed_price
    FROM lineitem
    """,
)
def udf_pandas_scalar(spark, sf_dir):
    """Vectorized scalar Pandas UDF — Arrow batches, numpy arithmetic
    (bit-identical to the SQL double expression)."""

    @F.pandas_udf("double")
    def taxed(price: pd.Series, disc: pd.Series) -> pd.Series:
        return price * (1 - disc) * 1.0625

    l = t(spark, sf_dir, "lineitem")
    return l.select(
        "l_orderkey",
        "l_linenumber",
        taxed("l_extendedprice", "l_discount").alias("taxed_price"),
    )


@query(
    "udaf_pandas",
    """
    SELECT l_returnflag,
           -- CAST: DuckDB widens SUM(BIGINT) to HUGEINT, which pandas
           -- materializes as float ("...0.0") and hash-mismatches
           -- Spark's int64
           CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
             AS total_cents
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def udaf_pandas(spark, sf_dir):
    """Grouped-agg Pandas UDAF. Integer cents keep the aggregate exact
    and order-independent regardless of partitioning."""

    @F.pandas_udf("long")
    def total_cents(price: pd.Series) -> int:
        return int(price.mul(100).round().astype("int64").sum())

    l = t(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag").agg(
        total_cents("l_extendedprice").alias("total_cents")
    )


@query(
    "udtf_map_in_pandas",
    """
    SELECT c_custkey, c_mktsegment,
           CAST(ROUND(c_acctbal * 100) AS BIGINT) AS acctbal_cents
    FROM customer
    WHERE c_acctbal > 0
    """,
)
def udtf_map_in_pandas(spark, sf_dir):
    """Table-function shape: mapInPandas consumes partition batches and
    emits a different schema / row count (here: filter + derive)."""

    def expand(batches):
        for pdf in batches:
            sel = pdf[pdf["c_acctbal"] > 0]
            yield pd.DataFrame(
                {
                    "c_custkey": sel["c_custkey"],
                    "c_mktsegment": sel["c_mktsegment"],
                    "acctbal_cents": sel["c_acctbal"].mul(100).round().astype("int64"),
                }
            )

    c = t(spark, sf_dir, "customer")
    return c.mapInPandas(
        expand, schema="c_custkey long, c_mktsegment string, acctbal_cents long"
    )


@query(
    "udtf_explode_native",
    """
    SELECT p_partkey, UNNEST(string_split(p_name, ' ')) AS word
    FROM part
    WHERE p_size > 40
    """,
)
def udtf_explode_native(spark, sf_dir):
    """The UDTF most pipelines actually need is explode — kept native
    (generator inside codegen), no Python round-trip."""
    p = t(spark, sf_dir, "part")
    return p.filter(F.col("p_size") > 40).select(
        "p_partkey", F.explode(F.split("p_name", " ")).alias("word")
    )


@query(
    "udaf_grouped_map",
    """
    SELECT o_orderkey, o_orderpriority,
           (o_totalprice - MIN(o_totalprice) OVER w)
           / (MAX(o_totalprice) OVER w - MIN(o_totalprice) OVER w)
             AS price_scaled
    FROM orders
    WINDOW w AS (PARTITION BY o_orderpriority)
    """,
)
def udaf_grouped_map(spark, sf_dir):
    """Grouped-map `applyInPandas`: each group arrives as ONE pandas
    DataFrame (Arrow transfer), the UDF returns a transformed frame —
    the escape hatch for per-group logic that built-ins can't express
    (model scoring per key, per-entity curve fitting). Here: per-
    priority min-max scaling, chosen because min/max/divide are IEEE-
    exact, so the pandas path is value-verifiable against the window-
    function oracle. Caveats encoded: one group must fit one executor's
    memory (min-max scaling has a pure-window form — use that when it
    exists; grouped-map is for when it doesn't), and group skew is
    task skew — salt or pre-aggregate heavy keys."""
    o = t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )

    def scale(pdf: pd.DataFrame) -> pd.DataFrame:
        lo = pdf["o_totalprice"].min()
        hi = pdf["o_totalprice"].max()
        return pd.DataFrame(
            {
                "o_orderkey": pdf["o_orderkey"],
                "o_orderpriority": pdf["o_orderpriority"],
                "price_scaled": (pdf["o_totalprice"] - lo) / (hi - lo),
            }
        )

    return o.groupBy("o_orderpriority").applyInPandas(
        scale, schema="o_orderkey long, o_orderpriority string, price_scaled double"
    )


@query(
    "udtf_python_class",
    """
    WITH w AS (
      SELECT doc_id, string_split(text, ' ') AS words
      FROM documents WHERE doc_id < 50
    )
    SELECT doc_id, i - 1 AS pos, words[i] AS token,
           CASE WHEN i < len(words)
                THEN words[i] || '_' || words[i + 1] END AS bigram
    FROM w CROSS JOIN UNNEST(range(1, len(words) + 1)) AS t(i)
    """,
)
def udtf_python_class(spark, sf_dir):
    """Class-based Python UDTF (the Spark 3.5+/4 `@udtf` decorator):
    one input row fans out to one row per token with its position and
    trailing bigram — the genuinely user-defined table function
    surface, complementing the engine-side explode
    (`udtf_explode_native`) and the Arrow-batch form
    (`udtf_map_in_pandas`).

    Scale note: a UDTF runs Python per input row, so it belongs on
    DATA-REDUCED or bounded inputs (here: 50 docs); the same fan-out
    over a full corpus should be the native explode, which stays in
    codegen. The UDTF is registered for the lateral-join SQL shape —
    Catalyst plans it as a generator, partition-parallel, no
    shuffle."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="pos int, token string, bigram string")
    class Tokenize:
        def eval(self, text: str):
            words = text.split(" ")
            n = len(words)
            for i, w in enumerate(words):
                bigram = f"{w}_{words[i + 1]}" if i + 1 < n else None
                yield i, w, bigram

    spark.udtf.register("tokenize_udtf", Tokenize)
    d = t(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    d.createOrReplaceTempView("docs_udtf_in")
    return spark.sql(
        """
        SELECT d.doc_id, tk.pos, tk.token, tk.bigram
        FROM docs_udtf_in d, LATERAL tokenize_udtf(d.text) tk
        """
    )


@query(
    "udf_sql_declarative",
    """
    SELECT l_returnflag,
           CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount)
                         AS DECIMAL(38,6))) AS DOUBLE) AS disc_revenue,
           COUNT(*) AS n
    FROM lineitem GROUP BY l_returnflag
    """,
)
def udf_sql_declarative(spark, sf_dir):
    """SQL-declared scalar UDF (Spark 4 `CREATE FUNCTION ... RETURN
    expr`): the user-defined-function SURFACE with none of the UDF
    COST — the body is a SQL expression, so Catalyst inlines it at
    resolution and the call compiles into whole-stage codegen exactly
    like writing the expression inline (no Python worker, no Arrow
    hop, full pushdown through it). This is the right default for
    shared business logic at 100 TB; the Python/pandas UDF keys exist
    for logic SQL genuinely cannot express.

    The oracle restates the inlined expression, proving the function
    boundary is semantically transparent."""
    spark.sql(
        """
        CREATE OR REPLACE TEMPORARY FUNCTION disc_price(p DOUBLE, d DOUBLE)
        RETURNS DOUBLE RETURN p * (1.0 - d)
        """
    )
    t(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem_sqludf")
    return spark.sql(
        """
        SELECT l_returnflag,
               CAST(SUM(CAST(disc_price(l_extendedprice, l_discount)
                             AS DECIMAL(38,6))) AS DOUBLE) AS disc_revenue,
               COUNT(*) AS n
        FROM lineitem_sqludf GROUP BY l_returnflag
        """
    )


@query(
    "udf_arrow_scalar",
    """
    SELECT o_orderkey,
           CASE WHEN o_totalprice >= 300000.0 THEN 'platinum'
                WHEN o_totalprice >= 150000.0 THEN 'gold'
                ELSE 'standard' END AS tier
    FROM orders
    """,
)
def udf_arrow_scalar(spark, sf_dir):
    """Arrow-optimized Python UDF (`@udf(useArrow=True)`, Spark 3.5+/4):
    the same row-level function signature as the classic pickled UDF
    (`udf_python`) but with Arrow columnar transfer under it — the
    migration path that speeds up existing row-at-a-time UDF code
    without rewriting it into pandas-Series form (`udf_pandas_scalar`
    remains the fully-vectorized top gear; this key completes the
    three-tier UDF surface: pickled row → Arrow row → pandas batch).
    Same oracle as the pickled twin, proving the transport change is
    semantics-free."""

    @F.udf("string", useArrow=True)
    def tier(price: float) -> str:
        if price >= 300000.0:
            return "platinum"
        if price >= 150000.0:
            return "gold"
        return "standard"

    o = t(spark, sf_dir, "orders")
    return o.select("o_orderkey", tier("o_totalprice").alias("tier"))


@query(
    "udaf_grouped_arrow",
    """
    SELECT event_type,
           COUNT(*) AS n,
           CAST(MAX(CAST(ROUND(value * 100) AS BIGINT))
                - MIN(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
             AS span_cents
    FROM events GROUP BY event_type
    """,
)
def udaf_grouped_arrow(spark, sf_dir):
    """Arrow-native grouped map (`groupBy().applyInArrow`, Spark 4):
    each group arrives as ONE pyarrow.Table and the function returns a
    Table — no pandas materialization at all, which matters when the
    per-group payload is large binary/tensor data that pandas would
    copy (the pandas twin is `udaf_grouped_map`). Values are lifted to
    integer cents BEFORE the Python boundary (codegen projection), so
    the Arrow-side max-min span is exact integer arithmetic and the
    oracle restates it directly.

    Scale: one shuffle on the group key; each task streams its groups
    through Arrow batches — the grouped-inference shape (per-group
    model scoring / feature extraction) at its cheapest transport."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def span(table: pa.Table) -> pa.Table:
        c = table.column("cents")
        return pa.table(
            {
                "event_type": pa.array(
                    [table.column("event_type")[0].as_py()], type=pa.string()
                ),
                "n": pa.array([table.num_rows], type=pa.int64()),
                "span_cents": pa.array(
                    [pc.max(c).as_py() - pc.min(c).as_py()], type=pa.int64()
                ),
            }
        )

    e = t(spark, sf_dir, "events").select(
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    return e.groupBy("event_type").applyInArrow(
        span, schema="event_type string, n long, span_cents long"
    )
