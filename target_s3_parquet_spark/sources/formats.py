"""File-format sources beyond Parquet: CSV and JSON-lines round trips.

The reference's only I/O is stdin text in, Parquet out; a user running
queries over landed data also needs the sidecar formats taps and
exports produce. Each key writes a table out in the format under test
(into a gitignored scratch dir), reads it back with an explicit schema
(never inference — schema inference is a full extra pass at 100 TB and
nondeterministic under sampling), and returns the content, which the
oracle checks against the original table: a write→read identity proof
for the format codec.
"""

from __future__ import annotations

import hashlib
import os

from pyspark.sql import functions as F

from target_s3_parquet_spark._snapshot import snapshot_small
from pyspark.sql import types as T

from target_s3_parquet_spark.operators._util import t
from target_s3_parquet_spark.registry import query

# Per-process scratch root: two concurrent gate/bench processes on the
# same fixture must not race (one overwriting partition dirs while the
# other's scan lists them), so the pid is part of the path and the
# process removes its own tree at exit.
_SCRATCH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    ".roundtrip",
    f"pid{os.getpid()}",
)


def _cleanup_scratch() -> None:
    import shutil

    shutil.rmtree(_SCRATCH, ignore_errors=True)


import atexit  # noqa: E402

atexit.register(_cleanup_scratch)

_SCHEMA = T.StructType(
    [
        T.StructField("key", T.LongType()),
        T.StructField("status", T.StringType()),
        T.StructField("price", T.DoubleType()),
        T.StructField("odate", T.StringType()),
    ]
)

_ORACLE = """
    SELECT o_orderkey AS key, o_orderstatus AS status,
           o_totalprice AS price,
           strftime(o_orderdate, '%Y-%m-%d') AS odate
    FROM orders
"""


def _export(spark, sf_dir):
    return t(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("key"),
        F.col("o_orderstatus").alias("status"),
        F.col("o_totalprice").alias("price"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("odate"),
    )


def _roundtrip(spark, sf_dir, fmt: str):
    path = os.path.join(
        _SCRATCH, f"orders_{fmt}_{hashlib.md5(sf_dir.encode()).hexdigest()[:8]}"
    )
    out = _export(spark, sf_dir)
    writer = out.write.mode("overwrite")
    if fmt == "csv":
        writer.option("header", "true").csv(path)
        return spark.read.schema(_SCHEMA).option("header", "true").csv(path)
    if fmt == "orc":
        writer.orc(path)
        return spark.read.schema(_SCHEMA).orc(path)
    if fmt == "xml":
        writer.format("xml").option("rowTag", "row").save(path)
        return (
            spark.read.schema(_SCHEMA)
            .format("xml")
            .option("rowTag", "row")
            .load(path)
        )
    writer.json(path)
    return spark.read.schema(_SCHEMA).json(path)


@query("scan_csv_roundtrip", _ORACLE)
def scan_csv_roundtrip(spark, sf_dir):
    """CSV write→read identity: header on, explicit schema on read (a
    headerless string scan plus cast would also work; inference never
    does at scale). Doubles survive because Spark's CSV writer emits
    round-trippable shortest-repr floats."""
    return _roundtrip(spark, sf_dir, "csv")


@query("scan_json_roundtrip", _ORACLE)
def scan_json_roundtrip(spark, sf_dir):
    """JSON-lines write→read identity with explicit schema — the
    landing format half of all taps emit. Field order in JSON is
    irrelevant; the schema projects by name."""
    return _roundtrip(spark, sf_dir, "json")


@query("scan_orc_roundtrip", _ORACLE)
def scan_orc_roundtrip(spark, sf_dir):
    """ORC write→read identity — the other columnar format the Hadoop
    ecosystem lands (Hive-native warehouses in particular). Spark's ORC
    source is built in and supports the same predicate pushdown /
    column pruning / vectorized read path as parquet, so a user whose
    upstream produces ORC queries it through the identical DataFrame
    surface; only the codec under the scan changes."""
    return _roundtrip(spark, sf_dir, "orc")


@query(
    "scan_partition_pruned",
    """
    SELECT event_type, COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS total_value
    FROM events
    WHERE event_type IN ('purchase', 'signup')
    GROUP BY event_type
    """,
)
def scan_partition_pruned(spark, sf_dir):
    """Hive-style partition pruning: the events table is written once
    `partitionBy(event_type)` (the layout the Singer sink produces per
    stream), and a filter on the partition column prunes at the
    DIRECTORY level — unselected partitions contribute zero files to
    the scan, visible as `PartitionFilters` in the plan with no
    per-row filter work at all. At 100 TB this is the difference
    between listing 2 prefixes and scanning the table; the same
    mechanism feeds dynamic partition pruning when the filter arrives
    via a dim-table join instead of a literal."""
    path = os.path.join(
        _SCRATCH, f"events_part_{hashlib.md5(sf_dir.encode()).hexdigest()[:8]}"
    )
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        t(spark, sf_dir, "events").write.mode("overwrite").partitionBy(
            "event_type"
        ).parquet(path)
    e = spark.read.parquet(path)
    return (
        e.filter(F.col("event_type").isin("purchase", "signup"))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(38,6)"))
            .cast("double")
            .alias("total_value"),
        )
    )


@query(
    "scan_merge_schema",
    """
    SELECT o_orderkey,
           o_orderstatus,
           CASE WHEN o_orderkey % 2 = 1 THEN o_totalprice END AS o_totalprice,
           CASE WHEN o_orderkey % 2 = 0 THEN o_orderpriority END AS o_orderpriority
    FROM orders
    """,
)
def scan_merge_schema(spark, sf_dir):
    """Schema-evolution READ: two parquet slices written with different
    column sets (the drift the reference produces per-file — SURVEY
    §1.2) unified by `mergeSchema` into one stable superset schema,
    missing columns null-filled. This is the recovery path for datasets
    that already drifted; the engine's own sink prevents new drift by
    pinning the SCHEMA-derived StructType. mergeSchema costs a footer
    read per file at planning time — fine for recovery, wrong as a
    steady state (pin the schema instead)."""
    base = os.path.join(
        _SCRATCH, f"drift_{hashlib.md5(sf_dir.encode()).hexdigest()[:8]}"
    )
    o = t(spark, sf_dir, "orders")
    if not os.path.exists(os.path.join(base, "_written")):
        o.filter(F.col("o_orderkey") % 2 == 1).select(
            "o_orderkey", "o_orderstatus", "o_totalprice"
        ).write.mode("overwrite").parquet(os.path.join(base, "a"))
        o.filter(F.col("o_orderkey") % 2 == 0).select(
            "o_orderkey", "o_orderstatus", "o_orderpriority"
        ).write.mode("overwrite").parquet(os.path.join(base, "b"))
        open(os.path.join(base, "_written"), "w").close()
    merged = spark.read.option("mergeSchema", "true").parquet(
        os.path.join(base, "a"), os.path.join(base, "b")
    )
    return merged.select(
        "o_orderkey", "o_orderstatus", "o_totalprice", "o_orderpriority"
    )


@query(
    "join_dpp_pruned",
    """
    WITH dim AS (
      SELECT DISTINCT event_type,
             substr(event_type, 1, 1) AS category
      FROM events
    )
    SELECT e.event_type, COUNT(*) AS n_events,
           CAST(SUM(CAST(e.value AS DECIMAL(38,6))) AS DOUBLE) AS total_value
    FROM events e
    JOIN dim d ON e.event_type = d.event_type
    WHERE d.category = 'p'
    GROUP BY e.event_type
    """,
)
def join_dpp_pruned(spark, sf_dir):
    """Dynamic partition pruning: the selective filter lives on the DIM
    side (`category = 'p'`), not on the fact's partition column, yet
    the fact scan must still skip unselected partition directories.
    Catalyst inserts a `dynamicpruningexpression` subquery into the
    fact's PartitionFilters: the dim side is evaluated first, its
    surviving join keys are broadcast, and only matching partitions of
    the partitioned fact are listed/read. At 100 TB this is the star-
    schema workhorse — a date-dim filter prunes a date-partitioned
    fact without anyone spelling the partition predicate by hand.
    Plan contract (asserted in tests/test_plans.py): the scan shows
    `dynamicpruningexpression`, not a full-table read."""
    path = os.path.join(
        _SCRATCH, f"events_part_{hashlib.md5(sf_dir.encode()).hexdigest()[:8]}"
    )
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        t(spark, sf_dir, "events").write.mode("overwrite").partitionBy(
            "event_type"
        ).parquet(path)
    e = spark.read.parquet(path)
    # dim derives from the same table's partition values (a pure
    # partition-listing scan — no data files read to build it)
    dim = (
        e.select("event_type")
        .distinct()
        .withColumn("category", F.substring("event_type", 1, 1))
    )
    return (
        e.join(F.broadcast(dim.filter(F.col("category") == "p")), "event_type")
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(38,6)"))
            .cast("double")
            .alias("total_value"),
        )
    )


@query("scan_text_roundtrip", _ORACLE)
def scan_text_roundtrip(spark, sf_dir):
    """Plain-text-lines write→read: rows serialized as one delimited
    string column through the `text` source (the format of raw logs
    before any structure is imposed), then re-parsed with split+cast.
    Doubles survive the string trip via Spark's shortest-repr float
    formatting. The parse is all codegen'd built-ins — this is the
    scale shape for reading arbitrary line-oriented logs: text scan →
    split → cast, never a per-row Python tokenizer."""
    path = os.path.join(
        _SCRATCH, f"orders_text_{hashlib.md5(sf_dir.encode()).hexdigest()[:8]}"
    )
    out = _export(spark, sf_dir).select(
        F.concat_ws("\t", "key", "status", "price", "odate").alias("value")
    )
    out.write.mode("overwrite").text(path)
    s = F.split("value", "\t")
    return spark.read.text(path).select(
        s[0].cast("long").alias("key"),
        s[1].alias("status"),
        s[2].cast("double").alias("price"),
        s[3].alias("odate"),
    )


@query(
    "scan_csv_badrecords",
    """
    SELECT COUNT(*) FILTER (WHERE o_orderkey % 50 <> 0) AS n_good,
           COUNT(*) FILTER (WHERE o_orderkey % 50 = 0) AS n_corrupt,
           CAST(SUM(CAST(CASE WHEN o_orderkey % 50 <> 0
                              THEN o_totalprice END AS DECIMAL(38,6)))
                AS DOUBLE) AS good_total
    FROM orders
    """,
)
def scan_csv_badrecords(spark, sf_dir):
    """Malformed-CSV quarantine (PERMISSIVE mode + corrupt-record
    column) — the file-format twin of the Singer JSON quarantine path:
    a landing CSV where every 50th row carries an unparseable price is
    read under an explicit schema, bad rows surface in
    `_corrupt_record` instead of failing the job, and the aggregate
    splits good/corrupt counts plus the decimal-exact sum over rows
    that parsed.

    The corrupt file is synthesized in-engine from `orders` (write
    text, re-read as CSV), so the oracle can restate the expected
    split directly from the table. At 100 TB this is the ingest
    contract that keeps one bad upstream file from killing a
    1000-executor job: parse errors become data (routable to a
    quarantine sink), and the scan stays a plain schema-pinned
    vectorized CSV read."""
    import shutil
    import tempfile

    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    price_str = F.when(
        F.col("o_orderkey") % 50 == 0,
        F.concat(F.lit("x"), F.col("o_totalprice").cast("string")),
    ).otherwise(F.col("o_totalprice").cast("string"))
    lines = o.select(
        F.concat_ws(
            ",", F.col("o_orderkey").cast("string"), price_str
        ).alias("value")
    )
    tmp = tempfile.mkdtemp(prefix="csv_bad_")
    try:
        path = f"{tmp}/landing"
        lines.write.mode("overwrite").text(path)
        schema = (
            "o_orderkey LONG, o_totalprice DOUBLE, _corrupt_record STRING"
        )
        back = (
            spark.read.schema(schema)
            .option("mode", "PERMISSIVE")
            .option("columnNameOfCorruptRecord", "_corrupt_record")
            .csv(path)
        )
        out = back.agg(
            F.count(
                F.when(F.col("_corrupt_record").isNull(), F.lit(1))
            ).alias("n_good"),
            F.count(
                F.when(F.col("_corrupt_record").isNotNull(), F.lit(1))
            ).alias("n_corrupt"),
            F.sum(
                F.when(
                    F.col("_corrupt_record").isNull(), F.col("o_totalprice")
                ).cast("decimal(38,6)")
            )
            .cast("double")
            .alias("good_total"),
        )
        return snapshot_small(out)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


@query("scan_xml_roundtrip", _ORACLE)
def scan_xml_roundtrip(spark, sf_dir):
    """XML write→read identity via the Spark 4 built-in XML source
    (rowTag-delimited row elements, explicit schema on read — never
    inference at scale). XML is the remaining enterprise landing
    format (SOAP feeds, legacy exports); the same DataFrame surface
    queries it, only the codec under the scan changes. Doubles survive
    because the writer emits round-trippable shortest-repr floats —
    same contract as the CSV/JSON twins."""
    return _roundtrip(spark, sf_dir, "xml")


@query(
    "scan_observe_metrics",
    """
    SELECT COUNT(*) AS n_rows,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE)
             AS total_price,
           CAST(SUM(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS null_status
    FROM orders WHERE o_totalprice >= 500.0
    """,
)
def scan_observe_metrics(spark, sf_dir):
    """Query-attached observability (`df.observe` + `Observation`):
    data-quality metrics — row count, exact revenue total, null
    counter — computed INSIDE the same job that does the work, as an
    accumulator-style side channel with zero extra passes over the
    data. This is the circuit-breaker pattern for production
    pipelines: every batch (or `foreachBatch` epoch) publishes its
    observed metrics, and a guard aborts downstream publication when
    they breach contract — without paying a second scan at 100 TB.

    The key materializes the observed values as a one-row result so
    the metrics themselves are oracle-verified against a direct
    recomputation."""
    from pyspark.sql import Observation

    obs = Observation("quality")
    o = t(spark, sf_dir, "orders").filter(F.col("o_totalprice") >= 500.0)
    observed = o.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("o_totalprice").cast("decimal(38,6)"))
        .cast("double")
        .alias("total_price"),
        F.sum(F.col("o_orderstatus").isNull().cast("int"))
        .cast("long")
        .alias("null_status"),
    )
    observed.write.format("noop").mode("overwrite").save()
    m = obs.get
    return spark.createDataFrame(
        [(m["n_rows"], m["total_price"], m["null_status"])],
        "n_rows long, total_price double, null_status long",
    )


@query(
    "scan_parquet_bloom_point_lookup",
    """
    SELECT event_id, user_id, event_type, value
    FROM events
    WHERE event_id IN (7, 2323, 5055)
    """,
)
def scan_parquet_bloom_point_lookup(spark, sf_dir):
    """Parquet column BLOOM FILTERS for point lookups: the table is
    written with `parquet.bloom.filter.enabled#event_id`, so every row
    group's footer carries a bloom over the event ids it contains, and
    a point predicate can skip row groups whose bloom says "definitely
    absent" WITHOUT decoding any data pages — the layout feature that
    makes needle-in-haystack lookups on a non-sort-key column cheap at
    100 TB (min/max stats can't prune a high-cardinality column that
    isn't clustered; blooms can). `tests/test_parquet_bloom.py`
    asserts the bloom actually lands in the file footers.

    The query itself is the standard point-IN scan + aggregate; its
    results are layout-independent, which is exactly the contract —
    blooms change cost, never answers (the oracle proves it)."""
    path = os.path.join(
        _SCRATCH,
        f"events_bloom_{hashlib.md5(sf_dir.encode()).hexdigest()[:8]}",
    )
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        (
            t(spark, sf_dir, "events")
            .write.mode("overwrite")
            .option("parquet.bloom.filter.enabled#event_id", "true")
            .option(
                "parquet.bloom.filter.expected.ndv#event_id", "100000"
            )
            .parquet(path)
        )
    e = spark.read.parquet(path)
    return e.filter(F.col("event_id").isin(7, 2323, 5055)).select(
        "event_id", "user_id", "event_type", "value"
    )


@query(
    "scan_binaryfile",
    """
    SELECT doc_id,
           octet_length(encode(text)) + 1 AS n_bytes,
           md5(text || chr(10)) AS content_md5
    FROM documents WHERE doc_id < 64
    """,
)
def scan_binaryfile(spark, sf_dir):
    """`binaryFile` source scan — the real ingestion path for media
    corpora (images/audio land as opaque files; Spark lists them and
    hands each file's bytes + metadata to the plan, which is exactly
    what `sources/multimodal.py` consumes downstream). Fixture: 64
    documents written one-file-per-doc via a Hive-partitioned text
    sink; the scan reads them back with `recursiveFileLookup` (which
    disables partition inference — the doc id is recovered from the
    path, as real media pipelines do) and proves byte fidelity with
    octet length + content hash against the source rows (the text sink
    appends one newline per row — accounted in the oracle).

    Scale: listing parallelizes across executors and each file is one
    task input — reading millions of images is this exact plan plus a
    `mapInPandas` decode; `pathGlobFilter` prunes non-payload files at
    the LISTING, before any bytes move."""
    path = os.path.join(
        _SCRATCH, f"docs_bin_{hashlib.md5(sf_dir.encode()).hexdigest()[:8]}"
    )
    (
        t(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 64)
        .select("doc_id", "text")  # text sink: one value column + keys
        .repartition(1)  # fixture-bounded (64 rows): one file per dir
        .write.mode("overwrite")
        .partitionBy("doc_id")
        .option("compression", "none")
        .text(path)
    )
    return (
        spark.read.format("binaryFile")
        .option("recursiveFileLookup", "true")
        .option("pathGlobFilter", "part-*")
        .load(path)
        .select(
            F.regexp_extract("path", r"doc_id=(\d+)", 1)
            .cast("long")
            .alias("doc_id"),
            F.octet_length("content").cast("long").alias("n_bytes"),
            F.md5("content").alias("content_md5"),
        )
    )


@query(
    "scan_parquet_footer_stats",
    """
    SELECT 'events' AS tbl, count(*) AS num_rows,
           min(event_id) AS min_key, max(event_id) AS max_key FROM events
    UNION ALL
    SELECT 'lineitem', count(*), min(l_orderkey), max(l_orderkey) FROM lineitem
    UNION ALL
    SELECT 'orders', count(*), min(o_orderkey), max(o_orderkey) FROM orders
    """,
)
def scan_parquet_footer_stats(spark, sf_dir):
    """Distributed parquet FOOTER harvest — the stats-collection pass a
    lakehouse file-skipping index (min/max zone maps) is built from.

    A tiny DataFrame of (table, path, key column) rows fans out over
    executors; each task opens ONLY the parquet footer with pyarrow
    (`ParquetFile.metadata`, an O(KB) tail read — no data pages are
    touched) and folds the per-row-group column statistics into
    file-level (num_rows, min_key, max_key). The oracle recomputes the
    same numbers the expensive way — a full scan with count/min/max —
    so the gate proves the footer metadata path and the data path
    agree, which is exactly the invariant file skipping relies on.

    At 100 TB: stats harvesting is metadata-bounded — one footer read
    per file (thousands of ~KB tail fetches, embarrassingly parallel),
    never a data scan; paths generalize to S3/HDFS because pyarrow
    accepts a filesystem URI. Row-group granularity is preserved
    upstream of the fold (the fold is a `groupBy(tbl)` over per-group
    rows), so the same operator yields zone maps at row-group depth
    when files carry multiple groups; the testdata writes one group
    per file, so the gated output folds to one row per table.
    Reference scope: the reference only WRITES parquet
    (target_s3_parquet/__init__.py:236 via pyarrow); reading footers
    back for pruning is declared extension surface (SURVEY.md §2B).
    """
    import pandas as pd

    meta = spark.createDataFrame(
        [
            (tbl, os.path.join(sf_dir, f"{tbl}.parquet"), key)
            for tbl, key in [
                ("events", "event_id"),
                ("lineitem", "l_orderkey"),
                ("orders", "o_orderkey"),
            ]
        ],
        "tbl string, path string, key_col string",
    ).repartition(3)

    def read_footers(batches):
        import pyarrow.parquet as pq

        for pdf in batches:
            for tbl, path, key_col in pdf.itertuples(index=False):
                f = pq.ParquetFile(path)
                idx = f.schema_arrow.names.index(key_col)
                for g in range(f.metadata.num_row_groups):
                    rg = f.metadata.row_group(g)
                    st = rg.column(idx).statistics
                    if st is None or not st.has_min_max:
                        # Files written with stats disabled (or a type
                        # pyarrow can't track) yield no footer min/max —
                        # the zone-map invariant cannot hold, so name
                        # the file/column instead of dying on attribute
                        # access inside the task.
                        raise ValueError(
                            f"scan_parquet_footer_stats: {path} row-group "
                            f"{g} column {key_col!r} has no footer "
                            "min/max statistics — zone-map harvest "
                            "requires stats-enabled parquet writes"
                        )
                    yield pd.DataFrame(
                        {
                            "tbl": [tbl],
                            "rg_rows": [rg.num_rows],
                            "rg_min": [int(st.min)],
                            "rg_max": [int(st.max)],
                        }
                    )

    per_group = meta.mapInPandas(
        read_footers, "tbl string, rg_rows long, rg_min long, rg_max long"
    )
    return per_group.groupBy("tbl").agg(
        F.sum("rg_rows").alias("num_rows"),
        F.min("rg_min").alias("min_key"),
        F.max("rg_max").alias("max_key"),
    )
