"""Measured Z-order file-skipping: writes the events table in three
layouts — unsorted, linearly sorted on x, and Morton (Z-order) sorted
on (x, y) — then counts, via parquet FOOTER min/max stats only (the
`scan_parquet_footer_stats` device), how many files a 2-D box
predicate can skip under each layout.

    python tools/bench_zorder.py [sf_dir] [n_files]   # default sf0.1, 32

One JSON line:
    {"n_files": N, "probes": [{"pred": ..., "skip_unsorted": ...,
     "skip_linear_x": ..., "skip_zorder": ...}, ...]}

This turns SCALE.md's layout claim into numbers: a linear sort serves
only its leading column (filters on y skip ~nothing), while the
Z-order layout gives every file a tight envelope on BOTH columns, so
box predicates on either or both dimensions skip most files. The
same footer-stats harvest that builds zone maps is what decides the
skips, so the measurement exercises the real pruning path end to end.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

DIMBITS = 16


def _zval_col(F, xcol: str = "x", ycol: str = "y"):
    zval = None
    for i in range(DIMBITS):
        xb = ((F.col(xcol) / F.lit(1 << i)).cast("long") % 2) * F.lit(
            1 << (2 * i)
        )
        yb = ((F.col(ycol) / F.lit(1 << i)).cast("long") % 2) * F.lit(
            1 << (2 * i + 1)
        )
        term = xb + yb
        zval = term if zval is None else zval + term
    return zval.cast("long")


def _file_ranges(path: str):
    """(min_x, max_x, min_y, max_y) per parquet file, FOOTERS ONLY."""
    import pyarrow.parquet as pq

    out = []
    for name in sorted(os.listdir(path)):
        if not name.endswith(".parquet"):
            continue
        f = pq.ParquetFile(os.path.join(path, name))
        names = f.schema_arrow.names
        ix, iy = names.index("x"), names.index("y")
        mnx = mny = None
        mxx = mxy = None
        for g in range(f.metadata.num_row_groups):
            rg = f.metadata.row_group(g)
            sx, sy = rg.column(ix).statistics, rg.column(iy).statistics
            mnx = sx.min if mnx is None else min(mnx, sx.min)
            mxx = sx.max if mxx is None else max(mxx, sx.max)
            mny = sy.min if mny is None else min(mny, sy.min)
            mxy = sy.max if mxy is None else max(mxy, sy.max)
        out.append((mnx, mxx, mny, mxy))
    return out


def _skips(ranges, x_lo, x_hi, y_lo, y_hi) -> int:
    """Files whose (x, y) envelope does NOT overlap the box."""
    return sum(
        1
        for mnx, mxx, mny, mxy in ranges
        if mxx < x_lo or mnx > x_hi or mxy < y_lo or mny > y_hi
    )


def run_zorder(spark, sf_dir: str, n_files: int = 32) -> dict:
    from pyspark.sql import functions as F

    from target_s3_parquet_spark.session import load_table

    e = load_table(spark, sf_dir, "events").select(
        "event_id",
        (F.col("user_id") % 65536).alias("x"),
        (F.expr("unix_micros(ts) div 86400000000") % 65536).alias("y"),
    )
    scratch = tempfile.mkdtemp(prefix="zorder_bench_")
    layouts = {}
    try:
        p = os.path.join(scratch, "unsorted")
        e.repartition(n_files).write.mode("overwrite").parquet(p)
        layouts["unsorted"] = _file_ranges(p)

        p = os.path.join(scratch, "linear_x")
        (
            e.repartitionByRange(n_files, "x")
            .sortWithinPartitions("x")
            .write.mode("overwrite")
            .parquet(p)
        )
        layouts["linear_x"] = _file_ranges(p)

        # Per-dimension RANGE NORMALIZATION before interleaving: raw
        # Morton on unequal ranges degenerates (measured here: y's
        # day-number varies only in its low ~5 bits while x spans ~11,
        # so x's high bits dominate the z-value and y never clusters —
        # skip_zorder on a y-band was 0/32). Rescaling each dimension
        # onto the full 16-bit grid from its observed min/max is the
        # same per-column normalization production OPTIMIZE ZORDER
        # performs (rank/range ids per column) and restores balanced
        # two-dimensional clustering.
        mm = e.agg(
            F.min("x"), F.max("x"), F.min("y"), F.max("y")
        ).collect()[0]
        xspan = max(1, mm[1] - mm[0])
        yspan = max(1, mm[3] - mm[2])
        norm = e.select(
            "event_id",
            "x",
            "y",
            ((F.col("x") - F.lit(mm[0])) * 65535 / F.lit(xspan))
            .cast("long")
            .alias("xn"),
            ((F.col("y") - F.lit(mm[2])) * 65535 / F.lit(yspan))
            .cast("long")
            .alias("yn"),
        )
        p = os.path.join(scratch, "zorder")
        (
            norm.withColumn(
                "zval",
                _zval_col(F, xcol="xn", ycol="yn"),
            )
            .repartitionByRange(n_files, "zval")
            .sortWithinPartitions("zval")
            .drop("zval", "xn", "yn")
            .write.mode("overwrite")
            .parquet(p)
        )
        layouts["zorder"] = _file_ranges(p)
    finally:
        shutil.rmtree(scratch, ignore_errors=True)

    # Probe bands are DATA-DRIVEN (1/16th of each dimension's actual
    # range, anchored at the min) so the measurement is meaningful for
    # any testdata vintage: x-only, y-only, and the 2-D box.
    xmin = min(r[0] for r in layouts["unsorted"])
    xmax = max(r[1] for r in layouts["unsorted"])
    ymin = min(r[2] for r in layouts["unsorted"])
    ymax = max(r[3] for r in layouts["unsorted"])
    xw = max(1, (xmax - xmin) // 16)
    yw = max(1, (ymax - ymin) // 16)
    big = 1 << 62
    probes = []
    bounds = {
        "x_band": (xmin, xmin + xw, -big, big),
        "y_band": (-big, big, ymin, ymin + yw),
        "xy_box": (xmin, xmin + xw, ymin, ymin + yw),
    }
    for pred, (xl, xh, yl, yh) in bounds.items():
        probes.append(
            {
                "pred": pred,
                **{
                    f"skip_{name}": _skips(r, xl, xh, yl, yh)
                    for name, r in layouts.items()
                },
            }
        )
    return {"n_files": {k: len(v) for k, v in layouts.items()}, "probes": probes}


def main() -> None:
    from target_s3_parquet_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_files = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    spark = get_spark("bench_zorder")
    print(json.dumps(run_zorder(spark, sf_dir, n_files)))


if __name__ == "__main__":
    main()
