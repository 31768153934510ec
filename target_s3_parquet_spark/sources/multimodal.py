"""Multimodal column plumbing: opaque binary payloads + typed metadata.

The engine treats image/audio/video as ``BinaryType`` columns carried
beside typed metadata (mime, width, duration, …). Everything Spark-side
is real — schema, partition behavior, Arrow batch shape through
``mapInPandas`` — while the actual media decode is stubbed (codec
libraries are not in this container); see `decode_image_stub`.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F

from target_s3_parquet_spark.operators._util import t
from target_s3_parquet_spark.registry import query


@query(
    "multimodal_columns",
    """
    SELECT doc_id,
           octet_length(encode(text)) AS payload_bytes,
           md5(text) AS payload_md5,
           lang AS meta_lang,
           source AS meta_source
    FROM documents
    """,
)
def multimodal_columns(spark, sf_dir):
    """Binary payload column (utf-8 bytes of `text` standing in for an
    image/audio blob) + metadata columns, exercised through a parquet-
    representable schema: BinaryType survives the round trip, and the
    query projects byte length + content hash without ever decoding."""
    d = t(spark, sf_dir, "documents")
    payload = F.encode(F.col("text"), "UTF-8")
    return d.select(
        "doc_id",
        F.octet_length(payload).cast("long").alias("payload_bytes"),
        F.md5(F.col("text").cast("binary")).alias("payload_md5"),
        F.col("lang").alias("meta_lang"),
        F.col("source").alias("meta_source"),
    )


# ---------------------------------------------------------------------------
# Decode / feature-extract plumbing (Arrow-batched; decode itself stubbed)
# ---------------------------------------------------------------------------

def decode_image_stub(payload: bytes) -> dict:
    """STUB — the real implementation would decode with PIL/libvips.
    Deterministic fake so the distributed plumbing is testable: derives
    'dimensions' from the payload hash."""
    h = hash_bytes_stable(payload)
    return {"width": 64 + h % 1024, "height": 64 + (h // 1024) % 1024}


def hash_bytes_stable(payload: bytes) -> int:
    import hashlib

    return int.from_bytes(hashlib.md5(payload).digest()[:8], "big")


def extract_image_features(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """`mapInPandas` feature extraction over binary payloads: batches
    arrive as Arrow-backed pandas, decode runs per-batch (vectorizable),
    output schema is typed metadata. Partitioning is preserved — pure
    map-side, no shuffle, scales linearly with input bytes."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            dims = pdf[payload_col].map(decode_image_stub)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": dims.map(lambda d: d["width"]).astype("int64"),
                    "height": dims.map(lambda d: d["height"]).astype("int64"),
                    "n_bytes": pdf[payload_col].map(len).astype("int64"),
                }
            )

    return df.mapInPandas(
        run, schema="doc_id long, width long, height long, n_bytes long"
    )


@query(
    "multimodal_decode_features",
    # The stub decoder is md5-deterministic, so even the mapInPandas
    # path carries a full value oracle: width/height derive from the
    # first 8 bytes of md5(payload) exactly as decode_image_stub does.
    """
    SELECT doc_id,
           64 + CAST(('0x' || substring(md5(text), 1, 16)) AS UBIGINT) % 1024
             AS width,
           64 + (CAST(('0x' || substring(md5(text), 1, 16)) AS UBIGINT) // 1024)
               % 1024 AS height,
           octet_length(encode(text)) AS n_bytes
    FROM documents
    """,
)
def multimodal_decode_features(spark, sf_dir):
    """Feature extraction through the stubbed decoder. The Spark side
    runs the REAL distributed plumbing (binary column -> Arrow batches
    -> mapInPandas -> typed schema out); the oracle replays the stub's
    md5 arithmetic in SQL, so the whole path is value-verified."""
    d = t(spark, sf_dir, "documents").select(
        "doc_id", F.encode(F.col("text"), "UTF-8").alias("payload")
    )
    return extract_image_features(d)
