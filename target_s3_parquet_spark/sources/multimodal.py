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


def sample_frames(
    df: DataFrame,
    payload_col: str = "payload",
    frame_bytes: int = 256,
    every_nth: int = 4,
) -> DataFrame:
    """Frame sampling over opaque media payloads via ``mapInPandas``:
    the payload is treated as a stream of fixed-size frames (a real
    video decoder would honor container keyframes; the chunking stands
    in for it — STUB in the same sense as `decode_image_stub`), and
    every ``every_nth`` frame is emitted with its content hash. Output
    fan-out happens inside the Arrow batch (one input row → many frame
    rows), partitioning is inherited, no shuffle — the shape a
    frame-embedding pipeline needs before the GPU stage."""
    import hashlib

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"doc_id": [], "frame_no": [], "frame_md5": [], "n_frame_bytes": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf[payload_col]):
                n = len(payload)
                for frame_no in range(0, (n + frame_bytes - 1) // frame_bytes):
                    if frame_no % every_nth:
                        continue
                    chunk = payload[frame_no * frame_bytes : (frame_no + 1) * frame_bytes]
                    rows["doc_id"].append(doc_id)
                    rows["frame_no"].append(frame_no)
                    rows["frame_md5"].append(hashlib.md5(chunk).hexdigest())
                    rows["n_frame_bytes"].append(len(chunk))
            yield pd.DataFrame(rows)

    return df.mapInPandas(
        run,
        schema="doc_id long, frame_no long, frame_md5 string, n_frame_bytes long",
    )


@query(
    "multimodal_frame_sample",
    """
    SELECT doc_id, frame_no,
           md5(substring(text, CAST(frame_no * 256 + 1 AS BIGINT), 256))
             AS frame_md5,
           LEAST(256, LENGTH(text) - frame_no * 256) AS n_frame_bytes
    FROM (
      SELECT doc_id, text, UNNEST(range(0, CAST(CEIL(LENGTH(text) / 256.0) AS BIGINT))) AS frame_no
      FROM documents)
    WHERE frame_no % 4 = 0
    """,
)
def multimodal_frame_sample(spark, sf_dir):
    """Every-4th-frame sampling through the mapInPandas plumbing; the
    oracle replays the deterministic chunking with substring arithmetic
    (documents are ASCII, so byte frames == char frames), value-
    verifying the whole distributed fan-out path."""
    d = t(spark, sf_dir, "documents").select(
        "doc_id", F.encode(F.col("text"), "UTF-8").alias("payload")
    )
    return sample_frames(d)


def resize_image_stub(payload: bytes, width: int, height: int) -> bytes:
    """STUB — a real implementation decodes and resamples with
    PIL/libvips. Deterministic fake preserving the testable contract
    (output bytes depend on payload AND target dims): the 'resized'
    payload is the md5 of payload||WxH repeated to a size proportional
    to the pixel count."""
    import hashlib

    seed = hashlib.md5(payload + f"{width}x{height}".encode()).hexdigest()
    n = (width * height) // 256
    return (seed * (n // 32 + 1))[:n].encode()


@query(
    "multimodal_resize",
    """
    SELECT doc_id,
           md5(substring(md5(text || '64x64'), 1, 16)) AS resized_md5,
           16 AS n_resized_bytes
    FROM documents
    """,
)
def multimodal_resize(spark, sf_dir):
    """Resize through the stubbed resampler at a fixed 64x64 target:
    mapInPandas carries (payload, target dims) per row, emits the
    resized payload's hash + size. The oracle replays the stub's hash
    arithmetic (md5^2 of payload||'64x64'; 64*64//256 = 16 bytes of the
    hex seed). Real plumbing, fake pixels — swap `resize_image_stub`
    for a PIL call and nothing else changes."""
    import hashlib

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            resized = pdf["payload"].map(
                lambda p: resize_image_stub(bytes(p), 64, 64)
            )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "resized_md5": resized.map(
                        lambda b: hashlib.md5(b).hexdigest()
                    ),
                    "n_resized_bytes": resized.map(len).astype("int64"),
                }
            )

    d = t(spark, sf_dir, "documents").select(
        "doc_id", F.encode(F.col("text"), "UTF-8").alias("payload")
    )
    return d.mapInPandas(
        run, schema="doc_id long, resized_md5 string, n_resized_bytes long"
    )


def phash_stub(payload: bytes) -> str:
    """STUB perceptual hash — a real implementation downscales the
    decoded image and hashes the DCT sign pattern (pHash). The
    deterministic fake keeps the testable contract (equal/near-equal
    payloads collide, distinct payloads don't): md5 over the
    every-8th-byte downsample of the raw payload."""
    import hashlib

    return hashlib.md5(payload[::8]).hexdigest()


@query(
    "multimodal_phash_dedup",
    """
    SELECT phash,
           MIN(doc_id) AS keep_doc_id,
           COUNT(*) AS n_items
    FROM (
      SELECT doc_id,
             md5(array_to_string(
               list_transform(range(1, LENGTH(text) + 1, 8),
                              i -> substring(text, i, 1)), '')) AS phash
      FROM documents)
    GROUP BY phash
    """,
)
def multimodal_phash_dedup(spark, sf_dir):
    """Perceptual-hash dedup over binary media payloads: every payload
    is reduced to a tiny fingerprint map-side (here the stubbed
    `phash_stub`; swap in a real pHash and nothing else changes), then
    ONE groupBy on the 16-byte hash picks the keeper per perceptual
    bucket (min doc_id) and counts duplicates. The payload bytes never
    shuffle — only (phash, doc_id) pairs do, which is what makes
    image-level dedup tractable at 100 TB of media.

    The Arrow-batched `mapInPandas` stage is the real distributed
    plumbing (binary column in, typed fingerprint out); the oracle
    replays the stub's downsample-then-md5 arithmetic in SQL (ASCII
    payloads: byte positions == char positions)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "phash": pdf["payload"].map(
                        lambda p: phash_stub(bytes(p))
                    ),
                }
            )

    d = t(spark, sf_dir, "documents").select(
        "doc_id", F.encode(F.col("text"), "UTF-8").alias("payload")
    )
    fp = d.mapInPandas(run, schema="doc_id long, phash string")
    return fp.groupBy("phash").agg(
        F.min("doc_id").alias("keep_doc_id"),
        F.count(F.lit(1)).alias("n_items"),
    )


@query(
    "multimodal_audio_energy",
    """
    WITH pcm AS (
      SELECT doc_id,
             list_transform(string_split_regex(text, ''),
                            ch -> ord(ch) * ord(ch)) AS sq
      FROM documents
    )
    SELECT doc_id, frame_no,
           LEAST(100, len(sq) - frame_no * 100) AS n_samples,
           CAST(list_sum(sq[frame_no * 100 + 1 : frame_no * 100 + 100])
                AS BIGINT) AS energy
    FROM (
      SELECT doc_id, sq,
             UNNEST(range(0, CAST(CEIL(len(sq) / 100.0) AS BIGINT)))
               AS frame_no
      FROM pcm)
    """,
)
def multimodal_audio_energy(spark, sf_dir):
    """Windowed audio energy over opaque PCM payloads: the payload is
    treated as a stream of unsigned 8-bit samples, cut into 100-sample
    frames, and each frame's energy (sum of squared amplitudes) is
    emitted — the first stage of any VAD / silence-trim / loudness
    pipeline, and the audio twin of `multimodal_frame_sample`.

    The `mapInPandas` stage is the real distributed plumbing: Arrow
    batches in, numpy vectorized square-sums per frame, typed rows
    out; fan-out happens inside the batch, partitioning is inherited,
    no shuffle — linear in payload bytes at 100 TB. Energies are exact
    integers (ASCII payloads stand in for PCM), so the oracle replays
    the arithmetic in SQL and the whole path is value-verified."""
    import numpy as np

    frame = 100

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"doc_id": [], "frame_no": [], "n_samples": [], "energy": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                samples = np.frombuffer(bytes(payload), dtype=np.uint8)
                sq = samples.astype(np.int64) ** 2
                n = len(samples)
                for fno in range(0, (n + frame - 1) // frame):
                    seg = sq[fno * frame : (fno + 1) * frame]
                    rows["doc_id"].append(doc_id)
                    rows["frame_no"].append(fno)
                    rows["n_samples"].append(len(seg))
                    rows["energy"].append(int(seg.sum()))
            yield pd.DataFrame(rows)

    d = t(spark, sf_dir, "documents").select(
        "doc_id", F.encode(F.col("text"), "UTF-8").alias("payload")
    )
    return d.mapInPandas(
        run,
        schema="doc_id long, frame_no long, n_samples long, energy long",
    )
