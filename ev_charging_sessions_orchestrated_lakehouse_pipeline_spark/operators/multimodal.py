"""Multimodal columns: images/audio/video as opaque ``binary``
payloads with typed metadata, processed through Arrow-batched
``mapInPandas`` (BASELINE.json north star).

The container has no image/audio codecs, so the actual decode is
STUBBED (``decode_stub``) behind a deterministic fake — but the
Spark-side plumbing is real and tested: binary column construction,
metadata struct schema, Arrow batch shape through mapInPandas, and
partition-preserving feature extraction.

Scale design: media payloads are the columns that break naive plans.
Rules encoded here:
- metadata lives in a separate (cheap) struct column so filters and
  joins NEVER deserialize payload bytes (column pruning drops the
  binary column when unreferenced — check ReadSchema in the plan);
- per-batch Python work happens in ``mapInPandas`` (one Arrow
  round-trip per ~10k-row batch), never a row-at-a-time UDF;
- feature extraction emits fixed-width numeric columns so downstream
  aggregation stays JVM-side.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

ORACLE: dict[str, str] = {}


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.readers import read_fixture

    return read_fixture(spark, sf_dir, "documents")


def synthesize_media(docs: DataFrame) -> DataFrame:
    """Attach a deterministic fake media payload to each document:
    ``payload`` = md5 bytes of the text (stands in for image bytes),
    ``media_meta`` = typed struct (format, width, height, n_bytes)
    derived from the digest — the schema shape a real ingest would
    produce."""
    digest = F.md5("text")
    width = (F.conv(F.substring(digest, 1, 2), 16, 10).cast("int") % 64 + 1).alias("width")
    height = (F.conv(F.substring(digest, 3, 2), 16, 10).cast("int") % 64 + 1).alias("height")
    return docs.select(
        "doc_id",
        F.unhex(digest).alias("payload"),
        F.struct(
            F.lit("fake/rgb8").alias("format"),
            width,
            height,
            F.length(F.unhex(digest)).alias("n_bytes"),
        ).alias("media_meta"),
    )


def decode_stub(payload: bytes, fmt: str) -> bytes:
    """Where a real decoder (PIL/ffmpeg) would run. The container has
    no codecs; callers must use ``fake=True`` paths."""
    raise NotImplementedError(
        "media codecs not available in this environment; "
        "use extract_media_features(fake=True)"
    )


FEATURE_SCHEMA = (
    "doc_id long, n_bytes int, mean_byte double, max_byte int, width int, height int"
)


def extract_media_features(media: DataFrame, fake: bool = True) -> DataFrame:
    """Arrow-batched feature extraction over the payload column.

    With ``fake=True`` (the only mode that works here) features are
    computed directly from the payload bytes — deterministic, so
    tests can assert exact values. ``fake=False`` routes through
    :func:`decode_stub` and raises until codecs exist.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if not fake:  # pragma: no cover - codec path
                pdf["payload"].map(lambda b: decode_stub(b, "fake/rgb8"))
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": payloads.map(len).astype("int32"),
                    "mean_byte": payloads.map(lambda b: sum(b) / len(b)),
                    "max_byte": payloads.map(max).astype("int32"),
                    "width": pdf["meta_width"].astype("int32"),
                    "height": pdf["meta_height"].astype("int32"),
                }
            )

    flat = media.select(
        "doc_id",
        "payload",
        F.col("media_meta.width").alias("meta_width"),
        F.col("media_meta.height").alias("meta_height"),
    )
    return flat.mapInPandas(batches, schema=FEATURE_SCHEMA)


# ---------------------------------------------------------------------------
# Metadata-only query (oracled): proves payload-free pruning works and
# the metadata derivation is engine-exact.
# ---------------------------------------------------------------------------
def q_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = synthesize_media(_docs(spark, sf_dir))
    return media.select(
        "doc_id",
        F.col("media_meta.format").alias("format"),
        F.col("media_meta.width").alias("width"),
        F.col("media_meta.height").alias("height"),
        F.col("media_meta.n_bytes").alias("n_bytes"),
    )


ORACLE["multimodal_meta"] = """
SELECT doc_id,
       'fake/rgb8' AS format,
       CAST(CAST(('0x' || substr(md5(text), 1, 2)) AS INT) % 64 + 1 AS INT) AS width,
       CAST(CAST(('0x' || substr(md5(text), 3, 2)) AS INT) % 64 + 1 AS INT) AS height,
       CAST(octet_length(unhex(md5(text))) AS INT) AS n_bytes
FROM documents
"""


# ---------------------------------------------------------------------------
# Feature-extraction query (mapInPandas path). Fully oracled: the fake
# decoder's features are pure functions of the md5 payload bytes, which
# DuckDB can reconstruct from hex substrings — so even the Python batch
# boundary gets a value-exact SQL twin (mean_byte divides by 16, a
# power of two, so the double is bit-exact on both engines).
# ---------------------------------------------------------------------------
def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = synthesize_media(_docs(spark, sf_dir))
    return extract_media_features(media, fake=True)


ORACLE["multimodal_features"] = """
WITH bytes AS (
  SELECT doc_id, md5(text) AS h, unnest(generate_series(1, 16)) AS i
  FROM documents
)
SELECT doc_id,
       CAST(16 AS INT) AS n_bytes,
       AVG(CAST(('0x' || substr(h, 2*i - 1, 2)) AS INT)) AS mean_byte,
       CAST(MAX(CAST(('0x' || substr(h, 2*i - 1, 2)) AS INT)) AS INT) AS max_byte,
       CAST(CAST(('0x' || substr(h, 1, 2)) AS INT) % 64 + 1 AS INT) AS width,
       CAST(CAST(('0x' || substr(h, 3, 2)) AS INT) % 64 + 1 AS INT) AS height
FROM bytes
GROUP BY doc_id, h
"""


# ---------------------------------------------------------------------------
# Frame sampling ("video" payloads): the 1 -> N mapInPandas shape a
# real frame sampler has. The fake decoder treats the 16-byte payload
# as 4 frames of 4 bytes; ``stride`` picks every k-th frame. The
# Spark-side contract being exercised: an output batch with MORE rows
# than the input batch, stable (doc_id, frame_idx) keys, and binary
# frame payloads that downstream ops treat as opaque.
# ---------------------------------------------------------------------------
FRAME_SCHEMA = "doc_id long, frame_idx int, frame binary, frame_mean double"
FAKE_FRAME_BYTES = 4


def sample_frames(media: DataFrame, stride: int = 2, fake: bool = True) -> DataFrame:
    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if not fake:  # pragma: no cover - codec path
                pdf["payload"].map(lambda b: decode_stub(b, "fake/video"))
            ids, idxs, frames, means = [], [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                n_frames = len(payload) // FAKE_FRAME_BYTES
                for i in range(0, n_frames, stride):
                    frame = payload[i * FAKE_FRAME_BYTES : (i + 1) * FAKE_FRAME_BYTES]
                    ids.append(doc_id)
                    idxs.append(i)
                    frames.append(frame)
                    means.append(sum(frame) / len(frame))
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "frame_idx": pd.array(idxs, dtype="int32"),
                    "frame": frames,
                    "frame_mean": means,
                }
            )

    return media.select("doc_id", "payload").mapInPandas(batches, schema=FRAME_SCHEMA)


def q_multimodal_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registered projection of :func:`sample_frames`: the binary
    ``frame`` column is hex-encoded for the comparator (binary
    round-trips through Arrow as bytearray vs bytes across engines —
    hex sidesteps the representation mismatch without weakening the
    check: the hex string pins every payload byte). Fully oracled —
    the fake 4-byte frames are md5 substrings DuckDB can recompute."""
    media = synthesize_media(_docs(spark, sf_dir))
    frames = sample_frames(media, stride=2, fake=True)
    return frames.select(
        "doc_id", "frame_idx", F.hex("frame").alias("frame_hex"), "frame_mean"
    )


ORACLE["multimodal_frames"] = """
WITH f AS (
  SELECT doc_id, md5(text) AS h, unnest([0, 2]) AS frame_idx
  FROM documents
)
SELECT doc_id,
       CAST(frame_idx AS INT) AS frame_idx,
       upper(substr(h, frame_idx*8 + 1, 8)) AS frame_hex,
       (CAST(('0x' || substr(h, frame_idx*8 + 1, 2)) AS INT)
      + CAST(('0x' || substr(h, frame_idx*8 + 3, 2)) AS INT)
      + CAST(('0x' || substr(h, frame_idx*8 + 5, 2)) AS INT)
      + CAST(('0x' || substr(h, frame_idx*8 + 7, 2)) AS INT)) / 4.0 AS frame_mean
FROM f
"""
