"""Multimodal columns: images/audio/video as opaque ``binary``
payloads with typed metadata, processed through Arrow-batched
``mapInPandas`` (BASELINE.json north star).

The container image has no codec libraries (no PIL/ffmpeg), so the
richer feature paths run on deterministic fake payloads — but two
REAL pure-Python decoders ship for trivial containers: ``decode_ppm``
(binary P6 netpbm images, full header grammar incl. comments) and
``decode_wav`` (RIFF/WAVE PCM, proper chunk walk). The synthesizers
build genuine containers JVM-side (headers + payload bytes with
Spark built-ins, zero Python in the construction), the decoders parse
them inside the existing mapInPandas Arrow path, and the decoded
fields are DuckDB-oracled to exact value equality
(``multimodal_decode_ppm`` / ``multimodal_decode_wav``). The rest of
the Spark-side plumbing is real and tested: binary column
construction, metadata struct schema, Arrow batch shape through
mapInPandas, and partition-preserving feature extraction.

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


def decode_ppm(payload: bytes) -> tuple[int, int, int, bytes]:
    """Real binary-PPM (netpbm P6) decoder: parses the full header
    grammar — magic, whitespace runs, ``#`` comments, three ASCII
    integers (width, height, maxval), one whitespace — and returns
    ``(width, height, maxval, pixel_bytes)``. Any spec-conformant P6
    file decodes; truncated or malformed input raises ValueError."""
    if payload[:2] != b"P6":
        raise ValueError(f"not a P6 PPM (magic {payload[:2]!r})")
    pos, fields = 2, []
    while len(fields) < 3:
        while payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":
            while payload[pos : pos + 1] not in (b"\n", b""):
                pos += 1
            continue
        start = pos
        while payload[pos : pos + 1] and not payload[pos : pos + 1].isspace():
            pos += 1
        if pos == start:
            raise ValueError("truncated PPM header")
        fields.append(int(payload[start:pos]))
    pos += 1  # exactly one whitespace byte separates maxval from raster
    width, height, maxval = fields
    if not (0 < maxval < 65536):
        raise ValueError(f"PPM maxval out of range: {maxval}")
    bpp = 3 if maxval < 256 else 6
    pixels = payload[pos : pos + width * height * bpp]
    if len(pixels) != width * height * bpp:
        raise ValueError("truncated PPM raster")
    return width, height, maxval, pixels


def decode_wav(payload: bytes) -> dict[str, int]:
    """Real RIFF/WAVE PCM header decoder: validates the RIFF
    signature, walks chunks (word-aligned, as the spec requires)
    until ``fmt `` and ``data``, and returns channels / sample_rate /
    bits_per_sample / n_samples / duration_us. Any PCM WAV file
    parses; compressed or malformed input raises ValueError."""
    import struct

    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos, fmt, data_len = 12, None, None
    while pos + 8 <= len(payload) and (fmt is None or data_len is None):
        cid, size = payload[pos : pos + 4], struct.unpack(
            "<I", payload[pos + 4 : pos + 8]
        )[0]
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            audio_fmt, channels, rate, _byte_rate, block_align, bits = (
                struct.unpack("<HHIIHH", body[:16])
            )
            if audio_fmt != 1:
                raise ValueError(f"not PCM (audio format {audio_fmt})")
            fmt = (channels, rate, block_align, bits)
        elif cid == b"data":
            data_len = size
        pos += 8 + size + (size % 2)  # chunks are word-aligned
    if fmt is None or data_len is None:
        raise ValueError("missing fmt/data chunk")
    channels, rate, block_align, bits = fmt
    n_samples = data_len // block_align
    return {
        "channels": channels,
        "sample_rate": rate,
        "bits_per_sample": bits,
        "n_samples": n_samples,
        "duration_us": n_samples * 1_000_000 // rate,
    }


def decode_media(payload: bytes, fmt: str):
    """Dispatch to the real decoder for a container format. Formats
    the synthetic feature paths use (``fake/*``) are NOT containers
    and refuse decoding — by contract, not by missing implementation."""
    if fmt == "image/ppm":
        return decode_ppm(payload)
    if fmt == "audio/wav":
        return decode_wav(payload)
    raise ValueError(f"no decoder for format {fmt!r}")


FEATURE_SCHEMA = (
    "doc_id long, n_bytes int, mean_byte double, max_byte int, width int, height int"
)


def extract_media_features(media: DataFrame, fake: bool = True) -> DataFrame:
    """Arrow-batched feature extraction over the payload column.

    With ``fake=True`` (the default) features are computed directly
    from the payload bytes — deterministic, so tests can assert
    exact values. ``fake=False`` routes through :func:`decode_media`,
    which refuses the non-container ``fake/rgb8`` format; real
    container decoding lives in the ``multimodal_decode_*`` queries.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if not fake:  # fake/rgb8 is a raw digest, not a container
                pdf["payload"].map(lambda b: decode_media(b, "fake/rgb8"))
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
            if not fake:  # fake/video is a raw digest, not a container
                pdf["payload"].map(lambda b: decode_media(b, "fake/video"))
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


# ---------------------------------------------------------------------------
# REAL container decode queries. The synthesizers build genuine
# containers with Spark built-ins (header text + payload bytes, zero
# Python in construction); the decoders above parse them in the
# mapInPandas Arrow path; the oracles recompute every decoded field
# from the same md5 derivation, so the decode round-trip is
# value-exact across engines.
# ---------------------------------------------------------------------------
_PPM_W = "(cast(conv(substring(md5(text),1,2),16,10) as int) % 4 + 1)"
_PPM_H = "(cast(conv(substring(md5(text),3,2),16,10) as int) % 4 + 1)"
#: header 'P6\n<w> <h>\n255\n' + w*h*3 raster bytes cycled from the digest
_PPM_PAYLOAD = (
    "concat("
    "encode(concat('P6\n', cast(" + _PPM_W + " as string), ' ', "
    "cast(" + _PPM_H + " as string), '\n255\n'), 'utf-8'), "
    "unhex(substring(repeat(md5(text), 9), 1, "
    + _PPM_W + " * " + _PPM_H + " * 6)))"
)


def synthesize_ppm(docs: DataFrame) -> DataFrame:
    """Real P6 PPM containers, built JVM-side: spec-conformant header
    plus a w*h RGB raster whose bytes cycle through the text digest.
    Deterministic — the oracle recomputes every byte."""
    return docs.select(
        "doc_id",
        F.expr(_PPM_PAYLOAD).alias("payload"),
        F.lit("image/ppm").alias("format"),
    )


PPM_DECODE_SCHEMA = (
    "doc_id long, width int, height int, maxval int, "
    "n_pixel_bytes int, pixel_sum long"
)


def decode_ppm_features(media: DataFrame) -> DataFrame:
    """Arrow-batched REAL decode: every payload goes through the full
    P6 header parse; emitted fields come from the decoder's output,
    not from metadata the synthesizer could have carried along."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            decoded = [decode_ppm(bytes(b)) for b in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": pd.array([d[0] for d in decoded], dtype="int32"),
                    "height": pd.array([d[1] for d in decoded], dtype="int32"),
                    "maxval": pd.array([d[2] for d in decoded], dtype="int32"),
                    "n_pixel_bytes": pd.array(
                        [len(d[3]) for d in decoded], dtype="int32"
                    ),
                    "pixel_sum": pd.array(
                        [sum(d[3]) for d in decoded], dtype="int64"
                    ),
                }
            )

    return media.select("doc_id", "payload").mapInPandas(
        batches, schema=PPM_DECODE_SCHEMA
    )


def q_multimodal_decode_ppm(spark: SparkSession, sf_dir: str) -> DataFrame:
    return decode_ppm_features(synthesize_ppm(_docs(spark, sf_dir)))


ORACLE["multimodal_decode_ppm"] = """
WITH m AS (
  SELECT doc_id, md5(text) AS h,
         (CAST(('0x' || substr(md5(text), 1, 2)) AS INT) % 4 + 1) AS w,
         (CAST(('0x' || substr(md5(text), 3, 2)) AS INT) % 4 + 1) AS ht
  FROM documents
), px AS (
  SELECT doc_id, w, ht, repeat(h, 9) AS rh,
         unnest(generate_series(1, w * ht * 3)) AS i
  FROM m
)
SELECT doc_id,
       CAST(w AS INT) AS width,
       CAST(ht AS INT) AS height,
       CAST(255 AS INT) AS maxval,
       CAST(w * ht * 3 AS INT) AS n_pixel_bytes,
       CAST(SUM(CAST(('0x' || substr(rh, 2*i - 1, 2)) AS INT)) AS BIGINT)
         AS pixel_sum
FROM px
GROUP BY doc_id, w, ht
"""


#: sample rate 8000..15000 Hz derived from the digest; 16-bit mono PCM
_WAV_RATE = "(8000 + (cast(conv(substring(md5(text),5,2),16,10) as int) % 8) * 1000)"
#: little-endian uint32 for a value known to fit in 16 bits
def _le32_expr(val_expr: str) -> str:
    h4 = f"lpad(hex({val_expr}), 4, '0')"
    return f"unhex(concat(substring({h4}, 3, 2), substring({h4}, 1, 2), '0000'))"


#: canonical 44-byte RIFF/WAVE PCM header + 64 data bytes (32 mono
#: 16-bit samples) cycled from the digest. Constant chunk sizes:
#: RIFF size 100 = 36 + 64, fmt size 16, data size 64.
_WAV_PAYLOAD = (
    "concat("
    "encode('RIFF', 'utf-8'), unhex('64000000'), "
    "encode('WAVE', 'utf-8'), "
    "encode('fmt ', 'utf-8'), unhex('10000000'), "
    "unhex('0100'), "  # audio format 1 = PCM
    "unhex('0100'), "  # channels = 1
    + _le32_expr(_WAV_RATE) + ", "
    + _le32_expr(f"({_WAV_RATE} * 2)") + ", "  # byte rate = rate * block align
    "unhex('0200'), "  # block align = 2
    "unhex('1000'), "  # bits per sample = 16
    "encode('data', 'utf-8'), unhex('40000000'), "
    "unhex(repeat(md5(text), 4)))"
)


def synthesize_wav(docs: DataFrame) -> DataFrame:
    """Real RIFF/WAVE PCM containers, built JVM-side: canonical
    44-byte header (little-endian fields assembled with hex/lpad/
    unhex built-ins) + 64 bytes of PCM data cycled from the digest."""
    return docs.select(
        "doc_id",
        F.expr(_WAV_PAYLOAD).alias("payload"),
        F.lit("audio/wav").alias("format"),
    )


WAV_DECODE_SCHEMA = (
    "doc_id long, channels int, sample_rate int, bits_per_sample int, "
    "n_samples int, duration_us long"
)


def decode_wav_features(media: DataFrame) -> DataFrame:
    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            decoded = [decode_wav(bytes(b)) for b in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "channels": pd.array(
                        [d["channels"] for d in decoded], dtype="int32"
                    ),
                    "sample_rate": pd.array(
                        [d["sample_rate"] for d in decoded], dtype="int32"
                    ),
                    "bits_per_sample": pd.array(
                        [d["bits_per_sample"] for d in decoded], dtype="int32"
                    ),
                    "n_samples": pd.array(
                        [d["n_samples"] for d in decoded], dtype="int32"
                    ),
                    "duration_us": pd.array(
                        [d["duration_us"] for d in decoded], dtype="int64"
                    ),
                }
            )

    return media.select("doc_id", "payload").mapInPandas(
        batches, schema=WAV_DECODE_SCHEMA
    )


def q_multimodal_decode_wav(spark: SparkSession, sf_dir: str) -> DataFrame:
    return decode_wav_features(synthesize_wav(_docs(spark, sf_dir)))


ORACLE["multimodal_decode_wav"] = """
WITH r AS (
  SELECT doc_id,
         (8000 + (CAST(('0x' || substr(md5(text), 5, 2)) AS INT) % 8) * 1000)
           AS rate
  FROM documents
)
SELECT doc_id,
       CAST(1 AS INT) AS channels,
       CAST(rate AS INT) AS sample_rate,
       CAST(16 AS INT) AS bits_per_sample,
       CAST(32 AS INT) AS n_samples,
       CAST(32000000 // rate AS BIGINT) AS duration_us
FROM r
"""


CHANNEL_STATS_SCHEMA = (
    "doc_id long, r_sum long, g_sum long, b_sum long, "
    "min_byte int, max_byte int"
)


def channel_stats(media: DataFrame) -> DataFrame:
    """Per-channel pixel statistics off the REAL P6 decode — the
    image-pipeline feature-extraction shape (channel means feed
    brightness/color-cast filters in a pretraining visual-data
    curation pass): interleaved RGB raster -> per-channel sums +
    global byte extrema, computed batch-wise in the same Arrow
    mapInPandas path as decode_ppm_features (one Python round-trip
    per ~10k-row batch, never per row)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            decoded = [decode_ppm(bytes(b)) for b in pdf["payload"]]
            rasters = [d[3] for d in decoded]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "r_sum": pd.array(
                        [sum(r[0::3]) for r in rasters], dtype="int64"
                    ),
                    "g_sum": pd.array(
                        [sum(r[1::3]) for r in rasters], dtype="int64"
                    ),
                    "b_sum": pd.array(
                        [sum(r[2::3]) for r in rasters], dtype="int64"
                    ),
                    "min_byte": pd.array(
                        [min(r) for r in rasters], dtype="int32"
                    ),
                    "max_byte": pd.array(
                        [max(r) for r in rasters], dtype="int32"
                    ),
                }
            )

    return media.select("doc_id", "payload").mapInPandas(
        batches, schema=CHANNEL_STATS_SCHEMA
    )


def q_multimodal_channel_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return channel_stats(synthesize_ppm(_docs(spark, sf_dir)))


ORACLE["multimodal_channel_stats"] = """
WITH m AS (
  SELECT doc_id, md5(text) AS h,
         (CAST(('0x' || substr(md5(text), 1, 2)) AS INT) % 4 + 1) AS w,
         (CAST(('0x' || substr(md5(text), 3, 2)) AS INT) % 4 + 1) AS ht
  FROM documents
), px AS (
  SELECT doc_id,
         CAST(('0x' || substr(repeat(h, 9), 2*i - 1, 2)) AS INT) AS byte,
         (i - 1) % 3 AS ch
  FROM m, LATERAL unnest(generate_series(1, w * ht * 3)) AS t(i)
)
SELECT doc_id,
       CAST(SUM(CASE WHEN ch = 0 THEN byte END) AS BIGINT) AS r_sum,
       CAST(SUM(CASE WHEN ch = 1 THEN byte END) AS BIGINT) AS g_sum,
       CAST(SUM(CASE WHEN ch = 2 THEN byte END) AS BIGINT) AS b_sum,
       CAST(MIN(byte) AS INT) AS min_byte,
       CAST(MAX(byte) AS INT) AS max_byte
FROM px
GROUP BY doc_id
"""
