"""Multimodal-column pipeline: opaque binary payloads + typed metadata.

Media rides through Spark as ``binary`` columns, per the training-pipeline
pattern: decode / feature-extract run as Arrow-batched pandas UDFs over
``mapInPandas`` (binary transport stays in Arrow buffers end to end; no
per-row Python UDFs).

Two decode branches, both real:

- ``extract_media_headers`` — container-aware decode: magic-byte
  classification plus PNG/GIF/JPEG/WEBP/BMP header parsing (width/height/bit-depth)
  implemented from the format specs in ``functions/media.py``. Full pixel
  decode would need PIL/ffmpeg (absent in this container) and slots in at
  the same seam — the header fields are what a 100 TB crawl pipeline
  filters on before paying for pixel decode anyway.
- ``mm_extract_features`` — the generic branch for payloads whose type is
  already known from column metadata (here: utf-8 text): byte-level
  features (length, boundary bytes, checksum) with no sniffing.

``mm_image_dims`` is the gate entry for the image branch: it synthesizes
byte-correct PNG/GIF/JPEG/WEBP/BMP payloads (real CRCs and marker segments,
parameters a deterministic function of doc_id) and runs them through the
production header decoder; the DuckDB oracle recomputes the expected
dimensions from doc_id arithmetic, so a hash match proves the parser
extracts exactly the planted values from genuine format bytes.

``extract_av_metadata`` / ``mm_av_meta`` are the audio/video siblings:
WAV RIFF-chunk and MP4 ISO-BMFF box walks (sample rate, channels, bit
depth, presentation dims, duration) over the same Arrow-batched seam,
gated the same way with byte-correct synthetic containers.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    BinaryType, LongType, StringType, StructField, StructType,
)

from search_engine_spark.functions.media import (
    decode_av_meta, decode_media_header, synth_bmp, synth_gif, synth_jpeg,
    synth_mp4, synth_png, synth_wav, synth_webp,
)
from search_engine_spark.pipelines.common import load

_FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("n_bytes", LongType(), False),
        StructField("first_byte", LongType(), False),
        StructField("last_byte", LongType(), False),
        StructField("byte_sum_mod", LongType(), False),
        StructField("media_kind", StringType(), False),
    ]
)

_HEADER_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("media_kind", StringType(), False),
        StructField("width", LongType(), False),
        StructField("height", LongType(), False),
        StructField("bit_depth", LongType(), False),
        StructField("n_bytes", LongType(), False),
    ]
)


def byte_features(payload: bytes) -> dict:
    """Byte-level features of an opaque payload (the codec-free branch)."""
    return {
        "n_bytes": len(payload),
        "first_byte": payload[0] if payload else -1,
        "last_byte": payload[-1] if payload else -1,
        "byte_sum_mod": sum(payload) % 65536,
    }


def mm_extract_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents.text → utf-8 binary payload → batched feature extraction.

    media_kind comes from the column's type metadata (the text column IS
    utf-8 by schema) — container sniffing for genuinely opaque payloads is
    the ``extract_media_headers`` branch.
    """
    docs = load(spark, sf_dir, "documents").select(
        "doc_id", F.encode("text", "utf-8").alias("payload")
    )

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [byte_features(bytes(p)) for p in pdf["payload"]]
            out = pd.DataFrame(feats)
            out.insert(0, "doc_id", pdf["doc_id"].values)
            out["media_kind"] = "text/utf-8"
            yield out[
                ["doc_id", "n_bytes", "first_byte", "last_byte",
                 "byte_sum_mod", "media_kind"]
            ]

    return docs.mapInPandas(fn, schema=_FEATURE_SCHEMA)


SQL_MM_EXTRACT_FEATURES = """
SELECT doc_id,
       octet_length(encode(text))::BIGINT AS n_bytes,
       ascii(substr(text, 1, 1))::BIGINT AS first_byte,
       ascii(substr(text, length(text), 1))::BIGINT AS last_byte,
       (list_sum(list_transform(range(1, length(text) + 1),
                                i -> ascii(substr(text, i, 1))))
        % 65536)::BIGINT AS byte_sum_mod,
       'text/utf-8' AS media_kind
FROM documents
"""


def extract_media_headers(media: DataFrame,
                          payload_col: str = "payload") -> DataFrame:
    """Decode container headers from a binary media column.

    The production image-decode operator: classify by magic bytes, parse
    PNG IHDR / GIF logical-screen / JPEG SOF / WEBP VP8X-VP8 / BMP DIB
    dimensions (functions/media.py)
    in Arrow batches. Unknown or truncated payloads degrade to -1 fields
    instead of failing the stage. Input: (doc_id, <payload_col> binary).
    """

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for p in pdf[payload_col]:
                b = bytes(p)
                rec = decode_media_header(b)
                rec["n_bytes"] = len(b)
                rows.append(rec)
            out = pd.DataFrame(rows)
            out.insert(0, "doc_id", pdf["doc_id"].values)
            yield out[["doc_id", "media_kind", "width", "height",
                       "bit_depth", "n_bytes"]]

    return media.select("doc_id", payload_col).mapInPandas(
        fn, schema=_HEADER_SCHEMA
    )


#: bits-per-pixel cycle for the synthetic BMP payloads (the legal
#: BITMAPINFOHEADER values)
_BMP_BPP = (1, 4, 8, 16, 24, 32)


def synth_media_payloads(docs: DataFrame) -> DataFrame:
    """Deterministic PNG/GIF/JPEG/WEBP/BMP payloads keyed on doc_id.

    kind = doc_id % 5 (png/gif/jpeg/webp/bmp); width = 1 + doc_id % 1021;
    height = 1 + (7·doc_id) % 769; bit depth 8/16 alternating for PNG,
    1..8 cycling for GIF, 8 for JPEG (baseline), absent for WEBP (VP8X
    carries none — decoder reports -1), the legal bpp cycle for BMP. The
    payloads are byte-correct files (real CRCs / marker walks / RIFF
    chunk walks), not mocks.
    """
    schema = StructType(
        [
            StructField("doc_id", LongType(), False),
            StructField("payload", BinaryType(), False),
        ]
    )

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for d in pdf["doc_id"]:
                d = int(d)
                w = 1 + d % 1021
                h = 1 + (7 * d) % 769
                if d % 5 == 0:
                    payloads.append(synth_png(w, h, 8 if d % 2 == 0 else 16))
                elif d % 5 == 1:
                    payloads.append(synth_gif(w, h, (d % 8) + 1))
                elif d % 5 == 2:
                    payloads.append(synth_jpeg(w, h))
                elif d % 5 == 3:
                    payloads.append(synth_webp(w, h))
                else:
                    payloads.append(synth_bmp(w, h, _BMP_BPP[d % 6]))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    return docs.select("doc_id").mapInPandas(fn, schema=schema)


def mm_image_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gate entry: synthetic real-format payloads → production header decode."""
    docs = load(spark, sf_dir, "documents")
    return extract_media_headers(synth_media_payloads(docs))


_AV_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("media_kind", StringType(), False),
        StructField("sample_rate", LongType(), False),
        StructField("channels", LongType(), False),
        StructField("bit_depth", LongType(), False),
        StructField("width", LongType(), False),
        StructField("height", LongType(), False),
        StructField("duration_ms", LongType(), False),
        StructField("n_bytes", LongType(), False),
    ]
)


def extract_av_metadata(media: DataFrame,
                        payload_col: str = "payload") -> DataFrame:
    """Decode audio/video stream metadata from a binary media column.

    The AV sibling of ``extract_media_headers``: WAV RIFF-chunk walk
    (format, channels, rate, bit depth, data-over-byte-rate duration) and
    MP4 ISO-BMFF box walk (mvhd timescale/duration, tkhd 16.16 dims) from
    ``functions/media.py``, in Arrow batches. Fields a container does not
    carry — and any corrupt/truncated payload — degrade to -1 instead of
    failing the stage. Input: (doc_id, <payload_col> binary).
    """

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for p in pdf[payload_col]:
                b = bytes(p)
                rec = decode_av_meta(b)
                rec["n_bytes"] = len(b)
                rows.append(rec)
            out = pd.DataFrame(rows)
            out.insert(0, "doc_id", pdf["doc_id"].values)
            yield out[["doc_id", "media_kind", "sample_rate", "channels",
                       "bit_depth", "width", "height", "duration_ms",
                       "n_bytes"]]

    return media.select("doc_id", payload_col).mapInPandas(
        fn, schema=_AV_SCHEMA
    )


#: sample-rate cycle for the synthetic WAV payloads (the common PCM rates)
_WAV_RATES = (8000, 16000, 22050, 44100, 48000)
#: mvhd timescale cycle for the synthetic MP4 payloads
_MP4_TSCALES = (600, 1000, 48000, 90000)


def synth_av_payloads(docs: DataFrame) -> DataFrame:
    """Deterministic WAV/MP4 payloads keyed on doc_id.

    kind = doc_id % 2 (wav/mp4). WAV: rate cycles _WAV_RATES on
    doc_id % 5, channels = 1 + (doc_id % 4) // 2, bits = 8 or 16 on
    (doc_id // 2) % 2, data = 1 + doc_id % 997 zero frames. MP4: the
    image-gate dimension arithmetic (width 1 + doc_id % 1021, height
    1 + 7·doc_id % 769), timescale cycles _MP4_TSCALES on doc_id % 4,
    duration_units = 1 + 13·doc_id % 100000, mvhd/tkhd version
    (doc_id % 4) // 2. Payloads are byte-correct containers (real RIFF
    chunk walks, real nested BMFF boxes), not mocks.
    """
    schema = StructType(
        [
            StructField("doc_id", LongType(), False),
            StructField("payload", BinaryType(), False),
        ]
    )

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for d in pdf["doc_id"]:
                d = int(d)
                if d % 2 == 0:
                    payloads.append(synth_wav(
                        _WAV_RATES[d % 5],
                        1 + (d % 4) // 2,
                        8 + 8 * ((d // 2) % 2),
                        1 + d % 997,
                    ))
                else:
                    payloads.append(synth_mp4(
                        1 + d % 1021,
                        1 + (7 * d) % 769,
                        _MP4_TSCALES[d % 4],
                        1 + (13 * d) % 100000,
                        version=(d % 4) // 2,
                    ))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    return docs.select("doc_id").mapInPandas(fn, schema=schema)


def mm_av_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gate entry: synthetic real-container AV payloads → production decode."""
    docs = load(spark, sf_dir, "documents")
    return extract_av_metadata(synth_av_payloads(docs))


SQL_MM_AV_META = """
SELECT doc_id,
       CASE doc_id % 2 WHEN 0 THEN 'audio/wav' ELSE 'video/mp4' END
         AS media_kind,
       (CASE WHEN doc_id % 2 = 0
             THEN [8000, 16000, 22050, 44100, 48000][(doc_id % 5) + 1]
             ELSE -1 END)::BIGINT AS sample_rate,
       (CASE WHEN doc_id % 2 = 0 THEN 1 + (doc_id % 4) // 2
             ELSE -1 END)::BIGINT AS channels,
       (CASE WHEN doc_id % 2 = 0 THEN 8 + 8 * ((doc_id // 2) % 2)
             ELSE -1 END)::BIGINT AS bit_depth,
       (CASE WHEN doc_id % 2 = 0 THEN -1
             ELSE 1 + doc_id % 1021 END)::BIGINT AS width,
       (CASE WHEN doc_id % 2 = 0 THEN -1
             ELSE 1 + (7 * doc_id) % 769 END)::BIGINT AS height,
       (CASE WHEN doc_id % 2 = 0
             THEN ((1 + doc_id % 997) * 1000)
                  // [8000, 16000, 22050, 44100, 48000][(doc_id % 5) + 1]
             ELSE ((1 + (13 * doc_id) % 100000) * 1000)
                  // [600, 1000, 48000, 90000][(doc_id % 4) + 1]
        END)::BIGINT AS duration_ms,
       (CASE WHEN doc_id % 2 = 0
             THEN 44 + (1 + doc_id % 997)
                       * (1 + (doc_id % 4) // 2)
                       * (8 + 8 * ((doc_id // 2) % 2)) // 8
             ELSE 236 + 24 * ((doc_id % 4) // 2)
        END)::BIGINT AS n_bytes
FROM documents
"""


SQL_MM_IMAGE_DIMS = """
SELECT doc_id,
       CASE doc_id % 5 WHEN 0 THEN 'image/png'
                       WHEN 1 THEN 'image/gif'
                       WHEN 2 THEN 'image/jpeg'
                       WHEN 3 THEN 'image/webp'
                       ELSE 'image/bmp' END AS media_kind,
       (1 + doc_id % 1021)::BIGINT AS width,
       (1 + (7 * doc_id) % 769)::BIGINT AS height,
       (CASE doc_id % 5
          WHEN 0 THEN CASE WHEN doc_id % 2 = 0 THEN 8 ELSE 16 END
          WHEN 1 THEN (doc_id % 8) + 1
          WHEN 2 THEN 8
          WHEN 3 THEN -1
          ELSE [1, 4, 8, 16, 24, 32][(doc_id % 6) + 1] END)::BIGINT
         AS bit_depth,
       (CASE doc_id % 5 WHEN 0 THEN 45 WHEN 1 THEN 14 WHEN 2 THEN 110
                        WHEN 3 THEN 30 ELSE 54 END)::BIGINT AS n_bytes
FROM documents
"""
