"""Multimodal-column plumbing: opaque binary payloads + typed metadata.

Treats media as ``binary`` columns with metadata, per the training-pipeline
pattern: decode / feature-extract run as Arrow-batched pandas UDFs over
``mapInPandas``. The image/audio codecs are not in this container, so the
*decode* step is a clearly-marked deterministic stub
(``_stub_decode_features``) — the Spark-side plumbing (schema, batching,
UDF signature, binary transport through Arrow) is real and oracle-checked:
every stub feature is a pure function of the payload bytes that DuckDB can
recompute.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    LongType, StringType, StructField, StructType,
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


def _stub_decode_features(payload: bytes) -> dict:
    """STUB decode: deterministic byte-level features standing in for a real
    image/audio decoder (no media libs in this container). A production
    deployment swaps this for PIL/ffmpeg decoding; the surrounding Spark
    plumbing is unchanged."""
    return {
        "n_bytes": len(payload),
        "first_byte": payload[0] if payload else -1,
        "last_byte": payload[-1] if payload else -1,
        "byte_sum_mod": sum(payload) % 65536,
    }


def real_decode_features(payload: bytes):  # pragma: no cover - doc stub
    """The real decode seam. Intentionally unimplemented in this sandbox."""
    raise NotImplementedError(
        "media codecs are unavailable in this environment; "
        "_stub_decode_features provides the deterministic test double"
    )


def mm_extract_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents.text → utf-8 binary payload → batched feature extraction."""
    docs = load(spark, sf_dir, "documents").select(
        "doc_id", F.encode("text", "utf-8").alias("payload")
    )

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                _stub_decode_features(bytes(p)) for p in pdf["payload"]
            ]
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
