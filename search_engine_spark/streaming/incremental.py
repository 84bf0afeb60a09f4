"""Structured Streaming operators.

Two roles:

1. ``stream_event_counts`` — driver-gate entry: a real ``readStream`` over
   the events parquet with an availableNow trigger, tumbling-window counts
   into a memory sink; the result equals the batch (DuckDB-checkable)
   aggregation, demonstrating the streaming surface deterministically.

2. ``incremental_index_update`` — incremental index maintenance analog of
   the reference's one-shot build (it had none): new web-page files landing
   in a directory are parsed in micro-batches and appended to a staging
   postings table partitioned by (bucket, term); a compaction merge folds
   staging into the main index. Used by tests/test_streaming.py.
"""

from __future__ import annotations

import uuid

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession


def stream_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed streaming aggregation, availableNow → memory sink → DF."""
    batch_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    # stream the containing directory (FileStreamSource needs a dir) but
    # match only the events table file
    stream = (
        spark.readStream.schema(batch_schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    agg = (
        # parquet stores TIMESTAMP_NTZ; watermarking needs TIMESTAMP (UTC session)
        stream.withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", "1 hour")
        .groupBy(
            F.window("ts", "1 hour").alias("win"),
            "event_type",
        )
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
        .select(
            F.floor(F.unix_timestamp(F.col("win.start")) / 3600)
            .cast("long")
            .alias("hour_bucket"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )
    sink = f"stream_counts_{uuid.uuid4().hex[:8]}"
    q = (
        agg.writeStream.format("memory")
        .queryName(sink)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(sink)


SQL_STREAM_EVENT_COUNTS = """
SELECT floor(epoch(ts) / 3600)::BIGINT AS hour_bucket, event_type,
       count(*)::BIGINT AS n_events,
       round(sum(value), 6) AS sum_value
FROM events
GROUP BY 1, 2
"""


def incremental_index_update(
    spark: SparkSession,
    incoming_dir: str,
    staging_dir: str,
    checkpoint_dir: str,
    config=None,
) -> None:
    """Micro-batch incremental index staging over a landing directory.

    readStream(web_pages dir) → parse (same Arrow-batched tokenizer) →
    explode → append (bucket, term, doc_id, doc_length, tf) rows to a
    staging table. Exactly-once via the streaming checkpoint. A periodic
    compaction job (index_build.build_index over the union) folds staging
    into the main index — the Spark-native analog of incremental index
    maintenance.
    """
    from search_engine_spark.config import EngineConfig
    from search_engine_spark.operators.parse import parse_corpus

    cfg = config or EngineConfig()
    schema = (
        "url string, warc_ts timestamp, html binary, text string, lang string"
    )
    stream = spark.readStream.schema(schema).parquet(incoming_dir)

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        parsed = parse_corpus(batch_df, cfg)
        rows = parsed.select(
            "bucket", "doc_id", "doc_length", F.explode("terms").alias("kv")
        ).select(
            "bucket", "doc_id", "doc_length",
            F.col("kv.term").alias("term"), F.col("kv.tf").alias("tf"),
        )
        rows.write.mode("append").partitionBy("bucket").parquet(staging_dir)

    q = (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
