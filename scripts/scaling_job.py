#!/usr/bin/env python
"""One measured scaling run (invoked by bench_scaling.py via spark-submit).

Builds the full index over the fixture corpus, then answers the 25-query
fixture batch; prints ONE JSON line with build seconds, docs/sec and query
latency. Master/parallelism come from spark-submit (--master local[N]), so
the same code measures both cluster sizes (sandbox protocol, BASELINE.md).
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", required=True)
    ap.add_argument("--index-path", required=True)
    ap.add_argument("--cpus", type=int, required=True, help="cores of this level")
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--shuffle-partitions", type=int, default=None)
    ap.add_argument("--parse-partitions", type=int, default=None)
    args = ap.parse_args()

    from search_engine_spark.config import EngineConfig
    from search_engine_spark.operators.index_build import build_index
    from search_engine_spark.operators.search import BM25SearchEngine
    from search_engine_spark.session import get_spark
    from search_engine_spark.sources.fixtures import FIXTURE_QUERIES

    # Index layout (num_buckets) is held CONSTANT across cluster sizes —
    # the scaling protocol varies only compute parallelism, so both levels
    # produce the identical index; shuffle/parse parallelism track cores.
    cfg = EngineConfig(
        num_buckets=32,
        shuffle_partitions=args.shuffle_partitions or 2 * args.cpus,
        parse_partitions=args.parse_partitions or 2 * args.cpus,
        # small splits: a few-hundred-MB staged table must still fan out
        # across every core (production tables have >> cores splits)
        files_max_partition_bytes=8 * 1024 * 1024,
        files_open_cost_bytes=8 * 1024 * 1024,
    )
    spark = get_spark("scaling_job", config=cfg)
    spark.sparkContext.setLogLevel("ERROR")

    shutil.rmtree(args.index_path, ignore_errors=True)
    pages = spark.read.parquet(args.pages)
    t0 = time.time()
    metrics = build_index(spark, pages, args.index_path, cfg, resume_batches=1)
    build_sec = time.time() - t0

    engine = BM25SearchEngine(spark, args.index_path, cfg)
    t1 = time.time()
    n_rows = len(engine.search_batch(FIXTURE_QUERIES, k=args.k).collect())
    query_sec = time.time() - t1

    print(json.dumps({
        "cpus": args.cpus,
        "n_docs": metrics["n_docs"],
        "parse_sec": round(metrics["parse_sec"], 3),
        "stage_sec": metrics.get("stage_sec", {}),
        "build_sec": round(build_sec, 3),
        "docs_per_sec": round(metrics["n_docs"] / build_sec, 1),
        "query_batch_sec": round(query_sec, 3),
        "ms_per_query": round(1000.0 * query_sec / len(FIXTURE_QUERIES), 1),
        "result_rows": n_rows,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
