#!/usr/bin/env python
"""Host scaling-ceiling control experiment (no Spark).

This sandbox runs on a shared host whose memory subsystem does not scale
to the advertised 32 cores: aggregate bandwidth and even plain
multiprocessing throughput collapse beyond ~8-16 workers. Any
wall-clock-based N→4N efficiency measured through Spark is bounded above
by this HOST ceiling, not by the engine. This probe quantifies the
ceiling with two controls that bypass Spark entirely:

1. tokenizer control — the exact per-doc parse function
   (functions/textproc.py, the build's dominant compute) driven by plain
   ``multiprocessing.Pool`` over an in-memory corpus slice;
2. memcpy control — aggregate memory bandwidth via numpy buffer copies.

Output: one JSON line with docs/sec and GB/s per worker count plus the
per-pair efficiencies. The engine's Spark-level efficiency at a pair
should be compared against the tokenizer control at the same pair: if
they match, the engine's orchestration adds no scaling loss of its own.

Usage: python scripts/host_ceiling_probe.py [--n-docs 48000] [--trials 2]
"""

from __future__ import annotations

import argparse
import json
import multiprocessing as mp
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

URLS, TEXTS = None, None


def _init(corpus_path: str, n_docs: int):
    global URLS, TEXTS
    import pyarrow.parquet as pq

    t = pq.read_table(corpus_path, columns=["url", "text"])
    URLS = t["url"].to_pylist()[:n_docs]
    TEXTS = t["text"].to_pylist()[:n_docs]


def _tokenize_range(args):
    lo, hi = args
    from search_engine_spark.functions.textproc import parse_web_doc

    n = 0
    for u, x in zip(URLS[lo:hi], TEXTS[lo:hi]):
        if parse_web_doc(u, x) is not None:
            n += 1
    return n


def _memcpy_worker(_):
    import numpy as np

    buf = np.frombuffer(np.random.bytes(64 * 1024 * 1024), np.uint8).copy()
    t0 = time.time()
    mb = 0
    while time.time() - t0 < 3.0:
        b2 = buf.copy()
        mb += 128
        del b2
    return mb


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-docs", type=int, default=48_000)
    ap.add_argument("--trials", type=int, default=2)
    ap.add_argument("--workers", default="1,2,4,8,16,32")
    args = ap.parse_args()

    corpus = os.path.join(REPO, ".bench_cache", "web_pages_200000.parquet")
    if not os.path.exists(corpus):
        from search_engine_spark.sources.fixtures import write_web_pages

        os.makedirs(os.path.dirname(corpus), exist_ok=True)
        write_web_pages(corpus, 200_000)

    workers = [int(x) for x in args.workers.split(",")]
    n = args.n_docs
    tok: dict[int, float] = {}
    bw: dict[int, float] = {}
    for procs in workers:
        best_tok, best_bw = 0.0, 0.0
        for _ in range(args.trials):
            chunks = [(i * n // procs, (i + 1) * n // procs)
                      for i in range(procs)]
            with mp.Pool(procs, initializer=_init, initargs=(corpus, n)) as p:
                t0 = time.time()
                p.map(_tokenize_range, chunks)
                best_tok = max(best_tok, n / (time.time() - t0))
            with mp.Pool(procs) as p:
                t0 = time.time()
                mb = sum(p.map(_memcpy_worker, range(procs)))
                best_bw = max(best_bw, mb / (time.time() - t0) / 1024)
        tok[procs] = round(best_tok, 1)
        bw[procs] = round(best_bw, 2)
        print(f"[probe] workers={procs} tokenizer={tok[procs]:.0f} docs/s "
              f"bandwidth={bw[procs]:.1f} GB/s", file=sys.stderr)

    pairs = {}
    for lo in workers:
        if lo * 4 in workers:
            pairs[f"{lo}->{lo*4}"] = round(tok[lo * 4] / tok[lo] / 4, 3)
    print(json.dumps({
        "tokenizer_docs_per_sec": tok,
        "memcpy_gb_per_sec": bw,
        "tokenizer_pair_efficiency": pairs,
        "n_docs": n,
        "trials": args.trials,
    }))


if __name__ == "__main__":
    main()
