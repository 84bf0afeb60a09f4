"""Query engine: top-k BM25+cosine retrieval over the bucketed index.

Spark re-expression of the reference's searcher/ranker (reference
searcher.py:22-136, ranker.py:17-109):

- query parsing runs driver-side with the *same* tokenizer as documents
  (search_engine.py:87-90 parity);
- the tiny query-term relation is broadcast against the postings table
  (J1/J2 as a broadcast hash join — posting row-group pruning on the sorted
  ``term`` column skips non-matching parquet pages);
- candidate generation + scoring run partition-parallel per (query, bucket)
  shard: decode blobs, document-at-a-time merge, min-match prune
  (int(0.35·|q|), searcher.py:67-68), vectorized scoring with the
  reference's exact formulas (nonstandard BM25 ranker.py:91-102, weighted
  tf-idf cosine ranker.py:80), local top-k with score ties kept;
- one global TakeOrderedAndProject equivalent (window row_number ≤ k) with
  the reference tie-break: score desc, timestamp desc, doc key desc
  (ranker.py:51-63 takes the *last* k of an ascending (score, date) sort).

Scoring quirks kept (SURVEY.md §3.4): duplicate query terms score once per
position; unknown query terms occupy a position with idf 0 (shrinking the
cosine via the query norm); uppercase-rewritten vocabulary terms are
unreachable by lowercase query terms.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql.types import (
    DoubleType, IntegerType, LongType, StructField, StructType,
)

from search_engine_spark.config import EngineConfig
from search_engine_spark.functions.textproc import parse_sentence
from search_engine_spark.sources.catalog import CatalogAdapter

_SCORED_SCHEMA = StructType(
    [
        StructField("qid", LongType(), False),
        StructField("doc_id", LongType(), False),
        StructField("score", DoubleType(), False),
        StructField("matched", IntegerType(), False),
    ]
)


def _build_query_meta(queries, cfg: EngineConfig, term_df: dict[str, int],
                      n_docs: int) -> dict:
    """Per-query scoring metadata (driver-side; queries are tiny).

    idf = log10(N/df) for known terms else 0 (searcher.py:56-60,126-136);
    query tf row = |positions(term)|/|q| (searcher.py:100-102).
    """
    meta = {}
    for qid, text in queries:
        tokens = parse_sentence(text).tokens
        n = len(tokens)
        positions: dict[str, list[int]] = {}
        for i, t in enumerate(tokens):
            positions.setdefault(t, []).append(i)
        idf_row = np.zeros(n)
        q_row0 = np.zeros(n)
        for t, pos in positions.items():
            idf = math.log10(n_docs / term_df[t]) if t in term_df else 0.0
            for p in pos:
                idf_row[p] = idf
                q_row0[p] = len(pos) / n
        meta[qid] = {
            "n": n,
            "threshold": int(n * cfg.min_match_ratio),
            "positions": positions,
            "idf_row": idf_row,
            "q_row0": q_row0,
            "terms": sorted(positions),
        }
    return meta


def _make_scorer(qmeta: dict, avg_dl: float, cfg: EngineConfig, k: int):
    """applyInPandas scorer for one (qid, bucket) group of posting rows."""
    bm_k, bm_b = cfg.bm25_k, cfg.bm25_b
    w_cos, w_bm25 = cfg.w_cosine, cfg.w_bm25

    def score_group(key, pdf: pd.DataFrame) -> pd.DataFrame:
        from search_engine_spark.operators.codec import decode_posting_list

        qid = int(key[0])
        m = qmeta[qid]
        n_q, threshold = m["n"], m["threshold"]
        idf_row, q_row0, positions = m["idf_row"], m["q_row0"], m["positions"]

        ids_parts, dl_parts, tf_parts, term_parts = [], [], [], []
        for row in pdf.itertuples(index=False):
            ids, dls, tfs = decode_posting_list(bytes(row.blob))
            ids_parts.append(ids)
            dl_parts.append(dls)
            tf_parts.append(tfs)
            term_parts.append(row.term)
        if not ids_parts:
            return pd.DataFrame(columns=["qid", "doc_id", "score", "matched"])

        all_ids = np.concatenate(ids_parts)
        unique_ids, inverse = np.unique(all_ids, return_inverse=True)
        matched = np.bincount(inverse, minlength=len(unique_ids))
        keep = matched >= threshold
        if not keep.any():
            return pd.DataFrame(columns=["qid", "doc_id", "score", "matched"])

        n_u = len(unique_ids)
        M = np.zeros((n_u, n_q))       # tf = tf_count/doc_length per position
        dl_u = np.zeros(n_u)
        off = 0
        for t_i, term in enumerate(term_parts):
            ids = ids_parts[t_i]
            rows = inverse[off:off + len(ids)]
            off += len(ids)
            tfn = tf_parts[t_i] / dl_parts[t_i]
            for p in positions[term]:
                M[rows, p] = tfn
            dl_u[rows] = dl_parts[t_i]

        M = M[keep]
        dl_u = dl_u[keep]
        cand_ids = unique_ids[keep]
        cand_matched = matched[keep]

        # weighted tf-idf cosine (ranker.py:80,104-109)
        doc_w = M * idf_row
        q_w = q_row0 * idf_row
        dots = doc_w @ q_w
        denom = np.sqrt((doc_w * doc_w).sum(axis=1)) * np.sqrt((q_w * q_w).sum())
        cos = np.where((denom == 0) | (dots == 0), 0.0,
                       np.divide(dots, denom, out=np.zeros_like(dots),
                                 where=denom != 0))

        # nonstandard BM25 summed over query positions (ranker.py:91-102)
        bm = (
            (idf_row * M * (bm_k + 1))
            / (M + bm_k * (1 - bm_b + bm_b * (dl_u[:, None] / avg_dl)))
        ).sum(axis=1)

        score = w_cos * cos + w_bm25 * bm

        # local top-k, keeping score ties at the boundary so the global
        # timestamp tie-break stays exact across buckets
        if len(score) > k:
            kth = np.partition(score, -k)[-k]
            sel = score >= kth
        else:
            sel = np.ones(len(score), bool)
        return pd.DataFrame(
            {
                "qid": qid,
                "doc_id": cand_ids[sel],
                "score": score[sel],
                "matched": cand_matched[sel].astype(np.int32),
            }
        )

    return score_group


class BM25SearchEngine:
    """Loads a built index and answers batched top-k queries."""

    def __init__(self, spark: SparkSession, index_path: str,
                 config: EngineConfig | None = None):
        self.spark = spark
        self.cfg = config or EngineConfig()
        self.cat = CatalogAdapter(index_path)
        stats = self.cat.read_table(spark, "corpus_stats").collect()[0]
        self.n_docs = int(stats["n_docs"])
        self.avg_dl = float(stats["avg_doc_length"])
        self.postings = self.cat.read_table(spark, "postings")
        self.doc_stats = self.cat.read_table(spark, "doc_stats")
        self.term_stats = self.cat.read_table(spark, "term_stats")

    def _term_dfs(self, terms: list[str]) -> dict[str, int]:
        if not terms:
            return {}
        rows = (
            self.term_stats.filter(F.col("term").isin(terms))
            .select("term", "df")
            .collect()
        )
        return {r["term"]: int(r["df"]) for r in rows}

    def search_batch(self, queries: list[tuple[int, str]], k: int = 10) -> DataFrame:
        """queries: [(qid, text)] → DataFrame(qid, rank, url, score, warc_ts)."""
        cfg = self.cfg
        all_terms = sorted(
            {t for _, text in queries for t in parse_sentence(text).tokens}
        )
        term_df = self._term_dfs(all_terms)
        qmeta = _build_query_meta(queries, cfg, term_df, self.n_docs)

        pairs = [
            (qid, t)
            for qid, m in qmeta.items()
            for t in m["terms"]
            if t in term_df
        ]
        empty = self.spark.createDataFrame(
            [], "qid long, rank int, url string, score double, warc_ts timestamp"
        )
        if not pairs:
            return empty

        qterms = self.spark.createDataFrame(pairs, "qid long, term string")
        matched = self.postings.join(F.broadcast(qterms), "term")

        scored = matched.groupBy("qid", "bucket").applyInPandas(
            _make_scorer(qmeta, self.avg_dl, cfg, k), schema=_SCORED_SCHEMA
        )

        with_docs = scored.join(
            self.doc_stats.select("doc_id", "url", "warc_ts"), "doc_id"
        )
        w = Window.partitionBy("qid").orderBy(
            F.desc("score"), F.desc("warc_ts"), F.desc("url")
        )
        return (
            with_docs.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("qid", "rank", "url", "score", "warc_ts")
        )

    def search(self, text: str, k: int = 10) -> DataFrame:
        return self.search_batch([(0, text)], k=k).drop("qid")
