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
  tf-idf cosine ranker.py:80); in the pure-BM25 ranking mode the shard pass
  uses block-max WAND (operators/wand.py) and decodes only the blocks whose
  upper bound can reach the running top-k;
- optional GloVe-style embedding component (reference ranker.py:78,
  search_engine.py:13-23 — made optional here): per-doc mean vector from
  ``doc_stats.glove_vec``, query vector driver-side, cosine added after the
  shard pass with a widened local top-k margin (±w_glove bounds the
  post-hoc score shift, so the widened boundary provably keeps every global
  top-k candidate);
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
            "tokens": tokens,
        }
    return meta


def _make_scorer(qmeta: dict, avg_dl: float, cfg: EngineConfig, k: int,
                 use_wand: bool, topk_margin: float):
    """applyInPandas scorer for one (qid, bucket) group of posting rows.

    ``topk_margin`` widens the tie-keeping local top-k boundary: with the
    embedding component enabled the final score shifts by at most ±w_glove,
    so keeping everything with partial score >= kth - 2·w_glove keeps every
    possible global top-k member.
    """

    def score_group(key, pdf: pd.DataFrame) -> pd.DataFrame:
        from search_engine_spark.operators.codec import decode_posting_list
        from search_engine_spark.operators.wand import (
            bmw_score_lists, score_decoded,
        )

        qid = int(key[0])
        m = qmeta[qid]
        empty = pd.DataFrame(columns=["qid", "doc_id", "score", "matched"])
        if not len(pdf):
            return empty

        if use_wand:
            cand_ids, score, cand_matched, _stats = bmw_score_lists(
                [r.term for r in pdf.itertuples(index=False)],
                [bytes(r.blob) for r in pdf.itertuples(index=False)],
                [np.asarray(r.block_last, np.int64)
                 for r in pdf.itertuples(index=False)],
                [np.asarray(r.block_max, np.float64)
                 for r in pdf.itertuples(index=False)],
                m, avg_dl, cfg, k,
            )
        else:
            ids_parts, dl_parts, tf_parts, term_parts = [], [], [], []
            for row in pdf.itertuples(index=False):
                ids, dls, tfs = decode_posting_list(bytes(row.blob))
                ids_parts.append(ids)
                dl_parts.append(dls)
                tf_parts.append(tfs)
                term_parts.append(row.term)
            cand_ids, score, cand_matched = score_decoded(
                ids_parts, dl_parts, tf_parts, term_parts, m, avg_dl, cfg
            )
        if len(cand_ids) == 0:
            return empty

        # local top-k, keeping score ties (and the embedding margin) at the
        # boundary so the global tie-break stays exact across buckets
        if len(score) > k:
            kth = np.partition(score, -k)[-k]
            sel = score >= kth - topk_margin
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
        self.glove: dict[str, np.ndarray] | None = None
        if self.cfg.glove_path:
            if "glove_vec" not in self.doc_stats.columns:
                raise ValueError(
                    "config enables the embedding component (glove_path set) "
                    "but this index was built without doc vectors — rebuild "
                    "with EngineConfig(glove_path=...) or unset glove_path"
                )
            from search_engine_spark.functions.glove import load_glove

            self.glove = load_glove(self.cfg.glove_path)

    def _term_dfs(self, terms: list[str]) -> dict[str, int]:
        if not terms:
            return {}
        rows = (
            self.term_stats.filter(F.col("term").isin(terms))
            .select("term", "df")
            .collect()
        )
        return {r["term"]: int(r["df"]) for r in rows}

    @property
    def _glove_enabled(self) -> bool:
        return self.glove is not None and self.cfg.w_glove != 0.0

    def search_batch(
        self,
        queries: list[tuple[int, str]],
        k: int = 10,
        use_wand: bool | None = None,
    ) -> DataFrame:
        """queries: [(qid, text)] → DataFrame(qid, rank, url, score, warc_ts).

        ``use_wand=None`` auto-enables block-max WAND exactly when the score
        is decomposable (pure-BM25 ranking: w_cosine == w_glove == 0); the
        reference-parity combined score always scores exhaustively.
        """
        cfg = self.cfg
        decomposable = cfg.w_cosine == 0.0 and not self._glove_enabled
        if use_wand is None:
            use_wand = decomposable
        elif use_wand and not decomposable:
            raise ValueError(
                "block-max WAND is only score-safe in pure-BM25 ranking mode "
                "(w_cosine == 0 and no embedding component); the combined "
                "reference score does not decompose over terms"
            )
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
        # Explicit isin filter BEFORE the broadcast join: a join alone scans
        # every postings row, but a literal predicate on the sorted `term`
        # column pushes into the parquet scan (row-group min/max +
        # dictionary pruning) — .explain shows PushedFilters: [In(term, ...)]
        known = sorted({t for _, t in pairs})
        matched = self.postings.filter(F.col("term").isin(known)).join(
            F.broadcast(qterms), "term"
        )

        margin = 2.0 * cfg.w_glove if self._glove_enabled else 0.0
        scored = matched.groupBy("qid", "bucket").applyInPandas(
            _make_scorer(qmeta, self.avg_dl, cfg, k, use_wand, margin),
            schema=_SCORED_SCHEMA,
        )

        doc_cols = ["doc_id", "url", "warc_ts"]
        if self._glove_enabled:
            doc_cols.append("glove_vec")
        with_docs = scored.join(self.doc_stats.select(*doc_cols), "doc_id")

        if self._glove_enabled:
            with_docs = self._add_glove_score(with_docs, qmeta)

        w = Window.partitionBy("qid").orderBy(
            F.desc("score"), F.desc("warc_ts"), F.desc("url")
        )
        return (
            with_docs.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("qid", "rank", "url", "score", "warc_ts")
        )

    def _add_glove_score(self, with_docs: DataFrame, qmeta: dict) -> DataFrame:
        """score += w_glove · cosine(doc_vec, query_vec) (ranker.py:78,85-88).

        Query vectors are tiny (one per query) and ride the UDF closure;
        the cosine runs Arrow-batched over (qid, glove_vec) pairs.
        """
        from search_engine_spark.functions.glove import query_vector

        w_glove = float(self.cfg.w_glove)
        dim = self.cfg.glove_dim
        qvecs = {
            qid: query_vector(m["tokens"], self.glove, dim)
            for qid, m in qmeta.items()
        }

        @F.pandas_udf(DoubleType())
        def glove_cos(qid: pd.Series, vec: pd.Series) -> pd.Series:
            out = np.zeros(len(qid))
            for i, (q, v) in enumerate(zip(qid.to_numpy(), vec)):
                qv = qvecs[int(q)]
                dv = np.asarray(v, np.float64)
                num = np.dot(dv, qv)
                den = np.linalg.norm(dv) * np.linalg.norm(qv)
                if den != 0 and num != 0:
                    out[i] = num / den
            return pd.Series(out)

        return with_docs.withColumn(
            "score",
            F.col("score") + w_glove * glove_cos(F.col("qid"), F.col("glove_vec")),
        ).drop("glove_vec")

    def search(self, text: str, k: int = 10,
               use_wand: bool | None = None) -> DataFrame:
        return self.search_batch([(0, text)], k=k, use_wand=use_wand).drop("qid")
