"""Topical doc-stats shard (reference doc_posting_covid analog).

The reference maintains a hard-coded side shard of per-doc metadata for
documents containing the term 'covid' (reference indexer.py:56-66,265-268).
Our generalization: ``EngineConfig.topical_terms`` writes a
``doc_stats_topical`` table partitioned by topic. Oracle check: the shard's
doc set must equal the set of docs whose parsed term dict contains the term
(computed independently by the single-process oracle).
"""

import os

import pytest

from search_engine_spark.config import EngineConfig
from search_engine_spark.sources.catalog import CatalogAdapter


@pytest.fixture(scope="module")
def topical_index(spark, tiny_corpus_path, tmp_path_factory):
    from search_engine_spark.operators.index_build import build_index

    index_path = str(tmp_path_factory.mktemp("topical") / "idx")
    cfg = EngineConfig(
        num_buckets=4, shuffle_partitions=8,
        topical_terms=("covid", "term0000"),
    )
    build_index(spark, spark.read.parquet(tiny_corpus_path), index_path, cfg,
                resume_batches=1)
    return index_path, cfg


def test_topical_shard_matches_oracle(spark, topical_index, tiny_corpus_rows):
    from search_engine_spark.functions.textproc import parse_web_doc

    index_path, cfg = topical_index
    shard = CatalogAdapter(index_path).read_table(spark, "doc_stats_topical")
    got = {
        topic: {r["url"] for r in rows.collect()}
        for topic, rows in (
            (t, shard.filter(shard["topic"] == t).select("url"))
            for t in cfg.topical_terms
        )
    }

    exp: dict = {t: set() for t in cfg.topical_terms}
    for url, _ts, text in tiny_corpus_rows:
        doc = parse_web_doc(url, text)
        if doc is None:
            continue
        for t in cfg.topical_terms:
            if t in doc.term_tf:
                exp[t].add(url)

    assert got == exp
    assert all(len(v) > 0 for v in exp.values()), (
        "topical oracle vacuous — fixture has no docs for a configured term"
    )


def test_topical_shard_partitioned_by_topic(spark, topical_index):
    index_path, cfg = topical_index
    base = os.path.join(index_path, "doc_stats_topical")
    for t in cfg.topical_terms:
        assert os.path.isdir(os.path.join(base, f"topic={t}"))


def test_no_shard_without_config(spark, tmp_path, tiny_corpus_path):
    from search_engine_spark.operators.index_build import build_index

    index_path = str(tmp_path / "plain")
    cfg = EngineConfig(num_buckets=4, shuffle_partitions=8)
    build_index(spark, spark.read.parquet(tiny_corpus_path), index_path, cfg,
                resume_batches=1)
    assert not CatalogAdapter(index_path).has_table("doc_stats_topical")
