"""Checkpoint/resume: a killed build resumes without recomputing finished
partitions (north_rule per-partition lineage)."""

import pytest

from search_engine_spark.config import EngineConfig
from search_engine_spark.sources.catalog import CatalogAdapter


class _Boom(RuntimeError):
    pass


def test_killed_build_resumes(spark, tiny_corpus_path, tmp_path, monkeypatch):
    from search_engine_spark.operators import index_build

    cfg = EngineConfig(num_buckets=4, shuffle_partitions=8)
    pages = spark.read.parquet(tiny_corpus_path)
    index_path = str(tmp_path / "idx")

    # kill the build after 2 committed parse batches
    real_append = CatalogAdapter.append_batch
    calls = []

    def crashing_append(self, df, name, batch_id, **kw):
        if len(calls) == 2:
            raise _Boom("simulated kill")
        calls.append(batch_id)
        return real_append(self, df, name, batch_id, **kw)

    monkeypatch.setattr(CatalogAdapter, "append_batch", crashing_append)
    with pytest.raises(_Boom):
        index_build.build_index(spark, pages, index_path, cfg, resume_batches=4)

    cat = CatalogAdapter(index_path)
    assert set(cat.completed_batches("parsed")) == {"0", "1"}
    assert not cat.is_complete("parsed")
    assert not cat.has_table("postings")

    # resume: only the two remaining batches may be computed
    resumed_calls = []

    def tracking_append(self, df, name, batch_id, **kw):
        resumed_calls.append(batch_id)
        return real_append(self, df, name, batch_id, **kw)

    monkeypatch.setattr(CatalogAdapter, "append_batch", tracking_append)
    metrics = index_build.build_index(
        spark, pages, index_path, cfg, resume_batches=4
    )
    assert sorted(resumed_calls) == ["2", "3"], (
        f"resume recomputed finished partitions: {resumed_calls}"
    )

    # resumed index must equal a fresh uninterrupted build
    monkeypatch.setattr(CatalogAdapter, "append_batch", real_append)
    fresh_path = str(tmp_path / "fresh")
    fresh_metrics = index_build.build_index(
        spark, pages, fresh_path, cfg, resume_batches=4
    )
    assert metrics["n_docs"] == fresh_metrics["n_docs"]

    def table_set(path, name, cols):
        cat = CatalogAdapter(path)
        return {
            tuple(r[c] for c in cols)
            for r in cat.read_table(spark, name).select(*cols).collect()
        }

    assert table_set(index_path, "term_stats", ["term", "df"]) == table_set(
        fresh_path, "term_stats", ["term", "df"]
    )
    assert table_set(index_path, "doc_stats", ["doc_id", "doc_length"]) == (
        table_set(fresh_path, "doc_stats", ["doc_id", "doc_length"])
    )

    # manifest carries per-batch lineage metrics
    entries = CatalogAdapter(index_path)._load()["tables"]["parsed"]["batches"]
    assert len(entries) == 4
    assert all(e["rows"] > 0 and e["wall_sec"] > 0 for e in entries)


def test_table_level_resume_skips_finished_stages(spark, tiny_corpus_path, tmp_path):
    """A build killed between table commits resumes at the first missing
    table — the staged parse and every committed table are not recomputed."""
    import json
    import os
    import shutil

    from search_engine_spark.operators import index_build

    cfg = EngineConfig(num_buckets=4, shuffle_partitions=8)
    pages = spark.read.parquet(tiny_corpus_path)
    index_path = str(tmp_path / "idx2")
    index_build.build_index(spark, pages, index_path, cfg, resume_batches=2)

    # simulate a crash right before the postings commit
    cat = CatalogAdapter(index_path)
    manifest = cat._load()
    del manifest["tables"]["postings"]
    with open(cat._manifest_path(), "w") as f:
        json.dump(manifest, f)
    shutil.rmtree(os.path.join(index_path, "postings"))

    before = os.path.getmtime(os.path.join(index_path, "term_stats"))
    metrics = index_build.build_index(
        spark, pages, index_path, cfg, resume_batches=2
    )
    assert metrics["stage_sec"]["term_stats"] < 0.5  # skipped, not rebuilt
    assert os.path.getmtime(os.path.join(index_path, "term_stats")) == before
    assert cat.has_table("postings")

    from search_engine_spark.operators.search import BM25SearchEngine
    from search_engine_spark.sources.fixtures import FIXTURE_QUERIES

    engine = BM25SearchEngine(spark, index_path, cfg)
    assert engine.search_batch(FIXTURE_QUERIES[:3], k=5).count() > 0
