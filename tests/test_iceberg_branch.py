"""CatalogAdapter Iceberg routing: writeTo branch + parquet fallback.

The sandbox ships no Iceberg runtime jar, so the full round-trip test
self-skips here and runs on any cluster that has the jar; the fallback
tests pin the behavior this environment relies on — namespace conf set
but no jar → the parquet+manifest branch, unchanged semantics.
"""

from __future__ import annotations

import pytest

from search_engine_spark.sources.catalog import (
    ICEBERG_NAMESPACE_CONF, CatalogAdapter, iceberg_runtime_available,
)


def test_runtime_detection_is_false_here(spark):
    # this container has no Iceberg jar; if this ever flips, the skipped
    # round-trip test below starts running automatically
    assert iceberg_runtime_available(spark) is False


def test_fallback_without_jar(spark, tmp_path):
    """Namespace conf set + no jar → parquet branch, no iceberg_ident."""
    spark.conf.set(ICEBERG_NAMESPACE_CONF, "ice.search_index")
    try:
        cat = CatalogAdapter(str(tmp_path / "idx"))
        df = spark.range(5)
        cat.write_table(df, "t")
        assert cat.read_table(spark, "t").count() == 5
        assert "iceberg_ident" not in cat._load()["tables"]["t"]
        cat.append_batch(spark.range(3), "t2", "b0")
        assert cat.read_table(spark, "t2").count() == 3
        assert "iceberg_ident" not in cat._load()["tables"]["t2"]
    finally:
        spark.conf.unset(ICEBERG_NAMESPACE_CONF)


def test_no_conf_means_parquet(spark, tmp_path):
    cat = CatalogAdapter(str(tmp_path / "idx2"))
    assert cat._iceberg_ident(spark, "t") is None


def test_iceberg_roundtrip_when_jar_present(spark, tmp_path):
    if not iceberg_runtime_available(spark):
        pytest.skip("no Iceberg runtime jar in this environment")
    # a session with the jar also needs a registered catalog named `ice`
    # (spark.sql.catalog.ice=org.apache.iceberg.spark.SparkCatalog);
    # write → read → append → replay-idempotence → drop
    spark.conf.set(ICEBERG_NAMESPACE_CONF, "ice.search_index")
    try:
        cat = CatalogAdapter(str(tmp_path / "ice_idx"))
        cat.write_table(spark.range(4), "t")
        assert cat._load()["tables"]["t"]["iceberg_ident"] == (
            "ice.search_index.t"
        )
        assert cat.read_table(spark, "t").count() == 4
        cat.append_batch(spark.range(2), "inc", "b1")
        cat.append_batch(spark.range(2), "inc", "b1")  # replay: no dup
        assert cat.read_table(spark, "inc").count() == 2
        cat.drop_table("inc")
        assert not cat.has_table("inc")
    finally:
        spark.conf.unset(ICEBERG_NAMESPACE_CONF)


def test_iceberg_e2e_build_compact_query_when_jar_present(spark, tmp_path):
    """Full pipeline in Iceberg mode (runs automatically once a jar +
    registered `ice` catalog are present): build_index stages `parsed` via
    writeTo, compact_staging folds a streamed increment through
    cat.read_table, and the query engine answers over the Iceberg-backed
    tables. Iceberg-routed compaction must take the FULL re-derive path
    (self-referential RTAS is not runtime-tested — streaming/
    incremental.py routing) and still equal a from-scratch build."""
    if not iceberg_runtime_available(spark):
        pytest.skip("no Iceberg runtime jar in this environment")
    import os

    import pyarrow.parquet as pq

    from search_engine_spark.config import EngineConfig
    from search_engine_spark.operators.index_build import build_index
    from search_engine_spark.operators.search import BM25SearchEngine
    from search_engine_spark.sources.fixtures import (
        FIXTURE_QUERIES, generate_web_pages,
    )
    from search_engine_spark.streaming.incremental import (
        compact_staging, incremental_index_update,
    )

    spark.conf.set(ICEBERG_NAMESPACE_CONF, "ice.search_index_e2e")
    try:
        cfg = EngineConfig(num_buckets=4, shuffle_partitions=4)
        full = generate_web_pages(300)
        base = str(tmp_path / "base.parquet")
        pq.write_table(full.slice(0, 240), base)
        inc_dir = tmp_path / "incoming"
        inc_dir.mkdir()
        pq.write_table(full.slice(240, 60), str(inc_dir / "w.parquet"))

        idx = str(tmp_path / "ice_e2e_idx")
        build_index(spark, spark.read.parquet(base), idx, cfg,
                    resume_batches=1)
        incremental_index_update(spark, str(inc_dir),
                                 str(tmp_path / "staging"),
                                 str(tmp_path / "ckpt"), cfg)
        out = compact_staging(spark, idx, str(tmp_path / "staging"), cfg)
        assert out["incremental"] is False  # Iceberg → full re-derive

        # equals a from-scratch build over the union corpus
        allp = str(tmp_path / "all.parquet")
        pq.write_table(full, allp)
        spark.conf.set(ICEBERG_NAMESPACE_CONF, "ice.search_index_e2e_ref")
        ref = str(tmp_path / "ice_e2e_ref")
        build_index(spark, spark.read.parquet(allp), ref, cfg,
                    resume_batches=1)

        eng_a = BM25SearchEngine(spark, idx, cfg)
        spark.conf.set(ICEBERG_NAMESPACE_CONF, "ice.search_index_e2e")
        res_a = sorted(
            (r.qid, r.rank, r.url, round(r.score, 9))
            for r in eng_a.search_batch(FIXTURE_QUERIES[:8], k=10).collect()
        )
        spark.conf.set(ICEBERG_NAMESPACE_CONF, "ice.search_index_e2e_ref")
        eng_b = BM25SearchEngine(spark, ref, cfg)
        res_b = sorted(
            (r.qid, r.rank, r.url, round(r.score, 9))
            for r in eng_b.search_batch(FIXTURE_QUERIES[:8], k=10).collect()
        )
        assert res_a == res_b and len(res_a) > 0
    finally:
        spark.conf.unset(ICEBERG_NAMESPACE_CONF)
