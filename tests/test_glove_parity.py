"""Embedding (GloVe) score component: full combined-score rank identity.

The reference's final score is 0.9·tf-idf-cosine + 0.05·BM25 +
0.05·GloVe-cosine (reference ranker.py:76-89); the earlier parity tests run
with the embedding component off (weight contributes exactly 0 when no
embedding is configured, matching an empty glove dict in the oracle). This
module exercises the full three-component score with a deterministic
fixture embedding shared between the Spark engine (via a GloVe-format file,
search_engine.py:13-23) and the oracle (via the dict) — no external data.
"""

import pytest

from search_engine_spark.config import EngineConfig
from search_engine_spark.sources.fixtures import FIXTURE_QUERIES


@pytest.fixture(scope="module")
def glove_dict():
    from search_engine_spark.functions.glove import fixture_glove

    # cover 2/3 of the synthetic vocabulary plus a few special tokens so the
    # miss path (terms without a vector) is exercised too
    terms = [f"term{i:04d}" for i in range(0, 5000) if i % 3 != 0]
    terms += ["covid", "cases", "guidance", "nasdaq", "world", "health"]
    return fixture_glove(terms)


@pytest.fixture(scope="module")
def glove_index(spark, tiny_corpus_path, glove_dict, tmp_path_factory):
    from search_engine_spark.functions.glove import save_glove
    from search_engine_spark.operators.index_build import build_index

    root = tmp_path_factory.mktemp("glove")
    glove_path = str(root / "fixture_glove.txt")
    save_glove(glove_path, glove_dict)
    index_path = str(root / "index")
    cfg = EngineConfig(num_buckets=4, shuffle_partitions=8,
                       glove_path=glove_path)
    pages = spark.read.parquet(tiny_corpus_path)
    build_index(spark, pages, index_path, cfg)
    return index_path, cfg


@pytest.fixture(scope="module")
def glove_oracle(tiny_corpus_rows, glove_dict):
    from tests.oracle import build_oracle

    return build_oracle(tiny_corpus_rows, glove_dict=glove_dict)


def test_glove_roundtrip(tmp_path, glove_dict):
    import numpy as np

    from search_engine_spark.functions.glove import load_glove, save_glove

    p = str(tmp_path / "g.txt")
    save_glove(p, glove_dict)
    loaded = load_glove(p)
    assert loaded.keys() == glove_dict.keys()
    some = list(glove_dict)[:50]
    for t in some:
        assert np.array_equal(loaded[t], glove_dict[t])  # exact float64


def test_doc_vector_parity(spark, glove_index, glove_oracle):
    """Per-doc mean embedding identical between engine table and oracle."""
    import numpy as np

    from search_engine_spark.sources.catalog import CatalogAdapter

    index_path, cfg = glove_index
    rows = (
        CatalogAdapter(index_path)
        .read_table(spark, "doc_stats")
        .select("url", "glove_vec")
        .collect()
    )
    assert len(rows) == glove_oracle.n_docs
    checked = 0
    for r in rows[:200]:
        gvec = glove_oracle.doc_stats[r["url"]][2]
        assert np.allclose(np.asarray(r["glove_vec"]), gvec, atol=0, rtol=0), r["url"]
        checked += 1
    assert checked


def test_combined_score_rank_identity(spark, glove_index, glove_oracle):
    from search_engine_spark.operators.search import BM25SearchEngine

    index_path, cfg = glove_index
    engine = BM25SearchEngine(spark, index_path, cfg)
    k = 10
    result = engine.search_batch(FIXTURE_QUERIES, k=k).collect()
    got = {}
    for r in result:
        got.setdefault(r["qid"], []).append((r["rank"], r["url"], r["score"]))
    for qid in got:
        got[qid].sort()

    mismatches = []
    for qid, text in FIXTURE_QUERIES:
        expected = glove_oracle.search(text, k=k)
        actual = got.get(qid, [])
        if len(expected) != len(actual):
            mismatches.append((qid, "len", len(expected), len(actual)))
            continue
        for (er, eu, es, _ets), (ar, au, asc) in zip(expected, actual):
            if er != ar or eu != au or abs(es - asc) > 1e-9:
                mismatches.append((qid, er, (eu, es), (au, asc)))
    assert not mismatches, f"rank-identity failures: {mismatches[:10]}"
