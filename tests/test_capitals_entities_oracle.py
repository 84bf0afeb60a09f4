"""Non-vacuous cross-engine evidence for A4/A5/P9 gate queries.

The driver's ``documents`` corpus is 100% lowercase, so the
``se_capitals``/``se_entities`` gate rows pass vacuously (0 rows in both
engines). This test runs the SAME oracle SQL (SQL_CAPITALS / SQL_ENTITIES)
and the SAME Spark implementations (q_capitals / q_entities) over a fixture
corpus that actually contains capitalized tokens, always-capitalized terms
(NASDAQ-style, reference indexer.py:161-166), and multi-word entities
(reference parser_module.py:60-72) — so the capital AND-fold and entity
extraction logic has a >0-row cross-engine check.
"""

import duckdb
import pytest

from search_engine_spark.pipelines.textstats import (
    SQL_CAPITALS, SQL_ENTITIES, q_capitals, q_entities,
)

DOCS = [
    (1, "NASDAQ rallied today as New York traders cheered", "en"),
    (2, "the NASDAQ index closed higher in New York City", "en"),
    (3, "traders on nasdaq-adjacent floors were calm", "en"),  # lowercase hit
    (4, "COVID19 research from Stanford University continues", "en"),
    (5, "plain lowercase text with no entities at all", "en"),
    (6, "Stanford University and New York share researchers", "en"),
    (7, "NASDAQ NASDAQ NASDAQ only uppercase here", "en"),
]


@pytest.fixture(scope="module")
def fixture_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("capent")
    spark.createDataFrame(DOCS, "doc_id long, text string, lang string") \
        .coalesce(1).write.mode("overwrite") \
        .parquet(str(d / "documents.parquet"))
    return str(d)


def _norm(rows):
    return sorted(tuple(r) for r in rows)


def _duck(fixture_dir):
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS "
        f"SELECT * FROM '{fixture_dir}/documents.parquet/*.parquet'"
    )
    return con


def test_capitals_non_vacuous(spark, fixture_dir):
    sdf = q_capitals(spark, fixture_dir)
    cols = sdf.columns
    got = _norm([tuple(r[c] for c in cols) for r in sdf.collect()])
    con = _duck(fixture_dir)
    duck = con.sql(SQL_CAPITALS)
    assert cols == [d[0] for d in duck.description]
    exp = _norm(duck.fetchall())
    assert got == exp
    assert len(got) > 0, "capitals check is vacuous on this fixture"
    terms = {t for t, _cap, _n in got}
    # 'nasdaq' appears lowercase in doc 3 → AND-fold kills it;
    # 'covid19' and 'stanford' are always capitalized → survive
    assert "nasdaq" not in terms
    assert "covid19" in terms
    assert "stanford" in terms


def test_entities_non_vacuous(spark, fixture_dir):
    sdf = q_entities(spark, fixture_dir)
    cols = sdf.columns
    got = _norm([tuple(r[c] for c in cols) for r in sdf.collect()])
    con = _duck(fixture_dir)
    duck = con.sql(SQL_ENTITIES)
    assert cols == [d[0] for d in duck.description]
    exp = _norm(duck.fetchall())
    assert got == exp
    assert len(got) > 0, "entities check is vacuous on this fixture"
    ents = dict((e, n) for e, n in got)
    assert ents.get("New York", 0) >= 2
    assert "Stanford University" in ents
