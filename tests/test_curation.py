"""Cross-engine evidence for the curation operators (pipelines/curation.py).

The driver's synthetic corpus contains no PII and limited quality spread,
so — as with tests/test_capitals_entities_oracle.py — the SAME Spark
implementations and the SAME oracle SQL run here over a fixture corpus that
exercises every rule: emails/IPv4s/phone numbers for the scrubber, and
documents that individually fail each Gopher rule (too short, word salad
with no stopwords, heavy 2-gram repetition, symbol spam) for the filter.
"""

import duckdb
import pytest

from search_engine_spark.pipelines.curation import (
    SQL_TEXT_GOPHER_FILTER, SQL_TEXT_PII_SCRUB, SQL_TEXT_SOURCE_MIX,
    text_gopher_filter, text_pii_scrub, text_source_mix,
)

GOOD = (
    "the quick brown fox jumps over the lazy dog and then runs off to find "
    "a quiet place by the river where it can rest with friends and watch "
    "the water flow past the old stone bridge that the village built of "
    "local rock many years ago for the farmers and their slow heavy carts"
)

DOCS = [
    # (doc_id, text, lang, source, n_chars)
    (1, GOOD, "en", "src0", len(GOOD)),
    (2, "too short to keep", "en", "src0", 17),
    (3, ("lorem ipsum dolor sit amet " * 12).strip(), "la", "src1",
     len(("lorem ipsum dolor sit amet " * 12).strip())),  # no stopwords, repetitive
    (4, GOOD + " contact me at jane.doe+spam@example.co.uk or "
        "admin@mail.example.com today", "en", "src1", 0),
    (5, GOOD + " server 192.168.0.1 and 10.0.0.255 answered", "en",
     "src0", 0),
    (6, GOOD + " call +1 555-867-5309 or (020) 7946 0958 now", "en",
     "src1", 0),
    (7, GOOD + " ### hash spam ### ... and more ... #tags #everywhere "
        "### ... ### ...", "en", "src0", 0),
    (8, GOOD, "en", "src1", 0),  # exact duplicate of doc 1
]
DOCS = [(i, t, lang, src, len(t)) for (i, t, lang, src, _n) in DOCS]


@pytest.fixture(scope="module")
def fixture_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("curation")
    spark.createDataFrame(
        DOCS, "doc_id long, text string, lang string, source string,"
        " n_chars long"
    ).coalesce(1).write.mode("overwrite").parquet(
        str(d / "documents.parquet")
    )
    return str(d)


def _duck(fixture_dir):
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS "
        f"SELECT * FROM '{fixture_dir}/documents.parquet/*.parquet'"
    )
    return con


def _compare(spark_df, con, sql):
    cols = spark_df.columns
    duck = con.sql(sql)
    assert cols == [d[0] for d in duck.description]
    got = sorted(tuple(r[c] for c in cols) for r in spark_df.collect())
    exp = sorted(tuple(r) for r in duck.fetchall())
    assert got == exp
    return {r[0]: dict(zip(cols, r)) for r in got}


def test_pii_scrub_non_vacuous(spark, fixture_dir):
    by_doc = _compare(
        text_pii_scrub(spark, fixture_dir), _duck(fixture_dir),
        SQL_TEXT_PII_SCRUB,
    )
    assert by_doc[4]["n_emails"] == 2
    assert "<EMAIL>" in by_doc[4]["scrubbed"]
    assert "example.co.uk" not in by_doc[4]["scrubbed"]
    assert by_doc[5]["n_ips"] == 2
    assert "192.168.0.1" not in by_doc[5]["scrubbed"]
    assert by_doc[6]["n_phones"] >= 2
    assert "555" not in by_doc[6]["scrubbed"]
    # clean docs pass through untouched
    assert by_doc[1]["pii_total"] == 0
    assert by_doc[1]["scrubbed"] == GOOD


def test_gopher_filter_each_rule(spark, fixture_dir):
    by_doc = _compare(
        text_gopher_filter(spark, fixture_dir), _duck(fixture_dir),
        SQL_TEXT_GOPHER_FILTER,
    )
    assert by_doc[1]["keep"] is True
    assert by_doc[2]["wc_ok"] is False and by_doc[2]["keep"] is False
    assert by_doc[3]["stop_ok"] is False and by_doc[3]["rep_ok"] is False
    assert by_doc[7]["sym_ok"] is False and by_doc[7]["keep"] is False
    keeps = {d["keep"] for d in by_doc.values()}
    assert keeps == {True, False}, "filter is vacuous on this fixture"


def test_corpus_curate_composition(spark, fixture_dir):
    """The composed recipe drops each loser class: quality failures
    (docs 2/3/7), the exact duplicate (doc 8 loses to doc 1), and
    LSH-verified near-duplicates of doc 1 (docs 4/5/6 share the GOOD
    prefix, Jaccard >= 0.5, higher doc_id loses) — and scrubs survivors."""
    from search_engine_spark.pipelines.curation import (
        corpus_curate, sql_corpus_curate,
    )

    by_doc = _compare(
        corpus_curate(spark, fixture_dir), _duck(fixture_dir),
        sql_corpus_curate(),
    )
    kept = set(by_doc)
    assert 1 in kept
    assert not {2, 3, 7} & kept, "quality losers survived"
    assert 8 not in kept, "exact duplicate survived"
    assert not {4, 5, 6} & kept, "near-duplicates survived"
    assert by_doc[1]["scrubbed"] == GOOD


def test_source_mix_shares(spark, fixture_dir):
    sdf = text_source_mix(spark, fixture_dir)
    rows = sorted(
        tuple(r[c] for c in sdf.columns) for r in sdf.collect()
    )
    con = _duck(fixture_dir)
    exp = sorted(tuple(r) for r in con.sql(SQL_TEXT_SOURCE_MIX).fetchall())
    assert rows == exp
    shares = [r[-1] for r in rows]
    assert abs(sum(shares) - 1.0) < 1e-4
    assert len(rows) >= 3  # multiple (source, lang) cells on the fixture
