"""Text-analysis operators over the ``documents`` table (driver-gate set).

Each operator has a Spark DataFrame implementation and a DuckDB oracle SQL
string with matching column names/types. These mirror the reference
pipeline's stages on the SQL-expressible simple tokenizer (the full parity
tokenizer is covered by tests/oracle.py): cleaning (P5), token counting
(A1), document frequency (A3), corpus stats (A2), idf (Q2), postings (A7),
capital folding (A5), entity extraction (P9), plus the training-data text
ops (language-ID, quality scoring, BPE-ish token counting, fingerprinting).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from search_engine_spark.pipelines.common import (
    SQL_HASH60, SQL_STOPWORDS, SQL_TOKENS, load, portable_hash60,
    sql_stopword_list, tokens_col,
)

URL_RE = r"http\S+|www.\S+"
ENTITY_RE = "([A-Z][a-zA-Z0-9]*(?: [A-Z][a-zA-Z0-9]*)+)"
BPE_RE = "[a-z]+|[0-9]|[^a-z0-9 ]"


# --- cleaning (P5 analog) ---------------------------------------------------

def q_clean_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load(spark, sf_dir, "documents").select(
        "doc_id",
        F.regexp_replace("text", URL_RE, "").alias("clean_text"),
        F.length(F.regexp_replace("text", URL_RE, "")).alias("clean_len"),
    )


SQL_CLEAN_TEXT = r"""
SELECT doc_id,
       regexp_replace(text, 'http\S+|www.\S+', '', 'g') AS clean_text,
       length(regexp_replace(text, 'http\S+|www.\S+', '', 'g')) AS clean_len
FROM documents
"""


# --- token counting (A1 analog) --------------------------------------------

def q_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load(spark, sf_dir, "documents").select(
        "doc_id",
        F.size(tokens_col()).cast("long").alias("n_tokens"),
        F.size(F.array_distinct(tokens_col())).cast("long").alias("n_unique"),
    )


SQL_TOKEN_COUNT = f"""
SELECT doc_id,
       len({SQL_TOKENS})::BIGINT AS n_tokens,
       len(list_distinct({SQL_TOKENS}))::BIGINT AS n_unique
FROM documents
"""


# --- document frequency (A3 analog) -----------------------------------------

def q_term_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return (
        docs.select("doc_id", F.explode(F.array_distinct(tokens_col())).alias("term"))
        .groupBy("term")
        .agg(F.count("*").alias("df"))
    )


SQL_TERM_DF = f"""
SELECT term, count(*)::BIGINT AS df
FROM (SELECT doc_id, unnest(list_distinct({SQL_TOKENS})) AS term FROM documents)
GROUP BY term
"""


# --- corpus stats (A2 analog) -----------------------------------------------

def q_corpus_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return docs.select(F.size(tokens_col()).alias("dl")).agg(
        F.count("*").cast("long").alias("n_docs"),
        F.round(F.avg("dl"), 6).alias("avg_doc_length"),
        F.sum("dl").cast("long").alias("total_tokens"),
    )


SQL_CORPUS_STATS = f"""
SELECT count(*)::BIGINT AS n_docs,
       round(avg(dl), 6) AS avg_doc_length,
       sum(dl)::BIGINT AS total_tokens
FROM (SELECT len({SQL_TOKENS}) AS dl FROM documents)
"""


# --- idf (Q2 analog: log10(N/df), df>1 prune M5) ----------------------------

def q_term_idf(spark: SparkSession, sf_dir: str) -> DataFrame:
    # N rides a broadcast single-row crossJoin (same pattern as
    # bm25_sql.bm25_topk) — ONE job, no separate docs.count() action and
    # no second corpus scan on the driver's behalf
    docs = load(spark, sf_dir, "documents")
    n_docs = docs.agg(F.count("*").cast("double").alias("n_docs"))
    return (
        q_term_df(spark, sf_dir)
        .filter(F.col("df") > 1)
        .crossJoin(F.broadcast(n_docs))
        .select(
            "term", "df",
            F.round(F.log10(F.col("n_docs") / F.col("df")), 6).alias("idf"),
        )
    )


SQL_TERM_IDF = f"""
WITH df AS (
  SELECT term, count(*)::BIGINT AS df
  FROM (SELECT doc_id, unnest(list_distinct({SQL_TOKENS})) AS term FROM documents)
  GROUP BY term
)
SELECT term, df,
       round(log10((SELECT count(*) FROM documents)::DOUBLE / df), 6) AS idf
FROM df WHERE df > 1
"""


# --- postings rows (A7 analog) ----------------------------------------------

def q_postings(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return (
        docs.select("doc_id", F.explode(tokens_col()).alias("term"))
        .groupBy("term", "doc_id")
        .agg(F.count("*").cast("long").alias("tf"))
    )


SQL_POSTINGS = f"""
SELECT term, doc_id, count(*)::BIGINT AS tf
FROM (SELECT doc_id, unnest({SQL_TOKENS}) AS term FROM documents)
GROUP BY term, doc_id
"""


# --- capital-letter AND-fold (A5/M7 analog) ---------------------------------

def q_capitals(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    toks = F.filter(
        F.split(F.col("text"), "[^a-zA-Z0-9]+"), lambda x: x != ""
    )
    return (
        docs.select(F.explode(toks).alias("tok"))
        .select(
            F.lower("tok").alias("term"),
            F.col("tok").rlike("^[A-Z]").alias("cap"),
        )
        .groupBy("term")
        .agg(
            F.bool_and("cap").alias("always_cap"),
            F.count("*").cast("long").alias("occurrences"),
        )
        .filter(F.col("always_cap"))
    )


SQL_CAPITALS = """
SELECT lower(tok) AS term,
       bool_and(regexp_matches(tok, '^[A-Z]')) AS always_cap,
       count(*)::BIGINT AS occurrences
FROM (
  SELECT unnest(list_filter(regexp_split_to_array(text, '[^a-zA-Z0-9]+'),
                            t -> t <> '')) AS tok
  FROM documents
)
GROUP BY lower(tok)
HAVING bool_and(regexp_matches(tok, '^[A-Z]'))
"""


# --- entity chunking (P9 analog) --------------------------------------------

def q_entities(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return (
        docs.select(
            F.explode(F.regexp_extract_all("text", F.lit(ENTITY_RE), 1)).alias("entity")
        )
        .groupBy("entity")
        .agg(F.count("*").cast("long").alias("mentions"))
    )


SQL_ENTITIES = f"""
SELECT entity, count(*)::BIGINT AS mentions
FROM (SELECT unnest(regexp_extract_all(text, '{ENTITY_RE}', 1)) AS entity
      FROM documents)
GROUP BY entity
"""


# --- non-vacuous capitals/entities gate entries ------------------------------
# The synthetic documents corpus is all-lowercase, so se_capitals /
# se_entities legitimately return 0 rows at every gate scale — correct but
# vacuous (VERDICT r4). These siblings run the SAME aggregations over
# documents UNION ALL a 4-row inline fixture whose invented tokens exercise
# every branch: an always-capitalized term (survives the AND-fold), a
# mixed-case term (negative control, folded out), and a multi-word entity
# mentioned twice. The fixture rides inline in BOTH the Spark plan and the
# DuckDB SQL (VALUES list), so the driver's value-hash compares real
# non-empty results.

CAPENT_FIXTURE_ROWS = (
    "Qzorvex index gained while Qzorvex futures slid",
    "analysts watched Qzorvex closely as Vexalon Ridge reported",
    "the Vexalon Ridge event repeated as qmixta stayed flat",
    "Qmixta rose early then qmixta faded",
)


def _docs_with_capent_fixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents").select("text")
    fx = spark.createDataFrame([(t,) for t in CAPENT_FIXTURE_ROWS],
                               "text string")
    return docs.unionByName(fx)


_SQL_CAPENT_FROM = (
    "(SELECT text FROM documents UNION ALL SELECT * FROM (VALUES "
    + ", ".join(f"('{t}')" for t in CAPENT_FIXTURE_ROWS)
    + ") fx(text))"
)


def q_capitals_nonvacuous(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs_with_capent_fixture(spark, sf_dir)
    toks = F.filter(
        F.split(F.col("text"), "[^a-zA-Z0-9]+"), lambda x: x != ""
    )
    return (
        docs.select(F.explode(toks).alias("tok"))
        .select(
            F.lower("tok").alias("term"),
            F.col("tok").rlike("^[A-Z]").alias("cap"),
        )
        .groupBy("term")
        .agg(
            F.bool_and("cap").alias("always_cap"),
            F.count("*").cast("long").alias("occurrences"),
        )
        .filter(F.col("always_cap"))
    )


SQL_CAPITALS_NONVACUOUS = f"""
SELECT lower(tok) AS term,
       bool_and(regexp_matches(tok, '^[A-Z]')) AS always_cap,
       count(*)::BIGINT AS occurrences
FROM (
  SELECT unnest(list_filter(regexp_split_to_array(text, '[^a-zA-Z0-9]+'),
                            t -> t <> '')) AS tok
  FROM {_SQL_CAPENT_FROM}
)
GROUP BY lower(tok)
HAVING bool_and(regexp_matches(tok, '^[A-Z]'))
"""


def q_entities_nonvacuous(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs_with_capent_fixture(spark, sf_dir)
    return (
        docs.select(
            F.explode(
                F.regexp_extract_all("text", F.lit(ENTITY_RE), 1)
            ).alias("entity")
        )
        .groupBy("entity")
        .agg(F.count("*").cast("long").alias("mentions"))
    )


SQL_ENTITIES_NONVACUOUS = f"""
SELECT entity, count(*)::BIGINT AS mentions
FROM (SELECT unnest(regexp_extract_all(text, '{ENTITY_RE}', 1)) AS entity
      FROM {_SQL_CAPENT_FROM})
GROUP BY entity
"""


# --- language ID (n-gram/stopword heuristic) --------------------------------

def q_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    toks = tokens_col()
    stop_hits = F.size(F.filter(toks, lambda x: x.isin(*SQL_STOPWORDS)))
    ratio = F.round(stop_hits / F.greatest(F.size(toks), F.lit(1)), 6)
    return docs.select(
        "doc_id",
        ratio.alias("stopword_ratio"),
        F.when(ratio > 0.04, "en").otherwise("other").alias("lang_pred"),
        "lang",
    )


SQL_LANGID = f"""
WITH t AS (
  SELECT doc_id, lang, {SQL_TOKENS} AS toks FROM documents
)
SELECT doc_id,
       round(len(list_filter(toks, x -> x IN ({sql_stopword_list()})))::DOUBLE
             / greatest(len(toks), 1), 6) AS stopword_ratio,
       CASE WHEN round(len(list_filter(toks, x -> x IN ({sql_stopword_list()})))::DOUBLE
             / greatest(len(toks), 1), 6) > 0.04 THEN 'en' ELSE 'other' END AS lang_pred,
       lang
FROM t
"""


# --- quality scoring ---------------------------------------------------------

def q_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    toks = tokens_col()
    n_tok = F.size(toks)
    return docs.select(
        "doc_id",
        F.length("text").cast("long").alias("n_chars"),
        n_tok.cast("long").alias("n_tokens"),
        F.round(
            F.length(F.regexp_replace("text", "[a-zA-Z0-9 ]", ""))
            / F.greatest(F.length("text"), F.lit(1)),
            6,
        ).alias("punct_ratio"),
        F.round(
            F.length(F.regexp_replace("text", "[^0-9]", ""))
            / F.greatest(F.length("text"), F.lit(1)),
            6,
        ).alias("digit_ratio"),
        F.round(
            (F.length("text") - F.length(F.regexp_replace("text", " ", "")))
            / F.greatest(n_tok, F.lit(1)),
            6,
        ).alias("spaces_per_token"),
    )


SQL_QUALITY = f"""
SELECT doc_id,
       length(text)::BIGINT AS n_chars,
       len({SQL_TOKENS})::BIGINT AS n_tokens,
       round(length(regexp_replace(text, '[a-zA-Z0-9 ]', '', 'g'))::DOUBLE
             / greatest(length(text), 1), 6) AS punct_ratio,
       round(length(regexp_replace(text, '[^0-9]', '', 'g'))::DOUBLE
             / greatest(length(text), 1), 6) AS digit_ratio,
       round((length(text) - length(replace(text, ' ', '')))::DOUBLE
             / greatest(len({SQL_TOKENS}), 1), 6) AS spaces_per_token
FROM documents
"""


# --- BPE-ish token counting --------------------------------------------------

def q_bpe_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.size(F.regexp_extract_all(F.lower("text"), F.lit(BPE_RE), 0))
        .cast("long")
        .alias("n_bpe_tokens"),
    )


SQL_BPE_COUNT = f"""
SELECT doc_id,
       len(regexp_extract_all(lower(text), '{BPE_RE}', 0))::BIGINT AS n_bpe_tokens
FROM documents
"""


# --- document fingerprint (order-insensitive token-hash sum) ----------------

def q_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    exploded = docs.select(
        "doc_id", F.explode(F.array_distinct(tokens_col())).alias("term")
    )
    h31 = F.pmod(portable_hash60(F.col("term")), F.lit(2147483647))
    return (
        exploded.select("doc_id", h31.alias("h"))
        .groupBy("doc_id")
        .agg(
            F.pmod(F.sum("h"), F.lit(2147483647)).cast("long").alias("fingerprint"),
            F.count("*").cast("long").alias("n_unique"),
        )
    )


SQL_FINGERPRINT = f"""
SELECT doc_id,
       (sum({SQL_HASH60.format(col='term')} % 2147483647)
        % 2147483647)::BIGINT AS fingerprint,
       count(*)::BIGINT AS n_unique
FROM (SELECT doc_id, unnest(list_distinct({SQL_TOKENS})) AS term FROM documents)
GROUP BY doc_id
"""


# --- repeated n-gram ratio (Gopher/MassiveText-style repetition signal) -----
# Training-data quality filter: the fraction of a document's word n-grams
# that are duplicates (1 - distinct/total). High values flag boilerplate /
# template spam. Count-based variant of the Gopher repetition rules
# (Rae et al. 2021, §A1.1); `repetitive` applies the 2-gram threshold.

REP_2GRAM_THRESHOLD = 0.05


def q_rep_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents").select(
        "doc_id", tokens_col().alias("toks")
    )
    g2 = F.expr(
        "transform(slice(toks, 1, greatest(size(toks)-1, 0)),"
        " (x, i) -> concat(x, ' ', toks[i+1]))"
    )
    g3 = F.expr(
        "transform(slice(toks, 1, greatest(size(toks)-2, 0)),"
        " (x, i) -> concat(x, ' ', toks[i+1], ' ', toks[i+2]))"
    )
    out = docs.select(
        "doc_id", g2.alias("g2"), g3.alias("g3")
    ).select(
        "doc_id",
        F.size("g2").cast("long").alias("n_2grams"),
        F.when(
            F.size("g2") > 0,
            F.round(1 - F.size(F.array_distinct("g2")) / F.size("g2"), 6),
        ).otherwise(F.lit(0.0)).alias("dup_2gram_frac"),
        F.when(
            F.size("g3") > 0,
            F.round(1 - F.size(F.array_distinct("g3")) / F.size("g3"), 6),
        ).otherwise(F.lit(0.0)).alias("dup_3gram_frac"),
    )
    return out.withColumn(
        "repetitive", F.col("dup_2gram_frac") > REP_2GRAM_THRESHOLD
    )


SQL_REP_NGRAM = f"""
WITH t AS (SELECT doc_id, {SQL_TOKENS} AS toks FROM documents),
g AS (
  SELECT doc_id,
         list_transform(range(1, greatest(len(toks), 1)),
                        i -> toks[i] || ' ' || toks[i+1]) AS g2,
         list_transform(range(1, greatest(len(toks) - 1, 1)),
                        i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]) AS g3
  FROM t)
SELECT doc_id,
       len(g2)::BIGINT AS n_2grams,
       CASE WHEN len(g2) > 0
            THEN round(1 - len(list_distinct(g2))::DOUBLE / len(g2), 6)
            ELSE 0.0 END AS dup_2gram_frac,
       CASE WHEN len(g3) > 0
            THEN round(1 - len(list_distinct(g3))::DOUBLE / len(g3), 6)
            ELSE 0.0 END AS dup_3gram_frac,
       CASE WHEN len(g2) > 0
            THEN round(1 - len(list_distinct(g2))::DOUBLE / len(g2), 6)
            ELSE 0.0 END > {REP_2GRAM_THRESHOLD} AS repetitive
FROM g
"""
