"""Shared helpers for the dataset-pipeline operators (driver-gate queries).

These operators run over the driver's generic test tables (documents,
embeddings, events, TPC-H-ish star schema — TESTDATA.md) and each has an
ANSI-SQL oracle executed by DuckDB. For cross-engine value-hash parity:

- the *simple tokenizer* here (lowercase, split on non-alphanumerics) is
  SQL-expressible in both engines — unlike the parity tokenizer in
  functions/textproc.py, which is exercised by the pytest oracle instead;
- ``portable_hash60`` is a 60-bit integer hash both engines compute
  identically: the first 15 hex digits of md5;
- floats are rounded (default 6 dp) before leaving any query.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

TOKEN_SPLIT_RE = "[^a-z0-9]+"

#: english stopword subset used by SQL-parity language-ID / quality scoring
SQL_STOPWORDS = (
    "the", "of", "and", "a", "in", "to", "is", "on", "for", "with", "as",
    "by", "at", "or", "be", "this", "that", "from", "it", "an",
)


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def tokens_col(col: str = "text"):
    """array<string> of lowercase alphanumeric tokens (simple tokenizer)."""
    return F.filter(
        F.split(F.lower(F.col(col)), TOKEN_SPLIT_RE), lambda x: x != ""
    )


SQL_TOKENS = (
    "list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),"
    " t -> t <> '')"
)


def portable_hash60(col):
    """60-bit int hash identical across Spark and DuckDB (md5 prefix)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


SQL_HASH60 = "(('0x' || substr(md5({col}), 1, 15))::BIGINT)"


def sql_stopword_list() -> str:
    return ", ".join(f"'{w}'" for w in SQL_STOPWORDS)
