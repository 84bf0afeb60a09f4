"""Deduplication operators over ``documents`` (training-data pipeline set).

Exact (hash-groupBy), n-gram Jaccard, MinHash+LSH, and SimHash — each with
a DuckDB oracle using the portable md5-prefix hash so both engines compute
identical integers. The Spark implementations are the scale-shaped ones:
shingle → hash → band → bucket-join (no all-pairs comparison except between
LSH candidates).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from search_engine_spark.pipelines.common import (
    SQL_HASH60, SQL_TOKENS, load, portable_hash60, tokens_col,
)

P31 = 2147483647  # 2^31 - 1, the modulus for all minhash/simhash arithmetic
SHINGLE_K = 3
N_HASHES = 8
N_BANDS = 4  # rows-per-band = 2
#: fixed affine coefficients for the minhash permutation family
MINHASH_A = [1103515245, 1201633, 2027839, 48271, 69621, 1664525, 22695477, 65539]
MINHASH_B = [12345, 5569, 33461, 271, 7919, 104729, 130363, 95279]
SIMHASH_BITS = 16
JACCARD_THRESHOLD = 0.5
#: hot-shingle ceiling for exact-Jaccard candidate generation: shingles
#: appearing in more than this many documents are dropped BEFORE the
#: self-join. Without it a single boilerplate 3-gram ("one of the") with
#: corpus df d contributes O(d²) candidate pairs — the self-join is
#: quadratic in the hottest shingle's df and dies at scale. With the
#: ceiling the join's worst case is bounded at |shingles|·MAX_SHINGLE_DF
#: pairs. Jaccard is therefore defined over each doc's *rare-shingle* set
#: (df <= ceiling) — boilerplate shingles carry no dedup signal anyway.
#: The DuckDB oracle applies the identical filter.
MAX_SHINGLE_DF = 100


# --- exact dedup -------------------------------------------------------------

def dedup_exact(spark: SparkSession, sf_dir: str,
                docs: DataFrame | None = None) -> DataFrame:
    """``docs`` (doc_id, text, ...) lets a composed pipeline inject an
    already-materialized corpus relation instead of re-scanning parquet
    (corpus_curate's single-scan contract)."""
    if docs is None:
        docs = load(spark, sf_dir, "documents")
    return (
        docs.select("doc_id", F.md5("text").alias("text_hash"))
        .groupBy("text_hash")
        .agg(
            F.min("doc_id").cast("long").alias("keep_doc_id"),
            F.count("*").cast("long").alias("n_copies"),
        )
    )


SQL_DEDUP_EXACT = """
SELECT md5(text) AS text_hash,
       min(doc_id)::BIGINT AS keep_doc_id,
       count(*)::BIGINT AS n_copies
FROM documents
GROUP BY md5(text)
"""


# --- shingles (shared by jaccard + minhash) ----------------------------------

def _shingles(spark: SparkSession, sf_dir: str,
              docs: DataFrame | None = None) -> DataFrame:
    """Distinct 3-token shingles per doc: (doc_id, shingle).

    ``docs`` may inject a relation that already carries a ``toks`` column
    (the simple-tokenizer array) — the tokenize then happens once upstream
    instead of per-operator (corpus_curate's single-scan contract)."""
    if docs is None:
        docs = load(spark, sf_dir, "documents").select(
            "doc_id", tokens_col().alias("toks")
        )
    else:
        docs = docs.select("doc_id", "toks")
    shingles = F.expr(
        f"CASE WHEN size(toks) >= {SHINGLE_K} THEN "
        f"transform(sequence(0, size(toks) - {SHINGLE_K}), "
        "i -> concat(toks[i], ' ', toks[i+1], ' ', toks[i+2])) "
        "ELSE array() END"
    )
    return docs.select(
        "doc_id", F.explode(F.array_distinct(shingles)).alias("shingle")
    )


_SQL_SHINGLES = f"""
  SELECT DISTINCT tok.doc_id,
         tok.t || ' ' || t2.t || ' ' || t3.t AS shingle
  FROM (SELECT doc_id, generate_subscripts({SQL_TOKENS}, 1) AS pos,
               unnest({SQL_TOKENS}) AS t FROM documents) tok
  JOIN (SELECT doc_id, generate_subscripts({SQL_TOKENS}, 1) AS pos,
               unnest({SQL_TOKENS}) AS t FROM documents) t2
    ON tok.doc_id = t2.doc_id AND t2.pos = tok.pos + 1
  JOIN (SELECT doc_id, generate_subscripts({SQL_TOKENS}, 1) AS pos,
               unnest({SQL_TOKENS}) AS t FROM documents) t3
    ON tok.doc_id = t3.doc_id AND t3.pos = tok.pos + 2
"""


# --- n-gram Jaccard ----------------------------------------------------------

def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Candidate pairs sharing >=1 rare shingle, exact Jaccard >= threshold.

    Scale shape: the hot-shingle ceiling (MAX_SHINGLE_DF) bounds the
    self-join fan-out — candidate generation is O(Σ df²) over *surviving*
    shingles only, each df <= ceiling.
    """
    raw = _shingles(spark, sf_dir)
    rare = (
        raw.groupBy("shingle")
        .agg(F.count("*").alias("shingle_df"))
        .filter(F.col("shingle_df") <= MAX_SHINGLE_DF)
        .select("shingle")
    )
    sh = raw.join(rare, "shingle").cache()
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_shingles"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("n_common"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_shingles").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_shingles").alias("nb"))
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_common")
                / (F.col("na") + F.col("nb") - F.col("n_common")),
                6,
            ),
        )
        .filter(F.col("jaccard") >= JACCARD_THRESHOLD)
        .select("doc_a", "doc_b", "jaccard",
                F.col("n_common").cast("long").alias("n_common"))
    )


SQL_DEDUP_NGRAM_JACCARD = f"""
WITH raw_shingles AS ({_SQL_SHINGLES}),
rare AS (
  SELECT shingle FROM raw_shingles
  GROUP BY shingle HAVING count(*) <= {MAX_SHINGLE_DF}
),
shingles AS (
  SELECT doc_id, shingle FROM raw_shingles JOIN rare USING (shingle)
),
sizes AS (SELECT doc_id, count(*)::BIGINT AS n FROM shingles GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*)::BIGINT AS n_common
  FROM shingles a JOIN shingles b
    ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT doc_a, doc_b,
       round(n_common::DOUBLE / (sa.n + sb.n - n_common), 6) AS jaccard,
       n_common
FROM inter
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE round(n_common::DOUBLE / (sa.n + sb.n - n_common), 6) >= {JACCARD_THRESHOLD}
"""


# --- MinHash + LSH -----------------------------------------------------------

def _minhash_signatures(spark: SparkSession, sf_dir: str,
                        shingles: DataFrame | None = None) -> DataFrame:
    sh = shingles if shingles is not None else _shingles(spark, sf_dir)
    x31 = F.pmod(portable_hash60(F.col("shingle")), F.lit(P31))
    aggs = [
        F.min(F.pmod(F.lit(MINHASH_A[j]) * x31 + F.lit(MINHASH_B[j]), F.lit(P31)))
        .cast("long")
        .alias(f"mh{j}")
        for j in range(N_HASHES)
    ]
    return sh.groupBy("doc_id").agg(*aggs)


def _sql_minhash_signatures() -> str:
    x31 = f"({SQL_HASH60.format(col='shingle')} % {P31})"
    cols = ", ".join(
        f"min(({MINHASH_A[j]}::BIGINT * {x31} + {MINHASH_B[j]}) % {P31})::BIGINT AS mh{j}"
        for j in range(N_HASHES)
    )
    return f"SELECT doc_id, {cols} FROM ({_SQL_SHINGLES}) GROUP BY doc_id"


def dedup_minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _minhash_signatures(spark, sf_dir)


SQL_DEDUP_MINHASH_SIGNATURES = _sql_minhash_signatures()


def dedup_minhash_lsh(spark: SparkSession, sf_dir: str,
                      shingles: DataFrame | None = None) -> DataFrame:
    """LSH candidate pairs (band collision) with estimated Jaccard."""
    sig = _minhash_signatures(spark, sf_dir, shingles).cache()
    bands = None
    for band in range(N_BANDS):
        bh = (
            F.col(f"mh{2 * band}") * F.lit(P31) + F.col(f"mh{2 * band + 1}")
        ).alias("band_hash")
        part = sig.select("doc_id", F.lit(band).alias("band"), bh)
        bands = part if bands is None else bands.unionAll(part)
    a, b = bands.alias("a"), bands.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )
    sa = sig.select(F.col("doc_id").alias("doc_a"),
                    *[F.col(f"mh{j}").alias(f"a{j}") for j in range(N_HASHES)])
    sb = sig.select(F.col("doc_id").alias("doc_b"),
                    *[F.col(f"mh{j}").alias(f"b{j}") for j in range(N_HASHES)])
    matches = sum(
        F.when(F.col(f"a{j}") == F.col(f"b{j}"), 1).otherwise(0)
        for j in range(N_HASHES)
    )
    return (
        pairs.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a", "doc_b",
            F.round(matches / F.lit(float(N_HASHES)), 6).alias("est_jaccard"),
        )
    )


SQL_DEDUP_MINHASH_LSH = f"""
WITH sig AS ({_sql_minhash_signatures()}),
bands AS (
  {" UNION ALL ".join(
      f"SELECT doc_id, {band} AS band, mh{2*band}::BIGINT * {P31} + mh{2*band+1} AS band_hash FROM sig"
      for band in range(N_BANDS)
  )}
),
pairs AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.band_hash = b.band_hash AND a.doc_id < b.doc_id
)
SELECT doc_a, doc_b,
       round(({" + ".join(
           f"CASE WHEN sa.mh{j} = sb.mh{j} THEN 1 ELSE 0 END"
           for j in range(N_HASHES)
       )})::DOUBLE / {N_HASHES}, 6) AS est_jaccard
FROM pairs
JOIN sig sa ON sa.doc_id = doc_a
JOIN sig sb ON sb.doc_id = doc_b
"""


# --- LSH + exact verify (the production 100 TB dedup recipe) -----------------

def dedup_lsh_verified(spark: SparkSession, sf_dir: str,
                       docs: DataFrame | None = None) -> DataFrame:
    """MinHash-LSH candidate generation chained into exact-Jaccard verify.

    The canonical web-scale dedup composition: banded LSH proposes
    candidate pairs (no all-pairs — O(band collisions)), then exact
    Jaccard over each doc's rare-shingle set (hot-shingle ceiling, same
    semantics as dedup_ngram_jaccard) confirms them. Only candidate pairs
    ever touch the verify join, so the expensive exact comparison runs on
    the LSH survivors instead of the corpus square. The shingle relation
    is computed once and cached — signatures and verify sets share it (at
    100 TB it would be a persisted intermediate table). ``docs`` injects an
    already-tokenized (doc_id, toks) relation (see _shingles).
    """
    raw = _shingles(spark, sf_dir, docs).cache()
    cand = dedup_minhash_lsh(spark, sf_dir, shingles=raw).cache()
    rare = (
        raw.groupBy("shingle")
        .agg(F.count("*").alias("shingle_df"))
        .filter(F.col("shingle_df") <= MAX_SHINGLE_DF)
        .select("shingle")
    )
    sh = raw.join(rare, "shingle").cache()
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_shingles"))
    a = sh.select(F.col("doc_id").alias("doc_a"), "shingle")
    b = sh.select(F.col("doc_id").alias("doc_b"), "shingle")
    inter = (
        cand.select("doc_a", "doc_b")
        .join(a, "doc_a")
        .join(b, ["doc_b", "shingle"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("n_common"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"),
                      F.col("n_shingles").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"),
                      F.col("n_shingles").alias("nb"))
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_common")
                / (F.col("na") + F.col("nb") - F.col("n_common")),
                6,
            ),
        )
        .filter(F.col("jaccard") >= JACCARD_THRESHOLD)
        .join(cand, ["doc_a", "doc_b"])
        .select("doc_a", "doc_b", "est_jaccard", "jaccard",
                F.col("n_common").cast("long").alias("n_common"))
    )


SQL_DEDUP_LSH_VERIFIED = f"""
WITH sig AS ({_sql_minhash_signatures()}),
bands AS (
  {" UNION ALL ".join(
      f"SELECT doc_id, {band} AS band, mh{2*band}::BIGINT * {P31} + mh{2*band+1} AS band_hash FROM sig"
      for band in range(N_BANDS)
  )}
),
cand AS (
  SELECT doc_a, doc_b,
         round(({" + ".join(
             f"CASE WHEN sa.mh{j} = sb.mh{j} THEN 1 ELSE 0 END"
             for j in range(N_HASHES)
         )})::DOUBLE / {N_HASHES}, 6) AS est_jaccard
  FROM (
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM bands a JOIN bands b
      ON a.band = b.band AND a.band_hash = b.band_hash AND a.doc_id < b.doc_id
  )
  JOIN sig sa ON sa.doc_id = doc_a
  JOIN sig sb ON sb.doc_id = doc_b
),
raw_shingles AS ({_SQL_SHINGLES}),
rare AS (
  SELECT shingle FROM raw_shingles
  GROUP BY shingle HAVING count(*) <= {MAX_SHINGLE_DF}
),
shingles AS (
  SELECT doc_id, shingle FROM raw_shingles JOIN rare USING (shingle)
),
sizes AS (SELECT doc_id, count(*)::BIGINT AS n FROM shingles GROUP BY doc_id),
inter AS (
  SELECT c.doc_a, c.doc_b, count(*)::BIGINT AS n_common
  FROM cand c
  JOIN shingles a ON a.doc_id = c.doc_a
  JOIN shingles b ON b.doc_id = c.doc_b AND b.shingle = a.shingle
  GROUP BY c.doc_a, c.doc_b
)
SELECT i.doc_a, i.doc_b, c.est_jaccard,
       round(i.n_common::DOUBLE / (sa.n + sb.n - i.n_common), 6) AS jaccard,
       i.n_common
FROM inter i
JOIN sizes sa ON sa.doc_id = i.doc_a
JOIN sizes sb ON sb.doc_id = i.doc_b
JOIN cand c ON c.doc_a = i.doc_a AND c.doc_b = i.doc_b
WHERE round(i.n_common::DOUBLE / (sa.n + sb.n - i.n_common), 6) >= {JACCARD_THRESHOLD}
"""


# --- SimHash -----------------------------------------------------------------

def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(F.array_distinct(tokens_col())).alias("term")
    )
    h = F.pmod(portable_hash60(F.col("term")), F.lit(P31))
    toks = toks.select("doc_id", h.alias("h"))
    bit_sums = [
        F.sum(
            F.when(F.shiftright(F.col("h"), b).bitwiseAND(1) == 1, 1).otherwise(-1)
        ).alias(f"s{b}")
        for b in range(SIMHASH_BITS)
    ]
    agg = toks.groupBy("doc_id").agg(*bit_sums)
    simhash = sum(
        F.when(F.col(f"s{b}") > 0, F.lit(1 << b)).otherwise(0)
        for b in range(SIMHASH_BITS)
    )
    return agg.select("doc_id", simhash.cast("long").alias("simhash"))


SQL_DEDUP_SIMHASH = f"""
WITH t AS (
  SELECT doc_id, ({SQL_HASH60.format(col='term')} % {P31}) AS h
  FROM (SELECT doc_id, unnest(list_distinct({SQL_TOKENS})) AS term FROM documents)
),
s AS (
  SELECT doc_id,
         {", ".join(
             f"sum(CASE WHEN (h >> {b}) & 1 = 1 THEN 1 ELSE -1 END) AS s{b}"
             for b in range(SIMHASH_BITS)
         )}
  FROM t GROUP BY doc_id
)
SELECT doc_id,
       ({" + ".join(
           f"CASE WHEN s{b} > 0 THEN {1 << b} ELSE 0 END"
           for b in range(SIMHASH_BITS)
       )})::BIGINT AS simhash
FROM s
"""
