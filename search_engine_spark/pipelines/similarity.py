"""Similarity search over the ``embeddings`` table (array<float> column).

Brute-force cosine top-k as the correctness baseline, random-hyperplane LSH
bucketing as the scale path, and an IVF-style partition-probed variant
(coarse partitions = the table's ``label`` column). Dot products stay
JVM-side via ``aggregate``/``zip_with`` — no Python in the hot path.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from search_engine_spark.pipelines.common import load

N_PROBES = 5          # probe vectors: vec_id 0..4
TOP_K = 10
N_PLANES = 8
PLANE_MOD = 1001      # hyperplane weights in [-500, 500]
COS_ROUND = 6


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x)
    )


def sim_bruteforce_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-k for each probe vector (brute force baseline)."""
    emb = load(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    probes = emb.filter(F.col("vec_id") < N_PROBES).select(
        F.col("vec_id").alias("probe_id"), F.col("v").alias("p")
    )
    joined = emb.crossJoin(F.broadcast(probes)).filter(
        F.col("vec_id") != F.col("probe_id")
    )
    cos = _dot(F.col("v"), F.col("p")) / (_norm(F.col("v")) * _norm(F.col("p")))
    scored = joined.select(
        "probe_id", "vec_id", F.round(cos, COS_ROUND).alias("cosine")
    )
    w = Window.partitionBy("probe_id").orderBy(
        F.desc("cosine"), F.asc("vec_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("probe_id", "rank", "vec_id", "cosine")
    )


SQL_SIM_BRUTEFORCE_TOPK = f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
probes AS (SELECT vec_id AS probe_id, v AS p FROM e WHERE vec_id < {N_PROBES}),
scored AS (
  SELECT probe_id, vec_id,
         round(list_dot_product(v, p)
               / (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(p, p))),
               {COS_ROUND}) AS cosine
  FROM e CROSS JOIN probes
  WHERE vec_id <> probe_id
)
SELECT probe_id, rank, vec_id, cosine
FROM (
  SELECT probe_id, vec_id, cosine,
         row_number() OVER (PARTITION BY probe_id
                            ORDER BY cosine DESC, vec_id ASC)::INT AS rank
  FROM scored
)
WHERE rank <= {TOP_K}
"""


def _plane_weight_expr_spark(p: int, dim: int):
    """Deterministic hyperplane weight w[p][d] derived from md5, identical in
    both engines: (hash60('plane-p-d') % 1001) - 500."""
    return [
        (
            F.conv(
                F.substring(F.md5(F.lit(f"plane-{p}-{d}")), 1, 15), 16, 10
            ).cast("long")
            % PLANE_MOD
            - (PLANE_MOD - 1) // 2
        ).cast("double")
        for d in range(dim)
    ]


def sim_lsh_buckets(spark: SparkSession, sf_dir: str, dim: int = 64) -> DataFrame:
    """Random-hyperplane LSH signature per vector (the ANN bucketing stage)."""
    emb = load(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    bucket = F.lit(0)
    for p in range(N_PLANES):
        ws = _plane_weight_expr_spark(p, dim)
        dot = sum(
            F.element_at(F.col("v"), d + 1) * ws[d] for d in range(dim)
        )
        bucket = bucket + F.when(dot > 0, F.lit(1 << p)).otherwise(0)
    return (
        emb.select("vec_id", bucket.cast("long").alias("bucket"))
        .groupBy("bucket")
        .agg(
            F.count("*").cast("long").alias("n_vectors"),
            F.min("vec_id").cast("long").alias("min_vec_id"),
        )
    )


def _sql_plane_dot(p: int, dim: int) -> str:
    terms = " + ".join(
        f"v[{d + 1}] * ((('0x' || substr(md5('plane-{p}-{d}'), 1, 15))::BIGINT"
        f" % {PLANE_MOD}) - {(PLANE_MOD - 1) // 2})::DOUBLE"
        for d in range(dim)
    )
    return f"({terms})"


def sql_sim_lsh_buckets(dim: int = 64) -> str:
    bucket = " + ".join(
        f"CASE WHEN {_sql_plane_dot(p, dim)} > 0 THEN {1 << p} ELSE 0 END"
        for p in range(N_PLANES)
    )
    return f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
SELECT bucket, count(*)::BIGINT AS n_vectors, min(vec_id)::BIGINT AS min_vec_id
FROM (SELECT vec_id, ({bucket})::BIGINT AS bucket FROM e)
GROUP BY bucket
"""


def sim_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style ANN: probe only the probe vector's own coarse partition
    (label), exact cosine within it. The 100 TB shape: per-partition search
    instead of a full scan."""
    emb = load(spark, sf_dir, "embeddings").select(
        "vec_id", "label", F.col("embedding").cast("array<double>").alias("v")
    )
    probes = emb.filter(F.col("vec_id") < N_PROBES).select(
        F.col("vec_id").alias("probe_id"),
        F.col("label").alias("probe_label"),
        F.col("v").alias("p"),
    )
    joined = emb.join(
        F.broadcast(probes),
        (F.col("label") == F.col("probe_label"))
        & (F.col("vec_id") != F.col("probe_id")),
    )
    cos = _dot(F.col("v"), F.col("p")) / (_norm(F.col("v")) * _norm(F.col("p")))
    scored = joined.select(
        "probe_id", "vec_id", F.round(cos, COS_ROUND).alias("cosine")
    )
    w = Window.partitionBy("probe_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("probe_id", "rank", "vec_id", "cosine")
    )


SQL_SIM_IVF_TOPK = f"""
WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
probes AS (SELECT vec_id AS probe_id, label AS probe_label, v AS p
           FROM e WHERE vec_id < {N_PROBES}),
scored AS (
  SELECT probe_id, vec_id,
         round(list_dot_product(v, p)
               / (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(p, p))),
               {COS_ROUND}) AS cosine
  FROM e JOIN probes
    ON e.label = probes.probe_label AND e.vec_id <> probes.probe_id
)
SELECT probe_id, rank, vec_id, cosine
FROM (
  SELECT probe_id, vec_id, cosine,
         row_number() OVER (PARTITION BY probe_id
                            ORDER BY cosine DESC, vec_id ASC)::INT AS rank
  FROM scored
)
WHERE rank <= {TOP_K}
"""


def dedup_embedding_neighbors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs above a high threshold, probed
    for the first N probe vectors (near-dup detection flavor)."""
    topk = sim_bruteforce_topk(spark, sf_dir)
    return topk.filter(F.col("rank") == 1).select(
        "probe_id", F.col("vec_id").alias("nearest_id"), "cosine"
    )


SQL_DEDUP_EMBEDDING_NEIGHBORS = f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
probes AS (SELECT vec_id AS probe_id, v AS p FROM e WHERE vec_id < {N_PROBES}),
scored AS (
  SELECT probe_id, vec_id,
         round(list_dot_product(v, p)
               / (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(p, p))),
               {COS_ROUND}) AS cosine
  FROM e CROSS JOIN probes
  WHERE vec_id <> probe_id
)
SELECT probe_id, vec_id AS nearest_id, cosine
FROM (
  SELECT probe_id, vec_id, cosine,
         row_number() OVER (PARTITION BY probe_id
                            ORDER BY cosine DESC, vec_id ASC) AS rank
  FROM scored
)
WHERE rank = 1
"""
