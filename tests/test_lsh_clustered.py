"""LSH pruning on a CLUSTERED embedding fixture.

The driver's synthetic embeddings are near-random (top cosine ≈ 0.36) —
the structurally hard case for LSH, where the gate-configured banding
honestly reports recall 0.70 at a 0.51 candidate fraction. Real embedding
corpora are clustered, and there the same code must show what LSH is for:
high recall at a small candidate fraction. This fixture is a seeded
mixture of Gaussians (unit-norm centers, small isotropic noise) and the
banding knobs are turned to production-ish values (48 planes / 6 bands of
8 bits); everything else — signature computation, band join, rerank — is
the identical `sim_lsh_topk` code path the gate runs.

Numbers land in BASELINE.md's ANN paragraph each round.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pyspark.sql.functions as F
import pytest

N = 500
DIM = 64
N_CLUSTERS = 20
SIGMA = 0.03
PLANES, BANDS = 48, 6


def _write_clustered_embeddings(path: str, seed: int = 7) -> None:
    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(N_CLUSTERS, DIM))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    labels = np.arange(N) % N_CLUSTERS
    vecs = centers[labels] + SIGMA * rng.normal(size=(N, DIM))
    table = pa.table(
        {
            "vec_id": pa.array(np.arange(N), pa.int64()),
            "embedding": pa.array(
                [v.astype(np.float32) for v in vecs], pa.list_(pa.float32())
            ),
            "label": pa.array(labels.astype(np.int32), pa.int32()),
        }
    )
    pq.write_table(table, path)


@pytest.fixture(scope="module")
def clustered_sf(tmp_path_factory):
    d = tmp_path_factory.mktemp("clustered")
    _write_clustered_embeddings(str(d / "embeddings.parquet"))
    return str(d)


def test_lsh_high_recall_small_candidate_fraction(spark, clustered_sf):
    from search_engine_spark.pipelines.similarity import (
        N_PROBES, _lsh_candidates, sim_bruteforce_topk, sim_lsh_topk,
    )

    exact = {
        (r["probe_id"], r["vec_id"])
        for r in sim_bruteforce_topk(spark, clustered_sf).collect()
    }
    approx = {
        (r["probe_id"], r["vec_id"])
        for r in sim_lsh_topk(
            spark, clustered_sf, planes=PLANES, bands=BANDS
        ).collect()
    }
    recall = len(approx & exact) / len(exact)

    emb = (
        spark.read.parquet(f"{clustered_sf}/embeddings.parquet")
        .select("vec_id",
                F.col("embedding").cast("array<double>").alias("v"))
    )
    n_cand = _lsh_candidates(emb, DIM, planes=PLANES, bands=BANDS).count()
    fraction = n_cand / (N_PROBES * (N - 1))

    # the point of LSH: ≥0.9 of the true top-10 recovered while exact-
    # scoring ≤0.1 of the corpus per probe
    assert recall >= 0.9, f"recall@10 {recall:.3f} on clustered fixture"
    assert fraction <= 0.10, f"candidate fraction {fraction:.3f}"


def test_gate_banding_still_covers_clustered_case(spark, clustered_sf):
    """The gate-default banding (18 planes / 6 bands of 3 bits) trades
    pruning for recall — on clustered data it must recall essentially
    everything (sanity check that knob direction behaves)."""
    from search_engine_spark.pipelines.similarity import (
        sim_bruteforce_topk, sim_lsh_topk,
    )

    exact = {
        (r["probe_id"], r["vec_id"])
        for r in sim_bruteforce_topk(spark, clustered_sf).collect()
    }
    approx = {
        (r["probe_id"], r["vec_id"])
        for r in sim_lsh_topk(spark, clustered_sf).collect()
    }
    assert len(approx & exact) / len(exact) >= 0.95
