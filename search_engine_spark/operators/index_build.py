"""Inverted-index construction (the build job).

Spark re-expression of the reference's indexer (reference indexer.py:33-253):
the manual 200k-term spill files + external k-way merge collapse into one
wide aggregation — Spark's sort-merge shuffle IS the k-way merge. Layout is
**document-partitioned**: postings are grouped by ``(bucket, term)`` where
``bucket = doc_id % num_buckets``, so

- a hot term (stopword-adjacent high-DF token) is split across all buckets —
  the two-stage (term, bucket) → term aggregation is the skew salting the
  north_star calls for, with bucket as the salt;
- each bucket is a self-contained shard over its doc range: query-time DAAT
  intersection runs partition-parallel with a local top-k per shard and one
  tiny global TakeOrderedAndProject;
- global df/idf comes from a second, small aggregation over per-bucket
  partials (map-side combine does most of the work).

Index finalization semantics replicate the reference merge loop
(indexer.py:156-173, SURVEY.md §2.5 M5-M7):

- named-entity prune: literal case-sensitive membership of the posting term
  in the entity counter — which, as in the reference, can never match
  (entity keys keep original capitalization, posting terms are lowercase),
  so it is carried as a faithful no-op;
- always-capitalized terms are stored UPPERCASED (making them unreachable
  by lowercase query terms — quirk kept, SURVEY.md §3.4.5);
- df == 1 terms are dropped from the vocabulary.

Tables written under ``index_path`` (parquet + manifest, Iceberg-shaped):
``parsed`` (staged parse output, the resume checkpoint), ``postings``,
``term_stats``, ``doc_stats``, ``corpus_stats``.
"""

from __future__ import annotations

import functools
import math
import time

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from search_engine_spark.config import EngineConfig
from search_engine_spark.operators.parse import parse_corpus
from search_engine_spark.sources.catalog import CatalogAdapter


def _murmur3_int32(x: int, seed: int = 42) -> int:
    """Murmur3_x86_32 of a 32-bit int — Spark's hash() for IntegerType.

    Pure-Python replica of the published MurmurHash3 finalization for a
    single 4-byte block (the path Spark's ``Murmur3_x86_32.hashInt`` takes
    with its default seed 42). Pinned against ``F.hash`` in
    tests/test_plans.py so a Spark hash change can't silently desync.
    """
    m = 0xFFFFFFFF

    def rotl(v: int, n: int) -> int:
        return ((v << n) | (v >> (32 - n))) & m

    k1 = rotl((x & m) * 0xCC9E2D51 & m, 15) * 0x1B873593 & m
    h1 = (rotl((seed & m) ^ k1, 13) * 5 + 0xE6546B64) & m
    h1 ^= 4  # total byte length
    h1 ^= h1 >> 16
    h1 = h1 * 0x85EBCA6B & m
    h1 ^= h1 >> 13
    h1 = h1 * 0xC2B2AE35 & m
    h1 ^= h1 >> 16
    return h1 - (1 << 32) if h1 >= (1 << 31) else h1


@functools.lru_cache(maxsize=None)
def _bucket_partition_keys(num_buckets: int, partitions: int) -> tuple[int, ...]:
    """Per-bucket int keys that hash-partition each bucket to ONE chosen
    partition: ``pmod(murmur3(key[b]), partitions) == b * partitions //
    num_buckets``.

    ``repartitionByRange`` on the bucket column picks boundaries by
    SAMPLING; with num_buckets ≈ partitions a one-off boundary puts two
    whole buckets in one task and zero in another (measured max/mean skew
    1.99 at 32/32 — the stage wall doubles). Deterministic keys make the
    exchange exact at any buckets:partitions ratio, keep buckets in
    contiguous blocks (``b*P//B`` is monotonic, so the partitioned write
    still emits one file run per bucket), and drop the range-sampling
    pass over the parsed relation entirely.
    """
    targets = {b * partitions // num_buckets for b in range(num_buckets)}
    found: dict[int, int] = {}
    k = 0
    while len(found) < len(targets):
        pid = _murmur3_int32(k) % partitions
        if pid in targets and pid not in found:
            found[pid] = k
        k += 1
    return tuple(
        found[b * partitions // num_buckets] for b in range(num_buckets)
    )


def bucket_exchange(df: DataFrame, config: EngineConfig) -> DataFrame:
    """Exchange ``df`` so each ``bucket`` lands wholly in one partition,
    evenly and deterministically (see _bucket_partition_keys).

    Parallelism note: whole-bucket placement caps this exchange's useful
    parallelism at ``num_buckets`` — with num_buckets < shuffle_partitions
    the excess partitions stay empty. That is inherent for frames where the
    term column is still packed inside the ``terms`` array (nothing finer
    than ``bucket`` exists to partition on); callers whose rows DO carry a
    term column fall back to (bucket, term) hash partitioning when
    undersized instead — see ``sorted_posting_rows`` and
    ``encoded_rows_exchange``. At 100 TB scale num_buckets ≈ n_docs/2M ≫
    cores, so the cap never binds there.
    """
    keys = _bucket_partition_keys(
        config.num_buckets, config.shuffle_partitions
    )
    keycol = F.element_at(
        F.array(*[F.lit(k) for k in keys]),
        F.col("bucket").cast("int") + 1,
    )
    return df.repartition(config.shuffle_partitions, keycol)


def encoded_rows_exchange(df: DataFrame, config: EngineConfig) -> DataFrame:
    """Exchange rows that carry a ``term`` column (encoded posting rows).

    Whole-bucket placement when the bucket count can use every partition;
    (bucket, term) hash partitioning otherwise — each (bucket, term) group
    still lands wholly in one partition (the scorer's one-row-per-group
    invariant), but the exchange uses ALL partitions at any bucket count.
    """
    if config.num_buckets < config.shuffle_partitions:
        return df.repartition(config.shuffle_partitions, "bucket", "term")
    return bucket_exchange(df, config)


def _explode_terms(parsed: DataFrame) -> DataFrame:
    return parsed.select(
        "bucket",
        "doc_id",
        "doc_length",
        F.explode("terms").alias("kv"),
    ).select(
        "bucket",
        "doc_id",
        "doc_length",
        F.col("kv.term").alias("term"),
        F.col("kv.tf").alias("tf"),
    )


def sorted_posting_rows(parsed: DataFrame, config: EngineConfig) -> DataFrame:
    """THE wide shuffle — shuffle compact DOC rows, explode after.

    Every (bucket, term) posting group lives wholly inside one bucket, so
    partitioning by ``bucket`` alone already co-locates whole groups; the
    explode to posting rows and the ``sortWithinPartitions(bucket, term,
    doc_id)`` external sort then run shuffle-free on the receiving side.
    Shuffling the slim parsed rows (bucket, doc_id, doc_length, terms
    array) instead of pre-exploded posting rows moves ~4× fewer bytes —
    no per-posting repetition of doc_id/doc_length/bucket and no
    per-posting row overhead — which matters because the posting shuffle
    is the build's bandwidth-bound stage (measured 2→8-core scaling 0.57
    for the exploded-row shuffle vs 0.90 for the CPU-bound parse).

    Spark's sort-merge machinery replaces the reference's manual spill +
    external k-way merge (indexer.py:110-253). Grouping on (bucket, term)
    rather than term alone is the hot-term salting (bucket = doc-hash
    salt): a stopword-adjacent high-DF term's rows spread across all
    buckets instead of one reducer. The exchange maps each bucket to one
    partition with deterministic hash keys (bucket_exchange) — exact even
    splits at any buckets:partitions ratio, whole contiguous buckets per
    partition (one file run per bucket in the partitioned write), and no
    range-sampling pass. No collect_list buffers, no wide-row
    materialization — the downstream encoder streams over the sorted rows.
    """
    if config.num_buckets < config.shuffle_partitions:
        # Undersized-buckets fallback (small local configs; at 100 TB
        # num_buckets ≫ cores and this branch never runs): whole-bucket
        # placement would cap the sort stage at num_buckets tasks, so
        # explode FIRST and hash-partition on (bucket, term) — every
        # (bucket, term) posting group still lands wholly in one partition
        # (the scorer's one-row-per-group invariant holds, blobs are
        # byte-identical), but groups spread across ALL partitions. Costs
        # the fat posting-row shuffle the slim path avoids — the price of
        # full parallelism when the bucket count can't provide it.
        rows = _explode_terms(parsed)
        return (
            rows.repartition(config.shuffle_partitions, "bucket", "term")
            .sortWithinPartitions("bucket", "term", "doc_id")
        )
    slim = parsed.select("bucket", "doc_id", "doc_length", "terms")
    return (
        _explode_terms(bucket_exchange(slim, config))
        .sortWithinPartitions("bucket", "term", "doc_id")
    )


def capitals_state(parsed: DataFrame) -> DataFrame:
    """A5 raw state: bool AND across docs of the per-doc capital flag
    (min ≡ AND). Associative — two corpora's states fold with another min,
    which is what lets incremental compaction skip the full parsed scan."""
    return (
        parsed.select(F.explode("capitals").alias("kv"))
        .select(F.col("kv.term").alias("term"), F.col("kv.cap").alias("cap"))
        .groupBy("term")
        .agg(F.min("cap").alias("always_cap"))
    )


def entity_state(parsed: DataFrame) -> DataFrame:
    """A4 raw state: per-doc-distinct entity counts (entities is a set per
    doc). Additive across corpora."""
    return (
        parsed.select(F.explode("entities").alias("entity"))
        .groupBy("entity")
        .agg(F.count("*").alias("entity_count"))
    )


def build_vocabulary(
    parsed: DataFrame | None,
    df_raw: DataFrame | None = None,
    capitals: DataFrame | None = None,
    entity_counts: DataFrame | None = None,
) -> DataFrame:
    """Vocabulary with final (possibly uppercased) term and global df.

    Returns (term, final_term, df) for surviving terms only. ``df_raw``
    (term, df) is normally derived from the already-encoded postings table
    — ``sum(local_df)`` over the per-(bucket, term) rows, a |vocab|·buckets
    aggregation instead of re-exploding and re-shuffling the full
    (doc, term) relation a second time. Falls back to the explode when no
    postings are available (direct callers / tests). ``capitals`` /
    ``entity_counts`` likewise default to aggregating ``parsed`` but can be
    supplied pre-folded (incremental compaction folds the persisted
    ``vocab_capitals`` / ``vocab_entities`` state with the fresh batch's
    aggregate instead of re-scanning the corpus).
    """
    if df_raw is None:
        df_raw = _explode_terms(parsed).groupBy("term").agg(
            F.count("*").alias("df")
        )
    if capitals is None:
        capitals = capitals_state(parsed)
    if entity_counts is None:
        entity_counts = entity_state(parsed)

    vocab = (
        df_raw
        # M6 (faithful no-op): drop term if it IS an entity key with count<2
        .join(entity_counts, df_raw["term"] == entity_counts["entity"], "left")
        .filter(~((F.col("entity_count").isNotNull()) & (F.col("entity_count") < 2)))
        .drop("entity", "entity_count")
        # M7: uppercase rewrite for always-capitalized terms
        .join(capitals, "term", "left")
        .withColumn(
            "final_term",
            F.when(F.col("always_cap") == True, F.upper("term")).otherwise(  # noqa: E712
                F.col("term")
            ),
        )
        .drop("always_cap")
        # M5: df == 1 prune
        .filter(F.col("df") > 1)
    )
    return vocab


def _with_glove_vec(spark: SparkSession, parsed: DataFrame,
                    cfg: EngineConfig) -> DataFrame:
    """doc_stats with a per-doc mean embedding column (A6, indexer.py:54-61).

    The embedding dict is broadcast once; vectors are accumulated in the
    doc's distinct-term insertion order (float64) so scores stay
    rank-identical with the oracle.
    """
    from typing import Iterator

    import numpy as np
    import pandas as pd
    from pyspark.sql.types import (
        ArrayType, DoubleType, IntegerType, LongType, StringType,
        StructField, StructType, TimestampType,
    )

    from search_engine_spark.functions.glove import doc_vector, load_glove

    glove_b = spark.sparkContext.broadcast(load_glove(cfg.glove_path))
    dim = cfg.glove_dim
    schema = StructType(
        [
            StructField("bucket", IntegerType(), True),
            StructField("doc_id", LongType(), True),
            StructField("url", StringType(), True),
            StructField("warc_ts", TimestampType(), True),
            StructField("doc_length", IntegerType(), True),
            StructField("max_tf", IntegerType(), True),
            StructField("unique_terms", IntegerType(), True),
            StructField("glove_vec", ArrayType(DoubleType()), True),
        ]
    )

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        glove = glove_b.value
        for pdf in batches:
            vecs = [
                doc_vector((t["term"] for t in terms), glove, dim)
                for terms in pdf["terms"]
            ]
            out = pdf.drop(columns=["terms"])
            out["glove_vec"] = [np.asarray(v) for v in vecs]
            yield out

    return parsed.select(
        "bucket", "doc_id", "url", "warc_ts", "doc_length",
        "max_tf", "unique_terms", "terms",
    ).mapInPandas(fn, schema=schema)


def _estimate_scan_splits(pages: DataFrame, cfg: EngineConfig,
                          fallback: int) -> int:
    """Estimate the scan's split count from file metadata alone.

    Avoids ``pages.rdd.getNumPartitions()`` which forces a DataFrame→RDD
    conversion just to read a number. Splits ≈ max(n_files,
    total_bytes / maxPartitionBytes) — exact enough for the small-corpus
    parallelism guard (the only consumer); errs low for local files, which
    at worst triggers a harmless repartition of a tiny input.
    """
    import os

    try:
        files = pages.inputFiles()
    except Exception:
        return fallback
    if not files:
        return fallback
    total = 0
    for f in files:
        p = f[7:] if f.startswith("file://") else f
        try:
            total += os.path.getsize(p)
        except OSError:
            return len(files)
    import math as _math

    return max(len(files),
               _math.ceil(total / max(cfg.files_max_partition_bytes, 1)))


def _plan_parse_batches(
    spark: SparkSession, pages: DataFrame, resume_batches: int,
    cfg: EngineConfig,
) -> list[tuple[str, DataFrame, dict]]:
    """Slice the corpus into resume batches with per-batch input lineage.

    Preferred strategy — **file-level slicing**: when ``pages`` is a bare
    table scan, the input files are partitioned into ``resume_batches``
    contiguous groups (sorted order) and each batch reads ONLY its own
    files. Every input file is scanned exactly once across the whole build
    (single-scan-equivalent I/O), and the manifest entry records the
    batch's exact file list + bytes — the per-partition lineage the
    north_rule asks for (the Iceberg analog: one snapshot per completed
    file group).

    Fallback — **hash slicing**: if ``pages`` carries transformations (so
    re-reading files would drop them) or exposes no file list, fall back to
    filtering the full relation by a hash slice per batch. Correct, but
    re-scans the input once per batch; callers should pass a bare scan.
    """
    bare_scan = False
    try:
        analyzed = pages._jdf.queryExecution().analyzed().toString()
        # the file-level path re-reads each group with spark.read.parquet,
        # so it is only valid for an untransformed PARQUET relation
        bare_scan = (
            analyzed.strip().startswith("Relation")
            and "parquet" in analyzed.lower()
            and ("\n+" not in analyzed and "\n:" not in analyzed)
        )
    except Exception:
        bare_scan = False
    files: list[str] = []
    if bare_scan:
        try:
            files = sorted(pages.inputFiles())
        except Exception:
            files = []

    if files and len(files) >= resume_batches:
        return _file_groups(spark, pages.schema, files, resume_batches, "")

    out: list[tuple[str, DataFrame, dict]] = []
    for i in range(resume_batches):
        subset = pages.filter(
            F.pmod(
                F.pmod(F.xxhash64("url"), F.lit(cfg.num_buckets)),
                F.lit(resume_batches),
            )
            == i
        )
        out.append((str(i), subset,
                    {"strategy": "hash_slice", "n_slices": resume_batches,
                     "slice_buckets": cfg.num_buckets}))
    return out


def _file_groups(
    spark: SparkSession, schema, files: list[str], n_groups: int, id_prefix: str
) -> list[tuple[str, DataFrame, dict]]:
    """Partition ``files`` into ``n_groups`` contiguous batches with lineage."""
    import os

    out: list[tuple[str, DataFrame, dict]] = []
    n = len(files)
    n_groups = max(1, min(n_groups, n))
    base, rem = divmod(n, n_groups)
    start = 0
    for i in range(n_groups):
        size = base + (1 if i < rem else 0)
        group = files[start:start + size]
        start += size
        nbytes = 0
        for f in group:
            p = f[7:] if f.startswith("file://") else f
            try:
                nbytes += os.path.getsize(p)
            except OSError:
                pass
        subset = spark.read.schema(schema).parquet(*group)
        out.append(
            (f"{id_prefix}{i}", subset,
             {"strategy": "files", "input_files": group,
              "input_bytes": nbytes})
        )
    return out


def _reconcile_resume_plan(
    spark: SparkSession,
    cat: CatalogAdapter,
    plan: list[tuple[str, DataFrame, dict]],
    entries: list[dict],
    resume_batches: int,
    schema,
) -> list[tuple[str, DataFrame, dict]]:
    """Validate recorded resume lineage against the freshly planned batches.

    File-level resume is only sound when every file a completed batch
    recorded is still part of the CURRENT input listing — files added or
    removed between the crash and the resume would otherwise remap batch
    ids onto different file groups (docs silently skipped or parsed twice).

    - all recorded inputs still present → process only the not-yet-covered
      files, regrouped under fresh batch ids (completed work is kept);
    - a recorded input vanished, or the slicing strategy changed between
      runs → the staged parse no longer matches the input: drop it and
      rebuild from scratch (correctness over resume savings);
    - hash-slice on both sides → slices are content-addressed (url hash),
      stable across runs: keep the plan as-is.
    """
    if not entries:
        return plan
    file_plan = bool(plan) and plan[0][2].get("strategy") == "files"
    file_entries = all(e.get("strategy") == "files" and e.get("input_files")
                      for e in entries)
    if file_plan and file_entries:
        current = [f for _bid, _df, lin in plan for f in lin["input_files"]]
        current_set = set(current)
        covered: set[str] = set()
        for e in entries:
            covered.update(e["input_files"])
        if covered - current_set:
            cat.drop_table("parsed")
            return plan
        remaining = [f for f in current if f not in covered]
        if not remaining:
            return []
        return _file_groups(spark, schema, remaining, resume_batches,
                            f"resume{len(entries)}-")
    if file_plan != file_entries:
        cat.drop_table("parsed")
        return plan
    # hash-slice on both sides: slices are content-addressed (url hash) and
    # stable across runs ONLY under identical slicing parameters — a changed
    # resume_batches/num_buckets remaps batch ids onto different doc sets
    params = {(e.get("n_slices"), e.get("slice_buckets")) for e in entries}
    current_params = {(lin.get("n_slices"), lin.get("slice_buckets"))
                      for _bid, _df, lin in plan}
    if params != current_params:
        cat.drop_table("parsed")
    return plan


def build_index(
    spark: SparkSession,
    pages: DataFrame,
    index_path: str,
    config: EngineConfig | None = None,
    compress: bool = True,
    resume_batches: int = 4,
) -> dict:
    """Run the full index build; returns build metrics.

    Stage A parses the corpus (narrow, no shuffle) and stages the result —
    the checkpoint boundary for resume. Stage B derives all index tables
    from the staged parse with exactly two wide shuffles: one groupBy
    (bucket, term) for postings and one small groupBy(term) for stats.
    """
    cfg = config or EngineConfig()
    cat = CatalogAdapter(index_path)
    t0 = time.time()

    # ---- stage A: parse + stage (resume checkpoint) -----------------------
    # The expensive narrow stage is committed in `resume_batches` slices,
    # each with its own manifest entry (rows + wall time + input lineage):
    # a killed build resumes by skipping committed batches (north_rule
    # per-partition lineage; tested in tests/test_resume.py). Batches are
    # input-FILE groups when pages is a bare scan — every file is read
    # exactly once across the build — with a hash-slice fallback for
    # transformed inputs (see _plan_parse_batches).
    #
    # Parallelism guard: a production table has >> cores input splits, but a
    # small local corpus can land in a single 128 MB split, serializing the
    # (CPU-bound) tokenizer. If the scan has fewer partitions than cores,
    # spread it — the repartition shuffle is a no-op at real scale because
    # the guard never fires there.
    target_par = cfg.parse_partitions or spark.sparkContext.defaultParallelism
    scan_par = _estimate_scan_splits(pages, cfg, target_par)
    if not cat.is_complete("parsed"):
        plan = _plan_parse_batches(spark, pages, resume_batches, cfg)
        plan = _reconcile_resume_plan(
            spark, cat, plan, cat.batch_entries("parsed"), resume_batches,
            pages.schema,
        )
        done = set(cat.completed_batches("parsed"))
        # batch_seq is the POSITIONAL index in the (deterministic) plan, so
        # a resumed monotone-mode build re-assigns the same id ranges to the
        # same batches it would have gotten in one pass
        for batch_seq, (batch_id, subset, lineage) in enumerate(plan):
            if batch_id in done:
                continue
            if scan_par < target_par:
                subset = subset.repartition(target_par)
            cat.append_batch(
                parse_corpus(subset, cfg, batch_seq=batch_seq),
                "parsed", batch_id, metrics=lineage,
            )
        cat.finalize_batched_table("parsed")
    # Read-side parallelism for the staged table comes from split sizing
    # (EngineConfig.files_max_partition_bytes / files_open_cost_bytes):
    # a repartition here would re-shuffle the full parsed relation in every
    # downstream job; split-size tuning gives the same fan-out for free.
    # read_table (not a direct parquet read) so Iceberg-routed builds read
    # the table they actually wrote; `batch` is the lineage column in both
    # modes (partition-discovered on parquet, explicit on Iceberg).
    parsed = cat.read_table(spark, "parsed").drop("batch")
    t_parse = time.time()
    stage_sec, n_docs, _avg_dl = derive_index_tables(spark, cat, parsed, cfg)

    wall = time.time() - t0
    metrics = {
        "n_docs": int(n_docs),
        "wall_sec": wall,
        "parse_sec": t_parse - t0,
        "docs_per_sec": (int(n_docs) / wall) if wall > 0 else math.inf,
        "compressed": compress,
        "num_buckets": cfg.num_buckets,
        "stage_sec": stage_sec,
    }
    cat.finish_build(metrics)
    return metrics


def derive_index_tables(
    spark: SparkSession, cat: CatalogAdapter, parsed: DataFrame,
    cfg: EngineConfig,
) -> tuple[dict, int, float]:
    """Stages B1-B3: derive every index table from the staged parse.

    Skips any table already committed in the manifest (resume semantics);
    also used by streaming compaction (streaming/incremental.py), which
    appends new parsed batches, drops the derived tables, and re-derives —
    the expensive parse stage is never recomputed. Returns
    ``(stage_sec, n_docs, avg_dl)``.
    """
    stage_sec: dict[str, float] = {}

    def _mark(name: str, since: list) -> None:
        now = time.time()
        stage_sec[name] = round(now - since[0], 3)
        since[0] = now

    _t = [time.time()]

    # ---- stage B1: corpus + doc stats -------------------------------------
    if not cat.has_table("corpus_stats"):
        stats = parsed.agg(
            F.count("*").alias("n_docs"),
            F.avg("doc_length").alias("avg_doc_length"),
            F.sum("doc_length").alias("total_tokens"),
        )
        cat.write_table(stats, "corpus_stats")
    if not cat.has_table("doc_stats"):
        doc_stats = parsed.select(
            "bucket", "doc_id", "url", "warc_ts", "doc_length",
            "max_tf", "unique_terms",
        )
        if cfg.glove_path:
            doc_stats = _with_glove_vec(spark, parsed, cfg)
        # cluster whole buckets per task before the partitioned write —
        # without this every input split writes a file into every bucket
        # directory (splits × buckets tiny files)
        cat.write_table(
            bucket_exchange(doc_stats, cfg),
            "doc_stats", partition_by=["bucket"],
        )
    # Topical doc-stats shard (reference doc_posting_covid analog,
    # indexer.py:56-66,265-268, generalized to configured terms): one pass
    # over the staged parse computes each doc's matched topics
    # (array_intersect, JVM-side), then a join pulls the doc_stats row —
    # the written table is partitioned by topic so a topical query prunes
    # to its own files.
    if cfg.topical_terms and not cat.has_table("doc_stats_topical"):
        terms_arr = F.array(*[F.lit(t) for t in cfg.topical_terms])
        matched = parsed.select(
            "doc_id",
            F.explode(
                F.array_intersect(
                    F.transform("terms", lambda kv: kv["term"]), terms_arr
                )
            ).alias("topic"),
        )
        cat.write_table(
            matched.join(cat.read_table(spark, "doc_stats"), "doc_id"),
            "doc_stats_topical",
            partition_by=["topic"],
        )
    _mark("stats", _t)

    # ---- stage B2: postings — ONE range shuffle + streaming encode --------
    cstats = cat.read_table(spark, "corpus_stats").collect()[0]
    n_docs = int(cstats["n_docs"])
    avg_dl = float(cstats["avg_doc_length"])

    if not cat.has_table("postings"):
        from search_engine_spark.operators.codec import encode_sorted_postings

        encoded = encode_sorted_postings(
            sorted_posting_rows(parsed, cfg), cfg, avg_dl
        )
        # range partitioning already clusters by bucket → the partitioned
        # write needs no extra repartition
        cat.write_table(
            encoded, "postings", partition_by=["bucket"],
            max_records_per_file=cfg.max_records_per_file,
        )
    _mark("postings", _t)

    # ---- stage B3: vocabulary (prune + rewrite) + term stats --------------
    # Postings carry the RAW lowercase vocabulary; pruning (df==1) and the
    # uppercase rewrite (M5-M7) live in term_stats only, and the query
    # engine gates every query term through term_stats before touching
    # postings — semantically identical to pruning the postings themselves
    # (a pruned/rewritten term simply never reaches the posting lookup),
    # but it keeps the build free of any vocabulary join.
    #
    # Global df rides the encoded postings (sum of per-(bucket, term)
    # local_df — a |vocab|·buckets-row aggregation) instead of a second
    # full explode+shuffle of the (doc, term) relation.
    # The raw A4/A5 per-term states are persisted alongside term_stats so
    # incremental compaction can FOLD a fresh batch into them (min / sum)
    # instead of re-scanning the whole parsed relation for the vocabulary
    # quirks — the last full-corpus pass the merge path had.
    if not cat.has_table("vocab_capitals"):
        cat.write_table(capitals_state(parsed), "vocab_capitals")
    if not cat.has_table("vocab_entities"):
        cat.write_table(entity_state(parsed), "vocab_entities")
    if not cat.has_table("term_stats"):
        df_from_postings = (
            cat.read_table(spark, "postings")
            .groupBy("term")
            .agg(F.sum("local_df").alias("df"))
        )
        vocab = build_vocabulary(
            parsed, df_raw=df_from_postings,
            capitals=cat.read_table(spark, "vocab_capitals"),
            entity_counts=cat.read_table(spark, "vocab_entities"),
        )
        cat.write_table(
            vocab.select(F.col("final_term").alias("term"), "df",
                         F.col("term").alias("source_term")),
            "term_stats",
        )
    _mark("term_stats", _t)

    # Stamp the on-disk layout + parse-mode so readers can validate
    # compatibility (WAND safety depends on the idf-free block_max layout;
    # query-side tokenization must match the build's stemming mode).
    # Stamped ONCE, on the initial build: a re-derive (streaming
    # compaction) must run under the stamped semantics, never re-stamp —
    # re-stamping from a default config would silently flip e.g. the
    # stemming flag and make queries tokenize against the wrong vocabulary.
    from search_engine_spark.operators.codec import CODEC_FORMAT_VERSION

    props = cat.properties()
    if "codec_format" not in props:
        cat.set_properties({
            "codec_format": CODEC_FORMAT_VERSION,
            "stemming": bool(cfg.stemming),
            "topical_terms": list(cfg.topical_terms),
            "glove_path": cfg.glove_path,
            "glove_dim": cfg.glove_dim,
            "num_buckets": cfg.num_buckets,
            "doc_id_mode": cfg.doc_id_mode,
        })
    else:
        _check_config_vs_properties(cfg, props)
    # Stamped LAST: the derived tables now reflect exactly these parsed
    # batches. A compaction replay compares this stamp against the batch
    # list to detect tables left half-swapped by a crash (streaming/
    # incremental.py::compact_staging).
    cat.set_properties({
        "derived_from_batches": sorted(map(str,
                                           cat.completed_batches("parsed"))),
    })
    return stage_sec, n_docs, avg_dl


#: output column order of the postings table once enc_avgdl rides along
_POSTING_MERGE_COLS = [
    "bucket", "term", "local_df", "blob", "block_last", "block_max",
    "enc_avgdl",
]


def merge_derive_tables(
    spark: SparkSession, cat: CatalogAdapter, batch_id: str,
    cfg: EngineConfig,
) -> tuple[dict, int, float]:
    """Incremental derive: fold ONE fresh parsed batch into the derived
    tables without recomputing the untouched bulk.

    Per table:

    - ``corpus_stats`` — fold the increment into the old row (counts and
      token sums are additive; avg = total/n).
    - ``doc_stats`` (+ ``doc_stats_topical``) — per-doc rows have no
      global dependencies, so old rows pass through and only the fresh
      batch is computed (glove vectors included).
    - ``postings`` — the (bucket, term) groups that gained no new docs
      pass through BYTE-IDENTICAL (no decode, no shuffle: a broadcastable
      anti-join against the fresh group keys); groups present on both
      sides decode-merge-re-encode; fresh-only groups come straight from
      the streaming encoder. Correctness under the avg_dl drift this
      implies: ``block_max`` is a function of the avg_dl at ENCODE time,
      and the tf-side BM25 factor grows with avg_dl by at most the ratio
      of the avg_dls, so every row carries ``enc_avgdl`` and the query
      loader scales the bounds by max(1, avg_dl_now/enc_avgdl)
      (operators/search.py) — bounds stay upper bounds, WAND stays exact,
      and untouched rows never need re-encoding.
    - ``term_stats`` — global df re-aggregates from the merged postings
      (|vocab|·buckets rows, cheap); the vocabulary quirk fold (capitals
      AND, entity counts) still scans the full parsed relation — the one
      remaining full-corpus pass, documented as such.

    Cost shape, honestly: decode+re-encode work is proportional to the
    posting MASS of the touched groups, not the increment — a hot term's
    whole list re-encodes when any new doc contains it (doc_id is an url
    hash, so new ids interleave; a time-monotone doc_id would make every
    merge a tail-append and the work increment-proportional, at the cost
    of re-keying the engine's tie-breaks and parity tests). On the dense
    synthetic vocabulary a 10% increment touches the groups holding most
    of the mass (measured: 39% of groups, sf0.1), so wall-clock sits near
    the full re-derive locally; on a Zipf-tailed web vocabulary (1e7-1e8
    terms, most df<10) the untouched fraction — which passes through with
    ZERO decode and no shuffle (broadcast anti-join) — dominates, and the
    fold costs table IO plus the increment's mass.

    All writes are atomic per table (catalog _tmp + rename); the caller
    commits the ``derived_from_batches`` staleness stamp after the last
    write. Returns ``(stage_sec, n_docs, avg_dl)`` like
    ``derive_index_tables``.
    """
    from typing import Iterator

    import numpy as np
    import pandas as pd
    from pyspark.sql.types import (
        ArrayType, BinaryType, DoubleType, IntegerType, LongType,
        StringType, StructField, StructType,
    )

    from search_engine_spark.operators.codec import (
        decode_posting_list, encode_sorted_postings,
    )

    stage_sec: dict[str, float] = {}
    _t = [time.time()]

    def _mark(name: str) -> None:
        now = time.time()
        stage_sec[name] = round(now - _t[0], 3)
        _t[0] = now

    fresh = (
        cat.read_table(spark, "parsed")
        .filter(F.col("batch") == batch_id)
        .drop("batch")
    )

    # ---- corpus_stats: additive fold ---------------------------------------
    old_stats = cat.read_table(spark, "corpus_stats").collect()[0]
    old_avg_dl = float(old_stats["avg_doc_length"])
    inc = fresh.agg(
        F.count("*").alias("n"), F.sum("doc_length").alias("s")
    ).collect()[0]
    n_docs = int(old_stats["n_docs"]) + int(inc["n"])
    total_tokens = int(old_stats["total_tokens"]) + int(inc["s"] or 0)
    avg_dl = total_tokens / n_docs
    cat.write_table(
        spark.createDataFrame(
            [(n_docs, float(avg_dl), total_tokens)],
            "n_docs bigint, avg_doc_length double, total_tokens bigint",
        ),
        "corpus_stats",
    )

    # ---- doc_stats: append-only (per-doc rows, no global deps) -------------
    fresh_ds = fresh.select(
        "bucket", "doc_id", "url", "warc_ts", "doc_length", "max_tf",
        "unique_terms",
    )
    if cfg.glove_path:
        fresh_ds = _with_glove_vec(spark, fresh, cfg)
    old_ds = cat.read_table(spark, "doc_stats")
    cat.write_table(
        old_ds.unionByName(bucket_exchange(fresh_ds, cfg)),
        "doc_stats", partition_by=["bucket"],
    )
    if cfg.topical_terms and cat.has_table("doc_stats_topical"):
        terms_arr = F.array(*[F.lit(t) for t in cfg.topical_terms])
        matched = fresh.select(
            "doc_id",
            F.explode(
                F.array_intersect(
                    F.transform("terms", lambda kv: kv["term"]), terms_arr
                )
            ).alias("topic"),
        )
        fresh_topical = matched.join(
            cat.read_table(spark, "doc_stats"), "doc_id"
        )
        cat.write_table(
            cat.read_table(spark, "doc_stats_topical")
            .unionByName(fresh_topical),
            "doc_stats_topical", partition_by=["topic"],
        )
    _mark("stats")

    # ---- postings: passthrough / merge / fresh-only -------------------------
    fresh_enc = encode_sorted_postings(
        sorted_posting_rows(fresh, cfg), cfg, avg_dl
    ).withColumn("enc_avgdl", F.lit(float(avg_dl)))
    fresh_enc.persist()
    try:
        old_post = cat.read_table(spark, "postings")
        if "enc_avgdl" not in old_post.columns:
            # rows from a full (re)build were all encoded at the avg_dl
            # recorded by that build's corpus_stats
            old_post = old_post.withColumn("enc_avgdl", F.lit(old_avg_dl))
        # broadcast the fresh group keys: the blob-carrying old table must
        # not shuffle just to find out which rows pass through untouched
        # (at cluster scale AQE demotes this to a shuffled hash join when
        # the increment outgrows the broadcast threshold)
        keys = F.broadcast(fresh_enc.select("bucket", "term"))
        untouched = old_post.join(keys, ["bucket", "term"], "left_anti")
        pair = (
            old_post.join(keys, ["bucket", "term"], "left_semi").alias("o")
            .join(fresh_enc.alias("f"), ["bucket", "term"])
            .select(
                "bucket", "term",
                F.col("o.local_df").alias("old_df"),
                F.col("o.blob").alias("old_blob"),
                F.col("o.block_last").alias("old_last"),
                F.col("o.block_max").alias("old_max"),
                F.col("o.enc_avgdl").alias("old_enc"),
                F.col("f.local_df").alias("new_df"),
                F.col("f.blob").alias("new_blob"),
            )
        )
        merge_schema = StructType([
            StructField("bucket", IntegerType(), False),
            StructField("term", StringType(), False),
            StructField("local_df", LongType(), False),
            StructField("blob", BinaryType(), False),
            StructField("block_last", ArrayType(LongType()), False),
            StructField("block_max", ArrayType(DoubleType()), False),
            StructField("enc_avgdl", DoubleType(), False),
        ])
        block_size, k, b = cfg.block_size, cfg.bm25_k, cfg.bm25_b
        enc_avgdl = float(avg_dl)
        monotone = cfg.doc_id_mode == "monotone"

        def _merge(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            # Two merge kernels, routed per group:
            #
            # - splice (monotone ids, multi-block old list): tail-append via
            #   codec.append_posting_blob — the old bulk is a header-adjusted
            #   memcpy, only its final partial block decodes; work is
            #   O(block_size + increment) no matter how hot the term. This is
            #   the path that makes compaction increment-proportional (hash
            #   ids interleave, so they can never take it).
            # - full re-encode (hash mode, or old fits in one block so a
            #   splice would decode everything anyway): decode both sides,
            #   merge-sort by doc_id, re-encode the WHOLE batch of groups in
            #   one vectorized pass (_encode_group_batch — the same kernel
            #   the build's streaming encoder uses, so merged blobs are
            #   byte-identical to a from-scratch encode of the same
            #   postings).
            from search_engine_spark.operators.codec import (
                _encode_group_batch, append_posting_blob,
            )

            for pdf in batches:
                if not len(pdf):
                    continue
                if monotone:
                    multi = pdf["old_last"].map(len) > 1
                    big, small = pdf[multi], pdf[~multi]
                else:
                    big, small = pdf.iloc[0:0], pdf
                parts = []
                if len(small):
                    g_ids, g_dls, g_tfs = [], [], []
                    for r in small.itertuples(index=False):
                        ids1, dl1, tf1 = decode_posting_list(bytes(r.old_blob))
                        ids2, dl2, tf2 = decode_posting_list(bytes(r.new_blob))
                        ids = np.concatenate([ids1, ids2])
                        order = np.argsort(ids, kind="stable")
                        g_ids.append(ids[order])
                        g_dls.append(np.concatenate([dl1, dl2])[order])
                        g_tfs.append(np.concatenate([tf1, tf2])[order])
                    lens = np.array([len(x) for x in g_ids], np.int64)
                    ends = np.cumsum(lens)
                    starts = ends - lens
                    rb = _encode_group_batch(
                        small["bucket"].to_numpy(), small["term"].tolist(),
                        np.concatenate(g_ids), np.concatenate(g_dls),
                        np.concatenate(g_tfs), starts, ends,
                        block_size, enc_avgdl, k, b,
                    )
                    out = rb.to_pandas()
                    out["enc_avgdl"] = enc_avgdl
                    parts.append(out)
                if len(big):
                    rows: dict = {c: [] for c in (
                        "bucket", "term", "local_df", "blob", "block_last",
                        "block_max", "enc_avgdl")}
                    for r in big.itertuples(index=False):
                        ids2, dl2, tf2 = decode_posting_list(bytes(r.new_blob))
                        blob, last, bmax = append_posting_blob(
                            bytes(r.old_blob),
                            np.asarray(r.old_last, np.int64),
                            np.asarray(r.old_max, np.float64),
                            ids2, dl2, tf2, block_size, enc_avgdl, k, b,
                        )
                        rows["bucket"].append(r.bucket)
                        rows["term"].append(r.term)
                        rows["local_df"].append(int(r.old_df) + int(r.new_df))
                        rows["blob"].append(blob)
                        rows["block_last"].append(last)
                        rows["block_max"].append(bmax)
                        # prefix bounds were computed at the OLD avg_dl, the
                        # tail at the new one — min keeps the query-side
                        # max(1, avg_dl_now/enc_avgdl) scaling an upper
                        # bound for every block
                        rows["enc_avgdl"].append(
                            min(float(r.old_enc), enc_avgdl))
                    parts.append(pd.DataFrame(rows))
                yield pd.concat(parts, ignore_index=True)

        merged_both = pair.mapInPandas(_merge, schema=merge_schema)
        fresh_only = fresh_enc.join(
            old_post.select("bucket", "term"), ["bucket", "term"],
            "left_anti",
        )
        # Only the CHANGED rows exchange: merged/fresh-only rows come out
        # clustered by join key, so they take one increment-sized bucket
        # exchange + sort. The untouched bulk is read from a table already
        # partitioned by bucket dirs and term-sorted within files — it flows
        # scan → broadcast anti-join → write with NO shuffle and no sort
        # (the blob bytes never leave the task that read them). Cost: the
        # table's file count grows by ~(changed tasks) per fold instead of
        # being re-packed; a periodic full rebuild (or any full re-derive)
        # re-compacts it. At 100 TB this is the difference between shuffling
        # the whole postings table per fold and shuffling the increment.
        changed = encoded_rows_exchange(
            merged_both.select(*_POSTING_MERGE_COLS)
            .unionByName(fresh_only.select(*_POSTING_MERGE_COLS)),
            cfg,
        ).sortWithinPartitions("bucket", "term")
        cat.write_table(
            untouched.select(*_POSTING_MERGE_COLS).unionByName(changed),
            "postings", partition_by=["bucket"],
            max_records_per_file=cfg.max_records_per_file,
        )
    finally:
        fresh_enc.unpersist()
    _mark("postings")

    # ---- term_stats: df from merged postings + FOLDED vocabulary state -----
    # The A4/A5 quirk states fold associatively (min / sum), so the merge
    # never re-scans the full parsed relation: old state (persisted at
    # build time) outer-joins the fresh batch's aggregate. df still
    # re-aggregates from the merged postings — a two-column columnar scan
    # of (term, local_df), no blob bytes read.
    caps_new = (
        cat.read_table(spark, "vocab_capitals").alias("o")
        .join(capitals_state(fresh).alias("f"), "term", "full_outer")
        .select(
            "term",
            F.least(
                F.coalesce(F.col("o.always_cap"), F.lit(True)),
                F.coalesce(F.col("f.always_cap"), F.lit(True)),
            ).alias("always_cap"),
        )
    )
    ents_new = (
        cat.read_table(spark, "vocab_entities").alias("o")
        .join(entity_state(fresh).alias("f"), "entity", "full_outer")
        .select(
            "entity",
            (F.coalesce(F.col("o.entity_count"), F.lit(0))
             + F.coalesce(F.col("f.entity_count"), F.lit(0))
             ).alias("entity_count"),
        )
    )
    cat.write_table(caps_new, "vocab_capitals")
    cat.write_table(ents_new, "vocab_entities")
    df_from_postings = (
        cat.read_table(spark, "postings")
        .groupBy("term")
        .agg(F.sum("local_df").alias("df"))
    )
    vocab = build_vocabulary(
        None,
        df_raw=df_from_postings,
        capitals=cat.read_table(spark, "vocab_capitals"),
        entity_counts=cat.read_table(spark, "vocab_entities"),
    )
    cat.write_table(
        vocab.select(F.col("final_term").alias("term"), "df",
                     F.col("term").alias("source_term")),
        "term_stats",
    )
    _mark("term_stats")

    cat.set_properties({
        "derived_from_batches": sorted(map(str,
                                           cat.completed_batches("parsed"))),
    })
    return stage_sec, n_docs, avg_dl


def _check_config_vs_properties(cfg: EngineConfig, props: dict) -> None:
    """Raise if a config contradicts the index's build-time stamps."""
    mismatches = []
    for key, val in (
        ("stemming", bool(cfg.stemming)),
        ("topical_terms", list(cfg.topical_terms)),
        ("glove_path", cfg.glove_path),
        ("glove_dim", cfg.glove_dim),
        ("num_buckets", cfg.num_buckets),
        ("doc_id_mode", cfg.doc_id_mode),
    ):
        if key in props and props[key] != val:
            mismatches.append(f"{key}: index={props[key]!r} config={val!r}")
    if mismatches:
        raise ValueError(
            "config contradicts the index's build-time property stamps "
            "(pass no config to adopt the stamped one): "
            + "; ".join(mismatches)
        )


def config_from_properties(
    props: dict, explicit: EngineConfig | None = None
) -> EngineConfig:
    """EngineConfig reconstructed from an index's manifest property stamps.

    Used by streaming compaction so a re-derive adopts the ORIGINAL build
    semantics (stemming mode, topical shards, glove, bucket count) instead
    of a fresh default config. An ``explicit`` config is validated against
    the stamps and returned (it may carry non-semantic tuning knobs); a
    contradiction raises rather than silently rebuilding a different index.
    """
    if explicit is not None:
        _check_config_vs_properties(explicit, props)
        return explicit
    defaults = EngineConfig()
    return EngineConfig(
        stemming=bool(props.get("stemming", defaults.stemming)),
        topical_terms=tuple(props.get("topical_terms") or ()),
        glove_path=props.get("glove_path", defaults.glove_path),
        glove_dim=int(props.get("glove_dim", defaults.glove_dim)),
        num_buckets=int(props.get("num_buckets", defaults.num_buckets)),
        doc_id_mode=str(props.get("doc_id_mode", defaults.doc_id_mode)),
    )
