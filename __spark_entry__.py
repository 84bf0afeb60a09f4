"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship BM25 top-k retrieval on sf0.001.
``queries()`` exposes every driver-gate operator (SURVEY.md §2 mappings +
training-data pipeline ops); ``oracle_sql()`` gives the DuckDB-equivalent
SQL with matching column names (floats rounded identically on both sides).

The full search-engine parity path (reference tokenizer, compressed
postings, rank-identical BM25+cosine) is exercised by ``python -m pytest
tests/ -x -q`` against the single-process oracle; the entries here are the
SQL-expressible operator suite over the driver's generic tables.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from search_engine_spark.pipelines import bm25_sql, curation, dedup, multimodal  # noqa: E402
from search_engine_spark.pipelines import relational, similarity, textstats  # noqa: E402
from search_engine_spark.streaming import incremental  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return bm25_sql.bm25_topk(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        # --- search-engine pipeline (SQL-parity tokenizer) -----------------
        "se_clean_text": textstats.q_clean_text,            # P5
        "se_token_count": textstats.q_token_count,          # P7/A1
        "se_term_df": textstats.q_term_df,                  # A3
        "se_corpus_stats": textstats.q_corpus_stats,        # A2
        "se_term_idf": textstats.q_term_idf,                # Q2 + M5 prune
        "se_postings": textstats.q_postings,                # A7
        "se_capitals": textstats.q_capitals,                # A5/M7
        "se_entities": textstats.q_entities,                # P9/A4
        # non-vacuous siblings: same aggs over documents + an inline
        # fixture that survives the AND-fold / multi-word entity extraction
        # (the all-lowercase synthetic corpus yields 0 rows above)
        "se_capitals_nonvacuous": textstats.q_capitals_nonvacuous,
        "se_entities_nonvacuous": textstats.q_entities_nonvacuous,
        "se_bm25_topk": bm25_sql.bm25_topk,                 # Q1/Q2/Q4/Q8/M9
        "se_minmatch": bm25_sql.minmatch_candidates,        # Q4/A8
        # --- dedup family ---------------------------------------------------
        "dedup_exact": dedup.dedup_exact,
        "dedup_ngram_jaccard": dedup.dedup_ngram_jaccard,
        "dedup_minhash_sigs": dedup.dedup_minhash_signatures,
        "dedup_minhash_lsh": dedup.dedup_minhash_lsh,
        "dedup_simhash": dedup.dedup_simhash,
        "dedup_lsh_verified": dedup.dedup_lsh_verified,
        "dedup_embedding_nn": similarity.dedup_embedding_neighbors,
        # --- similarity search ----------------------------------------------
        "sim_bruteforce_topk": similarity.sim_bruteforce_topk,
        "sim_lsh_buckets": similarity.sim_lsh_buckets,
        "sim_lsh_topk": similarity.sim_lsh_topk,
        "sim_ivf_topk": similarity.sim_ivf_topk,
        "sim_ivf_kmeans_topk": similarity.sim_ivf_kmeans_topk,
        # --- text analysis --------------------------------------------------
        "text_langid": textstats.q_langid,
        "text_quality": textstats.q_quality,
        "text_bpe_count": textstats.q_bpe_count,
        "text_fingerprint": textstats.q_fingerprint,
        "text_rep_ngram": textstats.q_rep_ngram,
        # --- corpus curation (quality filter / PII / mixture) ----------------
        "text_gopher_filter": curation.text_gopher_filter,
        "text_pii_scrub": curation.text_pii_scrub,
        "text_source_mix": curation.text_source_mix,
        "corpus_curate": curation.corpus_curate,
        # --- multimodal decode ----------------------------------------------
        "mm_extract_features": multimodal.mm_extract_features,
        "mm_image_dims": multimodal.mm_image_dims,
        "mm_av_meta": multimodal.mm_av_meta,
        # --- relational glue -------------------------------------------------
        "rel_pricing_summary": relational.rel_pricing_summary,
        "rel_top_customers": relational.rel_top_customers,
        "rel_event_windows": relational.rel_event_windows,
        "rel_sessionize": relational.rel_sessionize,
        "rel_sessionize_native": relational.rel_sessionize_native,
        "rel_distinct_union": relational.rel_distinct_union,
        # --- streaming -------------------------------------------------------
        "stream_event_counts": incremental.stream_event_counts,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "se_clean_text": textstats.SQL_CLEAN_TEXT,
        "se_token_count": textstats.SQL_TOKEN_COUNT,
        "se_term_df": textstats.SQL_TERM_DF,
        "se_corpus_stats": textstats.SQL_CORPUS_STATS,
        "se_term_idf": textstats.SQL_TERM_IDF,
        "se_postings": textstats.SQL_POSTINGS,
        "se_capitals": textstats.SQL_CAPITALS,
        "se_entities": textstats.SQL_ENTITIES,
        "se_capitals_nonvacuous": textstats.SQL_CAPITALS_NONVACUOUS,
        "se_entities_nonvacuous": textstats.SQL_ENTITIES_NONVACUOUS,
        "se_bm25_topk": bm25_sql.sql_bm25_topk(),
        "se_minmatch": bm25_sql.sql_minmatch_candidates(),
        "dedup_exact": dedup.SQL_DEDUP_EXACT,
        "dedup_ngram_jaccard": dedup.SQL_DEDUP_NGRAM_JACCARD,
        "dedup_minhash_sigs": dedup.SQL_DEDUP_MINHASH_SIGNATURES,
        "dedup_minhash_lsh": dedup.SQL_DEDUP_MINHASH_LSH,
        "dedup_simhash": dedup.SQL_DEDUP_SIMHASH,
        "dedup_lsh_verified": dedup.SQL_DEDUP_LSH_VERIFIED,
        "dedup_embedding_nn": similarity.SQL_DEDUP_EMBEDDING_NEIGHBORS,
        "sim_bruteforce_topk": similarity.SQL_SIM_BRUTEFORCE_TOPK,
        "sim_lsh_buckets": similarity.sql_sim_lsh_buckets(),
        "sim_lsh_topk": similarity.sql_sim_lsh_topk(),
        "sim_ivf_topk": similarity.SQL_SIM_IVF_TOPK,
        "sim_ivf_kmeans_topk": similarity.sql_sim_ivf_kmeans_topk(),
        "text_langid": textstats.SQL_LANGID,
        "text_quality": textstats.SQL_QUALITY,
        "text_bpe_count": textstats.SQL_BPE_COUNT,
        "text_fingerprint": textstats.SQL_FINGERPRINT,
        "text_rep_ngram": textstats.SQL_REP_NGRAM,
        "text_gopher_filter": curation.SQL_TEXT_GOPHER_FILTER,
        "text_pii_scrub": curation.SQL_TEXT_PII_SCRUB,
        "text_source_mix": curation.SQL_TEXT_SOURCE_MIX,
        "corpus_curate": curation.sql_corpus_curate(),
        "mm_extract_features": multimodal.SQL_MM_EXTRACT_FEATURES,
        "mm_image_dims": multimodal.SQL_MM_IMAGE_DIMS,
        "mm_av_meta": multimodal.SQL_MM_AV_META,
        "rel_pricing_summary": relational.SQL_REL_PRICING_SUMMARY,
        "rel_top_customers": relational.SQL_REL_TOP_CUSTOMERS,
        "rel_event_windows": relational.SQL_REL_EVENT_WINDOWS,
        "rel_sessionize": relational.SQL_REL_SESSIONIZE,
        "rel_sessionize_native": relational.SQL_REL_SESSIONIZE_NATIVE,
        "rel_distinct_union": relational.SQL_REL_DISTINCT_UNION,
        "stream_event_counts": incremental.SQL_STREAM_EVENT_COUNTS,
    }
