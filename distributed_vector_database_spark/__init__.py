"""distributed_vector_database_spark — a PySpark-native analytics engine.

A brand-new, Spark-first re-expression of the query and data-processing
capabilities of the reference system ``nickglandry/distributed_vector_database``
(an IVF-sharded distributed vector database: FastAPI compute router + SQLite
storage shards, `reference: src/compute_server.py`, `src/storage_server.py`),
plus the surrounding LLM-training-data pipeline operators (dedup, similarity
search, text analysis, multimodal plumbing) required at 100 TB scale.

Design principles (see SURVEY.md §7):
  - DataFrame / Spark SQL only; declarative plans so Catalyst gets predicate
    pushdown, column pruning and partition pruning for free.
  - Vectors are plain ``array<float|double>`` columns (no UDT) so every table
    we write is readable by any parquet reader (incl. the DuckDB oracle).
  - IVF sharding == parquet ``partitionBy("shard_id")`` + a broadcast centroid
    table; probe pruning == a partition-pruned filter.
  - Python UDFs only where built-ins genuinely cannot express the semantics,
    and then always Arrow-vectorized (pandas_udf / mapInPandas).
"""

from distributed_vector_database_spark.session import get_session
from distributed_vector_database_spark.functions.vector import (
    dot,
    l2_norm,
    l2_normalize,
    cosine_similarity,
    euclidean_distance,
)
from distributed_vector_database_spark.operators.topk import (
    topk,
    batch_topk,
    radius_search,
)
from distributed_vector_database_spark.operators.ivf import IVFIndex, assign_shards
from distributed_vector_database_spark.operators.ivfpq import IVFPQIndex
from distributed_vector_database_spark.operators.ann import (
    binary_rerank_topk,
    binary_topk,
    knn_graph,
    lsh_index,
    lsh_search,
    matryoshka_rerank_topk,
    random_hyperplanes,
)
from distributed_vector_database_spark.sources.vector_store import VectorStore
from distributed_vector_database_spark.sources.sqlite_store import (
    SqliteVectorShards,
    read_shards,
    write_shards,
)
from distributed_vector_database_spark.sources.bucketed import save_bucketed
from distributed_vector_database_spark.sources.layout import save_zordered, zvalue
from distributed_vector_database_spark.sources.formats import roundtrip as format_roundtrip
from distributed_vector_database_spark.operators.temporal import (
    asof_join,
    range_join,
)
from distributed_vector_database_spark.operators.skew import (
    salted_join,
    skew_safe_totals,
)
from distributed_vector_database_spark.operators.sketch import (
    bloom_build,
    hdr_hist_build,
    hdr_hist_merge,
    hdr_quantiles,
    bloom_contains,
    bloom_merge,
    cms_build,
    cms_lookup,
    cms_merge,
    hash_sample,
    hash_split,
    hash_topk_sample,
    kmv_distinct,
    kmv_set_estimates,
    kmv_sketch,
    stratified_hash_sample,
)
from distributed_vector_database_spark.operators.eval import ndcg_at_k, recall_at_k
from distributed_vector_database_spark.operators.graph import (
    connected_components,
    connected_components_star,
    pagerank_micro,
)
from distributed_vector_database_spark.operators.dedup import (
    embedding_neardup_pairs,
    exact_dedup_groups,
    jaccard_pairs,
    jaccard_pairs_prefix,
    minhash_band_buckets,
    minhash_bucket_dup_flags,
    minhash_candidate_pairs,
    minhash_signatures,
    simhash_fingerprints,
)
from distributed_vector_database_spark.streaming.docs import (
    stream_minhash_dedup,
    stream_winnow_dedup,
)
from distributed_vector_database_spark.operators.text_analysis import (
    language_id,
    quality_scores,
    term_frequencies,
    tfidf_top_terms,
    token_stats,
)
from distributed_vector_database_spark.operators.quality import (
    apply_expectations,
    expectations_report,
    write_observed,
)
from distributed_vector_database_spark.operators.er import (
    fuzzy_dup_pairs,
    sorted_neighborhood_pairs,
)
from distributed_vector_database_spark.operators.analytics import (
    conversion_funnel,
    retention_cohorts,
    user_value_ewma,
    zscore_outliers,
)
from distributed_vector_database_spark.operators.sessions import (
    latest_event_per_user,
    running_totals,
    sessionize,
)
from distributed_vector_database_spark.streaming.events import (
    dedup_stream,
    join_event_streams,
    session_window_stats,
    stateful_user_totals,
    tumbling_counts,
)
from distributed_vector_database_spark.operators.pq import (
    fit_opq_rotation,
    fit_pq_codebooks,
    ivfpq_residual_topk,
    pq_adc_batch_topk,
    pq_adc_topk,
    pq_decode,
    pq_encode,
    pq_encode_arrow,
    residual_col,
    rotate_col,
)
from distributed_vector_database_spark.functions.quantize import (
    hamming_distance,
    int8_dequantize,
    int8_quantize,
    sign_pack,
    sign_pack_vector,
)
from distributed_vector_database_spark.operators.chunking import chunk_documents
from distributed_vector_database_spark.operators.dedup import (
    doc_repeated_span_stats,
    duplicate_paragraphs,
    excise_spans,
    longest_shared_runs,
    paragraph_dedup_stats,
    repeated_spans,
    semantic_dedup,
    shared_runs,
    shared_span_pairs,
    simhash_neardup_pairs,
    winnow_owner_dup_flags,
)
from distributed_vector_database_spark.operators.dsir import (
    dsir_gumbel_sample,
    dsir_select,
    importance_log_weights,
    target_cross_entropy,
)
from distributed_vector_database_spark.operators.mining import (
    hard_negatives,
    label_prototypes,
    prototype_scores,
)
from distributed_vector_database_spark.sources.mor import MorStore
from distributed_vector_database_spark.operators.fusion import (
    mmr_rerank,
    ranked,
    rrf_fuse,
)
from distributed_vector_database_spark.operators.merge import merge_into
from distributed_vector_database_spark.operators.lm import (
    bigram_counts,
    doc_bigram_cross_entropy,
    source_unigram_kl,
)
from distributed_vector_database_spark.operators.tokenizer import (
    bpe_pair_counts,
    bpe_token_counts,
    train_bpe,
)
from distributed_vector_database_spark.operators.curation import (
    boilerplate_shingles,
    doc_boilerplate_frac,
)
from distributed_vector_database_spark.sources.stats import (
    collect_file_blooms,
    collect_file_stats,
    prune_files,
    prune_files_bloom,
    read_bloom_pruned,
    read_pruned,
)

__all__ = [
    "get_session",
    "dot",
    "l2_norm",
    "l2_normalize",
    "cosine_similarity",
    "euclidean_distance",
    "topk",
    "batch_topk",
    "radius_search",
    "IVFIndex",
    "IVFPQIndex",
    "assign_shards",
    "lsh_index",
    "lsh_search",
    "random_hyperplanes",
    "VectorStore",
    "SqliteVectorShards",
    "read_shards",
    "write_shards",
    "save_bucketed",
    "save_zordered",
    "zvalue",
    "format_roundtrip",
    "asof_join",
    "range_join",
    "skew_safe_totals",
    "salted_join",
    "hash_sample",
    "hash_split",
    "stratified_hash_sample",
    "chunk_documents",
    "semantic_dedup",
    "repeated_spans",
    "doc_repeated_span_stats",
    "importance_log_weights",
    "dsir_select",
    "dsir_gumbel_sample",
    "target_cross_entropy",
    "hard_negatives",
    "label_prototypes",
    "prototype_scores",
    "MorStore",
    "kmv_distinct",
    "recall_at_k",
    "ndcg_at_k",
    "connected_components",
    "connected_components_star",
    "pagerank_micro",
    "exact_dedup_groups",
    "jaccard_pairs",
    "jaccard_pairs_prefix",
    "minhash_signatures",
    "minhash_band_buckets",
    "minhash_bucket_dup_flags",
    "minhash_candidate_pairs",
    "stream_minhash_dedup",
    "stream_winnow_dedup",
    "kmv_sketch",
    "kmv_set_estimates",
    "hash_topk_sample",
    "cms_merge",
    "cms_lookup",
    "cms_build",
    "bloom_merge",
    "bloom_contains",
    "bloom_build",
    "hdr_quantiles",
    "hdr_hist_merge",
    "hdr_hist_build",
    "winnow_owner_dup_flags",
    "shared_span_pairs",
    "shared_runs",
    "longest_shared_runs",
    "excise_spans",
    "simhash_fingerprints",
    "simhash_neardup_pairs",
    "embedding_neardup_pairs",
    "token_stats",
    "quality_scores",
    "language_id",
    "term_frequencies",
    "tfidf_top_terms",
    "sessionize",
    "user_value_ewma",
    "zscore_outliers",
    "sorted_neighborhood_pairs",
    "fuzzy_dup_pairs",
    "apply_expectations",
    "expectations_report",
    "write_observed",
    "conversion_funnel",
    "retention_cohorts",
    "running_totals",
    "latest_event_per_user",
    "dedup_stream",
    "join_event_streams",
    "tumbling_counts",
    "session_window_stats",
    "stateful_user_totals",
    "fit_pq_codebooks",
    "pq_encode",
    "pq_encode_arrow",
    "pq_decode",
    "pq_adc_topk",
    "pq_adc_batch_topk",
    "residual_col",
    "ivfpq_residual_topk",
    "fit_opq_rotation",
    "rotate_col",
    "paragraph_dedup_stats",
    "duplicate_paragraphs",
    "rrf_fuse",
    "ranked",
    "mmr_rerank",
    "merge_into",
    "collect_file_stats",
    "prune_files",
    "read_pruned",
    "collect_file_blooms",
    "prune_files_bloom",
    "read_bloom_pruned",
    "int8_quantize",
    "int8_dequantize",
    "sign_pack",
    "sign_pack_vector",
    "hamming_distance",
    "binary_topk",
    "binary_rerank_topk",
    "matryoshka_rerank_topk",
    "knn_graph",
    "bigram_counts",
    "doc_bigram_cross_entropy",
    "source_unigram_kl",
    "bpe_pair_counts",
    "bpe_token_counts",
    "train_bpe",
    "boilerplate_shingles",
    "doc_boilerplate_frac",
]

__version__ = "0.1.0"
