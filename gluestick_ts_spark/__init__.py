"""gluestick_ts_spark — a PySpark-native analytics/ETL engine with the
capabilities of hotgluexyz/gluestick-ts (reference snapshot at
``/root/reference``), rebuilt Spark-first for 100 TB scale.

Public API mirrors the reference's exports (``src/index.ts:1-6``) in
snake_case, plus the scale-extension operators (dedup, similarity
search, text analysis, multimodal) the reference lacks.
"""

from .catalog import Catalog, get_catalog_schema, json_schema_to_struct_type
from .functions.datetime_utils import (
    deep_convert_datetimes,
    iso8601_expr,
    localize_datetime,
    parse_dates_expr,
)
from .functions.json_utils import parse_df_cols, parse_objs, struct_to_json
from .functions.schema_drift import (
    SchemaDrift,
    assert_no_drift,
    schema_drift,
)
from .functions.sampling import (
    domain_shares,
    hash_sample,
    hash_split,
    md5_bucket_expr,
    stratified_hash_sample_expr,
    temperature_rates,
    weighted_domain_sample,
)
from .functions.templating import (
    build_string_format_variables,
    format_str_safely,
    get_index_safely,
)
from .operators.asof import asof_join
from .operators.bucketing import bucketed_join, plan_has_shuffle, write_bucketed
from .operators.dedup import (
    append_fingerprint_store,
    append_signature_store,
    compact_fingerprint_store,
    compact_signature_store,
    connected_min_labels,
    dedup_clusters,
    dedup_exact,
    dedup_exact_incremental,
    dedup_exact_incremental_bucketed,
    dedup_minhash,
    dedup_minhash_incremental,
    dedup_minhash_incremental_bucketed,
    embedding_neardup_pairs,
    exact_substring_dedup,
    line_dedup,
    sentence_span_dedup,
    minhash_lsh_pairs,
    minhash_signatures,
    ngram_contamination,
    ngram_jaccard_pairs,
    read_signature_store_meta,
    signature_jaccard_expr,
    simhash_expr,
    simhash_pairs,
    winnow_similarity_pairs,
    write_fingerprint_store,
    write_signature_store,
)
from .operators.multimodal import (
    attach_media_metadata,
    extract_media_features,
    probe_media_metadata,
    real_decode_features,
    resize_media,
    sample_frames,
)
from .operators.packing import assemble_packs, pack_token_windows
from .operators.funnel import (
    funnel_counts,
    funnel_depth_per_user,
    retention_matrix,
)
from .streaming.incremental import frozen_logprob_expr
from .operators.ml import (
    binary_auc,
    distill_quality_classifier,
    distilled_score_expr,
    logreg_score_expr,
    train_logreg,
)
from .operators.bpe import (
    bpe_encode_expr,
    bpe_pair_stats,
    train_bpe,
    word_freqs,
)
from .operators.frequent import heavy_hitters
from .operators.profile import bigram_pmi, corpus_profile, unigram_logprob_scores
from .operators.linkage import (
    deletion_variants_expr,
    edit_distance_join,
    edit_distance_self_join,
)
from .operators.scd2 import read_scd2, scd2_asof, scd2_upsert
from .operators.scd2_partitioned import (
    read_partitioned_scd2,
    scd2_upsert_partitioned,
)
from .sinks.zorder import file_stats_ranges, write_zordered, zorder_key_expr
from .operators.rollup import (
    compact_rollup,
    read_rollup,
    refresh_rollup,
    rollup_aggregate,
    write_rollup,
    write_rollup_delta,
)
from .operators.search import (
    append_bm25_index,
    bm25_index_topk,
    bm25_topk,
    read_bm25_index_meta,
    rrf_fuse,
    term_postings,
    write_bm25_index,
)
from .operators.similarity import (
    ann_ivf_store_topk,
    ann_ivf_topk,
    append_ivf_store,
    compact_ivf_store,
    read_ivf_store_meta,
    write_ivf_store,
    ann_ivfpq_topk,
    ann_lsh_topk,
    pq_encode,
    pq_topk,
    train_pq_codebooks,
    ann_recall_vs_exact,
    append_semantic_store,
    compact_semantic_store,
    cosine_topk,
    read_semantic_store_meta,
    semantic_dedup,
    semantic_dedup_incremental,
    train_ivf_centroids,
    write_semantic_store,
)
from .operators.skew import salted_join, two_phase_count_distinct
from .operators.snapshot import keep_last_dedup, read_snapshots, snapshot_records
from .operators.timeseries import resample_gapfill, rolling_zscore, time_bucket_expr
from .operators.cdc import snapshot_diff
from .operators.snapshot_partitioned import (
    partitioned_snapshot_upsert,
    read_partitioned_snapshot,
)
from .session import get_spark
from .sinks.export import (
    to_export,
    write_csv,
    write_json_array,
    write_jsonl,
    write_parquet,
)
from .sinks.singer import (
    gen_singer_header,
    get_column_type,
    spark_type_to_singer_schema,
    to_singer,
    to_singer_schema,
)
from .sources.reader import Reader

__all__ = [
    "Catalog",
    "Reader",
    "ann_ivf_store_topk",
    "ann_ivf_topk",
    "append_ivf_store",
    "compact_ivf_store",
    "read_ivf_store_meta",
    "write_ivf_store",
    "ann_lsh_topk",
    "ann_recall_vs_exact",
    "asof_join",
    "attach_media_metadata",
    "bucketed_join",
    "append_fingerprint_store",
    "append_signature_store",
    "compact_fingerprint_store",
    "compact_signature_store",
    "connected_min_labels",
    "cosine_topk",
    "semantic_dedup",
    "semantic_dedup_incremental",
    "write_semantic_store",
    "append_semantic_store",
    "compact_semantic_store",
    "read_semantic_store_meta",
    "train_ivf_centroids",
    "dedup_clusters",
    "dedup_exact",
    "dedup_exact_incremental",
    "dedup_exact_incremental_bucketed",
    "dedup_minhash",
    "dedup_minhash_incremental",
    "line_dedup",
    "exact_substring_dedup",
    "sentence_span_dedup",
    "dedup_minhash_incremental_bucketed",
    "embedding_neardup_pairs",
    "read_signature_store_meta",
    "signature_jaccard_expr",
    "write_fingerprint_store",
    "write_signature_store",
    "extract_media_features",
    "minhash_lsh_pairs",
    "minhash_signatures",
    "ngram_contamination",
    "ngram_jaccard_pairs",
    "plan_has_shuffle",
    "probe_media_metadata",
    "real_decode_features",
    "resize_media",
    "salted_join",
    "sample_frames",
    "append_bm25_index",
    "bm25_index_topk",
    "bm25_topk",
    "read_bm25_index_meta",
    "write_bm25_index",
    "rrf_fuse",
    "assemble_packs",
    "pack_token_windows",
    "binary_auc",
    "frozen_logprob_expr",
    "funnel_counts",
    "retention_matrix",
    "funnel_depth_per_user",
    "distill_quality_classifier",
    "distilled_score_expr",
    "bigram_pmi",
    "heavy_hitters",
    "bpe_encode_expr",
    "bpe_pair_stats",
    "train_bpe",
    "word_freqs",
    "corpus_profile",
    "logreg_score_expr",
    "train_logreg",
    "compact_rollup",
    "read_rollup",
    "deletion_variants_expr",
    "edit_distance_join",
    "edit_distance_self_join",
    "read_partitioned_scd2",
    "read_scd2",
    "scd2_asof",
    "scd2_upsert",
    "scd2_upsert_partitioned",
    "resample_gapfill",
    "rolling_zscore",
    "time_bucket_expr",
    "refresh_rollup",
    "rollup_aggregate",
    "write_rollup",
    "write_zordered",
    "zorder_key_expr",
    "file_stats_ranges",
    "write_rollup_delta",
    "unigram_logprob_scores",
    "ann_ivfpq_topk",
    "pq_encode",
    "pq_topk",
    "train_pq_codebooks",
    "term_postings",
    "simhash_expr",
    "simhash_pairs",
    "winnow_similarity_pairs",
    "two_phase_count_distinct",
    "write_bucketed",
    "build_string_format_variables",
    "deep_convert_datetimes",
    "format_str_safely",
    "gen_singer_header",
    "get_catalog_schema",
    "get_column_type",
    "get_index_safely",
    "get_spark",
    "hash_sample",
    "hash_split",
    "SchemaDrift",
    "assert_no_drift",
    "schema_drift",
    "stratified_hash_sample_expr",
    "weighted_domain_sample",
    "domain_shares",
    "temperature_rates",
    "md5_bucket_expr",
    "iso8601_expr",
    "json_schema_to_struct_type",
    "keep_last_dedup",
    "localize_datetime",
    "parse_dates_expr",
    "parse_df_cols",
    "parse_objs",
    "partitioned_snapshot_upsert",
    "read_partitioned_snapshot",
    "read_snapshots",
    "snapshot_diff",
    "snapshot_records",
    "spark_type_to_singer_schema",
    "struct_to_json",
    "to_export",
    "to_singer",
    "to_singer_schema",
    "write_csv",
    "write_json_array",
    "write_jsonl",
    "write_parquet",
]

__version__ = "0.1.0"
