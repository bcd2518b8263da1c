"""Beyond-reference operators: the LLM-data-pipeline surface.

The reference engine has none of these (SURVEY.md §2.4); they are the
extension operators a 100 TB training-data pipeline needs. Every
operator is a DataFrame -> DataFrame transform built on Spark
primitives: built-in higher-order functions on the hot path (JVM-side,
whole-stage codegen), shuffle-based candidate generation (never
driver-side loops), Pandas UDFs only where Python is genuinely needed
(multimodal decode).
"""

from chapterhousedb_spark.operators.asof import asof_join
from chapterhousedb_spark.operators.dedup import (
    char_shingle_posts,
    contamination_pairs,
    contamination_short_probes,
    duplicate_spans,
    exact_dedup,
    minhash_near_dup_pairs,
    minhash_near_dup_pairs_cross,
    minhash_signature,
    ngram_jaccard_pairs,
    normalize_text,
    release_self_join_caches,
    simhash,
    simhash_near_dup_pairs,
    pair_features,
    remove_duplicate_spans,
    simhash_near_dup_pairs_cross,
    two_stage_dedup,
    word_shingle_posts,
)
from chapterhousedb_spark.operators.classifier import (
    QUALITY_FEATURES,
    logreg_score,
    logreg_train,
    train_quality_classifier,
)
from chapterhousedb_spark.operators.cluster import (
    components_update,
    connected_components,
    dedup_survivors,
)
from chapterhousedb_spark.operators.ingest import (
    admit_batch,
    ingest_stream,
    init_ingest,
)
from chapterhousedb_spark.operators.merge import (
    merge_apply_partitioned,
    merge_stats,
    merge_upsert,
    merge_upsert_small_updates,
)
from chapterhousedb_spark.operators.similarity import (
    cosine_topk,
    embedding_dedup_survivors,
    embedding_near_dup_pairs,
    embedding_near_dup_pairs_cross,
    ivf_ann_topk,
    ivf_assign,
    ivf_fit,
    ivf_probe_cells,
    ivf_append,
    ivf_probe_topk,
    ivf_read_index,
    ivf_write_index,
    srp_append,
    srp_probe_topk,
    srp_read_index,
    srp_write_index,
    srp_signature,
    srp_ann_topk,
)
from chapterhousedb_spark.operators.multimodal import (
    audio_features,
    extract_features,
    resize_media,
)
from chapterhousedb_spark.operators.sampling import (
    token_budget_mix,
)
from chapterhousedb_spark.operators.text import (
    bpe_segment,
    bpe_train,
    bpe_train_from_words,
    lang_id,
    bigram_lm_stats,
    rarity_stats,
    redact_pii,
    pack_sequences,
    text_fingerprint,
    text_stats,
    token_count,
)

__all__ = [
    "admit_batch",
    "bpe_segment",
    "bpe_train",
    "bpe_train_from_words",
    "asof_join",
    "components_update",
    "connected_components",
    "dedup_survivors",
    "ingest_stream",
    "init_ingest",
    "ivf_append",
    "bigram_lm_stats",
    "embedding_dedup_survivors",
    "rarity_stats",
    "token_budget_mix",
    "char_shingle_posts",
    "contamination_pairs",
    "contamination_short_probes",
    "duplicate_spans",
    "cosine_topk",
    "embedding_near_dup_pairs",
    "embedding_near_dup_pairs_cross",
    "exact_dedup",
    "ivf_ann_topk",
    "ivf_assign",
    "ivf_fit",
    "ivf_probe_cells",
    "ivf_probe_topk",
    "ivf_read_index",
    "ivf_write_index",
    "srp_append",
    "srp_probe_topk",
    "srp_read_index",
    "srp_write_index",
    "lang_id",
    "merge_apply_partitioned",
    "merge_stats",
    "merge_upsert",
    "merge_upsert_small_updates",
    "minhash_near_dup_pairs",
    "minhash_near_dup_pairs_cross",
    "minhash_signature",
    "ngram_jaccard_pairs",
    "normalize_text",
    "pack_sequences",
    "redact_pii",
    "release_self_join_caches",
    "simhash",
    "simhash_near_dup_pairs",
    "simhash_near_dup_pairs_cross",
    "srp_ann_topk",
    "srp_signature",
    "text_fingerprint",
    "text_stats",
    "token_count",
    "audio_features",
    "extract_features",
    "resize_media",
    "logreg_score",
    "logreg_train",
    "pair_features",
    "remove_duplicate_spans",
    "train_quality_classifier",
    "two_stage_dedup",
    "word_shingle_posts",
]
