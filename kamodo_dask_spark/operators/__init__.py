from kamodo_dask_spark.operators.asof import (
    asof_join,
    asof_uniform_grid,
    asof_uniform_grid_both,
)
from kamodo_dask_spark.operators.dedup import (
    contamination_scores,
    exact_dedup,
    exact_dup_groups,
    jaccard_pairs,
    line_dedup,
    minhash_lsh_candidates,
    minhash_signature,
    minhash_signatures,
    simhash,
    simhash_fingerprints_agg,
    simhash_hamming_candidates,
)
from kamodo_dask_spark.operators.maintenance import upsert_snapshot
from kamodo_dask_spark.operators.similarity import (
    cosine_topk,
    ivf_cosine_topk,
    lsh_cosine_topk,
    rademacher_planes,
)
from kamodo_dask_spark.operators.text import (
    add_text_features,
    gopher_quality_flags,
    detect_language,
    fingerprint,
    quality_score,
    regex_token_count,
    whitespace_token_count,
)
from kamodo_dask_spark.operators.multimodal import attach_media, extract_media_features

__all__ = [
    "asof_join",
    "asof_uniform_grid",
    "asof_uniform_grid_both",
    "contamination_scores",
    "line_dedup",
    "ivf_cosine_topk",
    "gopher_quality_flags",
    "exact_dedup",
    "exact_dup_groups",
    "jaccard_pairs",
    "minhash_lsh_candidates",
    "minhash_signature",
    "minhash_signatures",
    "simhash_fingerprints_agg",
    "simhash",
    "simhash_hamming_candidates",
    "cosine_topk",
    "lsh_cosine_topk",
    "rademacher_planes",
    "upsert_snapshot",
    "add_text_features",
    "detect_language",
    "fingerprint",
    "quality_score",
    "regex_token_count",
    "whitespace_token_count",
    "attach_media",
    "extract_media_features",
]
