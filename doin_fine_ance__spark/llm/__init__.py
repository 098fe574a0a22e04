from .ann import ann_topk_lsh, hyperplane_buckets
from .dedup import (
    lsh_candidate_pairs,
    minhash_near_dups,
    minhash_signatures,
    simhash64,
    simhash_near_dups,
)
from .multimodal import (
    MEDIA_SCHEMA,
    decode_media_batch,
    extract_audio_features,
    extract_media_features,
)
from .quality import quality_filter, score_quality, train_quality_classifier
from .selection import budget_select, domain_mix, global_running_sum, shuffle_rank

__all__ = [
    "minhash_signatures",
    "lsh_candidate_pairs",
    "minhash_near_dups",
    "simhash64",
    "simhash_near_dups",
    "hyperplane_buckets",
    "ann_topk_lsh",
    "MEDIA_SCHEMA",
    "decode_media_batch",
    "extract_media_features",
    "extract_audio_features",
    "train_quality_classifier",
    "score_quality",
    "quality_filter",
    "global_running_sum",
    "budget_select",
    "shuffle_rank",
    "domain_mix",
]
