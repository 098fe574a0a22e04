from .dedup import (
    minhash_signatures,
    lsh_candidate_pairs,
    minhash_near_dups,
    simhash64,
    simhash_near_dups,
)
from .ann import hyperplane_buckets, ann_topk_lsh
from .multimodal import MEDIA_SCHEMA, decode_media_batch, extract_media_features

__all__ = [
    "minhash_signatures",
    "lsh_candidate_pairs",
    "minhash_near_dups",
    "simhash64",
    "hyperplane_buckets",
    "ann_topk_lsh",
    "MEDIA_SCHEMA",
    "decode_media_batch",
    "extract_media_features",
]
