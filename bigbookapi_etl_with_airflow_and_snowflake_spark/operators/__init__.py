"""Composable DataFrame operators (SURVEY.md §2)."""

from .asof import asof_join  # noqa: F401
from .dedup import drop_duplicates, exact_dedup, keep_first_dedup  # noqa: F401
from .multimodal import (  # noqa: F401
    extract_features,
    resize_images,
    sample_frames,
    with_byte_metadata,
)
from .neardup import (  # noqa: F401
    jaccard_pairs,
    minhash_band_pairs,
    minhash_signatures,
    simhash,
)
from .rangejoin import range_join  # noqa: F401
from .similarity import (  # noqa: F401
    cosine_topk,
    embedding_neardup_pairs,
    ivf_topk,
    knn_label_vote,
    lsh_topk,
)
from .skew import replicate_broadcast_join, salted_agg  # noqa: F401
from .text import (  # noqa: F401
    bpe_token_count,
    fingerprint,
    lang_id,
    quality_score,
    text_stats,
    token_count,
)
from .transforms import standardize_models, transform_books  # noqa: F401
