from .text import (  # noqa: F401
    tokens,
    word_ngrams,
    portable_token_hash,
    rolling_fingerprint,
    lang_scores,
    quality_metrics,
)
from .dedup import (  # noqa: F401
    exact_dedup,
    minhash_params,
    minhash_signature,
    lsh_band_hashes,
    near_dup_candidates,
    simhash,
    jaccard,
)
from .similarity import (  # noqa: F401
    cosine_to_literal,
    dot,
    l2_norm,
    brute_force_topk,
    hyperplane_bucket,
    ann_lsh_topk,
)
