from .text import (  # noqa: F401
    tokens,
    word_ngrams,
    portable_token_hash,
    rolling_fingerprint,
    subword_token_count,
    lang_scores,
    lang_guess,
    quality_metrics,
)
from .dedup import (  # noqa: F401
    exact_dedup,
    doc_shingles,
    shingle_hashes,
    minhash_params,
    minhash_signature,
    candidates_from_shingles,
    lsh_band_hashes,
    near_dup_candidates,
    connected_components,
    simhash,
    jaccard,
)
from .sampling import (  # noqa: F401
    hash_bucket,
    hash_sample,
    hash_split,
    weighted_sample,
    weighted_sample_key,
)
from .asof import asof_join  # noqa: F401
from .range_join import interval_join, interval_overlap_join  # noqa: F401
from .timeseries import gapfill_locf, time_bucket  # noqa: F401
from .similarity import (  # noqa: F401
    cosine_to_literal,
    dot,
    l2_norm,
    pair_cosine,
    brute_force_topk,
    hyperplanes,
    hyperplane_bucket,
    ann_lsh_topk,
    ivf_assign,
    ann_ivf_topk,
    build_ivf_index,
    load_ivf_centroids,
    ivf_index_topk,
    train_pq_codebooks,
    pq_encode,
    pq_adc_topk,
    ivf_pq_topk,
    random_projection,
)
