from .text import (  # noqa: F401
    tokens,
    token_count,
    quality_features,
    langid_scores,
    fingerprint,
)
from .dedup import (  # noqa: F401
    exact_dedup,
    shingles,
    ngram_jaccard_pairs,
    minhash_signatures,
    minhash_lsh_pairs,
    simhash16,
)
from .similarity import (  # noqa: F401
    quantize_embedding,
    brute_force_topk,
    rp_lsh_topk,
)
