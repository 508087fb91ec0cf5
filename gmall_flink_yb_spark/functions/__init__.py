from gmall_flink_yb_spark.functions.text import (  # noqa: F401
    doc_fingerprint,
    language_id,
    quality_features,
    token_count,
)
from gmall_flink_yb_spark.functions.dedup import (  # noqa: F401
    exact_dedup,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_pairs,
)
from gmall_flink_yb_spark.functions.similarity import (  # noqa: F401
    brute_force_topk,
    cosine_near_dup_pairs,
    lsh_bucket_topk,
)
from gmall_flink_yb_spark.functions.sampling import (  # noqa: F401
    hash_sample,
    stratified_sample,
)
