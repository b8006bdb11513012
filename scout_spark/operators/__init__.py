from scout_spark.operators.topk import top_k, grouped_top_k
from scout_spark.operators.asof import asof_join
from scout_spark.operators.dedup import (
    exact_dedup,
    minhash_lsh_pairs,
    simhash_signatures,
    jaccard_pairs,
)
from scout_spark.operators.ann import brute_force_topk, lsh_bucket_topk

__all__ = [
    "top_k",
    "grouped_top_k",
    "asof_join",
    "exact_dedup",
    "minhash_lsh_pairs",
    "simhash_signatures",
    "jaccard_pairs",
    "brute_force_topk",
    "lsh_bucket_topk",
]
