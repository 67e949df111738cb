from oarphpy_spark.llm.dedup import (  # noqa: F401
    exact_dedup,
    minhash_signatures,
    minhash_candidate_pairs,
    ngram_jaccard_pairs,
    simhash16,
)
from oarphpy_spark.llm.similarity import brute_force_topk, hyperplane_lsh_topk  # noqa: F401
