"""LLM-scale data-pipeline extensions (BASELINE.json north star):
deduplication (exact / MinHash-LSH / n-gram Jaccard / embedding cosine),
similarity search (brute-force + LSH-bucketed ANN), text analysis, and
multimodal binary-column plumbing.

These are first-class engine operators, designed shuffle-aware for
100 TB: blocking keys bound pairwise work, LSH turns O(n²) candidate
generation into an equi-join Catalyst can shuffle-partition, and every
hot path is built-in-function (JVM) or Arrow-vectorized.
"""

from arrow_spark.llm.dedup import (  # noqa: F401
    exact_dedup,
    jaccard_near_dup_pairs,
    minhash_lsh_candidates,
    simhash_signatures,
)
from arrow_spark.llm.similarity import brute_force_topk, lsh_bucketed_topk  # noqa: F401
from arrow_spark.llm.retrieval import jaccard_topk, rrf_fuse  # noqa: F401
from arrow_spark.llm.tokenize import (  # noqa: F401
    bpe_train,
    encode_documents,
    encode_words,
    read_bpe_vocab,
    word_counts,
    write_bpe_vocab,
)
