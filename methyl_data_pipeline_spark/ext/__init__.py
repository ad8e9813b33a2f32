"""LLM-data-pipeline extensions (SURVEY §2.13 / BASELINE north star):
dedup, similarity search, text analysis, multimodal columns.

Not part of the reference surface — these are the operations a
large-scale training-data pipeline needs, built Spark-first on the
``documents`` / ``embeddings`` tables.
"""

from methyl_data_pipeline_spark.ext.text import (  # noqa: F401
    tokenize,
    text_quality,
    language_id,
    fingerprint,
)
from methyl_data_pipeline_spark.ext.dedup import (  # noqa: F401
    dedup_exact,
    minhash_signatures,
    minhash_candidate_pairs,
    ngram_jaccard_pairs,
    simhash,
    bloom_build,
    bloom_test,
    bloom_decontaminate,
    snapshot_diff,
)
from methyl_data_pipeline_spark.ext.text import (  # noqa: F401
    heavy_hitters,
    heavy_hitters_approx,
    corpus_report,
)
from methyl_data_pipeline_spark.ext.similarity import (  # noqa: F401
    cosine_topk_bruteforce,
    lsh_bucketed_topk,
)
