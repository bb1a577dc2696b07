"""Operator façade: the engine's reusable dataflow transforms in one
namespace, grouped as the SURVEY.md §2 inventory groups them.

Implementations live with their subsystem (calendar, ingest, dedup,
similarity, text); this module is the stable import surface:

    from etl_database_spark.operators import (
        build_calendar, asof_business_day,          # W1/J5
        normalize_columns, profile_widths,          # P2/A5
        truncate_to_widths,                         # §4.2.3
        exact_duplicates, minhash_near_duplicates,  # dedup tier
        simhash_fingerprints, ngram_jaccard_pairs,
        cosine_topk, ann_topk,                      # similarity tier
        token_count, detect_language, quality_score # text tier
    )
"""

from etl_database_spark.calendar import (  # noqa: F401
    asof_business_day,
    build_calendar,
    next_business_date,
)
from etl_database_spark.functions.dedup import (  # noqa: F401
    exact_duplicates,
    minhash_near_duplicates,
    minhash_signatures,
    ngram_jaccard_pairs,
    shingles,
    simhash_fingerprints,
    simhash_near_duplicates,
)
from etl_database_spark.functions.lm import (  # noqa: F401
    bigram_lm_scores,
)
from etl_database_spark.functions.similarity import (  # noqa: F401
    ann_topk,
    cosine,
    cosine_topk,
    dot,
    lsh_signatures,
)
from etl_database_spark.functions.text import (  # noqa: F401
    detect_language,
    fingerprint_md5,
    fingerprint_xx64,
    normalize_text,
    punct_ratio,
    quality_score,
    stopword_score,
    token_count,
    word_occurrences,
)
from etl_database_spark.ingest import (  # noqa: F401
    normalize_columns,
    profile_widths,
    truncate_to_widths,
)
from etl_database_spark.operators.asof import (  # noqa: F401
    asof_join_backward,
    range_join,
)
from etl_database_spark.operators.bucketing import (  # noqa: F401
    bucketed_join,
    write_bucketed,
)
from etl_database_spark.operators.skew import (  # noqa: F401
    salted_broadcast_join,
    salted_sum_count,
)
