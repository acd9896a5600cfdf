"""Column-level SQL helper functions (pure Catalyst expressions).

Re-exports the expression builders used across the engine so callers
can compose them in their own queries:

    from tersets_spark.functions import word_count, quality_score, ...
"""

from ..operators.textstats import (  # noqa: F401
    bpe_ish_token_count,
    fingerprint,
    lang_guess,
    mean_word_len,
    punct_ratio,
    quality_score,
    stopword_ratio,
    upper_ratio,
    word_count,
)
from ..operators.dedup import minhash_signature, shingles  # noqa: F401
