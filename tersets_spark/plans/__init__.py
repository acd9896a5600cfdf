"""Query planning notes.

The engine deliberately ships NO custom Catalyst rules or strategies
(SURVEY.md §4.2): every operator is expressed as a DataFrame graph so
predicate pushdown, column pruning, partial aggregation, AQE skew
handling and join selection come from Catalyst unmodified. The
"physical plans" the engine does own are:

* :mod:`tersets_spark.operators.pipeline` — the fused single-pass
  compress + verify + rollup job shape (one Arrow crossing, ROLLUP
  grouping sets for all tiers in one exchange);
* :mod:`tersets_spark.operators.lineage` — the bucketed checkpoint
  orchestration (driver-side batching over deterministic partition
  buckets).
"""

from ..operators.pipeline import (  # noqa: F401
    blocks_from_fused,
    flagship_summary,
    fused_compress_rollup,
    tier_rollups_fused,
)
