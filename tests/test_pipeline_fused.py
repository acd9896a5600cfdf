"""Fused single-pass operator must agree exactly with the separate
compress / rollup operators."""

from __future__ import annotations

from pyspark.sql import functions as F

from tersets_spark.methods import Method
from tersets_spark.operators.pipeline import (
    base_rollup_from_fused,
    blocks_from_fused,
    fused_compress_rollup,
)
from tersets_spark.operators.compress import decompress_blocks, reassemble
from tersets_spark.operators.rollup import rollup_tokens_base
from tersets_spark.sources.synth import synth_tokens


def test_fused_matches_separate_operators(spark):
    toks = synth_tokens(spark, 40, max_len=9000).persist()
    fused = fused_compress_rollup(toks, Method.BitPackedDeltaEncoding, chunk=1000).persist()
    # 1) every chunk round-trips in-kernel
    assert fused.filter(~F.col("roundtrip_ok")).count() == 0
    # 2) fused base rollup == standalone base rollup (exact)
    a = base_rollup_from_fused(fused).orderBy("doc_id", "bucket").collect()
    b = (
        rollup_tokens_base(toks, 60)
        .orderBy("doc_id", "bucket")
        .collect()
    )
    assert len(a) == len(b)
    for ra, rb in zip(a, b):
        assert (ra.doc_id, ra.bucket, ra.vmin, ra.vmax, ra.vcount) == (
            rb.doc_id,
            rb.bucket,
            rb.vmin,
            rb.vmax,
            rb.vcount,
        )
        assert abs(ra.vsum - rb.vsum) < 1e-6
    # 3) the blocks projection decodes back to the original sequences
    blocks = blocks_from_fused(fused, Method.BitPackedDeltaEncoding)
    restored = {r.doc_id: r.tokens for r in reassemble(decompress_blocks(blocks)).collect()}
    for r in toks.collect():
        assert restored[r.doc_id] == r.tokens
    fused.unpersist()
    toks.unpersist()
