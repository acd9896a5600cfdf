"""End-to-end Spark pipeline: synth -> compress -> roundtrip -> rollups
-> gapfill -> retention -> lineage/resume.

Oracle style per SURVEY.md §5.2: the numpy kernels (same module the UDFs
call) are the single-node oracle; Spark output must match exactly.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from tersets_spark.methods import Method
from tersets_spark.operators.compress import (
    compress_blocks,
    decompress_blocks,
    reassemble,
    roundtrip_verify,
)
from tersets_spark.operators.gapfill import gapfill
from tersets_spark.operators.retention import prune_tier, split_aged
from tersets_spark.operators.rollup import rollup_events, tier_rollups
from tersets_spark.sources.synth import synth_tokens

N_DOCS = 60


@pytest.fixture(scope="module")
def tokens_df(spark):
    df = synth_tokens(spark, N_DOCS, max_len=9000).cache()
    df.count()
    return df


def test_synth_deterministic(spark):
    a = synth_tokens(spark, 8, max_len=512).orderBy("doc_id").collect()
    b = synth_tokens(spark, 8, max_len=512).orderBy("doc_id").collect()
    for ra, rb in zip(a, b):
        assert ra.doc_id == rb.doc_id and ra.tokens == rb.tokens
    assert all(0 <= t < 131072 for t in a[0].tokens)


@pytest.mark.parametrize(
    "method",
    [
        Method.BitPackedDeltaEncoding,
        Method.Chimp64,
        Method.Chimp128,
        Method.RunLengthEncoding,
        Method.Elf,
        Method.Uncompressed,
    ],
    ids=lambda m: m.name,
)
def test_roundtrip_all_docs(tokens_df, method):
    res = roundtrip_verify(tokens_df, method).collect()
    assert len(res) == N_DOCS
    assert all(r.roundtrip_ok for r in res)


def test_chunking_boundaries(spark, tokens_df):
    blocks = compress_blocks(tokens_df, Method.BitPackedDeltaEncoding, chunk=1000)
    agg = blocks.groupBy("doc_id").agg(
        F.sum("n_values").alias("total"), F.count("*").alias("n_chunks")
    )
    joined = tokens_df.join(agg, "doc_id").collect()
    for r in joined:
        assert r.total == r.n_tok
        assert r.n_chunks == max((r.n_tok + 999) // 1000, 1)


def test_tier_rollups_match_numpy_oracle(spark, tokens_df):
    tiers = tier_rollups(tokens_df, {"1m": 60, "1h": 3600})
    raw = {r.doc_id: np.array(r.tokens, dtype=np.float64) for r in tokens_df.collect()}
    for name, width in [("1m", 60), ("1h", 3600)]:
        rows = tiers[name].collect()
        seen: dict[str, set[int]] = {}
        for r in rows:
            v = raw[r.doc_id]
            seg = v[r.bucket * width : (r.bucket + 1) * width]
            assert r.vmin == seg.min(), (name, r.doc_id, r.bucket)
            assert r.vmax == seg.max()
            assert r.vcount == seg.size
            assert abs(r.vmean - seg.sum() / seg.size) < 1e-9
            seen.setdefault(r.doc_id, set()).add(r.bucket)
        for doc, v in raw.items():
            assert seen[doc] == set(range((v.size + width - 1) // width))


def test_rollup_events_matches_sql(spark):
    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    mine = rollup_events(events, tier="1h").orderBy("user_id", "bucket")
    events.createOrReplaceTempView("ev")
    ref = spark.sql(
        """
        SELECT user_id, floor(unix_timestamp(ts)/3600)*3600 AS bucket,
               min(value) vmin, max(value) vmax, avg(value) vmean, count(value) vcount
        FROM ev GROUP BY 1, 2 ORDER BY 1, 2
        """
    )
    assert mine.collect() == ref.collect()


def test_gapfill_locf_and_linear(spark):
    rows = [
        ("a", 0, 10.0),
        ("a", 60, 20.0),
        ("a", 240, 50.0),
        ("b", 60, 5.0),
    ]
    df = spark.createDataFrame(rows, "doc_id string, bucket long, v double")
    locf = {
        (r.doc_id, r.bucket): (r.v, r.gap_filled)
        for r in gapfill(df, ["doc_id"], 60, ["v"], "locf").collect()
    }
    assert locf[("a", 120)] == (20.0, True)
    assert locf[("a", 180)] == (20.0, True)
    assert locf[("a", 240)] == (50.0, False)
    assert locf[("b", 60)] == (5.0, False)
    lin = {
        (r.doc_id, r.bucket): r.v
        for r in gapfill(df, ["doc_id"], 60, ["v"], "linear").collect()
    }
    assert lin[("a", 120)] == pytest.approx(30.0)
    assert lin[("a", 180)] == pytest.approx(40.0)


def test_split_aged_partitions_tokens(spark, tokens_df):
    kept, aged = split_aged(tokens_df, 1000)
    k = {r.doc_id: r.tokens for r in kept.collect()}
    a = {r.doc_id: r.tokens for r in aged.collect()}
    orig = {r.doc_id: r.tokens for r in tokens_df.collect()}
    for doc, toks in orig.items():
        if len(toks) > 1000:
            assert a[doc] + k[doc] == toks
            assert len(k[doc]) == 1000
        else:
            assert k[doc] == toks and doc not in a


def test_prune_tier(spark):
    rows = [("a", b, 1.0, 1.0, 1.0, 1) for b in range(10)]
    df = spark.createDataFrame(
        rows, "doc_id string, bucket long, vmin double, vmax double, vmean double, vcount long"
    )
    out = prune_tier(df, 3).select("bucket").collect()
    assert sorted(r.bucket for r in out) == [7, 8, 9]


def test_lineage_resume(spark, tokens_df, tmp_path):
    from tersets_spark.operators.lineage import (
        read_done_buckets,
        run_with_lineage,
        with_partition_bucket,
    )

    out = str(tmp_path / "blocks")
    lin = str(tmp_path / "lineage")
    calls = []

    def process(df):
        calls.append(1)
        return compress_blocks(df.select("doc_id", "tokens"), Method.BitPackedDeltaEncoding)

    run_id = run_with_lineage(
        spark, tokens_df, process, out, lin, run_id="r1", n_buckets=8, buckets_per_batch=4
    )
    assert run_id == "r1"
    assert read_done_buckets(spark, lin, "r1") == set(range(8))
    n_blocks = spark.read.parquet(out).count()
    # resume: everything done -> no further processing
    calls.clear()
    run_with_lineage(
        spark, tokens_df, process, out, lin, run_id="r1", n_buckets=8, buckets_per_batch=4
    )
    assert not calls
    assert spark.read.parquet(out).count() == n_blocks
    # killed-run simulation: drop lineage rows for half the buckets ->
    # only those buckets replay, final state identical
    import shutil

    kept_rows = (
        spark.read.parquet(lin).filter(F.col("partition_id") < 4).collect()
    )
    shutil.rmtree(lin)
    from tersets_spark.operators.lineage import append_lineage

    append_lineage(spark, lin, [r.asDict() for r in kept_rows])
    run_with_lineage(
        spark, tokens_df, process, out, lin, run_id="r1", n_buckets=8, buckets_per_batch=4
    )
    assert read_done_buckets(spark, lin, "r1") == set(range(8))
    restored = reassemble(decompress_blocks(spark.read.parquet(out)))
    orig = {r.doc_id: r.tokens for r in tokens_df.collect()}
    for r in restored.collect():
        assert r.tokens == orig[r.doc_id]
