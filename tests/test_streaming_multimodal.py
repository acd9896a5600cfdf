"""Streaming rollup parity with the batch path + multimodal plumbing."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F


def test_stream_rollup_matches_batch(spark, tmp_path):
    from tersets_spark.operators.rollup import rollup_events
    from tersets_spark.streaming.rollup_stream import run_stream_to_memory

    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    src = str(tmp_path / "stream_src")
    events.write.parquet(src)
    streamed = run_stream_to_memory(
        spark, src, events.schema, tier="1h", name="t_stream_roll"
    ).orderBy("user_id", "bucket")
    batch = rollup_events(events, tier="1h").orderBy("user_id", "bucket")
    srows = [(r.user_id, r.bucket, r.vmin, r.vmax, round(r.vmean, 9), r.vcount) for r in streamed.collect()]
    brows = [(r.user_id, r.bucket, r.vmin, r.vmax, round(r.vmean, 9), r.vcount) for r in batch.collect()]
    assert srows == brows


def test_multimodal_features_deterministic(spark):
    from tersets_spark.operators.multimodal import extract_features, synth_media

    media = synth_media(spark, 30)
    f1 = {r.media_id: r.feature for r in extract_features(media).collect()}
    f2 = {r.media_id: r.feature for r in extract_features(media).collect()}
    assert f1.keys() == f2.keys() and len(f1) == 30
    for k in f1:
        assert f1[k] == f2[k]
        assert abs(float(np.linalg.norm(f1[k])) - 1.0) < 1e-5


def test_multimodal_real_backend_stubbed(spark):
    from tersets_spark.operators.multimodal import extract_features, synth_media

    with pytest.raises(NotImplementedError):
        extract_features(synth_media(spark, 2), decode_backend="real")


def test_frame_sample_plan(spark):
    from tersets_spark.operators.multimodal import frame_sample_plan, synth_media

    media = synth_media(spark, 30)
    plan = frame_sample_plan(media, every_ms=5000)
    rows = plan.groupBy("media_id").agg(F.count("*").alias("n")).collect()
    vids = {r.media_id: r.duration_ms for r in media.filter("kind='video'").collect()}
    assert {r.media_id for r in rows} == set(vids)
    for r in rows:
        assert r.n == max(vids[r.media_id] - 1, 0) // 5000 + 1
