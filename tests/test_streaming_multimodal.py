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


def test_multimodal_real_backend_end_to_end(spark):
    """Real payloads (engine-encoded WAV/PPM/BMP/PPM-stream) decoded and
    embedded on executors through the Arrow batch path — the features
    must match a driver-side decode of the same bytes."""
    from tersets_spark.functions.media_codecs import real_features
    from tersets_spark.operators.multimodal import extract_features, synth_real_media

    media = synth_real_media(spark, 20)
    payloads = {r.media_id: bytes(r.payload) for r in media.collect()}
    feats = {
        r.media_id: r.feature
        for r in extract_features(media, decode_backend="real").collect()
    }
    assert feats.keys() == payloads.keys() and len(feats) == 20
    kinds = {r.media_id: r.kind for r in media.collect()}
    assert {"image", "audio", "video"} <= set(kinds.values())
    for mid, payload in payloads.items():
        expected = real_features(payload)
        assert np.allclose(np.array(feats[mid], dtype=np.float32), expected)


def test_multimodal_real_backend_on_error_null(spark):
    """A corrupt payload yields a null feature + err message instead of
    killing the stage (the 100-TB mode)."""
    from pyspark.sql import functions as SF

    from tersets_spark.operators.multimodal import extract_features, synth_real_media

    media = synth_real_media(spark, 8).withColumn(
        "payload",
        SF.when(SF.col("media_id") == "m_00000003", SF.lit(b"garbage")).otherwise(
            SF.col("payload")
        ),
    )
    out = extract_features(media, decode_backend="real", on_error="null").collect()
    by_id = {r.media_id: r for r in out}
    assert by_id["m_00000003"].feature is None
    assert "unrecognized" in by_id["m_00000003"].err
    ok = [r for r in out if r.media_id != "m_00000003"]
    assert all(r.feature is not None and r.err is None for r in ok)
    # raise mode propagates
    with pytest.raises(Exception):
        extract_features(media, decode_backend="real", on_error="raise").collect()


def test_frame_sample_plan(spark):
    from tersets_spark.operators.multimodal import frame_sample_plan, synth_media

    media = synth_media(spark, 30)
    plan = frame_sample_plan(media, every_ms=5000)
    rows = plan.groupBy("media_id").agg(F.count("*").alias("n")).collect()
    vids = {r.media_id: r.duration_ms for r in media.filter("kind='video'").collect()}
    assert {r.media_id for r in rows} == set(vids)
    for r in rows:
        assert r.n == max(vids[r.media_id] - 1, 0) // 5000 + 1


def test_resize_media_real_end_to_end(spark):
    """Box-average resize over real payloads: dims halve, the frame-set
    mean survives the box average (float64 rounding only), the output
    payload is a decodable PPM stream with the resized dims, and audio
    rows isolate into err under on_error='null'."""
    from tersets_spark.functions.media_codecs import decode_frames
    from tersets_spark.operators.multimodal import resize_media, synth_real_media

    media = synth_real_media(spark, 16)
    rows = resize_media(media, factor=2, on_error="null").collect()
    assert len(rows) == 16
    for r in rows:
        if r.kind == "audio":
            assert r.err is not None and r.payload is None
            continue
        assert r.err is None, r.err
        assert r.out_w * 2 == r.in_w and r.out_h * 2 == r.in_h
        assert abs(r.mean_in - r.mean_out) < 1e-6
        frames = decode_frames(bytes(r.payload))
        assert len(frames) == r.n_frames
        assert frames[0].shape[:2] == (r.out_h, r.out_w)


def test_resize_media_error_paths(spark):
    from pyspark.sql import functions as SF

    from tersets_spark.operators.multimodal import resize_media, synth_real_media

    media = synth_real_media(spark, 4)
    # factor that does not divide the 16x16 BMP image -> per-row err
    rows = resize_media(
        media.filter(SF.col("kind") == "image"), factor=5, on_error="null"
    ).collect()
    # neither 24x32 nor 16x16 divides by 5 -> every image row errors
    assert rows and all(r.err is not None and "divisible" in r.err for r in rows)
    # raise mode propagates (audio has no frames)
    import pytest as _pytest

    with _pytest.raises(Exception):
        resize_media(
            media.filter(SF.col("kind") == "audio"), factor=2, on_error="raise"
        ).collect()
    with _pytest.raises(ValueError):
        resize_media(media, factor=0)
    with _pytest.raises(ValueError):
        resize_media(media, factor=2, on_error="bogus")


def test_resample_audio_real_end_to_end(spark):
    """Box-average audio decimation over real WAV payloads: sample
    counts divide exactly, the normalized mean survives the window
    average, the output payload decodes at the divided rate, and
    image/video rows isolate into err under on_error='null'."""
    from pyspark.sql import functions as SF

    from tersets_spark.functions.media_codecs import decode_wav
    from tersets_spark.operators.multimodal import resample_audio, synth_real_media

    media = synth_real_media(spark, 16)
    rows = resample_audio(media, factor=4, on_error="null").collect()
    assert len(rows) == 16
    for r in rows:
        if r.kind != "audio":
            assert r.err is not None and r.payload is None
            continue
        assert r.err is None, r.err
        assert r.n_out * 4 == r.n_in and r.out_rate * 4 == r.in_rate
        assert abs(r.mean_in - r.mean_out) < 1e-9
        samples, sr = decode_wav(bytes(r.payload))
        assert samples.shape[0] == r.n_out and sr == r.out_rate
    # non-divisible factor -> per-row err (800 samples, factor 7)
    audio = media.filter(SF.col("kind") == "audio")
    bad = resample_audio(audio, factor=7, on_error="null").collect()
    assert bad and all(b.err is not None and "divisible" in b.err for b in bad)
    import pytest as _pytest

    with _pytest.raises(ValueError):
        resample_audio(audio, factor=0)
