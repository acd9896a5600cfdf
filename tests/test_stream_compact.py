"""Streaming stateful compaction (applyInPandasWithState): chunk
boundaries and blob bytes must match the batch compress path exactly,
with fragments of one doc arriving across micro-batches."""

from __future__ import annotations

import os
import time

import numpy as np
from pyspark.sql import functions as F

from tersets_spark import Method, decompress
from tersets_spark.streaming.compact_stream import stream_compact

CHUNK = 64  # small chunk so multi-block docs arise from tiny test data


def _write_batch(spark, path: str, rows, mtime: float):
    df = spark.createDataFrame(
        rows, "doc_id string, seq long, tokens array<int>, flush boolean"
    )
    df.coalesce(1).write.mode("overwrite").parquet(path)
    # file-source ordering is (modificationTime, path): pin distinct
    # mtimes so micro-batch order == logical fragment order
    for root, _d, files in os.walk(path):
        for f in files:
            os.utime(os.path.join(root, f), (mtime, mtime))


def test_stream_compact_matches_batch_blocks(spark, tmp_path):
    rng = np.random.default_rng(5)
    docs = {
        "a": rng.integers(0, 1000, 150).tolist(),  # 3 blocks: 64+64+22
        "b": rng.integers(0, 1000, 64).tolist(),  # exactly one block
        "c": rng.integers(0, 1000, 10).tolist(),  # tail-only
    }
    src = str(tmp_path / "src")
    os.makedirs(src)
    now = time.time()
    # fragment each doc across two micro-batches + a flush-only record
    _write_batch(
        spark,
        os.path.join(src, "b0"),
        [(d, 0, toks[: len(toks) // 2], False) for d, toks in docs.items()],
        now - 20,
    )
    _write_batch(
        spark,
        os.path.join(src, "b1"),
        [(d, 1, toks[len(toks) // 2 :], False) for d, toks in docs.items()],
        now - 10,
    )
    _write_batch(
        spark,
        os.path.join(src, "b2"),
        [(d, 2, None, True) for d in docs],
        now,
    )
    stream = (
        spark.readStream.schema(
            "doc_id string, seq long, tokens array<int>, flush boolean"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(os.path.join(src, "*"))
    )
    out = stream_compact(
        stream, chunk=CHUNK, method=Method.BitPackedDeltaEncoding, timeout_ms=None
    )
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("t_stream_compact")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    rows = spark.sql("SELECT * FROM t_stream_compact").collect()
    by_doc: dict[str, list] = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert set(by_doc) == set(docs)
    for d, toks in docs.items():
        blocks = sorted(by_doc[d], key=lambda r: r.chunk_id)
        # deterministic batch-identical boundaries
        assert [b.chunk_id for b in blocks] == list(range(len(blocks)))
        assert [b.first_pos for b in blocks] == [i * CHUNK for i in range(len(blocks))]
        assert sum(b.n_values for b in blocks) == len(toks)
        restored = np.concatenate(
            [decompress(bytes(b.blob)) for b in blocks]
        ).astype(int)
        assert restored.tolist() == toks
        # full blocks must be byte-identical to the batch encoder
        from tersets_spark import compress

        for i, b in enumerate(blocks):
            seg = np.asarray(
                toks[i * CHUNK : i * CHUNK + b.n_values], dtype=np.float64
            )
            assert bytes(b.blob) == compress(seg, Method.BitPackedDeltaEncoding)


def test_stream_compact_multichunk_group_ordering(spark, tmp_path):
    """Regression: a group split across MULTIPLE Arrow chunks within one
    micro-batch (maxRecordsPerBatch below the group size) must still
    assemble fragments in seq order — the per-chunk sort alone
    interleaved them."""
    prev = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", None)
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "2")
    try:
        toks = list(range(100))
        frags = [
            ("a", i, toks[i * 10 : (i + 1) * 10], False) for i in range(10)
        ] + [("a", 10, None, True)]
        src = str(tmp_path / "src_mc")
        os.makedirs(src)
        _write_batch(spark, os.path.join(src, "b0"), frags, time.time())
        stream = (
            spark.readStream.schema(
                "doc_id string, seq long, tokens array<int>, flush boolean"
            )
            .parquet(os.path.join(src, "*"))
        )
        out = stream_compact(
            stream, chunk=CHUNK, method=Method.BitPackedDeltaEncoding, timeout_ms=None
        )
        q = (
            out.writeStream.outputMode("append")
            .format("memory")
            .queryName("t_stream_compact_mc")
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        rows = sorted(
            spark.sql("SELECT * FROM t_stream_compact_mc").collect(),
            key=lambda r: r.chunk_id,
        )
        restored = np.concatenate([decompress(bytes(r.blob)) for r in rows]).astype(int)
        assert restored.tolist() == toks
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.execution.arrow.maxRecordsPerBatch")
        else:
            spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", prev)


def test_stream_dedup_first_wins(spark, tmp_path):
    """Keyed stateful streaming dedup: first micro-batch arrival wins;
    a duplicate WITHIN one batch resolves to the min doc_id; later
    arrivals of a seen hash emit nothing."""
    import os
    import time
    import uuid

    from tersets_spark.streaming.dedup_stream import stream_dedup_exact

    schema = "doc_id long, text string"
    batches = [
        [(7, "alpha"), (3, "alpha"), (10, "beta")],   # in-batch dup: min=3
        [(1, "alpha"), (11, "gamma")],                # late dup of alpha
        [(12, "beta"), (13, "delta")],                # late dup of beta
    ]
    now = time.time()
    for i, rows in enumerate(batches):
        p = str(tmp_path / f"b{i}")
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(p)
        for root, _d, files in os.walk(p):
            for f in files:
                os.utime(os.path.join(root, f), (now - 20 + 10 * i,) * 2)
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(tmp_path / "*"))
    )
    qname = "t_dedup_" + uuid.uuid4().hex[:8]
    q = (
        stream_dedup_exact(stream)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName(qname)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {r.doc_id for r in spark.sql(f"SELECT doc_id FROM {qname}").collect()}
    assert got == {3, 10, 11, 13}
