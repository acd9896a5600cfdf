"""Fused single-pass operator: compress + round-trip verify + base-tier
rollup partials in ONE Arrow crossing.

Scale rationale: at 10^12 sequences the dominant cost is moving token
arrays into Python workers. The separate operators each pay that
transfer (compress pass, rollup pass) and a naive verify pays it twice
more (decompress + reassembly shuffle). This kernel reads each chunk
once and emits everything derived from it:

  (doc_id, chunk_id, first_pos, n_values, blob, bytes, roundtrip_ok,
   bucket0, bmin[], bmax[], bsum[], bcount[])

* ``roundtrip_ok`` verifies decompress(compress(chunk)) == chunk
  in-kernel — no decode job, no reassembly shuffle. Chunk-exact implies
  doc-exact because chunk boundaries are deterministic.
* the rollup partial arrays cover the global base-tier buckets touched
  by the chunk (buckets straddling chunk boundaries yield two partials
  merged exactly by the downstream groupBy since min/max/sum/count are
  all reassociable).
* downstream: blocks table = projection; base rollup = JVM-side explode
  + groupBy; coarser tiers re-aggregate the base (operators.rollup).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..kernels import registry
from ..methods import Method
from .compress import CHUNK, chunk_tokens

FUSED_SCHEMA = (
    "doc_id string, chunk_id int, first_pos long, n_values int, "
    "blob binary, bytes int, roundtrip_ok boolean, bucket0 long, "
    "bmin array<double>, bmax array<double>, bsum array<double>, "
    "bcount array<long>"
)


def fused_compress_rollup(
    df: DataFrame,
    method: Method = Method.BitPackedDeltaEncoding,
    config: dict | None = None,
    chunk: int = CHUNK,
    base_width: int = 60,
) -> DataFrame:
    """One pass over ``(doc_id, tokens)``: returns the FUSED_SCHEMA
    DataFrame. Persist it if you consume more than one branch."""
    method_code = int(method)
    cfg = dict(config or {})

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        m = Method(method_code)
        for pdf in batches:
            n = len(pdf)
            if not n:
                continue
            blobs, oks, bmins, bmaxs, bsums, bcounts, b0s = [], [], [], [], [], [], []
            firsts = pdf["first_pos"].to_numpy()
            for toks, first in zip(pdf["chunk_tokens"], firsts):
                v = np.asarray(toks, dtype=np.float64)
                if v.size == 0:
                    blobs.append(b"")
                    oks.append(True)
                    b0s.append(0)
                    empty = np.empty(0, dtype=np.float64)
                    bmins.append(empty)
                    bmaxs.append(empty)
                    bsums.append(empty)
                    bcounts.append(np.empty(0, dtype=np.int64))
                    continue
                blob = registry.compress(v, m, cfg)
                out = registry.decompress(blob)
                oks.append(out.size == v.size and bool(np.array_equal(out, v)))
                blobs.append(blob)
                # global-bucket-aligned partials for this chunk
                first = int(first)
                b0 = first // base_width
                # boundaries at global bucket edges within [first, first+len)
                edges = np.arange(
                    (b0 + 1) * base_width - first, v.size, base_width, dtype=np.int64
                )
                starts = np.concatenate(([0], edges))
                bmins.append(np.minimum.reduceat(v, starts))
                bmaxs.append(np.maximum.reduceat(v, starts))
                bsums.append(np.add.reduceat(v, starts))
                bcounts.append(np.diff(np.append(starts, v.size)))
                b0s.append(b0)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "chunk_id": pdf["chunk_id"].astype("int32"),
                    "first_pos": pdf["first_pos"].astype("int64"),
                    "n_values": pdf["n_values"].astype("int32"),
                    "blob": blobs,
                    "bytes": np.asarray([len(b) for b in blobs], dtype=np.int32),
                    "roundtrip_ok": oks,
                    "bucket0": np.asarray(b0s, dtype=np.int64),
                    "bmin": bmins,
                    "bmax": bmaxs,
                    "bsum": bsums,
                    "bcount": bcounts,
                }
            )

    chunked = chunk_tokens(df, chunk).select(
        "doc_id", "chunk_id", "first_pos", "chunk_tokens", "n_values"
    )
    return chunked.mapInPandas(kernel, schema=FUSED_SCHEMA)


def base_rollup_from_fused(fused: DataFrame) -> DataFrame:
    """Merge the chunk partials into the base-tier rollup:
    (doc_id, bucket, vmin, vmax, vsum, vcount) — exact across chunk
    boundaries."""
    exploded = fused.select(
        "doc_id",
        F.posexplode(F.arrays_zip("bmin", "bmax", "bsum", "bcount")).alias("i", "z"),
        "bucket0",
    ).select(
        "doc_id",
        (F.col("bucket0") + F.col("i")).alias("bucket"),
        F.col("z.bmin").alias("pmin"),
        F.col("z.bmax").alias("pmax"),
        F.col("z.bsum").alias("psum"),
        F.col("z.bcount").alias("pcount"),
    )
    return exploded.groupBy("doc_id", "bucket").agg(
        F.min("pmin").alias("vmin"),
        F.max("pmax").alias("vmax"),
        F.sum("psum").alias("vsum"),
        F.sum("pcount").alias("vcount"),
    )


def tier_rollups_fused(
    fused: DataFrame, widths: tuple[int, int, int] = (60, 3600, 86400)
) -> DataFrame:
    """All three tiers in ONE shuffle via ROLLUP grouping sets.

    The chunk partials explode to base buckets, then
    ``rollup(doc_id, b_coarse, b_mid, b_fine)`` aggregates every tier
    level in a single exchange (map-side partial agg collapses each
    grouping set before the shuffle). Output: ``tier`` in
    {'1m','1h','1d'} + (doc_id, bucket, vmin, vmax, vsum, vcount);
    the per-doc and grand-total grouping levels are filtered out."""
    w1, w2, w3 = widths
    exploded = fused.select(
        "doc_id",
        F.posexplode(F.arrays_zip("bmin", "bmax", "bsum", "bcount")).alias("i", "z"),
        "bucket0",
    ).select(
        "doc_id",
        (F.col("bucket0") + F.col("i")).alias("b_fine"),
        F.col("z.bmin").alias("pmin"),
        F.col("z.bmax").alias("pmax"),
        F.col("z.bsum").alias("psum"),
        F.col("z.bcount").alias("pcount"),
    )
    lv = exploded.withColumn("b_mid", F.floor(F.col("b_fine") / (w2 // w1))).withColumn(
        "b_coarse", F.floor(F.col("b_fine") / (w3 // w1))
    )
    agged = (
        lv.rollup("doc_id", "b_coarse", "b_mid", "b_fine")
        .agg(
            F.min("pmin").alias("vmin"),
            F.max("pmax").alias("vmax"),
            F.sum("psum").alias("vsum"),
            F.sum("pcount").alias("vcount"),
            F.grouping_id().alias("gid"),
        )
    )
    return agged.filter(F.col("gid") <= 3).select(
        F.when(F.col("gid") == 0, F.lit("1m"))
        .when(F.col("gid") == 1, F.lit("1h"))
        .otherwise(F.lit("1d"))
        .alias("tier"),
        "doc_id",
        F.coalesce(
            F.when(F.col("gid") == 0, F.col("b_fine")),
            F.when(F.col("gid") == 1, F.col("b_mid")),
            F.col("b_coarse"),
        ).alias("bucket"),
        "vmin",
        "vmax",
        "vsum",
        "vcount",
    )


def blocks_from_fused(fused: DataFrame, method: Method) -> DataFrame:
    return fused.select(
        "doc_id",
        "chunk_id",
        F.lit(int(method)).cast("tinyint").alias("method"),
        "blob",
        "n_values",
        "first_pos",
        "bytes",
    )
