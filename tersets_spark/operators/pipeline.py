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
import pyarrow as pa
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
    DataFrame. Persist it if you consume more than one branch.

    Implemented with ``mapInArrow`` and flat-buffer access: the Arrow
    ListArray's values buffer converts to ONE numpy array per batch
    (zero-copy), per-doc/per-chunk views are numpy slices, and the
    rollup partials come from batched ``reduceat`` over the flat buffer
    — the Arrow->pandas list-column conversion (measured at >50% of the
    pass) is skipped entirely. Chunking happens in-kernel at the same
    deterministic CHUNK boundaries as operators.compress."""
    method_code = int(method)
    cfg = dict(config or {})

    def kernel(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        m = Method(method_code)
        for batch in batches:
            nrows = batch.num_rows
            if not nrows:
                continue
            doc_col = batch.column(0)
            tok_col = batch.column(1)
            lens = np.asarray(
                pa.compute.list_value_length(tok_col).to_numpy(zero_copy_only=False),
                dtype=np.int64,
            )
            flat = tok_col.flatten().to_numpy(zero_copy_only=False)
            fflat = flat.astype(np.float64)
            row_off = np.concatenate(([0], np.cumsum(lens)))
            # --- rollup partials for the whole batch in 3 reduceats ---
            n_buckets = np.maximum((lens + base_width - 1) // base_width, 0)
            intra = (
                np.arange(int(n_buckets.sum()), dtype=np.int64)
                - np.repeat(np.cumsum(n_buckets) - n_buckets, n_buckets)
            )
            bstarts = np.repeat(row_off[:-1], n_buckets) + intra * base_width
            if bstarts.size:
                pmin = np.minimum.reduceat(fflat, bstarts)
                pmax = np.maximum.reduceat(fflat, bstarts)
                psum = np.add.reduceat(fflat, bstarts)
                bends = np.minimum(
                    bstarts + base_width, np.repeat(row_off[1:], n_buckets)
                )
                pcount = bends - bstarts
            else:
                pmin = pmax = psum = np.empty(0, dtype=np.float64)
                pcount = np.empty(0, dtype=np.int64)
            part_off = np.concatenate(([0], np.cumsum(n_buckets)))
            # --- per-chunk compression + in-kernel round-trip verify ---
            n_chunks = np.maximum((lens + chunk - 1) // chunk, 1)
            intra_c = (
                np.arange(int(n_chunks.sum()), dtype=np.int64)
                - np.repeat(np.cumsum(n_chunks) - n_chunks, n_chunks)
            )
            rows_of_chunk = np.repeat(np.arange(nrows), n_chunks)
            c_starts = row_off[:-1][rows_of_chunk] + intra_c * chunk
            c_ends = np.minimum(c_starts + chunk, row_off[1:][rows_of_chunk])
            chunk_off = np.concatenate((c_starts, [fflat.size]))
            if m in (Method.BitPackedDeltaEncoding, Method.Chimp64) and not cfg:
                from ..kernels.batch import compress_batch, decompress_batch

                blobs = compress_batch(fflat, chunk_off, m)
                rt_flat, rt_off = decompress_batch(blobs)
                eq = (
                    rt_flat.view(np.uint64) == fflat.view(np.uint64)
                    if rt_flat.size == fflat.size
                    else np.zeros(1, dtype=bool)
                )
                if rt_flat.size == fflat.size and eq.size:
                    safe = np.minimum(c_starts, max(eq.size - 1, 0))
                    oks_arr = np.minimum.reduceat(eq, safe) | (c_ends == c_starts)
                else:
                    oks_arr = np.zeros(c_starts.size, dtype=bool)
                oks = oks_arr.tolist()
            else:
                blobs, oks = [], []
                for s, e in zip(c_starts, c_ends):
                    v = fflat[s:e]
                    blob = registry.compress(v, m, cfg)
                    out = registry.decompress(blob)
                    oks.append(out.size == v.size and bool(np.array_equal(out, v)))
                    blobs.append(blob)
            doc_ids = doc_col.take(pa.array(rows_of_chunk))
            chunk_ids = intra_c
            first_pos = intra_c * chunk
            n_values = c_ends - c_starts
            n_out = len(blobs)
            rows_arr = rows_of_chunk
            # partials ride on chunk 0 of each row; other chunks carry
            # empty lists (a doc is never split across input rows)
            is_first = chunk_ids == 0
            out_counts = np.where(is_first, n_buckets[rows_arr], 0)
            out_off = np.concatenate(([0], np.cumsum(out_counts))).astype(np.int64)
            from ..kernels.bitstream import segment_intra_indices

            take = np.repeat(part_off[:-1][rows_arr], out_counts) + (
                segment_intra_indices(out_counts)
            )
            yield pa.RecordBatch.from_arrays(
                [
                    doc_ids,
                    pa.array(chunk_ids.astype(np.int32)),
                    pa.array(first_pos.astype(np.int64)),
                    pa.array(n_values.astype(np.int32)),
                    pa.array(blobs, type=pa.binary()),
                    pa.array([len(b) for b in blobs], type=pa.int32()),
                    pa.array(oks, type=pa.bool_()),
                    # partials are doc-local (start at position 0), so the
                    # carrying row's bucket0 is always 0
                    pa.array(np.zeros(n_out, dtype=np.int64)),
                    pa.ListArray.from_arrays(out_off, pa.array(pmin[take], type=pa.float64())),
                    pa.ListArray.from_arrays(out_off, pa.array(pmax[take], type=pa.float64())),
                    pa.ListArray.from_arrays(out_off, pa.array(psum[take], type=pa.float64())),
                    pa.ListArray.from_arrays(out_off, pa.array(pcount[take], type=pa.int64())),
                ],
                names=[
                    "doc_id",
                    "chunk_id",
                    "first_pos",
                    "n_values",
                    "blob",
                    "bytes",
                    "roundtrip_ok",
                    "bucket0",
                    "bmin",
                    "bmax",
                    "bsum",
                    "bcount",
                ],
            )

    return df.select("doc_id", "tokens").mapInArrow(kernel, schema=FUSED_SCHEMA)


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


def flagship_summary(
    fused: DataFrame, widths: tuple[int, int, int] = (60, 3600, 86400)
) -> DataFrame:
    """ONE-action flagship: tier row counts + verify/bytes totals from a
    single job. The chunk-level scalars (ok, bytes) ride the explode on
    the first partial row only, so the ROLLUP's aggregates stay exact;
    the grand-total grouping row carries the global verification verdict
    and compressed size; tier levels carry row counts."""
    w1, w2, w3 = widths
    # posexplode_OUTER: non-first chunks carry no partials but must still
    # contribute their verify flag and byte count (one null-bucket row)
    exploded = fused.select(
        "doc_id",
        F.posexplode_outer(F.arrays_zip("bmin", "bmax", "bsum", "bcount")).alias(
            "i", "z"
        ),
        "bucket0",
        "bytes",
        "n_values",
        F.col("roundtrip_ok").cast("int").alias("ok_int"),
    ).select(
        "doc_id",
        (F.col("bucket0") + F.col("i")).alias("b_fine"),
        F.col("z.bmin").alias("pmin"),
        F.col("z.bmax").alias("pmax"),
        F.col("z.bsum").alias("psum"),
        F.col("z.bcount").alias("pcount"),
        F.when((F.col("i") == 0) | F.col("i").isNull(), F.col("bytes"))
        .otherwise(0)
        .alias("bytes0"),
        F.when((F.col("i") == 0) | F.col("i").isNull(), F.col("n_values"))
        .otherwise(0)
        .alias("nv0"),
        "ok_int",
    )
    lv = exploded.withColumn("b_mid", F.floor(F.col("b_fine") / (w2 // w1))).withColumn(
        "b_coarse", F.floor(F.col("b_fine") / (w3 // w1))
    )
    agged = lv.rollup("doc_id", "b_coarse", "b_mid", "b_fine").agg(
        F.grouping_id().alias("gid"),
        F.sum("pcount").alias("vcount"),
        F.sum("bytes0").alias("bytes"),
        F.sum("nv0").alias("n_values"),
        F.min("ok_int").alias("all_ok"),
    )
    return agged.filter((F.col("gid") <= 3) | (F.col("gid") == 15)).groupBy("gid").agg(
        F.sum(F.when(F.col("vcount").isNotNull(), 1).otherwise(0)).alias("rows"),
        F.min("all_ok").alias("all_ok"),
        F.sum("bytes").alias("bytes"),
        F.sum("n_values").alias("n_values"),
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
