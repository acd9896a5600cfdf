"""Streaming fuzzy (near-duplicate) deduplication — incremental
MinHash-LSH dedup of an unbounded document stream via ``foreachBatch``
against a persistent survivor store.

Why this is NOT ``applyInPandasWithState`` (the exact-dedup design,
dedup_stream.py): exact dedup has ONE state key per doc (the content
hash), so first-wins is a single keyed reduction. A near-dup doc spans
``bands`` LSH keys, and the keep/drop decision is global across all of
them (drop iff ANY band matches an earlier survivor that Jaccard-
verifies), after which the survivor's signature must be inserted into
ALL its band buckets atomically — a cross-key transaction that keyed
per-partition state cannot express (two chained stateful stages cannot
see each other's in-flight updates within a micro-batch). The standard
production design is what this module implements: ``foreachBatch``
resolves each micro-batch with the full BATCH operator stack, then
joins the batch's survivors against an append-only store of earlier
survivors (texts + LSH bucket index) and keeps only docs that verify
against no earlier survivor.

Semantics (retraction-free, append-only — document carefully):

- A whole corpus fed as ONE batch reproduces
  :func:`~tersets_spark.operators.dedup.fuzzy_dedup_pipeline` exactly
  (the in-batch stage IS that pipeline).
- Across batches the guarantee is GREEDY ARRIVAL-ORDER maximal
  independent set: no emitted survivor Jaccard-verifies (>= threshold)
  against any earlier-batch survivor; within one batch, full
  connected-component semantics apply.
- Divergence from a global batch run, pinned by test: transitive
  chains THROUGH a dropped doc across batch boundaries are broken.
  If batch 1 keeps A, batch 2 drops B (near-dup of A), and batch 3
  brings C with jaccard(C,B) >= t but jaccard(C,A) < t, then C
  SURVIVES here while a global batch CC run over {A,B,C} would keep
  only A. This is fundamental to streaming: an exact incremental CC
  would need the new edge (B,C) to merge clusters and retract the
  already-emitted survivor decision, and an append-only output cannot
  retract. (Batch re-resolution over the survivor store is the
  periodic-compaction answer if chain-exact groups are required.)

Scale notes (100 TB stream): per micro-batch cost is the in-batch
pipeline (near-linear in batch size — capped LSH join, pair-restricted
verify, join-free CC) plus one equi-join of the batch's band buckets
against the store index on (band, bucket) — candidate volume is
near-linear in true cross-batch duplicates. The store only grows with
SURVIVORS (near-dups are never inserted), so a bucket's population is
bounded by distinct non-duplicate content sharing a 60-bit band
bucket; ``verify_cap`` bounds the per-doc verify fan-out against
adversarial boilerplate regardless. Writes are partitioned by
micro-batch id and use dynamic partition overwrite, so a replayed
batch (foreachBatch's at-least-once contract) rewrites its own
partition instead of duplicating rows — idempotent without a
transactional table format (swap the store for Delta/Iceberg in
production for snapshot isolation between concurrent readers).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.utils import AnalysisException
from pyspark.sql.window import Window

from tersets_spark.operators.dedup import (
    _band_buckets_batch,
    _banded_auditable,
    fuzzy_dedup_pipeline,
    ngram_jaccard_pairs,
)

__all__ = [
    "process_fuzzy_batch",
    "fuzzy_dedup_stream",
    "read_decisions",
    "recompact_fuzzy_store",
]


def _banded(
    docs: DataFrame,
    k_shingle: int,
    n_hashes: int,
    bands: int,
    seed: int,
    signature: str = "fast",
) -> DataFrame:
    """(doc_id, band, bucket) LSH index rows for ``docs`` — the same
    signature path the batch LSH join uses (``signature`` selects the
    numpy rolling-hash default or the SQL-replayable md5 path), so
    store lookups are bit-compatible with in-batch candidate
    generation."""
    if signature == "auditable":
        return _banded_auditable(
            docs, text_col="text", id_col="doc_id",
            k_shingle=k_shingle, n_hashes=n_hashes, bands=bands,
        ).withColumnRenamed("_id", "doc_id")

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def band_buckets(texts: pd.Series) -> pd.Series:
        return _band_buckets_batch(texts, k_shingle, n_hashes, bands, seed)

    return docs.select(
        "doc_id", band_buckets(F.col("text")).alias("_bb")
    ).select("doc_id", F.posexplode("_bb").alias("band", "bucket"))


def _read_store(spark: SparkSession, path: str) -> DataFrame | None:
    try:
        return spark.read.option("basePath", path).parquet(path)
    except AnalysisException:
        return None  # store empty: first batch (or no partition yet)


def _overwrite_partition(df: DataFrame, root: str, batch_id: int) -> None:
    # Deterministic per-batch partition path: a foreachBatch replay of
    # the same batch_id overwrites its own output (idempotence).
    df.write.mode("overwrite").parquet(f"{root}/batch={int(batch_id)}")


def process_fuzzy_batch(
    batch_df: DataFrame,
    store_path: str,
    batch_id: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    k_shingle: int = 5,
    threshold: float = 0.5,
    n_hashes: int = 30,
    bands: int = 5,
    bucket_cap: int | None = 1024,
    verify_cap: int = 256,
    seed: int = 42,
    signature: str = "fast",
    keep_dropped_texts: bool = False,
) -> None:
    """Resolve ONE micro-batch against the survivor store (see module
    docstring for semantics). Writes three partitioned outputs under
    ``store_path``: ``survivors/`` (doc_id, text), ``buckets/`` the LSH
    index rows of new survivors, and ``decisions/`` one row per input
    doc — (doc_id, status in {'survivor','dup_in_batch','dup_of_earlier'},
    matched = the earlier survivor id or null).

    ``keep_dropped_texts=True`` additionally writes ``dropped/``
    (doc_id, text of this batch's non-survivors) so
    :func:`recompact_fuzzy_store` can restore chain-exact groups without
    a replayable corpus — opt-in because it makes the store grow with
    ALL docs instead of survivors only.

    Callable directly (unit tests / backfill drivers) or through
    :func:`fuzzy_dedup_stream`. Doc ids must be globally unique across
    the stream (standard for ingestion ids)."""
    spark = batch_df.sparkSession
    docs = batch_df.select(
        F.col(id_col).cast("long").alias("doc_id"), F.col(text_col).alias("text")
    )

    # 1) in-batch resolution: the full production batch flow.
    clusters = fuzzy_dedup_pipeline(
        docs,
        text_col="text",
        id_col="doc_id",
        k_shingle=k_shingle,
        threshold=threshold,
        n_hashes=n_hashes,
        bands=bands,
        bucket_cap=bucket_cap,
        signature=signature,
    )
    dropped_in_batch = clusters.filter(~F.col("is_survivor")).select("doc_id")
    batch_survivors = docs.join(dropped_in_batch, "doc_id", "left_anti")

    # 2) cross-batch: batch survivors' band buckets vs the store index.
    banded = _banded(
        batch_survivors, k_shingle, n_hashes, bands, seed, signature
    ).persist()
    banded.count()  # materialize: read twice (history join + store append)
    # The store view is STRICTLY EARLIER batches: a foreachBatch replay
    # of batch_id must not see its own first attempt's partitions (the
    # batch's docs would self-match and be dropped), nor leftovers of a
    # crashed later batch. batch ids are monotone in a stream, so
    # `batch < batch_id` is exactly "committed history".
    store_buckets = _read_store(spark, f"{store_path}/buckets")
    if store_buckets is not None:
        store_buckets = store_buckets.filter(F.col("batch") < int(batch_id))
    # survivors are always written before buckets, but the stores can
    # diverge under retention / manual cleanup — treat a missing
    # survivors store like a missing bucket index: no committed history.
    old_texts = _read_store(spark, f"{store_path}/survivors")
    matched = None
    if store_buckets is not None and old_texts is not None:
        cand = (
            banded.alias("n")
            .join(
                store_buckets.select(
                    F.col("doc_id").alias("old_id"), "band", "bucket"
                ).alias("o"),
                ["band", "bucket"],
            )
            .select(F.col("old_id").alias("id_a"), F.col("n.doc_id").alias("id_b"))
            .distinct()
        )
        # bound the verify fan-out per new doc; earliest survivors first
        # (deterministic under replay).
        cand = (
            cand.withColumn(
                "_rk",
                F.row_number().over(Window.partitionBy("id_b").orderBy("id_a")),
            )
            .filter(F.col("_rk") <= verify_cap)
            .drop("_rk")
        )
        texts = batch_survivors.unionByName(
            old_texts.filter(F.col("batch") < int(batch_id))
            .select("doc_id", "text")
        )
        verified = ngram_jaccard_pairs(
            texts, cand, text_col="text", id_col="doc_id",
            k_shingle=k_shingle, threshold=threshold,
        )
        # keep the earliest verified survivor as the recorded match
        matched = verified.groupBy(F.col("id_b").alias("doc_id")).agg(
            F.min("id_a").alias("matched")
        )

    if matched is not None:
        new_survivors = batch_survivors.join(
            matched.select("doc_id"), "doc_id", "left_anti"
        )
    else:
        new_survivors = batch_survivors

    decisions = (
        docs.select("doc_id")
        .join(dropped_in_batch.withColumn("_ib", F.lit(True)), "doc_id", "left")
        .join(matched if matched is not None
              else spark.createDataFrame([], "doc_id long, matched long"),
              "doc_id", "left")
        .select(
            "doc_id",
            F.when(F.col("_ib"), F.lit("dup_in_batch"))
            .when(F.col("matched").isNotNull(), F.lit("dup_of_earlier"))
            .otherwise(F.lit("survivor"))
            .alias("status"),
            "matched",
        )
    )

    # 3) idempotent partitioned writes. Everything derived from a store
    #    READ must be materialized with its lineage SEVERED before the
    #    first overwrite: a foreachBatch replay of batch_id reads
    #    buckets/survivors partitions that the overwrite below deletes,
    #    and a lazy (or cache-evicted) plan would re-scan the deleted
    #    files mid-write. localCheckpoint(eager) cuts the parquet
    #    lineage entirely (persist alone only caches, it does not cut —
    #    the CC operator learned the same lesson). In production swap
    #    the store for a transactional table (Delta/Iceberg snapshot
    #    isolation) and this ordering concern disappears.
    new_survivors = new_survivors.localCheckpoint(eager=True)
    decisions = decisions.localCheckpoint(eager=True)
    _overwrite_partition(new_survivors, f"{store_path}/survivors", batch_id)
    # survivors first, index second: a crash between the two leaves a
    # survivor invisible to LSH lookup (a missed dedup, self-healing on
    # replay) rather than an index row pointing at a missing text.
    _overwrite_partition(
        banded.join(new_survivors.select("doc_id"), "doc_id", "left_semi"),
        f"{store_path}/buckets",
        batch_id,
    )
    _overwrite_partition(decisions, f"{store_path}/decisions", batch_id)
    if keep_dropped_texts:
        dropped_texts = (
            docs.join(new_survivors.select("doc_id"), "doc_id", "left_anti")
            .localCheckpoint(eager=True)
        )
        _overwrite_partition(dropped_texts, f"{store_path}/dropped", batch_id)
    banded.unpersist()


def fuzzy_dedup_stream(stream: DataFrame, store_path: str, **params):
    """Wire :func:`process_fuzzy_batch` as a ``foreachBatch`` sink over
    a streaming DataFrame; returns the DataStreamWriter (caller adds
    checkpointLocation / trigger and ``.start()``s)."""

    def _proc(batch_df: DataFrame, batch_id: int) -> None:
        process_fuzzy_batch(batch_df, store_path, batch_id, **params)

    return stream.writeStream.foreachBatch(_proc)


def _delete_batch_partitions_below(
    spark: SparkSession, root: str, below: int
) -> None:
    """Drop ``batch=N`` partition dirs with N < below (Hadoop FS API, so
    the same code works on local disk, HDFS, or object stores)."""
    jvm = spark.sparkContext._jvm
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    hroot = jvm.org.apache.hadoop.fs.Path(root)
    fs = hroot.getFileSystem(hconf)
    if not fs.exists(hroot):
        return
    for st in fs.listStatus(hroot):
        name = st.getPath().getName()
        if name.startswith("batch=") and int(name[6:]) < below:
            fs.delete(st.getPath(), True)


def recompact_fuzzy_store(
    spark: SparkSession,
    store_path: str,
    corpus: DataFrame | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    k_shingle: int = 5,
    threshold: float = 0.5,
    n_hashes: int = 30,
    bands: int = 5,
    bucket_cap: int | None = 1024,
    seed: int = 42,
    signature: str = "fast",
    max_iter: int = 25,
) -> dict:
    """Periodic re-resolution compaction for the streaming fuzzy-dedup
    store (r7 verdict #4 — the closure the module docstring names):
    re-run the batch :func:`fuzzy_dedup_pipeline` GLOBALLY over every
    doc the stream has seen and rewrite the store as ONE compacted
    history partition, restoring chain-exact connected-component groups
    at the compaction boundary. After compaction the store's decisions
    are byte-for-byte what a single-batch run over the full seen corpus
    would emit (``survivor`` / ``dup_in_batch``, matched null) — the
    pinned greedy-arrival-order chain-break divergence is healed.

    The docs the stream dropped are required to heal chains THROUGH a
    dropped doc, so the full seen corpus comes from (in preference
    order): ``corpus`` — a replayable archive of the original stream
    (the production norm at 100 TB: streams land in object storage
    anyway, so compaction re-reads instead of double-storing) — or the
    ``dropped/`` store written by
    ``process_fuzzy_batch(keep_dropped_texts=True)``. With neither, a
    store that ever dropped a doc raises instead of silently compacting
    to weaker survivor-only semantics.

    Crash safety: the compacted state is written (checkpointed, lineage
    severed from the store reads) to the highest seen batch partition
    FIRST, then stale lower partitions are dropped; a crash in between
    leaves duplicate history that the next compaction run (or this one,
    re-run) collapses — ``dropDuplicates(doc_id)`` at entry makes the
    re-run deterministic. Within the compacted-partition writes,
    ``dropped/`` goes FIRST (r8 ADVICE): the new dropped set holds the
    texts of every currently-non-survivor doc, so once it lands, every
    seen doc's text exists in dropped ∪ old-survivors regardless of
    where the process dies — overwriting ``survivors/`` first would
    leave a batch-``cbid`` survivor that compaction demotes to dup with
    its text in NEITHER store. The entry-time coverage assertion (every
    doc_id in ``decisions/`` must have a text) turns any residual
    partial-state hole — including some batches having run
    ``keep_dropped_texts=False`` — into a loud error instead of a doc
    silently vanishing from decisions. Use a transactional table format
    in production for atomic swap semantics.

    Returns ``{"compacted", "batch", "n_docs", "n_survivors",
    "cc_rounds"}``."""
    surv = _read_store(spark, f"{store_path}/survivors")
    dec = _read_store(spark, f"{store_path}/decisions")
    if surv is None or dec is None:
        return {"compacted": False, "reason": "empty store"}
    max_batch = dec.agg(F.max("batch")).first()[0]
    if max_batch is None:
        # readable store, zero decision rows (a stream that only ever
        # processed empty micro-batches writes empty partitions) —
        # nothing to compact; int(None) would TypeError (r8 ADVICE)
        return {"compacted": False, "reason": "empty store"}

    dropped_store = _read_store(spark, f"{store_path}/dropped")
    if corpus is not None:
        seen = dec.select("doc_id").distinct()
        texts = corpus.select(
            F.col(id_col).cast("long").alias("doc_id"),
            F.col(text_col).alias("text"),
        ).join(seen, "doc_id", "left_semi")
    else:
        texts = surv.select("doc_id", "text")
        if dropped_store is not None:
            texts = texts.unionByName(dropped_store.select("doc_id", "text"))
        elif dec.filter(F.col("status") != "survivor").limit(1).count():
            raise ValueError(
                "recompact_fuzzy_store needs the dropped docs' texts to "
                "restore chain-exact groups: pass `corpus` (replayable "
                "stream archive) or run the stream with "
                "keep_dropped_texts=True"
            )
    texts = texts.dropDuplicates(["doc_id"])
    # every doc the stream ever decided on must have a text to feed the
    # global re-run — a PARTIAL dropped store (some batches ran
    # keep_dropped_texts=False, a crash ate a partition) or a corpus
    # missing seen docs would otherwise make those docs silently vanish
    # from the compacted decisions (r8 ADVICE medium). One bounded
    # action over the seen corpus, same scale as the compaction itself.
    n_missing = (
        dec.select("doc_id")
        .distinct()
        .join(texts.select("doc_id"), "doc_id", "left_anti")
        .count()
    )
    if n_missing:
        raise ValueError(
            f"recompact_fuzzy_store: {n_missing} seen doc(s) in the "
            "decisions store have no text in "
            + ("the supplied corpus" if corpus is not None
               else "the survivors/dropped stores")
            + " — refusing to silently drop them from the compacted "
            "decisions (run every batch with keep_dropped_texts=True, "
            "or pass the full replayable corpus)"
        )

    stats: dict = {}
    clusters = fuzzy_dedup_pipeline(
        texts,
        text_col="text",
        id_col="doc_id",
        k_shingle=k_shingle,
        threshold=threshold,
        n_hashes=n_hashes,
        bands=bands,
        bucket_cap=bucket_cap,
        signature=signature,
        max_iter=max_iter,
        stats=stats,
    )
    dropped_now = clusters.filter(~F.col("is_survivor")).select("doc_id")
    new_surv = texts.join(dropped_now, "doc_id", "left_anti")
    banded = _banded(new_surv, k_shingle, n_hashes, bands, seed, signature)
    decisions = texts.select("doc_id").join(
        dropped_now.withColumn("_d", F.lit(True)), "doc_id", "left"
    ).select(
        "doc_id",
        F.when(F.col("_d"), F.lit("dup_in_batch"))
        .otherwise(F.lit("survivor"))
        .alias("status"),
        F.lit(None).cast("long").alias("matched"),
    )
    dropped_texts = texts.join(dropped_now, "doc_id", "left_semi")

    # sever lineage from the store partitions we are about to rewrite
    new_surv = new_surv.localCheckpoint(eager=True)
    banded = banded.localCheckpoint(eager=True)
    decisions = decisions.localCheckpoint(eager=True)
    dropped_texts = dropped_texts.localCheckpoint(eager=True)
    n_docs = decisions.count()
    n_survivors = new_surv.count()

    cbid = int(max_batch)
    # dropped/ FIRST (see docstring crash-safety): after this write,
    # dropped@cbid ∪ survivors(old, all partitions) covers every seen
    # doc's text through every later crash window. Skipped only when a
    # replayable corpus is the archive AND the store never kept dropped
    # texts; with corpus=None it is always written — compaction itself
    # can demote docs (e.g. re-run with a lower threshold than the
    # stream used), and their texts must stay recompactable.
    if dropped_store is not None or corpus is None:
        _overwrite_partition(dropped_texts, f"{store_path}/dropped", cbid)
    _overwrite_partition(new_surv, f"{store_path}/survivors", cbid)
    _overwrite_partition(banded, f"{store_path}/buckets", cbid)
    _overwrite_partition(decisions, f"{store_path}/decisions", cbid)
    for sub in ("survivors", "buckets", "decisions", "dropped"):
        _delete_batch_partitions_below(spark, f"{store_path}/{sub}", cbid)
    return {
        "compacted": True,
        "batch": cbid,
        "n_docs": int(n_docs),
        "n_survivors": int(n_survivors),
        "cc_rounds": stats.get("cc_rounds"),
    }


def read_decisions(spark: SparkSession, store_path: str) -> DataFrame:
    """All per-doc decisions recorded so far (partitioned by batch)."""
    df = _read_store(spark, f"{store_path}/decisions")
    if df is None:
        return spark.createDataFrame(
            [], "doc_id long, status string, matched long, batch int"
        )
    return df
