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
    _CC_COLLECT_EDGES,
    _band_buckets_batch,
    _banded_auditable,
    connected_components,
    fuzzy_dedup_pipeline,
    ngram_jaccard_pairs,
)

__all__ = [
    "process_fuzzy_batch",
    "fuzzy_dedup_stream",
    "read_decisions",
    "recompact_fuzzy_store",
    "recompact_fuzzy_store_incremental",
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

    # pure function; nondeterministic marker stops the optimizer from
    # duplicating the evaluation around posexplode's pushed filter
    # (guide §4.4 — see minhash_lsh_candidates)
    band_buckets = band_buckets.asNondeterministic()

    return docs.select(
        "doc_id", band_buckets(F.col("text")).alias("_bb")
    ).select("doc_id", F.posexplode("_bb").alias("band", "bucket"))


def _read_store(spark: SparkSession, path: str) -> DataFrame | None:
    try:
        return spark.read.option("basePath", path).parquet(path)
    except AnalysisException:
        return None  # store empty: first batch (or no partition yet)


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
    # Stage the two HEAVY sub-plan results once each (.tmp_batch-N is
    # dot-hidden like the staged partitions; swept after promote and by
    # the next compaction). Without this, every staged output below
    # re-executed the in-batch resolution and the cross-batch verify —
    # 2× the batch's compute, and 2× its peak memory footprint (the
    # 50k-doc replica probe OOM'd during the SECOND concurrent
    # execution of the verify plan).
    tmp_root = f"{store_path}/.tmp_batch-{int(batch_id)}"
    dropped_in_batch = _stage_df(
        spark,
        clusters.filter(~F.col("is_survivor")).select("doc_id"),
        f"{tmp_root}/dropped_in_batch",
    )
    batch_survivors = _stage_df(
        spark,
        docs.join(dropped_in_batch, "doc_id", "left_anti"),
        f"{tmp_root}/batch_survivors",
    )

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
        # keep the earliest verified survivor as the recorded match;
        # staged once — the verify join above is the batch's most
        # expensive plan and feeds three outputs below
        matched = _stage_df(
            spark,
            verified.groupBy(F.col("id_b").alias("doc_id")).agg(
                F.min("id_a").alias("matched")
            ),
            f"{tmp_root}/matched",
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

    # 3) idempotent partitioned writes, stage-then-rename (r9 — same
    #    design as the compaction paths, see :func:`_stage_partition`).
    #    Everything derived from a store READ must have its parquet
    #    lineage SEVERED before any visible partition is replaced: a
    #    foreachBatch replay of batch_id reads buckets/survivors
    #    partitions that the promote below deletes, and a lazy (or
    #    cache-evicted) plan would re-scan the deleted files mid-write.
    #    Staging writes each output exactly once to a hidden dir and
    #    re-reads it — the same sever the former eager localCheckpoint
    #    gave, without pinning batch-sized text blocks in the block
    #    manager (in local mode that is DRIVER heap; a 50k-doc replica
    #    run OOM'd on exactly that residency after a few batches). In
    #    production swap the store for a transactional table
    #    (Delta/Iceberg snapshot isolation) and the ordering concern
    #    disappears.
    new_survivors = _stage_partition(
        spark, new_survivors, f"{store_path}/survivors", batch_id
    )
    _stage_partition(
        spark,
        banded.join(new_survivors.select("doc_id"), "doc_id", "left_semi"),
        f"{store_path}/buckets",
        batch_id,
    )
    _stage_partition(spark, decisions, f"{store_path}/decisions", batch_id)
    if keep_dropped_texts:
        _stage_partition(
            spark,
            docs.join(new_survivors.select("doc_id"), "doc_id", "left_anti"),
            f"{store_path}/dropped",
            batch_id,
        )
    banded.unpersist()
    # promote: survivors first, index second — a crash between the two
    # leaves a survivor invisible to LSH lookup (a missed dedup,
    # self-healing on replay) rather than an index row pointing at a
    # missing text.
    _promote_staged(spark, f"{store_path}/survivors", batch_id)
    _promote_staged(spark, f"{store_path}/buckets", batch_id)
    _promote_staged(spark, f"{store_path}/decisions", batch_id)
    if keep_dropped_texts:
        _promote_staged(spark, f"{store_path}/dropped", batch_id)
    _delete_dir(spark, tmp_root)


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


_STORE_SUBDIRS = (
    "survivors", "buckets", "decisions", "dropped",
    "allbuckets", "meta", "clusters",
)


def _stage_partition(
    spark: SparkSession, df: DataFrame, root: str, batch_id: int
) -> DataFrame:
    """Write ``df`` once to a dot-prefixed staging dir under ``root``
    (hidden from Spark's file index, so :func:`_read_store` never sees
    it) and return a re-read whose lineage is the staged files.

    Naming: the dir must be DOT-prefixed specifically — Spark's
    hidden-path rule exempts ``_``-prefixed names containing ``=``
    (an ``_staged_batch=2`` dir is parsed as a partition column and
    breaks the store's ``batch=N`` discovery with
    CONFLICTING_PARTITION_COLUMN_NAMES; pinned by the crash test).
    Spark logs a benign ``All paths were ignored`` warning when the
    explicitly-passed hidden path resolves for the read-back; the read
    still returns the staged rows (also pinned).

    This is the disk-backed replacement for the compaction paths'
    former ``localCheckpoint(eager=True)``: it severs lineage from the
    store partitions about to be rewritten without pinning a
    corpus-sized dataset in block-manager memory (a 50k-doc replica
    probe OOM'd an 8 GiB local-mode driver heap on exactly that), and
    without localCheckpoint's non-reliable-checkpoint failure mode on a
    real cluster (an executor lost after the checkpoint makes its
    blocks unrecoverable mid-job; staged parquet on the store's own
    filesystem survives any worker loss). Promotion into ``batch=N``
    is a filesystem rename (:func:`_promote_staged`) — the data is
    written exactly once, same total I/O as the direct overwrite."""
    return _stage_df(spark, df, f"{root}/.staged_batch-{int(batch_id)}")


def _stage_df(spark: SparkSession, df: DataFrame, path: str) -> DataFrame:
    """Materialize ``df`` exactly once to ``path`` (parquet, overwrite)
    and return a re-read whose lineage is the written files. The
    disk-backed equivalent of ``localCheckpoint(eager=True)`` for plans
    that feed several downstream outputs: each consumer re-reads cheap
    parquet instead of re-executing the producing sub-plan (the batch
    path's in-batch resolution and cross-batch verify are exactly such
    producers — without this they executed once per staged output)."""
    df.write.mode("overwrite").parquet(path)
    return spark.read.parquet(path)


def _delete_dir(spark: SparkSession, path: str) -> None:
    jvm = spark.sparkContext._jvm
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(hconf)
    if fs.exists(hpath):
        fs.delete(hpath, True)


def _promote_staged(spark: SparkSession, root: str, batch_id: int) -> None:
    """Move ``.staged_batch-N`` into place as ``batch=N``: rename the
    old partition ASIDE (``.old_batch-N``), rename the staged dir in,
    then drop the aside copy (r9 ADVICE — deleting the live dir first
    left a crash window where a demoted survivor's text existed in NO
    visible store and only manual recovery of the hidden staged dir
    could unwedge the next compaction's coverage assertion; now a crash
    anywhere in the promote leaves every byte on disk in at most three
    metadata ops, and the aside copy makes recovery a rename). On
    object stores rename is a copy; production should use a
    transactional table format for true atomic swap, as documented on
    :func:`recompact_fuzzy_store`."""
    jvm = spark.sparkContext._jvm
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    src = jvm.org.apache.hadoop.fs.Path(
        f"{root}/.staged_batch-{int(batch_id)}"
    )
    dst = jvm.org.apache.hadoop.fs.Path(f"{root}/batch={int(batch_id)}")
    aside = jvm.org.apache.hadoop.fs.Path(
        f"{root}/.old_batch-{int(batch_id)}"
    )
    fs = src.getFileSystem(hconf)
    if fs.exists(aside):  # leftover from a crash mid-promote
        fs.delete(aside, True)
    if fs.exists(dst):
        if not fs.rename(dst, aside):
            raise IOError(f"staged promote failed: rename {dst} -> {aside}")
    if not fs.rename(src, dst):
        raise IOError(f"staged promote failed: rename {src} -> {dst}")
    if fs.exists(aside):
        fs.delete(aside, True)


def _delete_staged_dirs(
    spark: SparkSession, store_path: str, upto: int | None = None
) -> None:
    """Drop leftover ``.staged_batch-*`` / ``.old_batch-*`` dirs from a
    compaction that crashed mid-stage/mid-promote, and ``.tmp_batch-*``
    intermediates from a batch that crashed mid-write (all invisible to
    readers, but they hold disk).

    ``upto`` bounds the sweep to batch ids <= it (r9 ADVICE): a
    compaction entered at commit id ``cbid`` must not delete the staged
    intermediates of an in-flight LATER micro-batch running
    concurrently — ids above the compaction's own commit id are someone
    else's live state, not leftovers."""
    jvm = spark.sparkContext._jvm
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    prefixes = [
        (s, p)
        for s in _STORE_SUBDIRS
        for p in (".staged_batch-", ".old_batch-")
    ] + [("", ".tmp_batch-")]
    for sub, prefix in prefixes:
        hroot = jvm.org.apache.hadoop.fs.Path(
            f"{store_path}/{sub}" if sub else store_path
        )
        fs = hroot.getFileSystem(hconf)
        if not fs.exists(hroot):
            continue
        for st in fs.listStatus(hroot):
            name = st.getPath().getName()
            if not name.startswith(prefix):
                continue
            if upto is not None:
                try:
                    if int(name[len(prefix):]) > upto:
                        continue  # a later batch's live intermediates
                except ValueError:
                    pass  # unparseable id: treat as leftover, sweep
            fs.delete(st.getPath(), True)


def _seen_texts(
    spark: SparkSession,
    store_path: str,
    dec: DataFrame,
    corpus: DataFrame | None,
    text_col: str,
    id_col: str,
) -> tuple[DataFrame, DataFrame | None]:
    """(doc_id, text) for every doc the decisions store has seen, from
    (in preference order) the replayable ``corpus`` or the survivors ∪
    dropped stores — with the r8-ADVICE coverage assertion: a seen doc
    with no text anywhere raises instead of silently vanishing from the
    compacted decisions. Shared by the full and incremental
    recompaction paths."""
    dropped_store = _read_store(spark, f"{store_path}/dropped")
    surv = _read_store(spark, f"{store_path}/survivors")
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
    # persist: texts is read ~5x per compaction (coverage assert,
    # banding, verify's shingle semi-join, survivor/dropped rewrite) and
    # each uncached read repeats the store scan + the dropDuplicates
    # shuffle. The coverage count below materializes the cache BEFORE
    # any fan-out consumer (the r4/r5 AQE broadcast-build trap);
    # downstream consumers are plain shuffle joins, which share a cache
    # fine (CLAUDE.md playbook). Caller unpersists.
    texts = texts.dropDuplicates(["doc_id"]).persist()
    # every doc the stream ever decided on must have a text to feed the
    # re-run — a PARTIAL dropped store (some batches ran
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
    return texts, dropped_store


def _write_compacted_state(
    spark: SparkSession,
    store_path: str,
    cbid: int,
    texts: DataFrame,
    cluster_map: DataFrame,
    allbuckets: DataFrame,
    meta_row: DataFrame,
    write_dropped: bool,
    stats: dict,
    extra: dict | None = None,
) -> dict:
    """Derive decisions/survivors/dropped from the final ``cluster_map``
    (doc_id, cluster_id; survivor iff doc_id == cluster_id), stage
    every compacted output to disk, and commit the compacted state by
    renaming the staged dirs into place. Shared by the full and
    incremental recompaction paths.

    Two phases (r9 — formerly localCheckpoint + direct overwrite, see
    :func:`_stage_partition` for why that design OOMs local mode and
    is fragile to executor loss on a cluster):

    1. STAGE — every output is written once to
       ``{sub}/.staged_batch-{cbid}`` (invisible to readers; a crash
       here leaves the visible store byte-identical to before the
       compaction started). Outputs whose plans read store partitions
       about to be rewritten (clusters, survivors, dropped,
       allbuckets) are re-read from their staged files before anything
       derives from them, which severs the parquet lineage the same
       way the old eager localCheckpoint did.
    2. PROMOTE — staged dirs rename into ``batch={cbid}`` in the
       crash-safe order: ``dropped/`` FIRST (after it lands, every
       seen doc's text exists in dropped ∪ old-survivors through every
       later crash window — r8 ADVICE), then survivors/buckets/
       allbuckets/meta/decisions, then ``clusters/`` LAST as the
       commit marker (the incremental path detects the last completed
       compaction as max(batch) over ``clusters/``, so a crash
       anywhere earlier makes the next run redo the whole compaction
       idempotently instead of trusting half-written state), then
       stale lower partitions drop."""
    _delete_staged_dirs(spark, store_path, upto=cbid)
    # Stage jobs overlap where independent (optimization guide §2.6:
    # Spark happily runs several jobs at once; the phase was 9
    # SEQUENTIAL small jobs whose fixed overhead dominated the
    # compaction at every measured store size). Dependency order is
    # preserved through futures: clusters first (everything derives
    # from its staged read-back), survivors/dropped/decisions/counts
    # after it, buckets after survivors+allbuckets. allbuckets and
    # meta depend on nothing and start immediately. The shared `texts`
    # cache is materialized by _seen_texts' coverage count before this
    # runs, so concurrent readers hit populated blocks (the AQE lazy-
    # cache fan-out trap does not apply to a materialized cache).
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=5) as pool:
        f_allb = pool.submit(
            _stage_partition, spark, allbuckets,
            f"{store_path}/allbuckets", cbid,
        )
        f_meta = pool.submit(
            _stage_partition, spark, meta_row, f"{store_path}/meta", cbid
        )
        clusters_out = _stage_partition(
            spark, cluster_map, f"{store_path}/clusters", cbid
        )
        decisions = clusters_out.select(
            "doc_id",
            F.when(
                F.col("doc_id") != F.col("cluster_id"), F.lit("dup_in_batch")
            )
            .otherwise(F.lit("survivor"))
            .alias("status"),
            F.lit(None).cast("long").alias("matched"),
        )
        dropped_now = clusters_out.filter(
            F.col("doc_id") != F.col("cluster_id")
        ).select("doc_id")
        f_surv = pool.submit(
            _stage_partition, spark,
            texts.join(dropped_now, "doc_id", "left_anti"),
            f"{store_path}/survivors", cbid,
        )
        f_drop = (
            pool.submit(
                _stage_partition, spark,
                texts.join(dropped_now, "doc_id", "left_semi"),
                f"{store_path}/dropped", cbid,
            )
            if write_dropped
            else None
        )
        f_dec = pool.submit(
            _stage_partition, spark, decisions,
            f"{store_path}/decisions", cbid,
        )
        f_ndocs = pool.submit(clusters_out.count)
        allbuckets = f_allb.result()
        # buckets = index rows of surviving docs. Every allbuckets doc
        # is a seen doc (it was banded from `texts`), so anti-joining
        # the dropped set is row-identical to semi-joining the staged
        # survivors — and it only depends on wave-1 outputs, removing a
        # whole sequential wave (buckets no longer waits for the
        # survivors write to finish).
        surv_buckets = allbuckets.join(
            dropped_now, "doc_id", "left_anti"
        ).select("doc_id", "band", "bucket")
        f_buckets = pool.submit(
            _stage_partition, spark, surv_buckets,
            f"{store_path}/buckets", cbid,
        )
        new_surv = f_surv.result()
        f_nsurv = pool.submit(new_surv.count)
        n_docs = f_ndocs.result()
        n_survivors = f_nsurv.result()
        f_meta.result()
        f_dec.result()
        f_buckets.result()
        if f_drop is not None:
            f_drop.result()

    # promote phase: no DataFrame above is read past this point — the
    # renames invalidate the staged read-backs' file listings.
    if write_dropped:
        _promote_staged(spark, f"{store_path}/dropped", cbid)
    for sub in (
        "survivors", "buckets", "allbuckets", "meta", "decisions", "clusters"
    ):
        _promote_staged(spark, f"{store_path}/{sub}", cbid)
    for sub in _STORE_SUBDIRS:
        _delete_batch_partitions_below(spark, f"{store_path}/{sub}", cbid)
    out = {
        "compacted": True,
        "batch": cbid,
        "n_docs": int(n_docs),
        "n_survivors": int(n_survivors),
        "cc_rounds": stats.get("cc_rounds"),
    }
    if extra:
        out.update(extra)
    return out


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

    Crash safety (r9: stage-then-rename — see
    :func:`_write_compacted_state`): every compacted output is first
    written once to a hidden ``.staged_batch-N`` dir (a crash anywhere
    in that phase leaves the visible store byte-identical and the
    staged leftovers are swept on the next run), then the staged dirs
    rename into the highest seen batch partition, then stale lower
    partitions drop; a crash between promote and the drops leaves
    duplicate history that the next compaction run (or this one,
    re-run) collapses — ``dropDuplicates(doc_id)`` at entry makes the
    re-run deterministic. Within the promotions, ``dropped/`` goes
    FIRST (r8 ADVICE): the new dropped set holds the texts of every
    currently-non-survivor doc, so once it lands, every seen doc's
    text exists in dropped ∪ old-survivors regardless of where the
    process dies — replacing ``survivors/`` first would leave a
    batch-``cbid`` survivor that compaction demotes to dup with its
    text in NEITHER store. ``clusters/`` goes LAST (the commit marker
    the incremental path keys on). The entry-time coverage assertion
    (every doc_id in ``decisions/`` must have a text) turns any
    residual partial-state hole — including some batches having run
    ``keep_dropped_texts=False`` — into a loud error instead of a doc
    silently vanishing from decisions. Use a transactional table format
    in production for atomic swap semantics (a rename is a copy on
    object stores).

    Round 9: compaction additionally persists the state that makes
    :func:`recompact_fuzzy_store_incremental` possible — ``clusters/``
    (doc_id -> component-min label for EVERY seen doc, singletons
    included), ``allbuckets/`` (the LSH index rows of every seen doc —
    not just survivors — with the per-(band,bucket) population in
    ``n_bucket``), and ``meta/`` (one row with the algorithm parameters
    so the incremental pass replays bit-compatible banding). The
    candidate stage reuses that one banding pass (the former
    implementation banded twice: once inside the pipeline, once for the
    survivor index), so the extra stores cost no additional signature
    work; semantics are unchanged vs :func:`fuzzy_dedup_pipeline` —
    identical banding, ``bucket_cap`` filter, self-join, verify, and CC
    stages over the same rows.

    Returns ``{"compacted", "mode", "batch", "n_docs", "n_survivors",
    "cc_rounds"}``."""
    surv = _read_store(spark, f"{store_path}/survivors")
    dec = _read_store(spark, f"{store_path}/decisions")
    if surv is None or dec is None:
        return {"compacted": False, "reason": "empty store"}
    # the max-batch lookup and _seen_texts' coverage count are
    # independent actions — overlap them (optimization guide §2.6). On
    # the readable-but-empty store _seen_texts is a harmless no-op scan
    # (zero seen docs -> zero missing), so running it concurrently with
    # the emptiness check loses nothing.
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=2) as _pool:
        f_texts = _pool.submit(
            _seen_texts, spark, store_path, dec, corpus, text_col, id_col
        )
        max_batch = dec.agg(F.max("batch")).first()[0]
        texts, dropped_store = f_texts.result()
    if max_batch is None:
        # readable store, zero decision rows (a stream that only ever
        # processed empty micro-batches writes empty partitions) —
        # nothing to compact; int(None) would TypeError (r8 ADVICE)
        texts.unpersist()
        return {"compacted": False, "reason": "empty store"}

    # One banding pass over the full seen corpus feeds BOTH candidate
    # generation (identical to fuzzy_dedup_pipeline's stages: cap filter
    # -> (band,bucket) self-join -> distinct pairs -> exact-Jaccard
    # verify -> min-label CC) and the persisted all-docs index the
    # incremental path probes. n_bucket is _cap_buckets' count-over-
    # window on the join key itself — same shuffle key, no extra
    # exchange.
    banded_all = _banded(texts, k_shingle, n_hashes, bands, seed, signature)
    allbuckets = banded_all.withColumn(
        "n_bucket", F.count("*").over(Window.partitionBy("band", "bucket"))
    ).persist()
    allbuckets.count()  # materialize BEFORE the fan-out reads (AQE trap)
    capped = (
        allbuckets if bucket_cap is None
        else allbuckets.filter(F.col("n_bucket") <= bucket_cap)
    )
    left, right = capped.alias("l"), capped.alias("r")
    cand = (
        left.join(
            right,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bucket") == F.col("r.bucket"))
            & (F.col("l.doc_id") < F.col("r.doc_id")),
        )
        .select(F.col("l.doc_id").alias("id_a"), F.col("r.doc_id").alias("id_b"))
        .distinct()
        .persist()
    )
    cand.count()  # materialize BEFORE the verify join's 3-way fan-out
    verified = ngram_jaccard_pairs(
        texts, cand, text_col="text", id_col="doc_id",
        k_shingle=k_shingle, threshold=threshold,
    )
    stats: dict = {}
    labels = connected_components(
        verified, max_iter=max_iter, stats=stats,
        collect_threshold=_CC_COLLECT_EDGES,
    )
    # connected_components eagerly checkpoints its edge set first,
    # severing lineage from the candidate cache — safe to release after.
    lab = labels.select(
        F.col("node").alias("doc_id"), F.col("cluster_id").alias("_root")
    )
    cluster_map = (
        texts.select("doc_id")
        .join(lab, "doc_id", "left")
        .select("doc_id", F.coalesce("_root", "doc_id").alias("cluster_id"))
    )

    meta_row = spark.createDataFrame(
        [(k_shingle, float(threshold), n_hashes, bands,
          None if bucket_cap is None else int(bucket_cap),
          int(seed), signature)],
        "k_shingle int, threshold double, n_hashes int, bands int, "
        "bucket_cap bigint, seed bigint, signature string",
    )
    # dropped/ is skipped only when a replayable corpus is the archive
    # AND the store never kept dropped texts; with corpus=None it is
    # always written — compaction itself can demote docs (e.g. re-run
    # with a lower threshold than the stream used), and their texts
    # must stay recompactable.
    out = _write_compacted_state(
        spark, store_path, int(max_batch), texts, cluster_map,
        allbuckets, meta_row,
        write_dropped=(dropped_store is not None or corpus is None),
        stats=stats, extra={"mode": "full"},
    )
    cand.unpersist()
    allbuckets.unpersist()
    texts.unpersist()
    return out


def recompact_fuzzy_store_incremental(
    spark: SparkSession,
    store_path: str,
    corpus: DataFrame | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_iter: int = 25,
) -> dict:
    """Incremental re-resolution compaction: restore chain-exact
    connected-component groups after new stream batches WITHOUT
    re-running signatures/verify/CC over the whole seen corpus (the
    r8-verdict scale note on :func:`recompact_fuzzy_store` — the full
    re-run is a scheduled heavyweight job; this is the maintenance pass
    between full runs).

    Requires a prior :func:`recompact_fuzzy_store` (which persists the
    ``clusters/`` map, the all-docs ``allbuckets/`` LSH index, and the
    ``meta/`` parameter row this pass replays). Algorithm parameters are
    READ FROM ``meta/`` — not accepted here — so the incremental banding
    is bit-compatible with the stored index by construction.

    Algorithm (cluster contraction): only components containing a doc
    from a batch newer than the last compaction can change, so
    - band ONLY the delta docs (``O(Δ)`` signature work),
    - candidate pairs = delta self-join ∪ delta ⋈ ``allbuckets/`` on
      (band, bucket) — the stored index covers every old doc,
      INCLUDING dropped ones, which is what lets a new doc heal a chain
      through an old dropped doc,
    - exact-Jaccard verify only those pairs (``O(Δ·dup-rate)``),
    - contract each old component to its stored min-label and run CC on
      the tiny contracted graph (an edge to old doc *d* becomes an edge
      to ``cluster(d)``; a new doc bridging two old components merges
      them, exactly as the global run would),
    - expand: component-min relabel of member clusters' docs; untouched
      clusters keep their labels verbatim.
    The rewrite of the store partitions is still ``O(corpus)`` I/O —
    it is a compaction — but the compute is proportional to the delta,
    not the corpus (bench: ``fuzzy_recompact_incr`` vs
    ``fuzzy_recompact``).

    Parity contract (pinned by tests): the compacted state is
    byte-identical to :func:`recompact_fuzzy_store` over the same seen
    corpus whenever ``bucket_cap`` does not bind on a bucket containing
    a delta doc. Pinned divergence when it does: the global re-run
    drops ALL pairs of an over-cap bucket — including old-old edges it
    previously honored — while the incremental pass never retracts
    edges already folded into ``clusters/`` (monotone: known duplicate
    groups are not forgotten because boilerplate later flooded their
    bucket). New-pair generation applies the cap on the COMBINED
    (old + delta) bucket population, matching the global rule for every
    pair this pass is responsible for.

    Crash safety: same write order as the full path (dropped first,
    ``clusters/`` last as the commit marker — see
    :func:`_write_compacted_state`); a crash before the marker makes
    the next run redo the whole incremental pass idempotently (the
    stream's partitions above the last marker are untouched until the
    final deletes).

    Returns ``{"compacted", "mode", "batch", "n_docs", "n_survivors",
    "n_new", "n_candidate_pairs", "cc_rounds"}``."""
    import os as _os
    import time as _time

    _phases: "dict[str, float] | None" = (
        {} if _os.environ.get("SPARK_GRAFT_RC_PHASES") else None
    )
    _tprev = _time.perf_counter()

    def _mark(tag: str) -> None:
        nonlocal _tprev
        if _phases is not None:
            now = _time.perf_counter()
            _phases[tag] = round(now - _tprev, 3)
            _tprev = now

    surv = _read_store(spark, f"{store_path}/survivors")
    dec = _read_store(spark, f"{store_path}/decisions")
    if surv is None or dec is None:
        return {"compacted": False, "reason": "empty store"}
    clus = _read_store(spark, f"{store_path}/clusters")
    meta_df = _read_store(spark, f"{store_path}/meta")
    allb = _read_store(spark, f"{store_path}/allbuckets")
    have_state = not (clus is None or meta_df is None or allb is None)
    # the three head lookups are independent tiny jobs — overlap them
    # (optimization guide §2.6) instead of paying three sequential
    # fixed-overhead round trips
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=3) as _pool:
        f_maxb = _pool.submit(lambda: dec.agg(F.max("batch")).first()[0])
        f_clast = (
            _pool.submit(lambda: clus.agg(F.max("batch")).first()[0])
            if have_state else None
        )
        f_meta = _pool.submit(meta_df.collect) if have_state else None
        max_batch = f_maxb.result()
    if max_batch is None:
        return {"compacted": False, "reason": "empty store"}
    if not have_state:
        raise ValueError(
            "recompact_fuzzy_store_incremental needs the cluster map / "
            "all-docs LSH index / parameter row a prior full "
            "recompact_fuzzy_store persists — run the full compaction "
            "once first"
        )
    c_last = int(f_clast.result())
    cbid = int(max_batch)
    if cbid <= c_last:
        # nothing arrived since the last compaction. Still finish any
        # interrupted cleanup: the commit marker is written before the
        # stale-partition deletes, so a crash between them leaves
        # duplicate doc rows in decisions/ until these deletes land.
        for sub in _STORE_SUBDIRS:
            _delete_batch_partitions_below(spark, f"{store_path}/{sub}", c_last)
        return {
            "compacted": False,
            "reason": "nothing new since last compaction",
            "batch": c_last,
        }
    meta = next(r for r in f_meta.result() if int(r["batch"]) == c_last)
    k_shingle = int(meta["k_shingle"])
    threshold = float(meta["threshold"])
    n_hashes = int(meta["n_hashes"])
    bands = int(meta["bands"])
    bucket_cap = None if meta["bucket_cap"] is None else int(meta["bucket_cap"])
    seed = int(meta["seed"])
    signature = str(meta["signature"])
    _mark("meta")

    old_clusters = clus.filter(F.col("batch") == c_last).select(
        "doc_id", "cluster_id"
    )
    # the corpus-sized index is read 3x (bucket populations, old-side
    # candidate rows, the updated-index rewrite) — cache the one store
    # scan. Every consumer probes it against a broadcast (never
    # broadcast-builds it), so the cache is populated lazily by the
    # first action without the AQE fan-out trap; caller unpersists via
    # the cleanup block at the end.
    allb = (
        allb.filter(F.col("batch") == c_last)
        .select("doc_id", "band", "bucket", "n_bucket")
        .persist()
    )
    new_ids = (
        dec.filter(F.col("batch") > c_last)
        .select("doc_id")
        .distinct()
        .join(old_clusters.select("doc_id"), "doc_id", "left_anti")
    )
    # _seen_texts' coverage count, the delta count, and the allbuckets
    # cache warm-up are independent actions on disjoint inputs —
    # overlap them (guide §2.6). Warming allb here moves its cache
    # population (measured 2.7 s as the first sequential consumer) off
    # the critical path.
    with ThreadPoolExecutor(max_workers=3) as _pool:
        f_texts = _pool.submit(
            _seen_texts, spark, store_path, dec, corpus, text_col, id_col
        )
        f_allb = _pool.submit(allb.count)
        n_new = new_ids.count()
        texts, dropped_store = f_texts.result()
        f_allb.result()
    _mark("seen_texts+n_new")
    if n_new == 0:
        for sub in _STORE_SUBDIRS:
            _delete_batch_partitions_below(spark, f"{store_path}/{sub}", c_last)
        return {
            "compacted": False,
            "reason": "nothing new since last compaction",
            "batch": c_last,
        }
    new_texts = texts.join(new_ids, "doc_id", "left_semi")
    banded_new = _banded(
        new_texts, k_shingle, n_hashes, bands, seed, signature
    ).persist()
    banded_new.count()  # materialize: read by counts, pairs, index union
    _mark("banded_new")

    # combined per-bucket populations for buckets touched by the delta:
    # delta-side counts are tiny; the old side comes off the stored
    # n_bucket column via a broadcast semi-join — the corpus-sized index
    # is never shuffled, only map-side filtered.
    new_counts = banded_new.groupBy("band", "bucket").agg(
        F.count("*").alias("_n_new")
    )
    old_bc = (
        allb.join(
            F.broadcast(new_counts.select("band", "bucket")),
            ["band", "bucket"], "left_semi",
        )
        .select("band", "bucket", "n_bucket")
        .distinct()
    )
    bucket_tot = new_counts.join(old_bc, ["band", "bucket"], "left").select(
        "band", "bucket",
        (F.col("_n_new") + F.coalesce(F.col("n_bucket"), F.lit(0))).alias(
            "n_tot"
        ),
    )
    ok = (
        bucket_tot if bucket_cap is None
        else bucket_tot.filter(F.col("n_tot") <= bucket_cap)
    )
    ok_keys = ok.select("band", "bucket").persist()
    ok_keys.count()  # materialize: broadcast 3x below
    _mark("ok_keys")
    bnew_ok = banded_new.join(F.broadcast(ok_keys), ["band", "bucket"], "left_semi")
    old_ok = allb.join(F.broadcast(ok_keys), ["band", "bucket"], "left_semi")
    ln, rn = bnew_ok.alias("l"), bnew_ok.alias("r")
    nn_pairs = (
        ln.join(
            rn,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bucket") == F.col("r.bucket"))
            & (F.col("l.doc_id") < F.col("r.doc_id")),
        )
        .select(F.col("l.doc_id").alias("id_a"), F.col("r.doc_id").alias("id_b"))
    )
    no_pairs = (
        bnew_ok.alias("n")
        .join(old_ok.alias("o"), ["band", "bucket"])
        .select(
            F.least(F.col("n.doc_id"), F.col("o.doc_id")).alias("id_a"),
            F.greatest(F.col("n.doc_id"), F.col("o.doc_id")).alias("id_b"),
        )
    )
    cand = nn_pairs.unionByName(no_pairs).distinct().persist()
    n_cand = cand.count()  # materialize BEFORE the verify fan-out
    _mark("cand")
    verified_plan = ngram_jaccard_pairs(
        texts, cand, text_col="text", id_col="doc_id",
        k_shingle=k_shingle, threshold=threshold,
    )
    stats: dict = {}
    if n_cand <= _CC_COLLECT_EDGES:
        # bounded driver contraction (round 10): the verified edge set
        # is at most n_cand pairs — already known — so ONE collect
        # fetches it, one broadcast semi-join collect fetches the
        # touched old labels, and the contraction + union-find run on
        # the driver. Replaces the former eager checkpoint + CC action
        # in which each of the TWO oc_small broadcast builds re-ran the
        # cluster-store scan and the vids distinct. Labels identical
        # (same contraction, same component-min rule).
        ver_rows = verified_plan.collect()
        _mark("verify")
        vid_list = sorted(
            {i for r in ver_rows for i in (r["id_a"], r["id_b"])}
        )
        if vid_list:
            vids_df = spark.createDataFrame(
                pd.DataFrame({"doc_id": pd.Series(vid_list, dtype="int64")}),
                schema="doc_id long",
            )
            oc_rows = old_clusters.join(
                F.broadcast(vids_df), "doc_id", "left_semi"
            ).collect()
        else:
            oc_rows = []
        cmap = {r["doc_id"]: r["cluster_id"] for r in oc_rows}
        from tersets_spark.operators.dedup import _min_label_components

        # self-loops (both endpoints contracting to one old cluster) are
        # harmless: the node labels to itself, which coalesces to the
        # same value the distributed path's u != v filter produces
        labels_map = _min_label_components(
            (cmap.get(r["id_a"], r["id_a"]), cmap.get(r["id_b"], r["id_b"]))
            for r in ver_rows
        )
        stats["cc_rounds"] = 0
        lab = spark.createDataFrame(
            pd.DataFrame(
                {
                    "_n": pd.Series(list(labels_map), dtype="int64"),
                    "_root": pd.Series(
                        list(labels_map.values()), dtype="int64"
                    ),
                }
            ),
            schema="_n long, _root long",
        )
    else:
        # materialize the verified edge set ONCE: it fans out into vids
        # and the contracted plan's TWO broadcast builds below, and each
        # lazy re-evaluation would re-run the shingle joins (measured
        # 12.6 s CC vs 3.0 s for the full path's, which checkpoints its
        # edges first)
        verified = verified_plan.localCheckpoint(eager=True)
        _mark("verify")

        # cluster contraction: rewrite each OLD endpoint to its stored
        # component label (new docs keep their own ids — id spaces are
        # disjoint by construction of new_ids), then CC the tiny graph.
        vids = (
            verified.select(F.col("id_a").alias("doc_id"))
            .unionByName(verified.select(F.col("id_b").alias("doc_id")))
            .distinct()
        )
        oc_small = old_clusters.join(F.broadcast(vids), "doc_id", "left_semi")
        contracted = (
            verified.select("id_a", "id_b")
            .join(
                F.broadcast(
                    oc_small.select(
                        F.col("doc_id").alias("id_a"),
                        F.col("cluster_id").alias("_ca"),
                    )
                ),
                "id_a", "left",
            )
            .join(
                F.broadcast(
                    oc_small.select(
                        F.col("doc_id").alias("id_b"),
                        F.col("cluster_id").alias("_cb"),
                    )
                ),
                "id_b", "left",
            )
            .select(
                F.coalesce("_ca", F.col("id_a")).alias("id_a"),
                F.coalesce("_cb", F.col("id_b")).alias("id_b"),
            )
        )
        labels = connected_components(
            contracted, max_iter=max_iter, stats=stats,
            collect_threshold=_CC_COLLECT_EDGES,
        )
        lab = labels.select(
            F.col("node").alias("_n"), F.col("cluster_id").alias("_root")
        )
    # expand: docs of a relabeled old component follow their label; the
    # corpus-sized maps are only ever broadcast-joined (lab is tiny).
    final_old = (
        old_clusters.join(
            F.broadcast(lab), old_clusters["cluster_id"] == F.col("_n"), "left"
        )
        .select(
            "doc_id",
            F.coalesce("_root", F.col("cluster_id")).alias("cluster_id"),
        )
    )
    final_new = (
        new_ids.join(F.broadcast(lab), new_ids["doc_id"] == F.col("_n"), "left")
        .select(
            "doc_id", F.coalesce("_root", F.col("doc_id")).alias("cluster_id")
        )
    )
    cluster_map = final_old.unionByName(final_new)

    # updated all-docs index: old rows keep their banding, counts bumped
    # by the delta; delta rows carry the combined population. The row
    # set equals what the full path would band from scratch.
    allb_updated = allb.join(
        F.broadcast(new_counts), ["band", "bucket"], "left"
    ).select(
        "doc_id", "band", "bucket",
        (F.col("n_bucket") + F.coalesce(F.col("_n_new"), F.lit(0))).alias(
            "n_bucket"
        ),
    )
    bnew_rows = banded_new.join(
        F.broadcast(bucket_tot), ["band", "bucket"]
    ).select("doc_id", "band", "bucket", F.col("n_tot").alias("n_bucket"))
    allbuckets_out = allb_updated.unionByName(bnew_rows)

    _mark("cc_relabel")
    meta_row = meta_df.filter(F.col("batch") == c_last).drop("batch")
    out = _write_compacted_state(
        spark, store_path, cbid, texts, cluster_map,
        allbuckets_out, meta_row,
        write_dropped=(dropped_store is not None or corpus is None),
        stats=stats,
        extra={
            "mode": "incremental",
            "n_new": int(n_new),
            "n_candidate_pairs": int(n_cand),
        },
    )
    _mark("write_state")
    if _phases is not None:
        out["phases"] = _phases
    cand.unpersist()
    ok_keys.unpersist()
    banded_new.unpersist()
    allb.unpersist()
    texts.unpersist()
    return out


def read_decisions(spark: SparkSession, store_path: str) -> DataFrame:
    """All per-doc decisions recorded so far (partitioned by batch)."""
    df = _read_store(spark, f"{store_path}/decisions")
    if df is None:
        return spark.createDataFrame(
            [], "doc_id long, status string, matched long, batch int"
        )
    return df
