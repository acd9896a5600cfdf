"""Round-10 phase profiler: per-stage timings for the slow bench
queries (noop-sink isolation per the optimization guide §1.4), printed
as one JSON dict per query. NOT part of the official bench.

Usage: python tools/profile_r10.py [minhash|recompact|flagship|ivf|all]
"""

from __future__ import annotations

import json
import os
import sys
import time

import pandas as pd  # module-level: pandas_udf type-hint resolution

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def noop(df) -> float:
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def act(thunk) -> float:
    t0 = time.perf_counter()
    thunk()
    return time.perf_counter() - t0


def wait_calm(max_wait_s: int = 360) -> tuple:
    """bench-style gate: single-core AND parallel probes."""
    import bench as _b

    return _b._wait_for_calm_host(max_wait_s)


def calm_probe() -> float:
    import numpy as np

    x = np.random.default_rng(0).normal(0, 1, 1_000_000)
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        np.sort(x.copy())
        best = min(best, time.perf_counter() - t0)
    return best * 1000


def get_session():
    from tersets_spark.session import get_spark

    return get_spark("profile_r10", cores=8, shuffle_partitions=8)


def profile_minhash(spark) -> dict:
    from pyspark.sql import functions as F

    import __spark_entry__ as entrymod
    from tersets_spark.operators.dedup import (
        _cap_buckets,
        minhash_lsh_candidates,
        ngram_jaccard_pairs,
        shingles,
    )

    entrymod._prep(spark)
    out: dict = {"probe_ms": calm_probe()}
    docs = entrymod._documents(spark, SF_DIR).select(
        F.col("doc_id").cast("long").alias("doc_id"), "text"
    )

    from pyspark.sql import types as T

    from tersets_spark.operators.dedup import _band_buckets_batch

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def band_buckets(texts: pd.Series) -> pd.Series:
        return _band_buckets_batch(texts, 5, 64, 16, 42)

    sc = spark.sparkContext
    sc.setJobDescription("mh: signature+explode")
    banded_raw = docs.select(
        F.col("doc_id").alias("_id"), band_buckets(F.col("text")).alias("_bb")
    ).select("_id", F.posexplode("_bb").alias("band", "bucket"))
    out["1_signature_explode"] = noop(banded_raw)
    sc.setJobDescription("mh: +cap window")
    banded = _cap_buckets(banded_raw, ["band", "bucket"], 1024)
    out["2_capped"] = noop(banded)
    sc.setJobDescription("mh: candidates join+distinct")
    left, right = banded.alias("l"), banded.alias("r")
    cands = (
        left.join(
            right,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bucket") == F.col("r.bucket"))
            & (F.col("l._id") < F.col("r._id")),
        )
        .select(F.col("l._id").alias("id_a"), F.col("r._id").alias("id_b"))
        .distinct()
    )
    out["3_candidates"] = noop(cands)
    cands_p = cands.persist()
    out["n_cands"] = cands_p.count()
    sc.setJobDescription("mh: shingles only")
    sh = docs.select(
        F.col("doc_id").alias("_id"), shingles("text", 5).alias("_sh")
    )
    out["4_shingles_all_docs"] = noop(sh)
    sc.setJobDescription("mh: verify")
    pairs = ngram_jaccard_pairs(docs, cands_p, threshold=0.5)
    t0 = time.perf_counter()
    out["n_pairs"] = pairs.count()
    out["5_verify"] = time.perf_counter() - t0
    cands_p.unpersist()
    spark.catalog.clearCache()
    sc.setJobDescription("mh: full 64x16 (bench shape)")
    t0 = time.perf_counter()
    out["n_final"] = entrymod.minhash_pairs(spark, SF_DIR, 64, 16).count()
    out["6_full_64x16"] = time.perf_counter() - t0
    spark.catalog.clearCache()
    sc.setJobDescription("mh: full 16x4 (bench shape)")
    t0 = time.perf_counter()
    entrymod.minhash_pairs(spark, SF_DIR, 16, 4).count()
    out["7_full_16x4"] = time.perf_counter() - t0
    spark.catalog.clearCache()
    sc.setJobDescription(None)
    out["probe_ms_end"] = calm_probe()
    return out


def profile_recompact(spark) -> dict:
    import shutil
    import tempfile

    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    import __spark_entry__ as entrymod
    from tersets_spark.operators.dedup import (
        connected_components,
        ngram_jaccard_pairs,
    )
    from tersets_spark.streaming.fuzzy_dedup_stream import (
        _banded,
        _seen_texts,
        _write_compacted_state,
        process_fuzzy_batch,
        _read_store,
    )

    entrymod._prep(spark)
    out: dict = {"probe_ms": calm_probe()}
    docs_all = entrymod._documents(spark, SF_DIR).select(
        F.col("doc_id").cast("long").alias("doc_id"), "text"
    )
    tmp = tempfile.mkdtemp(prefix="profile_recompact_")
    sc = spark.sparkContext
    try:
        t0 = time.perf_counter()
        for b in range(3):
            process_fuzzy_batch(
                docs_all.filter(F.col("doc_id") % 3 == b),
                tmp, b, signature="fast", keep_dropped_texts=True,
            )
        out["0_store_build_untimed"] = time.perf_counter() - t0

        # mirrored recompact_fuzzy_store with phase timers
        k_shingle, threshold, n_hashes, bands = 5, 0.5, 30, 5
        bucket_cap, seed, signature = 1024, 42, "fast"
        surv = _read_store(spark, f"{tmp}/survivors")
        dec = _read_store(spark, f"{tmp}/decisions")
        sc.setJobDescription("rc: max_batch+seen_texts")
        t0 = time.perf_counter()
        max_batch = dec.agg(F.max("batch")).first()[0]
        texts, dropped_store = _seen_texts(spark, tmp, dec, None, "text", "doc_id")
        out["1_seen_texts"] = time.perf_counter() - t0
        sc.setJobDescription("rc: banding+allbuckets")
        t0 = time.perf_counter()
        banded_all = _banded(texts, k_shingle, n_hashes, bands, seed, signature)
        allbuckets = banded_all.withColumn(
            "n_bucket", F.count("*").over(Window.partitionBy("band", "bucket"))
        ).persist()
        allbuckets.count()
        out["2_banding_allbuckets"] = time.perf_counter() - t0
        sc.setJobDescription("rc: candidates")
        t0 = time.perf_counter()
        capped = allbuckets.filter(F.col("n_bucket") <= bucket_cap)
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
        out["n_cands"] = cand.count()
        out["3_candidates"] = time.perf_counter() - t0
        sc.setJobDescription("rc: verify")
        t0 = time.perf_counter()
        verified = ngram_jaccard_pairs(
            texts, cand, text_col="text", id_col="doc_id",
            k_shingle=k_shingle, threshold=threshold,
        )
        stats: dict = {}
        labels = connected_components(verified, max_iter=25, stats=stats)
        lab = labels.select(
            F.col("node").alias("doc_id"), F.col("cluster_id").alias("_root")
        )
        cluster_map = (
            texts.select("doc_id")
            .join(lab, "doc_id", "left")
            .select("doc_id", F.coalesce("_root", "doc_id").alias("cluster_id"))
        )
        out["4_verify_plus_cc"] = time.perf_counter() - t0
        out["cc_rounds"] = stats.get("cc_rounds")
        sc.setJobDescription("rc: write compacted state")
        t0 = time.perf_counter()
        meta_row = spark.createDataFrame(
            [(k_shingle, float(threshold), n_hashes, bands, bucket_cap,
              seed, signature)],
            "k_shingle int, threshold double, n_hashes int, bands int, "
            "bucket_cap bigint, seed bigint, signature string",
        )
        res = _write_compacted_state(
            spark, tmp, int(max_batch), texts, cluster_map,
            allbuckets, meta_row, write_dropped=True, stats=stats,
            extra={"mode": "full"},
        )
        out["5_write_state"] = time.perf_counter() - t0
        out["n_docs"] = res["n_docs"]
        cand.unpersist()
        allbuckets.unpersist()
        texts.unpersist()
        sc.setJobDescription(None)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
        spark.catalog.clearCache()
    out["probe_ms_end"] = calm_probe()
    return out


def profile_recompact_e2e(spark) -> dict:
    """Times the REAL recompact_fuzzy_store / _incremental functions in
    the bench's exact shape (store build untimed)."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    import __spark_entry__ as entrymod
    from tersets_spark.streaming.fuzzy_dedup_stream import (
        process_fuzzy_batch,
        recompact_fuzzy_store,
        recompact_fuzzy_store_incremental,
    )

    entrymod._prep(spark)
    out: dict = {"probe_ms": calm_probe()}
    docs_all = entrymod._documents(spark, SF_DIR).select(
        F.col("doc_id").cast("long").alias("doc_id"), "text"
    )
    # split the real function's write phase from its compute phase
    # (sys.modules lookup: the streaming package re-exports a FUNCTION
    # named fuzzy_dedup_stream that shadows the module attribute)
    fds = sys.modules["tersets_spark.streaming.fuzzy_dedup_stream"]

    write_times: list = []
    _orig_write = fds._write_compacted_state

    def _timed_write(*a, **kw):
        t0 = time.perf_counter()
        r = _orig_write(*a, **kw)
        write_times.append(round(time.perf_counter() - t0, 3))
        return r

    fds._write_compacted_state = _timed_write
    # full-compaction shape (bench fuzzy_recompact)
    tmp = tempfile.mkdtemp(prefix="profile_rc_full_")
    try:
        for b in range(3):
            process_fuzzy_batch(
                docs_all.filter(F.col("doc_id") % 3 == b),
                tmp, b, signature="fast", keep_dropped_texts=True,
            )
        for rep in range(2):
            out[f"gate_full_{rep}"] = wait_calm()
            t0 = time.perf_counter()
            res = recompact_fuzzy_store(spark, tmp, signature="fast")
            out[f"full_recompact_{rep}"] = time.perf_counter() - t0
        out["full_cc_rounds"] = res.get("cc_rounds")
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
        spark.catalog.clearCache()
    # incremental shape (bench fuzzy_recompact_incr)
    tmp = tempfile.mkdtemp(prefix="profile_rc_incr_")
    try:
        for b in range(3):
            process_fuzzy_batch(
                docs_all.filter(F.col("doc_id") % 4 == b),
                tmp, b, signature="fast", keep_dropped_texts=True,
            )
        recompact_fuzzy_store(spark, tmp, signature="fast")
        process_fuzzy_batch(
            docs_all.filter(F.col("doc_id") % 4 == 3),
            tmp, 3, signature="fast", keep_dropped_texts=True,
        )
        out["gate_incr"] = wait_calm()
        t0 = time.perf_counter()
        res = recompact_fuzzy_store_incremental(spark, tmp)
        out["incr_recompact"] = time.perf_counter() - t0
        out["incr_cc_rounds"] = res.get("cc_rounds")
        out["incr_n_cand"] = res.get("n_candidate_pairs")
        out["incr_phases"] = res.get("phases")
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
        spark.catalog.clearCache()
        fds._write_compacted_state = _orig_write
    out["write_state_times"] = write_times
    out["probe_ms_end"] = calm_probe()
    return out


def profile_flagship(spark) -> dict:
    from pyspark.sql import functions as F

    from tersets_spark.methods import Method
    from tersets_spark.operators.pipeline import (
        flagship_summary,
        fused_compress_rollup,
    )
    from tersets_spark.sources.synth import synth_tokens

    out: dict = {"probe_ms": calm_probe()}
    n_docs = 10000
    toks = synth_tokens(spark, n_docs).persist()
    toks.count()
    # warmup
    fused_compress_rollup(synth_tokens(spark, 64), Method.BitPackedDeltaEncoding).agg(
        F.count("*")
    ).collect()
    sc = spark.sparkContext
    sc.setJobDescription("fl: fused only (noop)")
    fused = fused_compress_rollup(toks, Method.BitPackedDeltaEncoding)
    out["1_fused_noop"] = noop(fused)
    sc.setJobDescription("fl: full flagship")
    t0 = time.perf_counter()
    fused2 = fused_compress_rollup(toks, Method.BitPackedDeltaEncoding)
    flagship_summary(fused2).collect()
    out["2_full"] = time.perf_counter() - t0
    t0 = time.perf_counter()
    fused3 = fused_compress_rollup(toks, Method.BitPackedDeltaEncoding)
    flagship_summary(fused3).collect()
    out["3_full_again"] = time.perf_counter() - t0
    toks.unpersist()
    sc.setJobDescription(None)
    out["probe_ms_end"] = calm_probe()
    return out


def profile_ivf(spark) -> dict:
    from pyspark.sql import functions as F

    import __spark_entry__ as entrymod
    from tersets_spark.operators.similarity import (
        _kmeans,
        build_ivf_index,
        ivf_topk,
        train_centroids,
    )

    entrymod._prep(spark)
    out: dict = {"probe_ms": calm_probe()}
    emb = entrymod._embeddings(spark, SF_DIR).select(
        "vec_id",
        F.expr("transform(embedding, x -> CAST(x AS DOUBLE))").alias("embedding"),
    )
    queries = emb.filter(F.col("vec_id") < 20)
    sc = spark.sparkContext
    sc.setJobDescription("ivf: train")
    t0 = time.perf_counter()
    rows = emb.select("vec_id", "embedding").orderBy("vec_id").limit(4096).collect()
    out["1a_train_collect"] = time.perf_counter() - t0
    import numpy as np
    X = np.array([r[1] for r in rows], dtype=np.float64)
    t0 = time.perf_counter()
    cents = _kmeans(X, 32, 10)
    out["1b_kmeans"] = time.perf_counter() - t0
    sc.setJobDescription("ivf: build index")
    t0 = time.perf_counter()
    index = build_ivf_index(emb, cents)
    out["2_build"] = time.perf_counter() - t0
    sc.setJobDescription("ivf: query")
    t0 = time.perf_counter()
    q = ivf_topk(emb, queries, cents, k=5, nprobe=8, index=index)
    out["3a_query_planbuild"] = time.perf_counter() - t0
    t0 = time.perf_counter()
    q.count()
    out["3b_query_exec"] = time.perf_counter() - t0
    t0 = time.perf_counter()
    ivf_topk(emb, queries, cents, k=5, nprobe=8, index=index).count()
    out["4_query_again"] = time.perf_counter() - t0
    index.unpersist()
    spark.catalog.clearCache()
    sc.setJobDescription(None)
    out["probe_ms_end"] = calm_probe()
    return out


def profile_simhash(spark) -> dict:
    from pyspark.sql import functions as F

    import __spark_entry__ as entrymod
    from tersets_spark.operators.dedup import simhash_near_dups, simhash_signatures

    entrymod._prep(spark)
    out: dict = {"probe_ms": calm_probe()}
    docs = entrymod._documents(spark, SF_DIR).select(
        F.col("doc_id").cast("long").alias("doc_id"), "text"
    )
    sc = spark.sparkContext
    sc.setJobDescription("sh: signatures only")
    out["1_signatures"] = noop(simhash_signatures(docs))
    sc.setJobDescription("sh: full near dups")
    t0 = time.perf_counter()
    n = simhash_near_dups(docs).count()
    out["2_full"] = time.perf_counter() - t0
    out["n_pairs"] = n
    t0 = time.perf_counter()
    simhash_near_dups(docs).count()
    out["3_full_again"] = time.perf_counter() - t0
    sc.setJobDescription(None)
    out["probe_ms_end"] = calm_probe()
    return out


def main() -> None:
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    spark = get_session()
    runners = {
        "minhash": profile_minhash,
        "recompact": profile_recompact,
        "recompact_e2e": profile_recompact_e2e,
        "simhash": profile_simhash,
        "flagship": profile_flagship,
        "ivf": profile_ivf,
    }
    names = list(runners) if which == "all" else [which]
    for name in names:
        res = runners[name](spark)
        print(f"PROFILE {name}: "
              + json.dumps({k: (round(v, 3) if isinstance(v, float) else v)
                            for k, v in res.items()}), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
