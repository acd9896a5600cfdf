"""Similarity search over embedding columns.

Two paths per the brief:

* **Brute-force cosine top-k** — the correctness baseline. SQL variant
  (``zip_with`` + ``aggregate`` dot products, window top-k) stays fully
  Catalyst and oracle-comparable; the fast variant broadcasts the query
  matrix and does one numpy matmul per Arrow batch (the classic
  broadcast-small-side pattern: corpus streams, queries broadcast).
* **LSH-bucketed ANN** — the scale path: random-hyperplane buckets with
  multi-probe (flip one bit), exact cosine only within probed buckets.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a, b) -> F.Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda s, x: s + x)


def _norm(col) -> F.Column:
    return F.sqrt(F.aggregate(F.transform(col, lambda x: x * x), F.lit(0.0), lambda s, x: s + x))


def _lit_double_sql(x: float) -> str:
    """SQL text for an exact double literal: ``repr`` is the shortest
    round-trip decimal and the JVM's string->double parse is correctly
    rounded, so the cast folds to the bit-identical constant."""
    return f"CAST('{float(x)!r}' AS DOUBLE)"


def _dot_sql(col_name: str, vals) -> str:
    """SQL text of :func:`_dot` against a CONSTANT vector. Building the
    expression as one parsed string replaces len(vals) py4j ``F.lit``
    round trips — a 32x64 centroid matrix cost ~2.5 s of pure
    driver-side plan construction per query through the Column API
    (measured round 10); the parsed tree and its fold results are
    bit-identical."""
    arr = "array(" + ",".join(_lit_double_sql(x) for x in vals) + ")"
    return (
        f"aggregate(zip_with(`{col_name}`, {arr}, (a, b) -> a * b), "
        "CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)"
    )


def brute_topk_sql(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Pure-SQL brute-force cosine top-k: (query_id, neighbor_id, cosine,
    rank). Self-matches excluded. The cross join broadcasts the smaller
    side (AQE); exact and oracle-comparable."""
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv")
    )
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cv"))
    scored = (
        F.broadcast(q)
        .crossJoin(c)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cosine", _dot(F.col("_qv"), F.col("_cv")) / (_norm(F.col("_qv")) * _norm(F.col("_cv"))))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def brute_topk_numpy(
    corpus: DataFrame,
    query_matrix: np.ndarray,
    query_ids: np.ndarray,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Scale variant: queries (small side) broadcast as a numpy matrix;
    corpus streams through ``mapInPandas`` with one matmul per Arrow
    batch; per-query global top-k finished with a window. Returns
    (query_id, neighbor_id, cosine, rank)."""
    spark = corpus.sparkSession
    qm = query_matrix / np.linalg.norm(query_matrix, axis=1, keepdims=True)
    bc = spark.sparkContext.broadcast((qm.astype(np.float64), query_ids.astype(np.int64)))

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        q, qids = bc.value
        for pdf in batches:
            if not len(pdf):
                continue
            cm = np.stack([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
            cm = cm / np.maximum(np.linalg.norm(cm, axis=1, keepdims=True), 1e-30)
            sims = q @ cm.T  # (n_queries, batch)
            kk = min(k, cm.shape[0])
            top = np.argpartition(-sims, kk - 1, axis=1)[:, :kk]
            rows = {
                "query_id": np.repeat(qids, kk),
                "neighbor_id": pdf[id_col].to_numpy()[top.ravel()],
                "cosine": np.take_along_axis(sims, top, axis=1).ravel(),
            }
            yield pd.DataFrame(rows)

    partial = corpus.select(id_col, vec_col).mapInPandas(
        score, schema="query_id long, neighbor_id long, cosine double"
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        partial.filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_planes: int = 8,
    seed: int = 42,
    dim: int | None = None,
    bucket_cap: int | None = None,
) -> DataFrame:
    """ANN: random-hyperplane buckets with 1-bit multi-probe; exact
    cosine within probed buckets only. Approximate — recall grows with
    probes; the equi-join on bucket replaces the cross join, making the
    shuffle O(matches) instead of O(|Q|x|C|). Pass ``dim`` explicitly to
    keep plan construction action-free; ``bucket_cap`` drops corpus rows
    in degenerate buckets (a hot bucket multiplies EVERY probing query)."""
    if dim is None:
        first = corpus.select(F.size(vec_col).alias("d")).first()
        dim = first["d"]
    rng = np.random.default_rng(seed)
    planes = rng.normal(size=(n_planes, dim))

    def bucket_expr(col_name: str) -> F.Column:
        # one parsed expression instead of n_planes*dim F.lit py4j
        # round trips (see _dot_sql); bit-identical long arithmetic
        return F.expr(
            "CAST(0 AS BIGINT) + "
            + " + ".join(
                f"CAST(({_dot_sql(col_name, planes[p])}) > 0 AS BIGINT)"
                f" * CAST({1 << p} AS BIGINT)"
                for p in range(n_planes)
            )
        )

    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("_cv"),
        bucket_expr(vec_col).alias("bucket"),
    )
    if bucket_cap is not None:
        from .dedup import _cap_buckets

        c = _cap_buckets(c, ["bucket"], bucket_cap)
    q0 = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("_qv"),
        bucket_expr(vec_col).alias("_b"),
    )
    # multi-probe: own bucket + each 1-bit flip
    probes = F.array(
        F.col("_b"), *[F.col("_b").bitwiseXOR(F.lit(1 << p)) for p in range(n_planes)]
    )
    q = q0.select(
        "query_id", "_qv", F.explode(probes).alias("bucket")
    )
    scored = (
        q.join(c, "bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cosine", _dot(F.col("_qv"), F.col("_cv")) / (_norm(F.col("_qv")) * _norm(F.col("_cv"))))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.select("query_id", "neighbor_id", "cosine")
        .distinct()
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def train_centroids(
    corpus: DataFrame,
    n_cells: int = 32,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    sample_size: int = 4096,
    iters: int = 10,
) -> np.ndarray:
    """Spherical k-means centroids from a DETERMINISTIC sample
    (orderBy(id).limit(n) — same centroids on every run/retry). One
    bounded driver action: sampling centroid training data is how IVF
    indexes are built at any scale (the index quality depends on the
    sample's coverage, not the corpus size).

    The training is **SQL-exact** (see :func:`_kmeans`): a DuckDB oracle
    can replay it bit-for-bit from the same table, which is what gives
    ``ivf_ann_topk`` a hard end-to-end oracle."""
    rows = (
        corpus.select(id_col, vec_col).orderBy(id_col).limit(sample_size).collect()
    )
    X = np.array([r[1] for r in rows], dtype=np.float64)
    return _kmeans(X, n_cells, iters)


def _seq_norm(X: np.ndarray) -> np.ndarray:
    """Row norms via a strictly SEQUENTIAL left-fold sum of squares
    (np.cumsum is a running sum — no pairwise/BLAS reassociation), so a
    SQL ``list_reduce`` fold reproduces the same doubles bit-for-bit."""
    return np.sqrt(np.cumsum(X * X, axis=-1)[..., -1:])


def _kmeans(X: np.ndarray, n_cells: int, iters: int = 10) -> np.ndarray:
    """Deterministic spherical k-means on a driver-side sample — shared
    by top-level centroid training and hot-cell re-splitting.

    Every float reduction is a strictly sequential left fold (cumsum)
    and the init is RNG-free (rows stratified by sorted position:
    ``C[j] = X[j*n//k]``), so the whole training is replayable in ANSI
    SQL with ``list_reduce`` folds — DuckDB trains the *same centroid
    matrix* from the same table and the driver's ``ivf_ann_topk`` row
    gets a hard value-hash oracle instead of a rows-only check. numpy's
    pairwise sums / BLAS dots would NOT replay (different association
    order); cumsum keeps the vectorized speed without them."""
    X = X / np.maximum(_seq_norm(X), 1e-30)
    n = len(X)
    k = min(n_cells, n)
    C = X[(np.arange(k) * n) // k].copy()
    for _ in range(iters):
        # (n, k) dots as a sequential left fold over the dim axis:
        # acc_j = acc_{j-1} + x_j*c_j, identical IEEE order to the
        # 0.0-seeded SQL fold (and to cumsum's running sum), without
        # materializing the (n, k, d) cumsum temp
        dots = np.zeros((n, k))
        for j in range(X.shape[1]):
            dots += X[:, j, None] * C[None, :, j]
        assign = np.argmax(dots, axis=1)  # ties -> lowest cell
        for j in range(k):
            members = X[assign == j]
            if len(members):
                # sequential fold down the member rows (vec_id order)
                C[j] = np.cumsum(members, axis=0)[-1] / len(members)
        C = C / np.maximum(_seq_norm(C), 1e-30)
    return C


def _cell_dots(
    vec_col: str, centroids: np.ndarray, ids: "list[int] | None" = None
) -> F.Column:
    """Array of (dot, cell) structs against every centroid — pure
    Catalyst (centroid coordinates inlined as literals, the same
    broadcast-small-side shape as the LSH planes). ``ids`` overrides the
    cell labels (used for the re-split index's flat effective cell
    set)."""
    if ids is None:
        ids = list(range(len(centroids)))
    return F.expr(
        "array("
        + ",".join(
            f"struct({_dot_sql(vec_col, centroids[j])} AS d, "
            f"{int(ids[j])}L AS c)"
            for j in range(len(centroids))
        )
        + ")"
    )


#: cell-id stride for the re-split index: cold cell j keeps id j*_SUB,
#: hot cell h's sub-cell s becomes h*_SUB + 1 + s (s < _SUB - 1)
_SUB = 64

#: above this many inlined doubles the centroid matrix rides a one-row
#: broadcast instead of plan literals — a realistic IVF (1024 cells x
#: 768 dims) would otherwise put ~800k literals in every plan.
#: Round 10: lowered 8192 -> 512 after measuring the two paths A/B on
#: the 32x64 bench index (bit-equal results by test): the literal tree
#: costs ~0.5 s MORE per query in driver-side analysis while execution
#: is equal, so inlining only pays below a few hundred doubles.
_INLINE_LIT_LIMIT = 512


def _attach_cell_dots(
    df: DataFrame,
    vec_col: str,
    centroids: np.ndarray,
    ids: "list[int] | None" = None,
    out: str = "_dots",
) -> DataFrame:
    """Attach the array<struct<d, c>> of per-centroid dots as column
    ``out``. Small matrices inline as literals (:func:`_cell_dots` —
    whole-stage-codegen friendly, zero joins); past
    ``_INLINE_LIT_LIMIT`` doubles the matrix rides a ONE-ROW broadcast
    cross join instead, keeping plan size constant no matter how many
    cells the index has (the same no-plan-literals discipline as the
    hot-cell sub-centroid table). Both paths compute the identical
    0.0-seeded fold, so results are bit-equal."""
    if ids is None:
        ids = list(range(len(centroids)))
    if centroids.size <= _INLINE_LIT_LIMIT:
        return df.withColumn(out, _cell_dots(vec_col, centroids, ids))
    spark = df.sparkSession
    cents = [
        (int(ids[j]), [float(x) for x in centroids[j]])
        for j in range(len(centroids))
    ]
    cdf = spark.createDataFrame(
        [(cents,)], "_cents array<struct<c: bigint, v: array<double>>>"
    )
    dots = F.transform(
        F.col("_cents"),
        lambda s: F.struct(_dot(F.col(vec_col), s["v"]).alias("d"), s["c"].alias("c")),
    )
    return df.crossJoin(F.broadcast(cdf)).withColumn(out, dots).drop("_cents")


class IvfIndex:
    """Built IVF index: the persisted cell-assignment DataFrame plus the
    flat effective probe set (cold centroids + hot-cell sub-centroids)
    and build stats. Callers own the lifetime: call :meth:`unpersist`
    (or ``spark.catalog.clearCache()``) when done — a 100-TB deployment
    would materialize ``assigned`` as the index TABLE between build and
    query instead of caching it."""

    def __init__(self, assigned: DataFrame, centroids: np.ndarray,
                 cell_ids: np.ndarray, stats: dict,
                 cached: "list[DataFrame] | None" = None):
        self.assigned = assigned
        self.centroids = centroids
        self.cell_ids = cell_ids
        self.stats = stats
        self._cached = cached if cached is not None else [assigned]

    def unpersist(self) -> None:
        for df in self._cached:
            df.unpersist()


def build_ivf_index(
    corpus: DataFrame,
    centroids: np.ndarray,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    cell_cap: int | None = 65536,
    sample_size: int = 4096,
) -> IvfIndex:
    """Assign every corpus row to a cell, RE-SPLITTING hot cells instead
    of dropping them: a cell with more than ``cell_cap`` rows gets
    ``ceil(count / cell_cap) + 1`` sub-centroids trained on a bounded
    deterministic sample of the cell (same k-means as
    :func:`train_centroids`), and its rows are re-assigned to the
    nearest sub-centroid. Queries then probe the FLAT effective cell set
    (cold centroids + sub-centroids), so scan fraction is preserved and
    no corpus row silently vanishes from the index — the round-3 silent
    cap is gone. Rows in a sub-cell that STILL exceeds the cap (k-means
    imbalance) are the only ones dropped, and ``stats['dropped_rows']``
    reports them (the repo's no-silent-caps discipline; 0 in every
    observed configuration).

    Driver actions are bounded and COUNT-INDEPENDENT of n_hot (round-4
    verdict #4): one n_cells-row count collect, then ONE job that
    gathers the per-cell samples for every hot cell at once (per-batch
    local prune keeps the shuffle at <= n_partitions * sample_size rows
    per hot cell, and the per-cell window never sees a whole hot cell).
    Sub-cell re-assignment joins a BROADCAST (cell -> sub-centroids)
    table instead of inlining every sub-centroid as plan literals, so
    plan size stays constant no matter how many cells re-split."""
    base = (
        _attach_cell_dots(corpus, vec_col, centroids)
        .select(
            F.col(id_col).alias("neighbor_id"),
            F.col(vec_col).alias("_cv"),
            F.array_max(F.col("_dots"))["c"].alias("cell"),
        )
        .persist()
    )
    stats = {"n_cells": len(centroids), "n_hot": 0, "dropped_rows": 0,
             "dropped_cells": 0}
    if cell_cap is None:
        eff_c = np.asarray(centroids, dtype=np.float64)
        eff_ids = np.arange(len(centroids), dtype=np.int64) * _SUB
        return IvfIndex(
            base.withColumn("cell", F.col("cell").cast("long") * _SUB),
            eff_c, eff_ids, stats, cached=[base],
        )
    counts = {r["cell"]: r["n"] for r in
              base.groupBy("cell").agg(F.count("*").alias("n")).collect()}
    hot = {c: n for c, n in counts.items() if n > cell_cap}
    stats["n_hot"] = len(hot)
    subs: dict[int, np.ndarray] = {}
    if hot:
        spark = corpus.sparkSession
        hot_df = spark.createDataFrame(
            [(int(c),) for c in sorted(hot)], "cell long"
        )
        ss = int(sample_size)

        def _local_prune(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            # partition-local smallest-ss per cell: the global smallest-ss
            # of the union of per-batch smallest-ss IS the global
            # smallest-ss, so the window below shuffles <= n_batches * ss
            # rows per hot cell instead of the whole hot cell
            for pdf in batches:
                if len(pdf):
                    yield (
                        pdf.sort_values("neighbor_id", kind="mergesort")
                        .groupby("cell", sort=False)
                        .head(ss)
                    )

        hot_rows = base.join(F.broadcast(hot_df), "cell", "left_semi")
        w_cell = Window.partitionBy("cell").orderBy("neighbor_id")
        sample_rows = (
            hot_rows.mapInPandas(_local_prune, schema=hot_rows.schema)
            .withColumn("rn", F.row_number().over(w_cell))
            .filter(F.col("rn") <= ss)
            .select("cell", "neighbor_id", "_cv")
            .collect()
        )  # ONE job gathers every hot cell's sample
        by_cell: dict[int, list] = {}
        for r in sorted(sample_rows, key=lambda r: (r["cell"], r["neighbor_id"])):
            by_cell.setdefault(int(r["cell"]), []).append(r["_cv"])
        for h in sorted(hot):
            X = np.array(by_cell[h], dtype=np.float64)
            # 2x the minimum split -> target occupancy cell_cap/2, so the
            # index tolerates 2x k-means imbalance before any residual drop
            k_sub = min(_SUB - 1, 2 * int(np.ceil(hot[h] / cell_cap)))
            subs[h] = _kmeans(X, k_sub)
    if subs:
        # broadcast (cell -> sub-centroid list) table; constant plan size
        sub_rows = [
            (
                int(h),
                [
                    (int(h * _SUB + 1 + s), [float(x) for x in subs[h][s]])
                    for s in range(len(subs[h]))
                ],
            )
            for h in sorted(subs)
        ]
        subs_df = corpus.sparkSession.createDataFrame(
            sub_rows, "cell int, _subs array<struct<sc: bigint, sv: array<double>>>"
        )
        sub_pick = F.array_max(
            F.transform(
                F.col("_subs"),
                lambda s: F.struct(
                    _dot(F.col("_cv"), s["sv"]).alias("d"), s["sc"].alias("c")
                ),
            )
        )["c"]
        assigned = (
            base.join(F.broadcast(subs_df), "cell", "left")
            .withColumn(
                "cell",
                F.when(F.col("_subs").isNull(), F.col("cell").cast("long") * _SUB)
                .otherwise(sub_pick),
            )
            .drop("_subs")
        )
    else:
        assigned = base.withColumn("cell", F.col("cell").cast("long") * _SUB)
    eff_list, eff_id_list = [], []
    for j in range(len(centroids)):
        if j in subs:
            for s in range(len(subs[j])):
                eff_list.append(subs[j][s])
                eff_id_list.append(j * _SUB + 1 + s)
        else:
            eff_list.append(np.asarray(centroids[j], dtype=np.float64))
            eff_id_list.append(j * _SUB)
    cached = [base]
    if subs:
        # sub-cell dots on hot rows are recomputed per downstream use of
        # the cached base — cache the final assignment instead
        assigned = assigned.persist()
        cached = [assigned]
        resid = {r["cell"]: r["n"] for r in
                 assigned.groupBy("cell").agg(F.count("*").alias("n")).collect()}
        base.unpersist()
        over = {c: n for c, n in resid.items() if n > cell_cap}
        if over:
            stats["dropped_cells"] = len(over)
            stats["dropped_rows"] = int(sum(over.values()))
            ok = [int(c) for c in resid if c not in over]
            ok_df = assigned.sparkSession.createDataFrame(
                [(c,) for c in ok], "cell long"
            )
            assigned = assigned.join(F.broadcast(ok_df), "cell", "left_semi")
    return IvfIndex(
        assigned,
        np.stack(eff_list),
        np.asarray(eff_id_list, dtype=np.int64),
        stats,
        cached=cached,
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: np.ndarray,
    k: int = 5,
    nprobe: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    cell_cap: int | None = 65536,
    resplit: bool = True,
    index: "IvfIndex | None" = None,
) -> DataFrame:
    """IVF approximate nearest neighbors — the engine's primary ANN
    scale path: corpus rows live in their argmax-cosine centroid cell,
    queries probe their ``nprobe`` nearest cells, exact cosine runs only
    within probed cells. Everything after centroid training is Catalyst
    (cell assignment = argmax over inlined centroid dots; the cell
    equi-join replaces the cross join). Scan fraction ~= nprobe /
    n_cells; recall rises with nprobe.

    ``cell_cap`` is the degenerate-cell guard: a clustered corpus
    (boilerplate embeddings) can pile into ONE hot cell that every
    probing query then joins against — quadratic at scale. By default
    (``resplit=True``) hot cells are RE-SPLIT via
    :func:`build_ivf_index` — sub-centroids trained on a bounded sample,
    rows re-assigned, queries probing the flat effective cell set — so
    no corpus row silently leaves the index; ``resplit=False`` restores
    the round-3 behavior (over-cap cells dropped via broadcast
    semi-join, the cap bounding the damage without retraining).

    Pass a pre-built ``index`` (see :func:`build_ivf_index`) to amortize
    the index build across calls AND to own the cache lifetime. When the
    index is built internally it is UNPERSISTED before returning (so
    repeat callers never accumulate cached assignments — the returned
    plan lazily recomputes the assignment once); callers who want the
    build amortized across queries should build the index themselves
    (the persisted assignment is the in-session stand-in for the IVF
    index TABLE a 100-TB deployment would materialize between build and
    query)."""
    if index is None:
        index = build_ivf_index(
            corpus, centroids, vec_col, id_col,
            cell_cap=cell_cap if resplit else None,
        )
        if not resplit and cell_cap is not None:
            # legacy guard: map-side n_cells-row count + broadcast
            # semi-join (a count window would funnel the corpus through
            # n_cells reducers); over-cap cells DROP — counted into
            # index.stats below so the drop is never silent
            cell_counts = index.assigned.groupBy("cell").count()
            over = (
                cell_counts.filter(F.col("count") > cell_cap)
                .agg(
                    F.count("*").cast("long").alias("cells"),
                    F.coalesce(F.sum("count"), F.lit(0)).cast("long").alias("rows"),
                )
                .first()
            )
            index.stats["dropped_cells"] = int(over["cells"])
            index.stats["dropped_rows"] = int(over["rows"])
            ok_cells = (
                cell_counts.filter(F.col("count") <= cell_cap).select("cell")
            )
            index = IvfIndex(
                index.assigned.join(F.broadcast(ok_cells), "cell", "left_semi"),
                index.centroids, index.cell_ids, index.stats,
                cached=index._cached,
            )
        # internally-built index: release the build-time cache now; the
        # returned DataFrame recomputes the assignment lazily (one extra
        # pass) instead of leaking a persisted DF per call (ADVICE r4)
        index.unpersist()
    c = index.assigned
    probes = F.transform(
        F.slice(F.reverse(F.array_sort(F.col("_dots"))), 1, nprobe),
        lambda s: s["c"],
    )
    q = (
        _attach_cell_dots(queries, vec_col, index.centroids, ids=list(index.cell_ids))
        .select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).alias("_qv"),
            F.explode(probes).alias("cell"),
        )
        .withColumn("cell", F.col("cell").cast("long"))
    )
    scored = (
        q.join(c, "cell")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "cosine",
            _dot(F.col("_qv"), F.col("_cv")) / (_norm(F.col("_qv")) * _norm(F.col("_cv"))),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.select("query_id", "neighbor_id", "cosine")
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def ivf_mean_recall(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: np.ndarray,
    k: int = 5,
    nprobe: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    recall_floor: float = 0.5,
    cell_cap: int | None = 65536,
) -> DataFrame:
    """Recall gate for the IVF path: mean recall@k across the query set
    vs the exact brute-force top-k, as ONE oracle-checkable row
    ``(n_queries, mean_recall_ok)``."""
    exact = brute_topk_sql(corpus, queries, k, vec_col, id_col)
    approx = ivf_topk(
        corpus, queries, centroids, k, nprobe, vec_col, id_col, cell_cap
    )
    return _mean_recall_gate(exact, approx, recall_floor)


def _mean_recall_gate(
    exact: DataFrame, approx: DataFrame, recall_floor: float
) -> DataFrame:
    """Shared gate body for the ANN recall rows: per query, the fraction
    of the EXACT top-k retrieved by the approximate top-k, averaged into
    ONE oracle-checkable ``(n_queries, mean_recall_ok)`` row. Both
    inputs carry (query_id, neighbor_id)."""
    exact = exact.select("query_id", "neighbor_id")
    approx = approx.select("query_id", F.col("neighbor_id").alias("nb_approx"))
    hits = exact.join(
        approx,
        (exact.query_id == approx.query_id) & (exact.neighbor_id == approx.nb_approx),
        "left",
    ).groupBy(exact.query_id.alias("qid")).agg(
        (F.count("nb_approx") / F.count("*")).alias("recall")
    )
    return hits.agg(
        F.count("*").cast("long").alias("n_queries"),
        (F.avg("recall") >= recall_floor).alias("mean_recall_ok"),
    )


def lsh_mean_recall(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_planes: int = 8,
    seed: int = 42,
    dim: int | None = None,
    recall_floor: float = 0.5,
    bucket_cap: int | None = None,
) -> DataFrame:
    """Mean recall@k gate for the LSH ANN path vs the exact brute-force
    top-k, as ONE oracle-checkable row ``(n_queries, mean_recall_ok)`` —
    the same hard-gate shape as :func:`ivf_mean_recall`. Choose
    ``n_planes`` (scan fraction ~= (n_planes+1)/2^n_planes with 1-bit
    multi-probe) so the floor is honest for the corpus at hand."""
    exact = brute_topk_sql(corpus, queries, k, vec_col, id_col)
    approx = lsh_topk(
        corpus, queries, k, vec_col, id_col, n_planes, seed,
        dim=dim, bucket_cap=bucket_cap,
    )
    return _mean_recall_gate(exact, approx, recall_floor)


def lsh_recall_vs_exact(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_planes: int = 8,
    seed: int = 42,
    dim: int | None = None,
    recall_floor: float = 0.5,
) -> DataFrame:
    """Recall gate for the approximate path: per query, the fraction of
    the EXACT top-k the LSH top-k retrieved. Returns ``(query_id,
    n_hits, recall_ok)`` — the quality analog of the error-bound gates,
    checkable by an all-true oracle column."""
    exact = brute_topk_sql(corpus, queries, k, vec_col, id_col).select(
        "query_id", "neighbor_id"
    )
    approx = lsh_topk(
        corpus, queries, k, vec_col, id_col, n_planes, seed, dim=dim
    ).select("query_id", F.col("neighbor_id").alias("nb_lsh"))
    hits = exact.join(
        approx,
        (exact.query_id == approx.query_id) & (exact.neighbor_id == approx.nb_lsh),
        "left",
    ).groupBy(exact.query_id.alias("query_id")).agg(
        F.count(F.col("nb_lsh")).alias("n_hits"),
        F.count("*").alias("n_exact"),
    )
    return hits.select(
        "query_id",
        F.col("n_hits").cast("long").alias("n_hits"),
        (F.col("n_hits") / F.col("n_exact") >= recall_floor).alias("recall_ok"),
    )
